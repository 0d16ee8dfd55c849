from .linear import linear_interp_masked, linear_fill_gap
from .ar import ARConfig, ar_restore_gap, ar_restore_gaps
from .windowed import restore_windowed
from .streaming import StreamRestorer, restore_stream

__all__ = [
    "linear_interp_masked",
    "linear_fill_gap",
    "ARConfig",
    "ar_restore_gap",
    "ar_restore_gaps",
    "restore_windowed",
    "StreamRestorer",
    "restore_stream",
]
