from .checkpoint import save_params, load_params, latest_checkpoint
from .profiling import device_trace, Timer

__all__ = ["save_params", "load_params", "latest_checkpoint",
           "device_trace", "Timer"]
