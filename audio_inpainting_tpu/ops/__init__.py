from .stft import (
    StftConfig,
    scipy_stft_config,
    torch_stft_config,
    stft,
    istft,
    frame_signal,
    overlap_add,
    hann_window,
)
from .griffin_lim import griffin_lim

__all__ = [
    "StftConfig",
    "scipy_stft_config",
    "torch_stft_config",
    "stft",
    "istft",
    "frame_signal",
    "overlap_add",
    "hann_window",
    "griffin_lim",
]
