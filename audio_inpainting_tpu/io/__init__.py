from .wav import read_wav, write_wav, load_mono_normalized, save_wav_int16
from .render import save_spectrogram_png

__all__ = [
    "read_wav",
    "write_wav",
    "load_mono_normalized",
    "save_wav_int16",
    "save_spectrogram_png",
]
