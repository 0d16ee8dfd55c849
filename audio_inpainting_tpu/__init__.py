"""audio_inpainting_tpu — a TPU-native (JAX/XLA/Pallas) audio-inpainting framework.

Re-designed from scratch with the capabilities of the reference study
(conniemessi/Audio-Inpainting): seven restoration methods (linear
interpolation, Gaussian-process regression, bidirectional autoregressive
prediction ± texture injection, masked NMF spectrogram factorization, a
spectrogram U-Net, a spectrogram GAN, and diffusion spectrogram inpainting)
over three corruption scenarios (tiny contiguous gap, random dropouts,
one 2-second hole), plus the demo/artifact layer.

Layering (SURVEY.md §1, made explicit):
  io/        L0  WAV read/write, normalization, PNG rendering
  ops/       L1  time-frequency transforms (STFT/iSTFT, Griffin-Lim), Pallas kernels
  corrupt/   L2  mask generators + blind damage detectors
  methods/   L3  the seven inpainting methods, uniform ``restore`` API
  metrics/   L4  SNR / local SNR / LSD
  pipelines/ L6  scenario drivers emitting the demo_assets artifact contract
  demo/      L5  demo app over the artifact registry
  models/        flax neural nets (U-Net, GAN, diffusion)
  parallel/      device-mesh / sharding helpers (multi-clip data parallel)
"""

__version__ = "0.1.0"

from .api import restore  # noqa: E402  (uniform L3 contract)
from .methods.windowed import restore_windowed  # noqa: E402
from .methods.streaming import StreamRestorer, restore_stream  # noqa: E402

__all__ = ["restore", "restore_windowed", "StreamRestorer", "restore_stream"]
