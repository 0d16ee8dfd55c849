from .gan_batch import restore_clips_gan
from .mesh import make_mesh, shard_batch
from .packed import (fit_packed_unet_dp, fit_packed_unet_single,
                     fit_packed_unet_spatial, packed_unet_train_step)
from .spatial import (fit_shared_unet_spatial, make_mesh_2d, predict_spatial,
                      shard_spatial, stft_frame_parallel)
from .train import shared_unet_train_step, init_shared_unet, fit_shared_unet

__all__ = [
    "restore_clips_gan",
    "fit_packed_unet_dp",
    "fit_packed_unet_single",
    "fit_packed_unet_spatial",
    "packed_unet_train_step",
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "shard_spatial",
    "shared_unet_train_step",
    "init_shared_unet",
    "fit_shared_unet",
    "fit_shared_unet_spatial",
    "predict_spatial",
    "stft_frame_parallel",
]
