from .mesh import make_mesh, shard_batch
from .train import shared_unet_train_step, init_shared_unet, fit_shared_unet

__all__ = [
    "make_mesh",
    "shard_batch",
    "shared_unet_train_step",
    "init_shared_unet",
    "fit_shared_unet",
]
