from .unet import SimpleUNet, GeneratorUNet, Discriminator

__all__ = ["SimpleUNet", "GeneratorUNet", "Discriminator"]
