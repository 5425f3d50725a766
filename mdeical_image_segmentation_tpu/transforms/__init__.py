from .device2d import augment_batch, Augment2DConfig

__all__ = ["augment_batch", "Augment2DConfig"]
