from .onehot import expand_as_one_hot

__all__ = ["expand_as_one_hot"]
