from .predictor import (
    DSB2018Predictor,
    LazyPredictor,
    StandardPredictor,
    dsb_save_batch,
    get_predictor,
)

__all__ = [
    "DSB2018Predictor",
    "LazyPredictor",
    "StandardPredictor",
    "dsb_save_batch",
    "get_predictor",
]
