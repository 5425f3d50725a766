from .app import (
    BatchingInferenceEngine,
    ModelEntry,
    ModelRegistry,
    SegmentationServer,
    serve,
)

__all__ = [
    "BatchingInferenceEngine",
    "ModelEntry",
    "ModelRegistry",
    "SegmentationServer",
    "serve",
]
