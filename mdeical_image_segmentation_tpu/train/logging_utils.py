"""Back-compat shim: the logging/observability utilities moved to the package
root (mdeical_image_segmentation_tpu.logging_utils) so leaf modules (data,
metrics, infer, serve) can import them without triggering the train package's
trainer imports (circular-import break)."""

from ..logging_utils import (  # noqa: F401
    MetricWriter,
    NullMetricWriter,
    RunningAverage,
    TensorboardFormatter,
    get_logger,
    get_tensorboard_formatter,
)
