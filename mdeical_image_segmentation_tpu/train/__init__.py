from .callbacks import BestIoUCallback, TrainerCallback, TrainerControl
from .optimizers import (
    create_lr_scheduler,
    create_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from .train_state import TrainState, create_train_state
from .trainer2d import CustomTrainer, Trainer, TrainingArguments, TrainOutput
from .trainer3d import UNetTrainer, create_trainer
from .checkpoint import load_checkpoint, save_checkpoint, save_network_output
from .profiling import ProfiledSection, StepTimer, device_memory_summary, trace
from ..logging_utils import (
    MetricWriter,
    RunningAverage,
    TensorboardFormatter,
    get_logger,
    get_tensorboard_formatter,
)

__all__ = [
    "BestIoUCallback",
    "TrainerCallback",
    "TrainerControl",
    "create_lr_scheduler",
    "create_optimizer",
    "get_learning_rate",
    "set_learning_rate",
    "TrainState",
    "create_train_state",
    "CustomTrainer",
    "Trainer",
    "TrainingArguments",
    "TrainOutput",
    "UNetTrainer",
    "create_trainer",
    "load_checkpoint",
    "save_checkpoint",
    "save_network_output",
    "MetricWriter",
    "RunningAverage",
    "TensorboardFormatter",
    "get_logger",
    "get_tensorboard_formatter",
]
