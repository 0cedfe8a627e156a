from .checkpoint import (  # noqa: F401
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from .config import TrainConfig, parse_args  # noqa: F401
from .step import StepConfig, TextBoostTrainState, make_train_step  # noqa: F401
from .trainer import Trainer  # noqa: F401
