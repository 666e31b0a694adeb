"""Training harness: optimizer/scheduler factories, train state, freeze
partitioning, jitted train/eval steps, checkpointing."""

from .optim import (build_optimizer, build_schedule, is_host_driven,
                    PlateauController, set_learning_rate,
                    get_learning_rate)
from .state import TrainState, create_train_state
from .partition import freeze_mask, apply_freeze
from . import steps
from .checkpoint import (
    save_checkpoint, restore_checkpoint, restore_any_checkpoint,
    load_stage1_event_extractor,
    load_stage2_matcher,
)

__all__ = [
    "build_optimizer", "build_schedule", "is_host_driven",
    "PlateauController", "set_learning_rate", "get_learning_rate",
    "TrainState", "create_train_state",
    "freeze_mask", "apply_freeze", "steps",
    "save_checkpoint", "restore_checkpoint", "restore_any_checkpoint",
    "load_stage1_event_extractor",
    "load_stage2_matcher",
]
