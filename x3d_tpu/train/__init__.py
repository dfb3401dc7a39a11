"""Training runtime: state, steps, schedules, metrics, checkpointing, loop."""

from x3d_tpu.train.schedule import lr_for_epoch, make_lr_schedule  # noqa: F401
from x3d_tpu.train.state import TrainState, create_train_state  # noqa: F401
from x3d_tpu.train.steps import (  # noqa: F401
    l2_penalty,
    make_eval_step,
    make_train_step,
)
from x3d_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from x3d_tpu.train.loop import evaluate, fit  # noqa: F401
from x3d_tpu.train.multigrid import (  # noqa: F401
    MultigridSchedule,
    fit_multigrid,
    make_bn_recalibrator,
)
