"""Train state: params + BN running stats + optimizer state, as a pytree.

The reference's state lives implicitly inside a Keras model + optimizer
(``train.py:85-111``); here it is an explicit, functional
``flax.struct`` dataclass so the whole training step is a pure function that
``pjit`` can shard and XLA can fuse.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from x3d_tpu.models.x3d import X3D, init_variables
from x3d_tpu.train.schedule import make_lr_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                  # global optimizer step
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(cfg, steps_per_epoch: int,
                   schedule=None) -> optax.GradientTransformation:
    """SGD-with-Nesterov-momentum or Adam, on the per-epoch-stepped schedule.

    Mirrors the reference's optimizer build (``train.py:87-97``): SGD uses
    TRAIN.MOMENTUM with nesterov=True; weight decay is *not* handled here —
    it enters the loss as an L2 penalty exactly as the reference's
    kernel_regularizers do (SURVEY.md Q7).

    Known semantic nuance: TF's SGD folds the LR into the velocity
    (``v = m*v - lr*g``) while optax scales after momentum accumulation
    (``update = -lr*(g + m*trace)``).  At constant LR the trajectories are
    identical; across an epoch's LR change they differ transiently for
    O(1/(1-m)) steps — negligible against the 256-epoch schedule, noted for
    exact-parity audits.

    ``schedule``: optional step->lr override (e.g. the multigrid schedule,
    whose steps-per-epoch varies by phase); defaults to the reference's
    per-epoch staircase.
    """
    if schedule is None:
        schedule = make_lr_schedule(cfg, steps_per_epoch)
    name = cfg.TRAIN.OPTIMIZER.lower()
    if name == "sgd":
        return optax.sgd(schedule, momentum=cfg.TRAIN.MOMENTUM, nesterov=True)
    if name == "adam":
        return optax.adam(schedule)
    raise NotImplementedError(f"optimizer {cfg.TRAIN.OPTIMIZER!r} not supported")


def create_train_state(cfg, model: X3D, rng, sample_clip,
                       steps_per_epoch: int | None = None,
                       tx: optax.GradientTransformation | None = None
                       ) -> TrainState:
    """Initialise variables (under jit) and wrap them in a TrainState.

    ``tx``: optional pre-built optimizer (e.g. one on the multigrid LR
    schedule); defaults to ``make_optimizer(cfg, steps_per_epoch)``.
    """
    if steps_per_epoch is None:
        steps_per_epoch = max(1, cfg.TRAIN.DATASET_SIZE // cfg.TRAIN.BATCH_SIZE)
    variables = init_variables(model, rng, sample_clip)
    if tx is None:
        tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        tx=tx,
    )
