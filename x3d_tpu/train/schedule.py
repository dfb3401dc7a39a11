"""Learning-rate schedule: linear warmup then half-cosine, stepped per epoch.

Parity target: reference ``train.py:113-125`` (SURVEY.md Q5) — the LR is
constant within an epoch, the first ``WARMUP_EPOCHS`` epochs interpolate
linearly from WARMUP_LR to BASE_LR, and strictly *after* epoch WARMUP_EPOCHS
the half-cosine ``BASE_LR * 0.5*(cos(pi*epoch/EPOCHS)+1)`` applies.  Note the
reference's boundary: epoch == WARMUP_EPOCHS still uses the warmup line
(which there equals BASE_LR).
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_for_epoch(cfg, epoch):
    """LR for a (0-based, possibly traced) epoch index."""
    t = cfg.TRAIN
    epoch = jnp.asarray(epoch, dtype=jnp.float32)
    warm = t.WARMUP_LR + epoch * (t.BASE_LR - t.WARMUP_LR) / t.WARMUP_EPOCHS
    cos = t.BASE_LR * 0.5 * (jnp.cos(jnp.pi * epoch / t.EPOCHS) + 1.0)
    return jnp.where(epoch > t.WARMUP_EPOCHS, cos, warm)


def make_lr_schedule(cfg, steps_per_epoch: int):
    """An optax-style step->lr schedule implementing the per-epoch stepping.

    The reference applies LR via a per-epoch Keras callback; expressing it as
    a function of the global step (epoch = step // steps_per_epoch) gives the
    identical staircase while staying jit-traceable inside the optimizer.
    """
    if steps_per_epoch <= 0:
        raise ValueError("steps_per_epoch must be positive")

    def schedule(step):
        epoch = jnp.asarray(step, dtype=jnp.int32) // steps_per_epoch
        return lr_for_epoch(cfg, epoch)

    return schedule
