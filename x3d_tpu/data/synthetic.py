"""Synthetic data: device-resident batches for benchmarks / smoke training.

The reference has no equivalent; it exists so the training loop, benchmarks
and tests exercise the full step without Kinetics on disk.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp


def synthetic_batches(cfg, batch_size: int, is_training: bool = True,
                      dtype=jnp.bfloat16, steps: int | None = None,
                      seed: int = 0) -> Iterator[dict]:
    """Yield {'video','label'} batches with the config's real shapes."""
    T = cfg.DATA.TEMP_DURATION
    S = cfg.DATA.TRAIN_CROP_SIZE if is_training else cfg.DATA.TEST_CROP_SIZE
    C = cfg.DATA.NUM_INPUT_CHANNELS
    views = 1 if is_training else (
        cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS)
    key = jax.random.PRNGKey(seed)
    kv, kl = jax.random.split(key)
    video = jax.random.normal(kv, (batch_size * views, T, S, S, C), dtype)
    label = jax.random.randint(kl, (batch_size,), 0,
                               cfg.NETWORK.NUM_CLASSES)
    if is_training:
        label = label[:batch_size]
    i = 0
    while steps is None or i < steps:
        yield {"video": video, "label": label}
        i += 1
