"""On-device input preprocessing: uint8 -> normalised compute-dtype clips.

The reference normalises on the host in float32 (``utils.py:42-72``) and
ships 4-byte pixels over PCIe.  Shipping uint8 and normalising on device
quarters host->device bandwidth, and XLA fuses the ÷255 / mean / std math
into the stem convolution — it is effectively free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from x3d_tpu import utils


def device_prep(cfg, dtype=jnp.bfloat16, already_normalized: bool = False):
    """Build a jitted fn mapping raw device clips to model input."""
    mean = tuple(cfg.DATA.MEAN)
    std = tuple(cfg.DATA.STD)

    @jax.jit
    def prep(video):
        if already_normalized:
            return video.astype(dtype)
        return utils.normalize(video.astype(jnp.float32), mean, std).astype(dtype)

    return prep
