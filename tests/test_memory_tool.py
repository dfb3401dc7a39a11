"""Compiled-memory analysis tool (CPU smoke on the tiny arch)."""

import jax.numpy as jnp

from x3d_tpu import get_default_config
from x3d_tpu.tools import memory


def test_analyze_reports_buffers():
    cfg = get_default_config()
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 7
    cfg.DATA.TEMP_DURATION = 3
    cfg.DATA.TRAIN_CROP_SIZE = 32
    r = memory.analyze(cfg, batch=2, mode="train", remat=False)
    assert r["batch"] == 2
    assert r["temp_gb"] >= 0
    assert r["total_gb"] >= r["temp_gb"]
    r2 = memory.analyze(cfg, batch=4, mode="train", remat=False)
    assert r2["total_gb"] >= r["total_gb"]
