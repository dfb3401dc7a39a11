"""Compatibility guards: the reference's own artifacts drive this framework."""

import os

import pytest

from x3d_tpu import get_default_config

REF = "/root/reference/configs/kinetics"


@pytest.mark.parametrize("name", ["X3D_XS", "X3D_S", "X3D_M", "X3D_L",
                                  "X3D_XL"])
def test_reference_yamls_merge_unchanged(name):
    """The reference repo's committed YAMLs must merge without edits."""
    path = os.path.join(REF, f"{name}.yaml")
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    cfg = get_default_config()
    cfg.merge_from_file(path)
    cfg.freeze()
    assert cfg.NETWORK.BOTTLENECK_WIDTH_FACTOR == 2.25
    assert cfg.TRAIN.EPOCHS == 256
    assert cfg.NETWORK.WEIGHT_DECAY == 5e-5


def test_text_pipeline_zero_fallback(tmp_path):
    """Raw-video path: undecodable files become zero clips, not crashes
    (reference dataloader.py:53-61 fault tolerance)."""
    tf = pytest.importorskip("tensorflow")
    import numpy as np

    from x3d_tpu import variant_config
    from x3d_tpu.data.pipeline import InputReader
    from x3d_tpu.data.video import available_backend

    if available_backend() is None:
        pytest.skip("no video decode backend at all")

    labels = tmp_path / "labels.txt"
    fake = tmp_path / "missing.mp4"
    labels.write_text(f"{fake} 2\n{fake} 3\n")

    cfg = variant_config("XS")
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 50]
    reader = InputReader(cfg, is_training=True, use_tfrecord=False)
    batch = next(reader.as_numpy(str(labels), 2))
    assert batch["video"].shape == (2, 4, 32, 32, 3)
    assert np.all(batch["video"] == 0)          # zero-substituted
    assert set(batch["label"]) == {2, 3}
