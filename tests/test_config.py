"""Config-system tests: yacs-compatible semantics + variant YAML parity.

Oracle values come from the reference schema (configs/default.py) and the
five committed variant YAMLs (configs/kinetics/*.yaml).
"""

import pytest

from x3d_tpu import get_default_config, variant_config
from x3d_tpu.config import CfgNode


def test_default_schema_keys():
    cfg = get_default_config()
    # reference configs/default.py groups
    for group in ("NETWORK", "DATA", "TRAIN", "TEST", "WANDB"):
        assert group in cfg
    assert cfg.NETWORK.C1_TEMP_FILTER == 5
    assert cfg.NETWORK.C1_CHANNELS == 12
    assert cfg.NETWORK.SCALE_RES2 is False
    assert cfg.NETWORK.BN.MOMENTUM == 0.9
    assert cfg.NETWORK.BN.EPS == 1e-5
    assert cfg.DATA.MEAN == [0.45, 0.45, 0.45]
    assert cfg.TRAIN.OPTIMIZER == "SGD"
    assert cfg.TEST.NUM_SPATIAL_CROPS == 3


def test_clone_is_independent():
    a = get_default_config()
    b = get_default_config()
    a.NETWORK.WIDTH_FACTOR = 9.0
    assert b.NETWORK.WIDTH_FACTOR == 1.0


def test_freeze_blocks_mutation():
    cfg = get_default_config()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.NETWORK.WIDTH_FACTOR = 2.0
    cfg.defrost()
    cfg.NETWORK.WIDTH_FACTOR = 2.0
    assert cfg.NETWORK.WIDTH_FACTOR == 2.0


def test_merge_rejects_unknown_key(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NETWORK:\n  NO_SUCH_KEY: 1\n")
    cfg = get_default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(p))


def test_merge_from_list():
    cfg = get_default_config()
    cfg.merge_from_list(["NETWORK.WIDTH_FACTOR", "2.9", "TRAIN.BATCH_SIZE", "16"])
    assert cfg.NETWORK.WIDTH_FACTOR == 2.9
    assert cfg.TRAIN.BATCH_SIZE == 16


@pytest.mark.parametrize(
    "name,depth,width,frames,crop,batch,lr,views",
    [
        ("XS", 2.2, 1.0, 4, 160, 128, 0.2, 10),
        ("S", 2.2, 1.0, 13, 160, 64, 0.1, 10),
        ("M", 2.2, 1.0, 16, 224, 32, 0.05, 10),
        ("L", 5.0, 1.0, 16, 312, 16, 0.025, 3),
        ("XL", 5.0, 2.9, 16, 312, 16, 0.025, 3),
    ],
)
def test_variant_configs(name, depth, width, frames, crop, batch, lr, views):
    """Values must match the reference's configs/kinetics/X3D_*.yaml."""
    cfg = variant_config(name)
    assert cfg.NETWORK.DEPTH_FACTOR == depth
    assert cfg.NETWORK.WIDTH_FACTOR == width
    assert cfg.NETWORK.BOTTLENECK_WIDTH_FACTOR == 2.25
    assert cfg.NETWORK.WEIGHT_DECAY == 5e-5
    assert cfg.DATA.TEMP_DURATION == frames
    assert cfg.DATA.TRAIN_CROP_SIZE == crop
    assert cfg.TRAIN.BATCH_SIZE == batch
    assert cfg.TRAIN.BASE_LR == lr
    assert cfg.TRAIN.WARMUP_EPOCHS == 35
    assert cfg.TEST.NUM_TEMPORAL_VIEWS == views
    assert cfg.NETWORK.SCALE_RES2 == (name == "XL")


def test_mean_std_match_reference():
    cfg = variant_config("M")
    assert cfg.DATA.MEAN == [0.433, 0.404, 0.377]
    assert cfg.DATA.STD == [0.151, 0.148, 0.157]


def test_cfgnode_from_dict():
    c = CfgNode({"A": {"B": 1}, "C": [1, 2]})
    assert c.A.B == 1
    assert c.C == [1, 2]
