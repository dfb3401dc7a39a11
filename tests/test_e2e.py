"""End-to-end seam test: TFRecord shards -> pipeline -> device feed ->
sharded train steps -> eval, all through public APIs (CPU-sized).

The full-size version of this flow (X3D-XS on the real TPU reaching 100%
multi-view val accuracy on a 5-class color dataset via the train/eval CLIs)
is documented in .claude/skills/verify/SKILL.md.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from x3d_tpu import variant_config
from x3d_tpu.data.pipeline import InputReader
from x3d_tpu.data.tfrecords import write_video_array_shards
from x3d_tpu.models import create_model
from x3d_tpu.parallel import create_mesh, shard_batch, shard_state
from x3d_tpu.train import create_train_state, make_eval_step, make_train_step


@pytest.fixture(scope="module")
def color_shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(0)
    base = np.array([[200, 40, 40], [40, 200, 40], [40, 40, 200]])

    def make(cls):
        v = base[cls][None, None, None, :] + rng.randint(-25, 25,
                                                         (30, 48, 64, 3))
        return np.clip(v, 0, 255).astype(np.uint8)

    vids = [(make(i % 3), i % 3) for i in range(12)]
    write_video_array_shards(vids, str(d), prefix="train",
                             videos_per_record=6)
    return d


def _cfg():
    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 3
    cfg.NETWORK.DROPOUT_RATE = 0.0
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.TEST.NUM_TEMPORAL_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    return cfg


def test_eval_cli_fails_without_checkpoint(tmp_path):
    """A typo'd --model_folder must exit non-zero, not score random init
    (the reference hard-requires a checkpoint, eval.py:78-81)."""
    import os
    import subprocess
    import sys

    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        "NETWORK:\n  C1_CHANNELS: 4\n  DEPTH_FACTOR: 0.34\n"
        "  NUM_CLASSES: 3\n"
        "DATA:\n  TEMP_DURATION: 2\n  TEST_CROP_SIZE: 32\n"
        "TEST:\n  NUM_TEMPORAL_VIEWS: 1\n  NUM_SPATIAL_CROPS: 1\n"
        "  BATCH_SIZE: 2\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "x3d_tpu.tools.eval", f"--cfg={cfg_yaml}",
         f"--model_folder={tmp_path}", "--synthetic"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode != 0
    assert "No checkpoint" in (r.stderr + r.stdout)


def test_tfrecords_to_sharded_training(color_shards, eight_devices):
    cfg = _cfg()
    mesh = create_mesh(data=4, model=1, devices=eight_devices[:4])
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)

    reader = InputReader(cfg, is_training=True, use_tfrecord=True, seed=3)
    it = reader.device_iterator(str(color_shards / "train-*"), 4, mesh=mesh,
                                dtype=jnp.float32)
    first = next(it)
    assert first["video"].shape == (4, 4, 32, 32, 3)
    assert str(first["video"].dtype) == "float32"

    state = create_train_state(cfg, model, rng, first["video"][:1],
                               steps_per_epoch=3)
    state = shard_state(state, mesh)
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))

    losses = []
    state, m = step(state, first, rng)
    losses.append(float(m["loss"]))
    for _ in range(7):
        state, m = step(state, next(it), rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # color classes are linearly separable: loss must clearly decrease
    assert min(losses[-3:]) < losses[0], losses

    # eval leg: multi-view batch through the same pipeline
    ereader = InputReader(cfg, is_training=False, use_tfrecord=True)
    ebatch = next(ereader.device_iterator(str(color_shards / "train-*"), 4,
                                          mesh=mesh, dtype=jnp.float32))
    out = jax.jit(make_eval_step(model))(state, ebatch)
    assert float(out["count"]) == 4.0
