"""TF SavedModel export (x3d_tpu/export.py) — reload + parity, CPU-sized.

The exported artifact must reproduce the flax model's probabilities (same
in-graph uint8 normalisation path as x3d_tpu.serving.InferenceEngine), with
the default signature implementing the variant's view-ensemble protocol
over a shape-polymorphic clip batch.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.export import export_saved_model
from x3d_tpu.models import create_model, init_variables
from x3d_tpu.utils import normalize

from test_model import tiny_cfg

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = tiny_cfg()
    cfg.NETWORK.NUM_CLASSES = 7
    cfg.DATA.TEMP_DURATION = 4
    cfg.DATA.TEST_CROP_SIZE = 32
    model = create_model(cfg, dtype=jnp.float32)
    variables = init_variables(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    out = str(tmp_path_factory.mktemp("export") / "saved_model")
    export_saved_model(cfg, variables, out)
    return cfg, model, variables, tf.saved_model.load(out)


def test_clip_probs_match_flax(exported):
    cfg, model, variables, loaded = exported
    clips = np.random.default_rng(0).integers(
        0, 255, (4, 4, 32, 32, 3), np.uint8)
    got = loaded.serve_clips(tf.constant(clips))["probabilities"].numpy()

    xn = normalize(jnp.asarray(clips, jnp.float32),
                   tuple(cfg.DATA.MEAN), tuple(cfg.DATA.STD))
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False,
                                              return_logits=True))(
        variables, xn)
    want = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_video_signature_is_view_ensemble(exported):
    cfg, model, variables, loaded = exported
    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    clips = np.random.default_rng(1).integers(
        0, 255, (3 * views, 4, 32, 32, 3), np.uint8)
    per_clip = loaded.serve_clips(tf.constant(clips))["probabilities"].numpy()
    per_video = loaded.serve_videos(
        tf.constant(clips))["probabilities"].numpy()
    assert per_video.shape == (3, cfg.NETWORK.NUM_CLASSES)
    np.testing.assert_allclose(
        per_video, per_clip.reshape(3, views, -1).mean(1), atol=1e-6)

    # the model's own eval forward (in-model view averaging) agrees too
    xn = normalize(jnp.asarray(clips, jnp.float32),
                   tuple(cfg.DATA.MEAN), tuple(cfg.DATA.STD))
    want = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, xn)
    np.testing.assert_allclose(per_video, np.asarray(want), atol=1e-6)


def test_polymorphic_batch(exported):
    _, _, _, loaded = exported
    for n in (2, 6):
        clips = np.zeros((n, 4, 32, 32, 3), np.uint8)
        assert loaded.serve_clips(
            tf.constant(clips))["probabilities"].shape == (n, 7)


def test_serving_default_signature(exported):
    cfg, _, _, loaded = exported
    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    sig = loaded.signatures["serving_default"]
    clips = np.zeros((2 * views, 4, 32, 32, 3), np.uint8)
    out = sig(clips=tf.constant(clips))
    assert out["probabilities"].shape == (2, cfg.NETWORK.NUM_CLASSES)


def test_tflite_conversion(exported, tmp_path):
    """Fixed-batch export converts to a .tflite flatbuffer (Flex ops: the
    depthwise 3D convs exceed TFLite's builtin CONV_3D; execution needs a
    Flex-enabled interpreter, absent here — conversion only)."""
    from x3d_tpu.export import export_tflite

    cfg, model, variables, _ = exported
    sm = str(tmp_path / "sm_fixed")
    export_saved_model(cfg, variables, sm, batch_clips=2)
    out = export_tflite(sm, str(tmp_path / "x3d.tflite"))
    import os

    assert os.path.getsize(out) > 100_000  # real flatbuffer, not a stub


def test_export_cli(tmp_path):
    """The CLI exports (random init) and the artifact loads."""
    import os

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "x3d_tpu",
                            "configs", "kinetics", "X3D_XS.yaml")
    out = tmp_path / "sm"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))
    res = subprocess.run(
        [sys.executable, "-m", "x3d_tpu.tools.export",
         f"--cfg={cfg_path}", f"--model_folder={tmp_path}",
         f"--export_dir={out}", "--allow_random_init",
         "--opts=NETWORK.C1_CHANNELS 4",
         "--opts=NETWORK.DEPTH_FACTOR 0.34",
         "--opts=DATA.TEMP_DURATION 4",
         "--opts=DATA.TEST_CROP_SIZE 32",
         "--opts=TEST.NUM_TEMPORAL_VIEWS 2",
         "--opts=TEST.NUM_SPATIAL_CROPS 1"],
        capture_output=True, text=True, env=env, timeout=540)
    assert res.returncode == 0, res.stderr[-2000:]
    loaded = tf.saved_model.load(str(out))
    clips = np.zeros((2, 4, 32, 32, 3), np.uint8)
    assert loaded.serve_clips(
        tf.constant(clips))["probabilities"].shape == (2, 400)
