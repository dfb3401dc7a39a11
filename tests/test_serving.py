"""Serving engine tests (AOT-compiled inference, CPU-sized)."""

import numpy as np
import pytest

from x3d_tpu import variant_config
from x3d_tpu.serving import InferenceEngine


def _cfg():
    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 7
    cfg.DATA.TEMP_DURATION = 4
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TEST.NUM_TEMPORAL_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    return cfg


@pytest.fixture(scope="module")
def engine():
    import jax.numpy as jnp

    return InferenceEngine.random_init(_cfg(), max_videos=3,
                                       dtype=jnp.float32)


def test_predict_full_batch(engine):
    clips = np.random.randint(0, 255, engine.clip_shape, np.uint8)
    probs = engine.predict(clips)
    assert probs.shape == (3, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_predict_ragged_batch_padded(engine):
    clips = np.random.randint(0, 255, (1 * engine.views,) +
                              engine.clip_shape[1:], np.uint8)
    probs = engine.predict(clips)
    assert probs.shape == (1, 7)


def test_top_k(engine):
    clips = np.random.randint(0, 255, engine.clip_shape, np.uint8)
    idx, p = engine.top_k(clips, k=3)
    assert idx.shape == (3, 3)
    assert (p[:, 0] >= p[:, 1]).all() and (p[:, 1] >= p[:, 2]).all()


def test_latency_probes(engine):
    dev = engine.device_latency_s(iters=2, outer=1)
    wall = engine.wall_latency_s(samples=2)
    assert dev > 0 and wall > 0


def test_time_fold_engine_matches_unfolded(engine):
    """A folded serving engine is a layout change, not a model change."""
    import jax.numpy as jnp

    from x3d_tpu.models import create_model, init_variables
    import jax

    cfg = _cfg()
    model = create_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, cfg.DATA.TEMP_DURATION, cfg.DATA.TEST_CROP_SIZE,
                   cfg.DATA.TEST_CROP_SIZE, 3))
    variables = init_variables(model, jax.random.PRNGKey(0), x)
    plain = InferenceEngine(cfg, variables, max_videos=2,
                            dtype=jnp.float32)
    folded = InferenceEngine(cfg, variables, max_videos=2,
                             dtype=jnp.float32, time_fold=True)
    clips = np.random.randint(0, 255, plain.clip_shape, np.uint8)
    np.testing.assert_allclose(folded.predict(clips), plain.predict(clips),
                               atol=1e-5, rtol=1e-5)


def test_mixed_and_measured_layouts_match_unfolded(engine):
    """"mixed" (half-folded trunk) and "measure" (layout autotune) produce
    the same probabilities as the unfolded engine — layout choices only."""
    import jax
    import jax.numpy as jnp

    from x3d_tpu.models import create_model, init_variables

    cfg = _cfg()
    model = create_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, cfg.DATA.TEMP_DURATION, cfg.DATA.TEST_CROP_SIZE,
                   cfg.DATA.TEST_CROP_SIZE, 3))
    variables = init_variables(model, jax.random.PRNGKey(0), x)
    plain = InferenceEngine(cfg, variables, max_videos=2, dtype=jnp.float32)
    mixed = InferenceEngine(cfg, variables, max_videos=2, dtype=jnp.float32,
                            time_fold="mixed")
    assert mixed.layout == "mixed"
    measured = InferenceEngine(cfg, variables, max_videos=2,
                               dtype=jnp.float32, time_fold="measure")
    assert measured.layout in (False, True, "mixed")
    clips = np.random.randint(0, 255, plain.clip_shape, np.uint8)
    want = plain.predict(clips)
    np.testing.assert_allclose(mixed.predict(clips), want,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(measured.predict(clips), want,
                               atol=1e-5, rtol=1e-5)


def test_rejects_bad_shapes(engine):
    with pytest.raises(ValueError):
        engine.predict(np.zeros((3,) + engine.clip_shape[1:], np.uint8))
    too_many = np.zeros((4 * engine.views,) + engine.clip_shape[1:], np.uint8)
    with pytest.raises(ValueError):
        engine.predict(too_many)
