"""Model tests.

Param-count oracles are the reference's committed Keras summaries
(models/*/X3D_*.txt): total params 3,795,830 (XS/S/M), 6,212,600 (L),
11,176,530 (XL); trainable 3,764,366 for XS/S/M.

Forward-pass tests use a miniature arch (every component present, fast to
compile on one CPU core) shared via a module-scoped fixture; everything runs
under jit — eager flax dispatch compiles each op separately and is
pathologically slow on this host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu import variant_config
from x3d_tpu.models import build_arch, create_model, init_variables
from x3d_tpu.ops.depthwise import depthwise_conv3d


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _abstract_init(cfg, t=4, s=32):
    model = create_model(cfg)
    batch = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    x = jnp.zeros((batch, t, s, s, 3))
    return jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    )


@pytest.mark.parametrize(
    "name,total,trainable",
    [
        ("XS", 3_795_830, 3_764_366),
        ("S", 3_795_830, 3_764_366),
        ("M", 3_795_830, 3_764_366),
        ("L", 6_212_600, None),
        ("XL", 11_176_530, None),
    ],
)
def test_param_count_parity(name, total, trainable):
    shapes = _abstract_init(variant_config(name))
    n_params = _count(shapes["params"])
    n_stats = _count(shapes["batch_stats"])
    assert n_params + n_stats == total
    if trainable is not None:
        assert n_params == trainable


def tiny_cfg():
    """A miniature X3D (5 blocks, 8-wide stem) exercising every component:
    stem, four stages, SE, depthwise convs, projection shortcuts, head,
    dropout, and 2-view eval averaging."""
    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34   # depths [1, 1, 2, 2]
    cfg.TEST.NUM_TEMPORAL_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    return cfg


VIEWS = 2
CLIP = (4, 32, 32, 3)  # (T, H, W, C)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2 * VIEWS,) + CLIP)
    variables = init_variables(model, key, x)
    apply_eval = jax.jit(lambda v, x: model.apply(v, x, train=False))
    apply_logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False, return_logits=True)
    )
    apply_train = jax.jit(
        lambda v, x, rng: model.apply(
            v, x, train=True, rngs={"dropout": rng}, mutable=["batch_stats"]
        )
    )
    return dict(
        cfg=cfg, model=model, variables=variables, x=x,
        apply_eval=apply_eval, apply_logits=apply_logits,
        apply_train=apply_train,
    )


def test_forward_eval_shapes_and_probs(tiny):
    probs = tiny["apply_eval"](tiny["variables"], tiny["x"])
    # eval: batch of 2*views clips -> per-video averaged probs
    assert probs.shape == (2, 400)
    np.testing.assert_allclose(np.sum(probs, -1), 1.0, rtol=1e-4)


def test_forward_train_updates_batch_stats(tiny):
    probs_t, mutated = tiny["apply_train"](
        tiny["variables"], tiny["x"], jax.random.PRNGKey(1)
    )
    assert probs_t.shape == (2 * VIEWS, 400)
    old = tiny["variables"]["batch_stats"]["conv_1"]["bn"]["norm"]["mean"]
    new = mutated["batch_stats"]["conv_1"]["bn"]["norm"]["mean"]
    assert not np.allclose(old, new)


def test_view_averaging_matches_manual_mean(tiny):
    """Eval output must equal the mean of per-clip probabilities (Q8)."""
    avg = tiny["apply_eval"](tiny["variables"], tiny["x"])
    logits = tiny["apply_logits"](tiny["variables"], tiny["x"])
    per_clip = jax.nn.softmax(logits, -1).reshape(2, VIEWS, 400).mean(1)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(per_clip), atol=1e-6)


def test_spatial_downsampling_32x():
    """Stem /2 then one /2 per stage => overall 32x spatial reduction."""
    arch = build_arch(variant_config("XS"))
    strides = [arch.stages[i][0].stride for i in range(4)]
    assert strides == [2, 2, 2, 2]


def test_se_params_only_on_even_global_blocks():
    cfg = variant_config("XS")
    params = _abstract_init(cfg)["params"]
    flat_idx = 0
    for si, blocks in enumerate(build_arch(cfg).stages):
        for bi in range(len(blocks)):
            block = params[f"stage{si + 2}_block{bi}"]["bottleneck"]
            assert ("se" in block) == (flat_idx % 2 == 0)
            flat_idx += 1


def test_head_shapes():
    """fc1 is 2048-wide without bias; fc2 maps to classes with bias."""
    params = _abstract_init(variant_config("XS"))["params"]
    assert params["fc_1"]["kernel"].shape == (432, 2048)
    assert "bias" not in params["fc_1"]
    assert params["fc_2"]["kernel"].shape == (2048, 400)
    assert params["fc_2"]["bias"].shape == (400,)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("kernel", [(3, 3, 3), (5, 1, 1)])
def test_depthwise_impls_agree(stride, kernel):
    """'shift' and 'xla' depthwise implementations are numerically equal."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 12, 12, 8), dtype=jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kernel + (1, 8)) * 0.1
    a = jax.jit(
        lambda x, w: depthwise_conv3d(x, w, (1, stride, stride), "SAME",
                                      impl="shift"))(x, w)
    b = jax.jit(
        lambda x, w: depthwise_conv3d(x, w, (1, stride, stride), "SAME",
                                      impl="xla"))(x, w)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_depthwise_explicit_padding():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 5, 8, 8, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 1, 1, 1, 4)) * 0.1
    pad = ((2, 2), (0, 0), (0, 0))
    a = jax.jit(lambda x, w: depthwise_conv3d(x, w, (1, 1, 1), pad,
                                              impl="shift"))(x, w)
    b = jax.jit(lambda x, w: depthwise_conv3d(x, w, (1, 1, 1), pad,
                                              impl="xla"))(x, w)
    assert a.shape == x.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("mode", ["block", "stage", "convs"])
def test_remat_modes_match_no_remat(mode):
    """Every remat granularity (models/x3d.py: "block" per-res-block,
    "stage" per-stage, "convs" names-policy keeping conv outputs) computes
    the same loss and gradients as the un-remat'ed model — remat must only
    trade memory for recompute, never change values."""
    from x3d_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (4,) + CLIP)
    label = jnp.arange(4) % cfg.NETWORK.NUM_CLASSES
    batch = {"video": video, "label": label}

    def step_with(remat):
        model = create_model(cfg, dtype=jnp.float32, remat=remat)
        state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
        step = make_train_step(model, cfg.NETWORK.WEIGHT_DECAY)
        return jax.jit(step)(state, batch, key)

    s_ref, m_ref = step_with(False)
    s_got, m_got = step_with(mode)
    np.testing.assert_allclose(float(m_got["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_got.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # identical variable trees (remat wrappers must not change names)
    assert (jax.tree_util.tree_structure(s_got.params)
            == jax.tree_util.tree_structure(s_ref.params))
