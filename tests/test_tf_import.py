"""TF-checkpoint import mapping, validated against the REAL reference index.

The reference repo ships the checkpoint .index files (the .data blobs are
stripped), which is enough to verify that every published variable maps to
an existing, shape-compatible slot in our param tree.
"""

import os

import jax
import jax.numpy as jnp
import pytest

tf = pytest.importorskip("tensorflow")

from x3d_tpu import variant_config
from x3d_tpu.models import create_model
from x3d_tpu.tools.import_tf_checkpoint import map_variable, verify_mapping

REF = "/root/reference/models"


def _abstract_variables(name):
    cfg = variant_config(name)
    model = create_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 32, 32, 3))
    return jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False,
                           return_logits=True))


def test_map_variable_examples():
    assert map_variable(
        "conv1/conv_s/kernel/.ATTRIBUTES/VARIABLE_VALUE") == (
        "params", "conv_1", "conv_s", "kernel")
    assert map_variable(
        "conv1/bn/moving_mean/.ATTRIBUTES/VARIABLE_VALUE") == (
        "batch_stats", "conv_1", "bn", "norm", "mean")
    assert map_variable(
        "stages/0/stage/layer_with_weights-1/bottleneck/se_fc1/bias"
        "/.ATTRIBUTES/VARIABLE_VALUE") == (
        "params", "stage2_block1", "bottleneck", "se", "se_fc1", "bias")
    assert map_variable(
        "stages/3/stage/layer_with_weights-0/bn_r/gamma"
        "/.ATTRIBUTES/VARIABLE_VALUE") == (
        "params", "stage5_block0", "bn_r", "norm", "scale")
    assert map_variable(
        "conv5/layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE") == (
        "params", "conv_5", "kernel")
    assert map_variable(
        "fc2/bias/.ATTRIBUTES/VARIABLE_VALUE") == ("params", "fc_2", "bias")
    # optimizer slots are skipped
    assert map_variable(
        "conv1/conv_s/kernel/.OPTIMIZER_SLOT/optimizer/momentum"
        "/.ATTRIBUTES/VARIABLE_VALUE") is None


@pytest.mark.parametrize("variant,folder", [("XS", "X3D-XS"), ("S", "X3D-S"),
                                            ("M", "X3D-M")])
def test_full_mapping_against_reference_index(variant, folder):
    prefix = os.path.join(REF, folder, "model")
    if not os.path.exists(prefix + ".index"):
        pytest.skip("reference checkpoint index not present")
    variables = _abstract_variables(variant)
    stats = verify_mapping(prefix, variables)
    assert stats["errors"] == 0, stats
    # every model variable mapped: 788 total entries, minus optimizer
    # slots/counters; XS/S/M have 115 weight tensors + 2x115... just require
    # a substantial count and zero errors
    assert stats["mapped"] > 300, stats


# --------------------------------------------------- value-level fidelity

def _attach(root, parts, variable):
    """Build nested tf.train.Checkpoint children along ``parts`` and hang
    ``variable`` at the leaf — reproducing TF2.4 object-graph paths."""
    node = root
    for p in parts[:-1]:
        child = getattr(node, p, None)
        if child is None:
            child = tf.train.Checkpoint()
            setattr(node, p, child)
        node = child
    setattr(node, parts[-1], variable)


def test_value_level_import_logit_parity(tmp_path):
    """End-to-end weight fidelity (the published .data blobs are stripped
    upstream, so the test WRITES a real checkpoint):

    build the reference Keras model (random init), hang its weight tensors
    on a nested object graph reproducing the PUBLISHED variable paths
    (asserted identical, pattern-for-pattern, to the real X3D-XS index),
    write a TF checkpoint with .data, run the import tool, and require
    logit parity between the restored x3d_tpu model and the reference —
    any transposed or misrouted kernel in the mapping diverges the logits.

    Reference save path: ``/root/reference/train.py:138-143``.
    """
    import sys
    import types

    import numpy as np

    # --- import the reference model (deps stubbed, as in
    # tests/test_reference_parity.py)
    if not os.path.exists("/root/reference/model.py"):
        pytest.skip("reference tree not mounted")
    from x3d_tpu.config import CfgNode

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)
    wandb = types.ModuleType("wandb")
    wandb_keras = types.ModuleType("wandb.keras")
    wandb_keras.WandbCallback = object
    wandb.keras = wandb_keras
    sys.modules.setdefault("wandb", wandb)
    sys.modules.setdefault("wandb.keras", wandb_keras)
    sys.path.insert(0, "/root/reference")
    try:
        import model as ref_model_module
    except Exception as e:
        pytest.skip(f"reference model not importable: {e}")
    finally:
        sys.path.remove("/root/reference")

    from x3d_tpu.models import init_variables
    from x3d_tpu.tools.import_tf_checkpoint import load_reference_checkpoint

    cfg = variant_config("XS")
    cfg.TEST.NUM_TEMPORAL_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.NETWORK.DROPOUT_RATE = 0.0

    def to_ns(node):
        if isinstance(node, dict):
            return types.SimpleNamespace(
                **{k: to_ns(v) for k, v in node.items()})
        return node

    tf.keras.utils.set_random_seed(0)
    # Quirk Q1 (SURVEY.md §5): the reference's ResBlock/ResStage counters
    # are class attributes that survive across constructions — any earlier
    # test that built a reference model (e.g. the 55-block XL parity case)
    # would shift this model's SE placement off the published
    # first-instance pattern.  Reset to first-instance state.
    ref_model_module.ResBlock._block_index = 0
    ref_model_module.ResStage._stage_index = 2
    ref = ref_model_module.X3D(to_ns(cfg))
    x_np = np.random.RandomState(0).standard_normal(
        (2, 4, 64, 64, 3)).astype(np.float32)
    ref_probs = ref(tf.constant(x_np), training=False).numpy()

    # --- hang every reference weight at its published path
    root = tf.train.Checkpoint()

    def attach_bn(prefix, bn):
        _attach(root, prefix + ["gamma"], bn.gamma)
        _attach(root, prefix + ["beta"], bn.beta)
        _attach(root, prefix + ["moving_mean"], bn.moving_mean)
        _attach(root, prefix + ["moving_variance"], bn.moving_variance)

    _attach(root, ["conv1", "conv_s", "kernel"], ref.conv1.conv_s.kernel)
    _attach(root, ["conv1", "conv_t", "kernel"], ref.conv1.conv_t.kernel)
    attach_bn(["conv1", "bn"], ref.conv1.bn)
    for si, stage in enumerate(ref.stages):
        for bi, blk in enumerate(stage.stage.layers):
            base = ["stages", str(si), "stage", f"layer_with_weights-{bi}"]
            bt = blk.bottleneck
            for conv in ("a", "b", "c"):
                _attach(root, base + ["bottleneck", conv, "kernel"],
                        getattr(bt, conv).kernel)
            for bn in ("bn_a", "bn_b", "bn_c"):
                attach_bn(base + ["bottleneck", bn], getattr(bt, bn))
            if hasattr(bt, "se_fc1"):
                for fc in ("se_fc1", "se_fc2"):
                    _attach(root, base + ["bottleneck", fc, "kernel"],
                            getattr(bt, fc).kernel)
                    _attach(root, base + ["bottleneck", fc, "bias"],
                            getattr(bt, fc).bias)
            if hasattr(blk, "residual"):
                _attach(root, base + ["residual", "kernel"],
                        blk.residual.kernel)
                attach_bn(base + ["bn_r"], blk.bn_r)
    _attach(root, ["conv5", "layer_with_weights-0", "kernel"],
            ref.conv5.layers[0].kernel)
    attach_bn(["conv5", "layer_with_weights-1"], ref.conv5.layers[1])
    _attach(root, ["fc1", "kernel"], ref.fc1.kernel)
    _attach(root, ["fc2", "kernel"], ref.fc2.kernel)
    _attach(root, ["fc2", "bias"], ref.fc2.bias)

    prefix = str(tmp_path / "model")
    root.write(prefix)

    # the constructed name set must match the published index's model
    # variables exactly (same path grammar, full XS block structure)
    written = {n for n, _ in tf.train.list_variables(prefix)
               if map_variable(n)}
    published_prefix = os.path.join(REF, "X3D-XS", "model")
    if os.path.exists(published_prefix + ".index"):
        published = {n for n, _ in tf.train.list_variables(published_prefix)
                     if map_variable(n)}
        assert written == published

    # --- import and compare logits
    model = create_model(cfg, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0),
                               jnp.asarray(x_np))
    loaded = load_reference_checkpoint(prefix, variables)
    ours = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(loaded, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(ours), ref_probs, atol=2e-4,
                               rtol=1e-3)
