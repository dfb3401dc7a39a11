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
