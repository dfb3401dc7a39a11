"""Import reference TensorFlow checkpoints into x3d_tpu param trees.

The reference publishes TF object-based checkpoints (models/X3D-{XS,S,M};
SURVEY.md C25) whose variable paths look like::

    conv1/conv_s/kernel/.ATTRIBUTES/VARIABLE_VALUE
    stages/0/stage/layer_with_weights-1/bottleneck/a/kernel/...
    conv5/layer_with_weights-0/kernel/...   fc1/kernel/...   fc2/bias/...

This module maps every such path onto this framework's param/batch_stats
tree (kernel layouts are identical by construction; fc1's 1x1x1 conv kernel
reshapes to our Dense kernel), enabling logit-level parity checks against
pretrained reference weights.

Usable as a library (``load_reference_checkpoint``) or a CLI::

    python -m x3d_tpu.tools.import_tf_checkpoint \
        --ckpt=/root/reference/models/X3D-XS/model \
        --config=x3d_tpu/configs/kinetics/X3D_XS.yaml \
        --output=/tmp/x3d_xs_orbax

TensorFlow is required only by this tool, never at train/serve time.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"

_BN_LEAF = {"gamma": ("params", "scale"), "beta": ("params", "bias"),
            "moving_mean": ("batch_stats", "mean"),
            "moving_variance": ("batch_stats", "var")}


def map_variable(name: str, num_stages: int = 4) -> Optional[Tuple[str, ...]]:
    """Reference variable path -> (collection, key, key, ...) in our tree.

    Returns None for non-model variables (optimizer slots, counters).
    """
    if not name.endswith(SUFFIX):
        return None
    if "OPTIMIZER_SLOT" in name or name.startswith("optimizer/") or \
            name.startswith("save_counter"):
        return None
    path = name[: -len(SUFFIX)]
    parts = path.split("/")

    def bn(prefix: Tuple[str, ...], leaf: str):
        coll, key = _BN_LEAF[leaf]
        return (coll,) + prefix + ("norm", key)

    # stem
    if parts[0] == "conv1":
        if parts[1] == "bn":
            return bn(("conv_1", "bn"), parts[2])
        return ("params", "conv_1", parts[1], parts[2])

    # residual stages
    if parts[0] == "stages":
        stage = int(parts[1]) + 2                 # paper-style numbering
        assert parts[2] == "stage"
        m = re.match(r"layer_with_weights-(\d+)", parts[3])
        block = f"stage{stage}_block{int(m.group(1))}"
        rest = parts[4:]
        if rest[0] == "bn_r":
            return bn((block, "bn_r"), rest[1])
        if rest[0] == "residual":
            return ("params", block, "residual", rest[1])
        assert rest[0] == "bottleneck"
        inner = rest[1]
        if inner.startswith("bn_"):
            return bn((block, "bottleneck", inner), rest[2])
        if inner.startswith("se_fc"):
            return ("params", block, "bottleneck", "se", inner, rest[2])
        return ("params", block, "bottleneck", inner, rest[2])

    # head
    if parts[0] == "conv5":
        if parts[1] == "layer_with_weights-0":
            return ("params", "conv_5", parts[2])
        return bn(("bn_5",), parts[2])
    if parts[0] == "fc1":
        return ("params", "fc_1", parts[1])
    if parts[0] == "fc2":
        return ("params", "fc_2", parts[1])
    return None


def _set_in(tree: Dict, keys: Tuple[str, ...], value) -> None:
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def _get_in(tree: Dict, keys: Tuple[str, ...]):
    node = tree
    for k in keys:
        node = node[k]
    return node


def load_reference_checkpoint(ckpt_prefix: str, variables: Dict) -> Dict:
    """Fill a flax variables dict {params, batch_stats} from a TF checkpoint.

    Every model variable in the checkpoint must map onto the tree (missing
    targets raise); returns a new variables dict (float32).
    """
    import jax
    import numpy as np
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_prefix)
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    new_vars = {
        "params": jax.tree_util.tree_map(lambda x: x, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            lambda x: x, variables["batch_stats"]),
    }
    loaded = 0
    for name, _ in tf.train.list_variables(ckpt_prefix):
        target = map_variable(name)
        if target is None:
            continue
        value = np.asarray(reader.get_tensor(name))
        current = _get_in(new_vars, target)
        if value.shape != current.shape:
            value = value.reshape(current.shape)   # fc1 conv-kernel -> dense
        _set_in(new_vars, target, value.astype(np.float32))
        loaded += 1
    if loaded == 0:
        raise ValueError(f"No model variables found in {ckpt_prefix}")
    return new_vars


def verify_mapping(ckpt_prefix: str, variables: Dict) -> Dict[str, int]:
    """Check every checkpoint variable maps to an existing, shape-compatible
    slot (works from the .index alone — no .data needed)."""
    import numpy as np
    import tensorflow as tf

    stats = {"mapped": 0, "skipped": 0, "errors": 0}
    for name, shape in tf.train.list_variables(ckpt_prefix):
        target = map_variable(name)
        if target is None:
            stats["skipped"] += 1
            continue
        try:
            current = _get_in(variables, target)
        except KeyError:
            stats["errors"] += 1
            print(f"MISSING target {target} for {name}")
            continue
        ours = tuple(current.shape)  # works for arrays and ShapeDtypeStructs
        if ours != tuple(shape) and \
                int(np.prod(shape)) != int(np.prod(ours)):
            stats["errors"] += 1
            print(f"SHAPE mismatch {name}: ckpt {shape} vs ours {ours}")
            continue
        stats["mapped"] += 1
    return stats


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("ckpt", None, "TF checkpoint prefix (e.g. .../model)")
    flags.DEFINE_string("config", None, "Variant config yaml.")
    flags.DEFINE_string("output", None, "Orbax output directory.")
    flags.DEFINE_bool("verify_only", False,
                      "Only verify the name mapping (works without .data).")
    FLAGS = flags.FLAGS

    def run(_):
        import jax
        import jax.numpy as jnp

        from x3d_tpu.models import create_model
        from x3d_tpu.tools.common import load_config

        cfg = load_config(FLAGS.config)
        model = create_model(cfg, dtype=jnp.float32)
        x = jnp.zeros((1, cfg.DATA.TEMP_DURATION, 32, 32, 3))
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False, return_logits=True))
        if FLAGS.verify_only:
            stats = verify_mapping(FLAGS.ckpt, variables)
            print(stats)
            return
        from x3d_tpu.models import init_variables
        variables = init_variables(model, jax.random.PRNGKey(0), x)
        loaded = load_reference_checkpoint(FLAGS.ckpt, variables)
        if FLAGS.output:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(FLAGS.output, loaded)
            ckptr.wait_until_finished()
            print(f"saved to {FLAGS.output}")

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
