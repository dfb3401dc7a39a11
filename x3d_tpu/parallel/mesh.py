"""Mesh + sharding-spec plumbing — the distribution backend of the framework.

The reference's only distribution strategy is synchronous data parallelism
via ``tf.distribute.MirroredStrategy`` (NCCL all-reduce, single host —
reference ``utils.py:144-174``, SURVEY.md §2).  The TPU-native design is a
``jax.sharding.Mesh`` over every chip with two logical axes:

  * ``data``  — the batch dimension of every array in the step is sharded
    here; XLA emits the gradient/BN all-reduces over ICI automatically.
  * ``model`` — optional tensor parallelism for the classifier head, where
    X3D's largest matmuls live (fc1 is C×2048): fc_1's columns and fc_2's
    rows are sharded so the 2048-wide activation stays distributed between
    them and XLA inserts a single reduce-scatter/all-reduce pair.

Everything else (conv kernels, BN params, stats) is replicated — X3D bodies
are small (≤11 M params) so replication is the right call; the mesh exists
to scale *throughput* (data axis) and to demonstrate/absorb larger heads
(model axis).  Multi-host works transparently: ``jax.devices()`` spans hosts
under ``jax.distributed``, the data axis rides DCN between hosts and ICI
within them.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data × model) mesh; ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1:
        raise ValueError("model axis size must be >= 1")
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, "
                         f"have {n}")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg, devices=None) -> Mesh:
    return create_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_MODEL, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path_keys, leaf) -> P:
    """Partition rule for one parameter: head TP, everything else replicated."""
    if "fc_1" in path_keys and path_keys[-1] == "kernel":
        return P(None, MODEL_AXIS)          # (C, 2048) columnwise
    if "fc_2" in path_keys and path_keys[-1] == "kernel":
        return P(MODEL_AXIS, None)          # (2048, classes) rowwise
    return P()


def _path_keys(path) -> list:
    return [getattr(p, "key", getattr(p, "name", "")) for p in path]


def state_shardings(state, mesh: Mesh):
    """A TrainState-shaped pytree of NamedShardings (params get TP rules;
    optimizer slots follow their parameters; stats/step replicated)."""

    def spec_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, _param_spec(_path_keys(path), leaf)),
            tree,
        )

    def like_params(tree):
        # optimizer state contains momentum/trace pytrees mirroring params
        # plus scalar counters; map param-shaped leaves via path rules.
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(
                mesh,
                _param_spec(_path_keys(path), leaf) if hasattr(leaf, "ndim") and leaf.ndim >= 2 else P(),
            ),
            tree,
        )

    return state.replace(
        step=replicate(mesh),
        params=spec_tree(state.params),
        batch_stats=jax.tree_util.tree_map(lambda _: replicate(mesh),
                                           state.batch_stats),
        opt_state=like_params(state.opt_state),
    )


def shard_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh according to the partition rules."""
    shardings = state_shardings(state, mesh)
    return jax.tree_util.tree_map(
        jax.device_put, state, shardings,
        is_leaf=lambda x: x is None,
    )


def shard_batch(batch: Any, mesh: Mesh):
    """Place a host batch (dict of arrays) with the batch dim on the data axis.

    Single-process: a plain ``device_put``.  Multi-host (``jax.distributed``
    initialised, mesh spanning processes): each process contributes its
    *local* batch and the result is the global sharded array — the
    per-host-sharded feed described in SURVEY.md §5.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch,
    )
