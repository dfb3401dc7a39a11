"""Sharding tests on the 8-virtual-device CPU mesh.

Validates the distribution design (SURVEY.md §7 step 5): a data×model mesh,
batch sharded on 'data', head tensor-parallel on 'model', full train step
compiling and executing under jit with sharded inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from x3d_tpu import variant_config
from x3d_tpu.models import create_model
from x3d_tpu.parallel import (
    batch_sharding,
    create_mesh,
    shard_batch,
    shard_state,
)
from x3d_tpu.train import create_train_state, make_eval_step, make_train_step


def tiny_cfg():
    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 16
    cfg.NETWORK.DROPOUT_RATE = 0.0
    cfg.TEST.NUM_TEMPORAL_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    return cfg


def test_mesh_shapes(eight_devices):
    mesh = create_mesh(data=-1, model=1, devices=eight_devices)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh(data=4, model=2, devices=eight_devices)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(data=-1, model=3, devices=eight_devices)


@pytest.mark.parametrize("data,model_ax", [(8, 1), (4, 2)])
def test_sharded_train_step_runs(eight_devices, data, model_ax):
    """Full train step over a (data x model) mesh: compiles, executes,
    keeps batch sharded and params in their TP layout."""
    mesh = create_mesh(data=data, model=model_ax, devices=eight_devices)
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    B = 8
    video = jax.random.normal(key, (B, 4, 16, 16, 3))
    label = jnp.arange(B) % 16

    state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
    state = shard_state(state, mesh)
    batch = shard_batch({"video": video, "label": label}, mesh)

    def fc1_cols_sharded(s):
        # with a size-1 model axis jax may canonicalize the spec; only a
        # real TP split must preserve the column sharding
        shard_cols = s.params["fc_1"]["kernel"].sharding.shard_shape(
            s.params["fc_1"]["kernel"].shape)[1]
        return shard_cols == 2048 // model_ax

    assert fc1_cols_sharded(state)
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    new_state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))
    # params keep their sharding across the update
    assert fc1_cols_sharded(new_state)
    assert int(new_state.step) == 1


def test_sharded_batch_layout(eight_devices):
    mesh = create_mesh(devices=eight_devices)
    x = jnp.zeros((16, 4, 8, 8, 3))
    sharded = shard_batch({"video": x}, mesh)["video"]
    assert sharded.sharding == batch_sharding(mesh)
    # each device holds 1/8 of the batch
    shard_shape = sharded.sharding.shard_shape(sharded.shape)
    assert shard_shape[0] == 2


def test_global_batch_stats_identical_to_single_device(eight_devices):
    """BN under pjit reduces over the *global* batch: the sharded step must
    produce the same new batch_stats as an unsharded run."""
    mesh = create_mesh(devices=eight_devices)
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (8, 4, 16, 16, 3))
    label = jnp.arange(8) % 16
    batch = {"video": video, "label": label}

    state0 = create_train_state(cfg, model, key, video, steps_per_epoch=2)
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    ref_state, ref_metrics = step(state0, batch, key)

    sh_state = shard_state(state0, mesh)
    sh_batch = shard_batch(batch, mesh)
    new_state, metrics = step(sh_state, sh_batch, key)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    ref_bn = ref_state.batch_stats["conv_1"]["bn"]["norm"]["mean"]
    sh_bn = new_state.batch_stats["conv_1"]["bn"]["norm"]["mean"]
    np.testing.assert_allclose(np.asarray(sh_bn), np.asarray(ref_bn),
                               rtol=2e-4, atol=1e-6)


def test_per_replica_bn_differs_from_global(eight_devices):
    """TPU.SYNC_BN=False semantics (reference MirroredStrategy parity):

    * shards seeing different data produce different normalisation than
      global BN (per-group statistics really are local);
    * running stats equal the cross-group mean of the per-group batch
      stats (MirroredStrategy's mean variable aggregation);
    * with identical data in every shard, per-replica == global.
    """
    mesh = create_mesh(data=4, model=1, devices=eight_devices[:4])
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    B = 8
    video = jax.random.normal(key, (B, 4, 16, 16, 3))
    label = jnp.arange(B) % 16
    batch = {"video": video, "label": label}

    sync = create_model(cfg, dtype=jnp.float32)
    local = create_model(cfg, dtype=jnp.float32, bn_groups=4)
    state = create_train_state(cfg, sync, key, video, steps_per_epoch=2)
    # same params/stats drive both models (identical variable trees)
    st_sync = shard_state(state, mesh)
    sh_batch = shard_batch(batch, mesh)

    step_sync = jax.jit(make_train_step(sync, cfg.NETWORK.WEIGHT_DECAY))
    step_local = jax.jit(make_train_step(local, cfg.NETWORK.WEIGHT_DECAY))
    out_sync, m_sync = step_sync(st_sync, sh_batch, key)
    out_local, m_local = step_local(st_sync, sh_batch, key)

    bn = lambda s: np.asarray(
        s.batch_stats["conv_1"]["bn"]["norm"]["var"])
    # heterogeneous shards: local variance of each group < global variance
    # in general, so the running stats (and the loss) must diverge
    assert not np.allclose(bn(out_sync), bn(out_local), rtol=1e-5)
    assert abs(float(m_sync["loss"]) - float(m_local["loss"])) > 1e-7

    # running stats = mean over the per-group batch stats: recompute on host
    xg = np.asarray(video, np.float64).reshape(4, 2, -1, video.shape[-1])
    g_mean = xg.mean(axis=(1, 2))
    from x3d_tpu.models.x3d import GroupedBatchNorm
    gbn = GroupedBatchNorm(momentum=0.9, eps=1e-5, groups=4,
                           dtype=jnp.float32)
    v = gbn.init({"params": key}, video, True)
    y, mut = gbn.apply(v, video, True, mutable=["batch_stats"])
    got_mean = np.asarray(mut["batch_stats"]["mean"])
    np.testing.assert_allclose(got_mean, 0.1 * g_mean.mean(0), rtol=1e-4,
                               atol=1e-6)
    # per-group normalisation: group 0's slice normalised by its own stats
    x0 = np.asarray(video[:2], np.float64)
    m0 = x0.mean(axis=(0, 1, 2, 3))
    v0 = x0.var(axis=(0, 1, 2, 3))
    expect0 = (x0 - m0) / np.sqrt(v0 + 1e-5)
    np.testing.assert_allclose(np.asarray(y[:2]), expect0, rtol=1e-3,
                               atol=1e-4)

    # homogeneous shards: tile one shard's data everywhere -> local == global
    tiled = jnp.tile(video[:2], (4, 1, 1, 1, 1))
    tb = shard_batch({"video": tiled, "label": label}, mesh)
    s1, m1 = step_sync(st_sync, tb, key)
    s2, m2 = step_local(st_sync, tb, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(bn(s1), bn(s2), rtol=1e-4, atol=1e-6)


def test_sync_bn_config_wires_into_runtime(eight_devices, tmp_path):
    """TPU.SYNC_BN=False must reach the model via setup_runtime."""
    from x3d_tpu.tools.common import load_config, setup_runtime

    yaml = tmp_path / "cfg.yaml"
    yaml.write_text("TPU:\n  SYNC_BN: False\n")
    cfg = load_config(str(yaml))
    mesh, model, _ = setup_runtime(cfg, 8, False, False)
    assert model.bn_groups == mesh.shape["data"] == 8
    yaml2 = tmp_path / "cfg2.yaml"
    yaml2.write_text("TPU:\n  SYNC_BN: True\n")
    _, model2, _ = setup_runtime(load_config(str(yaml2)), 8, False, False)
    assert model2.bn_groups == 1


def test_runtime_downgrades_pallas_impls_on_mesh(eight_devices, tmp_path):
    """Pallas op impls have no SPMD partitioning rule: setup_runtime must
    reset a leftover set_default_impl selection on a multi-device mesh."""
    from x3d_tpu.ops import depthwise, pointwise
    from x3d_tpu.tools.common import load_config, setup_runtime

    yaml = tmp_path / "cfg.yaml"
    yaml.write_text("TPU:\n  SYNC_BN: True\n")
    old_dw, old_pw = depthwise._DEFAULT_IMPL, pointwise._DEFAULT_IMPL
    try:
        depthwise.set_default_impl("pbwd")
        pointwise.set_default_impl("mxu_seg")
        setup_runtime(load_config(str(yaml)), 8, False, False)
        assert depthwise._DEFAULT_IMPL == "xla"
        assert pointwise._DEFAULT_IMPL == "conv"
        # single-device: explicit selections are left alone
        depthwise.set_default_impl("pbwd")
        pointwise.set_default_impl("mxu_seg")
        setup_runtime(load_config(str(yaml)), 1, False, False)
        assert depthwise._DEFAULT_IMPL == "pbwd"
        assert pointwise._DEFAULT_IMPL == "mxu_seg"
    finally:
        depthwise.set_default_impl(old_dw)
        pointwise.set_default_impl(old_pw)


def test_eval_step_sharded(eight_devices):
    mesh = create_mesh(devices=eight_devices)
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    views = 2
    video = jax.random.normal(key, (8 * views, 4, 16, 16, 3))
    label = jnp.arange(8) % 16
    state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
    state = shard_state(state, mesh)
    batch = shard_batch({"video": video, "label": label}, mesh)
    out = jax.jit(make_eval_step(model))(state, batch)
    assert float(out["count"]) == 8.0


def _compiled_all_reduces(model, cfg, mesh, video, label, key):
    """Compile the sharded train step and return its all-reduce instructions
    as (is_forward, op_name, n_groups, group_size) tuples."""
    import re

    state = shard_state(
        create_train_state(cfg, model, key, video, steps_per_epoch=2), mesh)
    batch = shard_batch({"video": video, "label": label}, mesh)
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    txt = step.lower(state, batch, key).compile().as_text()

    out = []
    for line in txt.splitlines():
        if not re.search(r'\ball-reduce(-start)?\(', line):
            continue
        op_name = (re.search(r'op_name="([^"]*)"', line) or [None, ""])[1]
        m = re.search(r'replica_groups=\{\{(.+?)\}\}', line)
        if m:  # explicit groups {{0,1},{2,3},...}
            groups = m.group(1).split("},{")
            count = len(groups)
            size = len(groups[0].split(","))
        else:  # iota form [G,S]<=...
            m = re.search(r'replica_groups=\[(\d+),(\d+)\]', line)
            count, size = (int(m.group(1)), int(m.group(2))) if m else (0, 0)
        out.append(("transpose(" not in op_name, op_name, count, size))
    return out


def test_compiled_hlo_collectives(eight_devices):
    """Verify the SPMD claims at the HLO level (not just numerically):

    (a) with per-replica BN (``TPU.SYNC_BN=False`` -> ``bn_groups=data``)
        NO collective is attributable to BN statistics — the zero-ICI claim
        of ``GroupedBatchNorm`` (models/x3d.py) — in both the plain and the
        aligned bottleneck modes;
    (b) gradient all-reduces exist (synchronous data parallelism is real);
    (c) the tensor-parallel head inserts exactly one forward all-reduce —
        fc_2's row-sharded matmul partial sums — over the model-axis groups
        (fc_1's column-sharded matmul needs none).
    """
    from x3d_tpu.ops import dw_fused

    mesh = create_mesh(data=4, model=2, devices=eight_devices)
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((8, 4, 16, 16, 3))
    label = jnp.arange(8) % 16
    sync = create_model(cfg, dtype=jnp.float32)
    grouped = create_model(cfg, dtype=jnp.float32, bn_groups=4)

    def forward_in_model(ars):
        # forward-pass all-reduces inside the X3D scope (BN statistics and
        # anything else crossing the batch axis in the model itself)
        return [a for a in ars if a[0] and "X3D)/" in a[1]]

    ars_sync = _compiled_all_reduces(sync, cfg, mesh, video, label, key)
    ars_grp = _compiled_all_reduces(grouped, cfg, mesh, video, label, key)
    old = dw_fused._ENABLED
    try:
        dw_fused.set_enabled("aligned")
        ars_grp_al = _compiled_all_reduces(grouped, cfg, mesh, video, label,
                                           key)
    finally:
        dw_fused.set_enabled(old)

    # detection is not vacuous: sync BN really does all-reduce its stats
    sync_bn = [a for a in forward_in_model(ars_sync) if "/norm/" in a[1]]
    assert len(sync_bn) >= 5, ars_sync

    for name, ars in [("plain", ars_grp), ("aligned", ars_grp_al)]:
        fwd = forward_in_model(ars)
        # (c) exactly one forward in-model all-reduce: the fc_2 TP reduce,
        # over the model axis (4 groups of 2 on the 4x2 mesh)
        assert len(fwd) == 1, (name, fwd)
        is_fwd, op_name, n_groups, group_size = fwd[0]
        assert "fc_2" in op_name, (name, fwd)
        assert (n_groups, group_size) == (4, 2), (name, fwd)
        # (a) nothing BN-statistics-shaped crosses the ICI
        assert not any("/norm/" in a[1] for a in fwd), (name, fwd)
        # (b) gradient all-reduces exist
        assert any(not a[0] for a in ars), name


def test_aligned_mode_sharded_matches_unfused(eight_devices):
    """The "aligned" bottleneck mode is plain XLA ops and must be SPMD-safe:
    a sharded train step under it produces the same loss/metrics as the
    reference composition on the same mesh."""
    from x3d_tpu.ops import dw_fused

    mesh = create_mesh(data=8, model=1, devices=eight_devices)
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    B = 8
    video = jax.random.normal(key, (B, 4, 16, 16, 3))
    label = jnp.arange(B) % 16

    def run():
        state = shard_state(
            create_train_state(cfg, model, key, video, steps_per_epoch=2),
            mesh)
        batch = shard_batch({"video": video, "label": label}, mesh)
        step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
        new_state, metrics = step(state, batch, key)
        return new_state, metrics

    old = dw_fused._ENABLED
    try:
        dw_fused.set_enabled(False)
        _, m_ref = run()
        dw_fused.set_enabled("aligned")
        st_al, m_al = run()
    finally:
        dw_fused.set_enabled(old)
    np.testing.assert_allclose(float(m_al["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_al["acc"]), float(m_ref["acc"]))
    # batch stats updated under SPMD match global-reduction semantics
    leaf_ref = jax.tree_util.tree_leaves(run()[0].batch_stats)[0]
    assert np.isfinite(np.asarray(leaf_ref)).all()


def test_time_fold_sharded_matches_unfolded(eight_devices):
    """The time-folded layout under an 8-way data mesh: the (B,T,...) ->
    (B*T,1,...) reshape of the sharded batch axis must compile, keep the
    fold exact (same loss/batch stats as the unsharded unfolded run), and
    work with grouped/per-replica BN."""
    mesh = create_mesh(devices=eight_devices)
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(3)
    video = jax.random.normal(key, (8, 4, 16, 16, 3))
    label = jnp.arange(8) % 16
    batch = {"video": video, "label": label}

    base = create_model(cfg, dtype=jnp.float32, time_fold=False)
    state0 = create_train_state(cfg, base, key, video, steps_per_epoch=2)
    step = jax.jit(make_train_step(base, cfg.NETWORK.WEIGHT_DECAY))
    ref_state, ref_metrics = step(state0, batch, key)

    for bn_groups in (1, 8):
        folded = create_model(cfg, dtype=jnp.float32, time_fold=True,
                              bn_groups=bn_groups)
        statef = create_train_state(cfg, folded, key, video,
                                    steps_per_epoch=2)
        stepf = jax.jit(make_train_step(folded, cfg.NETWORK.WEIGHT_DECAY))
        sh_state = shard_state(statef, mesh)
        sh_batch = shard_batch(batch, mesh)
        new_state, metrics = stepf(sh_state, sh_batch, key)
        if bn_groups == 1:
            # global BN: exact parity with the unsharded unfolded step
            np.testing.assert_allclose(float(metrics["loss"]),
                                       float(ref_metrics["loss"]),
                                       rtol=1e-5)
            ref_bn = ref_state.batch_stats["conv_1"]["bn"]["norm"]["mean"]
            sh_bn = new_state.batch_stats["conv_1"]["bn"]["norm"]["mean"]
            np.testing.assert_allclose(np.asarray(sh_bn),
                                       np.asarray(ref_bn),
                                       rtol=2e-4, atol=1e-6)
        else:
            # per-replica BN on folded shards still executes and is finite
            assert np.isfinite(float(metrics["loss"]))


def test_compiled_hlo_collectives_folded(eight_devices):
    """The zero-ICI per-replica-BN claim must survive the time-folded
    layout: compile the folded grouped-BN step on a 4x2 mesh and assert
    the same collective structure as the unfolded test — exactly one
    forward in-model all-reduce (the fc_2 TP reduce), nothing
    BN-statistics-shaped, gradient all-reduces present."""
    mesh = create_mesh(data=4, model=2, devices=eight_devices)
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((8, 4, 16, 16, 3))
    label = jnp.arange(8) % 16
    folded = create_model(cfg, dtype=jnp.float32, bn_groups=4,
                          time_fold=True)
    ars = _compiled_all_reduces(folded, cfg, mesh, video, label, key)
    fwd = [a for a in ars if a[0] and "X3D)/" in a[1]]
    assert len(fwd) == 1, fwd
    assert "fc_2" in fwd[0][1], fwd
    assert (fwd[0][2], fwd[0][3]) == (4, 2), fwd
    assert not any("/norm/" in a[1] for a in fwd), fwd
    assert any(not a[0] for a in ars)
