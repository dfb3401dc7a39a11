"""Shared CLI plumbing for the train/eval tools."""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from x3d_tpu import get_default_config
from x3d_tpu.models import create_model
from x3d_tpu.parallel import create_mesh

log = logging.getLogger(__name__)


def load_config(config_path: str, opts=None):
    assert config_path.endswith((".yaml", ".yml")), \
        "Please provide a path to a yaml file."
    cfg = get_default_config()
    cfg.merge_from_file(config_path)
    if opts:
        # each --opts entry is "KEY VALUE" or "KEY=VALUE"
        flat = []
        for o in opts:
            flat.extend(o.replace("=", " ").split())
        cfg.merge_from_list(flat)
    cfg.freeze()
    return cfg


def setup_runtime(cfg, num_chips: int, precision_bf16: bool, debug: bool):
    """Mesh + model for the requested chip count / precision.

    The reference's ``get_strategy(num_gpus)`` analog (``utils.py:144-174``):
    ``num_chips`` bounds how many local devices join the data axis
    (0/None = all).  Debug mode enables NaN checking and a fixed seed
    (reference ``train.py:60-67`` used eager + determinism flags).
    """
    if debug:
        jax.config.update("jax_debug_nans", True)
        logging.getLogger().setLevel(logging.DEBUG)

    from x3d_tpu.utils import enable_compilation_cache
    enable_compilation_cache()   # absorbs the remote-compile tunnel cost
                                 # across CLI invocations (utils.py)

    devices = jax.devices()
    if num_chips:
        devices = devices[:num_chips]
    model_ax = cfg.TPU.MESH_MODEL
    data_ax = cfg.TPU.MESH_DATA
    if data_ax == -1:
        data_ax = max(1, len(devices) // model_ax)
    mesh = create_mesh(data=data_ax, model=model_ax, devices=devices)

    dtype = jnp.bfloat16 if precision_bf16 else jnp.float32
    # TPU.SYNC_BN=False: reproduce the reference's per-replica BN statistics
    # (MirroredStrategy semantics) by splitting the batch into one BN group
    # per data-axis shard; default True = globally synced statistics.
    bn_groups = 1 if cfg.TPU.SYNC_BN else mesh.shape["data"]

    # Bottleneck segment mode (models/x3d.py): "auto" resolves to the
    # "aligned" restructure on TPU at full-lane batches — plain XLA ops,
    # SPMD-safe under pjit on any mesh (the BN stat sums become global
    # reductions, matching SYNC_BN=True semantics).  The opt-in Pallas
    # mode has no SPMD partitioning rule and is single-device only.
    from x3d_tpu.ops import dw_fused
    fused = cfg.TPU.FUSED_DW if "FUSED_DW" in cfg.TPU else "auto"
    if fused in (True, "pallas") and len(devices) > 1:
        log.warning("TPU.FUSED_DW=pallas has no SPMD rule; using 'aligned' "
                    "on the %d-device mesh", len(devices))
        fused = "aligned"
    dw_fused.set_enabled(fused)
    # Same rule for the op-dispatch hooks (tools.ab / set_default_impl may
    # have left a Pallas impl selected in this process): the Pallas
    # kernels have no SPMD partitioning rule — downgrade to the XLA
    # lowerings on multi-device meshes.
    from x3d_tpu.ops import depthwise, pointwise
    if len(devices) > 1:
        if depthwise._DEFAULT_IMPL not in ("xla", "shift", "shift_cvjp"):
            log.warning("depthwise impl %r has no SPMD rule; using 'xla' on "
                        "the %d-device mesh", depthwise._DEFAULT_IMPL,
                        len(devices))
            depthwise.set_default_impl("xla")
        if pointwise._DEFAULT_IMPL not in ("conv", "einsum", "auto"):
            log.warning("pointwise impl %r has no SPMD rule; using 'conv' on "
                        "the %d-device mesh", pointwise._DEFAULT_IMPL,
                        len(devices))
            pointwise.set_default_impl("conv")
    # Time-folded layout: resolve "auto" against the PER-DEVICE batch (the
    # model's own auto gate only sees the global shape) — under SPMD each
    # device's shard is what under/overfills the 128 lanes.  E.g. global
    # batch 128 on an 8-chip data mesh is 16 clips/device: unfolded that
    # wastes 8x lane padding on every shard (docs/PERF.md round 3).
    time_fold = cfg.TPU.TIME_FOLD if "TIME_FOLD" in cfg.TPU else False
    local = max(1, cfg.TRAIN.BATCH_SIZE // mesh.shape["data"])
    if time_fold == "auto":
        from x3d_tpu.models.x3d import resolve_time_fold
        fold_train = resolve_time_fold("auto", local, cfg.DATA.TEMP_DURATION,
                                       train=True)
        # Threshold form folds TRAINING calls with batch ≤ TRAIN.BATCH_SIZE
        # only; eval calls never fold under a threshold (resolve_time_fold)
        # — folded eval loses even at small L/XL view-ensemble batches
        # (48-clip: 178 vs 246 clips/s, docs/PERF.md).
        time_fold = cfg.TRAIN.BATCH_SIZE if fold_train else False
    # Folding shrinks the 312^2 variants' lane-padded activations enough
    # that no-remat fits at the production per-device batch (measured
    # v5e-1: L B16 11.74 GB, XL B16 14.96 GB) and runs ~27% faster than
    # block remat (L 39.1 -> 49.7 clips/s) — resolve REMAT="auto"
    # accordingly; explicit settings are respected.
    remat = None
    if (time_fold and cfg.TPU.REMAT == "auto"
            and cfg.DATA.TRAIN_CROP_SIZE >= 312 and local <= 16):
        remat = False
    model = create_model(cfg, dtype=dtype, bn_groups=bn_groups,
                         remat=remat, time_fold=time_fold)
    log.info("mesh=%s devices=%d dtype=%s bn_groups=%d backend=%s",
             dict(mesh.shape), len(devices), dtype.__name__, bn_groups,
             jax.default_backend())
    return mesh, model, dtype
