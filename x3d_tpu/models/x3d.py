"""The X3D network family as pure-functional Flax modules.

Architecture parity with the reference (``/root/reference/model.py``):

  * Stem (``model.py:134-210``): explicit (0,1,1) spatial pad → 1×3×3 conv
    stride (1,2,2) → explicit (k//2,0,0) temporal pad → k×1×1 depthwise conv
    → BN → ReLU.
  * Bottleneck (``model.py:212-320``): 1×1×1 conv → BN → ReLU → T×3×3
    depthwise conv, spatial stride → BN → [SE] → swish → 1×1×1 conv → BN.
  * SE placement (``model.py:275,311,326,350-351`` — "Q1" in SURVEY.md §5):
    the reference decides SE from a never-reset *class-level* global block
    counter; for the first model built in a process, SE lands on blocks with
    even 0-based global index across all stages.  Here that pattern is
    computed deterministically at arch-build time, so every instantiation
    matches the reference's first instance.
  * ResBlock (``model.py:322-394``): projection shortcut (1×1×1 conv,
    stride (1,s,s), + BN) iff channels change or stride ≠ 1; add → ReLU.
  * Head (``model.py:78-111``): conv5 1×1×1 → BN → ReLU → global average
    pool → fc1 (2048, no bias, ReLU) → dropout → fc2 → float32 softmax.
  * Eval-time view ensembling (``model.py:123-127``): probabilities reshaped
    to (-1, num_views, classes) and averaged over views.

TPU-first design notes: NDHWC layout keeps channels on the 128-wide lane
dimension; 1×1×1 convs go through ``x3d_tpu.ops.pointwise`` and depthwise
T×3×3 convs through ``x3d_tpu.ops.depthwise`` (benchmark-dispatched
lowerings; Pallas kernels in ``ops/pallas_dw.py``); BatchNorm statistics
are float32 while conv/normalisation compute is bfloat16.  Under ``pjit``
over a data-sharded batch, BN statistics default to global (= synced
across replicas; ``TPU.SYNC_BN: True``) — a deliberate improvement over
the reference's per-replica MirroredStrategy statistics (SURVEY.md §5);
``TPU.SYNC_BN: False`` restores the reference semantics via
:class:`GroupedBatchNorm` (``bn_groups`` = data-axis size).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x3d_tpu import utils
from x3d_tpu.ops import dw_fused
from x3d_tpu.ops.depthwise import DepthwiseConv3D
from x3d_tpu.ops.pointwise import PointwiseConv3D

# Keras Conv3D/Dense default initialiser is glorot_uniform; matching it keeps
# training dynamics comparable (flax's default would be lecun_normal).
_KERNEL_INIT = nn.initializers.glorot_uniform()


@dataclass(frozen=True)
class BlockSpec:
    """Static description of one residual block."""
    in_channels: int
    inner_channels: int
    out_channels: int
    stride: int          # spatial stride of the depthwise conv (1 or 2)
    use_se: bool         # squeeze-excitation on this block (global pattern)
    se_width: int        # hidden width of the SE bottleneck


@dataclass(frozen=True)
class X3DArch:
    """Static architecture plan — hashable, safe to close over under jit."""
    conv1_dim: int
    temp_filter: int                      # stem temporal kernel size
    stages: Tuple[Tuple[BlockSpec, ...], ...]
    conv5_dim: int                        # = last stage's inner width
    num_classes: int
    dropout_rate: float
    bn_momentum: float
    bn_eps: float
    num_views: int                        # eval-time clips averaged per video
    temp_kernel: int = 3                  # bottleneck temporal kernel size
    head_dim: int = 2048


def build_arch(cfg) -> X3DArch:
    """Expand the shared X3D template by the config's width/depth factors.

    Mirrors the plan construction at reference ``model.py:27-76`` including
    the SCALE_RES2 branch, and freezes the reference's first-instance SE
    placement (SE on even 0-based global block indices).
    """
    net = cfg.NETWORK
    if net.SCALE_RES2:
        conv1_dim = utils.round_width(net.C1_CHANNELS, net.WIDTH_FACTOR)
        multiplier = 1
    else:
        conv1_dim = utils.round_width(net.C1_CHANNELS, 2)
        multiplier = 2

    base = net.C1_CHANNELS * multiplier
    block_basis = [
        (1, base),
        (2, utils.round_width(base, 2)),
        (5, utils.round_width(base, 4)),
        (3, utils.round_width(base, 8)),
    ]

    stages = []
    in_dim = conv1_dim
    global_index = 0
    inner_dim = conv1_dim
    for depth_base, width_base in block_basis:
        out_dim = utils.round_width(width_base, net.WIDTH_FACTOR)
        inner_dim = int(out_dim * net.BOTTLENECK_WIDTH_FACTOR)
        depth = utils.round_repeats(depth_base, net.DEPTH_FACTOR)
        blocks = []
        for i in range(depth):
            blocks.append(
                BlockSpec(
                    in_channels=in_dim if i == 0 else out_dim,
                    inner_channels=inner_dim,
                    out_channels=out_dim,
                    stride=2 if i == 0 else 1,
                    use_se=(global_index % 2 == 0),
                    se_width=utils.round_width(inner_dim, 0.0625),
                )
            )
            global_index += 1
        stages.append(tuple(blocks))
        in_dim = out_dim

    return X3DArch(
        conv1_dim=conv1_dim,
        temp_filter=net.C1_TEMP_FILTER,
        stages=tuple(stages),
        conv5_dim=inner_dim,
        num_classes=net.NUM_CLASSES,
        dropout_rate=net.DROPOUT_RATE,
        bn_momentum=net.BN.MOMENTUM,
        bn_eps=net.BN.EPS,
        num_views=cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS,
    )


def _conv1x1(features: int, dtype, name: str, use_bias: bool = False,
             out_pad: int = 0, in_pad: int = 0):
    # benchmark-dispatched 1x1x1 conv (see ops/pointwise.py); out_pad/in_pad
    # carry the fused path's sublane-aligned channel tiles (zero-padded
    # weights, unpadded parameters)
    return PointwiseConv3D(
        features=features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=_KERNEL_INIT,
        out_pad=out_pad,
        in_pad=in_pad,
        name=name,
    )


class GroupedBatchNorm(nn.Module):
    """Per-replica BatchNorm statistics (``TPU.SYNC_BN: False``).

    The reference's MirroredStrategy runs plain ``BatchNormalization`` per
    replica (``utils.py:160-167``, SURVEY.md §5): each replica normalises
    with its LOCAL batch statistics, and the running statistics are
    variable-aggregated across replicas (mean).  Under pjit there are no
    per-replica variables, so the batch axis is split into ``groups`` equal
    slices instead — when ``groups`` equals the mesh's data-axis size the
    slices coincide with the batch shards and XLA keeps every group's
    reduction local to its replica (zero ICI traffic, exactly like the
    reference) — and the running stats take the cross-group mean.

    Variable layout matches flax ``nn.BatchNorm`` (params ``scale``/
    ``bias``, batch_stats ``mean``/``var``) so checkpoints are
    interchangeable between sync modes; eval-mode behaviour is identical.
    """
    momentum: float
    eps: float
    groups: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            g = self.groups
            b = x.shape[0]
            if b % g:
                raise ValueError(
                    f"batch {b} not divisible by {g} BN groups")
            xg = x.reshape(g, b // g, -1, c).astype(jnp.float32)
            mean = jnp.mean(xg, axis=(1, 2))                      # (g, C)
            # E[x^2]-E[x]^2 (one pass) rather than E[(x-mean)^2] (two
            # passes): catastrophic cancellation needs |mean| >> std,
            # which normalized video activations in f32 never approach —
            # and the one-pass form is what the fused kernels' column
            # sums reduce to (_stats_from_sums), keeping fused == unfused
            # bit-comparable.  Don't "fix" this to the two-pass form.
            var = jnp.mean(jnp.square(xg), axis=(1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean.mean(0)
                ra_var.value = m * ra_var.value + (1 - m) * var.mean(0)
            mul = jax.lax.rsqrt(var + self.eps) * scale           # (g, C)
            add = bias - mean * mul
            y = (x.reshape(g, b // g, -1, c).astype(self.dtype)
                 * mul[:, None, None, :].astype(self.dtype)
                 + add[:, None, None, :].astype(self.dtype))
            return y.reshape(x.shape)
        mul = jax.lax.rsqrt(ra_var.value + self.eps) * scale
        add = bias - ra_mean.value * mul
        return (x.astype(self.dtype) * mul.astype(self.dtype)
                + add.astype(self.dtype))


class _BNVars(nn.Module):
    """Declares ``nn.BatchNorm``-compatible variables and returns normalize
    coefficients (mul, add) instead of applying them — the variable-owning
    half of BatchNorm for the fused bottleneck path, where normalisation is
    applied inside the Pallas kernel (bn_a) or fused into consumers (bn_b).

    Variable names/shapes/inits are identical to ``nn.BatchNorm`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``), so checkpoints are
    interchangeable between the fused and unfused paths.
    """
    momentum: float
    eps: float

    @nn.compact
    def __call__(self, c: int, stats, train: bool):
        """``stats``: (mean, var) with shape (c,) or (groups, c) — grouped
        statistics (per-replica BN) update the running stats with the
        cross-group mean, like :class:`GroupedBatchNorm`; returned coefs
        keep the stats' shape.  Eval ignores ``stats`` and returns (c,)."""
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if train:
            mean, var = stats
            if not self.is_initializing():
                m = self.momentum
                red = tuple(range(mean.ndim - 1))
                ra_mean.value = (m * ra_mean.value
                                 + (1 - m) * mean.mean(red))
                ra_var.value = m * ra_var.value + (1 - m) * var.mean(red)
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = jax.lax.rsqrt(var + self.eps) * scale
        return mul, bias - mean * mul


class _DWKernel(nn.Module):
    """Declares the depthwise kernel parameter (identical name/shape/init
    to :class:`~x3d_tpu.ops.depthwise.DepthwiseConv3D`) for the fused path,
    which consumes the raw taps rather than running the conv module."""
    kernel_size: Tuple[int, int, int]

    @nn.compact
    def __call__(self, channels: int):
        return self.param("kernel", _KERNEL_INIT,
                          self.kernel_size + (1, channels), jnp.float32)


class _BN(nn.Module):
    """BatchNorm with the reference's momentum/eps.

    Statistics are always computed/stored in float32 (flax forces f32
    reductions); ``dtype`` only sets the normalisation arithmetic — bf16
    there saves a full f32 materialisation per BN (+12% train step,
    measured).  Running statistics live in the ``batch_stats`` collection.

    ``groups=1`` (``TPU.SYNC_BN: True``, the default): under pjit the batch
    mean/var reductions run over the *global* (sharded) batch — cross-
    replica-synced BN, a deliberate documented improvement.  ``groups>1``
    reproduces the reference's per-replica statistics via
    :class:`GroupedBatchNorm`.
    """
    momentum: float
    eps: float
    dtype: Any = jnp.bfloat16
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool, stats=None, coefs: bool = False,
                 c: int = None):
        if coefs:
            # fused-path mode: return (mul, add) f32 normalize coefficients
            # without applying them.  ``stats``: (mean, var) from the fused
            # kernel's sums ((C,) global or (groups, C) per-replica), or
            # None to compute them from x (train) / use running stats
            # (eval).
            if train and stats is None:
                x32 = x.astype(jnp.float32)
                mean = jnp.mean(x32, axis=(0, 1, 2, 3))
                var = jnp.mean(x32 * x32, axis=(0, 1, 2, 3)) - mean * mean
                stats = (mean, var)
            if c is None:
                c = x.shape[-1] if x is not None else stats[0].shape[0]
            return _BNVars(self.momentum, self.eps, name="norm")(
                c, stats, train)
        if self.groups > 1:
            return GroupedBatchNorm(
                momentum=self.momentum,
                eps=self.eps,
                groups=self.groups,
                dtype=self.dtype,
                name="norm",
            )(x, train)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="norm",
        )(x)


class Stem(nn.Module):
    """Channelwise-separable spatiotemporal stem (reference model.py:134-210)."""
    out_channels: int
    temp_filter: int
    bn_momentum: float
    bn_eps: float
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    fold_T: int = 0      # >0: time-folded (B·T, 1, H, W, C) activations

    @nn.compact
    def __call__(self, x, train: bool):
        # Explicit (1,1) spatial pad + VALID conv == the reference's
        # tf.pad + Conv3D; note this differs from SAME (which pads (0,1)
        # for even sizes), so it is reproduced exactly.
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(1, 3, 3),
            strides=(1, 2, 2),
            padding=((0, 0), (1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_KERNEL_INIT,
            name="conv_s",
        )(x.astype(self.dtype))
        k = self.temp_filter
        x = DepthwiseConv3D(
            kernel_size=(k, 1, 1),
            strides=(1, 1, 1),
            padding=((k // 2, k // 2), (0, 0), (0, 0)),
            dtype=self.dtype,
            fold_T=self.fold_T,
            name="conv_t",
        )(x)
        x = _BN(self.bn_momentum, self.bn_eps, self.dtype,
                groups=self.bn_groups, name="bn")(x, train)
        return nn.relu(x)


class SqueezeExcite(nn.Module):
    """Global-pool → bottleneck MLP → sigmoid gate (reference model.py:274-290).

    Note the reference regularises only ``se_fc2``'s kernel (``se_fc1`` has no
    kernel_regularizer) — the L2 filter in the train step reproduces that.
    """
    width: int
    channels: int
    dtype: Any = jnp.bfloat16
    gate_pad: int = 0    # zero-pad the gate to a channel-tile-padded x
    fold_T: int = 0      # >0: x is time-folded (B·T, 1, H, W, C)

    @nn.compact
    def __call__(self, x, pooled=None, return_gate: bool = False):
        if pooled is None:
            if self.fold_T > 1:
                # per-clip pool on the folded layout: frame means, then the
                # clip mean over each run of fold_T rows — one (B,1,1,1,C)
                # gate per clip, as in the unfolded op
                fm = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
                pooled = fm.reshape(-1, self.fold_T, fm.shape[-1]).mean(1)
                pooled = pooled[:, None, None, None, :]
            else:
                pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3),
                                  keepdims=True)
        s = _conv1x1(self.width, self.dtype, "se_fc1", use_bias=True)(
            pooled.astype(self.dtype))
        s = nn.relu(s)
        s = _conv1x1(self.channels, self.dtype, "se_fc2", use_bias=True)(s)
        s = nn.sigmoid(s.astype(jnp.float32))
        if self.gate_pad:
            s = jax.lax.optimization_barrier(
                jnp.pad(s, ((0, 0),) * 4 + ((0, self.gate_pad),)))
        if return_gate:
            # (B,1,1,1,Cp) f32 gate — the caller folds it into the bn_b
            # affine coefficients ((y*m+o)*s == y*(m*s)+(o*s)) so the MXU
            # conv-"c" kernel consumes one coefficient pair
            return s
        if s.shape[0] != x.shape[0]:
            # folded x with a per-clip gate: broadcast over each clip's rows
            s = jnp.repeat(s, x.shape[0] // s.shape[0], axis=0)
        return x * s.astype(x.dtype)


def resolve_time_fold(time_fold, batch: int, temp: int,
                      train: bool = False) -> bool:
    """Resolve an ``X3D.time_fold`` setting against a concrete input shape.

    False/True pass through; "auto" folds TRAINING-mode calls on TPU when
    the batch underfills the 128 lanes but B·T tiles them exactly (the
    L/XL train regime); an int N folds TRAINING-mode batches with B ≤ N
    (the CLI passes the per-run train batch).  Eval-mode calls never fold
    under "auto" or a threshold: the forward-only pass loses folded even
    at sub-128-clip view batches (X3D-L 48-clip ensemble: 178 folded vs
    246 unfolded clips/s, and unfolded eval scales to bigger batches
    instead — docs/PERF.md round 3), so folded inference is explicit
    opt-in via ``True`` only.
    """
    if time_fold == "auto":
        return (train and jax.default_backend() == "tpu"
                and batch < 128 and (batch * temp) % 128 == 0)
    if isinstance(time_fold, int) and not isinstance(time_fold, bool):
        return train and batch <= time_fold
    return bool(time_fold)


def _stats_from_sums(p, s2, g: int, n: int, c: int = None):
    """BN (mean, var) from per-sample-column kernel sums.

    ``p``/``s2`` are (Cfull, Bn) f32 sum / sum-of-squares columns as emitted
    by the fused MXU/segment kernels (clip-major: column b belongs to BN
    group ``b // (Bn // g)``).  ``n`` is the global element count per
    channel; ``c`` optionally slices padded channels.  Returns (c,) vectors
    for g == 1 and (g, c) per-group rows otherwise — the shapes
    ``_BN(..., stats=...)`` consumes.
    """
    if g > 1:
        Bn = p.shape[1]
        pg = p.reshape(p.shape[0], g, Bn // g).sum(-1)
        sg = s2.reshape(s2.shape[0], g, Bn // g).sum(-1)
        if c is not None:
            pg, sg = pg[:c], sg[:c]
        mean = jnp.transpose(pg) / (n // g)
        return mean, jnp.transpose(sg) / (n // g) - mean * mean
    pv, sv = p.sum(axis=1), s2.sum(axis=1)
    if c is not None:
        pv, sv = pv[:c], sv[:c]
    mean = pv / n
    return mean, sv / n - mean * mean


def _ckpt_name(x, on: bool):
    """Tag a conv output for the "convs" remat policy (identity otherwise)."""
    if not on:
        return x
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(x, "x3d_conv")


class Bottleneck(nn.Module):
    """1×1×1 → T×3×3 depthwise → [SE] → swish → 1×1×1, BN after each conv
    (reference model.py:212-320)."""
    spec: BlockSpec
    temp_kernel: int
    bn_momentum: float
    bn_eps: float
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    save_names: bool = False   # tag conv outputs for the "convs" remat policy
    fold_T: int = 0            # >0: time-folded (B·T, 1, H, W, C) input

    @nn.compact
    def __call__(self, x, train: bool):
        spec = self.spec
        fold = self.fold_T if self.fold_T > 1 else 0
        bn = lambda name: _BN(self.bn_momentum, self.bn_eps, self.dtype,
                              groups=self.bn_groups, name=name)
        C = spec.inner_channels
        seg = dw_fused.segment_mode(x.shape[0], spec.stride, self.bn_groups,
                                    self.temp_kernel)
        if fold and seg == "pallas":
            # the Pallas segment kernel streams the unfolded (T,H,W,C,B)
            # view; on the folded layout fall back to the aligned
            # composition (same math, XLA emitters)
            seg = "aligned"
        # Fused segment modes DMA / feed the batch-minor (T,H,W,C,B) view,
        # which wants the sublane (C) extent tile-aligned: conv "a" emits
        # the padded tile via zero weight columns (no pad pass), conv "c"
        # consumes it via zero weight rows.  BatchNorm variables stay (C,)
        # via the coefs-mode _BN (identical tree to the unfused path).
        pad = (-C) % 8 if seg != "off" else 0
        Cp = C + pad
        conv_a = _conv1x1(C, self.dtype, "a", out_pad=pad)
        # Opt-in MXU lowering for the expanding conv (ops/pointwise.py
        # impl "mxu"/"mxu_exp"): the Pallas matmul emits bn_a's stat sums
        # from its own epilogue, so the custom-call boundary un-fuses
        # nothing (the round-2 pw_bm loss mode, docs/PERF.md row 7).
        p_a = s2_a = None
        from x3d_tpu.ops import pointwise as _pw
        if (seg != "off" and train and not fold
                and _pw.stats_capable(x.shape, x.shape[-1], Cp)):
            out, p_a, s2_a = conv_a(x.astype(self.dtype), return_stats=True)
        else:
            out = conv_a(x.astype(self.dtype))
        out = _ckpt_name(out, self.save_names)
        if seg != "off":
            Bn, Tn, Hn, Wn = out.shape[:4]
            g = self.bn_groups

            def cb_cols(mul, add):
                """(Cp, Bn) f32 coefficient columns — per-sample when the
                coefs are grouped (per-replica BN), constant otherwise."""
                if mul.ndim == 1:
                    mp = jnp.pad(mul, (0, pad), constant_values=1.0)
                    ap = jnp.pad(add, (0, pad))
                    return (jnp.broadcast_to(mp[:, None], (Cp, Bn)),
                            jnp.broadcast_to(ap[:, None], (Cp, Bn)))
                mp = jnp.pad(mul, ((0, 0), (0, pad)), constant_values=1.0)
                ap = jnp.pad(add, ((0, 0), (0, pad)))
                return (jnp.transpose(jnp.repeat(mp, Bn // g, axis=0)),
                        jnp.transpose(jnp.repeat(ap, Bn // g, axis=0)))

            def ew(mul, add):
                """Broadcastable (dtype) multiplier/offset for elementwise
                use; keeps the (Cp,) vector form in the ungrouped case."""
                if mul.ndim == 1:
                    return (jnp.pad(mul, (0, pad),
                                    constant_values=1.0).astype(self.dtype),
                            jnp.pad(add, (0, pad)).astype(self.dtype))
                mc, ac = cb_cols(mul, add)
                shp = (Bn, 1, 1, 1, Cp)
                return (jnp.transpose(mc).reshape(shp).astype(self.dtype),
                        jnp.transpose(ac).reshape(shp).astype(self.dtype))

            stats_a = None
            if train:
                n_a = Bn * Tn * Hn * Wn
                if p_a is not None:
                    # sums emitted by the MXU conv kernel — same handling
                    # as bn_b's p/s2 below
                    pa = jax.lax.optimization_barrier(p_a)
                    sa = jax.lax.optimization_barrier(s2_a)
                    mean_a, var_a = _stats_from_sums(pa, sa, g, n_a, c=C)
                else:
                    x32 = out.astype(jnp.float32)
                    # barrier the stat vectors before slicing to C: XLA
                    # otherwise pushes the slice through the reduces into
                    # the activations' cotangents, and its rewrite of a
                    # sliced depthwise weight-grad conv is invalid
                    # (batch-group mismatch at compile time)
                    if g > 1:
                        xg = x32.reshape(g, Bn // g, Tn, Hn, Wn, Cp)
                        mean_a = jax.lax.optimization_barrier(
                            jnp.mean(xg, axis=(1, 2, 3, 4)))[:, :C]
                        var_a = (jax.lax.optimization_barrier(
                            jnp.mean(xg * xg, axis=(1, 2, 3, 4)))[:, :C]
                            - mean_a * mean_a)
                    else:
                        mean_a = jax.lax.optimization_barrier(
                            jnp.mean(x32, axis=(0, 1, 2, 3)))[:C]
                        var_a = (jax.lax.optimization_barrier(
                            jnp.mean(x32 * x32, axis=(0, 1, 2, 3)))[:C]
                            - mean_a * mean_a)
                stats_a = (mean_a, var_a)
            mul_a, add_a = bn("bn_a")(None, train, stats=stats_a,
                                      coefs=True, c=C)
            kernel = _DWKernel((self.temp_kernel, 3, 3), name="b")(C)
            # the barrier stops XLA pushing the dk-cotangent slice (from the
            # pad transpose) into the depthwise weight-grad conv, where its
            # rewrite produces an invalid batch-group conv at compile time
            kernel = jax.lax.optimization_barrier(
                jnp.pad(kernel, ((0, 0),) * 4 + ((0, pad),)))
            if seg == "pallas":
                # bn_a-normalize + ReLU + depthwise conv + bn_b statistics
                # (+ SE pool) in one Pallas pass — see ops/dw_fused.py.
                a_cb, b_cb = cb_cols(mul_a, add_a)
                y, p, s2 = dw_fused.dw_bn_act_conv(out, a_cb, b_cb, kernel)
            else:
                # "aligned": same layout/BN structure, XLA dw emitter (which
                # runs near the VPU-issue bound); XLA fuses the affine+ReLU
                # into the conv's input read and the sums into its epilogue.
                am, aa = ew(mul_a, add_a)
                u = nn.relu(out * am + aa)
                if fold:
                    from x3d_tpu.ops.depthwise import depthwise_conv3d_folded
                    y = depthwise_conv3d_folded(u, kernel.astype(self.dtype),
                                                fold)
                else:
                    from x3d_tpu.ops.depthwise import depthwise_conv3d
                    y = depthwise_conv3d(u, kernel.astype(self.dtype))
                y = _ckpt_name(y, self.save_names)
                y32 = y.astype(jnp.float32)
                p = jnp.transpose(jnp.sum(y32, axis=(1, 2, 3)))
                s2 = jnp.transpose(jnp.sum(y32 * y32, axis=(1, 2, 3)))
            p = jax.lax.optimization_barrier(p)
            s2 = jax.lax.optimization_barrier(s2)
            n = Bn * Tn * Hn * Wn
            # per-replica statistics from the same per-sample sums when
            # training grouped; eval stats are unused (running stats apply)
            mean_b, var_b = _stats_from_sums(p, s2, g if train else 1, n,
                                             c=C)
            mul_b, add_b = bn("bn_b")(None, train, stats=(mean_b, var_b),
                                      coefs=True, c=C)
            # multiplier pads are 1 (not 0): an all-zero broadcast column
            # invites XLA to slice the conv output to C channels and then
            # build an invalid batch-group weight-grad conv; pad channels
            # are zero regardless because the padded kernel taps are zero.
            def se_pooled():
                mbc, abc = cb_cols(mul_b, add_b)                 # (Cp, Bn)
                if fold:
                    # per-clip pool from the per-frame sums: one gate per
                    # clip (Bn = B·fold rows; coefficient columns are
                    # constant within a clip, so sample every fold-th)
                    Bc = Bn // fold
                    pc = p[:C].reshape(C, Bc, fold).sum(-1)
                    pooled = (mbc[:C, ::fold].astype(jnp.float32)
                              * (pc / (fold * Tn * Hn * Wn))
                              + abc[:C, ::fold].astype(jnp.float32))
                    return jnp.transpose(pooled).reshape(Bc, 1, 1, 1, C)
                pooled = (mbc[:C].astype(jnp.float32)
                          * (p[:C] / (Tn * Hn * Wn))
                          + abc[:C].astype(jnp.float32))
                return jnp.transpose(pooled).reshape(Bn, 1, 1, 1, C)

            if (train and not fold
                    and _pw.stats_capable((Bn, Tn, Hn, Wn, Cp), Cp,
                                          spec.out_channels)):
                # MXU contracting conv: the bn_b affine (+ SE gate, folded
                # into the coefficients) and swish run inside the kernel,
                # which also emits bn_c's stat sums — no fusion is lost at
                # the custom-call boundary (docs/PERF.md row 7's loss mode)
                a_cb, o_cb = cb_cols(mul_b, add_b)               # (Cp, Bn)
                if spec.use_se:
                    gate = SqueezeExcite(spec.se_width, C, self.dtype,
                                         gate_pad=pad, name="se")(
                        None, pooled=se_pooled(), return_gate=True)
                    g_cb = jnp.transpose(gate.reshape(Bn, Cp))
                    a_cb = a_cb * g_cb
                    o_cb = o_cb * g_cb
                z, p_c, s2_c = _conv1x1(spec.out_channels, self.dtype, "c",
                                        in_pad=pad)(
                    y.astype(self.dtype), act_coefs=(a_cb, o_cb))
                Cout = spec.out_channels
                p_c = jax.lax.optimization_barrier(p_c)
                s2_c = jax.lax.optimization_barrier(s2_c)
                n_c = Bn * Tn * Hn * Wn
                mean_c, var_c = _stats_from_sums(p_c, s2_c, g, n_c)
                mul_c, add_c = bn("bn_c")(None, train,
                                          stats=(mean_c, var_c),
                                          coefs=True, c=Cout)
                if mul_c.ndim == 1:
                    cm = mul_c.astype(self.dtype)
                    ca = add_c.astype(self.dtype)
                else:
                    shp = (Bn, 1, 1, 1, Cout)
                    cm = jnp.repeat(mul_c, Bn // g,
                                    axis=0).reshape(shp).astype(self.dtype)
                    ca = jnp.repeat(add_c, Bn // g,
                                    axis=0).reshape(shp).astype(self.dtype)
                # the bn_c affine stays elementwise: XLA fuses it into the
                # residual add that consumes this block's output
                return z.astype(self.dtype) * cm + ca

            bm, ba = ew(mul_b, add_b)
            out = y.astype(self.dtype) * bm + ba
            if spec.use_se:
                out = SqueezeExcite(spec.se_width, C, self.dtype,
                                    gate_pad=pad, name="se")(
                    out, pooled=se_pooled())
        else:
            out = bn("bn_a")(out, train)
            out = nn.relu(out)
            out = DepthwiseConv3D(
                kernel_size=(self.temp_kernel, 3, 3),
                strides=(1, spec.stride, spec.stride),
                padding="SAME",
                dtype=self.dtype,
                fold_T=fold,
                name="b",
            )(out)
            out = _ckpt_name(out, self.save_names)
            out = bn("bn_b")(out, train)
            if spec.use_se:
                out = SqueezeExcite(spec.se_width, C, self.dtype,
                                    fold_T=fold, name="se")(out)
        out = nn.swish(out)
        out = _conv1x1(spec.out_channels, self.dtype, "c", in_pad=pad)(
            out.astype(self.dtype))
        out = _ckpt_name(out, self.save_names)
        out = bn("bn_c")(out, train)
        return out


class ResBlock(nn.Module):
    """Residual wrapper with projection shortcut when shape changes
    (reference model.py:322-394)."""
    spec: BlockSpec
    temp_kernel: int
    bn_momentum: float
    bn_eps: float
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    save_names: bool = False   # tag conv outputs for the "convs" remat policy
    fold_T: int = 0            # >0: time-folded (B·T, 1, H, W, C) input

    @nn.compact
    def __call__(self, x, train: bool):
        spec = self.spec
        out = Bottleneck(spec, self.temp_kernel, self.bn_momentum,
                         self.bn_eps, self.dtype, bn_groups=self.bn_groups,
                         save_names=self.save_names, fold_T=self.fold_T,
                         name="bottleneck")(x, train)
        if spec.in_channels != spec.out_channels or spec.stride != 1:
            res = PointwiseConv3D(
                features=spec.out_channels,
                strides=(1, spec.stride, spec.stride),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=_KERNEL_INIT,
                name="residual",
            )(x.astype(self.dtype))
            res = _ckpt_name(res, self.save_names)
            res = _BN(self.bn_momentum, self.bn_eps, self.dtype,
                      groups=self.bn_groups, name="bn_r")(res, train)
        else:
            res = x
        return nn.relu(res.astype(jnp.float32) + out.astype(jnp.float32))


class X3D(nn.Module):
    """The full X3D network.

    ``__call__`` returns softmax probabilities (float32), matching the
    reference's ``model.call`` (``model.py:113-127``) including eval-time
    view averaging; pass ``return_logits=True`` for the pre-softmax logits
    (used by the numerically-stable training loss).
    """
    arch: X3DArch
    dtype: Any = jnp.bfloat16
    # Rematerialisation granularity for the backward pass:
    #   False    — save every intermediate (fastest when it fits HBM)
    #   "block"  — recompute each res block (save only block boundaries);
    #              True is accepted as an alias.  The 312² default.
    #   "stage"  — recompute whole stages (save only stage boundaries):
    #              coarsest, smallest footprint, most recompute
    #   "convs"  — per-block remat with a save_only_these_names policy that
    #              keeps conv outputs resident: only BN/ReLU/SE elementwise
    #              chains are recomputed (more memory than "block", far
    #              less recompute)
    remat: Any = False
    bn_groups: int = 1   # >1: per-replica BN statistics (TPU.SYNC_BN=False)
    # Time-folded layout (False/True/"auto"/int threshold): carry
    # activations as (B·T, 1, H, W, C) so the batch-minor lane dimension
    # is filled even at sub-128 batches.  X3D never downsamples time, so
    # every op has an exact folded form (temporal depthwise taps become
    # static batch-axis shifts — ops/depthwise.depthwise_conv3d_folded);
    # parameters, BN statistics and outputs are identical to the unfolded
    # model.  "auto": fold on TPU when B underfills the 128 lanes but B·T
    # fills them — the X3D-L/XL TRAIN regime, where unfolded layouts
    # waste 2.4–8× on lane padding (docs/PERF.md round 3).  "auto" and
    # int thresholds (fold train batches with B ≤ N) apply to TRAINING
    # calls only: folded eval loses even at sub-128-clip view batches
    # (L 48-clip ensemble 178 vs 246 clips/s) and folding a 480-clip
    # eval batch to 7680 rows blows XLA's compile time.  Folded
    # inference is explicit opt-in via True.
    time_fold: Any = False
    # When folding, how many leading res stages run folded (the stem always
    # folds with the input).  4 = the whole trunk (the conv_5 head unfolds,
    # as before).  A mid-network boundary (e.g. 2) unfolds after the
    # lane-starved high-resolution stages — the fold win concentrates in
    # the 56²/28² stages, while the low-resolution tail pays the fold's
    # static-roll overhead for little lane gain (docs/PERF.md round 4,
    # serving).  The boundary reshape (B·T,1,h,w,C) → (B,T,h,w,C) is a
    # single relayout.
    fold_stages: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        arch = self.arch
        B0, T0 = x.shape[0], x.shape[1]
        fold = resolve_time_fold(self.time_fold, B0, T0, train)
        fold_T = T0 if (fold and T0 > 1) else 0
        if fold_T and self.bn_groups > 1 and B0 % self.bn_groups:
            raise ValueError(
                f"time_fold needs batch {B0} divisible by bn_groups "
                f"{self.bn_groups} (grouped statistics must not split "
                "clips)")
        if fold_T:
            x = x.reshape((B0 * T0, 1) + x.shape[2:])
        # Remat bounds training memory to the chosen checkpoint boundaries
        # plus one region's internals — the TPU-native analogue of fitting
        # 16x224^2 batches that the reference spread over 4 GPUs.
        mode = {False: "off", True: "block", None: "off"}.get(
            self.remat, self.remat)
        if mode not in ("off", "block", "stage", "convs"):
            raise ValueError(f"remat mode {self.remat!r}")
        if mode == "convs":
            block_cls = nn.remat(
                ResBlock, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "x3d_conv"))
        elif mode == "block":
            block_cls = nn.remat(ResBlock, static_argnums=(2,))
        else:
            block_cls = ResBlock
        if not 0 <= self.fold_stages <= 4:
            raise ValueError(f"fold_stages {self.fold_stages!r} not in 0..4")
        x = Stem(arch.conv1_dim, arch.temp_filter, arch.bn_momentum,
                 arch.bn_eps, self.dtype, bn_groups=self.bn_groups,
                 fold_T=fold_T, name="conv_1")(x, train)
        folded = bool(fold_T)
        for si, blocks in enumerate(arch.stages):
            if folded and si >= self.fold_stages:
                # mid-network fold boundary: (B·T,1,h,w,C) → (B,T,h,w,C)
                x = x.reshape((B0, T0) + x.shape[2:])
                folded = False
            stage_fold = fold_T if folded else 0
            def run_stage(mdl, xx, _si=si, _blocks=blocks,
                          _fold=stage_fold):
                for bi, spec in enumerate(_blocks):
                    # stage numbering starts at 2, as in the paper and the
                    # reference's layer names (model.py:401,430)
                    xx = block_cls(spec, arch.temp_kernel, arch.bn_momentum,
                                   arch.bn_eps, mdl.dtype,
                                   bn_groups=mdl.bn_groups,
                                   save_names=(mode == "convs"),
                                   fold_T=_fold,
                                   name=f"stage{_si + 2}_block{bi}")(xx, train)
                return xx
            if mode == "stage":
                x = nn.remat(run_stage)(self, x)
            else:
                x = run_stage(self, x)
        x = _conv1x1(arch.conv5_dim, self.dtype, "conv_5")(x.astype(self.dtype))
        x = _BN(arch.bn_momentum, arch.bn_eps, self.dtype,
                groups=self.bn_groups, name="bn_5")(x, train)
        x = nn.relu(x)
        if folded:
            # unfold for the head: (B·T, 1, h, w, C) → (B, T, h, w, C)
            x = x.reshape((B0, T0) + x.shape[2:])
        # AdaptiveAvgPool3D((1,1,1)) == global mean over (T, H, W)
        x = jnp.mean(x, axis=(1, 2, 3))
        x = nn.Dense(
            features=arch.head_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_KERNEL_INIT,
            name="fc_1",
        )(x.astype(self.dtype))
        x = nn.relu(x)
        x = nn.Dropout(rate=arch.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(
            features=arch.num_classes,
            use_bias=True,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=_KERNEL_INIT,
            name="fc_2",
        )(x.astype(jnp.float32))
        if return_logits:
            return logits
        probs = nn.softmax(logits, axis=-1)
        if not train and arch.num_views > 1:
            # batch arrives as (videos × views); average probs over views
            probs = probs.reshape(-1, arch.num_views, arch.num_classes)
            probs = probs.mean(axis=1)
        return probs


def create_model(cfg, dtype=None, remat=None, bn_groups: int = 1,
                 time_fold=None, fold_stages: int = 4) -> X3D:
    """Build an :class:`X3D` from a config (see ``x3d_tpu.config``).

    ``remat`` default ("auto"): per-block rematerialisation only for the
    312^2 variants (L/XL), whose activations don't fit HBM un-remat'ed at
    training batch sizes; for XS/S/M, no-remat is ~24% faster (measured on
    v5e).  Besides True/False/"auto", the granularity modes
    "block"/"stage"/"convs" are accepted (see :class:`X3D`).

    ``bn_groups``: per-replica BN group count for ``TPU.SYNC_BN: False``
    (the caller passes the mesh's data-axis size — see
    ``tools/common.setup_runtime``); 1 = globally synced statistics.
    """
    if dtype is None:
        dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE) if "TPU" in cfg else jnp.bfloat16
    if remat is None:
        remat = cfg.TPU.REMAT if "TPU" in cfg else "auto"
    if remat == "auto":
        remat = cfg.DATA.TRAIN_CROP_SIZE >= 312
    if time_fold is None:
        time_fold = cfg.TPU.TIME_FOLD if "TPU" in cfg else False
    return X3D(arch=build_arch(cfg), dtype=dtype, remat=remat,
               bn_groups=bn_groups, time_fold=time_fold,
               fold_stages=fold_stages)


def init_variables(model: X3D, rng, sample, train: bool = False):
    """Initialise model variables under jit.

    Eager ``model.init`` dispatches every op individually (one small XLA
    compile per conv — minutes on a slow host); a single jitted trace
    compiles once.  Initialisation goes through the logits path so the
    sample batch need not be divisible by the eval view count.
    """
    import jax

    return jax.jit(
        lambda r, x: model.init(
            {"params": r}, x, train=train, return_logits=True
        )
    )(rng, sample)
