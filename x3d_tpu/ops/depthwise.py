"""Depthwise (channelwise) 3D convolution — the signature op of X3D.

The reference's hot op is a ``groups=channels`` Conv3D with a T×3×3 kernel
(bottleneck ``b`` conv, reference ``model.py:259-267``) plus a k×1×1 depthwise
temporal conv in the stem (``model.py:187-194``).  On TPU a grouped
convolution with one channel per group cannot use the MXU (there is no
contraction dimension), so the right mental model is a *vector* op: every
output element is a k_t·k_h·k_w-tap FMA over spatially shifted copies of the
input, with the channel axis mapped onto the 128-wide lanes.

Three interchangeable implementations are provided (identical math, same
kernel layout, selectable per call or globally):

  * ``"shift"`` (default): expresses the conv as an unrolled sum of strided
    slices of the padded input, each scaled by one kernel tap.  XLA fuses the
    whole sum into a single VPU loop over the (already materialised) padded
    array — one pass through HBM instead of the generic grouped-conv path.
  * ``"xla"``: ``jax.lax.conv_general_dilated`` with
    ``feature_group_count=C`` — the baseline XLA lowering.
  * ``"pallas"``: hand-written Mosaic kernel (see ``x3d_tpu/ops/pallas_dw.py``)
    that keeps the input block in VMEM across all taps and can fuse the
    following BatchNorm+activation.

The kernel parameter layout matches ``flax.linen.Conv`` with
``feature_group_count=C``: ``(k_t, k_h, k_w, 1, C)`` — so checkpoints are
interchangeable between implementations.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# "xla" default: the shift formulation wins on pure forward but its autodiff
# transpose materialises one padded full-size tensor per tap (27x activation
# memory — observed 24.7 GB for an X3D-M train step); the grouped-conv
# lowering has a sane backward.  "shift_cvjp" pairs the shift forward with
# the grouped-conv VJP via jax.custom_vjp — each direction gets the
# formulation that lowers best in isolation (see _dw_shift_cvjp).
#
# Measured-and-rejected (round 2, v5e, full X3D-M train step): shift_cvjp
# OOMs at the production batch 128 (the explicit jnp.pad temps raise peak
# memory past what XLA's self-remat absorbs — custom_vjp walls off the
# region from remat) and at B=96 runs 113.8 clips/s vs the XLA lowering's
# 276.8 at B=128 — 2.4x slower end-to-end despite the faster isolated
# forward.  Root cause (from the B=128 allocation dump): at batch 128 XLA
# assigns batch-minormost layouts ({0,4,3,2,1:T(8,128)}) to the big
# activations, putting the 128-wide batch on the 128-wide lane dimension —
# ZERO lane padding, which removes the very waste the shift/dense-lane
# formulations were built to avoid, while they force materialised padded
# copies.  Keep "xla" unless the batch layout story changes.
_DEFAULT_IMPL = "xla"
_VALID_IMPLS = ("shift", "shift_cvjp", "xla", "pallas", "bm", "xbwd", "pbwd")


def set_default_impl(impl: str) -> None:
    """Globally select the depthwise-conv implementation (test/bench hook)."""
    global _DEFAULT_IMPL
    if impl not in _VALID_IMPLS:
        raise ValueError(f"impl must be one of {_VALID_IMPLS}, got {impl!r}")
    _DEFAULT_IMPL = impl


def same_pads(in_size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF/XLA 'SAME' padding for one dimension: total pad split low/high with
    the extra element on the high side (matches the reference's Keras convs)."""
    out_size = -(-in_size // stride)
    pad_total = max((out_size - 1) * stride + kernel - in_size, 0)
    lo = pad_total // 2
    return lo, pad_total - lo


def _resolve_pads(x_shape, kernel_shape, strides, padding):
    """Return explicit ((lo,hi),)*3 pads for the three spatiotemporal dims."""
    if padding == "SAME":
        return tuple(
            same_pads(x_shape[1 + i], kernel_shape[i], strides[i])
            for i in range(3)
        )
    if padding == "VALID":
        return ((0, 0), (0, 0), (0, 0))
    return tuple(tuple(p) for p in padding)


def depthwise_conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int] = (1, 1, 1),
    padding="SAME",
    impl: str | None = None,
) -> jnp.ndarray:
    """Depthwise 3D convolution over NDHWC input.

    Args:
      x: (B, T, H, W, C) input.
      kernel: (k_t, k_h, k_w, 1, C) taps — one filter per channel.
      strides: per-dim strides (temporal, height, width).
      padding: "SAME", "VALID", or explicit ((lo,hi),)*3.
      impl: override the global implementation choice.
    """
    impl = impl or _DEFAULT_IMPL
    if impl == "xla":
        return _dw_xla(x, kernel, strides, padding)
    if impl == "pallas":
        from x3d_tpu.ops import pallas_dw
        return pallas_dw.depthwise_conv3d_pallas(x, kernel, strides, padding)
    if impl == "bm":
        return _dw_bm_or_fallback(x, kernel, strides, padding)
    if impl == "shift_cvjp":
        pads = _resolve_pads(x.shape, kernel.shape[:3], strides, padding)
        return _dw_shift_cvjp(x, kernel, tuple(strides), pads)
    if impl == "xbwd":
        pads = _resolve_pads(x.shape, kernel.shape[:3], strides, padding)
        same = tuple(same_pads(x.shape[1 + i], kernel.shape[i], 1)
                     for i in range(3))
        if tuple(strides) != (1, 1, 1) or pads != same:
            return _dw_xla(x, kernel, strides, padding)
        return _dw_xbwd(x, kernel)
    if impl == "pbwd":
        # XLA forward emitter + one-pass Pallas backward (du + dk in a
        # single stream — see ops/dw_fused.dw_conv_pbwd); stride-1 SAME
        # odd-kernel full-lane cases only, else the XLA lowering
        from x3d_tpu.ops import dw_fused
        pads = _resolve_pads(x.shape, kernel.shape[:3], strides, padding)
        same = tuple(same_pads(x.shape[1 + i], kernel.shape[i], 1)
                     for i in range(3))
        odd = all(k % 2 == 1 for k in kernel.shape[:3])
        full = x.shape[0] % 128 == 0 or dw_fused.INTERPRET
        if (tuple(strides) != (1, 1, 1) or pads != same or not odd
                or not full or x.shape[1] < kernel.shape[0]):
            return _dw_xla(x, kernel, strides, padding)
        return dw_fused.dw_conv_pbwd(x, kernel)
    return _dw_shift(x, kernel, strides, padding)


def _dw_xla(x, kernel, strides, padding):
    pads = _resolve_pads(x.shape, kernel.shape[:3], strides, padding)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=tuple(strides),
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=x.dtype,
    )


def _dw_shift(x, kernel, strides, padding):
    """Unrolled shifted-FMA formulation.

    out[b, t, h, w, c] =
        Σ_{dt,dh,dw} pad(x)[b, t·s_t+dt, h·s_h+dh, w·s_w+dw, c] · k[dt,dh,dw,0,c]

    Each tap is a strided slice of the padded input times a (1,1,1,1,C)
    broadcast — pure VPU work that XLA fuses into one elementwise loop.
    """
    kt, kh, kw = kernel.shape[:3]
    st, sh, sw = strides
    pads = _resolve_pads(x.shape, kernel.shape[:3], strides, padding)
    xp = jnp.pad(x, ((0, 0),) + pads + ((0, 0),))
    _, tp, hp, wp, _ = xp.shape
    ot = (tp - kt) // st + 1
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1

    k = kernel.astype(x.dtype)
    out = None
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                tap = jax.lax.slice(
                    xp,
                    (0, dt, dh, dw, 0),
                    (xp.shape[0], dt + (ot - 1) * st + 1,
                     dh + (oh - 1) * sh + 1, dw + (ow - 1) * sw + 1,
                     xp.shape[4]),
                    (1, st, sh, sw, 1),
                )
                term = tap * k[dt, dh, dw, 0]
                out = term if out is None else out + term
    return out


def depthwise_conv3d_folded(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    fold_T: int,
    strides: Sequence[int] = (1, 1, 1),
    padding="SAME",
) -> jnp.ndarray:
    """Depthwise T×k×k conv on a **time-folded** batch (the L/XL layout fix).

    X3D never downsamples time, so the whole network can carry activations
    as (B·T, 1, H, W, C) — putting B·T on XLA's batch-minor lane dimension.
    At sub-128 batches the conventional (B, T, H, W, C) layout wastes
     2.4–8× of every vector register and HBM tile on lane padding (measured
    in the X3D-L OOM dumps, docs/PERF.md round 3); folding restores full
    128-lane occupancy (L: B·T = 16·16 = 256).

    A k_t×k_h×k_w depthwise conv on the folded layout is computed as k_t
    per-frame spatial depthwise convs (one per temporal tap, taking that
    tap's (1,k_h,k_w) kernel slice) summed after a static batch-axis shift,
    with clip-boundary rows masked to reproduce the temporal zero padding:

        y[b·T+t] = Σ_j  conv2d(x, k[j])[b·T+t+j-lo] · 1[0 ≤ t+j-lo < T]

    Identical tap count (k_t·k_h·k_w FMAs/element) to the unfolded conv;
    the shifts are static full-tensor rolls that XLA fuses into the sum.

    Matches the reference op (``/root/reference/model.py:259-267`` — the
    groups=C Conv3D) exactly; equality is tested against
    :func:`depthwise_conv3d` on the unfolded tensor.

    Args:
      x: (B·T, 1, H, W, C) folded input.
      kernel: (k_t, k_h, k_w, 1, C) taps — the SAME parameter as the
        unfolded op (checkpoints interchangeable).
      fold_T: frames per clip (static).
      strides: (1, s, s) — temporal stride must be 1 (true everywhere in
        X3D).
      padding: "SAME" or explicit ((lo,hi),)*3 over the logical (T, H, W).
    """
    kt, kh, kw = kernel.shape[:3]
    st, sh, sw = strides
    T = fold_T
    N = x.shape[0]
    if st != 1:
        raise ValueError("folded depthwise requires temporal stride 1")
    if x.shape[1] != 1 or N % T:
        raise ValueError(f"expected folded (B*{T},1,H,W,C) input, "
                         f"got {x.shape}")
    # Resolve pads against the logical (B, T, H, W, C) shape.
    logical = (N // T, T) + x.shape[2:]
    pads = _resolve_pads(logical, kernel.shape[:3], strides, padding)
    tlo, thi = pads[0]
    if (tlo, thi) != same_pads(T, kt, 1) and (tlo, thi) != (kt // 2, kt // 2):
        raise ValueError(f"unsupported temporal padding {(tlo, thi)}")
    spads = ((0, 0), pads[1], pads[2])
    k = kernel.astype(x.dtype)

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1, 1, 1, 1), 0) % T
    out = None
    for j in range(kt):
        cj = jax.lax.conv_general_dilated(
            x,
            k[j:j + 1],
            window_strides=(1, sh, sw),
            padding=spads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=x.shape[-1],
            preferred_element_type=x.dtype,
        )
        off = j - tlo
        if off:
            cj = jnp.roll(cj, -off, axis=0)
            cj = jnp.where((t_idx + off >= 0) & (t_idx + off < T), cj,
                           jnp.zeros((), cj.dtype))
        out = cj if out is None else out + cj
    return out


def _dw_bm_or_fallback(x, kernel, strides, padding):
    """Route to the batch-minor Pallas kernel (``ops/dw_batchminor.py``)
    when it applies — stride 1, SAME-equivalent pads, batch filling whole
    128-lane vectors — else the XLA grouped-conv lowering (the four
    stage-entry stride-2 convs and odd batches)."""
    from x3d_tpu.ops import dw_batchminor

    pads = _resolve_pads(x.shape, kernel.shape[:3], strides, padding)
    same = tuple(same_pads(x.shape[1 + i], kernel.shape[i], 1)
                 for i in range(3))
    full_lanes = x.shape[0] % 128 == 0 or dw_batchminor.INTERPRET
    if tuple(strides) != (1, 1, 1) or pads != same or not full_lanes:
        return _dw_xla(x, kernel, strides, padding)
    return dw_batchminor.dw_conv_bm(x, kernel, tuple(kernel.shape[:3]))


@jax.custom_vjp
def _dw_xbwd(x, kernel):
    """XLA forward conv with a hand-written backward (stride 1, SAME).

    Measured-and-rejected (round 2, v5e, full X3D-M train step, B=128):
    160 clips/s vs the XLA lowering's 277.  The hypothesis was that XLA's
    multi-output fusion would collapse the 27 dk multiply-reduces into one
    traversal of (x, g); the profile shows it does NOT (the reduces have
    per-tap slice offsets) — they compile to ~420 ms/step of separate loop
    fusions, each re-reading both operands.  Kept as a documented dispatch
    option; the structural fix is a Pallas kernel that streams (x, g) once
    and accumulates all taps (see ops/dw_fused.py).

      * dx = depthwise_conv(g, spatially flipped kernel) — the forward op
        on the cotangent (fine).
      * dk[tap, c] = sum_{b,t,h,w} x_shifted * g — the part XLA cannot
        lower to one pass.
    """
    return _dw_xla(x, kernel, (1, 1, 1), "SAME")


def _dw_xbwd_fwd(x, kernel):
    return _dw_xbwd(x, kernel), (x, kernel)


def _dw_xbwd_bwd(res, g):
    x, kernel = res
    kt, kh, kw = kernel.shape[:3]
    dx = _dw_xla(g, kernel[::-1, ::-1, ::-1], (1, 1, 1), "SAME")

    lo = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    dims = x.shape[1:4]

    def overlap(size, off):
        # x index = g index + off; clip both slices to the valid overlap
        xs = max(0, off)
        gs = max(0, -off)
        n = size - abs(off)
        return xs, gs, n

    taps = []
    for dt in range(kt):
        for dh in range(kh):
            for dw_ in range(kw):
                offs = (dt - lo[0], dh - lo[1], dw_ - lo[2])
                sl = [overlap(dims[i], offs[i]) for i in range(3)]
                xv = jax.lax.slice(
                    x,
                    (0, sl[0][0], sl[1][0], sl[2][0], 0),
                    (x.shape[0], sl[0][0] + sl[0][2], sl[1][0] + sl[1][2],
                     sl[2][0] + sl[2][2], x.shape[4]))
                gv = jax.lax.slice(
                    g,
                    (0, sl[0][1], sl[1][1], sl[2][1], 0),
                    (g.shape[0], sl[0][1] + sl[0][2], sl[1][1] + sl[1][2],
                     sl[2][1] + sl[2][2], g.shape[4]))
                taps.append(jnp.sum(
                    xv.astype(jnp.float32) * gv.astype(jnp.float32),
                    axis=(0, 1, 2, 3)))
    dk = jnp.stack(taps).reshape(kt, kh, kw, 1, x.shape[4])
    return dx, dk.astype(kernel.dtype)


_dw_xbwd.defvjp(_dw_xbwd_fwd, _dw_xbwd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dw_shift_cvjp(x, kernel, strides, pads):
    """Shift-formulation forward with the grouped-conv backward.

    The two lowerings are mathematically identical; each autodiff direction
    gets the one that lowers best on TPU:

      * forward: the unrolled shifted-FMA sum — XLA fuses all taps into a
        single VPU pass over the padded input (one HBM read of x).
      * backward: ``jax.vjp`` of the grouped-conv lowering — XLA's conv
        transpose computes dx as one conv (no 27 per-tap padded tensors;
        the shift formulation's autodiff materialises 24.7 GB on an X3D-M
        step) and dk as one contraction.

    ``pads`` must already be resolved to explicit ((lo,hi),)*3.
    """
    return _dw_shift(x, kernel, strides, pads)


def _dw_shift_cvjp_fwd(x, kernel, strides, pads):
    return _dw_shift(x, kernel, strides, pads), (x, kernel)


def _dw_shift_cvjp_bwd(strides, pads, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda x_, k_: _dw_xla(x_, k_, strides, pads), x, kernel)
    return vjp(g)


_dw_shift_cvjp.defvjp(_dw_shift_cvjp_fwd, _dw_shift_cvjp_bwd)


class DepthwiseConv3D(nn.Module):
    """Flax module wrapping :func:`depthwise_conv3d`.

    Parameter layout identical to ``nn.Conv(features=C, kernel_size,
    feature_group_count=C)`` so implementations (and checkpoints) are
    interchangeable.
    """

    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: object = "SAME"
    dtype: object = None
    param_dtype: object = jnp.float32
    kernel_init: object = nn.initializers.glorot_uniform()
    fold_T: int = 0     # >0: input is time-folded (B·fold_T, 1, H, W, C)

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            self.kernel_size + (1, channels),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        if self.fold_T > 1:
            return depthwise_conv3d_folded(
                x.astype(dtype), kernel.astype(dtype), self.fold_T,
                self.strides, self.padding)
        return depthwise_conv3d(
            x.astype(dtype), kernel.astype(dtype), self.strides, self.padding
        )
