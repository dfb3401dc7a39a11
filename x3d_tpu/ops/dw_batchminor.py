"""Batch-minor Pallas depthwise-3D-conv: fwd + dx + dk at the VPU floor.

Why this layout (measured, round 2, v5e, X3D-M batch 128)
---------------------------------------------------------
At the production batch of 128, XLA assigns *batch-minormost* layouts
(``{0,4,3,2,1:T(8,128)}``) to every large activation: the 128-wide batch
sits exactly on the 128-wide vector lanes, so tensors carry zero lane
padding.  In that layout a depthwise conv is pure aligned VPU work — every
tap is a (sublane=C, lane=B) full-vector FMA, and the tap shifts move along
the T/H/W *major* dims, never across lanes.  XLA's own lowering of the
grouped conv in this layout is ~2x off the 27-FMA VPU floor on the forward
and ~6x off on the backward (the 27 ``dk`` reductions re-read the
activations once per tap): the full-step profile attributes 265 ms/step to
depthwise convs, 191 ms of it backward, against a ~130 ms VPU floor.

This kernel streams the (logically transposed) ``(T, H, W, C, B)`` array
through VMEM in H-chunks — batch stays on lanes, C on sublanes — and
computes all 27 taps per element in one pass:

  * **fwd / dx**: one aligned FMA per tap into an f32 VMEM accumulator;
    dx is the same kernel with spatially flipped taps over the padded
    gradient (SAME, stride 1).
  * **dk**: a single streaming pass accumulating all 27 per-(tap, C, lane)
    partial products into one persistent f32 scratch; the final (tiny)
    lane reduction happens in JAX.

Because the wrapper's transposes map the logical NDHWC view onto the
physical batch-minor layout XLA already chose, they compile to layout
bitcasts, not data movement.

Supported: stride 1, SAME (or equivalent explicit) padding, any (kt,kh,kw)
— X3D's 22 stride-1 bottleneck convs and the stem's k×1×1.  The four
stage-entry stride-2 convs fall back to the XLA lowering in the dispatcher
(``x3d_tpu.ops.depthwise``).

Reference op: ``/root/reference/model.py:259-267`` (groups=C Conv3D).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True to run kernels in the Pallas interpreter (CPU tests).
INTERPRET = False

_LANES = 128
_SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_hc(h: int, budget_elems: int, row_elems: int, kh: int) -> int:
    """H-chunk size: largest divisor of h whose window fits the budget."""
    best = 1
    for hc in range(1, h + 1):
        if h % hc == 0 and (hc + kh - 1) * row_elems <= budget_elems:
            best = hc
    return best


def _ring_io(xp_hbm, ring, sem, hi, t, kt, T, hc, kh):
    """Plane-window ring: at grid step (hi, t) the ring holds the H-chunk
    windows of temporal planes t..t+kt-1; the (t+kt) window prefetches
    during compute.  One HBM read of the input per H-pass."""
    nslots = kt + 1

    def dma(plane, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[plane, pl.ds(hi * hc, hc + kh - 1)],
            ring.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _():
        for p in range(kt):
            dma(p, p % nslots).start()
        if T > 1:
            dma(kt, kt % nslots).start()
        for p in range(kt):
            dma(p, p % nslots).wait()

    @pl.when(t > 0)
    def _():
        cur = t + kt - 1
        dma(cur, cur % nslots).wait()

        @pl.when(t < T - 1)
        def _():
            dma(t + kt, (t + kt) % nslots).start()

    return nslots


def _fwd_kernel(xp_hbm, wk_ref, out_ref, ring, sem, acc_ref, *,
                kt, kh, kw, T, hc, W, Cp, B):
    hi = pl.program_id(0)
    t = pl.program_id(1)
    nslots = _ring_io(xp_hbm, ring, sem, hi, t, kt, T, hc, kh)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dt in range(kt):
        win = ring.at[(t + dt) % nslots]     # (hc+kh-1, W+kw-1, Cp, B)
        for dh in range(kh):
            rows = win[dh:dh + hc]           # (hc, W+kw-1, Cp, B)
            rows32 = rows.astype(jnp.float32)
            for dw in range(kw):
                tap = dt * kh * kw + dh * kw + dw
                acc_ref[...] += (rows32[:, dw:dw + W]
                                 * wk_ref[tap][None, None])
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _dk_kernel(xp_hbm, g_ref, dk_ref, ring, sem, acc_ref, *,
               kt, kh, kw, T, hc, W, Cp, B):
    hi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(hi == 0, t == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nslots = _ring_io(xp_hbm, ring, sem, hi, t, kt, T, hc, kh)

    g32 = g_ref[0].astype(jnp.float32)       # (hc, W, Cp, B)
    for dt in range(kt):
        win = ring.at[(t + dt) % nslots]
        for dh in range(kh):
            rows32 = win[dh:dh + hc].astype(jnp.float32)
            for dw in range(kw):
                tap = dt * kh * kw + dh * kw + dw
                acc_ref[tap] += jnp.sum(rows32[:, dw:dw + W] * g32,
                                        axis=(0, 1))

    @pl.when(jnp.logical_and(hi == pl.num_programs(0) - 1,
                             t == pl.num_programs(1) - 1))
    def _():
        dk_ref[...] = acc_ref[...]


def _common(xt_padded, kdims, Cp, B):
    kt, kh, kw = kdims
    Tp, Hp, Wp = xt_padded.shape[:3]
    T = Tp - (kt - 1)
    H = Hp - (kh - 1)
    W = Wp - (kw - 1)
    # VMEM budget: ring (kt+1 windows) + acc + weights <= ~48 MB
    row_elems = Wp * Cp * B
    budget = (40 * 1024 * 1024) // (2 * (kt + 1))     # bf16 window bytes
    hc = _pick_hc(H, budget, row_elems, kh)
    return kt, kh, kw, T, H, W, hc


def _run_fwd(xp, wk, kdims, out_dtype):
    Cp, B = xp.shape[3], xp.shape[4]
    kt, kh, kw, T, H, W, hc = _common(xp, kdims, Cp, B)
    kernel = functools.partial(_fwd_kernel, kt=kt, kh=kh, kw=kw, T=T,
                               hc=hc, W=W, Cp=Cp, B=B)
    return pl.pallas_call(
        kernel,
        grid=(H // hc, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # padded input in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # (taps, Cp, B) weights
        ],
        out_specs=pl.BlockSpec((1, hc, W, Cp, B),
                               lambda hi, t: (t, hi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H, W, Cp, B), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, hc + kh - 1, W + kw - 1, Cp, B), xp.dtype),
            pltpu.SemaphoreType.DMA((kt + 1,)),
            pltpu.VMEM((hc, W, Cp, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=INTERPRET,
    )(xp, wk)


def _out_perm_to_ndhwc(y):
    return jnp.transpose(y, (4, 0, 1, 2, 3))


def _prep(x, kdims):
    """NDHWC -> padded (T+kt-1, H+kh-1, W+kw-1, Cp, B) batch-minor array."""
    kt, kh, kw = kdims
    B, T, H, W, C = x.shape
    Cp = _round_up(C, _SUBLANES)
    xt = jnp.transpose(x, (1, 2, 3, 4, 0))
    xp = jnp.pad(xt, ((kt // 2, kt // 2), (kh // 2, kh // 2),
                      (kw // 2, kw // 2), (0, Cp - C), (0, 0)))
    return xp, Cp


def _tap_weights(kernel, Cp, B):
    """(kt,kh,kw,1,C) -> (taps, Cp, B) f32, channel value tiled over lanes."""
    kt, kh, kw = kernel.shape[:3]
    C = kernel.shape[4]
    w = kernel.reshape(kt * kh * kw, C).astype(jnp.float32)
    w = jnp.pad(w, ((0, 0), (0, Cp - C)))
    return jnp.broadcast_to(w[:, :, None], (kt * kh * kw, Cp, B))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv_bm(x: jnp.ndarray, kernel: jnp.ndarray,
               kdims: Tuple[int, int, int]) -> jnp.ndarray:
    """Depthwise conv on NDHWC input, stride 1, SAME zero padding.

    ``kernel``: (kt, kh, kw, 1, C).  Requires batch % 128 == 0 for full
    lane occupancy (dispatcher falls back to XLA otherwise).
    """
    return _dw_bm_fwd(x, kernel, kdims)[0]


def _dw_bm_fwd(x, kernel, kdims):
    C = x.shape[4]
    xp, Cp = _prep(x, kdims)
    wk = _tap_weights(kernel, Cp, x.shape[0])
    y = _run_fwd(xp, wk, kdims, x.dtype)[:, :, :, :C]
    return _out_perm_to_ndhwc(y), (x, kernel)


def _dw_bm_bwd(kdims, res, g):
    x, kernel = res
    B, T, H, W, C = x.shape
    kt, kh, kw = kdims

    # dx: correlate g with spatially flipped taps (SAME, stride 1)
    gp, Cp = _prep(g, kdims)
    wk_flip = _tap_weights(kernel[::-1, ::-1, ::-1], Cp, B)
    dx = _out_perm_to_ndhwc(
        _run_fwd(gp, wk_flip, kdims, x.dtype)[:, :, :, :C])

    # dk: stream x once, accumulate (taps, Cp, B) partials
    xp, _ = _prep(x, kdims)
    gt = jnp.transpose(g, (1, 2, 3, 4, 0))
    gt = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (0, Cp - C), (0, 0)))
    kt_, kh_, kw_, T_, H_, W_, hc = _common(xp, kdims, Cp, B)
    kernel_fn = functools.partial(_dk_kernel, kt=kt_, kh=kh_, kw=kw_, T=T_,
                                  hc=hc, W=W_, Cp=Cp, B=B)
    taps = kt * kh * kw
    dk_lanes = pl.pallas_call(
        kernel_fn,
        grid=(H // hc, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, hc, W, Cp, B), lambda hi, t: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((taps, Cp, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, hc + kh - 1, W + kw - 1, Cp, B), xp.dtype),
            pltpu.SemaphoreType.DMA((kt + 1,)),
            pltpu.VMEM((taps, Cp, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=INTERPRET,
    )(xp, gt)
    dk = dk_lanes.sum(axis=2)[:, :C].reshape(kt, kh, kw, 1, C)
    return dx, dk.astype(kernel.dtype)


dw_conv_bm.defvjp(_dw_bm_fwd, _dw_bm_bwd)
