"""Pallas depthwise-3D-conv kernel on the dense fused-lane layout.

The op that XLA cannot do well here: a ``groups=C`` T×K×K conv over
activations whose channel count (54/108/216/432) pads the lane dimension
2.4x in the native NDHWC layout.  Expressing the conv as shifted FMAs in
plain JAX keeps the layout dense but re-reads the input 27x from HBM;
XLA's grouped conv reuses its input via VMEM but pays the padded layout.
This kernel gets both: dense fused rows AND VMEM reuse.

Design
------
Input arrives as dense rows ``(B, T+2pt, Hp, WCp)`` — T/H zero-padded for
the temporal/vertical taps (the producing BN/ReLU chain fuses into the pad,
so this copy is the tensor that had to be materialised anyway); rows are
lane-padded to a multiple of 128 with zeros so whole-plane DMAs are
tile-aligned.  Grid is ``(B, T)``; a persistent VMEM scratch ring holds the
``kt`` input planes the current output frame needs, and each grid step DMAs
exactly ONE new plane — HBM reads the input exactly once.

Lane alignment is the whole game on the VPU: a W-tap read at offset
``dwi*C`` costs a vreg shuffle per vector.  Instead of 27 misaligned reads,
the kernel accumulates kw *unshifted* per-tap partial sums (every read
lane-aligned at offset 0) and applies just kw-1 zero-fill lane shifts per
H-chunk at the end:

    out = y_c + lshift(y_0, +C) + rshift(y_2, -C)    (kw = 3)

where ``y_dwi = Σ_{dt,dh} plane[h+dh] * w[dt,dh,dwi]``.  Zero-fill shifting
reproduces SAME zero padding exactly (no W pre-padding needed).

The backward pass reuses the structure: dx is the same kernel with
spatially flipped taps; dk accumulates per-tap per-lane products into a
persistent (ktaps, WCp) f32 scratch — shifting the *grad* rows instead —
and the tiny per-channel reduction happens in JAX afterwards.
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _zshift(y: jnp.ndarray, s: int, width: int) -> jnp.ndarray:
    """Shift lanes by ``s`` (+: toward higher indices), filling zeros."""
    if s == 0:
        return y
    if s > 0:
        return jnp.pad(y[:, :width - s], ((0, 0), (s, 0)))
    return jnp.pad(y[:, -s:], ((0, 0), (0, -s)))


def _ring_io(xp_hbm, ring, sem, b, t, kt, T):
    """Prefetching plane ring: at step t the ring must hold planes
    t..t+kt-1; plane t+kt is fetched in the background during compute.
    Ring has kt+1 slots so the prefetch never clobbers a live plane.
    Returns nslots."""
    nslots = kt + 1

    def dma(plane, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[b, plane], ring.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _():
        for p in range(kt):
            dma(p, p % nslots).start()
        if T > 1:  # prefetch the next step's plane
            dma(kt, kt % nslots).start()
        for p in range(kt):
            dma(p, p % nslots).wait()

    @pl.when(t > 0)
    def _():
        cur = t + kt - 1
        dma(cur, cur % nslots).wait()

        @pl.when(t < T - 1)
        def _():
            nxt = t + kt
            dma(nxt, nxt % nslots).start()

    return nslots


def _fwd_kernel(xp_hbm, wk_ref, out_ref, ring, sem, *, kt, kh, kw, H, WCp,
                C, T):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nslots = _ring_io(xp_hbm, ring, sem, b, t, kt, T)

    CH = H  # whole-plane accumulation (VMEM budget raised to 100 MB)
    for h0 in range(0, H, CH):
        # kw unshifted partial sums — every read/FMA is lane-aligned
        ys = [jnp.zeros((CH, WCp), jnp.float32) for _ in range(kw)]
        for dt in range(kt):
            plane_ref = ring.at[(t + dt) % nslots]
            for dh in range(kh):
                rows = plane_ref[h0 + dh:h0 + dh + CH, :]
                rows32 = rows.astype(jnp.float32)
                for dwi in range(kw):
                    ys[dwi] += rows32 * wk_ref[dt * kh * kw + dh * kw + dwi]
        # kw-1 zero-fill lane shifts reproduce SAME zero padding
        acc = ys[kw // 2]
        for dwi in range(kw):
            s = (kw // 2 - dwi) * C
            if s:
                acc += _zshift(ys[dwi], s, WCp)
        out_ref[0, 0, h0:h0 + CH] = acc.astype(out_ref.dtype)


def _dk_kernel(xp_hbm, g_ref, dk_ref, ring, sem, acc_ref, *, kt, kh, kw, H,
               WCp, C, T):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nslots = _ring_io(xp_hbm, ring, sem, b, t, kt, T)

    CH = 8 if H % 8 == 0 else H
    for h0 in range(0, H, CH):
        g_rows = g_ref[0, 0, h0:h0 + CH, :].astype(jnp.float32)
        # dk[tap=(dt,dh,dwi)] needs sum_w x[w+dw]*g[w] = sum_w x[w]*g[w-dw]:
        # shift the grad rows once per dwi, reads of x stay aligned
        g_sh = [_zshift(g_rows, (dwi - kw // 2) * C, WCp)
                for dwi in range(kw)]
        for dt in range(kt):
            plane_ref = ring.at[(t + dt) % nslots]
            for dh in range(kh):
                rows32 = plane_ref[h0 + dh:h0 + dh + CH, :].astype(
                    jnp.float32)
                for dwi in range(kw):
                    idx = dt * kh * kw + dh * kw + dwi
                    acc_ref[idx, :] += jnp.sum(rows32 * g_sh[dwi], axis=0)

    @pl.when(jnp.logical_and(b == pl.num_programs(0) - 1,
                             t == pl.num_programs(1) - 1))
    def _():
        dk_ref[...] = acc_ref[...]


def _pad_rows(x_rows: jnp.ndarray, pt: int, ph: int):
    """(B, T, H, WC) -> (B, T+2pt, Hp, WCp): T/H zero-pad for the taps, H
    rounded to 8 sublanes and rows to 128 lanes for tile-aligned DMAs."""
    B, T, H, WC = x_rows.shape
    hp_extra = _round_up(H + 2 * ph, 8) - (H + 2 * ph)
    wcp_extra = _round_up(WC, 128) - WC
    return jnp.pad(
        x_rows, ((0, 0), (pt, pt), (ph, ph + hp_extra), (0, wcp_extra)))


def _tiled_weights(kernel: jnp.ndarray, W: int, WCp: int) -> jnp.ndarray:
    """(kt,kh,kw,1,C) -> (kt*kh*kw, WCp) f32 per-tap lane vectors."""
    kt, kh, kw = kernel.shape[:3]
    w = jnp.tile(kernel[:, :, :, 0, :].astype(jnp.float32), (1, 1, 1, W))
    w = w.reshape(kt * kh * kw, -1)
    return jnp.pad(w, ((0, 0), (0, WCp - w.shape[1])))


def _run_fwd(xp, wk, *, B, T, H, WCp, C, kt, kh, kw, out_dtype):
    kernel = functools.partial(
        _fwd_kernel, kt=kt, kh=kh, kw=kw, H=H, WCp=WCp, C=C, T=T)
    Hp = xp.shape[2]
    return pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # tap weights
        ],
        out_specs=pl.BlockSpec((1, 1, H, WCp), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H, WCp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, Hp, WCp), xp.dtype),
            pltpu.SemaphoreType.DMA((kt + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(xp, wk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_conv_rows(x_rows: jnp.ndarray, kernel: jnp.ndarray, channels: int,
                 kdims: Tuple[int, int, int]) -> jnp.ndarray:
    """Depthwise conv on dense rows: (B, T, H, W*C) -> (B, T, H, W*C).

    SAME padding, stride 1.  ``kernel``: (kt, kh, kw, 1, C).
    """
    return _dw_rows_fwd(x_rows, kernel, channels, kdims)[0]


def _dw_rows_fwd(x_rows, kernel, channels, kdims):
    kt, kh, kw = kdims
    B, T, H, WC = x_rows.shape
    C = channels
    W = WC // C
    xp = _pad_rows(x_rows, kt // 2, kh // 2)
    WCp = xp.shape[3]
    wk = _tiled_weights(kernel, W, WCp)
    out = _run_fwd(xp, wk, B=B, T=T, H=H, WCp=WCp, C=C, kt=kt, kh=kh, kw=kw,
                   out_dtype=x_rows.dtype)
    return out[..., :WC], (x_rows, kernel)


def _dw_rows_bwd(channels, kdims, res, g):
    x_rows, kernel = res
    kt, kh, kw = kdims
    B, T, H, WC = x_rows.shape
    C = channels
    W = WC // C

    # dx = conv(g, spatially flipped taps), also SAME/stride-1
    flipped = kernel[::-1, ::-1, ::-1]
    gp = _pad_rows(g, kt // 2, kh // 2)
    WCp = gp.shape[3]
    wk_flip = _tiled_weights(flipped, W, WCp)
    dx = _run_fwd(gp, wk_flip, B=B, T=T, H=H, WCp=WCp, C=C, kt=kt, kh=kh,
                  kw=kw, out_dtype=x_rows.dtype)[..., :WC]

    # dk[tap, :] accumulated per lane; per-channel reduction done in JAX
    xp = _pad_rows(x_rows, kt // 2, kh // 2)
    Hp = xp.shape[2]
    g_padded = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, WCp - WC)))
    kernel_fn = functools.partial(
        _dk_kernel, kt=kt, kh=kh, kw=kw, H=H, WCp=WCp, C=C, T=T)
    dk_lanes = pl.pallas_call(
        kernel_fn,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, H, WCp), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kt * kh * kw, WCp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, Hp, WCp), xp.dtype),
            pltpu.SemaphoreType.DMA((kt + 1,)),
            pltpu.VMEM((kt * kh * kw, WCp), jnp.float32),
        ],
        interpret=INTERPRET,
    )(xp, g_padded)
    dk = dk_lanes[:, :WC].reshape(kt * kh * kw, W, C).sum(axis=1)
    dk = dk.reshape(kt, kh, kw, 1, C).astype(kernel.dtype)
    return dx, dk


dw_conv_rows.defvjp(_dw_rows_fwd, _dw_rows_bwd)


def dw_conv_dense_pallas(x: jnp.ndarray, kernel: jnp.ndarray, g: int,
                         channels: int) -> jnp.ndarray:
    """Stride-1 depthwise conv on (B, T, H, W/g, g*C) fused activations."""
    b, t, h, wg, gc = x.shape
    rows = x.reshape(b, t, h, wg * gc)
    out = dw_conv_rows(rows, kernel, channels, tuple(kernel.shape[:3]))
    return out.reshape(b, t, h, wg, gc)


def depthwise_conv3d_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                            strides=(1, 1, 1), padding="SAME") -> jnp.ndarray:
    """NDHWC adapter: the ``impl="pallas"`` entry of
    :func:`x3d_tpu.ops.depthwise.depthwise_conv3d`.

    Reshapes (B, T, H, W, C) to dense rows (B, T, H, W*C), runs the
    custom-VJP :func:`dw_conv_rows` kernel (fwd + bwd on device), and
    restores the NDHWC view.  The row kernel supports stride 1 with SAME
    zero padding only; strided calls (X3D's three stage-entry downsampling
    blocks) fall back to the XLA grouped-conv lowering — identical math,
    documented at reference ``model.py:259-267``.
    """
    from x3d_tpu.ops import depthwise as _dw

    pads = _dw._resolve_pads(x.shape, kernel.shape[:3], strides, padding)
    same = tuple(_dw.same_pads(x.shape[1 + i], kernel.shape[i], 1)
                 for i in range(3))
    if tuple(strides) != (1, 1, 1) or pads != same:
        return _dw._dw_xla(x, kernel, strides, padding)
    b, t, h, w, c = x.shape
    rows = x.reshape(b, t, h, w * c)
    out = dw_conv_rows(rows, kernel, c, tuple(kernel.shape[:3]))
    return out.reshape(b, t, h, w, c)
