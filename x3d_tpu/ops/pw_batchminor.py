"""Batch-minor MXU pointwise (1x1x1) conv: Pallas dot_general per H-chunk.

Why (measured, round 2, v5e, X3D-M batch 128): at the production batch of
128 XLA assigns batch-minormost layouts to all large activations (see
``ops/dw_batchminor.py``) and then lowers the 1x1x1 convs — dense
channel-mixing matmuls, the MXU's home turf — as padded VPU loops: the
full-step profile attributes ~190 ms/step to pointwise convs (e.g.
6.8 ms/instance for stage2's 24->54) against a sub-millisecond MXU bound.

This kernel reads the activation through its *batch-minor view*
(``(T, H, W, C, B)`` — the logical transpose of NDHWC is a layout bitcast,
not data movement, precisely because XLA already keeps the tensor
batch-minor), and per (T, H-chunk) block computes

    y[s, d, b] = sum_c x[s, c, b] * w[c, d]

as one ``dot_general`` contracting the sublane C dim (MXU) followed by a
minor<->second-minor vreg transpose — both natively supported by Mosaic.
Measured in isolation the kernel body runs at sub-millisecond per stage2
instance vs XLA's 4-7 ms.

Used by ``x3d_tpu.ops.pointwise`` under ``impl="mxu"``; the dispatcher
falls back to XLA for small spatial extents (SE/head 1x1x1 convs), batches
that do not fill whole 128-lane vectors, and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

_SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_hc(h: int, w: int, cp: int, dp: int, b: int) -> int:
    """Largest divisor of h keeping in+out+f32-acc blocks under ~24 MB."""
    best = 1
    for hc in range(1, h + 1):
        if h % hc == 0:
            bytes_ = hc * w * b * (2 * cp + 2 * dp + 4 * dp)
            if bytes_ <= 24 * 1024 * 1024:
                best = hc
    return best


def _pw_kernel(x_ref, w_ref, out_ref, *, hc, W, Cp, Dp, B):
    x = x_ref[0].reshape(hc * W, Cp, B)
    y = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = jnp.swapaxes(y.astype(out_ref.dtype), 1, 2)        # (S, Dp, B)
    out_ref[0] = y.reshape(hc, W, Dp, B)


def _run(xt, w2, out_dtype):
    T, H, W, Cp, B = xt.shape
    Dp = w2.shape[1]
    hc = _pick_hc(H, W, Cp, Dp, B)
    kern = functools.partial(_pw_kernel, hc=hc, W=W, Cp=Cp, Dp=Dp, B=B)
    return pl.pallas_call(
        kern,
        grid=(T, H // hc),
        in_specs=[
            pl.BlockSpec((1, hc, W, Cp, B), lambda t, hi: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hc, W, Dp, B),
                               lambda t, hi: (t, hi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H, W, Dp, B), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(xt, w2)


def _bm_pad(x, cp):
    """NDHWC -> (T, H, W, Cp, B) batch-minor view, C zero-padded."""
    xt = jnp.transpose(x, (1, 2, 3, 4, 0))
    c = x.shape[4]
    if cp != c:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, cp - c), (0, 0)))
    return xt


def _apply(x, k2, out_dtype):
    cin, cout = k2.shape
    cp = _round_up(cin, _SUBLANES)
    dp = _round_up(cout, _SUBLANES)
    xt = _bm_pad(x, cp)
    w2 = jnp.pad(k2.astype(x.dtype), ((0, cp - cin), (0, dp - cout)))
    y = _run(xt, w2, out_dtype)[:, :, :, :cout]
    return jnp.transpose(y, (4, 0, 1, 2, 3))


@jax.custom_vjp
def pw_conv_bm(x: jnp.ndarray, k2: jnp.ndarray) -> jnp.ndarray:
    """1x1x1 conv: x (B, T, H, W, Cin) @ k2 (Cin, Cout) -> (..., Cout)."""
    return _apply(x, k2, x.dtype)


def _pw_bm_fwd(x, k2):
    return _apply(x, k2, x.dtype), (x, k2)


def _pw_bm_bwd(res, g):
    x, k2 = res
    dx = _apply(g, jnp.transpose(k2), x.dtype)   # g @ k2^T, same kernel
    # dk = sum over batch+spatial of x^T g — a (Cin, Cout) contraction XLA
    # lowers to one MXU reduce-matmul regardless of layout (tiny output)
    dk = jnp.einsum("bthwc,bthwd->cd", x.astype(jnp.float32),
                    g.astype(jnp.float32))
    return dx, dk.astype(k2.dtype)


pw_conv_bm.defvjp(_pw_bm_fwd, _pw_bm_bwd)


# --------------------------------------------- MXU pointwise + BN stat sums


def _pw_stats_kernel(x_ref, w_ref, out_ref, p_ref, s2_ref, p_acc, s2_acc,
                     *, hc, W, Cp, Dp, B):
    """One (t, h-chunk) block: y = x @ w on the MXU, plus f32 per-(channel,
    sample) sums of y and y^2 accumulated across the grid — the round-2
    ``pw_bm`` experiment lost to the un-fused BN stat passes at the custom-
    call boundary (docs/PERF.md row 7); emitting the sums from the kernel's
    epilogue removes that boundary the same way ``ops/dw_fused.py`` does
    for the depthwise segment."""
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        p_acc[...] = jnp.zeros_like(p_acc)
        s2_acc[...] = jnp.zeros_like(s2_acc)

    x = x_ref[0].reshape(hc * W, Cp, B)
    y32 = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # y32: (S, B, Dp)
    p_acc[...] += jnp.sum(y32, axis=0)
    s2_acc[...] += jnp.sum(y32 * y32, axis=0)
    y = jnp.swapaxes(y32.astype(out_ref.dtype), 1, 2)          # (S, Dp, B)
    out_ref[0] = y.reshape(hc, W, Dp, B)

    @pl.when(step == pl.num_programs(0) * pl.num_programs(1) - 1)
    def _():
        p_ref[...] = p_acc[...]
        s2_ref[...] = s2_acc[...]


def _run_stats(xt, w2, out_dtype):
    T, H, W, Cp, B = xt.shape
    Dp = w2.shape[1]
    hc = _pick_hc(H, W, Cp, Dp, B)
    kern = functools.partial(_pw_stats_kernel, hc=hc, W=W, Cp=Cp, Dp=Dp, B=B)
    return pl.pallas_call(
        kern,
        grid=(T, H // hc),
        in_specs=[
            pl.BlockSpec((1, hc, W, Cp, B), lambda t, hi: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hc, W, Dp, B), lambda t, hi: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, W, Dp, B), out_dtype),
            jax.ShapeDtypeStruct((B, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, Dp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, Dp), jnp.float32),
            pltpu.VMEM((B, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(xt, w2)


def _apply_stats(x, k2, out_dtype):
    """Full conv + sums.  k2 must already be sublane-padded on BOTH dims
    (the aligned path's zero weight pads); no output slicing here — the
    consumer keeps the padded channel tile."""
    cin, cout = k2.shape
    assert cin % _SUBLANES == 0 and cout % _SUBLANES == 0, (cin, cout)
    xt = jnp.transpose(x, (1, 2, 3, 4, 0))
    y, p, s2 = _run_stats(xt, k2.astype(x.dtype), out_dtype)
    return (jnp.transpose(y, (4, 0, 1, 2, 3)),
            jnp.transpose(p), jnp.transpose(s2))               # (Dp, B)


@jax.custom_vjp
def pw_conv_bm_stats(x: jnp.ndarray, k2: jnp.ndarray):
    """1x1x1 conv + per-(channel, sample) f32 sums of y and y^2.

    x: (B, T, H, W, Cin); k2: (Cin, Cout), both channel dims 8-aligned.
    Returns (y (B,T,H,W,Cout), p (Cout,B), s2 (Cout,B)) — p/s2 feed the
    next BN's batch statistics (incl. grouped/per-replica via per-sample
    columns) exactly like ``ops/dw_fused.dw_bn_act_conv``'s sums.

    The backward is PLAIN XLA (conv for dx, one reduce-matmul for dk):
    keeping Pallas out of the backward graph preserves XLA's own
    rematerialisation (a Pallas call in the backward costs +4.2 GB on
    X3D-M B=128 — docs/PERF.md row 6).
    """
    return _apply_stats(x, k2, x.dtype)


def _pw_stats_fwd(x, k2):
    y, p, s2 = _apply_stats(x, k2, x.dtype)
    # y IS a residual on purpose: the custom-call output is pinned across
    # the backward regardless (XLA cannot rematerialise a custom call), so
    # saving it costs nothing, while recomputing it in the backward was
    # measured to add +337 MB of extra temps (16.05 -> 16.38 GB on X3D-M
    # B=128) on top of the same pinned buffer
    return (y, p, s2), (x, k2, y)


def _pw_stats_bwd(res, cot):
    x, k2, y = res
    gy, gp, gs2 = cot
    B = x.shape[0]
    # dL/dy_total = gy + gp (broadcast over T,H,W) + 2*y*gs2
    gp_b = jnp.transpose(gp).reshape(B, 1, 1, 1, -1)
    gs2_b = jnp.transpose(gs2).reshape(B, 1, 1, 1, -1)
    dy = (gy.astype(jnp.float32) + gp_b
          + 2.0 * y.astype(jnp.float32) * gs2_b).astype(x.dtype)
    dx = jax.lax.conv_general_dilated(
        dy, jnp.transpose(k2).reshape(1, 1, 1, k2.shape[1], k2.shape[0])
        .astype(dy.dtype),
        (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    dk = jnp.einsum("bthwc,bthwd->cd", x.astype(jnp.float32),
                    dy.astype(jnp.float32))
    return dx, dk.astype(k2.dtype)


pw_conv_bm_stats.defvjp(_pw_stats_fwd, _pw_stats_bwd)


# ---------------------------- MXU activation+pointwise conv + BN stat sums


def _pw_act_stats_kernel(x_ref, a_ref, b_ref, w_ref, out_ref, p_ref, s2_ref,
                         p_acc, s2_acc, *, hc, W, Cp, Dp, B):
    """z = swish(x*a + b) @ w with f32 per-(channel, sample) sums of z and
    z^2 — the contracting ("c") conv of the aligned bottleneck with every
    fusion XLA attaches to it subsumed: the bn_b affine + SE gate ride the
    (a, b) coefficient columns, swish runs in-kernel, and bn_c's statistics
    come from the epilogue sums."""
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        p_acc[...] = jnp.zeros_like(p_acc)
        s2_acc[...] = jnp.zeros_like(s2_acc)

    x = x_ref[0].reshape(hc * W, Cp, B).astype(jnp.float32)
    v = x * a_ref[...][None] + b_ref[...][None]
    u = (v * jax.nn.sigmoid(v)).astype(out_ref.dtype)       # swish
    z32 = jax.lax.dot_general(u, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # z32: (S, B, Dp)
    p_acc[...] += jnp.sum(z32, axis=0)
    s2_acc[...] += jnp.sum(z32 * z32, axis=0)
    z = jnp.swapaxes(z32.astype(out_ref.dtype), 1, 2)       # (S, Dp, B)
    out_ref[0] = z.reshape(hc, W, Dp, B)

    @pl.when(step == pl.num_programs(0) * pl.num_programs(1) - 1)
    def _():
        p_ref[...] = p_acc[...]
        s2_ref[...] = s2_acc[...]


def _run_act_stats(xt, a_cb, b_cb, w2, out_dtype):
    T, H, W, Cp, B = xt.shape
    Dp = w2.shape[1]
    hc = _pick_hc(H, W, Cp, Dp, B)
    kern = functools.partial(_pw_act_stats_kernel, hc=hc, W=W, Cp=Cp, Dp=Dp,
                             B=B)
    return pl.pallas_call(
        kern,
        grid=(T, H // hc),
        in_specs=[
            pl.BlockSpec((1, hc, W, Cp, B), lambda t, hi: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hc, W, Dp, B), lambda t, hi: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, W, Dp, B), out_dtype),
            jax.ShapeDtypeStruct((B, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, Dp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, Dp), jnp.float32),
            pltpu.VMEM((B, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(xt, a_cb, b_cb, w2)


def _apply_act_stats(x, a_cb, b_cb, k2, out_dtype):
    cin, cout = k2.shape
    assert cin % _SUBLANES == 0 and cout % _SUBLANES == 0, (cin, cout)
    xt = jnp.transpose(x, (1, 2, 3, 4, 0))
    y, p, s2 = _run_act_stats(xt, a_cb.astype(jnp.float32),
                              b_cb.astype(jnp.float32),
                              k2.astype(x.dtype), out_dtype)
    return (jnp.transpose(y, (4, 0, 1, 2, 3)),
            jnp.transpose(p), jnp.transpose(s2))


@jax.custom_vjp
def pw_act_conv_bm_stats(x, a_cb, b_cb, k2):
    """z = swish(x*a + b) @ k2, plus f32 sums of z and z^2.

    x: (B, T, H, W, Cin) raw depthwise output; a_cb/b_cb: (Cin, B) f32
    coefficient columns carrying the bn_b affine (and the SE gate, folded
    by the caller: (y*m+o)*s == y*(m*s) + (o*s)); k2: (Cin, Cout).
    Returns (z (B,T,H,W,Cout), p (Cout,B), s2 (Cout,B)) — bn_c's batch
    statistics come from p/s2, so no separate stat pass exists.

    Backward is PLAIN XLA (see ``pw_conv_bm_stats``): u is recomputed
    elementwise from (x, a, b) — XLA fuses it into the dk contraction —
    keeping Pallas out of the backward graph.
    """
    return _apply_act_stats(x, a_cb, b_cb, k2, x.dtype)


def _pw_act_stats_fwd(x, a_cb, b_cb, k2):
    z, p, s2 = _apply_act_stats(x, a_cb, b_cb, k2, x.dtype)
    # z saved for the same reason as _pw_stats_fwd's y: the custom-call
    # output is pinned anyway, recomputing it only adds temps
    return (z, p, s2), (x, a_cb, b_cb, k2, z)


def _pw_act_stats_bwd(res, cot):
    x, a_cb, b_cb, k2, z = res
    gz, gp, gs2 = cot
    B = x.shape[0]
    cshape = (B, 1, 1, 1, -1)
    a_e = jnp.transpose(a_cb).reshape(cshape)
    b_e = jnp.transpose(b_cb).reshape(cshape)
    v = x.astype(jnp.float32) * a_e + b_e
    sig = jax.nn.sigmoid(v)
    u = (v * sig).astype(x.dtype)
    # dL/dz_total = gz + gp (broadcast) + 2*z*gs2
    gp_b = jnp.transpose(gp).reshape(cshape)
    gs2_b = jnp.transpose(gs2).reshape(cshape)
    dz = (gz.astype(jnp.float32) + gp_b
          + 2.0 * z.astype(jnp.float32) * gs2_b).astype(x.dtype)
    du = jax.lax.conv_general_dilated(
        dz, jnp.transpose(k2).reshape(1, 1, 1, k2.shape[1], k2.shape[0])
        .astype(dz.dtype),
        (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")).astype(jnp.float32)
    dv = du * (sig * (1.0 + v * (1.0 - sig)))               # swish'
    dx = (dv * a_e).astype(x.dtype)
    da = jnp.transpose(jnp.sum(dv * x.astype(jnp.float32), axis=(1, 2, 3)))
    db = jnp.transpose(jnp.sum(dv, axis=(1, 2, 3)))
    dk = jnp.einsum("bthwc,bthwd->cd", u.astype(jnp.float32),
                    dz.astype(jnp.float32))
    return dx, da, db, dk.astype(k2.dtype)


pw_act_conv_bm_stats.defvjp(_pw_act_stats_fwd, _pw_act_stats_bwd)
