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
