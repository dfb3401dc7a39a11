"""Dense fused-lane activation layout — a RETIRED round-1 experiment.

Status: unwired.  This module is not used by the model; the lane-density
problem it attacks is solved in production by the aligned-channel mode
(``TPU.FUSED_DW`` + ``models/x3d.py``'s aligned segment) and, for sub-128
batches, the time-folded layout (``TPU.TIME_FOLD``, ops/depthwise.py) —
both measured faster in full-step A/Bs (docs/PERF.md).  It is kept because
the kernels are real, tested (tests/test_dense_layout.py), and document
the lane-packing arithmetic the later work built on.

Why this existed
----------------
TPU vector memory is tiled (sublane, lane) = (8, 128) over an array's two
minormost dimensions.  X3D's channel counts (24, 54, 108, 216, 432 ...) are
far from multiples of 128, so the natural NDHWC layout pads the lane (C)
dimension: C=24 stores at 18.75% density, C=54 at 42%.  Profiling the X3D-M
train step on v5e shows the consequence: the top ops (stage-2 pointwise and
depthwise convs at 112^2) run at HBM speed-of-light *for the padded layout*
— i.e. 2.4-5x more bytes move than the math needs.

The fix: carry activations as ``(B, T, H, W/g, g*C)`` where ``g`` is chosen
so ``g*C`` is (nearly) a multiple of 128.  Grouping ``g`` adjacent column
positions into the lane dimension makes every elementwise op, BN, residual
and reduction dense.  All conversions between the logical NDHWC view and the
fused view are contiguity-preserving reshapes (bitcasts — XLA materialises
nothing as long as consumers fuse).

Measured: the dominant pointwise conv (24->54 @ 16x16x112^2, bf16) drops
from 2.44 ms (XLA padded conv) to 0.52 ms as a fused-view einsum — 4.7x.

Op cookbook (all pure JAX -> autodiff works everywhere):
  * pointwise conv: free-split ``(.., W/g, g, C)`` + einsum over C.
  * depthwise TxKxK conv: pad T/H (major dims — layout-free), express W
    shifts as lane-dimension rolls of the per-row fused vector with edge
    masks, accumulate taps in f32.
  * BN / SE statistics: reduce on the free-split view (fuses into one pass).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def choose_group(width: int, channels: int, max_fused: int = 4096) -> int:
    """Largest divisor ``g`` of ``width`` maximising lane density of g*C.

    Density = (g*C) / (ceil(g*C / 128) * 128).  Ties prefer smaller g (more
    parallelism in the W/g dimension).
    """
    best_g, best_density = 1, -1.0
    for g in range(1, width + 1):
        if width % g:
            continue
        fused = g * channels
        if fused > max_fused:
            break
        density = fused / (math.ceil(fused / LANE) * LANE)
        if density > best_density + 1e-9:
            best_g, best_density = g, density
    return best_g


def to_dense(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T, H, W/g, g*C); contiguity-preserving."""
    b, t, h, w, c = x.shape
    return x.reshape(b, t, h, w // g, g * c)


def from_dense(x: jnp.ndarray, g: int, channels: int) -> jnp.ndarray:
    """(B, T, H, W/g, g*C) -> (B, T, H, W, C); contiguity-preserving."""
    b, t, h, wg, gc = x.shape
    return x.reshape(b, t, h, wg * g, channels)


def split_view(x: jnp.ndarray, g: int, channels: int) -> jnp.ndarray:
    """(B, T, H, W/g, g*C) -> (B, T, H, W/g, g, C) free view."""
    b, t, h, wg, gc = x.shape
    return x.reshape(b, t, h, wg, g, channels)


# ------------------------------------------------------------------ pointwise

def pw_conv_dense(x: jnp.ndarray, kernel: jnp.ndarray, g: int,
                  out_dtype=None) -> jnp.ndarray:
    """1x1x1 conv on the dense layout.

    Args:
      x: (B, T, H, W/g, g*Cin) fused activations.
      kernel: (Cin, Cout).
      g: group width of ``x``.
    Returns: (B, T, H, W/g, g*Cout) fused activations.
    """
    cin, cout = kernel.shape
    xs = split_view(x, g, cin)
    y = jnp.einsum("bthwgc,cd->bthwgd", xs, kernel.astype(x.dtype),
                   preferred_element_type=out_dtype or x.dtype)
    b, t, h, wg = y.shape[:4]
    return y.reshape(b, t, h, wg, g * cout)


# ------------------------------------------------------------------ depthwise

def dw_conv_dense(x: jnp.ndarray, kernel: jnp.ndarray, g: int,
                  channels: int, stride: int = 1):
    """Depthwise (k_t, k_h, k_w) conv, TF-SAME padding, on the dense layout.

    Formulation: zero-pad every fused H-row by ``(kw//2)*C`` lanes on each
    side, then each of the kt*kh*kw taps is a *static slice* of the padded
    array (T/H taps slice major dims, W taps slice the lane dim at
    ``dwi*C`` offsets) times a per-tap (W*C,)-tiled weight vector.  No
    rolls, no masks, no (W, C)-shaped intermediates — everything stays on
    dense fused rows and XLA fuses the whole accumulation into one pass.

    Stride 2 keeps stride-1 math and subsamples odd positions, reproducing
    TF SAME's (0,1) padding for k=3 on even extents (reference bottleneck
    `b` conv, model.py:259-267).

    Args:
      x: (B, T, H, W/g, g*C) fused activations.
      kernel: (k_t, k_h, k_w, 1, C) depthwise taps (flax layout).
    Returns: (out, g_out) — fused activations (spatial dims /stride) and
      their group width.
    """
    kt, kh, kw = kernel.shape[:3]
    b, t, h, wg, gc = x.shape
    c = channels
    w = wg * g
    pt, ph, pw = kt // 2, kh // 2, kw // 2

    # flatten groups into per-row lane vectors, pad T/H (major dims) and the
    # row itself by pw*C lanes (zero padding doubles as the W boundary)
    xf = x.reshape(b, t, h, w * c)
    xf = jnp.pad(xf, ((0, 0), (pt, pt), (ph, ph), (pw * c, pw * c)))

    # per-tap weight vectors tiled across W: (kt, kh, kw, W*C)
    wk = jnp.tile(kernel[:, :, :, 0, :].astype(jnp.float32), (1, 1, 1, w))

    acc = None
    for dt in range(kt):
        for dh in range(kh):
            for dwi in range(kw):
                sl = jax.lax.slice(
                    xf,
                    (0, dt, dh, dwi * c),
                    (b, dt + t, dh + h, dwi * c + w * c),
                )
                term = sl.astype(jnp.float32) * wk[dt, dh, dwi]
                acc = term if acc is None else acc + term

    out = acc.astype(x.dtype).reshape(b, t, h, w, c)
    if stride == 2:
        # TF SAME stride-2 (k=3, even extent) pads (0,1): the stride-1
        # result at odd positions covers input [2w', 2w'+2] — exactly it
        out = out[:, :, 1::2, 1::2, :]
    b2, t2, h2, w2, _ = out.shape
    g2 = g if w2 % g == 0 else choose_group(w2, c)
    return out.reshape(b2, t2, h2, w2 // g2, g2 * c), g2


# -------------------------------------------------------------- reductions

def channel_sum_dense(x: jnp.ndarray, g: int, channels: int,
                      also_sq: bool = False):
    """Per-channel sums over (B, T, H, W) from the dense layout (for BN/SE)."""
    xs = split_view(x, g, channels).astype(jnp.float32)
    s = jnp.sum(xs, axis=(0, 1, 2, 3, 4))
    if not also_sq:
        return s
    return s, jnp.sum(jnp.square(xs), axis=(0, 1, 2, 3, 4))


def channel_mean_dense(x: jnp.ndarray, g: int, channels: int) -> jnp.ndarray:
    """Per-channel mean over (T, H, W) keeping batch: (B, C) (for SE/head)."""
    xs = split_view(x, g, channels).astype(jnp.float32)
    return jnp.mean(xs, axis=(1, 2, 3, 4))


def scale_bias_dense(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     g: int) -> jnp.ndarray:
    """y = x * scale_c + bias_c with per-channel params on the fused layout.

    ``jnp.tile`` to (g*C,) keeps the op a pure lane-aligned elementwise
    multiply-add that fuses with neighbours.
    """
    s = jnp.tile(scale, g).astype(x.dtype)
    b = jnp.tile(bias, g).astype(x.dtype)
    return x * s + b


def mul_channels_dense(x: jnp.ndarray, per_bc: jnp.ndarray, g: int,
                       channels: int) -> jnp.ndarray:
    """x * gate[b, c] (SE excitation) on the dense layout."""
    b = x.shape[0]
    gate = jnp.tile(per_bc.astype(x.dtype), (1, g))      # (B, g*C)
    return x * gate[:, None, None, None, :]
