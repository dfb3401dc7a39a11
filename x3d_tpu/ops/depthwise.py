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

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# "xla" default: the shift formulation wins on pure forward but its autodiff
# transpose materialises one padded full-size tensor per tap (27x activation
# memory — observed 24.7 GB for an X3D-M train step); the grouped-conv
# lowering has a sane backward.  A custom-VJP shift path / Pallas kernel is
# the planned fast path.
_DEFAULT_IMPL = "xla"
_VALID_IMPLS = ("shift", "xla", "pallas")


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
        return depthwise_conv3d(
            x.astype(dtype), kernel.astype(dtype), self.strides, self.padding
        )
