"""Pointwise (1x1x1) conv with a benchmark-informed lowering choice.

On v5e, XLA lowers small-channel 1x1x1 convs to a padded VPU loop instead
of the MXU.  Measured at X3D-M stage-2 shapes (16x16x112^2, bf16):

    24->54:  conv 2.76 ms   einsum 0.60 ms   (einsum 4.6x)
    54->24:  conv 0.81 ms   einsum 1.51 ms   (conv   1.9x)

HOWEVER: those single-op wins do not compose — in the full X3D-M train
step the einsum/auto variants measure *slower* than the conv lowering
(262/260 ms vs 238 ms per step), because XLA's layout assignment and
epilogue fusion around dot_general differ from the conv path.  The default
therefore stays "conv"; the dispatch hook remains for experiments and for
shapes where it does win end-to-end.

Parameter layout stays ``(1, 1, 1, Cin, Cout)`` — identical to
``flax.linen.Conv`` — so checkpoints are interchangeable.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "conv"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("auto", "einsum", "conv", "mxu", "mxu_exp", "mxu_seg"):
        raise ValueError(impl)
    _DEFAULT_IMPL = impl


def stats_capable(x_shape, cin: int, cout: int,
                  impl: Optional[str] = None) -> bool:
    """Whether ``pointwise_conv3d(..., return_stats=True)`` would use the
    MXU+stats Pallas kernel for this call (mirrors the dispatch below).
    The aligned bottleneck path asks this BEFORE building its stat reduces
    so the default path's tuned fusion structure is untouched when the
    kernel does not engage."""
    from x3d_tpu.ops import pw_batchminor

    impl = impl or _DEFAULT_IMPL
    if impl == "mxu_exp" and cout <= cin:
        return False
    # "mxu_seg": the MXU+stats kernels for the bottleneck segment convs
    # ONLY (both "a" and "c"); every other 1x1x1 stays on the XLA path
    # (unlike "mxu", which also grabs e.g. residual projections without
    # their BN stat sums — the round-2 loss mode)
    if impl not in ("mxu", "mxu_exp", "mxu_seg"):
        return False
    spatial = 1
    for d in x_shape[1:-1]:
        spatial *= d
    # Exclude the shallow 56^2-plane stage: its custom-call outputs are the
    # largest buffers in the step and XLA cannot rematerialise them across
    # the backward (measured: all-stage mxu_seg OOMs X3D-M B=128 by 313 MB),
    # while its tiny contraction (cin 24) underfills the MXU anyway.
    if len(x_shape) == 5 and not pw_batchminor.INTERPRET:
        hw = x_shape[2] * x_shape[3]
        if hw > 3000:
            return False
    return (len(x_shape) == 5 and spatial > 1
            and cin % 8 == 0 and cout % 8 == 0
            and (x_shape[0] % 128 == 0 or pw_batchminor.INTERPRET))


def pointwise_conv3d(x: jnp.ndarray, kernel: jnp.ndarray,
                     impl: Optional[str] = None,
                     return_stats: bool = False):
    """x: (..., Cin), kernel: (1,1,1,Cin,Cout) or (Cin, Cout)."""
    k2 = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    cin, cout = k2.shape
    impl = impl or _DEFAULT_IMPL
    if return_stats:
        # caller must have checked stats_capable (the aligned path does)
        from x3d_tpu.ops import pw_batchminor

        assert stats_capable(x.shape, cin, cout, impl)
        return pw_batchminor.pw_conv_bm_stats(x, k2.astype(x.dtype))
    if impl == "mxu_exp":
        # MXU only for channel-EXPANDING convs (the bottleneck "a" convs):
        # their pallas custom_vjp residual is the block input, which the
        # residual add keeps live anyway - so the MXU win comes at zero
        # extra HBM (the contracting "c" convs would pin their wide swish
        # inputs that XLA otherwise rematerialises).
        impl = "mxu" if cout > cin else "conv"
    if impl == "mxu":
        # batch-minor Pallas MXU kernel (ops/pw_batchminor.py): only for
        # rank-5 bulk activations with whole-128-lane batches; SE / head
        # 1x1x1 convs (spatial 1) and odd batches use the XLA path
        from x3d_tpu.ops import pw_batchminor

        spatial = 1
        for d in x.shape[1:-1]:
            spatial *= d
        if (x.ndim == 5 and spatial > 1
                and (x.shape[0] % 128 == 0 or pw_batchminor.INTERPRET)):
            return pw_batchminor.pw_conv_bm(x, k2.astype(x.dtype))
        impl = "conv"
    if impl == "auto":
        impl = "einsum" if cout >= cin else "conv"
    if impl == "einsum":
        return jnp.einsum("...c,cd->...d", x, k2.astype(x.dtype),
                          preferred_element_type=x.dtype)
    return jax.lax.conv_general_dilated(
        x, k2.reshape(1, 1, 1, cin, cout).astype(x.dtype),
        (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class PointwiseConv3D(nn.Module):
    """Drop-in for ``nn.Conv(features, kernel_size=(1,1,1))`` on NDHWC."""

    features: int
    use_bias: bool = False
    strides: tuple = (1, 1, 1)
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.glorot_uniform()
    bias_init: Any = nn.initializers.zeros_init()
    impl: Optional[str] = None
    # Channel-tile padding for the fused depthwise path (models/x3d.py):
    # out_pad appends zero output channels (the conv writes a sublane-
    # aligned buffer directly — no pad pass); in_pad appends zero input-
    # channel rows (consume an out_pad'ed producer).  Parameters keep their
    # un-padded shapes; autodiff flows through the weight pad exactly.
    out_pad: int = 0
    in_pad: int = 0

    @nn.compact
    def __call__(self, x, return_stats: bool = False, act_coefs=None):
        cin = x.shape[-1] - self.in_pad
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, 1, cin, self.features), self.param_dtype)
        if self.in_pad or self.out_pad:
            kernel = jnp.pad(
                kernel, ((0, 0),) * 3 + ((0, self.in_pad), (0, self.out_pad)))
            # hide the zero pad rows/cols from the algebraic simplifier:
            # letting XLA prove the padded channels dead makes it slice the
            # upstream conv's cotangent, which then trips an invalid
            # batch-group weight-grad conv for the depthwise op
            kernel = jax.lax.optimization_barrier(kernel)
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if self.strides != (1, 1, 1):
            _, sh, sw = self.strides
            x = x[:, :, ::sh, ::sw, :]   # 1x1x1 kernel: stride == subsample
        if act_coefs is not None:
            # MXU swish(x*a+b) @ W + in-kernel BN stat sums — the aligned
            # bottleneck's contracting ("c") conv with the bn_b affine /
            # SE gate / swish subsumed (caller gated on stats_capable)
            assert not self.use_bias and self.strides == (1, 1, 1)
            from x3d_tpu.ops import pw_batchminor

            a_cb, b_cb = act_coefs
            return pw_batchminor.pw_act_conv_bm_stats(
                x, a_cb, b_cb,
                kernel.reshape(kernel.shape[-2], kernel.shape[-1])
                .astype(dtype))
        if return_stats:
            # MXU conv + in-kernel BN stat sums (aligned bottleneck path);
            # the caller gated on stats_capable
            assert not self.use_bias
            return pointwise_conv3d(x, kernel.astype(dtype), self.impl,
                                    return_stats=True)
        y = pointwise_conv3d(x, kernel.astype(dtype), self.impl)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            if self.out_pad:
                bias = jnp.pad(bias, (0, self.out_pad))
            y = y + bias.astype(dtype)
        return y
