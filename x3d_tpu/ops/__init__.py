"""TPU compute ops: depthwise spatiotemporal convolutions and fused kernels."""

from x3d_tpu.ops.depthwise import (  # noqa: F401
    DepthwiseConv3D,
    depthwise_conv3d,
    same_pads,
    set_default_impl,
)
