"""Model zoo: the X3D family (XS/S/M/L/XL) as pure-functional Flax modules."""

from x3d_tpu.models.x3d import (  # noqa: F401
    BlockSpec,
    X3D,
    X3DArch,
    build_arch,
    create_model,
    init_variables,
)
