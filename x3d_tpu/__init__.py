"""x3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-recognition framework.

Re-implements the full capability surface of the TensorFlow reference
fcogidi/X3D-tf (see SURVEY.md at the repo root): the X3D model family,
Kinetics-400 input pipeline, warmup+cosine training with bf16, multi-view
ensemble evaluation, offline dataset tooling, and checkpoint/resume — all
re-designed TPU-first rather than ported.
"""

__version__ = "0.1.0"

from x3d_tpu.config import CfgNode, get_default_config  # noqa: F401

VARIANTS = ("XS", "S", "M", "L", "XL")


def variant_config(name: str):
    """Load the bundled config for an X3D variant ('XS'..'XL')."""
    import os

    name = name.upper().replace("X3D_", "").replace("X3D-", "")
    if name not in VARIANTS:
        raise ValueError(f"Unknown variant {name!r}; expected one of {VARIANTS}")
    cfg = get_default_config()
    path = os.path.join(
        os.path.dirname(__file__), "configs", "kinetics", f"X3D_{name}.yaml"
    )
    cfg.merge_from_file(path)
    return cfg
