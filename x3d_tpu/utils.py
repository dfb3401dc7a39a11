"""Width/depth expansion math and pixel (de)normalization.

Behavioural parity targets:
  * ``round_width`` / ``round_repeats``  — reference ``utils.py:7-40`` (the
    EfficientNet-style channel rounding that produces the published X3D
    channel plans; param-count parity depends on reproducing it exactly).
  * ``normalize`` / ``denormalize``      — reference ``utils.py:42-108``
    (÷255, per-channel mean/std), here as pure jnp functions that fuse into
    the surrounding jit program instead of a host-side ``tf.vectorized_map``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    On this host XLA compiles travel a remote-compile tunnel (~10-60 s per
    program, and minutes when the tunnel degrades — BENCH_r05: the X3D-M
    stage took 841 s of which ~12 min was compiles).  The on-disk cache
    fully absorbs that across *processes*: a 512^2 probe went 11.9 s ->
    0.32 s on the second run.  Call before the first jit; safe to call
    again (last cache_dir wins).

    ``cache_dir`` defaults to ``$X3D_COMPILATION_CACHE_DIR`` or
    ``<repo>/.cache/xla`` (gitignored).  Returns the directory used.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("X3D_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: even "cheap" compiles pay the tunnel round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def without_compilation_cache():
    """Context manager: bypass the persistent compilation cache.

    Measured (round 5, v5e-1 via the axon tunnel): lane-starved folded
    serving probes read ~1.8x slower in any process where compiles HIT a
    warm persistent cache — XS 1-video 0.97-1.23 ms vs 2.1-2.2 ms, L 11.4
    vs 18.3-18.7, XL ~14.6 vs 25.8 — even when the probe's own compiles
    bypass the cache (the hit elsewhere in the process is enough); with a
    FRESH cache dir (writes only) or no cache the fast regime returns.
    ``jax_persistent_cache_enable_xla_caches="none"`` does not change it.
    Full-lane programs are unaffected in either regime (M train step
    449.7 ms, M/S probes identical).  Which regime matches a production
    (non-tunnel) host is unknowable from this container — docs/PERF.md
    round 5 records the full matrix.  Latency-critical serving compiles
    run inside this context regardless: they must not depend on ambient
    cache state.
    """
    import contextlib

    import jax

    @contextlib.contextmanager
    def ctx():
        prev = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            yield
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    return ctx()


def tpu_compiler_options():
    """Per-jit XLA options that measurably help this model on TPU.

    ``xla_tpu_scoped_vmem_limit_kib=65536``: raising the scoped-VMEM budget
    lets the conv fusions use bigger windows (+6% on the X3D-M train step,
    measured on v5e).  Returns None off-TPU.  Pass as
    ``jax.jit(fn, compiler_options=tpu_compiler_options())``.
    """
    import jax

    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def round_width(width: int, multiplier: float, min_width: int = 8,
                divisor: int = 8) -> int:
    """Scale a channel count and round to a multiple of ``divisor``.

    The result never drops below ``min_width`` nor below 90% of the scaled
    width (in which case one extra ``divisor`` is added).  This is the rule
    that turns the base plan (24, 48, 96, 192) into the published X3D channel
    plans (reference ``utils.py:7-30``).
    """
    if not multiplier:
        return width
    scaled = width * multiplier
    min_width = min_width or divisor
    rounded = max(min_width, int(scaled + divisor / 2) // divisor * divisor)
    if rounded < 0.9 * scaled:
        rounded += divisor
    return int(rounded)


def round_repeats(repeats: int, multiplier: float) -> int:
    """Scale a stage depth, rounding up (reference ``utils.py:32-40``)."""
    if not multiplier:
        return repeats
    return int(math.ceil(multiplier * repeats))


def normalize(clips: jnp.ndarray, mean: Sequence[float], std: Sequence[float],
              norm_value: float = 255.0) -> jnp.ndarray:
    """uint8-range pixels -> standardized floats, channelwise (last axis).

    Pure elementwise math: under jit XLA fuses it into whatever consumes the
    clip, so unlike the reference's host-side pass (``utils.py:42-72``) it is
    free on TPU when run on device.
    """
    mean = jnp.asarray(mean, dtype=clips.dtype if clips.dtype.kind == "f" else jnp.float32)
    std = jnp.asarray(std, dtype=mean.dtype)
    x = clips.astype(mean.dtype) / norm_value
    return (x - mean) / std


def denormalize(clips: jnp.ndarray, mean: Sequence[float],
                std: Sequence[float], norm_value: float = 255.0,
                out_dtype=jnp.uint8) -> jnp.ndarray:
    """Inverse of :func:`normalize`, for visualisation tooling
    (reference ``utils.py:74-108``)."""
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    x = clips.astype(jnp.float32) * std + mean
    x = jnp.clip(x * norm_value, 0, norm_value)
    return x.astype(out_dtype)
