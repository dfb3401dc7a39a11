"""Probe the VPU's elementwise issue rate per dtype (Pallas/Mosaic).

Decides the one open depthwise-backward avenue from docs/PERF.md: XLA's
dw emitter runs bf16-packed at ~75% of the *f32* vector-issue ceiling; a
custom kernel can only beat it if Mosaic issues bf16 arithmetic at 2
elements/lane-cycle (packed (16,128) tiles).  This kernel measures exactly
that: a chain of UNROLL dependent multiply-adds on a VMEM-resident block,
no HBM traffic inside the timed region beyond one read + one write.

    python -m x3d_tpu.tools.vpu_probe [--unroll=8] [--mb=2]

Prints one JSON line with achieved multiply-add element-ops/ms per dtype
and the bf16/f32 ratio: ~2.0 means packed bf16 ALU ops are real (the
avenue is open); ~1.0 means Mosaic computes bf16 at f32 rate (the avenue
is closed — a bf16 kernel cannot out-issue XLA's emitter).
"""

from __future__ import annotations

import functools
import json


def probe(dtype, n_bytes: int, unroll: int, iters: int = 32,
          inner: int = 64) -> float:
    """Achieved multiply-add ops per millisecond for one dtype."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from x3d_tpu.ops.timing import time_fn

    itemsize = jnp.dtype(dtype).itemsize
    rows = n_bytes // (128 * itemsize)
    x = jnp.full((rows, 128), 0.5, dtype)
    a = jnp.full((rows, 128), 0.999755859375, dtype)  # exactly representable
    b = jnp.full((rows, 128), 1.52587890625e-05, dtype)

    def kern(x_ref, a_ref, b_ref, o_ref):
        av = a_ref[:]
        bv = b_ref[:]

        # an in-kernel fori_loop keeps the Mosaic IR small (a fully
        # unrolled 512-op chain blew the remote compiler's budget); the
        # small unrolled body amortises the loop scalar work over
        # rows*128*unroll vector lanes
        def body(_, v):
            for _ in range(unroll):
                v = v * av + bv   # one dependent multiply-add per element
            return v

        o_ref[:] = jax.lax.fori_loop(0, inner, body, x_ref[:])

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @functools.partial(jax.jit)
    def run(x, a, b):
        return call(x, a, b)

    # the axon tunnel's per-program cost (dispatch + the scalar sync
    # fetch) is a roughly constant ~0.4 s with ±25 ms variability; the
    # slope between iters and 2*iters programs (time_fn) cancels it, and
    # per-program work is sized to O(seconds) so the slope dwarfs the noise
    sec = time_fn(lambda v: run(v, a, b), x, iters=iters)
    return x.size * unroll * inner / (sec * 1e3)  # element-ops / ms


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_integer("unroll", 8, "Dependent FMAs per fori_loop body.")
    # 4 operands must fit VMEM (~16 MiB): keep the default small
    flags.DEFINE_integer("mb", 2, "Working-set MiB per operand.")
    flags.DEFINE_integer("inner", 64, "fori_loop trips inside the kernel.")
    # per-program work at unroll*inner=512 madds/element on 2 MiB is
    # ~190 ms of VPU time x 32 chained calls ≈ 6 s — far above the
    # tunnel's ±25 ms dispatch noise, far below its timeouts
    flags.DEFINE_integer("iters", 32, "In-program loop count (slope "
                         "uses iters and 2*iters).")
    FLAGS = flags.FLAGS

    def run(_):
        import jax.numpy as jnp

        n = FLAGS.mb * 1024 * 1024
        f32 = probe(jnp.float32, n, FLAGS.unroll, FLAGS.iters, FLAGS.inner)
        bf16 = probe(jnp.bfloat16, n, FLAGS.unroll, FLAGS.iters, FLAGS.inner)
        print(json.dumps({
            "f32_madd_ops_per_ms": round(f32 / 1e6, 3),
            "bf16_madd_ops_per_ms": round(bf16 / 1e6, 3),
            "unit": "G element-madds/ms",
            "bf16_over_f32": round(bf16 / f32, 3),
            "verdict": ("bf16 packs 2x: dw-backward bf16 avenue OPEN"
                        if bf16 / f32 > 1.6 else
                        "bf16 issues at ~f32 rate: bf16-packed avenue "
                        "CLOSED (cannot out-issue the XLA emitter)"),
        }))

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
