"""Tunnel-safe micro-benchmark helper.

On this container the TPU is reached through a remote runtime where
(a) ``jax.block_until_ready`` returns at enqueue time, (b) device->host
transfers run at ~25 MB/s, and (c) per-program dispatch latency is a noisy
2-40 ms.  Honest op timing therefore:

  * runs K iterations of the op inside ONE program (``lax.fori_loop``), each
    iteration chained to the previous through ``lax.optimization_barrier``
    so the loop cannot be collapsed or pipelined away;
  * syncs with a device->host fetch of a device-computed *scalar*;
  * measures at two different K and reports the slope — per-program dispatch
    overhead cancels exactly.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _sync_scalar(x) -> float:
    return float(np.asarray(jax.jit(lambda v: v.reshape(-1)[:1].sum())(x)))


def time_fn(fn: Callable, *args, iters: int = 8, outer: int = 3) -> float:
    """Seconds per ``fn(*args)`` execution, dispatch overhead removed."""

    def many(k):
        @jax.jit
        def prog(x, *rest):
            def body(_, carry):
                out = fn(carry, *rest)
                leaf = jax.tree_util.tree_leaves(out)[0]
                # data-dependent, numerically negligible perturbation: the
                # compiler can neither fold it (depends on `out`'s values)
                # nor hoist fn out of the loop (carry changes each iteration)
                s = leaf.reshape(-1)[0].astype(jnp.float32)
                return carry + (s * 1e-30).astype(carry.dtype)
            return jax.lax.fori_loop(0, k, body, x)
        return prog

    prog1 = many(iters)
    prog2 = many(2 * iters)

    def run(prog):
        out = prog(*args)
        _sync_scalar(out)
        best = float("inf")
        for _ in range(outer):
            t0 = time.perf_counter()
            out = prog(*args)
            _sync_scalar(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(prog1)
    t2 = run(prog2)
    return max((t2 - t1) / iters, 1e-9)
