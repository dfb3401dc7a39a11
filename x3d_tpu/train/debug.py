"""Debug-mode tensor health dump — the reference's FULL_HEALTH analog.

The reference's debug mode enables
``tf.debugging.experimental.enable_dump_debug_info(..., 'FULL_HEALTH')``
(``train.py:62-67``): every tensor's NaN/Inf/min/max is recorded for
TensorBoard's debugger.  The jit-native equivalent here: one forward pass
with flax ``capture_intermediates``, reducing every module output to a
small health record ON DEVICE (finite fraction, min, max, mean, absmax —
scalars only cross to the host), written as JSON next to the checkpoints.

Used by the train CLI under ``--debug`` (alongside ``jax_debug_nans`` and
the fixed seed); also usable standalone::

    from x3d_tpu.train.debug import dump_tensor_health
    report = dump_tensor_health(model, state, batch["video"], out_path)
"""

from __future__ import annotations

import json
import logging
from typing import Dict, Optional

log = logging.getLogger(__name__)


def tensor_health(model, params, batch_stats, video) -> Dict[str, Dict]:
    """Per-module output health of one forward pass (device-reduced)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def fwd(params, stats, video):
        _, tree = model.apply(
            {"params": params, "batch_stats": stats}, video, train=False,
            capture_intermediates=True, mutable=["intermediates"])

        def health(t):
            t32 = t.astype(jnp.float32)
            return {
                "finite_frac": jnp.mean(jnp.isfinite(t32).astype(jnp.float32)),
                "min": jnp.min(t32),
                "max": jnp.max(t32),
                "mean": jnp.mean(t32),
                "absmax": jnp.max(jnp.abs(t32)),
            }

        return jax.tree_util.tree_map(health, tree["intermediates"])

    stats = fwd(params, batch_stats, video)
    flat = {}

    def walk(node, path):
        if isinstance(node, dict) and "finite_frac" in node:
            flat["/".join(path)] = {
                k: float(np.asarray(v)) for k, v in node.items()}
            return
        if isinstance(node, (dict,)):
            for k, v in node.items():
                walk(v, path + [str(k)])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])

    walk(jax.tree_util.tree_map(lambda x: x, stats), [])
    return flat


def dump_tensor_health(model, state, video, out_path: Optional[str] = None
                       ) -> Dict[str, Dict]:
    """Run :func:`tensor_health`, log non-finite modules, optionally write
    the JSON report; returns the report dict."""
    report = tensor_health(model, state.params, state.batch_stats, video)
    bad = {k: v for k, v in report.items() if v["finite_frac"] < 1.0}
    for k, v in bad.items():
        log.error("NON-FINITE values in %s: finite_frac=%.6f", k,
                  v["finite_frac"])
    if not bad:
        log.info("tensor health: all %d module outputs finite", len(report))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        log.info("tensor health report written to %s", out_path)
    return report
