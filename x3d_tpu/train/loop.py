"""The training / evaluation loops.

Replaces Keras ``model.fit`` / ``model.evaluate`` (reference
``train.py:145-152``, ``eval.py:83-89``) with an explicit loop over jitted
steps: epochs of ``steps_per_epoch = DATASET_SIZE // BATCH_SIZE`` steps,
per-epoch validation, hook dispatch, and honest metric aggregation (exact
sums, not batch-mean-of-means).

Device-efficiency notes: metrics cross device->host once per step as tiny
scalars (fetched a step late would be even cheaper; kept simple here); the
input iterator runs ahead via tf.data prefetch; on this container's remote
TPU runtime the host fetch is also the only real synchronisation point.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Iterable, Iterator, Optional, Sequence

import numpy as np

from x3d_tpu.train.schedule import lr_for_epoch
from x3d_tpu.train.hooks import Hook

log = logging.getLogger(__name__)


def _to_host(metrics) -> Dict[str, float]:
    return {k: float(np.asarray(v)) for k, v in metrics.items()}


def evaluate(eval_step: Callable, state, batches: Iterable[dict],
             profile_batch: int = 0,
             profile_dir: Optional[str] = None) -> Dict[str, float]:
    """Aggregate eval sums over a dataset -> {'loss','acc','top_5_acc'}.

    The per-batch metric sums stay ON DEVICE and are accumulated there by a
    tiny jitted tree-add; the host fetches exactly once, after the last
    batch.  (A per-batch fetch would synchronise the async dispatch pipeline
    every step — on a remote TPU runtime that serialises the whole
    evaluation behind 2-40 ms round trips.)

    ``profile_batch``/``profile_dir``: capture a jax.profiler device trace
    around batch N (1-based) — the analog of the reference's eval-time
    ``TensorBoard(profile_batch=2)`` callback (``eval.py:87-89``).  The
    profiled batch is host-synced so its device work lands inside the trace.
    """
    import jax
    import jax.numpy as jnp

    add = jax.jit(lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))
    totals = None
    for i, batch in enumerate(batches, start=1):
        profiling = profile_dir and profile_batch and i == profile_batch
        if profiling:
            jax.profiler.start_trace(profile_dir)
        out = eval_step(state, batch)
        if profiling:
            _to_host(out)  # sync: the batch's device work ends in the trace
            jax.profiler.stop_trace()
            log.info("eval profile trace of batch %d written to %s",
                     i, profile_dir)
        totals = out if totals is None else add(totals, out)
    host = _to_host(totals) if totals is not None else {}
    n = max(host.get("count", 0.0), 1.0)
    return {
        "loss": host.get("loss_sum", 0.0) / n,
        "acc": host.get("acc_sum", 0.0) / n,
        "top_5_acc": host.get("top_5_sum", 0.0) / n,
        "count": n,
    }


def fit(
    cfg,
    state,
    train_step: Callable,
    train_batches: Iterator[dict],
    steps_per_epoch: int,
    epochs: int,
    rng,
    initial_epoch: int = 0,
    eval_step: Optional[Callable] = None,
    val_batches_fn: Optional[Callable[[], Iterable[dict]]] = None,
    hooks: Sequence[Hook] = (),
    metrics_every: int = 1,
    initial_step_in_epoch: int = 0,
):
    """Run the training loop; returns the final state.

    ``val_batches_fn`` is called at each epoch end to produce a fresh
    validation iterator (mirrors Keras re-iterating validation_data).

    ``initial_step_in_epoch``: resume offset within ``initial_epoch`` (used
    by step-cadence checkpoint resume; the remaining epochs start at 0).

    ``metrics_every``: device->host metric materialisation cadence.  A host
    fetch synchronises the async dispatch pipeline (and on remote TPU
    runtimes costs a round trip), so production runs should fetch only at
    the logging cadence; steps in between leave metrics on device and keep
    host input preparation overlapped with device compute.
    """
    for epoch in range(initial_epoch, epochs):
        lr = float(np.asarray(lr_for_epoch(cfg, epoch)))
        for h in hooks:
            h.on_epoch_start(epoch, lr)

        last_metrics: Dict[str, float] = {}
        start_i = initial_step_in_epoch if epoch == initial_epoch else 0
        for i in range(start_i, steps_per_epoch):
            batch = next(train_batches)
            state, metrics = train_step(state, batch, rng)
            step = epoch * steps_per_epoch + i + 1
            if step % metrics_every == 0 or i == steps_per_epoch - 1:
                host_metrics = _to_host(metrics)
                last_metrics = host_metrics
                for h in hooks:
                    h.on_step(step, host_metrics)
            for h in hooks:
                # every step, with the live device-side state (checkpoint
                # cadence is independent of the metric-fetch cadence)
                h.on_step_end(step, state)

        val_metrics = None
        if eval_step is not None and val_batches_fn is not None:
            val_metrics = evaluate(eval_step, state, val_batches_fn())

        for h in hooks:
            # epochs are reported 1-based, matching the reference's ckpt-N
            h.on_epoch_end(epoch + 1, state, last_metrics, val_metrics)

    for h in hooks:
        h.on_train_end()
    return state
