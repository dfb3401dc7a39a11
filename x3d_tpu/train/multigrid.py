"""Long-cycle multigrid training (Wu et al., CVPR 2020) — TPU-native.

The reference lists multigrid training on its roadmap but never built it
(``/root/reference/README.md:125``).  The method trains most epochs on
*coarse* clip shapes (fewer frames, smaller crops) at proportionally larger
batch sizes — keeping the cost ``B*T*S^2`` of a mini-batch roughly constant
— and anneals to the base shape for a trailing fine-tuning segment, cutting
wall-clock time to a given accuracy ~3-4x in the paper.

Why this is a natural TPU/XLA fit (and how it differs from a GPU port):

* The long cycle is a SMALL STATIC SET of shapes (4 by default).  ``jax.jit``
  specialises the one train step per input shape, so the entire schedule
  costs four XLA compilations up front and zero dynamic-shape machinery.
* The batch multipliers are exact powers of two (8/4/2/1 for the default
  factors), so every phase's batch is a multiple of the base batch — at the
  production base batch of 128 every phase keeps full 128-lane batch-minor
  tiles (docs/PERF.md), and the coarse phases *raise* arithmetic intensity
  per dispatch instead of fragmenting it.
* The learning rate follows the linear-scaling rule per phase
  (``lr * batch_multiplier``).  Because steps-per-epoch varies by phase, the
  schedule is expressed as a step->lr lookup over precomputed epoch
  boundaries (still a pure function of the optimizer step, so it lives
  inside optax and survives checkpoint/resume unchanged).

Only the long cycle is implemented: the paper's short cycle changes shape
every iteration, which multiplies the compile set and forces per-step host
re-batching for a reported marginal gain (3.4x long-only vs 4.5x with short
cycles on Kinetics); it can be layered on later since shapes stay static.

BN: running statistics are accumulated across shapes (the paper finds this
benign when training ends on the base shape); ``recalibrate_bn`` provides
the paper's precise-BN analog — re-estimating statistics over N base-shape
batches before validation (``MULTIGRID.BN_RECALC_BATCHES``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, Iterator, Optional, Sequence

import numpy as np

from x3d_tpu.train.hooks import Hook
from x3d_tpu.train.loop import _to_host, evaluate
from x3d_tpu.train.schedule import lr_for_epoch

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class Phase:
    """One long-cycle shape: the clip geometry and batch for some epochs."""
    index: int                 # index into LONG_CYCLE_FACTORS
    temp_duration: int         # frames per clip (T)
    crop_size: int             # spatial crop (S)
    jitter_scales: tuple       # scaled TRAIN_JITTER_SCALES
    batch_size: int            # global batch for this phase
    lr_scale: float            # linear-scaling-rule LR multiplier
    steps_per_epoch: int       # one data pass at this phase's batch

    def apply_to_config(self, cfg):
        """Return a clone of ``cfg`` carrying this phase's geometry (for
        building per-phase input pipelines / synthetic batches)."""
        phase_cfg = cfg.clone()
        phase_cfg.DATA.TEMP_DURATION = self.temp_duration
        phase_cfg.DATA.TRAIN_CROP_SIZE = self.crop_size
        phase_cfg.DATA.TRAIN_JITTER_SCALES = list(self.jitter_scales)
        phase_cfg.TRAIN.BATCH_SIZE = self.batch_size
        return phase_cfg


def _round_to(value: float, divisor: int) -> int:
    return max(divisor, int(round(value / divisor)) * divisor)


class MultigridSchedule:
    """Deterministic epoch->phase assignment + the step->lr schedule.

    Pure function of (cfg, base_steps_per_epoch, epochs): safe to rebuild
    identically on checkpoint resume.  Every epoch sees ~one dataset pass
    (``phase.batch_size * phase.steps_per_epoch ~= base_batch * base_steps``)
    so the reference's per-epoch cosine LR (schedule.py) applies unchanged,
    scaled by the phase's batch multiplier.
    """

    def __init__(self, cfg, base_steps_per_epoch: int, epochs: int):
        mg = cfg.MULTIGRID
        factors = [tuple(f) for f in mg.LONG_CYCLE_FACTORS]
        if not factors or tuple(factors[-1]) != (1.0, 1.0):
            raise ValueError(
                "MULTIGRID.LONG_CYCLE_FACTORS must end with the base shape "
                f"[1.0, 1.0]; got {factors}")
        base_T = cfg.DATA.TEMP_DURATION
        base_S = cfg.DATA.TRAIN_CROP_SIZE
        base_B = cfg.TRAIN.BATCH_SIZE
        divisor = mg.SPATIAL_DIVISOR

        self.phases = []
        for i, (tf, sf) in enumerate(factors):
            bmult = max(1, int(round(1.0 / (tf * sf * sf))))
            T = max(1, int(round(base_T * tf)))
            S = _round_to(base_S * sf, divisor)
            # Jitter scales shrink with the crop (the paper scales the whole
            # augmentation geometry by the spatial factor); ``max(S, ...)``
            # is only a floor — the short-side resize target must be >= the
            # crop or the crop is impossible.  With the reference's YAMLs
            # (jitter min > crop size) the floor never binds, so the range
            # stays non-degenerate (tests/test_multigrid.py pins this); if a
            # custom config does bind on both ends, the phase degrades to a
            # deterministic resize — warn, don't fail.
            jitter = tuple(max(S, int(round(j * sf)))
                           for j in cfg.DATA.TRAIN_JITTER_SCALES)
            if len(set(jitter)) == 1 and len(jitter) > 1:
                log.warning(
                    "multigrid phase %d: jitter range collapsed to %s "
                    "(crop %d floor); scale augmentation is disabled for "
                    "this phase", i, jitter, S)
            self.phases.append(Phase(
                index=i,
                temp_duration=T,
                crop_size=S,
                jitter_scales=jitter,
                batch_size=base_B * bmult,
                lr_scale=float(bmult),
                steps_per_epoch=max(1, base_steps_per_epoch // bmult),
            ))

        # Epoch assignment: cycle coarse->fine in EPOCH_BLOCK-epoch blocks,
        # with the trailing FINETUNE_FRACTION of epochs pinned to the base
        # shape (at least the final epoch).  The cycled segment is aligned
        # BACKWARDS from the fine-tune boundary so its last block is always
        # the base phase — the paper's progressive annealing into
        # fine-tuning; a leading remainder (when the segment isn't a whole
        # number of cycles) extends the coarsest phase instead of truncating
        # the final cycle mid-way.
        n_fine = max(1, int(round(epochs * mg.FINETUNE_FRACTION)))
        n_fine = min(n_fine, epochs)
        block = max(1, mg.EPOCH_BLOCK)
        n_phases = len(self.phases)
        n_cycled = epochs - n_fine
        remainder = n_cycled % (block * n_phases)
        self.epoch_phase = []
        for epoch in range(epochs):
            if epoch >= n_cycled:
                self.epoch_phase.append(n_phases - 1)
            elif remainder == n_cycled:
                # the segment is shorter than one full cycle: walk the tail
                # of a single cycle backwards from the boundary (clamped to
                # the coarsest), so it still ends on the base phase
                k = (n_cycled - 1 - epoch) // block
                self.epoch_phase.append(max(0, n_phases - 1 - k))
            elif epoch < remainder:
                self.epoch_phase.append(0)
            else:
                self.epoch_phase.append(
                    ((epoch - remainder) // block) % n_phases)
        self.epochs = epochs
        self.cfg = cfg

        # Cumulative step boundaries: first_step[e] = global step at which
        # epoch e begins; first_step[epochs] = total steps.
        steps = [self.phases[p].steps_per_epoch for p in self.epoch_phase]
        self.first_step = np.concatenate([[0], np.cumsum(steps)]).astype(
            np.int64)

    # -- queries -----------------------------------------------------------
    def phase_for_epoch(self, epoch: int) -> Phase:
        return self.phases[self.epoch_phase[epoch]]

    def lr_for_epoch_scaled(self, epoch: int) -> float:
        base = float(np.asarray(lr_for_epoch(self.cfg, epoch)))
        return base * self.phase_for_epoch(epoch).lr_scale

    def total_steps(self) -> int:
        return int(self.first_step[-1])

    def position_for_step(self, step: int):
        """Map a resumed optimizer step -> (epoch, step_in_epoch).

        A step at (or past) the end of the schedule maps to
        ``(epochs, 0)`` so a finished run resumes as a no-op — the same
        behaviour as the non-multigrid path's ``initial_epoch = epochs``
        (clamping to the last epoch would replay its hooks, validation,
        and BN recalibration, mutating batch_stats and re-saving the
        final checkpoint)."""
        step = max(step, 0)
        if step >= self.total_steps():
            return self.epochs, 0
        epoch = int(np.searchsorted(self.first_step, step, side="right")) - 1
        return epoch, int(step - self.first_step[epoch])

    def make_lr_schedule(self) -> Callable:
        """An optax-style step->lr function over the phase-aware epoch
        boundaries (jit-traceable: searchsorted over constant arrays)."""
        import jax.numpy as jnp

        boundaries = jnp.asarray(self.first_step[1:], jnp.int32)
        lrs = jnp.asarray(
            [self.lr_for_epoch_scaled(e) for e in range(self.epochs)],
            jnp.float32)

        def schedule(step):
            idx = jnp.searchsorted(boundaries, jnp.asarray(step, jnp.int32),
                                   side="right")
            return lrs[jnp.clip(idx, 0, self.epochs - 1)]

        return schedule

    def describe(self) -> str:
        lines = []
        for p in self.phases:
            n = self.epoch_phase.count(p.index)
            lines.append(
                f"phase {p.index}: {p.temp_duration}x{p.crop_size}^2 "
                f"batch {p.batch_size} (lr x{p.lr_scale:g}, "
                f"{p.steps_per_epoch} steps/epoch, {n} epochs)")
        return "\n".join(lines)


def make_bn_recalibrator(model, batches_fn: Callable[[], Iterable[dict]],
                         num_batches: int, rng, momentum: float) -> Callable:
    """Precise-BN: returns ``state -> state`` that REPLACES the BN running
    statistics with the exact average of ``num_batches`` base-shape batches'
    statistics (forward passes in train mode, parameters untouched).

    Every BN variant here updates running stats as
    ``new = m*old + (1-m)*batch`` (``_BN``/``GroupedBatchNorm``/``_BNVars``,
    models/x3d.py), so each batch's statistic is recovered exactly by
    inverting the EMA against the *unchanged* pre-recalibration stats:
    ``batch = (new - m*old) / (1-m)``.  The inverted statistics are then
    plainly averaged — no momentum^N of the stale coarse-phase statistics
    survives, unlike chaining EMA updates (with momentum 0.9 and N=10, ~35%
    of the stale value would remain).  Averaging per-batch variances (not
    pooling moments across batches) is the paper's precise-BN estimator.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def batch_stats_of(state, video):
        _, mutated = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            video, train=True, return_logits=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            mutated["batch_stats"], state.batch_stats)

    def recalibrate(state):
        it = iter(batches_fn())
        acc = None
        n = 0
        for _ in range(num_batches):
            try:
                batch = next(it)
            except StopIteration:
                break
            stats = batch_stats_of(state, batch["video"])
            acc = stats if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, stats)
            n += 1
        if n == 0:
            return state
        return state.replace(batch_stats=jax.tree_util.tree_map(
            lambda a: a / n, acc))

    return recalibrate


def fit_multigrid(
    cfg,
    state,
    train_step: Callable,
    schedule: MultigridSchedule,
    batches_for_phase: Callable[[Phase], Iterator[dict]],
    rng,
    initial_epoch: int = 0,
    initial_step_in_epoch: int = 0,
    eval_step: Optional[Callable] = None,
    val_batches_fn: Optional[Callable[[], Iterable[dict]]] = None,
    hooks: Sequence[Hook] = (),
    metrics_every: int = 1,
    bn_recal_fn: Optional[Callable] = None,
):
    """The multigrid training loop; returns the final state.

    Mirrors ``loop.fit`` (hooks, metric cadence, per-epoch validation) with
    the epoch's shape/batch/steps taken from ``schedule``.  ``train_step``
    is the ordinary jitted step — jit re-specialises it per phase shape, so
    the first epoch of each phase pays one compile and later revisits hit
    the cache.  Iterators are created once per phase and kept (the phases'
    prefetch buffers hold ~constant bytes since B*T*S^2 is ~constant).

    ``bn_recal_fn``: optional ``state -> state`` run before each validation
    pass (see ``make_bn_recalibrator``); per the paper this matters when
    validating from a coarse phase's statistics.
    """
    iters: Dict[int, Iterator[dict]] = {}
    for epoch in range(initial_epoch, schedule.epochs):
        phase = schedule.phase_for_epoch(epoch)
        lr = schedule.lr_for_epoch_scaled(epoch)
        for h in hooks:
            h.on_epoch_start(epoch, lr)
        if phase.index not in iters:
            log.info("multigrid epoch %d -> phase %d (%dx%d^2, batch %d)",
                     epoch, phase.index, phase.temp_duration,
                     phase.crop_size, phase.batch_size)
            iters[phase.index] = batches_for_phase(phase)
        it = iters[phase.index]

        last_metrics: Dict[str, float] = {}
        start_i = initial_step_in_epoch if epoch == initial_epoch else 0
        epoch_base = int(schedule.first_step[epoch])
        for i in range(start_i, phase.steps_per_epoch):
            batch = next(it)
            state, metrics = train_step(state, batch, rng)
            step = epoch_base + i + 1
            if step % metrics_every == 0 or i == phase.steps_per_epoch - 1:
                host_metrics = _to_host(metrics)
                last_metrics = host_metrics
                for h in hooks:
                    h.on_step(step, host_metrics)
            for h in hooks:
                h.on_step_end(step, state)

        val_metrics = None
        if eval_step is not None and val_batches_fn is not None:
            if bn_recal_fn is not None:
                state = bn_recal_fn(state)
            val_metrics = evaluate(eval_step, state, val_batches_fn())

        for h in hooks:
            h.on_epoch_end(epoch + 1, state, last_metrics, val_metrics)

    for h in hooks:
        h.on_train_end()
    return state
