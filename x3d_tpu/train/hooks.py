"""Training hooks: the framework's callback system.

Replaces the reference's Keras callbacks (``utils.py:110-142``):
LearningRateScheduler -> the LR lives in the optimizer schedule (Q5);
TensorBoard -> :class:`TensorBoardHook`; ModelCheckpoint ->
:class:`CheckpointHook`; WandbCallback -> :class:`WandbHook` (gated on the
package being installed).  Hooks receive host-side scalars only — nothing
here blocks the device pipeline.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

log = logging.getLogger(__name__)


class Hook:
    def on_epoch_start(self, epoch: int, lr: float) -> None: ...
    def on_step(self, step: int, metrics: Dict[str, float]) -> None: ...
    def on_step_end(self, step: int, state) -> None:
        """Fires EVERY step with the live TrainState (a device handle —
        touching it is free; fetching it synchronises).  ``on_step`` by
        contrast fires only at the host metric-materialisation cadence."""
    def on_epoch_end(self, epoch: int, state,
                     train_metrics: Dict[str, float],
                     val_metrics: Optional[Dict[str, float]]) -> None: ...
    def on_train_end(self) -> None: ...


class LoggingHook(Hook):
    """absl/stdlib-logging progress lines with steps/sec."""

    def __init__(self, log_every: int = 50):
        self._every = log_every
        self._t0 = time.time()
        self._last_step = 0
        self._cur_step = 0

    def on_epoch_start(self, epoch, lr):
        log.info("epoch %d starting, lr=%.6f", epoch, lr)
        # Restart the rate window at the epoch boundary (epoch-end work —
        # validation, checkpoints — must not count as step time).  The
        # window's step origin must move too, or a report whose window
        # crosses an epoch divides the full step delta by the post-boundary
        # time only and over-reports (observed 49.6 "steps/s" on a ~10
        # steps/s run).
        self._t0 = time.time()
        self._last_step = self._cur_step

    def on_step_end(self, step, state):
        self._cur_step = step

    def on_step(self, step, metrics):
        if step % self._every == 0:
            dt = time.time() - self._t0
            sps = (step - self._last_step) / dt if dt > 0 else 0.0
            self._t0, self._last_step = time.time(), step
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
            log.info("step %d: %s (%.2f steps/s)", step, msg, sps)

    def on_epoch_end(self, epoch, state, train_metrics, val_metrics):
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(train_metrics.items()))
        if val_metrics:
            msg += " | val: " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(val_metrics.items()))
        log.info("epoch %d done: %s", epoch, msg)


class TensorBoardHook(Hook):
    """tf.summary event files (readable by TensorBoard / W&B sync)."""

    def __init__(self, log_dir: str, update_freq: int = 50):
        import tensorflow as tf

        self._tf = tf
        self._writer = tf.summary.create_file_writer(log_dir)
        self._freq = update_freq

    def on_step(self, step, metrics):
        if step % self._freq:
            return
        with self._writer.as_default(step=step):
            for k, v in metrics.items():
                self._tf.summary.scalar(f"train/{k}", v)

    def on_epoch_start(self, epoch, lr):
        with self._writer.as_default(step=epoch):
            self._tf.summary.scalar("lr", lr)

    def on_epoch_end(self, epoch, state, train_metrics, val_metrics):
        with self._writer.as_default(step=epoch):
            for k, v in (val_metrics or {}).items():
                self._tf.summary.scalar(f"val/{k}", v)
        self._writer.flush()

    def on_train_end(self):
        self._writer.close()


class ProfileHook(Hook):
    """Capture a jax.profiler device trace around one training step.

    The analog of the reference's ``TensorBoard(profile_batch=N)``
    (``utils.py:123-126``); the trace lands in ``<log_dir>/plugins/profile``
    and is readable by TensorBoard or ``x3d_tpu.tools.profile
    --analyze_only``.
    """

    def __init__(self, log_dir: str, profile_step: int):
        self._dir = log_dir
        self._step = profile_step
        self._active = False
        self._done = False

    def on_step(self, step, metrics):
        # on_step fires at the metric cadence, so the trace covers the
        # logging window that contains profile_step
        import jax

        if self._done or not self._step:
            return
        if not self._active and step >= self._step - 1:
            jax.profiler.start_trace(self._dir)
            self._active = True
        elif self._active:
            jax.profiler.stop_trace()
            self._active, self._done = False, True
            log.info("profile trace around step %d written to %s",
                     self._step, self._dir)

    def on_train_end(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()


class CheckpointHook(Hook):
    """Save the full TrainState — the ModelCheckpoint analog.

    Two cadences, matching the reference's ``ModelCheckpoint(save_freq=...)``
    (``utils.py:128-132``; flag at ``train.py:24``):

    * every epoch end (``save_freq='epoch'``, the default), and
    * every ``every_n_steps`` global steps when set
      (``--save_checkpoints_step N``), so a crash at K400 scale
      (~1,800 steps/epoch on X3D-M) loses at most N steps, not an epoch.

    Checkpoints are keyed by the **global optimizer step** (``state.step``),
    so resume recovers the exact (epoch, step-in-epoch, LR-schedule) point —
    the Orbax-native replacement for the reference's ``ckpt-{epoch}``
    filename parsing (``train.py:131-137``).
    """

    def __init__(self, manager, every_n_steps: Optional[int] = None):
        self._mgr = manager
        self._every = every_n_steps
        self._last_saved = -1

    def on_step_end(self, step, state):
        if self._every and step % self._every == 0 and step != self._last_saved:
            self._mgr.save(step, state)
            self._last_saved = step
            log.info("checkpoint saved at step %d", step)

    def on_epoch_end(self, epoch, state, train_metrics, val_metrics):
        import jax

        step = int(jax.device_get(state.step))
        if step != self._last_saved:
            self._mgr.save(step, state)
            self._last_saved = step


class WandbHook(Hook):
    """Weights & Biases logging, active only if wandb is importable.

    Mirrors the reference's WANDB config group usage (``train.py:47-58``):

    * ``WANDB.TENSORBOARD: True`` patches W&B's TensorBoard sync *before*
      ``wandb.init`` (reference ``train.py:49-54`` calls
      ``wandb.tensorboard.patch(root_logdir=...)``) so the event files the
      :class:`TensorBoardHook` writes are mirrored to the W&B run.
    * ``save_weights``: upload the latest checkpoint files at each epoch end
      — the analog of the reference's ``WandbCallback(save_weights_only=
      True)`` (``utils.py:135-139``).
    """

    def __init__(self, cfg, job_type: str = "train",
                 log_dir: Optional[str] = None,
                 checkpoint_dir: Optional[str] = None):
        self._run = None
        self._ckpt_dir = checkpoint_dir
        self._uploaded: Dict[str, float] = {}  # path -> mtime at upload
        if not cfg.WANDB.ENABLE:
            return
        try:
            import wandb
        except ImportError:
            log.warning("WANDB.ENABLE is set but wandb is not installed; "
                        "skipping W&B logging.")
            return
        self._wandb = wandb
        if cfg.WANDB.TENSORBOARD and log_dir:
            try:
                wandb.tensorboard.patch(root_logdir=log_dir)
            except Exception as e:  # pragma: no cover - wandb internals
                log.warning("wandb.tensorboard.patch failed: %s", e)
        self._run = wandb.init(
            job_type=job_type,
            group=cfg.WANDB.GROUP_NAME,
            project=cfg.WANDB.PROJECT_NAME,
            mode=cfg.WANDB.MODE,
            config=dict(cfg),
            resume=True,
        )

    def on_step(self, step, metrics):
        if self._run:
            self._wandb.log({f"train/{k}": v for k, v in metrics.items()},
                            step=step)

    def log_metrics(self, metrics: Dict[str, float],
                    prefix: str = "eval") -> None:
        """One-shot metric log — used by the eval CLI (the analog of the
        reference's ``job_type='eval'`` run, ``eval.py:37-45``, whose
        results land in the W&B project)."""
        if self._run:
            self._wandb.log({f"{prefix}/{k}": float(v)
                             for k, v in metrics.items()})

    def on_epoch_end(self, epoch, state, train_metrics, val_metrics):
        if not self._run:
            return
        if val_metrics:
            self._wandb.log({f"val/{k}": v for k, v in val_metrics.items()})
        if self._ckpt_dir:
            # WandbCallback(save_weights_only=True) analog: stage the
            # epoch's NEW checkpoint files into the run (uploaded on
            # finish/offline sync; base_path keeps the relative layout).
            # Only the per-epoch delta is staged — re-saving every file each
            # epoch would grow O(epochs x files) — and one failed save skips
            # that file, not the rest.
            import glob
            import os

            for f in glob.glob(os.path.join(self._ckpt_dir, "**"),
                               recursive=True):
                if not os.path.isfile(f):
                    continue
                mtime = os.path.getmtime(f)
                if self._uploaded.get(f) == mtime:
                    continue
                try:
                    self._wandb.save(
                        f, base_path=os.path.dirname(self._ckpt_dir),
                        policy="live")
                    self._uploaded[f] = mtime
                except Exception as e:  # pragma: no cover
                    log.warning("wandb.save(%s) failed: %s", f, e)

    def on_train_end(self):
        if self._run:
            self._run.finish()
