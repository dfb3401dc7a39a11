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

    def on_epoch_start(self, epoch, lr):
        log.info("epoch %d starting, lr=%.6f", epoch, lr)
        self._t0 = time.time()

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
    """Save the full TrainState at every epoch end (ModelCheckpoint analog)."""

    def __init__(self, manager):
        self._mgr = manager

    def on_epoch_end(self, epoch, state, train_metrics, val_metrics):
        self._mgr.save(epoch, state)


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

    def on_epoch_end(self, epoch, state, train_metrics, val_metrics):
        if not self._run:
            return
        if val_metrics:
            self._wandb.log({f"val/{k}": v for k, v in val_metrics.items()})
        if self._ckpt_dir:
            # WandbCallback(save_weights_only=True) analog: stage the new
            # checkpoint's files into the run (uploaded on finish/offline
            # sync; base_path keeps the relative layout)
            import glob
            import os

            for f in glob.glob(os.path.join(self._ckpt_dir, "**"),
                               recursive=True):
                if os.path.isfile(f):
                    try:
                        self._wandb.save(
                            f, base_path=os.path.dirname(self._ckpt_dir),
                            policy="live")
                    except Exception as e:  # pragma: no cover
                        log.warning("wandb.save(%s) failed: %s", f, e)
                        return

    def on_train_end(self):
        if self._run:
            self._run.finish()
