"""Training CLI — flag-compatible with the reference's ``train.py:12-35``.

    python -m x3d_tpu.tools.train \
        --config=x3d_tpu/configs/kinetics/X3D_M.yaml \
        --train_file_pattern='/data/train-*.tfrecord' \
        --model_dir=/tmp/x3d_m \
        --use_tfrecord --mixed_precision

Reference flags kept verbatim: config, train_file_pattern, val_file_pattern,
model_dir, pretrained_ckpt, num_gpus (here: chips), save_checkpoints_step,
mixed_precision (here: bf16 — no loss scaling needed on TPU, SURVEY.md C20),
use_tfrecord, debug.  Added: --synthetic (smoke-train without data),
--steps_per_epoch / --epochs overrides, --opts KEY VALUE config overrides,
--multigrid (long-cycle multigrid training, train/multigrid.py — the
reference's unbuilt roadmap item, README.md:125).
"""

from __future__ import annotations

import logging
import os

import jax
from absl import app, flags

flags.DEFINE_string("config", None, "(Relative) path to config (.yaml) file.")
flags.DEFINE_string("train_file_pattern", None,
                    "TFRecord pattern or label-file path for training data.")
flags.DEFINE_string("val_file_pattern", None,
                    "TFRecord pattern or label-file path for validation data.")
flags.DEFINE_string("model_dir", None,
                    "Directory for checkpoints and TensorBoard events.")
flags.DEFINE_string("pretrained_ckpt", None,
                    "Checkpoint directory for warm-starting weights.")
flags.DEFINE_integer("num_gpus", 0,
                     "Number of chips to use (0 = all local devices).",
                     lower_bound=0)
flags.DEFINE_integer("save_checkpoints_step", None,
                     "Checkpoint + TensorBoard cadence in steps (the "
                     "reference's utils.py:123-132 uses this one flag for "
                     "both ModelCheckpoint save_freq and TB update_freq).",
                     lower_bound=0)
flags.DEFINE_bool("mixed_precision", True, "bf16 compute (TPU native).")
flags.DEFINE_bool("use_tfrecord", False,
                  "Data is TFRecord shards (vs a label text file).")
flags.DEFINE_bool("debug", False, "NaN checks, fixed seed, debug logging.")
flags.DEFINE_bool("multihost", False,
                  "Initialize jax.distributed (multi-host TPU pod slice); "
                  "each host reads its own shard of the input files.")
flags.DEFINE_bool("synthetic", False,
                  "Train on synthetic data (no dataset needed).")
flags.DEFINE_bool("native_loader", False,
                  "Use the C++ clip loader (x3d_tpu/native) instead of "
                  "tf.data for the training input pipeline.")
flags.DEFINE_bool("multigrid", False,
                  "Long-cycle multigrid training (train/multigrid.py): "
                  "coarse-shape epochs at proportionally larger batches, "
                  "base-shape fine-tuning tail.  Also enabled by "
                  "MULTIGRID.ENABLE in the config.")
flags.DEFINE_integer("steps_per_epoch", None,
                     "Override DATASET_SIZE // BATCH_SIZE.")
flags.DEFINE_integer("epochs", None, "Override TRAIN.EPOCHS.")
flags.DEFINE_integer("profile_batch", 0,
                     "Capture a device trace around this global step "
                     "(reference: TensorBoard profile_batch).")
flags.DEFINE_multi_string("opts", [], "Config overrides: KEY VALUE pairs.")

flags.mark_flags_as_required(["config", "model_dir"])

FLAGS = flags.FLAGS
log = logging.getLogger(__name__)


def main(_):
    logging.basicConfig(level=logging.INFO)
    from x3d_tpu.data import InputReader, synthetic_batches
    from x3d_tpu.tools.common import load_config, setup_runtime
    from x3d_tpu.parallel import shard_state
    from x3d_tpu.train import (
        create_train_state, make_eval_step, make_train_step)
    from x3d_tpu.train.checkpoint import CheckpointManager
    from x3d_tpu.train.hooks import (
        CheckpointHook, LoggingHook, ProfileHook, TensorBoardHook, WandbHook)
    from x3d_tpu.train.loop import fit

    if not FLAGS.synthetic and not FLAGS.train_file_pattern:
        raise app.UsageError(
            "--train_file_pattern is required unless --synthetic is set")

    if FLAGS.multihost:
        jax.distributed.initialize()
        log.info("multihost: process %d/%d", jax.process_index(),
                 jax.process_count())

    cfg = load_config(FLAGS.config, FLAGS.opts)
    os.makedirs(FLAGS.model_dir, exist_ok=True)
    mesh, model, dtype = setup_runtime(
        cfg, FLAGS.num_gpus, FLAGS.mixed_precision, FLAGS.debug)

    seed = 1111 if FLAGS.debug else 0  # reference train.py:64 debug seed
    rng = jax.random.PRNGKey(seed)

    batch = cfg.TRAIN.BATCH_SIZE
    steps_per_epoch = FLAGS.steps_per_epoch or max(
        1, cfg.TRAIN.DATASET_SIZE // batch)
    epochs = FLAGS.epochs or cfg.TRAIN.EPOCHS

    multigrid = FLAGS.multigrid or cfg.MULTIGRID.ENABLE
    schedule = None
    if multigrid:
        if FLAGS.native_loader:
            raise app.UsageError(
                "--multigrid needs the tf.data pipeline (per-phase "
                "geometries); drop --native_loader")
        from x3d_tpu.train.multigrid import MultigridSchedule
        schedule = MultigridSchedule(cfg, steps_per_epoch, epochs)
        log.info("multigrid long-cycle schedule:\n%s", schedule.describe())

    host_kw = dict(host_id=jax.process_index(),
                   host_count=jax.process_count())

    def batches_for_phase(phase):
        """Multigrid: a train iterator at one long-cycle phase's geometry."""
        phase_cfg = phase.apply_to_config(cfg)
        local = max(1, phase.batch_size // jax.process_count())
        if FLAGS.synthetic:
            return synthetic_batches(phase_cfg, local, is_training=True,
                                     dtype=dtype)
        reader = InputReader(phase_cfg, is_training=True,
                             use_tfrecord=FLAGS.use_tfrecord, **host_kw)
        return reader.device_iterator(
            FLAGS.train_file_pattern, local, mesh=mesh, dtype=dtype)

    # data
    if multigrid:
        train_iter = None
        val_fn = None
        if not FLAGS.synthetic and FLAGS.val_file_pattern:
            val_reader = InputReader(cfg, is_training=False,
                                     use_tfrecord=FLAGS.use_tfrecord,
                                     **host_kw)

            def val_fn():
                return val_reader.device_iterator(
                    FLAGS.val_file_pattern,
                    max(1, cfg.TEST.BATCH_SIZE // jax.process_count()),
                    mesh=mesh, dtype=dtype)
    elif FLAGS.synthetic:
        train_iter = synthetic_batches(cfg, batch, is_training=True,
                                       dtype=dtype)
        val_fn = None
    else:
        # each host feeds its slice of the global batch
        local_batch = batch // jax.process_count()
        if FLAGS.native_loader:
            from x3d_tpu.data.native_loader import (NativeClipLoader,
                                                    available, build_error)
            if not FLAGS.use_tfrecord:
                raise app.UsageError(
                    "--native_loader requires --use_tfrecord (it reads "
                    "TFRecord shards, not raw videos)")
            if not available():
                raise app.UsageError(
                    f"--native_loader: {build_error()}")
            reader = NativeClipLoader(cfg, is_training=True,
                                      seed=jax.process_index(), **host_kw)
        else:
            reader = InputReader(cfg, is_training=True,
                                 use_tfrecord=FLAGS.use_tfrecord, **host_kw)
        train_iter = reader.device_iterator(
            FLAGS.train_file_pattern, local_batch, mesh=mesh, dtype=dtype)
        val_fn = None
        if FLAGS.val_file_pattern:
            val_reader = InputReader(cfg, is_training=False,
                                     use_tfrecord=FLAGS.use_tfrecord,
                                     **host_kw)

            def val_fn():
                return val_reader.device_iterator(
                    FLAGS.val_file_pattern,
                    max(1, cfg.TEST.BATCH_SIZE // jax.process_count()),
                    mesh=mesh, dtype=dtype)

    # model state (+ resume / warm start)
    if multigrid:
        # Parameters are input-shape-independent; init from a base-shape
        # zeros clip so no phase iterator is consumed before the loop.
        import jax.numpy as jnp
        from x3d_tpu.train.state import make_optimizer
        sample = {"video": jnp.zeros(
            (1, cfg.DATA.TEMP_DURATION, cfg.DATA.TRAIN_CROP_SIZE,
             cfg.DATA.TRAIN_CROP_SIZE, cfg.DATA.NUM_INPUT_CHANNELS), dtype)}
        tx = make_optimizer(cfg, steps_per_epoch,
                            schedule=schedule.make_lr_schedule())
        state = create_train_state(cfg, model, rng, sample["video"],
                                   steps_per_epoch=steps_per_epoch, tx=tx)
    else:
        sample = next(train_iter)
        state = create_train_state(cfg, model, rng, sample["video"][:1],
                                   steps_per_epoch=steps_per_epoch)
    state = shard_state(state, mesh)

    ckpt = CheckpointManager(os.path.join(FLAGS.model_dir, "checkpoints"))
    state, restored_key = ckpt.restore(state)
    initial_epoch = initial_step_in_epoch = 0
    if restored_key:
        # The restored optimizer step is authoritative (works for both
        # step-keyed and historical epoch-keyed checkpoints); the LR
        # schedule resumes correctly because the optax schedule count is
        # part of the restored opt_state.
        resume_step = int(jax.device_get(state.step))
        if multigrid:
            initial_epoch, initial_step_in_epoch = (
                schedule.position_for_step(resume_step))
        else:
            initial_epoch = resume_step // steps_per_epoch
            initial_step_in_epoch = resume_step % steps_per_epoch
        log.info("resumed at global step %d (epoch %d, step-in-epoch %d)",
                 resume_step, initial_epoch, initial_step_in_epoch)
    elif FLAGS.pretrained_ckpt:
        state = ckpt.restore_weights_only(state, FLAGS.pretrained_ckpt)
        log.info("warm-started from %s", FLAGS.pretrained_ckpt)

    if FLAGS.debug:
        # FULL_HEALTH analog (reference train.py:62-67): per-module output
        # health of the first batch, dumped next to the checkpoints
        from x3d_tpu.train.debug import dump_tensor_health

        dump_tensor_health(
            model, state, sample["video"],
            os.path.join(FLAGS.model_dir, "debug_health.json"))

    from x3d_tpu.utils import tpu_compiler_options
    opts = tpu_compiler_options()
    train_step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY),
                         compiler_options=opts)
    eval_step = (jax.jit(make_eval_step(model), compiler_options=opts)
                 if val_fn else None)

    # WandbHook first: WANDB.TENSORBOARD patches tf.summary before the
    # TensorBoardHook creates its writer (reference train.py:49-54 patches
    # before any TF callback exists)
    hooks = [
        WandbHook(cfg, job_type="train", log_dir=FLAGS.model_dir,
                  checkpoint_dir=os.path.join(FLAGS.model_dir,
                                              "checkpoints")),
        LoggingHook(log_every=FLAGS.save_checkpoints_step or 50),
        TensorBoardHook(FLAGS.model_dir,
                        update_freq=FLAGS.save_checkpoints_step or 50),
        CheckpointHook(ckpt, every_n_steps=FLAGS.save_checkpoints_step),
    ]
    if FLAGS.profile_batch:
        hooks.append(ProfileHook(FLAGS.model_dir, FLAGS.profile_batch))

    if multigrid:
        from x3d_tpu.train.multigrid import (fit_multigrid,
                                             make_bn_recalibrator)
        bn_recal_fn = None
        if cfg.MULTIGRID.BN_RECALC_BATCHES > 0 and val_fn is not None:
            import itertools
            n = cfg.MULTIGRID.BN_RECALC_BATCHES
            recal_iter = batches_for_phase(schedule.phases[-1])
            bn_recal_fn = make_bn_recalibrator(
                model, lambda: itertools.islice(recal_iter, n), n, rng,
                momentum=cfg.NETWORK.BN.MOMENTUM)
        fit_multigrid(
            cfg,
            state,
            train_step,
            schedule,
            batches_for_phase,
            rng=rng,
            initial_epoch=initial_epoch,
            initial_step_in_epoch=initial_step_in_epoch,
            eval_step=eval_step,
            val_batches_fn=val_fn,
            hooks=hooks,
            metrics_every=FLAGS.save_checkpoints_step or 50,
            bn_recal_fn=bn_recal_fn,
        )
        ckpt.close()
        return

    def train_with_first(first, rest):
        yield first
        yield from rest

    fit(
        cfg,
        state,
        train_step,
        train_with_first(sample, train_iter),
        steps_per_epoch=steps_per_epoch,
        epochs=epochs,
        rng=rng,
        initial_epoch=initial_epoch,
        eval_step=eval_step,
        val_batches_fn=val_fn,
        hooks=hooks,
        metrics_every=FLAGS.save_checkpoints_step or 50,
        initial_step_in_epoch=initial_step_in_epoch,
    )
    ckpt.close()


if __name__ == "__main__":
    app.run(main)
