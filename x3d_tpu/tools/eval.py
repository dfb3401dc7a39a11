"""Evaluation CLI — multi-view ensemble testing (reference ``eval.py``).

    python -m x3d_tpu.tools.eval \
        --cfg=x3d_tpu/configs/kinetics/X3D_M.yaml \
        --test_file_pattern='/data/val-*.tfrecord' \
        --model_folder=/tmp/x3d_m --tfrecord

Reference flags kept verbatim: cfg, test_file_pattern, model_folder,
gpus (here: chips), tfrecord.  Added: --synthetic, --max_batches, --opts.
"""

from __future__ import annotations

import json
import logging

import jax
from absl import app, flags

flags.DEFINE_string("cfg", None, "(Relative) path to config (.yaml) file.")
flags.DEFINE_string("test_file_pattern", None,
                    "TFRecord pattern or label-file path for test data.")
flags.DEFINE_string("model_folder", None,
                    "Directory holding checkpoints (from the train CLI).")
flags.DEFINE_integer("gpus", 0, "Number of chips (0 = all).", lower_bound=0)
flags.DEFINE_bool("tfrecord", False, "Data is TFRecord shards.")
flags.DEFINE_bool("native_loader", False,
                  "Use the C++ clip loader (x3d_tpu/native) instead of "
                  "tf.data (requires --tfrecord; center/3-crop protocols).")
flags.DEFINE_integer(
    "native_threads", 1,
    "C++ loader decode threads for eval.  Default 1 keeps the batch "
    "stream deterministic (reference eval order is deterministic: "
    "dataloader.py:130); >1 trades reproducible batch composition for "
    "feed throughput — aggregate metrics are unaffected (exact-sum "
    "reduction over all clips, order-independent).", lower_bound=1)
flags.DEFINE_bool("synthetic", False, "Evaluate on synthetic data.")
flags.DEFINE_integer("max_batches", None, "Cap evaluation batches.")
flags.DEFINE_multi_string("opts", [], "Config overrides: KEY VALUE pairs.")
flags.DEFINE_integer(
    "profile_batch", 0,
    "Capture a device trace around this (1-based) eval batch; the "
    "reference always profiles batch 2 (eval.py:87-89) — pass 2 for parity, "
    "0 disables.")
flags.DEFINE_bool(
    "allow_random_init", False,
    "Evaluate a randomly initialised model when no checkpoint exists "
    "(smoke tests only; the reference hard-requires a checkpoint).")

flags.mark_flags_as_required(["cfg", "model_folder"])

FLAGS = flags.FLAGS
log = logging.getLogger(__name__)


def main(_):
    logging.basicConfig(level=logging.INFO)
    import itertools
    import os

    from x3d_tpu.data import InputReader, synthetic_batches
    from x3d_tpu.tools.common import load_config, setup_runtime
    from x3d_tpu.parallel import shard_state
    from x3d_tpu.train import create_train_state, make_eval_step
    from x3d_tpu.train.checkpoint import CheckpointManager
    from x3d_tpu.train.loop import evaluate

    cfg = load_config(FLAGS.cfg, FLAGS.opts)

    # Fail fast on a missing checkpoint, before any device/compile work: the
    # reference fails here too (eval.py:78-81 dereferences the latest
    # checkpoint); a typo'd --model_folder must not silently yield
    # chance-level accuracy.
    ckpt_dir = os.path.join(FLAGS.model_folder, "checkpoints")
    mgr = CheckpointManager(ckpt_dir)
    have_ckpt = mgr.latest_epoch() is not None
    if not have_ckpt and not FLAGS.allow_random_init:
        mgr.close()
        raise app.UsageError(
            f"No checkpoint found in {ckpt_dir}; pass --allow_random_init "
            "to evaluate an untrained model.")

    mesh, model, dtype = setup_runtime(cfg, FLAGS.gpus, True, False)

    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    batch = cfg.TEST.BATCH_SIZE
    rng = jax.random.PRNGKey(0)

    if FLAGS.synthetic:
        def batches():
            it = synthetic_batches(cfg, batch, is_training=False, dtype=dtype)
            return itertools.islice(it, FLAGS.max_batches or 4)
    else:
        if not FLAGS.test_file_pattern:
            raise app.UsageError(
                "--test_file_pattern required unless --synthetic")
        if FLAGS.native_loader:
            from x3d_tpu.data.native_loader import (NativeClipLoader,
                                                    available, build_error)
            if not FLAGS.tfrecord:
                raise app.UsageError("--native_loader requires --tfrecord")
            if not available():
                raise app.UsageError(f"--native_loader: {build_error()}")
            reader = NativeClipLoader(cfg, is_training=False,
                                      num_threads=FLAGS.native_threads)
        else:
            reader = InputReader(cfg, is_training=False,
                                 use_tfrecord=FLAGS.tfrecord)

        def batches():
            it = reader.device_iterator(FLAGS.test_file_pattern, batch,
                                        mesh=mesh, dtype=dtype)
            if FLAGS.max_batches:
                it = itertools.islice(it, FLAGS.max_batches)
            return it

    import jax.numpy as jnp

    sample = jnp.zeros(
        (batch * views, cfg.DATA.TEMP_DURATION, cfg.DATA.TEST_CROP_SIZE,
         cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_INPUT_CHANNELS), dtype)
    state = create_train_state(cfg, model, rng, sample[:1],
                               steps_per_epoch=1)
    state = shard_state(state, mesh)

    if not have_ckpt:
        log.warning("No checkpoint in %s — evaluating RANDOM INIT "
                    "(--allow_random_init).", ckpt_dir)
    else:
        state = mgr.restore_weights_only(state)
        log.info("restored weights from epoch %d", mgr.latest_epoch())

    # W&B eval-job parity (reference eval.py:37-45 opens a job_type='eval'
    # run so evaluation results land in the project)
    from x3d_tpu.train.hooks import WandbHook
    wandb_hook = WandbHook(cfg, job_type="eval", log_dir=FLAGS.model_folder)

    from x3d_tpu.utils import tpu_compiler_options
    eval_step = jax.jit(make_eval_step(model),
                        compiler_options=tpu_compiler_options())
    metrics = evaluate(
        eval_step, state, batches(),
        profile_batch=FLAGS.profile_batch,
        profile_dir=os.path.join(FLAGS.model_folder, "eval_profile"))
    log.info("eval: %s", metrics)
    print(json.dumps({k: round(float(v), 6) for k, v in metrics.items()}))
    wandb_hook.log_metrics(metrics)
    wandb_hook.on_train_end()
    mgr.close()


if __name__ == "__main__":
    app.run(main)
