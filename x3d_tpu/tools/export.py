"""Export CLI — trained checkpoint -> TF SavedModel (see x3d_tpu/export.py).

    python -m x3d_tpu.tools.export \
        --cfg=x3d_tpu/configs/kinetics/X3D_M.yaml \
        --model_folder=/tmp/x3d_m --export_dir=/tmp/x3d_m/saved_model

Restores the latest checkpoint written by the train CLI (same path as the
eval CLI) and writes a SavedModel whose default signature is the variant's
published multi-view eval protocol over raw uint8 clips.  The reference's
users deploy its Keras model through TF Serving; this is the JAX
framework's equivalent artifact.
"""

from __future__ import annotations

import logging

from absl import app, flags

flags.DEFINE_string("cfg", None, "(Relative) path to config (.yaml) file.")
flags.DEFINE_string("model_folder", None,
                    "Directory holding checkpoints (from the train CLI).")
flags.DEFINE_string("export_dir", None, "SavedModel output directory.")
flags.DEFINE_multi_string("opts", [], "Config overrides: KEY VALUE pairs.")
flags.DEFINE_integer(
    "batch_clips", 0,
    "Fix the clip-batch dimension (0 = shape-polymorphic batch).")
flags.DEFINE_string("dtype", "float32",
                    "In-graph compute dtype: float32 | bfloat16.")
flags.DEFINE_string(
    "tflite", None,
    "Also write a .tflite flatbuffer to this path (requires "
    "--batch_clips; runtime needs a Flex-enabled interpreter — see "
    "x3d_tpu/export.py:export_tflite).")
flags.DEFINE_bool(
    "allow_random_init", False,
    "Export a randomly initialised model when no checkpoint exists "
    "(smoke tests only).")
flags.DEFINE_list(
    "platforms", "cpu,tpu",
    "StableHLO lowering platforms baked into the SavedModel (cpu, tpu, "
    "cuda).  The default serves on plain CPU TF-Serving and TPU hosts; "
    "without an explicit list jax2tf would bake only the exporting "
    "host's backend.")

flags.mark_flags_as_required(["cfg", "model_folder", "export_dir"])

FLAGS = flags.FLAGS
log = logging.getLogger(__name__)


def main(_):
    logging.basicConfig(level=logging.INFO)
    import os

    import jax
    import jax.numpy as jnp

    from x3d_tpu.export import export_saved_model
    from x3d_tpu.models import create_model, init_variables
    from x3d_tpu.tools.common import load_config
    from x3d_tpu.train import create_train_state
    from x3d_tpu.train.checkpoint import CheckpointManager

    cfg = load_config(FLAGS.cfg, FLAGS.opts)
    dtype = jnp.dtype(FLAGS.dtype)

    ckpt_dir = os.path.join(FLAGS.model_folder, "checkpoints")
    mgr = CheckpointManager(ckpt_dir)
    have_ckpt = mgr.latest_epoch() is not None
    if not have_ckpt and not FLAGS.allow_random_init:
        mgr.close()
        raise app.UsageError(
            f"No checkpoint found in {ckpt_dir}; pass --allow_random_init "
            "to export an untrained model.")

    model = create_model(cfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros(
        (1, cfg.DATA.TEMP_DURATION, cfg.DATA.TEST_CROP_SIZE,
         cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_INPUT_CHANNELS), dtype)
    if have_ckpt:
        state = create_train_state(cfg, model, rng, sample, steps_per_epoch=1)
        state = mgr.restore_weights_only(state)
        log.info("restored weights from epoch %d", mgr.latest_epoch())
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        log.warning("No checkpoint in %s — exporting RANDOM INIT "
                    "(--allow_random_init).", ckpt_dir)
        variables = init_variables(model, rng, sample)
    mgr.close()

    out = export_saved_model(
        cfg, variables, FLAGS.export_dir, dtype=dtype,
        batch_clips=FLAGS.batch_clips or None,
        platforms=tuple(p.strip() for p in FLAGS.platforms))
    log.info("SavedModel written to %s", out)
    if FLAGS.tflite:
        if not FLAGS.batch_clips:
            raise app.UsageError("--tflite requires --batch_clips (the "
                                 "polymorphic batch does not serialize to "
                                 "TFLite — see export_tflite's docstring)")
        from x3d_tpu.export import export_tflite
        log.info("TFLite flatbuffer written to %s",
                 export_tflite(out, FLAGS.tflite))
    print(out)


if __name__ == "__main__":
    app.run(main)
