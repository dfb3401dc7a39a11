"""Compiled-HBM analysis for a train/eval step (no execution needed).

Compiles the step AOT and prints XLA's buffer-assignment numbers (temp /
argument / output bytes) — the tool that pins down whether a (variant,
batch, remat) combination fits a chip before burning a run on it.  This is
how the L/XL 312² batch limits in ``bench.py`` were derived.

    python -m x3d_tpu.tools.memory --config=x3d_tpu/configs/kinetics/X3D_L.yaml \
        --batch=16 [--batch=24 ...] [--mode=train] [--remat] [--hbm_gb=15.75]
"""

from __future__ import annotations

import json


def analyze(cfg, batch: int, mode: str, remat, fold=None) -> dict:
    import jax
    import jax.numpy as jnp

    from x3d_tpu.models import create_model
    from x3d_tpu.train import (create_train_state, make_eval_step,
                               make_train_step)
    from x3d_tpu.utils import tpu_compiler_options

    model = create_model(cfg, dtype=jnp.bfloat16, remat=remat,
                         time_fold=fold)
    key = jax.random.PRNGKey(0)
    T = cfg.DATA.TEMP_DURATION
    S = (cfg.DATA.TRAIN_CROP_SIZE if mode == "train"
         else cfg.DATA.TEST_CROP_SIZE)
    views = (1 if mode == "train"
             else cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS)
    video = jnp.zeros((batch * views, T, S, S, 3), jnp.bfloat16)
    label = jnp.zeros((batch,), jnp.int32)
    state = create_train_state(cfg, model, key, video[:1],
                               steps_per_epoch=1000)
    if mode == "train":
        step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY),
                       compiler_options=tpu_compiler_options())
        lowered = step.lower(state, {"video": video, "label": label}, key)
    else:
        step = jax.jit(make_eval_step(model),
                       compiler_options=tpu_compiler_options())
        lowered = step.lower(state, {"video": video, "label": label})
    ma = lowered.compile().memory_analysis()
    return {
        "batch": batch,
        "remat": str(remat),
        "fold": str(fold),
        "input": f"{batch * views}x{T}x{S}^2",
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 2),
        "args_gb": round(ma.argument_size_in_bytes / 1e9, 2),
        "out_gb": round(ma.output_size_in_bytes / 1e9, 2),
        "total_gb": round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes) / 1e9, 2),
    }


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("config", None, "Variant config yaml.")
    flags.DEFINE_multi_integer("batch", [16], "Batch size(s) to analyze.")
    flags.DEFINE_string("mode", "train", "train or eval.")
    flags.DEFINE_string("remat", "auto",
                        "Remat mode: auto/off/block/stage/convs.")
    flags.DEFINE_float("hbm_gb", 15.75, "Chip HBM capacity for the verdict.")
    flags.DEFINE_string("fold", "config",
                        "Time-folded layout: config/auto/on/off.")
    flags.mark_flags_as_required(["config"])
    FLAGS = flags.FLAGS

    def run(_):
        from x3d_tpu.tools.common import load_config

        cfg = load_config(FLAGS.config)
        remat = {"auto": None, "true": True, "false": False,
                 "off": False}.get(FLAGS.remat.lower(), FLAGS.remat.lower())
        fold = {"config": None, "auto": "auto", "on": True, "true": True,
                "off": False, "false": False}[FLAGS.fold.lower()]
        for b in FLAGS.batch:
            r = analyze(cfg, b, FLAGS.mode, remat, fold)
            r["fits"] = r["total_gb"] <= FLAGS.hbm_gb
            print(json.dumps(r))

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
