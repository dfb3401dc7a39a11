"""Full-train-step A/B harness for lowering experiments.

The only trustworthy way to evaluate a kernel/lowering change on this
stack is a full training step on real hardware: isolated op benchmarks
mislead (XLA's layout assignment and fusion structure differ in-step, and
loop harnesses let the compiler dead-code-eliminate sliced outputs — see
docs/PERF.md).  This tool times the complete X3D train step under a chosen
combination of dispatch knobs:

    python -m x3d_tpu.tools.ab --dw=aligned --pw=conv [--variant=M]
        [--batch=128] [--steps=20] [--remat=block] [--crop=224] [--fold=on]

  --dw:    off | aligned | pallas | aligned_pbwd | xla | shift |
           shift_cvjp | bm | xbwd | pbwd
           (off/aligned/pallas select the bottleneck segment mode in
           ops/dw_fused.py; aligned_pbwd = aligned segment + the
           XLA-fwd/Pallas-bwd dw lowering; the rest select ops/depthwise.py
           lowerings with the segment mode off)
  --pw:    conv | einsum | auto | mxu | mxu_exp | mxu_seg  (ops/pointwise.py)
  --remat: auto | off | block | stage | convs  (models/x3d.py granularity)
  --fold:  config | auto | on | off  (time-folded layout, models/x3d.py)
  --mode:  train (default, full step) | eval (view-ensemble forward at the
           variant's test protocol; --batch then counts VIDEOS)

Prints one JSON line with step_ms and clips_per_s (min over 3 timed
rounds of --steps chained steps, dispatch overhead amortized).
"""

from __future__ import annotations

import json
import time


def run_ab(variant: str, dw: str, pw: str, batch: int, steps: int,
           remat: str = "auto", crop: int | None = None,
           fold: str = "config", mode: str = "train",
           temp: int | None = None) -> dict:
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from x3d_tpu import variant_config
    from x3d_tpu.models import create_model
    from x3d_tpu.ops import depthwise, dw_fused, pointwise
    from x3d_tpu.train import (create_train_state, make_eval_step,
                               make_train_step)
    from x3d_tpu.utils import tpu_compiler_options

    if dw == "aligned_pbwd":
        # aligned segment structure + the XLA-fwd/Pallas-bwd dw lowering
        dw_fused.set_enabled("aligned")
        depthwise.set_default_impl("pbwd")
    elif dw in ("off", "aligned", "pallas"):
        dw_fused.set_enabled(False if dw == "off" else dw)
    else:
        dw_fused.set_enabled(False)
        depthwise.set_default_impl(dw)
    pointwise.set_default_impl(pw)

    cfg = variant_config(variant)
    if crop:
        # override whichever geometry this mode actually benchmarks
        cfg.DATA.TRAIN_CROP_SIZE = crop
        cfg.DATA.TEST_CROP_SIZE = crop
    if temp:
        cfg.DATA.TEMP_DURATION = temp  # multigrid phase geometries
    dtype = jnp.bfloat16
    remat_arg = {"auto": None, "true": True, "false": False,
                 "off": False}.get(str(remat).lower(), str(remat).lower())
    fold_arg = {"config": None, "auto": "auto", "on": True, "true": True,
                "off": False, "false": False}[str(fold).lower()]
    model = create_model(cfg, dtype=dtype, remat=remat_arg,
                         time_fold=fold_arg)
    key = jax.random.PRNGKey(0)
    T = cfg.DATA.TEMP_DURATION
    S = (cfg.DATA.TRAIN_CROP_SIZE if mode == "train"
         else cfg.DATA.TEST_CROP_SIZE)

    if mode == "eval":
        # --batch counts VIDEOS; the eval batch is videos x views clips.
        # Steps chain through the label tensor behind an optimization
        # barrier (the bench.py methodology — see its module docstring).
        views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        video = jax.random.normal(key, (batch * views, T, S, S, 3),
                                  dtype=dtype)
        label = jnp.zeros((batch,), jnp.int32)
        state = create_train_state(cfg, model, key, video[:1],
                                   steps_per_epoch=1000)
        eval_step = make_eval_step(model)

        @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
        def chained(st, x, lab):
            out = eval_step(st, {"video": x, "label": lab})
            lab, _ = jax.lax.optimization_barrier((lab, out["loss_sum"]))
            return lab, out

        label, out = chained(state, video, label)
        float(np.asarray(out["loss_sum"]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                label, out = chained(state, video, label)
            float(np.asarray(out["loss_sum"]))
            best = min(best, (time.perf_counter() - t0) / steps)
        return {"variant": variant, "mode": "eval", "dw": dw, "pw": pw,
                "videos": batch, "views": views, "clips": batch * views,
                "fold": str(fold), "input": f"{T}x{S}^2",
                "step_ms": round(best * 1e3, 2),
                "clips_per_s": round(batch * views / best, 2)}

    video = jax.random.normal(key, (batch, T, S, S, 3), dtype=dtype)
    label = jnp.arange(batch) % cfg.NETWORK.NUM_CLASSES
    batch_d = {"video": video, "label": label}

    state = create_train_state(cfg, model, key, video, steps_per_epoch=1000)
    train_step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY),
                         compiler_options=tpu_compiler_options())

    state, metrics = train_step(state, batch_d, key)
    float(np.asarray(metrics["loss"]))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = train_step(state, batch_d, key)
        float(np.asarray(metrics["loss"]))
        best = min(best, (time.perf_counter() - t0) / steps)

    return {"variant": variant, "dw": dw, "pw": pw, "batch": batch,
            "remat": str(remat), "fold": str(fold), "input": f"{T}x{S}^2",
            "step_ms": round(best * 1e3, 2),
            "clips_per_s": round(batch / best, 2)}


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("variant", "M", "X3D variant.")
    flags.DEFINE_string("dw", "aligned", "Depthwise/segment mode.")
    flags.DEFINE_string("pw", "conv", "Pointwise lowering.")
    flags.DEFINE_integer("batch", 128, "Train batch (clips).")
    flags.DEFINE_integer("steps", 20, "Chained steps per timed round.")
    flags.DEFINE_string("remat", "auto",
                        "Remat mode: auto/off/block/stage/convs.")
    flags.DEFINE_integer("crop", 0, "Override TRAIN_CROP_SIZE (0 = config).")
    flags.DEFINE_integer("temp", 0,
                         "Override TEMP_DURATION (0 = config; multigrid "
                         "phase geometries).")
    flags.DEFINE_string("fold", "config",
                        "Time-folded layout: config/auto/on/off.")
    flags.DEFINE_string("mode", "train",
                        "train (full step) or eval (view-ensemble forward; "
                        "--batch counts videos).")
    FLAGS = flags.FLAGS

    def run(_):
        print(json.dumps(run_ab(FLAGS.variant.upper(), FLAGS.dw, FLAGS.pw,
                                FLAGS.batch, FLAGS.steps, FLAGS.remat,
                                FLAGS.crop or None, FLAGS.fold,
                                FLAGS.mode, FLAGS.temp or None)))

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
