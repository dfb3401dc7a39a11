"""Profile a train/eval step on device and print an op-level breakdown.

The analog (and superset) of the reference's TensorBoard ``profile_batch``
hooks (``utils.py:125``, ``eval.py:87-89``): captures a ``jax.profiler``
device trace of N steps, then summarises device time by HLO category and by
conv kernel shape — the workflow that found this framework's padded-layout
bottlenecks.

    python -m x3d_tpu.tools.profile --config=x3d_tpu/configs/kinetics/X3D_M.yaml \
        --mode=train --batch=16 --steps=3 [--trace_dir=/tmp/x3d_trace]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re


def analyze_trace(trace_dir: str, top: int = 15) -> str:
    """Summarise the newest trace in ``trace_dir``."""
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return "no trace found"
    with gzip.open(files[-1]) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    dev = [e for e in events if e.get("ph") == "X"
           and "TPU" in pids.get(e.get("pid"), "")
           and "hlo_category" in e.get("args", {})]

    by_cat = collections.Counter()
    for e in dev:
        by_cat[e["args"]["hlo_category"]] += e["dur"]

    def classify_conv(ln):
        ks = re.findall(r"\[(\d+,\d+,\d+,\d+,\d+)\]", ln)
        for s in ks[1:]:
            dims = list(map(int, s.split(",")))
            if max(dims[:3]) <= 5:
                kt, kh, kw, i, o = dims
                kind = ("dw" if 1 in (i, o)
                        else "pw" if (kt, kh, kw) == (1, 1, 1)
                        else f"{kt}x{kh}x{kw}")
                return f"{kind} k={kt}{kh}{kw} io={i}->{o}"
        return "other"

    def direction(e):
        # op_name: "jit(train_step)/jvp(X3D)/..." = forward,
        # ".../transpose(jvp(X3D))/..." = backward
        name = e["args"].get("tf_op", "") + e["args"].get("long_name", "")
        if "transpose(jvp" in name:
            return "bwd"
        if "jvp(" in name or "jit(" in name:
            return "fwd"
        return "?"

    by_conv = collections.Counter()
    for e in dev:
        if e["args"]["hlo_category"] == "convolution fusion":
            key = (classify_conv(e["args"].get("long_name", "")),
                   direction(e))
            by_conv[key] += e["dur"]

    lines = ["=== device time by HLO category (ms) ==="]
    for c, d in by_cat.most_common():
        lines.append(f"{d / 1e3:9.2f}  {c}")
    lines.append("=== convolution time by kernel (fwd/bwd) ===")
    for (k, direc), d in by_conv.most_common(top):
        lines.append(f"{d / 1e3:9.2f}  {direc:3s}  {k}")
    return "\n".join(lines)


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("config", None, "Variant config yaml.")
    flags.DEFINE_string("mode", "train", "train or eval step to profile.")
    flags.DEFINE_integer("batch", 16, "Batch size (clips).")
    flags.DEFINE_integer("steps", 3, "Steps to capture.")
    flags.DEFINE_string("trace_dir", "/tmp/x3d_trace", "Trace output dir.")
    flags.DEFINE_string("analyze_only", None,
                        "Skip capture; analyse this trace dir.")
    flags.mark_flags_as_required(["config"])
    FLAGS = flags.FLAGS

    def run(_):
        if FLAGS.analyze_only:
            print(analyze_trace(FLAGS.analyze_only))
            return

        import jax
        import jax.numpy as jnp
        import numpy as np

        from x3d_tpu.models import create_model
        from x3d_tpu.tools.common import load_config
        from x3d_tpu.train import (create_train_state, make_eval_step,
                                   make_train_step)

        cfg = load_config(FLAGS.config)
        model = create_model(cfg)
        key = jax.random.PRNGKey(0)
        T = cfg.DATA.TEMP_DURATION
        S = (cfg.DATA.TRAIN_CROP_SIZE if FLAGS.mode == "train"
             else cfg.DATA.TEST_CROP_SIZE)
        # eval batches carry batch*views clips with per-video labels, like
        # the real eval pipeline (and bench.py): the model's view-averaging
        # reshape needs the clip count divisible by the view count.
        views = (1 if FLAGS.mode == "train"
                 else cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS)
        video = jax.random.normal(key, (FLAGS.batch * views, T, S, S, 3),
                                  jnp.bfloat16)
        label = jnp.arange(FLAGS.batch) % cfg.NETWORK.NUM_CLASSES
        batch = {"video": video, "label": label}
        state = create_train_state(cfg, model, key, video[:1],
                                   steps_per_epoch=1000)

        if FLAGS.mode == "train":
            step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
            state, m = step(state, batch, key)         # compile
            float(np.asarray(m["loss"]))
            jax.profiler.start_trace(FLAGS.trace_dir)
            for _ in range(FLAGS.steps):
                state, m = step(state, batch, key)
            float(np.asarray(m["loss"]))
        else:
            step = jax.jit(make_eval_step(model))
            out = step(state, batch)
            float(np.asarray(out["loss_sum"]))
            jax.profiler.start_trace(FLAGS.trace_dir)
            for _ in range(FLAGS.steps):
                out = step(state, batch)
            float(np.asarray(out["loss_sum"]))
        jax.profiler.stop_trace()
        print(analyze_trace(FLAGS.trace_dir))

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
