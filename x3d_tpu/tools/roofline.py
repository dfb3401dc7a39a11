"""Per-fusion roofline analysis of a captured device trace.

For every HLO op in a ``jax.profiler`` trace this reports achieved HBM
bandwidth (XLA's ``bytes_accessed`` cost analysis / measured duration) and
achieved FLOP/s against the chip's peaks, answering *which ops still have
headroom and how much* — the question that decides whether the next perf
lever is a custom kernel or whether the step is already bandwidth-bound
(then only algorithmic traffic reduction helps).

The reference has no analog (its profiling story is TensorBoard
``profile_batch``, ``utils.py:125``, ``eval.py:87-89``); this is the
TPU-native deepening of that subsystem.

    python -m x3d_tpu.tools.roofline --trace_dir=/tmp/x3d_trace [--top=25]

Peaks default to TPU v5e (819 GB/s HBM, 394 bf16 TFLOP/s) and are
flag-overridable for other chips.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json


def load_device_events(trace_dir: str):
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    return [e for e in events if e.get("ph") == "X"
            and "TPU" in pids.get(e.get("pid"), "")
            and "hlo_category" in e.get("args", {})]


def aggregate(dev_events):
    """Per-op-name totals: calls, duration_us, bytes, flops, category."""
    agg = {}
    for e in dev_events:
        a = e["args"]
        name = e["name"]
        rec = agg.setdefault(name, {
            "calls": 0, "dur_us": 0.0, "bytes": 0, "flops": 0,
            "category": a.get("hlo_category", "?"),
            "source": a.get("source", ""),
            "tf_op": a.get("tf_op", "")})
        rec["calls"] += 1
        rec["dur_us"] += e["dur"]
        rec["bytes"] += int(a.get("bytes_accessed", 0) or 0)
        rec["flops"] += int(a.get("model_flops", 0) or 0)
    return agg


def report(agg, top: int = 25, hbm_gbps: float = 819.0,
           peak_tflops: float = 394.0) -> str:
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["dur_us"])
    total_us = sum(r["dur_us"] for _, r in rows)
    total_bytes = sum(r["bytes"] for _, r in rows)
    total_flops = sum(r["flops"] for _, r in rows)

    lines = [
        f"total device time {total_us / 1e3:.1f} ms | "
        f"traffic {total_bytes / 1e9:.1f} GB "
        f"(roofline {total_bytes / hbm_gbps / 1e6:.1f} ms @ {hbm_gbps:.0f} "
        f"GB/s => {total_bytes / hbm_gbps / 1e3 / total_us * 100:.0f}% of "
        f"HBM peak) | {total_flops / 1e12:.2f} TFLOP "
        f"({total_flops / total_us / 1e6:.1f} TFLOP/s, "
        f"{total_flops / total_us / 1e6 / peak_tflops * 100:.1f}% of MXU "
        "peak)",
        f"{'ms':>9} {'%bw':>5} {'%mxu':>5} {'GB':>7} {'calls':>5}  op",
    ]
    for name, r in rows[:top]:
        dur_s = r["dur_us"] / 1e6
        bw = r["bytes"] / dur_s / 1e9 / hbm_gbps * 100 if dur_s else 0.0
        fl = r["flops"] / dur_s / 1e12 / peak_tflops * 100 if dur_s else 0.0
        lines.append(
            f"{r['dur_us'] / 1e3:9.2f} {bw:5.0f} {fl:5.1f} "
            f"{r['bytes'] / 1e9:7.2f} {r['calls']:5d}  "
            f"[{r['category']}] {name[:70]}")
    by_cat = collections.Counter()
    cat_bytes = collections.Counter()
    for _, r in agg.items():
        by_cat[r["category"]] += r["dur_us"]
        cat_bytes[r["category"]] += r["bytes"]
    lines.append("--- by category: ms (achieved %bw) ---")
    for c, d in by_cat.most_common():
        bw = cat_bytes[c] / (d / 1e6) / 1e9 / hbm_gbps * 100 if d else 0.0
        lines.append(f"{d / 1e3:9.2f} ({bw:3.0f}%)  {c}")
    return "\n".join(lines)


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("trace_dir", None, "jax.profiler trace directory.")
    flags.DEFINE_integer("top", 25, "Rows to print.")
    flags.DEFINE_float("hbm_gbps", 819.0, "HBM peak bandwidth (GB/s).")
    flags.DEFINE_float("peak_tflops", 394.0, "bf16 peak (TFLOP/s).")
    flags.mark_flags_as_required(["trace_dir"])
    FLAGS = flags.FLAGS

    def run(_):
        agg = aggregate(load_device_events(FLAGS.trace_dir))
        print(report(agg, FLAGS.top, FLAGS.hbm_gbps, FLAGS.peak_tflops))

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
