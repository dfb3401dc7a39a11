"""Benchmark: X3D family clips/sec/chip, train + infer, on real hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"variants": {...}}.  The headline metric stays X3D-M (16x224^2, the
reference's flagship); "variants" carries the full XS/S/M/L/XL table so the
per-variant numbers are reproducible artifacts, not commit-message prose.

Timing methodology (important on this host)
-------------------------------------------
The TPU here is reached through a remote-execution tunnel where
``jax.block_until_ready`` returns at enqueue time, not completion
(measured: a chained 8192^3 matmul loop "finished" at 26 PFLOP/s).  Honest
timing therefore requires (a) a data dependency chaining step i+1 to step i,
and (b) a device->host scalar fetch of a value that depends on the last
step, with the fetch round-trip (~30 ms) amortized over the step count.
Calibration with a known-FLOPs matmul gives 155 TFLOP/s ≈ 78% of v5e bf16
peak — sane.

Protocol
--------
* per variant: the exact configs/kinetics YAML settings (params 3.79M
  XS/S/M, 6.21M L, 11.18M XL).
* train: full training step (CE + L2 loss, BN stats update, SGD-nesterov,
  dropout, remat policy "auto" = 312^2 only) on synthetic device-resident
  data, bf16 compute.  Batch: 128 (XS/S/M), 16 (L/XL at 312^2).
* infer: multi-view eval forward (softmax + view averaging) at each
  variant's YAML protocol (10 temporal views x 1 center crop XS/S/M,
  3 temporal views x 1 crop L/XL — configs/kinetics/X3D_L.yaml TEST).

Baseline
--------
The reference publishes no throughput numbers (SURVEY.md §6).  BASELINE.md's
target is "exceed 4xV100 clips/sec on a v5e-8"; vs_baseline uses an
engineering estimate of 30 train clips/s per V100 for X3D-M (no official
number exists; stated explicitly so the ratio is interpretable).

Set X3D_BENCH_VARIANTS (comma-separated, e.g. "M" or "XS,M") to restrict.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_TRAIN_CLIPS_PER_SEC_PER_CHIP = 30.0

# L/XL: 312^2, time-folded layout + no remat (see bench_variant); batch 16
# is the HBM frontier (L B32 no-remat folded OOMs by 0.2 GB; B24 adds no
# throughput — full lanes either way at B*T >= 256).
TRAIN_BATCH = {"XS": 128, "S": 128, "M": 128, "L": 16, "XL": 16}
TRAIN_STEPS = {"XS": 30, "S": 30, "M": 30, "L": 10, "XL": 10}


def _fetch_scalar(x) -> float:
    """Device->host fetch; the only trustworthy sync point on this host."""
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def bench_variant(name: str, on_accel: bool) -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    from x3d_tpu import variant_config
    from x3d_tpu.models import create_model
    from x3d_tpu.train import (create_train_state, make_eval_step,
                               make_train_step)
    from x3d_tpu.utils import tpu_compiler_options

    cfg = variant_config(name)
    if not on_accel:  # CPU smoke fallback: tiny shapes, same code path
        cfg.DATA.TEMP_DURATION = 4
        cfg.DATA.TRAIN_CROP_SIZE = 64
        cfg.DATA.TEST_CROP_SIZE = 64

    dtype = jnp.bfloat16 if on_accel else jnp.float32
    # L/XL (312^2, batch 16): the time-folded layout (TPU.TIME_FOLD auto)
    # shrinks activations enough that no-remat fits (11.74 / 14.96 GB
    # compiled) and beats block remat by ~27% — L 34.5->49.7, XL
    # 27.6->33.7 clips/s (tools/ab, docs/PERF.md round 3).
    remat = False if (on_accel and name in ("L", "XL")) else None
    model = create_model(cfg, dtype=dtype, remat=remat)
    key = jax.random.PRNGKey(0)

    T, S = cfg.DATA.TEMP_DURATION, cfg.DATA.TRAIN_CROP_SIZE
    train_batch = TRAIN_BATCH[name] if on_accel else 2
    steps = TRAIN_STEPS[name] if on_accel else 3
    video = jax.random.normal(key, (train_batch, T, S, S, 3), dtype=dtype)
    label = jnp.arange(train_batch) % cfg.NETWORK.NUM_CLASSES
    batch = {"video": video, "label": label}

    state = create_train_state(cfg, model, key, video, steps_per_epoch=1000)
    train_step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY),
                         compiler_options=tpu_compiler_options())

    # warmup / compile; the scalar fetch round-trip amortizes over steps
    state, metrics = train_step(state, batch, key)
    _fetch_scalar(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, batch, key)  # state chains steps
    _fetch_scalar(metrics["loss"])  # depends on the full chain
    train_dt = (time.perf_counter() - t0) / steps
    train_cps = train_batch / train_dt

    # inference: eval protocol batch (views folded into batch dim), always
    # unfolded (the auto time-fold gate is train-only; folded eval loses —
    # docs/PERF.md round 3).  64 videos/batch for the 160/224-px variants:
    # throughput scales past the dispatch floor up to ~640 clips
    # (1089 -> 1537 clips/s on X3D-M); 960 clips OOM.  312^2 eval has no
    # backward pressure and scales likewise: L 64 videos (192 clips,
    # 11.8 GB) 344 clips/s vs 246 at 16 videos (96 videos OOM); XL peaks
    # at 32 videos (96 clips, 7.6 GB) 220 clips/s — 48 videos still fits
    # (14.5 GB) but the near-OOM schedule regresses to 183 (docs/PERF.md).
    del video, batch   # free the train buffers before the big eval batch
    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    # Unknown variant names (X3D_BENCH_VARIANTS) fall back on crop size,
    # not a blanket 64: a 312^2 eval batch of 64 videos OOMs for XL-class
    # models.
    default_videos = 16 if cfg.DATA.TEST_CROP_SIZE >= 312 else 64
    eval_videos = {"L": 64, "XL": 32}.get(name, default_videos)
    infer_videos = (eval_videos if views <= 10 else 4) if on_accel else 1
    Se = cfg.DATA.TEST_CROP_SIZE
    evideo = jax.random.normal(key, (infer_videos * views, T, Se, Se, 3),
                               dtype=dtype)
    elabel = jnp.zeros((infer_videos,), jnp.int32)
    eval_step = make_eval_step(model)

    # steps chain through the tiny label tensor (a data dependency on the
    # previous step's output) so they cannot overlap; the optimization
    # barrier makes the dependency un-foldable (a `* 0` chain could be
    # algebraically simplified away).  Chaining through the video would
    # double its multi-GB buffer.
    def make_chained(step_fn):
        @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
        def chained(st, x, lab):
            out = step_fn(st, {"video": x, "label": lab})
            lab, _ = jax.lax.optimization_barrier((lab, out["loss_sum"]))
            return lab, out
        return chained

    def time_eval(chained, x, lab, n_steps):
        lab, out = chained(state, x, lab)
        _fetch_scalar(out["loss_sum"])
        t0 = time.perf_counter()
        for _ in range(n_steps):
            lab, out = chained(state, x, lab)
        _fetch_scalar(out["loss_sum"])
        return (time.perf_counter() - t0) / n_steps

    infer_dt = time_eval(make_chained(eval_step), evideo, elabel, steps)
    infer_cps = infer_videos * views / infer_dt

    result = {
        "train_clips_per_sec_per_chip": round(train_cps, 2),
        "infer_clips_per_sec_per_chip": round(infer_cps, 2),
        "train_step_ms": round(train_dt * 1e3, 2),
        "infer_step_ms": round(infer_dt * 1e3, 2),
        "train_batch": train_batch,
        "input": f"{T}x{S}^2",
        "views": views,
    }

    # 3-crop TTA datapoint: the L YAML's commented alternative protocol
    # (X3D_L.yaml TEST comments: TEST_CROP_SIZE 356, NUM_SPATIAL_CROPS 3
    # -> 3x3 = 9 views/video); crop geometry parity is pinned bit-exact by
    # tests/test_ref_pipeline_parity.py at this size.  16 videos = 144
    # clips at 356^2 ~= the measured-safe 192-clip 312^2 footprint.
    if name == "L" and on_accel:
        del evideo
        tta_cfg = variant_config(name)
        tta_cfg.DATA.TEST_CROP_SIZE = 356
        tta_cfg.TEST.NUM_SPATIAL_CROPS = 3
        tta_views = (tta_cfg.TEST.NUM_TEMPORAL_VIEWS
                     * tta_cfg.TEST.NUM_SPATIAL_CROPS)
        tta_model = create_model(tta_cfg, dtype=dtype, remat=remat)
        tta_videos = 16
        tvideo = jax.random.normal(
            key, (tta_videos * tta_views, T, 356, 356, 3), dtype=dtype)
        tlabel = jnp.zeros((tta_videos,), jnp.int32)
        tta_dt = time_eval(make_chained(make_eval_step(tta_model)),
                           tvideo, tlabel, steps)
        result["tta_infer_clips_per_sec_per_chip"] = round(
            tta_videos * tta_views / tta_dt, 2)
        result["tta_protocol"] = f"3x3 views, {T}x356^2"
        del tvideo

    # Serving latency: ONE video's view ensemble through InferenceEngine
    # at its auto-selected layout (clips<=16 folds — the measured winner,
    # tools/bench_serving + docs/PERF.md round 4).  Loop-slope device
    # time: the number a latency SLO is written against.
    if on_accel:
        from x3d_tpu.serving import InferenceEngine
        from x3d_tpu.tools.bench_serving import _BASE_ITERS

        engine = InferenceEngine.random_init(variant_config(name),
                                             max_videos=1)
        lat_s = engine.device_latency_s(iters=_BASE_ITERS.get(name, 16))
        result["serve_latency_ms_1video"] = round(lat_s * 1e3, 2)

    return result


def bench_variant_with_retry(name: str, on_accel: bool, tries: int = 3):
    """The axon tunnel occasionally drops a remote-compile response mid-read
    (observed: 'response body closed before all bytes were read' killing a
    5-variant run on its FIRST latency probe).  Such faults are transient
    process-external I/O, not measurement noise — retry the whole variant
    so one flake doesn't erase the table."""
    import sys
    import traceback

    for attempt in range(tries):
        try:
            return bench_variant(name, on_accel)
        except Exception:
            if attempt == tries - 1:
                raise
            traceback.print_exc(file=sys.stderr)
            print(f"bench_variant({name}) attempt {attempt + 1} failed; "
                  "retrying after transient runtime error", file=sys.stderr)
            time.sleep(10 * (attempt + 1))


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_accel = backend in ("tpu", "gpu")
    n_chips = jax.device_count()

    names = os.environ.get("X3D_BENCH_VARIANTS", "").strip()
    if names:
        variant_names = [v.strip().upper() for v in names.split(",")]
    elif on_accel:
        variant_names = ["XS", "S", "M", "L", "XL"]
    else:
        variant_names = ["M"]   # CPU smoke: one variant at tiny shapes

    variants = {}
    for name in variant_names:
        variants[name] = bench_variant_with_retry(name, on_accel)

    m = variants.get("M") or next(iter(variants.values()))
    dtype_name = "bfloat16" if on_accel else "float32"
    result = {
        "metric": "x3d_m_train_clips_per_sec_per_chip",
        "value": round(m["train_clips_per_sec_per_chip"] / n_chips, 2),
        "unit": (f"clips/s/chip (train, {m['input']}, {dtype_name}, "
                 f"{backend})"),
        "vs_baseline": round(
            m["train_clips_per_sec_per_chip"] / n_chips
            / BASELINE_TRAIN_CLIPS_PER_SEC_PER_CHIP, 3),
        "baseline_note": (
            "ratio vs an engineering ESTIMATE of 30 train clips/s per "
            "V100 (the reference publishes no throughput numbers); the "
            "defensible claim is the absolute per-chip table below"),
        "infer_clips_per_sec_per_chip": round(
            m["infer_clips_per_sec_per_chip"] / n_chips, 2),
        # device p50 for one video's full view ensemble (serving SLO shape)
        "latency_ms": m.get("serve_latency_ms_1video"),
        "train_step_ms": m["train_step_ms"],
        "infer_step_ms": m["infer_step_ms"],
        "train_batch": m["train_batch"],
        "chips": n_chips,
        "variants": variants,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
