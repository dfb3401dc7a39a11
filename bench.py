"""Benchmark: X3D family clips/sec/chip, train + infer, on real hardware.

Prints exactly ONE JSON line on stdout: {"metric": ..., "value": N,
"unit": ..., "vs_baseline": N, "variants": {...}} — no matter how the
process ends (BENCH_r04 lesson: a run that outgrows the driver budget must
still leave an artifact).  Three mechanisms guarantee that:

* cumulative result-so-far lines go to STDERR after every completed stage
  (human/debug trail; stdout stays single-line for strict parsers);
* a SIGTERM/SIGINT handler prints the latest complete result to stdout and
  exits 0 if the driver's `timeout` fires first;
* a daemon watchdog thread does the same at a hard deadline
  (``X3D_BENCH_HARD_S``) — it runs even while the main thread is blocked
  inside a GIL-releasing tunnel compile, which is exactly where a SIGTERM
  handler cannot run.  If NO stage has completed by then (observed: the
  axon tunnel can hang a first compile indefinitely — a 256^2 matmul probe
  did not return in 120 s during round 5), it emits an explicit error
  artifact ({"value": 0.0, "error": ...}) so the driver records a parseable
  outage instead of a bare rc=124.

The headline metric stays X3D-M (16x224^2, the reference's flagship),
which is why M runs FIRST (and M's serving-latency probe SECOND, so the
headline "latency_ms" survives an early cutoff); "variants" carries the
XS/S/M/L/XL table so per-variant numbers are reproducible artifacts, not
commit-message prose.

Budget control
--------------
Wall-clock budget from env ``X3D_BENCH_BUDGET_S`` (default 900 s).  Before
each stage (a variant's train+infer, then per-variant serving-latency
probes, each an extra AOT + 2 loop-slope compiles over the remote tunnel),
the stage's cost estimate is checked against the remaining budget; stages
that do not fit are skipped and listed under "skipped".  Retries: one,
only for known-transient tunnel faults (see _TRANSIENT_SIGNATURES) —
deterministic failures re-raise immediately.

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
* serve_latency_ms_1video: one video's view ensemble through
  InferenceEngine at its auto-selected layout (<=16 clips folds —
  docs/PERF.md round 4), in-program loop-slope device time.

Baseline
--------
The reference publishes no throughput numbers (SURVEY.md §6).  BASELINE.md's
target is "exceed 4xV100 clips/sec on a v5e-8"; vs_baseline uses an
engineering estimate of 30 train clips/s per V100 for X3D-M (no official
number exists; stated explicitly so the ratio is interpretable).

Env knobs: X3D_BENCH_VARIANTS (comma list, e.g. "M" or "XS,M"),
X3D_BENCH_BUDGET_S (wall budget), X3D_BENCH_HARD_S (watchdog deadline,
default budget + 240), X3D_BENCH_LATENCY ("auto" = as budget allows,
"none", or a comma list), X3D_BENCH_TTA=1 (adds the L 3-crop-TTA
datapoint — an extra model compile; off by default since round 5).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

BASELINE_TRAIN_CLIPS_PER_SEC_PER_CHIP = 30.0

# L/XL: 312^2, time-folded layout + no remat (see bench_variant); batch 16
# is the HBM frontier (L B32 no-remat folded OOMs by 0.2 GB; B24 adds no
# throughput — full lanes either way at B*T >= 256).
TRAIN_BATCH = {"XS": 128, "S": 128, "M": 128, "L": 16, "XL": 16}
TRAIN_STEPS = {"XS": 30, "S": 30, "M": 30, "L": 10, "XL": 10}

# Headline (M) first: if the budget dies early the artifact still carries
# the north-star number.
VARIANT_ORDER = ["M", "XS", "S", "L", "XL"]

# Conservative wall-cost estimates per stage (seconds), dominated by
# remote-tunnel XLA compiles (~30-60 s each; train step + chained eval =
# 2 programs, latency probe = 1 AOT + 2 loop-slope programs).  Used only
# for skip decisions — actual elapsed time drives the budget.
EST_VARIANT_S = {"XS": 150, "S": 180, "M": 280, "L": 260, "XL": 280}
EST_LATENCY_S = 160
EST_TTA_S = 200

_TRANSIENT_SIGNATURES = (
    "response body closed",       # tunnel dropped a remote-compile response
    "connection reset",
    "broken pipe",
    "socket closed",
    "unavailable",
    "deadline exceeded",
)


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

    return {
        "train_clips_per_sec_per_chip": round(train_cps, 2),
        "infer_clips_per_sec_per_chip": round(infer_cps, 2),
        "train_step_ms": round(train_dt * 1e3, 2),
        "infer_step_ms": round(infer_dt * 1e3, 2),
        "train_batch": train_batch,
        "input": f"{T}x{S}^2",
        "views": views,
    }


def bench_latency(name: str) -> float:
    """Serving latency: ONE video's view ensemble through InferenceEngine
    at its auto-selected layout (clips<=16 folds — the measured winner,
    tools/bench_serving + docs/PERF.md round 4).  Loop-slope device time:
    the number a latency SLO is written against.

    Probe ORDER matters: a probe run at the END of the full bench
    overstates latency (round 5: XS 2.12 ms vs 0.97 standalone, L 18.98
    vs 8.73, XL 25.85 vs 14.6), while probes run right after their own
    variant's stage matched the standalone tool (M 17.28 vs 17.2, S 7.86
    vs 7.9) — so the caller interleaves each probe after its variant.  A
    fresh-subprocess probe is NOT an option: a second JAX client on the
    axon tunnel while the parent holds one hangs (round 5: 480 s timeout).
    """
    from x3d_tpu import variant_config
    from x3d_tpu.serving import InferenceEngine
    from x3d_tpu.tools.bench_serving import _BASE_ITERS

    engine = InferenceEngine.random_init(variant_config(name), max_videos=1)
    return engine.device_latency_s(iters=_BASE_ITERS.get(name, 16))


def bench_tta_l() -> dict:
    """3-crop TTA datapoint: the L YAML's commented alternative protocol
    (X3D_L.yaml TEST comments: TEST_CROP_SIZE 356, NUM_SPATIAL_CROPS 3
    -> 3x3 = 9 views/video); crop geometry parity is pinned bit-exact by
    tests/test_ref_pipeline_parity.py at this size.  16 videos = 144
    clips at 356^2 ~= the measured-safe 192-clip 312^2 footprint."""
    import functools

    import jax
    import jax.numpy as jnp

    from x3d_tpu import variant_config
    from x3d_tpu.models import create_model
    from x3d_tpu.train import (create_train_state, make_eval_step)
    from x3d_tpu.utils import tpu_compiler_options

    cfg = variant_config("L")
    cfg.DATA.TEST_CROP_SIZE = 356
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    model = create_model(cfg, dtype=jnp.bfloat16, remat=False)
    key = jax.random.PRNGKey(0)
    T = cfg.DATA.TEMP_DURATION
    n_videos = 16
    video = jax.random.normal(key, (n_videos * views, T, 356, 356, 3),
                              jnp.bfloat16)
    label = jnp.zeros((n_videos,), jnp.int32)
    sample = jnp.zeros((2, T, 32, 32, 3), jnp.bfloat16)
    state = create_train_state(cfg, model, key, sample, steps_per_epoch=1000)
    eval_step = make_eval_step(model)

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def chained(st, x, lab):
        out = eval_step(st, {"video": x, "label": lab})
        lab, _ = jax.lax.optimization_barrier((lab, out["loss_sum"]))
        return lab, out

    lab, out = chained(state, video, label)
    _fetch_scalar(out["loss_sum"])
    steps = TRAIN_STEPS["L"]
    t0 = time.perf_counter()
    for _ in range(steps):
        lab, out = chained(state, video, lab)
    _fetch_scalar(out["loss_sum"])
    dt = (time.perf_counter() - t0) / steps
    return {
        "tta_infer_clips_per_sec_per_chip": round(n_videos * views / dt, 2),
        "tta_protocol": f"3x3 views, {T}x356^2",
    }


def _is_transient(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}".lower()
    return any(sig in msg for sig in _TRANSIENT_SIGNATURES)


def run_with_retry(fn, label: str):
    """One retry, only for known-transient tunnel faults (the axon tunnel
    occasionally drops a remote-compile response mid-read — 'response body
    closed before all bytes were read').  Deterministic failures (shape
    errors, OOM, assertions) re-raise immediately so the real traceback
    survives and no budget is burned re-running a genuine bug."""
    import sys
    import traceback

    try:
        return fn()
    except Exception as e:
        if not _is_transient(e):
            raise
        traceback.print_exc(file=sys.stderr)
        print(f"{label}: transient tunnel fault; one retry", file=sys.stderr)
        return fn()


class _Budget:
    def __init__(self, total_s: float):
        self.t0 = time.monotonic()
        self.total = total_s
        self.skipped = []

    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def admit(self, label: str, est_s: float) -> bool:
        if self.elapsed() + est_s <= self.total:
            return True
        self.skipped.append(label)
        return False


class _Reporter:
    """Exactly one JSON line on stdout, however the process ends.

    ``update`` records the latest complete result and prints it to stderr
    (the debug trail); ``finalize`` prints it to stdout once.  Normal
    completion, the SIGTERM handler, and the watchdog thread all funnel
    through ``finalize`` — the lock + flag make the stdout write
    idempotent."""

    def __init__(self):
        self._latest = None
        self._lock = threading.Lock()
        self._done = False

    def update(self, result: dict) -> None:
        with self._lock:
            self._latest = result
        print(json.dumps(result), file=sys.stderr, flush=True)

    def finalize(self, note: str | None = None) -> bool:
        with self._lock:
            if self._done or self._latest is None:
                return False
            self._done = True
            if note:
                self._latest = dict(self._latest, cut_short=note)
            print(json.dumps(self._latest), flush=True)
            return True

    def finalize_empty(self, error: str) -> bool:
        """No stage ever completed: emit an explicit outage artifact —
        value 0.0 is honest ('no throughput could be measured') and keeps
        the line schema-compatible for the driver."""
        with self._lock:
            if self._done:
                return False
            if self._latest is not None:
                return False  # caller should use finalize()
            self._done = True
            print(json.dumps({
                "metric": "x3d_m_train_clips_per_sec_per_chip",
                "value": 0.0,
                "unit": "clips/s/chip (train)",
                "vs_baseline": 0.0,
                "error": error,
            }), flush=True)
            return True


def _install_backstops(reporter: _Reporter, hard_deadline_s: float) -> None:
    """SIGTERM/SIGINT handler + watchdog daemon thread.

    The watchdog matters because Python signal handlers only run in the
    main thread between bytecode ops — a driver `timeout` SIGTERM landing
    while the main thread is blocked inside a tunnel XLA compile (a
    GIL-releasing C call that can take minutes) would never execute.  The
    daemon thread runs regardless and force-exits after flushing the
    latest result."""

    def on_signal(signum, frame):
        if not reporter.finalize(note=f"signal {signum}"):
            reporter.finalize_empty(
                f"killed by signal {signum} before any stage completed")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, on_signal)

    t0 = time.monotonic()

    def watchdog():
        while True:
            remaining = hard_deadline_s - (time.monotonic() - t0)
            if remaining <= 0:
                break
            time.sleep(min(remaining, 5.0))
        done = reporter.finalize(note="watchdog deadline")
        if not done:
            # Nothing completed in hard_deadline_s: the tunnel is hung
            # (a healthy first M stage takes ~2-4 min).  An explicit
            # outage line beats a bare timeout with empty stdout.
            done = reporter.finalize_empty(
                f"no stage completed within {hard_deadline_s:.0f}s — "
                "TPU tunnel unresponsive")
        if done:
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()


def main() -> None:
    # Backstops FIRST: jax.default_backend() below initialises the axon
    # tunnel backend, which can hang indefinitely when the tunnel is down
    # (observed round 5: even jax.devices() blocked >300 s).  The watchdog
    # must already be armed so that failure mode leaves an explicit outage
    # artifact instead of an empty rc=124.
    budget = _Budget(float(os.environ.get("X3D_BENCH_BUDGET_S", "900")))
    hard_s = float(os.environ.get("X3D_BENCH_HARD_S", str(budget.total + 240)))
    reporter = _Reporter()
    _install_backstops(reporter, hard_s)

    from x3d_tpu.utils import enable_compilation_cache
    enable_compilation_cache()   # reruns skip the tunnel compiles entirely

    import jax

    backend = jax.default_backend()
    on_accel = backend in ("tpu", "gpu")
    n_chips = jax.device_count()

    names = os.environ.get("X3D_BENCH_VARIANTS", "").strip()
    if names:
        variant_names = [v.strip().upper() for v in names.split(",")]
    elif on_accel:
        variant_names = list(VARIANT_ORDER)
    else:
        variant_names = ["M"]   # CPU smoke: one variant at tiny shapes
    lat_spec = os.environ.get("X3D_BENCH_LATENCY", "auto").strip().lower()
    if lat_spec == "auto":
        latency_names = list(variant_names)
    elif lat_spec in ("none", "0", ""):
        latency_names = []
    else:
        latency_names = [v.strip().upper() for v in lat_spec.split(",")]

    variants = {}
    dtype_name = "bfloat16" if on_accel else "float32"

    def emit():
        m = variants.get("M") or next(iter(variants.values()))
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
            # device p50 for one video's full view ensemble (serving SLO)
            "latency_ms": m.get("serve_latency_ms_1video"),
            "latency_note": (
                "measured inside a cache-warm process: XS/L/XL read ~1.8x "
                "above the standalone cache-less tools/bench_serving "
                "values (docs/PERF.md round 5); M/S are regime-invariant"),
            "train_step_ms": m["train_step_ms"],
            "infer_step_ms": m["infer_step_ms"],
            "train_batch": m["train_batch"],
            "chips": n_chips,
            "elapsed_s": round(budget.elapsed(), 1),
            "skipped": list(budget.skipped),
            "variants": variants,
        }
        reporter.update(result)

    def run_variant(name: str) -> None:
        variants[name] = run_with_retry(
            lambda: bench_variant(name, on_accel), f"bench_variant({name})")
        emit()

    def run_latency(name: str) -> None:
        lat_s = run_with_retry(lambda: bench_latency(name),
                               f"bench_latency({name})")
        variants[name]["serve_latency_ms_1video"] = round(lat_s * 1e3, 2)
        emit()

    # Stage order puts the headline's two numbers first: M train+infer,
    # then M's latency probe, then the rest of the table with each
    # variant's latency probe RIGHT AFTER its own stage (end-of-run
    # probes overstate latency — see bench_latency).  The first variant
    # always runs unconditionally (an empty artifact is worse than an
    # overrun).
    try:
        first, rest = variant_names[0], variant_names[1:]
        run_variant(first)
        if on_accel and first in latency_names and budget.admit(
                f"latency:{first}", EST_LATENCY_S):
            run_latency(first)
        for name in rest:
            if not on_accel or budget.admit(f"variant:{name}",
                                            EST_VARIANT_S.get(name, 280)):
                run_variant(name)
                if on_accel and name in latency_names and budget.admit(
                        f"latency:{name}", EST_LATENCY_S):
                    run_latency(name)

        # optional L 3-crop TTA datapoint
        if (on_accel and os.environ.get("X3D_BENCH_TTA") == "1"
                and "L" in variants and budget.admit("tta:L", EST_TTA_S)):
            variants["L"].update(run_with_retry(bench_tta_l, "bench_tta_l"))
            emit()
    except BaseException as e:
        # Leave an artifact (completed stages, or an explicit error line)
        # before the traceback/exit-code reports the failure.
        if not reporter.finalize(note=f"aborted: {type(e).__name__}: {e}"):
            reporter.finalize_empty(f"{type(e).__name__}: {e}")
        raise

    if variants:
        emit()   # refresh: admit() skips recorded after the last stage emit
    reporter.finalize()


if __name__ == "__main__":
    main()
