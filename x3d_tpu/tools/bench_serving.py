"""Serving-latency benchmark: per-request p50 through InferenceEngine.

The reference's only inference surface is batch ``model.evaluate``
(``/root/reference/eval.py:83-89``); it never reports latency.  Serving a
video-classification model in production is latency-shaped: ONE video
arrives, its view ensemble (10x1 clips for XS/S/M, 3x1 for L/XL — the
YAML TEST blocks) must come back inside an SLO.  This tool measures that
per-request device time per variant, at request sizes of 1..N videos, in
both activation layouts (unfolded vs time-folded), and prints one JSON
line per combination.

Two numbers per combination:
  * ``device_ms`` — loop-slope device execution time (``ops/timing.py``):
    the per-dispatch tunnel noise (2-40 ms on this container) cancels.
    This is the SLO-relevant forward time.
  * ``wall_ms`` — median wall-clock through the AOT executable including
    dispatch + result fetch, as a sanity upper bound (tunnel-dominated
    here; a colocated production host would sit between the two).

    python -m x3d_tpu.tools.bench_serving --variants=M,L --videos=1,4 \
        [--fold=both] [--iters=8]
"""

from __future__ import annotations

import json


# Loop-slope chain length per variant at 1 video: long enough that the
# slope (t_2K - t_K) clears the few-ms program-launch noise for sub-ms
# forwards; scaled down as the request grows.  (XS 1-video at the default
# K=8 measured 0.0 ms — pure noise.)
_BASE_ITERS = {"XS": 128, "S": 64, "M": 32, "L": 16, "XL": 12}


def bench_one(variant: str, n_videos: int, fold, iters: int,
              wall_samples: int) -> dict:
    import jax.numpy as jnp

    from x3d_tpu import variant_config
    from x3d_tpu.serving import InferenceEngine

    cfg = variant_config(variant)
    # pin the layout explicitly (None would engage the engine's measured
    # auto rule — this tool is what produces that rule's data)
    engine = InferenceEngine.random_init(cfg, max_videos=n_videos,
                                         time_fold=fold)
    if iters <= 0:
        iters = max(4, _BASE_ITERS.get(variant, 16) // n_videos)
    device_s = engine.device_latency_s(iters=iters)
    wall_s = engine.wall_latency_s(samples=wall_samples)
    views = engine.views
    return {
        "variant": variant,
        "videos": n_videos,
        "views": views,
        "clips": n_videos * views,
        # report the engine's RESOLVED layout (fold=None = the auto rule)
        "fold": (engine.layout if isinstance(engine.layout, str)
                 else bool(engine.layout)),
        "input": (f"{n_videos * views}x{cfg.DATA.TEMP_DURATION}"
                  f"x{cfg.DATA.TEST_CROP_SIZE}^2"),
        "device_ms": round(device_s * 1e3, 2),
        "wall_ms": round(wall_s * 1e3, 2),
        "device_clips_per_sec": round(n_videos * views / device_s, 1),
    }


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("variants", "XS,S,M,L,XL",
                        "Comma-separated variant names.")
    flags.DEFINE_string("videos", "1,4", "Request sizes in videos.")
    flags.DEFINE_string("fold", "both",
                        "Layout: both/on/off/mixed/all (time-folded vs "
                        "unfolded vs half-folded trunk), or auto (the "
                        "engine's measured <=16-clip fold rule — what "
                        "production gets).")
    flags.DEFINE_integer("iters", 0,
                         "Loop-slope chain length (0 = per-variant auto).")
    flags.DEFINE_integer("wall_samples", 20, "Wall-clock sample count.")
    FLAGS = flags.FLAGS

    def run(_):
        folds = {"both": (False, True), "on": (True,), "off": (False,),
                 "mixed": ("mixed",), "auto": (None,),
                 "all": (False, True, "mixed")}[FLAGS.fold.lower()]
        for v in [s.strip().upper() for s in FLAGS.variants.split(",")]:
            for n in [int(s) for s in FLAGS.videos.split(",")]:
                for fold in folds:
                    r = bench_one(v, n, fold, FLAGS.iters,
                                  FLAGS.wall_samples)
                    print(json.dumps(r), flush=True)

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
