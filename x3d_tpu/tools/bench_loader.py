"""Compare input-pipeline throughput: native C++ loader vs tf.data.

Writes synthetic TFRecord shards (JPEG frames at a chosen resolution),
then measures end-to-end host decode throughput of both pipelines with
identical sampling/transform settings.

    python -m x3d_tpu.tools.bench_loader --videos=64 --frames=64 \
        --height=240 --width=320 [--config=...yaml] [--batches=8]

``--step_rate`` sizes the loader against a training step rate (clips/s/
chip, e.g. the bench.py X3D-M figure): the tool prints per-thread decode
throughput and the host cores needed to keep the accelerator fed — the
loader's worker pool scales linearly in cores, so cores_needed =
step_rate / (clips/s/thread).  This is the measurement shape behind the
"input pipeline never the bottleneck" target (BASELINE.md): a production
TPU-VM host has tens to hundreds of cores against the single core of
this build container.
"""

from __future__ import annotations

import tempfile
import time


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("config", None, "Variant yaml (default X3D-M).")
    flags.DEFINE_integer("videos", 32, "Synthetic videos to write.")
    flags.DEFINE_integer("frames", 64, "Frames per video.")
    flags.DEFINE_integer("height", 240, "Frame height.")
    flags.DEFINE_integer("width", 320, "Frame width.")
    flags.DEFINE_integer("batch", 8, "Clips per batch.")
    flags.DEFINE_integer("batches", 8, "Batches to time per pipeline.")
    flags.DEFINE_integer("threads", 0, "Native worker threads (0 = auto).")
    flags.DEFINE_float("step_rate", 0.0,
                       "Training step rate (clips/s/chip) to size the "
                       "loader against; prints a JSON sizing line.")
    FLAGS = flags.FLAGS

    def run(_):
        import numpy as np

        from x3d_tpu import variant_config
        from x3d_tpu.data import native_loader
        from x3d_tpu.data.pipeline import InputReader
        from x3d_tpu.data.tfrecords import write_video_array_shards
        from x3d_tpu.tools.common import load_config

        cfg = (load_config(FLAGS.config) if FLAGS.config
               else variant_config("M"))

        d = tempfile.mkdtemp(prefix="bench_loader_")
        rng = np.random.default_rng(0)
        videos = [
            (rng.integers(0, 255,
                          (FLAGS.frames, FLAGS.height, FLAGS.width, 3),
                          dtype=np.uint8), i % 10)
            for i in range(FLAGS.videos)
        ]
        write_video_array_shards(videos, d, prefix="bench",
                                 videos_per_record=8)
        pattern = d + "/bench-*"
        n_clips = FLAGS.batch * FLAGS.batches

        def timed(name, iterator):
            # one warm-up batch first: covers graph build (tf.data) and
            # shuffle-buffer prefill (both pipelines), so the clocked
            # window measures steady-state decode throughput
            next(iterator)
            t0 = time.perf_counter()
            for i, batch in enumerate(iterator):
                assert batch["video"].dtype == np.uint8
                if i + 1 >= FLAGS.batches:
                    break
            dt = time.perf_counter() - t0
            print(f"{name:14s} {n_clips / dt:8.1f} clips/s "
                  f"({n_clips * cfg.DATA.TEMP_DURATION / dt:8.0f} "
                  f"frames decoded/s)")
            return n_clips / dt

        tf_reader = InputReader(cfg, is_training=True, use_tfrecord=True)
        tf_cps = timed("tf.data", tf_reader.as_numpy(pattern, FLAGS.batch))

        if native_loader.available():
            loader = native_loader.NativeClipLoader(
                cfg, is_training=True, seed=0,
                num_threads=FLAGS.threads or None)
            native_cps = timed("native C++",
                               iter(loader(pattern, FLAGS.batch)))
            print(f"native/tf.data: {native_cps / tf_cps:.2f}x")
            if FLAGS.step_rate:
                import json
                import os

                # per-thread rate: measured with a 1-thread pool so the
                # figure is a true per-core number even on a loaded host
                solo = native_loader.NativeClipLoader(
                    cfg, is_training=True, seed=0, num_threads=1)
                solo_cps = timed("native x1thr",
                                 iter(solo(pattern, FLAGS.batch)))
                print(json.dumps({
                    "native_clips_per_sec": round(native_cps, 1),
                    "native_clips_per_sec_per_thread": round(solo_cps, 1),
                    "step_rate_clips_per_sec": FLAGS.step_rate,
                    "cores_needed_for_step_rate":
                        round(FLAGS.step_rate / solo_cps, 1),
                    "host_cores": os.cpu_count(),
                }))
        else:
            print("native loader unavailable:",
                  native_loader.build_error())

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
