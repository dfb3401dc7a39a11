"""Prediction CLI: serve a trained checkpoint over TFRecords (or synthetic).

    python -m x3d_tpu.tools.predict --cfg=... --model_folder=/tmp/x3d_m \
        --file_pattern='/data/val-*.tfrecord' --max_batches=10

Emits one JSON line per video: {"label": ..., "top": [...], "probs": [...]}.
"""

from __future__ import annotations

import json
import logging

from absl import app, flags

flags.DEFINE_string("cfg", None, "Config yaml.")
flags.DEFINE_string("model_folder", None, "Train-CLI output directory.")
flags.DEFINE_string("file_pattern", None, "TFRecord pattern (eval protocol).")
flags.DEFINE_bool("synthetic", False, "Predict on random clips (smoke).")
flags.DEFINE_integer("max_batches", None, "Cap batches.")
flags.DEFINE_integer("batch_videos", 4, "Videos per request.")
flags.DEFINE_integer("k", 5, "Top-k to report.")
flags.DEFINE_multi_string("opts", [], "Config overrides: KEY VALUE pairs.")

flags.mark_flags_as_required(["cfg", "model_folder"])
FLAGS = flags.FLAGS


def main(_):
    logging.basicConfig(level=logging.WARNING)
    import itertools

    import numpy as np

    from x3d_tpu.serving import InferenceEngine
    from x3d_tpu.tools.common import load_config

    cfg = load_config(FLAGS.cfg, FLAGS.opts)
    engine = InferenceEngine.from_checkpoint(
        cfg, FLAGS.model_folder, max_videos=FLAGS.batch_videos)

    if FLAGS.synthetic:
        rng = np.random.RandomState(0)
        batches = (
            {"video": rng.randint(0, 255, engine.clip_shape, np.uint8),
             "label": np.full((FLAGS.batch_videos,), -1)}
            for _ in range(FLAGS.max_batches or 2)
        )
    else:
        from x3d_tpu.data import InputReader

        reader = InputReader(cfg, is_training=False, use_tfrecord=True)
        batches = reader.as_numpy(FLAGS.file_pattern, FLAGS.batch_videos)
        if FLAGS.max_batches:
            batches = itertools.islice(batches, FLAGS.max_batches)

    for batch in batches:
        idx, p = engine.top_k(batch["video"], k=FLAGS.k)
        for label, top, probs in zip(batch["label"], idx, p):
            print(json.dumps({
                "label": int(label),
                "top": [int(t) for t in top],
                "probs": [round(float(x), 5) for x in probs],
            }))


if __name__ == "__main__":
    app.run(main)
