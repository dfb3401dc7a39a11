"""Offline TFRecord writer CLI (reference ``datasets/create_tfrecords.py``).

    python -m x3d_tpu.tools.create_tfrecords \
        --label_file=train.txt --output_dir=/data/tfrecords --prefix=train
"""

from __future__ import annotations

import logging

from absl import app, flags

flags.DEFINE_string("label_file", None,
                    'Text file of "<video path> <label>" lines.')
flags.DEFINE_string("output_dir", None, "Directory for TFRecord shards.")
flags.DEFINE_string("prefix", "train", "Shard filename prefix.")
flags.DEFINE_integer("videos_per_record", 32, "Videos per shard.")
flags.DEFINE_integer("num_workers", 0, "Worker processes (0 = cpu_count-1).")
flags.DEFINE_integer("fps", 25, "Assumed FPS for the first-10s trim.")

flags.mark_flags_as_required(["label_file", "output_dir"])
FLAGS = flags.FLAGS


def main(_):
    logging.basicConfig(level=logging.INFO)
    from x3d_tpu.data.tfrecords import create_tfrecords

    pairs = []
    with open(FLAGS.label_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            path, label = line.rsplit(" ", 1)
            pairs.append((path, int(label)))
    shards = create_tfrecords(
        pairs, FLAGS.output_dir, prefix=FLAGS.prefix,
        videos_per_record=FLAGS.videos_per_record,
        num_workers=FLAGS.num_workers or None, fps_default=FLAGS.fps)
    logging.info("wrote %d shards", len(shards))


if __name__ == "__main__":
    app.run(main)
