"""Label-file generator CLI (reference ``datasets/create_label.py`` +
``datasets/kinetics400/create_label.py``).

    python -m x3d_tpu.tools.create_label \
        --video_root=/data/kinetics/train --output=train.txt --sample_size=0
"""

from __future__ import annotations

import logging

from absl import app, flags

flags.DEFINE_string("video_root", None,
                    "Root with one sub-directory per class.")
flags.DEFINE_string("output", None, "Output label-file path.")
flags.DEFINE_integer("sample_size", 0,
                     "Cap videos per class (0 = unlimited).")

flags.mark_flags_as_required(["video_root", "output"])
FLAGS = flags.FLAGS


def main(_):
    logging.basicConfig(level=logging.INFO)
    from x3d_tpu.data.tfrecords import create_label_file

    n = create_label_file(FLAGS.video_root, FLAGS.output,
                          sample_size=FLAGS.sample_size or None)
    logging.info("wrote %d lines to %s", n, FLAGS.output)


if __name__ == "__main__":
    app.run(main)
