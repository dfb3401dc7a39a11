"""TFRecord inspector CLI (reference ``datasets/inspect_tfrecord.py``):
round-trip samples through the real input pipeline and write watchable GIFs.

    python -m x3d_tpu.tools.inspect_tfrecords \
        --cfg=x3d_tpu/configs/kinetics/X3D_M.yaml \
        --file_pattern='/data/train-*.tfrecord' --output_dir=/tmp/inspect
"""

from __future__ import annotations

import logging

from absl import app, flags

flags.DEFINE_string("cfg", None, "Config yaml.")
flags.DEFINE_string("file_pattern", None, "TFRecord pattern.")
flags.DEFINE_string("output_dir", None, "Where to write GIFs.")
flags.DEFINE_integer("num_samples", 4, "Samples to dump.")
flags.DEFINE_bool("training", True, "Use the training transform path.")

flags.mark_flags_as_required(["cfg", "file_pattern", "output_dir"])
FLAGS = flags.FLAGS


def main(_):
    logging.basicConfig(level=logging.INFO)
    from x3d_tpu.data.tfrecords import inspect_tfrecords
    from x3d_tpu.tools.common import load_config

    cfg = load_config(FLAGS.cfg)
    paths = inspect_tfrecords(cfg, FLAGS.file_pattern, FLAGS.output_dir,
                              num_samples=FLAGS.num_samples,
                              is_training=FLAGS.training)
    for p in paths:
        logging.info("wrote %s", p)


if __name__ == "__main__":
    app.run(main)
