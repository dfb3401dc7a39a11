"""Label-file generator CLI (reference ``datasets/create_label.py`` +
``datasets/kinetics400/create_label.py``).

Class-per-folder tree (train/val layout):

    python -m x3d_tpu.tools.create_label \
        --video_root=/data/kinetics/train --output=train.txt --sample_size=0

Flat Kinetics-400 test directory, labels resolved through the annotations
JSON and the vendored label map (``x3d_tpu/datasets/kinetics400/``):

    python -m x3d_tpu.tools.create_label \
        --video_root=/data/kinetics/test --output=test.txt \
        --test_json_file=/data/kinetics/test.json
"""

from __future__ import annotations

import logging

from absl import app, flags

flags.DEFINE_string("video_root", None,
                    "Root with one sub-directory per class (or a flat "
                    "directory when --test_json_file is given).")
flags.DEFINE_string("output", None, "Output label-file path.")
flags.DEFINE_integer("sample_size", 0,
                     "Cap videos per class (0 = unlimited).")
flags.DEFINE_string("path_to_label_map", None,
                    "Class->id JSON (default: the vendored Kinetics-400 "
                    "label map when --test_json_file is set, else the "
                    "sorted folder names).")
flags.DEFINE_string("test_json_file", None,
                    "Kinetics test annotations JSON: treat --video_root as "
                    "a flat directory of <youtube_id>.<ext> videos "
                    "(reference datasets/kinetics400/create_label.py).")

flags.mark_flags_as_required(["video_root", "output"])
FLAGS = flags.FLAGS


def main(_):
    logging.basicConfig(level=logging.INFO)
    import json

    from x3d_tpu.data.tfrecords import (create_label_file,
                                        create_test_label_file)

    label_map = None
    if FLAGS.path_to_label_map:
        with open(FLAGS.path_to_label_map) as f:
            label_map = json.load(f)

    if FLAGS.test_json_file:
        n = create_test_label_file(FLAGS.video_root, FLAGS.output,
                                   FLAGS.test_json_file, label_map=label_map)
    else:
        n = create_label_file(FLAGS.video_root, FLAGS.output,
                              label_map=label_map,
                              sample_size=FLAGS.sample_size or None)
    logging.info("wrote %d lines to %s", n, FLAGS.output)


if __name__ == "__main__":
    app.run(main)
