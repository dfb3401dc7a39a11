"""CLI entry points: python -m x3d_tpu.tools.train / .eval / .create_tfrecords ..."""
