"""Host-side input pipeline (tf.data) + offline dataset tooling.

TensorFlow is imported lazily — the model/compute path never needs it.
"""

from x3d_tpu.data.pipeline import InputReader  # noqa: F401
from x3d_tpu.data.synthetic import synthetic_batches  # noqa: F401
