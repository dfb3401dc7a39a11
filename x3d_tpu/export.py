"""TF SavedModel export — serving portability for the TF ecosystem.

The reference is a TF/Keras codebase, so its users get TF-Serving /
TF-Hub-style deployment for free (``model.save`` on the Keras object).
This module closes that gap for the JAX framework: it converts the
inference forward with ``jax2tf`` (native StableHLO serialization) and
writes a standard SavedModel with two uint8 signatures:

  ``serve_clips``   (clips, T, S, S, 3) uint8 -> (clips, classes) per-clip
                    probabilities
  ``serve_videos``  (videos*views, T, S, S, 3) uint8 -> (videos, classes)
                    view-ensembled probabilities (the reference's published
                    eval protocol; also the default serving signature)

Both share one converted computation with a shape-polymorphic batch
dimension; the view averaging runs as a TF reshape+reduce_mean epilogue, so
any multiple of ``views`` works at serving time.  Normalisation
(mean/std over /255 pixels, ``utils.normalize``) runs in-graph — clients
send raw uint8 frames, exactly like :class:`x3d_tpu.serving.InferenceEngine`.

Weights are stored as ``tf.Variable``s (a standard checkpointable
SavedModel, not graph constants).  The export traces the plain XLA model
composition (``dw_fused`` off, no remat, no time-fold): TPU-specific layout
modes are jit-time optimisations that do not belong in a portable artifact,
and their batch-gates do not admit symbolic batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from x3d_tpu.models import create_model
from x3d_tpu.utils import normalize


def export_saved_model(cfg, variables, export_dir: str, *,
                       dtype=jnp.float32, batch_clips=None,
                       platforms=("cpu", "tpu")) -> str:
    """Write a TF SavedModel serving ``variables`` at ``cfg``'s protocol.

    Args:
      cfg: experiment config (TEST.* defines the view ensemble; DATA.* the
        clip geometry and normalisation constants).
      variables: {'params', 'batch_stats'} tree (as produced by
        ``init_variables`` / ``CheckpointManager.restore_weights_only``).
      export_dir: output directory (created/overwritten by TF).
      dtype: compute dtype inside the graph (float32 default — portable to
        CPU/GPU servers; pass jnp.bfloat16 for TPU-serving).
      batch_clips: fix the clip-batch dimension (an int) for
        serving stacks that want fully static shapes; None (default)
        exports a shape-polymorphic batch.
      platforms: StableHLO lowering platforms baked into the artifact.
        Without an explicit list, jax2tf lowers for the process's default
        backend only — an export run on a TPU host then serves ONLY on
        TPU ("platform CPU is not among the platforms required by the
        module", hit in the round-4 full-dress rehearsal, docs/RUNBOOK.md).
        The (cpu, tpu) default makes the artifact servable on plain
        CPU TF-Serving AND TPU hosts; add "cuda" for GPU servers.

    Returns:
      export_dir.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    from x3d_tpu.ops import dw_fused

    model = create_model(cfg, dtype=dtype, remat=False, time_fold=False)
    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    n_classes = cfg.NETWORK.NUM_CLASSES
    mean, std = tuple(cfg.DATA.MEAN), tuple(cfg.DATA.STD)

    def clip_probs(variables, clips_u8):
        x = normalize(clips_u8.astype(jnp.float32), mean, std)
        logits = model.apply(variables, x.astype(dtype), train=False,
                             return_logits=True)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    # Host numpy leaves -> tf.Variables (tracked via the module below).
    params_np = jax.tree_util.tree_map(np.asarray, _plain_dict(variables))
    tf_params = tf.nest.map_structure(tf.Variable, params_np)

    poly = None if batch_clips is not None else [None, "(b, ...)"]
    clip_spec = tf.TensorSpec(
        [batch_clips, cfg.DATA.TEMP_DURATION, cfg.DATA.TEST_CROP_SIZE,
         cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_INPUT_CHANNELS],
        tf.uint8, name="clips")

    module = tf.Module(name="x3d")
    module.variables_tree = tf_params   # tf.Module tracks nested structures

    # The TPU layout modes (aligned/pallas segment, remat, fold) are
    # jit-time optimisations with concrete-batch gates; trace the portable
    # plain composition.  Pin ALL the op-dispatch globals (a prior
    # tools.ab / set_default_impl call in this process could otherwise
    # leak TPU-only Pallas custom calls into the artifact).  Tracing
    # happens in get_concrete_function, so the guard must cover it.
    from x3d_tpu.ops import depthwise, pointwise

    old_mode = dw_fused._ENABLED
    old_dw, old_pw = depthwise._DEFAULT_IMPL, pointwise._DEFAULT_IMPL
    dw_fused.set_enabled(False)
    depthwise.set_default_impl("xla")
    pointwise.set_default_impl("conv")
    try:
        converted = jax2tf.convert(
            clip_probs, polymorphic_shapes=poly, with_gradient=False,
            native_serialization_platforms=tuple(platforms))

        serve_clips = tf.function(
            lambda x: {"probabilities": converted(tf_params, x)},
            input_signature=[clip_spec])

        def _videos(x):
            p = converted(tf_params, x)
            p = tf.reshape(p, (-1, views, n_classes))
            return {"probabilities": tf.reduce_mean(p, axis=1)}

        serve_videos = tf.function(_videos, input_signature=[clip_spec])
        cf_clips = serve_clips.get_concrete_function()
        cf_videos = serve_videos.get_concrete_function()
    finally:
        dw_fused.set_enabled(old_mode)
        depthwise.set_default_impl(old_dw)
        pointwise.set_default_impl(old_pw)

    module.serve_clips = serve_clips
    module.serve_videos = serve_videos
    tf.saved_model.save(
        module, export_dir,
        signatures={
            "serve_clips": cf_clips,
            "serve_videos": cf_videos,
            tf.saved_model.DEFAULT_SERVING_SIGNATURE_DEF_KEY: cf_videos,
        })
    return export_dir


def export_tflite(saved_model_dir: str, output_path: str,
                  signature: str = "serve_clips") -> str:
    """Convert an exported SavedModel to a ``.tflite`` flatbuffer.

    X3D's depthwise 3D convolutions exceed TFLite's builtin CONV_3D (no
    grouped-conv support), so the flatbuffer carries them as Select-TF
    (Flex) ops: running it requires a Flex-enabled interpreter — the
    standard ``tensorflow-lite-select-tf-ops`` dependency on Android/iOS,
    or a full-TF Python build.  Conversion is covered by tests; execution
    is NOT exercised in this container (its bundled interpreter lacks the
    Flex delegate — labeled the same way as the decord branch in
    ``data/video.py``).

    Requires a fixed-batch export (``export_saved_model(batch_clips=N)``):
    under a polymorphic batch the residual-projection strided slices lower
    to ``dynamic_gather``, which the vhlo serializer rejects.
    """
    import tensorflow as tf

    conv = tf.lite.TFLiteConverter.from_saved_model(
        saved_model_dir, signature_keys=[signature])
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS,
                                      tf.lite.OpsSet.SELECT_TF_OPS]
    blob = conv.convert()
    with open(output_path, "wb") as f:
        f.write(blob)
    return output_path


def _plain_dict(tree):
    """FrozenDict -> plain nested dict (tf.nest needs builtin containers)."""
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _plain_dict(v) for k, v in tree.items()}
    return tree
