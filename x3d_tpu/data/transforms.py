"""Clip sampling and spatial transforms, as pure tf.data graph ops.

Behaviour parity with the reference (``/root/reference/transforms.py``), with
two deliberate, documented improvements:

  * **Index-first temporal sampling.** The reference materialises every
    frame, tiles the whole video to loop it, then strided-slices
    (``transforms.py:28-67``).  Looping + striding is just modular
    arithmetic: frame ``k`` of the clip is ``(start + k*rate) % size``.  We
    compute those indices *before* JPEG decode so the pipeline decodes ~16
    frames instead of ~250 (the single biggest host-CPU win; SURVEY.md §7
    "hard parts" #3).  The selected frame indices are bit-identical to the
    reference's.
  * **The horizontal flip is actually random.** The reference's
    ``tf.image.flip_left_right`` flips *every* training clip
    deterministically despite its docstring (``transforms.py:205-206``,
    SURVEY.md Q3).  Here the flip is p=0.5 per clip;
    ``replicate_flip_bug=True`` restores the reference behaviour for strict
    parity experiments.

Eval view semantics are replicated exactly (Q4): views are *contiguous
strided reads of the looped video* with adaptive stride ``max(1, size//T)``,
not uniformly spaced clip starts; the centre/left/right crop offset uses
``ceil((dim-size)/2)`` exactly as the reference does.

Everything is TF graph ops — no ``tf.py_function``/``tf.numpy_function``
escapes (the reference's resize escape serialised the pipeline).
"""

from __future__ import annotations


def _tf():
    import tensorflow as tf

    return tf


class TemporalSampler:
    """Choose which frame indices form the clip(s) of a video.

    Train: one clip, random start in [0, size), stride ``sample_rate``,
    looping past the end (reference ``transforms.py:31-47``).
    Eval: ``num_views`` back-to-back clips from start 0 with adaptive stride
    ``max(1, size // num_frames)`` over the looped video
    (``transforms.py:48-59``).
    """

    def __init__(self, is_training: bool, sample_rate: int, num_frames: int,
                 num_views: int = 1, seed: int | None = None):
        self._is_training = is_training
        self._rate = sample_rate
        self._frames = num_frames
        self._views = num_views
        self._seed = seed

    def indices(self, size):
        """Frame indices: (T,) for train, (V*T,) for eval; values in [0, size)."""
        tf = _tf()
        size = tf.cast(size, tf.int32)
        if self._is_training:
            start = tf.random.uniform([], 0, size, tf.int32, seed=self._seed)
            k = tf.range(self._frames, dtype=tf.int32)
            return (start + k * self._rate) % size
        rate = tf.maximum(1, size // self._frames)
        k = tf.range(self._frames * self._views, dtype=tf.int32)
        return (k * rate) % size

    def reshape_views(self, clip):
        """(V*T, H, W, C) -> (V, T, H, W, C); train gets a singleton view."""
        tf = _tf()
        shape = tf.shape(clip)
        views = 1 if self._is_training else self._views
        return tf.reshape(
            clip, [views, self._frames, shape[-3], shape[-2], shape[-1]]
        )


class SpatialTransforms:
    """Scale-jitter / crop / flip (train) or resize / uniform-crop (eval).

    Matches reference ``transforms.py:89-227`` geometry; see module
    docstring for the two documented divergences.
    """

    def __init__(self, jitter_min: int, jitter_max: int, crop_size: int,
                 is_training: bool, num_crops: int = 1,
                 random_hflip: bool = False,
                 replicate_flip_bug: bool = False,
                 seed: int | None = None):
        if not is_training and num_crops not in (1, 3):
            # The reference only ever evaluates with 1 (center) or 3
            # (left/center/right) crops (``transforms.py:149-190,216-221``);
            # other counts would be untested extrapolation (e.g. 2 would
            # silently yield left+center).
            raise ValueError(
                f"TEST.NUM_SPATIAL_CROPS must be 1 or 3, got {num_crops}")
        self._min = float(jitter_min)
        self._max = float(jitter_max)
        self._crop = int(crop_size)
        self._is_training = is_training
        self._num_crops = num_crops
        self._hflip = random_hflip
        self._replicate_flip_bug = replicate_flip_bug
        self._seed = seed

    # -- shared geometry --------------------------------------------------
    def _short_side_resize(self, clip, size):
        """Resize so the short side becomes ``int(size)`` (aspect kept).

        Float-`size` semantics match the reference's
        ``random_short_side_resize`` (``transforms.py:126-147``): the long
        side is ``floor(ratio * size)`` and both are truncated to int.
        """
        tf = _tf()
        h = tf.cast(tf.shape(clip)[1], tf.float32)
        w = tf.cast(tf.shape(clip)[2], tf.float32)
        new_h = tf.where(w < h, tf.math.floor(h / w * size), size)
        new_w = tf.where(w < h, size, tf.math.floor(w / h * size))
        same = tf.logical_or(
            tf.logical_and(w <= h, tf.equal(w, size)),
            tf.logical_and(h <= w, tf.equal(h, size)),
        )
        def resize():
            out = tf.image.resize(
                clip, [tf.cast(new_h, tf.int32), tf.cast(new_w, tf.int32)]
            )
            return tf.cast(out, clip.dtype)
        return tf.cond(same, lambda: clip, resize)

    def _uniform_crop(self, clip, spatial_idx: int):
        """Centre/left/right (or top/centre/bottom) crop, reference offsets
        (``transforms.py:149-190``: ceil((dim-size)/2))."""
        tf = _tf()
        size = self._crop
        h = tf.shape(clip)[1]
        w = tf.shape(clip)[2]
        y = tf.cast(tf.math.ceil(tf.cast(h - size, tf.float32) / 2), tf.int32)
        x = tf.cast(tf.math.ceil(tf.cast(w - size, tf.float32) / 2), tf.int32)
        if spatial_idx == 0:
            y = tf.where(h > w, 0, y)
            x = tf.where(h > w, x, 0)
        elif spatial_idx == 2:
            y = tf.where(h > w, h - size, y)
            x = tf.where(h > w, x, w - size)
        return clip[:, y:y + size, x:x + size, :]

    # -- entry points ------------------------------------------------------
    def train_clip(self, clip):
        """(T, H, W, C) -> (T, crop, crop, C): jitter-resize, random crop,
        random hflip."""
        tf = _tf()
        size = tf.random.uniform([], self._min, self._max, tf.float32,
                                 seed=self._seed)
        clip = self._short_side_resize(clip, size)
        shape = tf.shape(clip)
        clip = tf.image.random_crop(
            clip, [shape[0], self._crop, self._crop, shape[3]],
            seed=self._seed)
        if self._hflip:
            if self._replicate_flip_bug:
                clip = tf.image.flip_left_right(clip)
            else:
                flip = tf.random.uniform([], seed=self._seed) < 0.5
                clip = tf.cond(flip,
                               lambda: tf.image.flip_left_right(clip),
                               lambda: clip)
        return clip

    def eval_views(self, clips):
        """(V, T, H, W, C) -> (V*num_crops, T, crop, crop, C)."""
        tf = _tf()
        flat = tf.reshape(
            clips, tf.concat([[-1], tf.shape(clips)[2:]], axis=0))
        flat = self._short_side_resize(flat, float(self._crop))
        crops = []
        for i in range(self._num_crops):
            idx = i % 3 if self._num_crops > 1 else 1
            crops.append(self._uniform_crop(flat, idx))
        out = tf.stack(crops, axis=0)  # (num_crops, V*T, c, c, C)
        shape = tf.shape(out)
        v = tf.shape(clips)[0]
        t = tf.shape(clips)[1]
        # Flattened crop-major — (crop0,view0), (crop0,view1), …, (crop1,
        # view0), … — bit-matching the reference, which stacks the crop list
        # first and reshapes after batching (``transforms.py:216-221``,
        # ``dataloader.py:107-116``).  The per-video view *grouping* is what
        # the model's ensembling relies on; the order within a video is
        # mean-invariant but kept identical for per-view parity checks.
        return tf.reshape(out, [self._num_crops * v, t, shape[-3], shape[-2],
                                shape[-1]])


class CropBoxPlanner:
    """Plan spatial crops in ORIGINAL pixel coordinates, before decode.

    The reference decodes every full frame, bilinear-resizes the short side
    into the jitter range, then crops (``transforms.py:195-221``).  Crop and
    resize nearly commute: cropping the matching window from the *original*
    frame and resizing it straight to (crop, crop) yields the same
    augmentation distribution (pixels differ only by interpolation at the
    crop border).  Planning the box first lets the pipeline use
    ``tf.image.decode_and_crop_jpeg`` — decoding only the needed window and
    resizing exactly once — a large host-CPU saving ("input pipeline never
    the bottleneck", SURVEY.md §7).
    """

    def __init__(self, jitter_min: int, jitter_max: int, crop_size: int,
                 is_training: bool, num_crops: int = 1,
                 seed: int | None = None):
        if not is_training and num_crops not in (1, 3):
            # same protocol guard as SpatialTransforms (reference uses only
            # 1- and 3-crop evaluation)
            raise ValueError(
                f"TEST.NUM_SPATIAL_CROPS must be 1 or 3, got {num_crops}")
        self._min = float(jitter_min)
        self._max = float(jitter_max)
        self._crop = int(crop_size)
        self._is_training = is_training
        self._num_crops = num_crops
        self._seed = seed

    def train_box(self, height, width):
        """-> (y, x, h, w) int32 crop window in original coordinates."""
        tf = _tf()
        h = tf.cast(height, tf.float32)
        w = tf.cast(width, tf.float32)
        scale = tf.random.uniform([], self._min, self._max, tf.float32,
                                  seed=self._seed)
        short = tf.minimum(h, w)
        # window side in original coords; never larger than the frame
        side = tf.math.floor(self._crop * short / scale)
        side = tf.minimum(side, short)
        side = tf.maximum(side, 1.0)
        y = tf.random.uniform([], 0.0, h - side + 1.0, tf.float32,
                              seed=self._seed)
        x = tf.random.uniform([], 0.0, w - side + 1.0, tf.float32,
                              seed=self._seed)
        return tf.cast(tf.stack([tf.math.floor(y), tf.math.floor(x),
                                 side, side]), tf.int32)

    def eval_boxes(self, height, width):
        """-> (num_crops, 4) deterministic centre / L-C-R windows."""
        tf = _tf()
        h = tf.cast(height, tf.float32)
        w = tf.cast(width, tf.float32)
        side = tf.minimum(h, w)   # short-side resize to crop => window=short
        boxes = []
        for i in range(self._num_crops):
            idx = i % 3 if self._num_crops > 1 else 1
            yc = tf.math.ceil((h - side) / 2.0)
            xc = tf.math.ceil((w - side) / 2.0)
            if idx == 0:
                y = tf.where(h > w, 0.0, yc)
                x = tf.where(h > w, xc, 0.0)
            elif idx == 2:
                y = tf.where(h > w, h - side, yc)
                x = tf.where(h > w, xc, w - side)
            else:
                y, x = yc, xc
            boxes.append(tf.stack([y, x, side, side]))
        return tf.cast(tf.stack(boxes), tf.int32)


def normalize_tf(clip, mean, std, norm_value: float = 255.0):
    """Host-side standardisation (reference ``utils.py:42-72``); used only
    when the pipeline is asked for pre-normalised floats."""
    tf = _tf()
    mean = tf.constant(mean, tf.float32)
    std = tf.constant(std, tf.float32)
    x = tf.cast(clip, tf.float32) / norm_value
    return (x - mean) / std
