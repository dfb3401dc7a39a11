"""Synthetic-but-REAL video corpus for the full-dress rehearsal.

Writes real compressed mp4 files (cv2 ``VideoWriter`` -> libavcodec, mp4v)
in the class-per-folder layout that ``tools/create_label`` walks (reference
``datasets/create_label.py:38-89``), so the ENTIRE production path —
create_label -> create_tfrecords -> train -> eval -> export — can be
rehearsed via CLIs only, with real video decode cost on the host
(``docs/RUNBOOK.md``).

Corpus design:
  * Classes are visually separable by a global cue (a distinct background
    hue) plus a secondary cue (a moving block whose direction is
    class-specific), so a short X3D-XS run reaches high top-1 — which turns
    the rehearsal's eval step into a real end-metric check, the reference's
    own verification style (its only oracles are accuracy tables and
    eyeballing, SURVEY.md §4).
  * Per-video length (1.5-12 s; every 5th forced past 10 s), frame rate
    (10-30 fps), aspect (landscape/portrait/square), brightness, block
    size/speed, and sensor noise all vary — exercising the writer's
    first-10-seconds trim at the CONTAINER fps (reference
    ``create_tfrecords.py:126-134``), the looping temporal sampler, and
    non-square short-side resizes.
  * Generation is deterministic per (seed, class, index): re-running the
    tool reproduces the corpus byte-for-byte given the same codec build.

Usage (defaults match the rehearsal: 10 classes x (20 train + 4 val) = 240):

    python -m x3d_tpu.tools.make_synthetic_videos --output_root=/tmp/corpus
"""

from __future__ import annotations

import colorsys
import logging
import os

from absl import app, flags

flags.DEFINE_string("output_root", None,
                    "Root directory; writes train/<class>/*.mp4 and "
                    "val/<class>/*.mp4 beneath it.")
flags.DEFINE_integer("num_classes", 10, "Number of classes.")
flags.DEFINE_integer("train_per_class", 20, "Training videos per class.")
flags.DEFINE_integer("val_per_class", 4, "Validation videos per class.")
flags.DEFINE_integer("seed", 0, "Corpus seed.")

flags.mark_flags_as_required(["output_root"])
FLAGS = flags.FLAGS

log = logging.getLogger(__name__)

# (width, height): landscape, portrait, square, wide, small
_SIZES = [(320, 240), (240, 320), (256, 256), (424, 240), (192, 144),
          (168, 224)]
_FPS = [10.0, 12.5, 15.0, 20.0, 24.0, 25.0, 30.0]


def class_name(k: int) -> str:
    return f"class_{k:02d}"


def _class_palette(k: int, num_classes: int):
    """Background hue and block color for class ``k`` (0-based)."""
    h = k / num_classes
    bg = colorsys.hsv_to_rgb(h, 0.85, 0.75)
    fg = colorsys.hsv_to_rgb((h + 0.5) % 1.0, 0.9, 1.0)
    to255 = lambda c: tuple(int(round(255 * x)) for x in c)  # noqa: E731
    return to255(bg), to255(fg)


def write_video(path: str, k: int, num_classes: int, rng,
                duration_range=(1.5, 12.0)) -> dict:
    """Write one real mp4 for class ``k``; returns its metadata."""
    import cv2
    import numpy as np

    bg, fg = _class_palette(k, num_classes)
    width, height = _SIZES[rng.integers(len(_SIZES))]
    fps = float(_FPS[rng.integers(len(_FPS))])
    duration = float(rng.uniform(*duration_range))
    n = max(8, int(round(duration * fps)))

    # class-specific motion direction; speed/size/start vary per video
    angle = 2.0 * np.pi * k / num_classes + rng.uniform(-0.2, 0.2)
    speed = rng.uniform(0.01, 0.04) * min(width, height)  # px/frame
    side = int(rng.uniform(0.15, 0.3) * min(width, height))
    pos = np.array([rng.uniform(0, width), rng.uniform(0, height)])
    vel = speed * np.array([np.cos(angle), np.sin(angle)])
    brightness = rng.uniform(0.7, 1.2)
    noise_sigma = rng.uniform(0.0, 12.0)

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (width, height))
    if not writer.isOpened():  # pragma: no cover - codec always present here
        raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
    base = np.clip(np.array(bg, np.float32) * brightness, 0, 255)
    for _ in range(n):
        frame = np.broadcast_to(base, (height, width, 3)).copy()
        if noise_sigma:
            frame += rng.normal(0.0, noise_sigma, frame.shape)
        x0, y0 = int(pos[0]) % width, int(pos[1]) % height
        frame[y0:y0 + side, x0:x0 + side] = fg  # clipped at the border
        pos += vel
        writer.write(np.clip(frame, 0, 255).astype(np.uint8)[..., ::-1])
    writer.release()
    return {"frames": n, "fps": fps, "size": (width, height),
            "duration_s": n / fps}


def generate(output_root: str, num_classes: int = 10,
             train_per_class: int = 20, val_per_class: int = 4,
             seed: int = 0, duration_range=(1.5, 12.0),
             force_over_10s: bool = True) -> dict:
    """Generate the corpus; returns summary stats."""
    import numpy as np

    stats = {"videos": 0, "frames": 0, "bytes": 0, "over_10s": 0}
    for split, per_class in (("train", train_per_class),
                             ("val", val_per_class)):
        for k in range(num_classes):
            cdir = os.path.join(output_root, split, class_name(k))
            os.makedirs(cdir, exist_ok=True)
            for i in range(per_class):
                # deterministic per (seed, split, class, index)
                rng = np.random.default_rng(
                    [seed, 0 if split == "train" else 1, k, i])
                path = os.path.join(cdir, f"{class_name(k)}_{i:03d}.mp4")
                # force a >10s video every 5th index so the writer's 10-s
                # container-fps trim is always exercised in both splits
                if force_over_10s and i % 5 == 4:
                    meta = None
                    while meta is None or meta["duration_s"] <= 10.0:
                        meta = write_video(path, k, num_classes, rng,
                                           duration_range)
                else:
                    meta = write_video(path, k, num_classes, rng,
                                       duration_range)
                stats["videos"] += 1
                stats["frames"] += meta["frames"]
                stats["bytes"] += os.path.getsize(path)
                stats["over_10s"] += meta["duration_s"] > 10.0
    return stats


def main(_):
    logging.basicConfig(level=logging.INFO)
    stats = generate(FLAGS.output_root, FLAGS.num_classes,
                     FLAGS.train_per_class, FLAGS.val_per_class, FLAGS.seed)
    log.info("corpus at %s: %d videos (%d frames, %.1f MB, %d over 10 s)",
             FLAGS.output_root, stats["videos"], stats["frames"],
             stats["bytes"] / 1e6, stats["over_10s"])


if __name__ == "__main__":
    app.run(main)
