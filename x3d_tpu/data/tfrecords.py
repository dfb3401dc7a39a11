"""Offline TFRecord tooling: writer, label-file generators, inspector.

Reference counterparts:
  * writer   — ``datasets/create_tfrecords.py`` (multiprocessing pool, one
    SequenceExample per video, JPEG q=90 frames, GZIP-9 shards, first-10s
    trim, test-set labels resolved from an annotations JSON).
  * labels   — ``datasets/create_label.py`` / ``datasets/kinetics400/
    create_label.py`` (class-per-folder tree -> "path label" lines, optional
    per-class cap).
  * inspector— ``datasets/inspect_tfrecord.py`` (round-trip N samples
    through the real InputReader and write watchable files).

Schema is byte-compatible with the reference (``create_tfrecords.py:48-83``)
so shards written by either tool feed either framework.
"""

from __future__ import annotations

import json
import logging
import os
from multiprocessing import Pool, cpu_count
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

JPEG_QUALITY = 90          # reference create_tfrecords.py:63
TRIM_SECONDS = 10          # reference create_tfrecords.py:132-134


# ----------------------------------------------------------------- encoding

def frames_to_sequence_example(frames: np.ndarray, label: int) -> bytes:
    """Serialise (N, H, W, 3) uint8 frames as the reference's SequenceExample."""
    import tensorflow as tf

    jpegs = [
        tf.io.encode_jpeg(f, quality=JPEG_QUALITY).numpy() for f in frames
    ]
    example = tf.train.SequenceExample(
        context=tf.train.Features(
            feature={
                "video/num_frames": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[len(jpegs)])),
                "video/class/label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[int(label)])),
            }
        ),
        feature_lists=tf.train.FeatureLists(
            feature_list={
                "video": tf.train.FeatureList(
                    feature=[
                        tf.train.Feature(
                            bytes_list=tf.train.BytesList(value=[j]))
                        for j in jpegs
                    ]
                )
            }
        ),
    )
    return example.SerializeToString()


def write_shard(path: str, examples: Iterable[bytes]) -> int:
    """Write serialised examples to one GZIP TFRecord shard; returns count."""
    import tensorflow as tf

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    options = tf.io.TFRecordOptions(compression_type="GZIP",
                                    compression_level=9)
    n = 0
    with tf.io.TFRecordWriter(path, options) as writer:
        for ex in examples:
            writer.write(ex)
            n += 1
    return n


def write_video_array_shards(videos: Sequence[Tuple[np.ndarray, int]],
                             out_dir: str, prefix: str = "train",
                             videos_per_record: int = 32) -> List[str]:
    """Write in-memory (frames, label) videos into shards (test/tooling path)."""
    paths = []
    for start in range(0, len(videos), videos_per_record):
        chunk = videos[start:start + videos_per_record]
        path = os.path.join(
            out_dir, f"{prefix}-{start // videos_per_record:05d}.tfrecord")
        write_shard(path, (frames_to_sequence_example(f, l) for f, l in chunk))
        paths.append(path)
    return paths


# ------------------------------------------------------------------- writer

def _process_chunk(args) -> Tuple[str, int]:
    """Worker: decode videos, trim to TRIM_SECONDS, serialise, write a shard."""
    chunk, out_path, fps_default = args
    from x3d_tpu.data import video as video_lib

    def gen():
        for path, label in chunk:
            frames = video_lib.decode_all_frames(path)
            if frames.shape[0] == 0:
                log.warning("Skipping empty video %s", path)
                continue
            # trim to the first TRIM_SECONDS using the container's real
            # frame rate when a metadata-capable backend exists — the
            # reference reads it from ffmpeg (create_tfrecords.py:126-134);
            # fps_default is only the fallback for rate-less containers
            fps = video_lib.video_fps(path) or fps_default
            frames = frames[: int(TRIM_SECONDS * fps)]
            yield frames_to_sequence_example(frames, label)

    n = write_shard(out_path, gen())
    return out_path, n


def create_tfrecords(video_label_pairs: Sequence[Tuple[str, int]],
                     out_dir: str, prefix: str = "train",
                     videos_per_record: int = 32,
                     num_workers: Optional[int] = None,
                     fps_default: int = 25) -> List[str]:
    """Multiprocess TFRecord writer (reference create_tfrecords.py:85-218).

    Each worker owns whole shards, so writes never contend.
    """
    os.makedirs(out_dir, exist_ok=True)
    chunks = [
        video_label_pairs[i:i + videos_per_record]
        for i in range(0, len(video_label_pairs), videos_per_record)
    ]
    tasks = [
        (chunk, os.path.join(out_dir, f"{prefix}-{i:05d}.tfrecord"),
         fps_default)
        for i, chunk in enumerate(chunks)
    ]
    num_workers = num_workers or max(1, cpu_count() - 1)
    if num_workers == 1 or len(tasks) == 1:
        results = [_process_chunk(t) for t in tasks]
    else:
        with Pool(num_workers) as pool:
            results = pool.map(_process_chunk, tasks)
    for path, n in results:
        log.info("wrote %s (%d videos)", path, n)
    return [p for p, _ in results]


# ------------------------------------------------------------------- labels

def build_label_map(class_dir: str) -> Dict[str, int]:
    """class-per-folder tree -> {class_name: id} (sorted, 0-based)."""
    classes = sorted(
        d for d in os.listdir(class_dir)
        if os.path.isdir(os.path.join(class_dir, d))
    )
    return {c: i for i, c in enumerate(classes)}


def create_label_file(video_root: str, out_path: str,
                      label_map: Optional[Dict[str, int]] = None,
                      sample_size: Optional[int] = None,
                      extensions: Tuple[str, ...] = (".mp4", ".avi", ".mkv",
                                                     ".webm")) -> int:
    """Walk ``video_root/<class>/<video>`` and emit "path label" lines.

    ``sample_size`` caps videos per class (reference
    kinetics400/create_label.py:42-75).  Returns the line count.
    """
    label_map = label_map or build_label_map(video_root)
    lines = []
    for cls, idx in sorted(label_map.items(), key=lambda kv: kv[1]):
        cdir = os.path.join(video_root, cls)
        if not os.path.isdir(cdir):
            continue
        vids = sorted(
            f for f in os.listdir(cdir)
            if f.lower().endswith(extensions)
        )
        if sample_size:
            vids = vids[:sample_size]
        lines.extend(f"{os.path.join(cdir, v)} {idx}" for v in vids)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return len(lines)


def resolve_test_labels(annotations_json: str) -> Dict[str, int]:
    """youtube_id -> label id from a Kinetics annotations JSON
    (reference create_tfrecords.py:109-116)."""
    with open(annotations_json) as f:
        ann = json.load(f)
    out = {}
    for vid, meta in ann.items():
        label = meta.get("annotations", {}).get("label")
        if label is not None:
            out[vid] = label
    return out


# ------------------------------------------------- Kinetics-400 metadata

# Vendored dataset metadata (a declared compatibility surface, like the
# TFRecord schema): the reference ships these under
# ``datasets/kinetics400/`` — label_map.json (400 class->id, underscore
# style), validate.csv (18k rows) and test.csv (35k rows) of
# youtube_id+time ranges — and its documented K400 workflow depends on
# them; shipping them makes that workflow reproducible from this repo
# alone.
K400_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datasets", "kinetics400")


def kinetics400_label_map() -> Dict[str, int]:
    """The vendored Kinetics-400 class->id map (400 entries; class names
    use underscores for spaces, as the reference tooling expects)."""
    with open(os.path.join(K400_DIR, "label_map.json")) as f:
        return json.load(f)


def kinetics400_split(split: str) -> List[Dict[str, str]]:
    """Rows of the vendored ``validate``/``test`` split CSV: dicts with
    label, youtube_id, time_start, time_end, split."""
    import csv

    if split not in ("validate", "test"):
        raise ValueError(f"split must be 'validate' or 'test', got {split!r}")
    with open(os.path.join(K400_DIR, f"{split}.csv")) as f:
        return list(csv.DictReader(f))


def create_test_label_file(video_dir: str, out_path: str,
                           annotations_json: str,
                           label_map: Optional[Dict[str, int]] = None,
                           extensions: Tuple[str, ...] = (".mp4", ".mkv",
                                                          ".avi", ".webm"),
                           ) -> int:
    """Label a FLAT directory of K400 test videos via an annotations JSON
    (reference ``datasets/kinetics400/create_label.py:42-61``): each
    ``<youtube_id>.<ext>`` resolves through the JSON's label string
    (spaces -> underscores) into the label map; unknown ids are warned and
    skipped, as in the reference.  Returns the line count."""
    label_map = label_map or kinetics400_label_map()
    test_labels = resolve_test_labels(annotations_json)
    lines = []
    for fname in sorted(os.listdir(video_dir)):
        if not fname.lower().endswith(extensions):
            continue
        video_key = fname.split(".")[0]
        label_str = test_labels.get(video_key)
        if label_str is None:
            log.warning("%s not found in annotations", fname)
            continue
        idx = label_map.get(label_str.replace(" ", "_"))
        if idx is None:
            log.warning("label %r of %s not in label map", label_str, fname)
            continue
        lines.append(f"{os.path.join(video_dir, fname)} {idx}")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return len(lines)


# ---------------------------------------------------------------- inspector

def inspect_tfrecords(cfg, file_pattern: str, out_dir: str,
                      num_samples: int = 4, is_training: bool = True) -> List[str]:
    """Round-trip samples through the real InputReader and write them as
    animated GIFs named by label (reference inspect_tfrecord.py:31-69 wrote
    mp4s; GIF avoids the ffmpeg dependency)."""
    from PIL import Image

    from x3d_tpu.data.pipeline import InputReader

    os.makedirs(out_dir, exist_ok=True)
    reader = InputReader(cfg, is_training=is_training, use_tfrecord=True,
                         emit="uint8")
    written = []
    it = reader.as_numpy(file_pattern, batch_size=1)
    for i, batch in zip(range(num_samples), it):
        clip = batch["video"][0] if is_training else batch["video"][0]
        label = int(batch["label"][0])
        frames = [Image.fromarray(f) for f in np.asarray(clip)]
        path = os.path.join(out_dir, f"sample{i}_label{label}.gif")
        frames[0].save(path, save_all=True, append_images=frames[1:],
                       duration=100, loop=0)
        written.append(path)
    return written
