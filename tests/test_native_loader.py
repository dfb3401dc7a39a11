"""Native C++ clip loader vs the tf.data pipeline and the sampler oracle."""

import numpy as np
import pytest

from x3d_tpu import variant_config
from x3d_tpu.data import native_loader
from x3d_tpu.data.pipeline import InputReader
from x3d_tpu.data.tfrecords import write_video_array_shards

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason=f"native loader unavailable: {native_loader.build_error()}")


def _gradient_video(num_frames, h=36, w=48, base=0):
    """Frames carrying both their index (offset) and spatial gradients."""
    y = np.arange(h, dtype=np.float32)[:, None, None]
    x = np.arange(w, dtype=np.float32)[None, :, None]
    out = []
    for i in range(num_frames):
        img = (base * 3 + i * 5 + y * 1.5 + x * 1.0) % 240
        out.append(np.broadcast_to(img, (h, w, 3)).astype(np.uint8))
    return np.stack(out)


def _flat_video(num_frames, h=36, w=48, base=0):
    vals = (base + np.arange(num_frames) * 7) % 250
    return np.stack([np.full((h, w, 3), v, np.uint8) for v in vals])


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_tfr")
    videos = [(_gradient_video(40 + 3 * i, base=i), i % 5) for i in range(6)]
    write_video_array_shards(videos, str(d), prefix="train",
                             videos_per_record=3)
    flat = [(_flat_video(30 + i, base=10 * i), i) for i in range(4)]
    write_video_array_shards(flat, str(d), prefix="flat",
                             videos_per_record=2)
    return d


def _cfg():
    cfg = variant_config("XS")
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TEST.NUM_TEMPORAL_VIEWS = 3
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    return cfg


def test_train_batches(shards):
    cfg = _cfg()
    loader = native_loader.NativeClipLoader(cfg, is_training=True, seed=7,
                                            num_threads=2)
    it = loader(str(shards / "train-*"), batch_size=4)
    for _ in range(3):   # loops past one epoch (6 videos)
        batch = next(it)
        assert batch["video"].shape == (4, 4, 32, 32, 3)
        assert batch["video"].dtype == np.uint8
        assert set(batch["label"]).issubset(set(range(5)))
        assert batch["video"].std() > 1.0   # real pixels, not zeros


def test_eval_exhausts_and_is_deterministic(shards):
    cfg = _cfg()
    def run():
        loader = native_loader.NativeClipLoader(
            cfg, is_training=False, num_threads=1)
        return list(loader(str(shards / "flat-*"), batch_size=2))
    a, b = run(), run()
    assert len(a) == 2                      # 4 videos / batch 2
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["video"], bb["video"])
        np.testing.assert_array_equal(ba["label"], bb["label"])
    assert sorted(np.concatenate([x["label"] for x in a])) == [0, 1, 2, 3]


def test_eval_temporal_content_matches_oracle(shards):
    """Flat frames encode their index; decoded pixel values must match the
    adaptive-stride eval sampling (k * max(1, size//T)) % size."""
    cfg = _cfg()
    loader = native_loader.NativeClipLoader(cfg, is_training=False,
                                            num_threads=1)
    batches = list(loader(str(shards / "flat-*"), batch_size=1))
    T, V = cfg.DATA.TEMP_DURATION, cfg.TEST.NUM_TEMPORAL_VIEWS
    for batch in batches:
        label = int(batch["label"][0])
        size = 30 + label                   # frames in this video
        rate = max(1, size // T)
        expect_idx = (np.arange(V * T) * rate) % size
        expect_vals = (10 * label + expect_idx * 7) % 250
        got = batch["video"].reshape(V * T, -1).mean(axis=1)
        np.testing.assert_allclose(got, expect_vals, atol=2.5)


def test_eval_pixels_match_tf_pipeline(shards):
    """Same shards through tf.data (exact eval geometry) and the native
    loader: pixel-level agreement within JPEG/bilinear tolerance."""
    cfg = _cfg()
    reader = InputReader(cfg, is_training=False, use_tfrecord=True)
    tf_batches = {}
    for batch in reader.as_numpy(str(shards / "flat-*"), 1):
        tf_batches[int(batch["label"][0])] = batch["video"]

    loader = native_loader.NativeClipLoader(cfg, is_training=False,
                                            num_threads=1)
    for batch in loader(str(shards / "flat-*"), batch_size=1):
        label = int(batch["label"][0])
        ref = tf_batches[label].reshape(batch["video"].shape)
        diff = np.abs(batch["video"].astype(np.int32) - ref.astype(np.int32))
        assert diff.mean() < 1.0, f"label {label}: mean diff {diff.mean()}"
        assert diff.max() <= 6, f"label {label}: max diff {diff.max()}"


def test_eval_geometry_matches_tf_pipeline_gradient(shards):
    """Gradient frames catch resize/crop misalignment the flat ones hide."""
    cfg = _cfg()
    reader = InputReader(cfg, is_training=False, use_tfrecord=True)
    tf_batches = {}
    for batch in reader.as_numpy(str(shards / "train-*"), 1):
        key = int(batch["label"][0])
        tf_batches.setdefault(key, []).append(batch["video"])

    loader = native_loader.NativeClipLoader(cfg, is_training=False,
                                            num_threads=1)
    native = {}
    for batch in loader(str(shards / "train-*"), batch_size=1):
        native.setdefault(int(batch["label"][0]), []).append(batch["video"])

    checked = 0
    for label, clips in native.items():
        refs = tf_batches[label]
        for clip in clips:
            best = min(
                np.abs(clip.astype(np.int32).reshape(r.shape)
                       - r.astype(np.int32)).mean()
                for r in refs)
            assert best < 1.5, f"label {label}: best mean diff {best}"
            checked += 1
    assert checked >= 6


def test_three_crop_eval_matches_tf_pipeline(shards):
    """3-crop (left/center/right) eval: crop-major clip layout and pixels
    agree with the tf.data pipeline."""
    cfg = _cfg()
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    reader = InputReader(cfg, is_training=False, use_tfrecord=True)
    tf_batches = {}
    for batch in reader.as_numpy(str(shards / "train-*"), 1):
        tf_batches.setdefault(int(batch["label"][0]), []).append(
            batch["video"])

    loader = native_loader.NativeClipLoader(cfg, is_training=False,
                                            num_threads=1)
    checked = 0
    for batch in loader(str(shards / "train-*"), batch_size=1):
        label = int(batch["label"][0])
        V = cfg.TEST.NUM_TEMPORAL_VIEWS * 3
        assert batch["video"].shape[0] == V
        best = min(
            np.abs(batch["video"].astype(np.int32).reshape(r.shape)
                   - r.astype(np.int32)).mean()
            for r in tf_batches[label])
        assert best < 1.5, f"label {label}: best mean diff {best}"
        checked += 1
    assert checked == 6


def test_bad_crop_count_rejected(shards):
    cfg = _cfg()
    cfg.TEST.NUM_SPATIAL_CROPS = 2
    with pytest.raises(NotImplementedError):
        native_loader.NativeClipLoader(cfg, is_training=False)


def test_host_sharding_partitions_files(shards):
    """host_id/host_count slice the shard list; the union of two hosts'
    labels covers the dataset with no overlap (2 flat shards)."""
    cfg = _cfg()
    seen = []
    for host in (0, 1):
        loader = native_loader.NativeClipLoader(
            cfg, is_training=False, num_threads=1, host_id=host,
            host_count=2)
        labels = []
        for batch in loader(str(shards / "flat-*"), batch_size=1):
            labels.append(int(batch["label"][0]))
        assert labels, f"host {host} read nothing"
        seen.append(set(labels))
    assert seen[0] | seen[1] == {0, 1, 2, 3}
    assert not (seen[0] & seen[1])


def test_shuffle_buffer_decorrelates_order(shards):
    """With the sample shuffle buffer, a training epoch emits records in a
    different order than file order; without it (shuffle=False), eval-style
    order is preserved (tested above)."""
    cfg = _cfg()
    def labels_with(seed):
        loader = native_loader.NativeClipLoader(
            cfg, is_training=True, seed=seed, num_threads=1, loop=False,
            shuffle=True, shuffle_buffer=8)
        out = []
        for batch in loader(str(shards / "train-*"), batch_size=1):
            out.append(int(batch["label"][0]))
        return out
    a, b = labels_with(1), labels_with(2)
    assert len(a) == len(b) == 6
    assert sorted(a) == sorted(b)      # same multiset of records
    assert a != b                      # different order across seeds


def test_shard_interleave_mixes_sources(tmp_path):
    """The C++ reader's two-level shuffle (RecordReader: per-epoch shard
    reshuffle + 8-way random shard interleave, the tf.data nondeterministic
    parallel-interleave analog of reference dataloader.py:153-159) must mix
    records from many shards even with the Python reservoir disabled."""
    cfg = _cfg()
    n_shards, per_shard = 12, 4
    videos = []
    for s in range(n_shards):
        for _ in range(per_shard):
            videos.append((_flat_video(20, base=5 * s), s))  # label = shard
    # videos_per_record groups consecutive entries -> shard s holds label s
    write_video_array_shards(videos, str(tmp_path), prefix="mix",
                             videos_per_record=per_shard)

    loader = native_loader.NativeClipLoader(
        cfg, is_training=True, seed=3, num_threads=1, loop=False,
        shuffle=True, shuffle_buffer=0)
    labels = []
    for batch in loader(str(tmp_path / "mix-*"), batch_size=1):
        labels.append(int(batch["label"][0]))

    # exactly-once coverage of a finite (non-loop) epoch
    assert sorted(labels) == sorted(s for s in range(n_shards)
                                    for _ in range(per_shard))
    # a sequential reader would emit 8 consecutive same-shard records at
    # the front; the 8-way interleave draws from many shards immediately
    assert len(set(labels[:8])) >= 4, labels[:8]
    # and no shard monopolises any window of 2*per_shard consecutive reads
    for i in range(0, len(labels) - 2 * per_shard):
        window = labels[i:i + 2 * per_shard]
        assert len(set(window)) >= 2, (i, window)
