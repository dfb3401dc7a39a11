"""Raw-video decoding backends (host side), capability-gated.

The reference hard-depends on decord (``dataloader.py:6,53-61``).  Decord is
not always available; this module probes, in order: decord, OpenCV (a real
ffmpeg/libavcodec decoder when cv2 is built with FFMPEG — the case in this
container), imageio (pyav / ffmpeg plugins), and raises a clear error naming
the options if none exist.  Matching the reference's fault tolerance, an
undecodable video yields a zero clip instead of crashing the input pipeline
(``dataloader.py:53-61``).

Test-coverage note: the build container has neither decord nor pyav, so the
decord branch has never run against the real library here.  Its control
flow (seek-based sampled fetch, index plumbing, zeros-on-failure) IS
executed in ``tests/test_data.py`` through an API-faithful in-memory decord
stand-in; the OpenCV branch IS a real hardware-grade decoder (libavcodec)
and is exercised on real H.264/mp4v files in ``tests/test_data.py`` and the
full-dress rehearsal (docs/RUNBOOK.md).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_FALLBACK_SHAPE = (100, 240, 144, 3)  # reference dataloader.py:61


def available_backend() -> Optional[str]:
    try:
        import decord  # noqa: F401

        return "decord"
    except ImportError:
        pass
    try:
        import cv2  # noqa: F401

        return "opencv"
    except ImportError:
        pass
    try:
        import imageio.v3 as iio  # noqa: F401

        # probe whether a video plugin actually works is deferred to use
        return "imageio"
    except ImportError:
        pass
    return None


def video_fps(path: str) -> Optional[float]:
    """Container frame rate, if a metadata-capable backend exists.

    The reference's writer trims each video to its first 10 seconds using
    the ffmpeg-reported fps (``create_tfrecords.py:126-134``); with OpenCV
    available we can honor the real rate instead of a CLI default.
    """
    backend = available_backend()
    try:
        if backend == "decord":
            import decord

            return float(decord.VideoReader(path, ctx=decord.cpu(0))
                         .get_avg_fps())
        if backend == "opencv":
            import cv2

            cap = cv2.VideoCapture(path)
            try:
                if cap.isOpened():
                    fps = cap.get(cv2.CAP_PROP_FPS)
                    return float(fps) if fps and fps > 0 else None
            finally:
                cap.release()
    except Exception:  # pragma: no cover - corrupt files
        pass
    return None


def _opencv_decode(path: str, keep: Optional[set] = None) -> dict:
    """Sequentially decode ``path`` with cv2, keeping frames in ``keep``
    (all frames when None).  Returns {index: (H, W, 3) uint8 RGB}.

    Sequential grab()+retrieve() rather than CAP_PROP_POS_FRAMES seeks:
    frame-accurate seeking is codec-dependent (inter-coded frames land on
    the previous keyframe), while grab() skips only the color conversion,
    which is the cheap, always-exact way to subsample.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"OpenCV cannot open {path}")
    frames = {}
    pos = 0
    last = max(keep) if keep else None
    try:
        while True:
            if keep is not None and pos > last:
                break
            if keep is None or pos in keep:
                ok, frame = cap.read()
                if not ok:
                    break
                frames[pos] = np.ascontiguousarray(frame[..., ::-1])
            elif not cap.grab():
                break
            pos += 1
    finally:
        cap.release()
    if not frames:
        raise RuntimeError(f"OpenCV decoded no frames from {path}")
    return frames


def decode_all_frames(path: str) -> np.ndarray:
    """(N, H, W, 3) uint8 for every frame; zeros on failure."""
    backend = available_backend()
    try:
        if backend == "decord":
            import decord

            vr = decord.VideoReader(path, ctx=decord.cpu(0))
            return vr.get_batch(range(len(vr))).asnumpy()
        if backend == "opencv":
            frames = _opencv_decode(path)
            return np.stack([frames[i] for i in range(len(frames))])
        if backend == "imageio":
            import imageio.v3 as iio

            frames = np.asarray(iio.imread(path, plugin=None))
            # normalise what the plugin returned to (N, H, W, 3) uint8:
            # pillow decodes GIFs as RGBA / palette, single images as rank 3
            if frames.ndim == 3:
                frames = frames[None]
            if frames.shape[-1] > 3:
                frames = frames[..., :3]
            elif frames.shape[-1] < 3:
                frames = np.repeat(frames[..., :1], 3, axis=-1)
            return np.ascontiguousarray(frames, dtype=np.uint8)
        raise ImportError(
            "No video decode backend available: install decord, "
            "opencv-python, or imageio[pyav]/imageio-ffmpeg, or use the "
            "TFRecord pipeline."
        )
    except ImportError:
        raise
    except Exception as e:  # pragma: no cover - corrupt files
        log.warning("Failed to decode video %s (%s); substituting zeros.",
                    path, e)
        return np.zeros(_FALLBACK_SHAPE, np.uint8)


def decode_frames_sampled(path: str, sampler) -> np.ndarray:
    """Decode a video and gather the sampler's frame indices.

    Decord can seek; for it we fetch only the sampled frames.  OpenCV
    decodes sequentially but skips color conversion on unsampled frames
    (grab-only).  Other backends decode fully then gather.
    """
    backend = available_backend()
    if backend == "decord":
        try:
            import decord

            vr = decord.VideoReader(path, ctx=decord.cpu(0))
            idx = np.asarray(sampler.indices(len(vr)))
            return vr.get_batch(idx.tolist()).asnumpy()
        except Exception as e:
            log.warning("decord failed on %s (%s); substituting zeros.",
                        path, e)
            return np.zeros(
                (int(np.prod(sampler.indices(100).shape)),) + _FALLBACK_SHAPE[1:],
                np.uint8)
    if backend == "opencv":
        try:
            import cv2

            cap = cv2.VideoCapture(path)
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) if cap.isOpened() else 0
            cap.release()
            if n > 0:
                idx = np.asarray(sampler.indices(n))
                frames = _opencv_decode(path, keep=set(int(i)
                                                       for i in idx.ravel()))
                if all(int(i) in frames for i in idx.ravel()):
                    return np.stack([frames[int(i)] for i in idx.ravel()])
                # container metadata overcounted (rare; e.g. truncated
                # moov atom) — fall through to the exact full decode
                log.warning(
                    "OpenCV frame count %d for %s not fully decodable; "
                    "falling back to full decode.", n, path)
        except Exception as e:
            log.warning("OpenCV failed on %s (%s); substituting zeros.",
                        path, e)
            return np.zeros(
                (int(np.prod(sampler.indices(100).shape)),) + _FALLBACK_SHAPE[1:],
                np.uint8)
    video = decode_all_frames(path)
    idx = np.asarray(sampler.indices(video.shape[0]))
    return video[idx]
