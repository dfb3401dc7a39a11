"""Raw-video decoding backends (host side), capability-gated.

The reference hard-depends on decord (``dataloader.py:6,53-61``).  Decord is
not always available; this module probes, in order: decord, imageio (pyav /
ffmpeg plugins), and raises a clear error naming the options if none exist.
Matching the reference's fault tolerance, an undecodable video yields a zero
clip instead of crashing the input pipeline (``dataloader.py:53-61``).

Test-coverage note: the build container has neither decord nor pyav, so the
decord branch has never run against the real library here.  Its control
flow (seek-based sampled fetch, index plumbing, zeros-on-failure) IS
executed in ``tests/test_data.py`` through an API-faithful in-memory decord
stand-in; the imageio branch is exercised on real encoded pixels.
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
        import imageio.v3 as iio  # noqa: F401

        # probe whether a video plugin actually works is deferred to use
        return "imageio"
    except ImportError:
        pass
    return None


def decode_all_frames(path: str) -> np.ndarray:
    """(N, H, W, 3) uint8 for every frame; zeros on failure."""
    backend = available_backend()
    try:
        if backend == "decord":
            import decord

            vr = decord.VideoReader(path, ctx=decord.cpu(0))
            return vr.get_batch(range(len(vr))).asnumpy()
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
            "No video decode backend available: install decord or "
            "imageio[pyav]/imageio-ffmpeg, or use the TFRecord pipeline."
        )
    except ImportError:
        raise
    except Exception as e:  # pragma: no cover - corrupt files
        log.warning("Failed to decode video %s (%s); substituting zeros.",
                    path, e)
        return np.zeros(_FALLBACK_SHAPE, np.uint8)


def decode_frames_sampled(path: str, sampler) -> np.ndarray:
    """Decode a video and gather the sampler's frame indices.

    Decord can seek; for it we fetch only the sampled frames.  Other
    backends decode fully then gather.
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
    video = decode_all_frames(path)
    idx = np.asarray(sampler.indices(video.shape[0]))
    return video[idx]
