"""ctypes binding for the native C++ clip loader (x3d_tpu/native/).

A first-party native replacement for the tf.data hot path: TFRecord
(SequenceExample-of-JPEGs) streaming, sampled-frame JPEG decode, resize/
crop/flip — in C++ with a worker pool (see ``native/clip_loader.cc``).
Emits the same contract as ``InputReader.as_numpy`` with ``emit="uint8"``:
batches ``{"video": uint8 (B or B*V, T, S, S, 3), "label": int64 (B,)}``,
normalisation on device (``data/device.py``).

The shared library is built on first use with g++ (cached next to the
source); ``available()`` reports whether a toolchain + libjpeg/zlib are
present so callers can fall back to the tf.data pipeline.

Scope notes (documented divergences from the tf.data path):
  * training path: same sampler math and transform structure, but C++
    RNG streams differ from TF's — augmentation randomness is equivalent
    in distribution, not bit-identical.
  * eval path: deterministic with ``num_threads=1``; both eval crop
    protocols are supported (center crop and 3-crop left/center/right,
    crop-major output like the tf.data pipeline).
"""

from __future__ import annotations

import ctypes
import glob as _glob
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                    "clip_loader.cc")
_SO = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                   "_libx3dclip.so")

_build_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library if missing/stale; return error or None."""
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        return None
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           src, "-o", so, "-ljpeg", "-lz", "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"native build failed to run: {e}"
    if proc.returncode != 0:
        return f"native build failed:\n{proc.stderr[-2000:]}"
    return None


def _load():
    global _lib, _build_error
    with _build_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err:
            _build_error = err
            return None
        lib = ctypes.CDLL(os.path.abspath(_SO))
        lib.x3d_loader_open.restype = ctypes.c_void_p
        lib.x3d_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_ulonglong, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.x3d_loader_next.restype = ctypes.c_int
        lib.x3d_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_longlong)]
        lib.x3d_loader_sample_bytes.restype = ctypes.c_longlong
        lib.x3d_loader_sample_bytes.argtypes = [ctypes.c_void_p]
        lib.x3d_loader_error.restype = ctypes.c_char_p
        lib.x3d_loader_error.argtypes = [ctypes.c_void_p]
        lib.x3d_loader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    """Whether the native loader can be built/loaded on this host."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeClipLoader:
    """Iterate uint8 clip batches from TFRecord shards, natively.

    Mirrors ``InputReader``'s constructor surface for the fields it
    supports; ``__call__(file_pattern, batch_size)`` yields numpy batches.
    """

    def __init__(self, cfg, is_training: bool, seed: int = 0,
                 num_threads: Optional[int] = None,
                 replicate_flip_bug: bool = False,
                 num_views: Optional[int] = None,
                 shuffle: Optional[bool] = None,
                 loop: Optional[bool] = None,
                 host_id: int = 0, host_count: int = 1,
                 shuffle_buffer: Optional[int] = None,
                 shuffle_buffer_bytes: int = 1 << 30):
        if num_views is None:
            num_views = (1 if is_training
                         else cfg.TEST.NUM_TEMPORAL_VIEWS)
        self._crops = 1 if is_training else cfg.TEST.NUM_SPATIAL_CROPS
        if self._crops not in (1, 3):
            raise NotImplementedError(
                f"NUM_SPATIAL_CROPS must be 1 or 3, got {self._crops}")
        self._cfg = cfg
        self._train = bool(is_training)
        self._views = int(num_views)
        self._seed = int(seed)
        self._threads = int(num_threads
                            or min(8, (os.cpu_count() or 1)))
        self._flip_mode = (2 if replicate_flip_bug
                           else (1 if is_training else 0))
        self._shuffle = is_training if shuffle is None else bool(shuffle)
        self._loop = is_training if loop is None else bool(loop)
        self._host_id = int(host_id)
        self._host_count = int(host_count)
        # Sample-level shuffle reservoir (train) — the third shuffle level
        # on top of the C++ side's per-epoch shard reshuffle and 8-way
        # random shard interleave (clip_loader.cc RecordReader).  Depth
        # defaults to the reference's shuffle(16 * batch) analog
        # (dataloader.py:159), capped so the buffer of DECODED clips stays
        # under ``shuffle_buffer_bytes`` (1 GiB default; the reference
        # buffers serialized records, which are several MB each for K400,
        # so its effective memory footprint is comparable).
        self._shuffle_buffer = shuffle_buffer
        self._shuffle_buffer_bytes = int(shuffle_buffer_bytes)

    def __call__(self, file_pattern: str,
                 batch_size: int) -> Iterator[dict]:
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        paths = sorted(_glob.glob(file_pattern))
        if not paths:
            raise FileNotFoundError(f"no files match {file_pattern!r}")
        if self._host_count > 1:     # per-host shard slice, like InputReader
            paths = paths[self._host_id::self._host_count]
            if not paths:
                raise ValueError(
                    f"host {self._host_id}/{self._host_count} got no shards "
                    f"from {file_pattern!r}")
        cfg = self._cfg
        T = cfg.DATA.TEMP_DURATION
        S = (cfg.DATA.TRAIN_CROP_SIZE if self._train
             else cfg.DATA.TEST_CROP_SIZE)
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        handle = lib.x3d_loader_open(
            arr, len(paths), T, cfg.DATA.FRAME_RATE, self._views,
            self._crops, int(self._train), cfg.DATA.TRAIN_JITTER_SCALES[0],
            cfg.DATA.TRAIN_JITTER_SCALES[1], S, self._flip_mode,
            self._seed, self._threads, int(self._loop), int(self._shuffle))
        if not handle:
            raise RuntimeError("x3d_loader_open failed")
        clips = 1 if self._train else self._views * self._crops
        rng = np.random.default_rng(self._seed + 0x5bd1e995)
        pool: list = []      # shuffle reservoir of (video, label) samples
        if not self._shuffle:
            depth = 0
        elif self._shuffle_buffer is not None:
            depth = int(self._shuffle_buffer)
        else:
            per_sample = clips * T * S * S * 3
            depth = min(16 * batch_size,
                        max(64, self._shuffle_buffer_bytes // per_sample))
        try:
            sample_bytes = lib.x3d_loader_sample_bytes(handle)
            assert sample_bytes == clips * T * S * S * 3

            def pull(out_video):
                """Fetch one sample into out_video; returns label or None."""
                vptr = out_video.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_ubyte))
                lab = ctypes.c_longlong()
                rc = lib.x3d_loader_next(handle, vptr, ctypes.byref(lab))
                if rc < 0:
                    raise RuntimeError(
                        lib.x3d_loader_error(handle).decode())
                return lab.value if rc == 1 else None

            def next_sample():
                if not depth:
                    v = np.empty((clips, T, S, S, 3), np.uint8)
                    lab = pull(v)
                    return None if lab is None else (v, lab)
                while len(pool) < depth:
                    v = np.empty((clips, T, S, S, 3), np.uint8)
                    lab = pull(v)
                    if lab is None:
                        break
                    pool.append((v, lab))
                if not pool:
                    return None
                return pool.pop(int(rng.integers(len(pool))))

            while True:
                video = np.empty((batch_size * clips, T, S, S, 3), np.uint8)
                label = np.empty((batch_size,), np.int64)
                got = 0
                while got < batch_size:
                    s = next_sample()
                    if s is None:
                        return  # end of data: drop the partial batch,
                                # matching drop_remainder=True
                    video[got * clips:(got + 1) * clips] = s[0]
                    label[got] = s[1]
                    got += 1
                yield {"video": video, "label": label}
        finally:
            lib.x3d_loader_close(handle)

    # same surface as InputReader.device_iterator (pipeline.py)
    def device_iterator(self, file_pattern, batch_size, mesh=None,
                        dtype=None) -> Iterator[dict]:
        """Yield device-resident batches: uint8 shipped to the TPU, cast +
        normalised there (XLA fuses it into the first conv)."""
        import jax.numpy as jnp

        from x3d_tpu.data.device import device_prep
        from x3d_tpu.parallel import shard_batch

        prep = device_prep(self._cfg, dtype or jnp.bfloat16)
        for batch in self(file_pattern, batch_size):
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            batch["video"] = prep(batch["video"])
            yield batch
