"""Serving: AOT-compiled multi-view inference for production deployment.

The reference's only inference surface is ``model.evaluate`` under Keras
(``eval.py:83-89``).  For serving, this module provides an engine that:

  * ahead-of-time compiles the ensemble forward at a fixed clip-batch shape
    (no first-request compile stall; the executable is reusable),
  * accepts raw uint8 clips — normalisation runs on device, fused into the
    stem conv (4x less host->device transfer than float input),
  * pads ragged final batches to the compiled shape and un-pads results,
  * returns per-video class probabilities and top-k predictions.

Typical use::

    engine = InferenceEngine.from_checkpoint(cfg, "/path/model_dir")
    probs = engine.predict(clips_uint8)          # (videos*views, T, S, S, 3)
    top = engine.top_k(clips_uint8, k=5)
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from x3d_tpu.models import create_model, init_variables
from x3d_tpu.utils import normalize, tpu_compiler_options


class InferenceEngine:
    def __init__(self, cfg, variables, max_videos: int = 8, dtype=None,
                 time_fold=None):
        """
        Args:
          cfg: experiment config (TEST.* defines the view ensemble).
          variables: {'params', 'batch_stats'} tree.
          max_videos: compiled batch capacity in videos (videos*views clips).
          time_fold: None = auto — use the time-folded activation layout
            iff the compiled request is at most 16 clips.  Measured on
            v5e (tools/bench_serving, docs/PERF.md round 4): folding wins
            every single-video request (X3D-M 25.6 -> 17.2 ms, L 18.3 ->
            10.2 ms, 4-video L 55.5 -> 22.7 ms) because a handful of
            clips underfills the 128 batch lanes that folding repacks
            with B*T rows; at >= 40-clip requests the unfolded layout is
            ahead (XS 3.6x) and throughput eval stays unfolded
            (docs/PERF.md round 3).  Pass True/False to pin a layout,
            "mixed" for the half-folded trunk (the 56²/28² stages fold,
            the low-resolution tail runs unfolded — fold_stages=2), or
            "measure" to compile unfolded/folded/mixed and keep the
            layout the loop-slope probe measures fastest on THIS device
            at THIS request shape (3x compile time at engine build; the
            layouts are numerically identical, so autotuning is safe).
        """
        self._cfg = cfg
        dtype = dtype or (jnp.bfloat16 if jax.default_backend() == "tpu"
                          else jnp.float32)
        self._dtype = dtype
        self._views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        if time_fold is None:
            time_fold = max_videos * self._views <= 16
        self._max_videos = max_videos
        self._variables = variables
        mean, std = tuple(cfg.DATA.MEAN), tuple(cfg.DATA.STD)
        self._mean, self._std = mean, std
        shape = (max_videos * self._views, cfg.DATA.TEMP_DURATION,
                 cfg.DATA.TEST_CROP_SIZE, cfg.DATA.TEST_CROP_SIZE,
                 cfg.DATA.NUM_INPUT_CHANNELS)
        self.clip_shape = shape

        layouts = ([False, True, "mixed"] if time_fold == "measure"
                   else [time_fold])
        # Latency-critical compiles bypass the persistent compilation
        # cache: cache-enabled compiles run ~1.8x slower for lane-starved
        # folded serving shapes (measured round 5 — utils.py
        # without_compilation_cache docstring).
        from x3d_tpu.utils import without_compilation_cache
        self._no_cache = without_compilation_cache
        with without_compilation_cache():
            self._build_layouts(layouts, cfg, dtype, mean, std, shape)

    def _build_layouts(self, layouts, cfg, dtype, mean, std, shape):
        variables = self._variables
        best = None
        for layout in layouts:
            fold, stages = {False: (False, 4), True: (True, 4),
                            "mixed": (True, 2)}[layout]
            model = create_model(cfg, dtype=dtype, time_fold=fold,
                                 fold_stages=stages)

            def forward(variables, clips_u8, _model=model):
                x = normalize(clips_u8.astype(jnp.float32), mean, std)
                return _model.apply(variables, x.astype(dtype), train=False)

            compiled = (
                jax.jit(forward, compiler_options=tpu_compiler_options())
                .lower(jax.eval_shape(lambda: variables),
                       jax.ShapeDtypeStruct(shape, jnp.uint8))
                .compile()
            )
            self._model, self._forward, self._compiled = (
                model, forward, compiled)
            self.layout = layout
            if len(layouts) > 1:
                # chain length scaled to the request: short forwards need a
                # long loop-slope chain to clear program-launch noise
                # (tools/bench_serving._BASE_ITERS rationale)
                iters = max(8, min(128, 1024 // max(1, shape[0])))
                t = self.device_latency_s(iters=iters, outer=2)
                if best is None or t < best[0]:
                    best = (t, layout, model, forward, compiled)
        if best is not None:
            _, self.layout, self._model, self._forward, self._compiled = best

    # ------------------------------------------------------------ builders
    @classmethod
    def from_checkpoint(cls, cfg, model_dir: str, max_videos: int = 8,
                        dtype=None, time_fold=None) -> "InferenceEngine":
        """Load the latest checkpoint written by the train CLI."""
        import os

        from x3d_tpu.train import create_train_state
        from x3d_tpu.train.checkpoint import CheckpointManager

        model = create_model(cfg, dtype=dtype or jnp.bfloat16)
        sample = jnp.zeros((1, cfg.DATA.TEMP_DURATION, 32, 32, 3))
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample,
                                   steps_per_epoch=1)
        mgr = CheckpointManager(os.path.join(model_dir, "checkpoints"))
        state = mgr.restore_weights_only(state)
        mgr.close()
        return cls(cfg, {"params": state.params,
                         "batch_stats": state.batch_stats},
                   max_videos=max_videos, dtype=dtype, time_fold=time_fold)

    @classmethod
    def random_init(cls, cfg, max_videos: int = 8,
                    dtype=None, time_fold=None) -> "InferenceEngine":
        """Engine with fresh weights (smoke tests / benchmarking)."""
        model = create_model(cfg, dtype=dtype or jnp.bfloat16)
        x = jnp.zeros((1, cfg.DATA.TEMP_DURATION, cfg.DATA.TEST_CROP_SIZE,
                       cfg.DATA.TEST_CROP_SIZE, 3))
        variables = init_variables(model, jax.random.PRNGKey(0), x)
        return cls(cfg, variables, max_videos=max_videos, dtype=dtype,
                   time_fold=time_fold)

    # ------------------------------------------------------------ inference
    @property
    def views(self) -> int:
        return self._views

    def predict(self, clips_u8: np.ndarray) -> np.ndarray:
        """(videos*views, T, S, S, 3) uint8 -> (videos, classes) float probs.

        Ragged inputs (fewer than max_videos) are padded to the compiled
        shape and un-padded on return.
        """
        n_clips = clips_u8.shape[0]
        if n_clips % self._views:
            raise ValueError(
                f"clip count {n_clips} not divisible by views={self._views}")
        n_videos = n_clips // self._views
        if n_videos > self._max_videos:
            raise ValueError(
                f"{n_videos} videos exceeds engine capacity "
                f"{self._max_videos}; split the request")
        cap = self._max_videos * self._views
        if n_clips < cap:
            pad = np.zeros((cap - n_clips,) + tuple(clips_u8.shape[1:]),
                           np.uint8)
            clips_u8 = np.concatenate([np.asarray(clips_u8), pad], axis=0)
        probs = self._compiled(self._variables, jnp.asarray(clips_u8))
        return np.asarray(probs[:n_videos])

    def top_k(self, clips_u8: np.ndarray, k: int = 5
              ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (indices (videos, k), probabilities (videos, k))."""
        probs = self.predict(clips_u8)
        idx = np.argsort(-probs, axis=-1)[:, :k]
        return idx, np.take_along_axis(probs, idx, axis=-1)

    # ------------------------------------------------------------ benchmarks
    def device_latency_s(self, iters: int = 8, outer: int = 3) -> float:
        """Device execution time of ONE request at the compiled capacity.

        Uses the in-program loop-slope method (``ops/timing.py``): K
        requests chained through a data-dependent scalar token inside a
        single XLA program, measured at two K — so the host's per-dispatch
        overhead (a noisy 2-40 ms tunnel artifact on this container, NOT
        representative of production) and the device->host fetch cancel
        exactly.  This is the number a latency SLO is written against: the
        TPU forward time for ``max_videos`` videos x ``views`` clips.
        """
        from x3d_tpu.ops.timing import time_fn
        from x3d_tpu.utils import normalize as _normalize

        mean, std = self._mean, self._std
        model, dtype = self._model, self._dtype

        def request(tok, clips_u8, variables):
            # the token perturbs the input (sub-quantization magnitude), so
            # iteration i+1 cannot start before i's probabilities exist
            x = _normalize(clips_u8.astype(jnp.float32) + tok, mean, std)
            return model.apply(variables, x.astype(dtype), train=False)

        clips = jnp.zeros(self.clip_shape, jnp.uint8)
        with self._no_cache():   # see __init__: cached compiles measure slow
            return time_fn(request, jnp.zeros((), jnp.float32), clips,
                           self._variables, iters=iters, outer=outer)

    def wall_latency_s(self, samples: int = 20) -> float:
        """Median wall-clock per request through the AOT executable,
        dispatch and device->host result fetch included.  On this
        container the remote-tunnel dispatch dominates small requests —
        report alongside :meth:`device_latency_s`, not instead of it."""
        clips = jnp.zeros(self.clip_shape, jnp.uint8)
        times = []
        np.asarray(self._compiled(self._variables, clips))  # warm path
        for _ in range(samples):
            t0 = time.perf_counter()
            np.asarray(self._compiled(self._variables, clips))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))
