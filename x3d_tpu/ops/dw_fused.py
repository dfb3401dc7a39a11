"""Fused BN-affine+ReLU -> depthwise 3D conv -> BN-stats Pallas kernel.

The signature op of X3D is the bottleneck's T×3×3 ``groups=C`` conv
(reference ``model.py:259-267``), sandwiched between two BatchNorms.  The
roofline analysis of the X3D-M B=128 train step (``tools/roofline.py``,
round 2, v5e) shows XLA already fuses aggressively around it — the dw conv
fusions read the *raw* previous-conv output and apply BN+ReLU inline, and
emit the next BN's stat sums alongside the conv output — but its conv
emitter computes in fixed output windows whose input halos re-read every
input 2.3-3.4x (``input_window_bounds`` vs ``output_window_bounds`` in the
fusion backend configs), putting those fusions at 24-55% of their
cost-analysis bytes.  ~160 ms of the 532 ms step is that halo re-read.

This kernel replaces the whole segment with one-pass streaming:

    y = dwconv3d(relu(a*x + b), k),  p = sum_thw(y),  s2 = sum_thw(y^2)

  * ``a, b`` are (C, B) per-channel(-per-sample) BN-normalize coefficients
    computed OUTSIDE from batch (or running) statistics — all BN chain-rule
    complexity stays in JAX, flowing through the a/b cotangents.
  * ``p``/``s2`` are per-(channel, sample) f32 sums over (T, H, W): the
    next BN's batch statistics AND the Squeeze-Excite global pool derive
    from them, so neither needs another pass over y.
  * Layout is batch-minor (T, H, W, C, B) — the logical transpose of NDHWC
    is a layout bitcast, because at production batch sizes XLA assigns
    batch-minormost layouts to every large activation (batch on the
    128-wide lanes; see ``ops/dw_batchminor.py``'s analysis).
  * The input streams through VMEM as a ring of (kt+1) H-chunk windows,
    one DMA set per (plane, chunk): each element is read from HBM exactly
    once per H-pass.  Windows carry a kh//2-row halo (two extra single-row-
    block DMAs, skipped at image bounds) and a kw//2-column pad; the
    arrival transform zeroes out-of-image rows/columns, so every tap is a
    full-width slice and SAME zero-padding is implicit — no padded HBM
    copy is ever materialised (those pad passes cost 26 ms/step in the
    ``dw_batchminor`` experiment).
  * The backward is ONE streaming pass producing dx, dk, and the (C, B)
    reduction sums for the BN-affine gradients: it rings (x -> u) and
    (gy, y -> g_eff) windows, computes du = conv(g_eff, flip(k)), masks
    through ReLU, and accumulates dk[tap] = sum(u_shift * g_eff) — versus
    XLA's separate dx-conv and dk fusions, each with their own halo
    re-reads.

Supported: stride 1, SAME padding, odd kernel dims (X3D's 22 stride-1
bottleneck convs).  Stage-entry stride-2 convs and non-TPU backends use
the unfused composition (see ``x3d_tpu.models.x3d``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Run kernels in the Pallas interpreter (CPU tests).
INTERPRET = False

# Tap-sum arithmetic: None = the input dtype (bf16 packed vector math in
# production; f32 when callers pass f32, e.g. tests), or jnp.float32 to
# force XLA-conv-identical accumulate precision at ~half the vector rate.
TAP_DTYPE = None

_VMEM_BUDGET = 80 * 1024 * 1024

# Bottleneck-segment dispatch mode:
#   False     — always the reference composition (nn.BatchNorm + XLA conv)
#   "pallas"  — this module's fused kernel (forced; tests use interpret)
#   "aligned" — coefs-style BN + sublane-aligned channel tiles, XLA dw conv
#               (the layout that lets ops/pw_batchminor run pad-free)
#   "auto"    — pick per backend/batch (resolved in segment_mode)
_ENABLED = "auto"
_MODES = (False, "pallas", "aligned", "auto")


def set_enabled(mode) -> None:
    """Globally select the bottleneck-segment mode (config/bench/test)."""
    global _ENABLED
    if mode is True:
        mode = "pallas"
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    _ENABLED = mode


def get_enabled():
    """Current bottleneck-segment mode (for save/restore around tests)."""
    return _ENABLED


def segment_mode(batch: int, stride: int, bn_groups: int,
                 temp_kernel: int) -> str:
    """Resolve the segment implementation for one bottleneck instance.

    Only stride-1 / odd-kernel segments with the batch divisible by the
    BN group count are eligible (stage-entry stride-2 convs keep the
    reference composition; grouped/per-replica BN is supported via
    per-sample coefficient columns).  "auto" engages the aligned layout on a real TPU with
    full 128-lane (global) batches; it is plain XLA ops and SPMD-safe
    under pjit on any mesh.  The Pallas kernel must be requested
    explicitly (it trails the XLA dw emitter — see docs/PERF.md) and has
    no SPMD partitioning rule: ``tools/common.setup_runtime`` downgrades
    it to "aligned" on multi-device meshes.
    """
    if (_ENABLED is False or stride != 1 or temp_kernel % 2 == 0
            or bn_groups < 1 or batch % bn_groups):
        return "off"
    if _ENABLED in ("pallas", "aligned"):
        return _ENABLED
    import jax as _jax
    if _jax.default_backend() == "tpu" and batch % 128 == 0:
        return "aligned"
    return "off"


def applicable(batch: int, stride: int, bn_groups: int) -> bool:
    """Back-compat shim: whether any fused segment mode applies."""
    return segment_mode(batch, stride, bn_groups, 3) != "off"


def _pick_hc(h: int, row_bytes: int, halo: int, n_windows: int,
             acc_bytes_per_row: int) -> int:
    """Largest divisor of h whose ring windows + accumulators fit VMEM."""
    best = 1
    for hc in range(1, h + 1):
        if h % hc:
            continue
        need = (n_windows * (hc + 2 * halo) * row_bytes
                + hc * acc_bytes_per_row)
        if need <= _VMEM_BUDGET:
            best = hc
    return best


# ---------------------------------------------------------------- ring I/O


class _Ring:
    """A ring of H-chunk plane windows with halo rows and padded columns.

    Window shape: (hc + 2*halo, W + 2*wpad, C, B); plane q's window holds
    image rows [hi*hc - halo, hi*hc + hc + halo) (clamped) in columns
    [wpad, wpad + W).  ``transform`` maps the raw window to its stored form
    and runs exactly once per arrival; out-of-image rows/columns are zeroed
    there (masked), so taps never need edge-special cases.
    """

    def __init__(self, srcs, ring_ref, sems, hi, hc, halo, wpad, W, H, nH,
                 nslots, transform):
        self.srcs = srcs                  # list of HBM refs DMA'd per plane
        self.ring = ring_ref              # (nslots, n_srcs, rows, Wp, C, B)
        self.sems = sems                  # (nslots, n_srcs, 3)
        self.hi, self.hc, self.halo, self.wpad = hi, hc, halo, wpad
        self.W, self.H, self.nH, self.nslots = W, H, nH, nslots
        self.transform = transform        # (list of raw windows, mask) -> u

    def _copies(self, q, slot):
        hi, hc, halo, wpad, W = self.hi, self.hc, self.halo, self.wpad, self.W
        out = []
        for si, src in enumerate(self.srcs):
            out.append((None, pltpu.make_async_copy(
                src.at[q, pl.ds(hi * hc, hc), :],
                self.ring.at[slot, si, pl.ds(halo, hc), pl.ds(wpad, W)],
                self.sems.at[slot, si, 0])))
            if halo:
                out.append(((hi > 0), pltpu.make_async_copy(
                    src.at[q, pl.ds(hi * hc - halo, halo), :],
                    self.ring.at[slot, si, pl.ds(0, halo), pl.ds(wpad, W)],
                    self.sems.at[slot, si, 1])))
                out.append(((hi < self.nH - 1), pltpu.make_async_copy(
                    src.at[q, pl.ds(hi * hc + hc, halo), :],
                    self.ring.at[slot, si, pl.ds(halo + hc, halo),
                                 pl.ds(wpad, W)],
                    self.sems.at[slot, si, 2])))
        return out

    def start(self, q, slot):
        for cond, copy in self._copies(q, slot):
            if cond is None:
                copy.start()
            else:
                pl.when(cond)(lambda c=copy: c.start())

    def arrive(self, q, slot):
        """Wait plane q's DMAs (slot static) and store transform(windows)."""
        for cond, copy in self._copies(q, slot):
            if cond is None:
                copy.wait()
            else:
                pl.when(cond)(lambda c=copy: c.wait())
        raw = [self.ring[slot, si] for si in range(len(self.srcs))]
        shp = raw[0].shape                                   # (rows, Wp, C, B)
        # masks built from per-axis iotas (broadcast, not full-window i32s)
        rows = jax.lax.broadcasted_iota(jnp.int32, (shp[0], 1, 1, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, shp[1], 1, 1), 1)
        grow = self.hi * self.hc - self.halo + rows
        mask = ((grow >= 0) & (grow < self.H)
                & (cols >= self.wpad) & (cols < self.wpad + self.W))
        self.ring[slot, 0] = self.transform(raw, mask)

    def window_slot(self, slot):
        """Resident window at a STATIC ring slot (phase-unrolled compute:
        no dynamic indexing, no validity select — see _ring_io_static)."""
        return self.ring.at[slot, 0]

    def zero_slot(self, slot):
        """Zero one slot's window (an out-of-range plane, written at slot-
        recycle time so reads never need a validity select)."""
        self.ring[slot, 0] = jnp.zeros(self.ring.shape[2:], self.ring.dtype)

def _ring_io_static(rings, t, T, kt, lo_t, nslots):
    """Plane schedule maintaining the STATIC-slot invariant: before compute
    at step t, slot (q mod nslots) holds plane q's transformed data for
    every q in [t-lo_t, t+hi_t] — zeros when q is outside [0, T).  Compute
    can then index the ring with compile-time slots per t-phase
    (t mod nslots), with no per-tap dynamic-slot selects (the round-2
    zero-slot indirection lowered to whole-window copies — docs/PERF.md
    row 5).

    Invalid planes are zeroed at slot-recycle time instead of read time:
    at t==0 the slots of planes -lo_t..-1 (static), afterwards the slot of
    the incoming plane t+hi_t when it is >= T (one memset per trailing
    step, amortised over all taps that read it)."""
    hi_t = kt - 1 - lo_t

    @pl.when(t == 0)
    def _():
        for q in range(hi_t + 1):                      # static planes
            for ring in rings:
                ring.start(q, q % nslots)
        q = hi_t + 1
        @pl.when(q < T)
        def _():
            for ring in rings:
                ring.start(q, q % nslots)
        for q in range(-lo_t, 0):                      # static zero planes
            for ring in rings:
                ring.zero_slot(q % nslots)
        for q in range(hi_t + 1):
            for ring in rings:
                ring.arrive(q, q % nslots)

    @pl.when(t > 0)
    def _():
        q = t + hi_t                                   # traced
        @pl.when(q < T)
        def _():
            for k in range(nslots):                    # unroll traced slot
                @pl.when(q % nslots == k)
                def _(k=k):
                    for ring in rings:
                        ring.arrive(q, k)
        @pl.when(q >= T)
        def _():
            for k in range(nslots):
                @pl.when(q % nslots == k)
                def _(k=k):
                    for ring in rings:
                        ring.zero_slot(k)
        qp = t + hi_t + 1
        @pl.when(qp < T)
        def _():
            for k in range(nslots):
                @pl.when(qp % nslots == k)
                def _(k=k):
                    for ring in rings:
                        ring.start(qp, k)


def _conv_row_ph(ring, ph, nslots, kt, kh, kw, lo_t, W, wk, r,
                 tap_dtype=jnp.float32):
    """Taps sum for output row r: out[w] = sum u[q][r+dh][w+dw] * wk[tap],
    phase-static: under the caller's ``t % nslots == ph`` branch, plane
    t+dt-lo_t lives at the COMPILE-TIME slot (ph+dt-lo_t) mod nslots (the
    _ring_io_static invariant, with out-of-range planes zeroed at recycle
    time) — no dynamic slot index, no validity select on the read path.
    Windows are zero-padded in W/H, so every tap is an unconditional
    full-W slice.  ``tap_dtype`` selects the accumulate precision: the
    input dtype keeps bf16 packed (16,128) vector arithmetic (2 elems/
    lane-cycle); float32 is exactly the XLA-conv numerics."""
    total = None
    for dt in range(kt):
        win = ring.window_slot((ph + dt - lo_t) % nslots)
        for dh in range(kh):
            row = win[r + dh].astype(tap_dtype)              # (Wp, C, B)
            for dw in range(kw):
                tap = (dt * kh + dh) * kw + dw
                term = row[dw:dw + W] * wk[tap][None].astype(tap_dtype)
                total = term if total is None else total + term
    return total.astype(jnp.float32)


# ----------------------------------------------------------------- forward


def _fwd_kernel(xt_hbm, a_ref, b_ref, wk_ref,
                y_ref, p_ref, s2_ref,
                ring, sems, p_acc, s2_acc, *,
                kt, kh, kw, T, H, hc, W, C, B, store_dtype):
    hi = pl.program_id(0)
    t = pl.program_id(1)
    nH = pl.num_programs(0)
    halo, wpad = kh // 2, kw // 2
    lo_t = kt // 2
    nslots = kt + 1

    def xform(raw, mask):
        u = jax.nn.relu(raw[0].astype(jnp.float32)
                        * a_ref[...][None, None] + b_ref[...][None, None])
        return jnp.where(mask, u, 0.0).astype(store_dtype)

    uring = _Ring([xt_hbm], ring, sems, hi, hc, halo, wpad, W, H, nH,
                  nslots, xform)

    @pl.when(jnp.logical_and(hi == 0, t == 0))
    def _():
        p_acc[...] = jnp.zeros_like(p_acc)
        s2_acc[...] = jnp.zeros_like(s2_acc)

    _ring_io_static([uring], t, T, kt, lo_t, nslots)

    for ph in range(nslots):
        @pl.when(t % nslots == ph)
        def _(ph=ph):
            for r in range(hc):
                acc = _conv_row_ph(uring, ph, nslots, kt, kh, kw, lo_t, W,
                                   wk_ref, r,
                                   tap_dtype=TAP_DTYPE or store_dtype)
                y = acc.astype(y_ref.dtype)
                y_ref[0, r] = y
                y32 = y.astype(jnp.float32)
                p_acc[...] += jnp.sum(y32, axis=0)
                s2_acc[...] += jnp.sum(y32 * y32, axis=0)

    @pl.when(jnp.logical_and(hi == nH - 1, t == T - 1))
    def _():
        p_ref[...] = p_acc[...]
        s2_ref[...] = s2_acc[...]


# ---------------------------------------------------------------- backward


def _bwd_kernel(xt_hbm, gyt_hbm, yt_hbm, a_ref, b_ref, gp_ref, gs22_ref,
                wkf_ref,
                dx_ref, dk_ref, dzs_ref, duu_ref,
                uring_ref, usems, gring_ref, gsems, dk_acc, dzs_acc, duu_acc,
                *, kt, kh, kw, T, H, hc, W, C, B, store_dtype):
    hi = pl.program_id(0)
    t = pl.program_id(1)
    nH = pl.num_programs(0)
    halo, wpad = kh // 2, kw // 2
    lo_t = kt // 2
    nslots = kt + 1

    def u_xform(raw, mask):
        u = jax.nn.relu(raw[0].astype(jnp.float32)
                        * a_ref[...][None, None] + b_ref[...][None, None])
        return jnp.where(mask, u, 0.0).astype(store_dtype)

    def g_xform(raw, mask):
        g = (raw[0].astype(jnp.float32) + gp_ref[...][None, None]
             + gs22_ref[...][None, None] * raw[1].astype(jnp.float32))
        return jnp.where(mask, g, 0.0).astype(store_dtype)

    uring = _Ring([xt_hbm], uring_ref, usems, hi, hc, halo, wpad, W, H, nH,
                  nslots, u_xform)
    gring = _Ring([gyt_hbm, yt_hbm], gring_ref, gsems, hi, hc, halo, wpad,
                  W, H, nH, nslots, g_xform)

    @pl.when(jnp.logical_and(hi == 0, t == 0))
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dzs_acc[...] = jnp.zeros_like(dzs_acc)
        duu_acc[...] = jnp.zeros_like(duu_acc)

    _ring_io_static([uring, gring], t, T, kt, lo_t, nslots)

    # flipped-tap weights give du = conv(g_eff, flip(k)) with the SAME
    # window/slice geometry as the forward (odd kernels)
    for ph in range(nslots):
        @pl.when(t % nslots == ph)
        def _(ph=ph):
            for r in range(hc):
                du = _conv_row_ph(gring, ph, nslots, kt, kh, kw, lo_t, W,
                                  wkf_ref, r,
                                  tap_dtype=TAP_DTYPE or store_dtype)
                u_c = (uring.window_slot(ph)[r + halo, wpad:wpad + W]
                       .astype(jnp.float32))
                dz = jnp.where(u_c > 0, du, 0.0)            # (W, C, B) f32
                dx_ref[0, r] = (dz * a_ref[...][None]).astype(dx_ref.dtype)
                dzs_acc[...] += jnp.sum(dz, axis=0)
                duu_acc[...] += jnp.sum(dz * u_c, axis=0)

                g_c = (gring.window_slot(ph)[r + halo, wpad:wpad + W]
                       .astype(jnp.float32))
                for dt in range(kt):
                    win = uring.window_slot((ph + dt - lo_t) % nslots)
                    for dh in range(kh):
                        u_row = win[r + dh].astype(jnp.float32)  # (Wp, C, B)
                        for dw in range(kw):
                            tap = (dt * kh + dh) * kw + dw
                            dk_acc[tap] += jnp.sum(
                                u_row[dw:dw + W] * g_c, axis=0)

    @pl.when(jnp.logical_and(hi == nH - 1, t == T - 1))
    def _():
        dk_ref[...] = dk_acc[...]
        dzs_ref[...] = dzs_acc[...]
        duu_ref[...] = duu_acc[...]


# ------------------------------------------- backward-only (XLA fwd) kernel


def _pbwd_kernel(ut_hbm, gyt_hbm, wkf_ref, du_ref, dk_ref,
                 uring_ref, usems, gring_ref, gsems, dk_acc, *,
                 kt, kh, kw, T, H, hc, W, C, B, store_dtype):
    """One streaming pass producing du = conv(gy, flip(k)) and the per-tap
    dk sums for a PLAIN depthwise conv (no BN affine / ReLU / stat terms —
    the aligned path keeps those in XLA).  The forward stays on XLA's
    emitter; only the backward (the measured ~75%-of-ceiling direction)
    runs here.  Phase-static ring reads throughout."""
    hi = pl.program_id(0)
    t = pl.program_id(1)
    nH = pl.num_programs(0)
    halo, wpad = kh // 2, kw // 2
    lo_t = kt // 2
    nslots = kt + 1

    def ident(raw, mask):
        return jnp.where(mask, raw[0], jnp.zeros((), raw[0].dtype))

    uring = _Ring([ut_hbm], uring_ref, usems, hi, hc, halo, wpad, W, H, nH,
                  nslots, ident)
    gring = _Ring([gyt_hbm], gring_ref, gsems, hi, hc, halo, wpad, W, H, nH,
                  nslots, ident)

    @pl.when(jnp.logical_and(hi == 0, t == 0))
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)

    _ring_io_static([uring, gring], t, T, kt, lo_t, nslots)

    for ph in range(nslots):
        @pl.when(t % nslots == ph)
        def _(ph=ph):
            for r in range(hc):
                du = _conv_row_ph(gring, ph, nslots, kt, kh, kw, lo_t, W,
                                  wkf_ref, r,
                                  tap_dtype=TAP_DTYPE or store_dtype)
                du_ref[0, r] = du.astype(du_ref.dtype)
                g_c = (gring.window_slot(ph)[r + halo, wpad:wpad + W]
                       .astype(jnp.float32))
                for dt in range(kt):
                    win = uring.window_slot((ph + dt - lo_t) % nslots)
                    for dh in range(kh):
                        u_row = win[r + dh].astype(jnp.float32)  # (Wp, C, B)
                        for dw in range(kw):
                            tap = (dt * kh + dh) * kw + dw
                            dk_acc[tap] += jnp.sum(
                                u_row[dw:dw + W] * g_c, axis=0)

    @pl.when(jnp.logical_and(hi == nH - 1, t == T - 1))
    def _():
        dk_ref[...] = dk_acc[...]


def _run_pbwd(u, gy, kernel):
    B, T, H, W, C, kt, kh, kw = _dims(u, kernel)
    halo, wpad = kh // 2, kw // 2
    nslots = kt + 1
    taps = kt * kh * kw
    Wp = W + 2 * wpad
    row_bytes = Wp * C * B * u.dtype.itemsize
    hc = _pick_hc(H, row_bytes, halo, 2 * nslots,
                  acc_bytes_per_row=W * C * B * 8)
    ut, gyt = _bm_views(u), _bm_views(gy.astype(u.dtype))
    wkf = _tap_weights(kernel[::-1, ::-1, ::-1], B)
    kern = functools.partial(
        _pbwd_kernel, kt=kt, kh=kh, kw=kw, T=T, H=H, hc=hc, W=W, C=C, B=B,
        store_dtype=u.dtype)
    du, dk_l = pl.pallas_call(
        kern,
        grid=(H // hc, T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, hc, W, C, B), lambda hi, t: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, W, C, B), u.dtype),
            jax.ShapeDtypeStruct((taps, C, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, 1, hc + 2 * halo, Wp, C, B), u.dtype),
            pltpu.SemaphoreType.DMA((nslots, 1, 3)),
            pltpu.VMEM((nslots, 1, hc + 2 * halo, Wp, C, B), u.dtype),
            pltpu.SemaphoreType.DMA((nslots, 1, 3)),
            pltpu.VMEM((taps, C, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=INTERPRET,
    )(ut, gyt, wkf)
    return jnp.transpose(du, (4, 0, 1, 2, 3)), dk_l


@jax.custom_vjp
def dw_conv_pbwd(u, kernel):
    """Depthwise 3D conv (stride 1, SAME, odd dims): XLA's forward emitter
    with a one-pass Pallas backward (du + dk in a single stream over
    (u, gy) — vs XLA's separate dx conv and weight-grad conv).  The
    dispatch hook is ``ops.depthwise`` impl ``"pbwd"``."""
    return jax.lax.conv_general_dilated(
        u, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=u.shape[-1],
        preferred_element_type=u.dtype)


def _pbwd_fwd_rule(u, kernel):
    return dw_conv_pbwd(u, kernel), (u, kernel)


def _pbwd_bwd_rule(res, gy):
    u, kernel = res
    du, dk_l = _run_pbwd(u, gy, kernel)
    kt, kh, kw = kernel.shape[:3]
    dk = dk_l.sum(axis=2).reshape(kt, kh, kw, 1, -1).astype(kernel.dtype)
    return du, dk


dw_conv_pbwd.defvjp(_pbwd_fwd_rule, _pbwd_bwd_rule)


# ------------------------------------------------------------ host wrappers


def _bm_views(x):
    """NDHWC -> batch-minor (T, H, W, C, B) logical view (layout bitcast
    in-step: XLA keeps large activations batch-minormost at these batch
    sizes)."""
    return jnp.transpose(x, (1, 2, 3, 4, 0))


def _tap_weights(kernel, B):
    """(kt,kh,kw,1,C) -> (taps, C, B) f32 broadcast over lanes."""
    kt, kh, kw = kernel.shape[:3]
    C = kernel.shape[4]
    w = kernel.reshape(kt * kh * kw, C).astype(jnp.float32)
    return jnp.broadcast_to(w[:, :, None], (kt * kh * kw, C, B))


def _dims(x, kernel):
    B, T, H, W, C = x.shape
    kt, kh, kw = kernel.shape[:3]
    if kt % 2 == 0 or kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("dw_fused supports odd kernel dims only")
    if T < kt:
        # the plane schedule's static t==0 DMA starts assume planes
        # 0..kt-1-lo_t exist; T < kt would read out of bounds of the
        # (T,H,W,C,B) HBM buffer (all X3D variants have T >= kt)
        raise ValueError(f"dw_fused requires T >= kt (got T={T}, kt={kt})")
    return B, T, H, W, C, kt, kh, kw


def _run_fwd(x, a_cb, b_cb, kernel):
    B, T, H, W, C, kt, kh, kw = _dims(x, kernel)
    halo, wpad = kh // 2, kw // 2
    nslots = kt + 1
    Wp = W + 2 * wpad
    row_bytes = Wp * C * B * x.dtype.itemsize
    hc = _pick_hc(H, row_bytes, halo, nslots,
                  acc_bytes_per_row=W * C * B * 6)
    xt = _bm_views(x)
    wk = _tap_weights(kernel, B)
    kern = functools.partial(
        _fwd_kernel, kt=kt, kh=kh, kw=kw, T=T, H=H, hc=hc, W=W, C=C, B=B,
        store_dtype=x.dtype)
    y, p, s2 = pl.pallas_call(
        kern,
        grid=(H // hc, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hc, W, C, B), lambda hi, t: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, W, C, B), x.dtype),
            jax.ShapeDtypeStruct((C, B), jnp.float32),
            jax.ShapeDtypeStruct((C, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, 1, hc + 2 * halo, Wp, C, B), x.dtype),
            pltpu.SemaphoreType.DMA((nslots, 1, 3)),
            pltpu.VMEM((C, B), jnp.float32),
            pltpu.VMEM((C, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=INTERPRET,
    )(xt, a_cb, b_cb, wk)
    return jnp.transpose(y, (4, 0, 1, 2, 3)), p, s2


def _run_bwd(x, a_cb, b_cb, kernel, y, gy, gp, gs2):
    B, T, H, W, C, kt, kh, kw = _dims(x, kernel)
    halo, wpad = kh // 2, kw // 2
    nslots = kt + 1
    taps = kt * kh * kw
    Wp = W + 2 * wpad
    row_bytes = Wp * C * B * x.dtype.itemsize
    hc = _pick_hc(H, row_bytes, halo, 3 * nslots,
                  acc_bytes_per_row=W * C * B * 8)
    xt, gyt, yt = _bm_views(x), _bm_views(gy.astype(x.dtype)), _bm_views(y)
    wkf = _tap_weights(kernel[::-1, ::-1, ::-1], B)
    kern = functools.partial(
        _bwd_kernel, kt=kt, kh=kh, kw=kw, T=T, H=H, hc=hc, W=W, C=C, B=B,
        store_dtype=x.dtype)
    dx, dk_l, dzs, duu = pl.pallas_call(
        kern,
        grid=(H // hc, T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[
            pl.BlockSpec((1, hc, W, C, B), lambda hi, t: (t, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, W, C, B), x.dtype),
            jax.ShapeDtypeStruct((taps, C, B), jnp.float32),
            jax.ShapeDtypeStruct((C, B), jnp.float32),
            jax.ShapeDtypeStruct((C, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, 1, hc + 2 * halo, Wp, C, B), x.dtype),
            pltpu.SemaphoreType.DMA((nslots, 1, 3)),
            pltpu.VMEM((nslots, 2, hc + 2 * halo, Wp, C, B), x.dtype),
            pltpu.SemaphoreType.DMA((nslots, 2, 3)),
            pltpu.VMEM((taps, C, B), jnp.float32),
            pltpu.VMEM((C, B), jnp.float32),
            pltpu.VMEM((C, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=INTERPRET,
    )(xt, gyt, yt, a_cb, b_cb, gp, 2.0 * gs2, wkf)
    return jnp.transpose(dx, (4, 0, 1, 2, 3)), dk_l, dzs, duu


# ------------------------------------------------------------- public op


@jax.custom_vjp
def dw_bn_act_conv(x, a_cb, b_cb, kernel):
    """y = dwconv(relu(a*x + b), kernel); p = sum_thw y; s2 = sum_thw y^2.

    Args:
      x: (B, T, H, W, C) raw (pre-BN) input.
      a_cb, b_cb: (C, B) f32 normalize coefficients (per-sample columns
        support grouped/per-replica BN).
      kernel: (kt, kh, kw, 1, C) depthwise taps (odd dims, stride 1, SAME).

    Returns:
      y: (B, T, H, W, C) in x.dtype;  p, s2: (C, B) f32.

    Gradient caveat: the backward reconstructs x from the stored
    activation u = relu(a*x + b), so wherever a BN scale column is exactly
    zero the a-gradient is forced to 0 (the reconstruction x = (u-b)/a is
    undefined).  A scale that reaches exactly 0 therefore cannot recover
    under this opt-in pallas mode; the default unfused/aligned paths have
    the true gradient.  (Never observed in practice — BN gammas init at 1
    and L2 never drives them exactly to 0 in finite steps.)
    """
    return _run_fwd(x, a_cb, b_cb, kernel)


def _fwd_rule(x, a_cb, b_cb, kernel):
    y, p, s2 = _run_fwd(x, a_cb, b_cb, kernel)
    return (y, p, s2), (x, a_cb, b_cb, kernel, y)


def _bwd_rule(res, cot):
    x, a_cb, b_cb, kernel, y = res
    gy, gp, gs2 = cot
    dx, dk_l, dzs, duu = _run_bwd(x, a_cb, b_cb, kernel, y, gy, gp, gs2)
    kt, kh, kw = kernel.shape[:3]
    dk = dk_l.sum(axis=2).reshape(kt, kh, kw, 1, -1).astype(kernel.dtype)
    # da = sum dz*x; with u = relu(a*x+b) stored, x = (u - b)/a where dz!=0
    da = jnp.where(a_cb != 0, (duu - b_cb * dzs) / a_cb, 0.0)
    return dx, da, dzs, dk


dw_bn_act_conv.defvjp(_fwd_rule, _bwd_rule)


def reference(x, a_cb, b_cb, kernel):
    """Pure-JAX composition with identical semantics (tests / fallback)."""
    B = x.shape[0]
    C = x.shape[-1]
    a = jnp.transpose(a_cb).reshape(B, 1, 1, 1, C)
    b = jnp.transpose(b_cb).reshape(B, 1, 1, 1, C)
    u = jax.nn.relu(x.astype(jnp.float32) * a + b).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        u, kernel.astype(u.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C)
    y32 = y.astype(jnp.float32)
    p = jnp.transpose(jnp.sum(y32, axis=(1, 2, 3)))
    s2 = jnp.transpose(jnp.sum(y32 * y32, axis=(1, 2, 3)))
    return y, p, s2
