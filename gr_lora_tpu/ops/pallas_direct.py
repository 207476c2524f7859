"""MXU-fused direct pyramid front-end, round 3: bf16 matmul + in-VMEM
magnitude/fold epilogue with grid-pipelined I/O.

The direct formulation's bf16 plateau (docs/BENCH.md r2: bf16 measured the
same ~250 Msps as f32-default) is traffic + epilogue bound: XLA
materializes the packed [B, 2C] f32 spectra in HBM, then magnitude / fold
/ reduce kernels re-read them.  This kernel keeps the spectra in VMEM:

  per (bin-tile j, frame-tile i) grid cell — ONE bf16 MXU dot
      y[ft, 8*kt] = frames[ft, 2N] @ W[2N, 8*kt]      (f32 accumulate)
  followed by the whole epilogue on the accumulator while it is live:
      m_c = sqrt(y_cre^2 + y_cim^2)      c = 0..3
      fa = m0 + m1,  hs = max(m0, m1),  faw = m2 + m3

so HBM sees only bf16 frames in (32 MB at the bench point) and the three
[B, K] f32 spectra out — the f32 complex spectra (4x larger) never exist.

Differences from the round-1 kernel (ops/pallas_frontend.py, kept for
comparison): inputs are BlockSpec-managed, so Mosaic double-buffers the
frame tiles across grid steps (the round-1 kernel issued manual DMAs and
waited on them inline, serializing memory behind compute — measured 125
Msps); and the four complex components are ONE wide dot instead of eight
narrow ones.

Frame building (overlapped stack + re/im concat + bf16 cast) stays in XLA:
it is a pure layout op XLA pipelines well, and feeding [B, 2N] packed rows
keeps every kernel slice 128-lane aligned.

Weight column layout per bin tile j (kt bins each):
  [c0_re | c0_im | c1_re | c1_im | c2_re | c2_im | c3_re | c3_im]
with c0/c2 = unwindowed/windowed bins [0, K), c1/c3 = bins [F-K, F)
(the top-band fold, see ops/dechirp.py on the fold landmine; reference
hot loop: pyramid_demod_impl.cc:569-603).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PYRAMID_OVERLAP_FACTOR, LoraConfig
from .chirp import chirp_tables
from .dechirp import kaiser_window

_R = PYRAMID_OVERLAP_FACTOR


def _weights(cfg: LoraConfig, kt: int) -> np.ndarray:
    """bf16 [2N, nkt * 8 * kt] in the kernel's tile-grouped column order."""
    n = cfg.num_samples
    f = cfg.fft_size
    k = cfg.bin_size
    _, down = chirp_tables(cfg.sf, cfg.p)
    v0 = down
    v1 = down * kaiser_window(n, cfg.beta)
    ns = np.arange(n)
    nkt = k // kt
    cols = np.zeros((2 * n, nkt * 8 * kt), np.float32)
    for j in range(nkt):
        for c, (v, base) in enumerate(
                [(v0, 0), (v0, f - k), (v1, 0), (v1, f - k)]):
            bins = np.arange(base + j * kt, base + (j + 1) * kt)
            wc = np.exp(-2j * np.pi * np.outer(ns, bins) / f) * v[:, None]
            re = wc.real.astype(np.float32)
            im = wc.imag.astype(np.float32)
            o = j * 8 * kt + 2 * c * kt
            # y_re rows: [Wre; -Wim], y_im rows: [Wim; Wre].
            cols[:n, o:o + kt] = re
            cols[n:, o:o + kt] = -im
            cols[:n, o + kt:o + 2 * kt] = im
            cols[n:, o + kt:o + 2 * kt] = re
    return jnp.asarray(cols).astype(jnp.bfloat16)


def _kernel(x_ref, w_ref, fa_ref, faw_ref, hs_ref, *, kt):
    # One wide dot, then the epilogue on the live accumulator.  A
    # split-dots variant (four narrow dots, each followed by its own
    # magnitude, aiming at MXU/VPU overlap) was A/B-measured on the TPU
    # (tools/kernel_ab.py, r5) at parity at ff=8 (318 vs 317 Msps) and 2 %
    # SLOWER at ff=2 (1041 vs 1065 Msps) — rejected.
    y = jnp.dot(x_ref[:], w_ref[:],
                preferred_element_type=jnp.float32)   # [ft, 8*kt]

    def mag(c):
        re = y[:, 2 * c * kt:(2 * c + 1) * kt]
        im = y[:, (2 * c + 1) * kt:(2 * c + 2) * kt]
        return jnp.sqrt(re * re + im * im)

    m0, m1, m2, m3 = mag(0), mag(1), mag(2), mag(3)
    fa_ref[:, :] = m0 + m1
    hs_ref[:, :] = jnp.maximum(m0, m1)
    faw_ref[:, :] = m2 + m3


@lru_cache(maxsize=None)
def make_direct_spectra(cfg: LoraConfig, num_frames: int,
                        frame_tile: int = 256, k_tile: int = 0,
                        interpret: bool = False):
    """Jitted iq float32[T, 2] -> (fft_add, fft_add_w, h_single), each
    [num_frames, K] — numerically the direct bf16 front-end
    (ops/dechirp.pyramid_spectra at precision='bf16') with the epilogue
    fused.  ``interpret=True`` runs on CPU (tests)."""
    n = cfg.num_samples
    k = cfg.bin_size
    hop = n // _R
    if k_tile <= 0:
        # VMEM: weights block [2N, 8*kt] bf16 + y accum [ft, 8*kt] f32 +
        # frame tiles + outputs, all double-buffered -> budget ~12 MB.
        k_tile = 256 if n <= 1024 else 128
    kt = min(k_tile, k)
    assert k % kt == 0
    ft = min(frame_tile, max(8, num_frames))
    nft = -(-num_frames // ft)
    fpad = nft * ft
    nkt = k // kt
    w_all = jnp.asarray(_weights(cfg, kt))

    grid = (nkt, nft)    # frame axis innermost: weight block stays put
    x_spec = pl.BlockSpec((ft, 2 * n), lambda j, i: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((2 * n, 8 * kt), lambda j, i: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ft, kt), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        partial(_kernel, kt=kt),
        grid=grid,
        in_specs=[x_spec, w_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((fpad, k), jnp.float32)
                        for _ in range(3)),
        interpret=interpret,
    )

    def run(iq):
        need = (fpad + _R - 1) * hop + hop
        pad = max(need - iq.shape[0], 0)
        x = jnp.pad(iq, ((0, pad), (0, 0)))
        chunks = x[: (fpad + _R - 1) * hop].reshape(-1, hop, 2)
        frames = jnp.stack(
            [jax.lax.slice_in_dim(chunks, r, r + fpad, axis=0)
             for r in range(_R)], axis=1).reshape(fpad, n, 2)
        xp = jnp.concatenate([frames[..., 0], frames[..., 1]],
                             axis=-1).astype(jnp.bfloat16)
        fa, faw, hs = call(xp, w_all)
        return fa[:num_frames], faw[:num_frames], hs[:num_frames]

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Fused peak search: the dense spectra never leave VMEM (round 4).
# ---------------------------------------------------------------------------

def _weights_ext(cfg: LoraConfig, kt: int) -> np.ndarray:
    """bf16 [nkt, 2N, 8 * (kt+2)] — like _weights, but each bin tile is
    extended by ONE folded bin on each side so the strict cyclic local-max
    test (pyramid_demod_impl.cc:229-235) is decidable inside the tile.
    Tiles live on a leading axis (full-extent trailing dims keep Mosaic's
    lane tiling happy — 8*(kt+2) is not a 128-multiple)."""
    n = cfg.num_samples
    f = cfg.fft_size
    k = cfg.bin_size
    _, down = chirp_tables(cfg.sf, cfg.p)
    v0 = down
    v1 = down * kaiser_window(n, cfg.beta)
    ns = np.arange(n)
    nkt = k // kt
    kte = kt + 2
    cols = np.zeros((nkt, 2 * n, 8 * kte), np.float32)
    for j in range(nkt):
        folded = (np.arange(j * kt - 1, j * kt + kt + 1)) % k
        for c, (v, base) in enumerate(
                [(v0, 0), (v0, f - k), (v1, 0), (v1, f - k)]):
            bins = base + folded
            wc = np.exp(-2j * np.pi * np.outer(ns, bins) / f) * v[:, None]
            o = 2 * c * kte
            cols[j, :n, o:o + kte] = wc.real.astype(np.float32)
            cols[j, n:, o:o + kte] = -wc.imag.astype(np.float32)
            cols[j, :n, o + kte:o + 2 * kte] = wc.imag.astype(np.float32)
            cols[j, n:, o + kte:o + 2 * kte] = wc.real.astype(np.float32)
    return jnp.asarray(cols).astype(jnp.bfloat16)


def _peaks_kernel(x_ref, w_ref, val_ref, bin_ref, h_ref, hs_ref, ws,
                  *, kt, max_peaks, threshold, k_total):
    """One (bin tile, frame tile) grid cell: MXU dot + the whole pyramid
    peak epilogue (magnitude, fold, local max, threshold, per-tile top-M)
    while the accumulator is live in VMEM.  Only [ft, M] peak candidates
    reach HBM — the [H, K] spectra never exist.

    The top-M loop iterates only while peaks remain (its cross-lane
    max/argmax reductions cost ~3x the tile's matmul when run all M
    times; at the reference collision threshold peaks are sparse, so
    most cells run 0-1 iterations)."""
    kte = kt + 2
    j = pl.program_id(0)
    y = jnp.dot(x_ref[:], w_ref[0],
                preferred_element_type=jnp.float32)   # [ft, 8*(kt+2)]

    def mag(c):
        re = y[:, 2 * c * kte:(2 * c + 1) * kte]
        im = y[:, (2 * c + 1) * kte:(2 * c + 2) * kte]
        return jnp.sqrt(re * re + im * im)

    m0, m1, m2, m3 = mag(0), mag(1), mag(2), mag(3)
    faw = m2 + m3                                    # [ft, kt+2]
    fa_in = (m0 + m1)[:, 1:kt + 1]
    hs_in = jnp.maximum(m0, m1)[:, 1:kt + 1]
    ctr = faw[:, 1:kt + 1]
    is_peak = ((ctr > threshold) & (ctr > faw[:, :kt])
               & (ctr > faw[:, 2:kt + 2]))

    ft = ctr.shape[0]
    val_ref[0] = jnp.full((ft, max_peaks), -jnp.inf, jnp.float32)
    bin_ref[0] = jnp.zeros((ft, max_peaks), jnp.int32)
    h_ref[0] = jnp.zeros((ft, max_peaks), jnp.float32)
    hs_ref[0] = jnp.zeros((ft, max_peaks), jnp.float32)
    cnt = jnp.max(jnp.sum(is_peak.astype(jnp.int32), axis=-1))
    ws[...] = jnp.where(is_peak, ctr, -jnp.inf)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (ft, kt), 1)
    for m in range(max_peaks):
        @pl.when(m < cnt)
        def _(m=m):
            work = ws[...]
            v = jnp.max(work, axis=-1)               # [ft]
            a = jnp.argmax(work, axis=-1).astype(jnp.int32)
            sel = lanes == a[:, None]
            val_ref[0, :, m] = v
            bin_ref[0, :, m] = j * kt + a
            h_ref[0, :, m] = jnp.sum(jnp.where(sel, fa_in, 0.0), axis=-1)
            hs_ref[0, :, m] = jnp.sum(jnp.where(sel, hs_in, 0.0), axis=-1)
            if m + 1 < max_peaks:
                ws[...] = jnp.where(sel, -jnp.inf, work)


@lru_cache(maxsize=None)
def make_direct_peaks(cfg: LoraConfig, num_frames: int, max_peaks: int = 8,
                      frame_tile: int = 256, k_tile: int = 0,
                      interpret: bool = False):
    """Jitted iq float32[T, 2] -> per-hop top-M pyramid peaks
    (bins int32[H, M], h f32[H, M], h_single f32[H, M], valid bool[H, M])
    — the full models/pyramid.peak_lattice_fn contract with the peak
    search fused into the MXU kernel: local-max + threshold + per-tile
    top-M run in the epilogue while the accumulator is live, and HBM sees
    only bf16 frames in and ~nkt*M*16 B/hop of candidates out (vs 12*K
    B/hop of dense spectra — 48-96x less at the collision zoom).  A tiny
    XLA top-M over the per-tile candidates finishes the reduction
    (exact: every tile emits up to max_peaks, so no global-top-M peak can
    be dropped).  Reference epilogue: pyramid_demod_impl.cc:225-272."""
    n = cfg.num_samples
    k = cfg.bin_size
    hop = n // _R
    if k_tile <= 0:
        k_tile = 256 if n <= 1024 else 128
    kt = min(k_tile, k)
    assert k % kt == 0
    ft = min(frame_tile, max(8, num_frames))
    nft = -(-num_frames // ft)
    fpad = nft * ft
    nkt = k // kt
    kte = kt + 2
    w_all = _weights_ext(cfg, kt)
    threshold = float(cfg.threshold)

    grid = (nkt, nft)    # frame axis innermost: weight block stays put
    x_spec = pl.BlockSpec((ft, 2 * n), lambda j, i: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 2 * n, 8 * kte), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    # Candidates keyed [tile, frame, M]: full-extent last dim (M < 128
    # lanes is fine when the block covers the whole dimension).
    cand_spec = pl.BlockSpec((1, ft, max_peaks), lambda j, i: (j, i, 0),
                             memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        partial(_peaks_kernel, kt=kt, max_peaks=max_peaks,
                threshold=threshold, k_total=k),
        grid=grid,
        in_specs=[x_spec, w_spec],
        out_specs=(cand_spec,) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((ft, kt), jnp.float32)],
        interpret=interpret,
    )

    def run(iq):
        need = (fpad + _R - 1) * hop + hop
        pad = max(need - iq.shape[0], 0)
        x = jnp.pad(iq, ((0, pad), (0, 0)))
        chunks = x[: (fpad + _R - 1) * hop].reshape(-1, hop, 2)
        frames = jnp.stack(
            [jax.lax.slice_in_dim(chunks, r, r + fpad, axis=0)
             for r in range(_R)], axis=1).reshape(fpad, n, 2)
        xp = jnp.concatenate([frames[..., 0], frames[..., 1]],
                             axis=-1).astype(jnp.bfloat16)
        outs = call(xp, w_all)
        vals, bins, h, hs = (
            jnp.moveaxis(o, 0, 1).reshape(fpad, nkt * max_peaks)
            for o in outs)
        if nkt > 1:
            top_vals, sel = jax.lax.top_k(vals, max_peaks)
            tk = partial(jnp.take_along_axis, indices=sel, axis=-1)
            bins, h, hs = tk(bins), tk(h), tk(hs)
        else:
            top_vals = vals
        valid = jnp.isfinite(top_vals)
        return (bins[:num_frames].astype(jnp.int32), h[:num_frames],
                hs[:num_frames], valid[:num_frames])

    return run
