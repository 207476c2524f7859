"""Fused overlap-formulation pyramid front-end with in-kernel peak search.

This is the large-SF collision lattice (the north-star gateway's SF9-12
dispatch windows).  At those operating points the direct [N x 4K] matmul
is MXU-prohibitive (8.4 MFLOP/sample at SF12) and the pure-XLA overlap
path (ops/overlap_dft.fast_pyramid_spectra) is HBM-bound: its 8-term
j-sum and ~21-tap window convolution re-read full [hops, F] complex
arrays per term (measured ~5 Msps per dispatched SF11/12 window batch on
v5e — the dominant term of the r3 north-star wall).

This kernel evaluates the whole epilogue per (group, hop-tile) grid cell
with a *bin-tiled* working set, and emits only top-M peak candidates:

    X_b[c]  = sum_j rho_j[c] * G[b + j, c + j*S]      (S = K/8)
    Xw_b[c] = sum_q what_q * X_b[c - q*ff]
    fa/faw/hs folds, strict local max, threshold, per-tile top-M

so HBM sees the chunk spectra G once (bf16, bin-tiled views) and ~M peak
tuples per hop — the dense [H, K] spectra never exist.

Tiling exploits two alignment facts:

- the j-sum's bin shift is exactly j*S, so with an output tile size BT
  dividing S every term reads a whole *tile* of G at tile offset
  j*(S/BT) — pure BlockSpec index arithmetic, no gathers;
- the fold pairs bin c with c + (F - K), which is also a multiple of S,
  so the lo/hi fold sides are tiles of the same lattice (q = m+j for the
  lo side, q = m+j+8 for the hi side, 23 distinct views in total for the
  8 output tiles of a group).

Each grid cell therefore reads 46 BlockSpec-managed G views (23 tiles x
{row-block, next-row-block} for the +j row stitch), ~70 B of G per output
bin — within ~4x of the formulation's information-theoretic minimum (16
complex G values per folded output bin) — and Mosaic double-buffers the
streaming automatically.

rho_j[c] factors as scal(tile) * unit_j[u] (a pure tone), so the rho
input collapses to one [16, BW] unit-tone block plus per-(m, side, j)
complex scalars.

Reference hot loop this replaces: pyramid_demod_impl.cc:569-603 + the
peak scan :225-272; numerics cross-checked against fast_pyramid_spectra
in tests/test_pallas_peaks.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PYRAMID_OVERLAP_FACTOR, LoraConfig
from .overlap_dft import overlap_plan

_R = PYRAMID_OVERLAP_FACTOR


def overlap_peaks_supported(cfg: LoraConfig) -> bool:
    """The bin tiling needs BT | S with BT a 128-multiple, S = K/8."""
    return (cfg.bin_size // _R) % 128 == 0


def _signed_shifts(shifts, f):
    return tuple(s if s <= f // 2 else s - f for s in shifts)


def _kernel(*refs, th, bw, bt, w, s_grp, taps, max_peaks, threshold):
    nview = 23
    gv = refs[:2 * nview]
    unit_ref, scal_ref = refs[2 * nview:2 * nview + 2]
    val_ref, bin_ref, h_ref, hs_ref, ws = refs[2 * nview + 2:]
    g = pl.program_id(0)
    btw = bt + 2

    def stitched(q, j):
        """Rows j .. j+th of view q (hop row t needs chunk row t+j)."""
        gq = gv[2 * q][0]
        if j == 0:
            return gq
        gn = gv[2 * q + 1][0]
        return jnp.concatenate([gq[j:], gn[:j]], axis=0)

    def x_side(m, sd):
        """X (re, im) [th, bw] for output tile m, fold side sd."""
        xr = xi = None
        for j in range(_R):
            blk = stitched(m + j + 8 * sd, j)
            gr = blk[:, :bw].astype(jnp.float32)
            gi = blk[:, bw:].astype(jnp.float32)
            si = ((m * 2 + sd) * _R + j) * 2
            sr_ = scal_ref[g, si]
            si_ = scal_ref[g, si + 1]
            ur = unit_ref[2 * j]
            ui = unit_ref[2 * j + 1]
            rr = sr_ * ur - si_ * ui           # [bw] broadcast rows
            ri = sr_ * ui + si_ * ur
            tr = gr * rr - gi * ri
            ti = gr * ri + gi * rr
            xr = tr if xr is None else xr + tr
            xi = ti if xi is None else xi + ti
        return xr, xi

    def win_mag(xr, xi):
        """|window-conv(X)| on bins [w-1, w+bt+1) -> [th, bt+2]."""
        wr = wi = None
        for (sh, tr_, ti_) in taps:
            lo = w - 1 - sh
            ar = xr[:, lo:lo + btw]
            ai = xi[:, lo:lo + btw]
            pr = ar * tr_ - ai * ti_
            pi = ar * ti_ + ai * tr_
            wr = pr if wr is None else wr + pr
            wi = pi if wi is None else wi + pi
        return jnp.sqrt(wr * wr + wi * wi)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (th, bt), 1)
    val_ref[0] = jnp.full((th, 8 * max_peaks), -jnp.inf, jnp.float32)
    bin_ref[0] = jnp.zeros((th, 8 * max_peaks), jnp.int32)
    h_ref[0] = jnp.zeros((th, 8 * max_peaks), jnp.float32)
    hs_ref[0] = jnp.zeros((th, 8 * max_peaks), jnp.float32)
    for m in range(8):
        xr, xi = x_side(m, 0)
        magw_lo = win_mag(xr, xi)
        c_r = xr[:, w:w + bt]
        c_i = xi[:, w:w + bt]
        mag_lo = jnp.sqrt(c_r * c_r + c_i * c_i)
        xr, xi = x_side(m, 1)
        magw_hi = win_mag(xr, xi)
        c_r = xr[:, w:w + bt]
        c_i = xi[:, w:w + bt]
        mag_hi = jnp.sqrt(c_r * c_r + c_i * c_i)

        faw = magw_lo + magw_hi                     # [th, bt+2]
        fa = mag_lo + mag_hi                        # [th, bt]
        hs = jnp.maximum(mag_lo, mag_hi)
        ctr = faw[:, 1:bt + 1]
        is_peak = ((ctr > threshold) & (ctr > faw[:, :bt])
                   & (ctr > faw[:, 2:bt + 2]))
        # Early-exit top-M (see pallas_direct._peaks_kernel): iterate only
        # while peaks remain — quiet tiles skip all the costly cross-lane
        # reductions.
        cnt = jnp.max(jnp.sum(is_peak.astype(jnp.int32), axis=-1))
        ws[...] = jnp.where(is_peak, ctr, -jnp.inf)
        base = (g + m * s_grp) * bt
        for mm in range(max_peaks):
            @pl.when(mm < cnt)
            def _(m=m, mm=mm, fa=fa, hs=hs, base=base):
                work = ws[...]
                v = jnp.max(work, axis=-1)
                a = jnp.argmax(work, axis=-1).astype(jnp.int32)
                sel = lanes == a[:, None]
                o = m * max_peaks + mm
                val_ref[0, :, o] = v
                bin_ref[0, :, o] = base + a
                h_ref[0, :, o] = jnp.sum(jnp.where(sel, fa, 0.0), axis=-1)
                hs_ref[0, :, o] = jnp.sum(jnp.where(sel, hs, 0.0),
                                          axis=-1)
                if mm + 1 < max_peaks:
                    ws[...] = jnp.where(sel, -jnp.inf, work)


@lru_cache(maxsize=None)
def make_overlap_peaks(cfg: LoraConfig, num_hops: int, max_peaks: int = 8,
                       hop_tile: int = 16, interpret: bool = False):
    """Jitted iq float32[T, 2] -> per-hop top-M pyramid peaks
    (bins int32[H, M], h f32[H, M], h_single f32[H, M], valid bool[H, M])
    — the models/pyramid.peak_lattice_fn contract, fused (module doc)."""
    assert overlap_peaks_supported(cfg), cfg
    plan = overlap_plan(cfg.sf, cfg.p, cfg.fft_factor, cfg.beta,
                        cfg.precision)
    n = cfg.num_samples
    h = n // _R
    f = cfg.fft_size
    k = cfg.bin_size
    s_bins = k // _R
    bt = min(512, s_bins)
    s_grp = s_bins // bt
    nbt = f // bt
    sshifts = _signed_shifts(plan.win_shifts, f)
    maxsh = max(abs(s) for s in sshifts)
    w = ((maxsh + 1 + 127) // 128) * 128
    bw = bt + 2 * w
    th = hop_tile
    nrt = -(-num_hops // th)
    fpad = nrt * th
    a2 = fpad + th                      # chunk rows + spare next-row block

    # -- host-built constants --------------------------------------------
    # Gt [nbt, A2, 2*BW] bf16 is built in XLA per call (below); unit tones
    # and per-(m, side, j) scalars here.
    uu = np.arange(bw)
    unit = np.empty((2 * _R, bw), np.float32)
    for j in range(_R):
        ph = np.exp(-2j * np.pi * j * h * uu / f)
        unit[2 * j] = ph.real
        unit[2 * j + 1] = ph.imag
    # beta_j (rho_j[0] of the plan) recovered from plan.rho at c=0.
    beta = plan.rho[:, 0, 0] + 1j * plan.rho[:, 0, 1]
    scal = np.empty((s_grp, 8 * 2 * _R * 2), np.float32)
    for g in range(s_grp):
        for m in range(8):
            for sd in range(2):
                c0 = (g + m * s_grp) * bt - w + sd * (f - k)
                for j in range(_R):
                    v = beta[j] * np.exp(-2j * np.pi * j * h * c0 / f)
                    o = ((m * 2 + sd) * _R + j) * 2
                    scal[g, o] = v.real
                    scal[g, o + 1] = v.imag
    taps = tuple(
        (sshifts[t], float(plan.win_taps[t, 0]), float(plan.win_taps[t, 1]))
        for t in range(len(sshifts)))

    gspecs = []
    for q in range(23):
        for nxt in (0, 1):
            gspecs.append(pl.BlockSpec(
                (1, th, 2 * bw),
                partial(lambda g, i, q=q, nxt=nxt:
                        ((g + q * s_grp) % nbt, i + nxt, 0)),
                memory_space=pltpu.VMEM))
    unit_spec = pl.BlockSpec((2 * _R, bw), lambda g, i: (0, 0),
                             memory_space=pltpu.VMEM)
    # Whole scalar table in SMEM (a [1, 256] VMEM block would violate the
    # (8, 128) sublane tiling); the kernel indexes it by program_id.
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    cand_spec = pl.BlockSpec((1, th, 8 * max_peaks), lambda g, i: (g, i, 0),
                             memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        partial(_kernel, th=th, bw=bw, bt=bt, w=w, s_grp=s_grp, taps=taps,
                max_peaks=max_peaks, threshold=float(cfg.threshold)),
        grid=(s_grp, nrt),
        in_specs=gspecs + [unit_spec, scal_spec],
        out_specs=(cand_spec,) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((s_grp, fpad, 8 * max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((s_grp, fpad, 8 * max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((s_grp, fpad, 8 * max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((s_grp, fpad, 8 * max_peaks), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((th, bt), jnp.float32)],
        interpret=interpret,
    )

    unit_j = jnp.asarray(unit)
    scal_j = jnp.asarray(scal)
    # Bin gather index for the tiled G views: tile t covers DFT bins
    # [t*BT - W, t*BT + BT + W) mod F, re lanes then im lanes.  Indices
    # address the FREE [A, F, 2] -> [A, 2F] reshape (re of bin b at lane
    # 2b, im at 2b+1): one gather replaces what a re/im pack concat would
    # cost (a measured ~22 ms strided-transpose per SF12 block).
    bidx = np.empty((nbt, 2 * bw), np.int64)
    for t in range(nbt):
        bins = (t * bt - w + uu) % f
        bidx[t, :bw] = 2 * bins
        bidx[t, bw:] = 2 * bins + 1
    bidx_j = jnp.asarray(bidx.reshape(-1))

    def run(iq):
        nchunks = num_hops + _R - 1
        need = nchunks * h
        pad = max(need - iq.shape[0], 0)
        x = jnp.pad(iq, ((0, pad), (0, 0))) if pad > 0 else iq
        chunks = x[:need].reshape(nchunks, h, 2)
        gc, _ = plan.chunk_dft(chunks)                  # [nchunks, F, 2]
        g2 = jnp.pad(gc, ((0, a2 - nchunks), (0, 0), (0, 0)))
        g2 = g2.reshape(a2, 2 * f)       # row-major (bin, comp): free
        # f32 views, not bf16: the window convolution cancels the partial-
        # chirp splice ringing of the unwindowed spectrum by ~5 orders of
        # magnitude, and bf16-rounded inputs leave ~0.5 % residual ringing
        # that shows up as spurious above-threshold local maxima.
        gt = jnp.take(g2, bidx_j, axis=1).reshape(a2, nbt, 2 * bw)
        gt = jnp.swapaxes(gt, 0, 1)
        outs = call(gt, *([gt] * 45), unit_j, scal_j)
        vals, bins, hh, hhs = (
            jnp.moveaxis(o, 0, 1).reshape(fpad, s_grp * 8 * max_peaks)
            for o in outs)
        top_vals, sel = jax.lax.top_k(vals, max_peaks)
        tk = partial(jnp.take_along_axis, indices=sel, axis=-1)
        bins, hh, hhs = tk(bins), tk(hh), tk(hhs)
        valid = jnp.isfinite(top_vals)
        return (bins[:num_hops].astype(jnp.int32), hh[:num_hops],
                hhs[:num_hops], valid[:num_hops])

    return run
