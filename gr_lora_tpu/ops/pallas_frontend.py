"""Pallas-fused pyramid front-end: hop frames -> folded spectra in one kernel.

The XLA path (ops/dechirp.pyramid_spectra) materializes the overlapped frame
matrix [F, N, 2] in HBM, runs the packed zoom-DFT matmul, then separate
magnitude/fold ops.  This kernel fuses the whole chain on-chip:

  per (frame-tile, bin-tile) grid cell:
    DMA the needed IQ chunk rows HBM->VMEM (overlap-save: rows shared
    between adjacent frame tiles never round-trip through HBM),
    build the frame block in VMEM from _R static lane-aligned row copies,
    run 10 MXU matmuls (5 complex components x re/im) against column tiles,
    compute magnitudes, fold, and write the three spectra tiles.

Lane alignment: Mosaic requires 128-aligned minor-dim slices, so each IQ
"chunk" row is one hop period stored as [re(hop) | im(hop)] zero-padded to a
multiple of 128 lanes; a frame is then _R consecutive rows concatenated along
lanes — every copy is a full-row (aligned) move.  The weight matrices are
row-permuted (and zero-row padded) on the host to match that layout.

Components per output bin k (complex, so 8 real weight matrices):
  c0: unwindowed dechirp, bins [0, K)        -> fft_add / h_single term
  c1: unwindowed,        bins [F-K, F)       -> fft_add / h_single term
  c2: Kaiser-windowed,   bins [0, K)         -> fft_add_w term
  c3: Kaiser-windowed,   bins [F-K, F)       -> fft_add_w term
(top-band fold == the reference's [K, 2K) fold at its validated p = 2,
generalized to all p — see ops/dechirp.py on the fold landmine; reference
folding: pyramid_demod_impl.cc:596-603,269.)

Compile note: Mosaic compilation through the axon tunnel is slow
(~minutes), so the XLA path stays the default; this kernel is for
deployments where the compile cost amortizes.  CPU interpret mode keeps it
testable everywhere (tests/test_pallas_frontend.py).
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

_R = PYRAMID_OVERLAP_FACTOR  # frames per symbol: n / hop


def _row_width(hop: int) -> int:
    return -(-2 * hop // 128) * 128


def _row_perm(n: int, hop: int):
    """Map packed-weight row order [re 0..n-1, im 0..n-1] to the kernel's
    frame-lane order: per hop r, [re r-th hop | im r-th hop | zero pad]."""
    w = _row_width(hop)
    perm = []          # new row index -> source row (or -1 for zero pad)
    for r in range(_R):
        perm += list(range(r * hop, (r + 1) * hop))            # re
        perm += list(range(n + r * hop, n + (r + 1) * hop))    # im
        perm += [-1] * (w - 2 * hop)                           # lane pad
    return np.asarray(perm), _R * w


def _component_weights(cfg: LoraConfig) -> list[np.ndarray]:
    """The 8 real weight matrices in kernel row order (see docstring)."""
    n = cfg.num_samples
    f = cfg.fft_size
    k = cfg.bin_size
    hop = n // _R
    _, down = chirp_tables(cfg.sf, cfg.p)
    v0 = down
    v1 = down * kaiser_window(n, cfg.beta)
    specs = [
        (v0, np.arange(0, k)),
        (v0, np.arange(f - k, f)),
        (v1, np.arange(0, k)),
        (v1, np.arange(f - k, f)),
    ]
    perm, rows = _row_perm(n, hop)
    src_ok = perm >= 0
    ns = np.arange(n)
    out = []
    for v, cols in specs:
        wc = np.exp(-2j * np.pi * np.outer(ns, cols) / f) * v[:, None]
        re = wc.real.astype(np.float32)
        im = wc.imag.astype(np.float32)
        for packed in (np.concatenate([re, -im], axis=0),    # y_re rows
                       np.concatenate([im, re], axis=0)):    # y_im rows
            wperm = np.zeros((rows, k), np.float32)
            wperm[src_ok] = packed[perm[src_ok]]
            out.append(wperm)
    return out


def _kernel(chunks_hbm, *refs, ft: int, w: int):
    ws = refs[:8]
    fft_add, fft_add_w, h_single = refs[8:11]
    chunk_buf, frames, sems = refs[11:]

    i = pl.program_id(1)   # frame tile: innermost so weight blocks stay put
    # _R overlapping row-shifted DMAs: frame f needs chunk rows f..f+_R-1;
    # fetching each shift directly avoids sublane-offset VMEM copies.
    dmas = [
        pltpu.make_async_copy(
            chunks_hbm.at[pl.ds(i * ft + r, ft), :], chunk_buf.at[r],
            sems.at[r])
        for r in range(_R)
    ]
    for d in dmas:
        d.start()
    for r, d in enumerate(dmas):
        d.wait()
        # bf16 frame block: lane-aligned full-row copy + cast.
        frames[:, r * w:(r + 1) * w] = chunk_buf[r].astype(jnp.bfloat16)

    x = frames[:]

    def cmag(j):
        yr = jnp.dot(x, ws[2 * j][:], preferred_element_type=jnp.float32)
        yi = jnp.dot(x, ws[2 * j + 1][:], preferred_element_type=jnp.float32)
        return jnp.sqrt(yr * yr + yi * yi)

    m0, m1, m2, m3 = (cmag(j) for j in range(4))
    fft_add[:] = m0 + m1
    h_single[:] = jnp.maximum(m0, m1)
    fft_add_w[:] = m2 + m3


@lru_cache(maxsize=None)
def make_pallas_spectra(cfg: LoraConfig, num_frames: int,
                        frame_tile: int = 256, k_tile: int = 128,
                        interpret: bool = False):
    """Jitted fused front-end: chunks float32[C, row_width] (from
    ``pad_chunks``) -> (fft_add, fft_add_w, h_single), each
    [num_frames_padded, K].  ``interpret=True`` runs on CPU."""
    n = cfg.num_samples
    k = cfg.bin_size
    hop = n // _R
    w = _row_width(hop)
    ft = min(frame_tile, max(8, num_frames))
    kt = min(k_tile, k)
    assert k % kt == 0
    nft = -(-num_frames // ft)
    fpad = nft * ft
    weights = _component_weights(cfg)
    rows = weights[0].shape[0]

    # Grid (bin-tile, frame-tile): the frame axis iterates fastest, so the
    # 10 weight blocks (index depends only on j) are fetched once per j
    # sweep instead of every cell.
    grid = (k // kt, nft)
    w_specs = [
        pl.BlockSpec((rows, kt), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM)
        for _ in range(8)
    ]
    out_spec = pl.BlockSpec((ft, kt), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        partial(_kernel, ft=ft, w=w),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + w_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((fpad, k), jnp.float32)
                        for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((_R, ft, w), jnp.float32),
            pltpu.VMEM((ft, _R * w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_R,)),
        ],
        interpret=interpret,
    )

    # bf16 weights: full-rate MXU issue, f32 accumulate in the dot.
    wargs = tuple(jnp.asarray(x, jnp.bfloat16) for x in weights)

    def run(chunks):
        need = fpad + _R
        assert chunks.shape[0] >= need, (chunks.shape, need)
        return call(chunks[:need], *wargs)

    return jax.jit(run)


def pad_chunks(iq: np.ndarray, cfg: LoraConfig, num_frames: int,
               frame_tile: int = 256) -> np.ndarray:
    """Host helper: [T, 2] IQ -> [C, row_width] chunk rows
    ([re(hop) | im(hop) | pad]) for make_pallas_spectra."""
    n = cfg.num_samples
    hop = n // _R
    w = _row_width(hop)
    ft = min(frame_tile, max(8, num_frames))
    nft = -(-num_frames // ft)
    c = nft * ft + _R
    need = c * hop
    iq = np.asarray(iq, np.float32)
    if iq.shape[0] < need:
        iq = np.concatenate(
            [iq, np.zeros((need - iq.shape[0], 2), np.float32)])
    x = iq[:need].reshape(c, hop, 2)
    rows = np.zeros((c, w), np.float32)
    rows[:, :hop] = x[:, :, 0]
    rows[:, hop:2 * hop] = x[:, :, 1]
    return rows


def row_chunks(iq: jnp.ndarray, cfg: LoraConfig, num_frames: int,
               frame_tile: int = 256) -> jnp.ndarray:
    """Device-side pad_chunks: [T, 2] IQ -> [C, row_width] chunk rows,
    composable under jit (pad_chunks is the host/NumPy twin)."""
    n = cfg.num_samples
    hop = n // _R
    w = _row_width(hop)
    ft = min(frame_tile, max(8, num_frames))
    nft = -(-num_frames // ft)
    c = nft * ft + _R
    need = c * hop
    pad = max(need - iq.shape[0], 0)
    x = jnp.pad(iq.astype(jnp.float32), ((0, pad), (0, 0)))[:need]
    x = x.reshape(c, hop, 2)
    rows = jnp.concatenate(
        [x[:, :, 0], x[:, :, 1],
         jnp.zeros((c, w - 2 * hop), jnp.float32)], axis=1)
    return rows
