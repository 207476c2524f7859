"""Pallas epilogue for the overlap-decomposed pyramid front-end.

ops/overlap_dft.py cuts the front-end's matmul FLOPs ~10x by sharing one
chunk DFT across the 8 overlapping frames, but its XLA assembly is
memory-bound: the 8-term j-sum and the ~21-tap window convolution each
re-read full [hops, F] complex arrays from HBM (measured 38 Msps vs the
direct path's 187 Msps on v5e).  This kernel runs that entire epilogue in
VMEM:

    per hop tile: load chunk-spectrum rows G[i*TH .. i*TH+TH+8) once,
      X  = sum_j  roll(G[j:j+TH], sigma_j)  * rho_j      (8 lane rotates)
      Xw = sum_q  roll(X, q*fft_factor) * what_q         (~21 lane rotates)
      write the three folded magnitude arrays [TH, K]

HBM traffic collapses to |G| in + 3K out per hop (~0.9 KB/hop at ff=2)
and the VPU does ~(8+T)*F complex MACs per hop — the speed-of-light for
this formulation.  The MXU chunk matmul stays in XLA (it is already
MXU-shaped); ops/pallas_frontend.py remains the fused kernel of the
*direct* formulation for comparison.

Overlapping tiles: BlockSpec offsets must be block-multiples, so the
kernel receives TWO views of G — the tile and the NEXT tile — and stitches
the 8-row overlap from the next tile's head (G is padded by one tile).
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


def _kernel(g, gnext, rho, out_fa, out_faw, out_hs, *, th, f, k, sigma,
            win_shifts, win_re, win_im, interpret):
    def rows(j):
        # Rows j .. j+th of the extended tile: main block + next-tile head.
        if j == 0:
            return g[:, :]
        return jnp.concatenate([g[j:, :], gnext[:j, :]], axis=0)

    def roll(x, s):
        # roll(x, s)[c] = x[(c - s) mod F] on the lane axis, static s.
        if s == 0:
            return x
        if interpret:
            return jnp.roll(x, s, axis=1)
        return pltpu.roll(x, s, 1)

    xr = xi = None
    for j in range(_R):
        blk = rows(j)                     # [th, 2F]: [re | im] lanes
        gr, gi = blk[:, :f], blk[:, f:]
        gr, gi = roll(gr, sigma[j]), roll(gi, sigma[j])
        rr, ri = rho[2 * j], rho[2 * j + 1]
        tr = gr * rr - gi * ri
        ti = gr * ri + gi * rr
        xr = tr if xr is None else xr + tr
        xi = ti if xi is None else xi + ti

    mag = jnp.sqrt(xr * xr + xi * xi)
    out_fa[:, :] = mag[:, :k] + mag[:, f - k:]
    out_hs[:, :] = jnp.maximum(mag[:, :k], mag[:, f - k:])

    wr = wi = None
    for t, s in enumerate(win_shifts):
        ar, ai = roll(xr, s), roll(xi, s)
        tr = ar * win_re[t] - ai * win_im[t]
        ti = ar * win_im[t] + ai * win_re[t]
        wr = tr if wr is None else wr + tr
        wi = ti if wi is None else wi + ti
    magw = jnp.sqrt(wr * wr + wi * wi)
    out_faw[:, :] = magw[:, :k] + magw[:, f - k:]


@lru_cache(maxsize=None)
def make_overlap_spectra(cfg: LoraConfig, num_hops: int, tile: int = 0,
                         interpret: bool = False):
    """Jitted iq float32[T, 2] -> (fft_add, fft_add_w, h_single) [H, K];
    numerically the overlap-decomposed front-end with the epilogue fused in
    one Pallas kernel (see module docstring)."""
    plan = overlap_plan(cfg.sf, cfg.p, cfg.fft_factor, cfg.beta,
                        cfg.precision)
    n = cfg.num_samples
    h = n // _R
    f = cfg.fft_size
    k = cfg.bin_size
    if tile <= 0:
        # VMEM budget: ~12 arrays of [tile, F] f32 live at once (two G
        # views, X/Xw re+im, magnitudes, folds) AND Mosaic double-buffers
        # the I/O blocks across grid steps — budget ~5 MB of tiles so the
        # total stays under the 16 MB scoped-vmem limit.
        tile = min(64, ((5 << 20) // (48 * f)) & ~7)
        if tile < 8:
            raise ValueError(
                f"fft_size {f} needs > VMEM per 8-hop tile; use the "
                f"'fast' or 'xla' backend at this operating point")
    th = tile
    ntiles = -(-num_hops // th)
    hpad = ntiles * th
    a_rows = hpad + th                   # one spare tile for the overlap

    # Packed chunk-DFT weights: one [2h, 2F] matmul -> rows [re | im].
    w2 = jnp.asarray(plan.chunk_dft._w2)

    # rho as interleaved rows [2*R, F]: re_j, im_j.
    rho = jnp.asarray(
        np.stack([plan.rho[:, :, 0], plan.rho[:, :, 1]],
                 axis=1).reshape(2 * _R, f))
    sigma = tuple(int(s) % f for s in plan.sigma)
    win_shifts = tuple(int(s) % f for s in plan.win_shifts)
    win_re = tuple(float(x) for x in plan.win_taps[:, 0])
    win_im = tuple(float(x) for x in plan.win_taps[:, 1])

    grid = (ntiles,)
    g_spec = pl.BlockSpec((th, 2 * f), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    gnext_spec = pl.BlockSpec((th, 2 * f), lambda i: (i + 1, 0),
                              memory_space=pltpu.VMEM)
    rho_spec = pl.BlockSpec((2 * _R, f), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((th, k), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        partial(_kernel, th=th, f=f, k=k, sigma=sigma,
                win_shifts=win_shifts, win_re=win_re, win_im=win_im,
                interpret=interpret),
        grid=grid,
        in_specs=[g_spec, gnext_spec, rho_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((hpad, k), jnp.float32)
                        for _ in range(3)),
        interpret=interpret,
    )

    prec = plan.chunk_dft._lax_precision
    cdtype = plan.chunk_dft._compute_dtype

    def run(iq):
        nchunks = num_hops + _R - 1
        chunks = iq[: nchunks * h].reshape(nchunks, h, 2)
        xp = jnp.concatenate([chunks[..., 0], chunks[..., 1]], axis=-1)
        if cdtype is not None:
            xp = xp.astype(cdtype)
        g = jnp.matmul(xp, w2.astype(xp.dtype) if cdtype is not None else w2,
                       precision=prec,
                       preferred_element_type=jnp.float32)   # [A', 2F]
        g = jnp.pad(g, ((0, a_rows - g.shape[0]), (0, 0)))
        fa, faw, hs = call(g, g, rho)
        return fa[:num_hops], faw[:num_hops], hs[:num_hops]

    return jax.jit(run)
