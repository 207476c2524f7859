"""Overlap-decomposed pyramid spectra: the FLOP-minimal dense front-end.

The pyramid demodulator needs, per overlapped hop b (hop h = N/8,
pyramid_demod_impl.cc:36,543), the zoom spectrum of the dechirped frame
``iq[b*h : b*h + N]`` twice — unwindowed and Kaiser-windowed
(pyramid_demod_impl.cc:569-603).  The direct formulation (ops/dechirp.py)
pays an [N x C] matmul per frame even though consecutive frames share
N - h = 7N/8 samples.  Two exact identities remove that redundancy:

1. **Chunk decomposition.**  The dechirp vector is a quadratic-phase chirp,
   so shifting it by j*h samples only multiplies it by a constant and a pure
   tone (the cross term of ``(j*h + u)^2``):

       down[j*h + u] = beta_j * exp(-2*pi*i * j*h*u / (p*N')) * down[u]

   and a pure-tone multiply is a **bin shift** of the zoom DFT — by exactly
   sigma_j = -j*K/8 bins (K = fft_factor * 2^sf), an integer for sf >= 3.
   Hence every frame spectrum is a phase-weighted sum of EIGHT bin-shifted
   copies of one shared chunk transform

       G[a, c] = sum_u iq[a*h + u] * down[u] * exp(-2*pi*i*u*c / F)

       X_b[c]  = sum_{j=0..7} rho_j[c] * G[b + j, c - sigma_j]

   computed for all chunks as ONE [h x F] matmul — an 8x FLOP reduction
   over the per-frame [N x C] matmul (each sample enters one chunk instead
   of eight frames).

2. **Window as bin convolution.**  Multiplying the frame by the length-N
   Kaiser window w equals convolving its zero-padded spectrum with the
   window's DFT, sampled every fft_factor bins:

       Xw_b[c] = sum_q (What_q / N) * X_b[c - q*fft_factor  (mod F)]

   exactly (F is a multiple of N).  Kaiser beta=25 concentrates What into
   ~2*9+1 significant taps (|What_q| < 1e-7 * What_0 outside), so the whole
   second windowed matmul variant of the direct path collapses into a
   19-tap complex convolution along the bin axis.

Both identities are verified numerically at plan-build time (tone purity,
integer shifts) and the module is cross-checked against ops/dechirp.
pyramid_spectra in tests/test_overlap_dft.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PYRAMID_OVERLAP_FACTOR, LoraConfig
from .cplx import cmag, cmul
from .dechirp import kaiser_window
from .dft import BandSpec, ZoomDftPlan


class OverlapPlan(NamedTuple):
    chunk_dft: ZoomDftPlan       # [.., h, 2] -> all-F-bin spectrum
    rho: np.ndarray              # float32[r, F, 2] per-j phase weights
    sigma: tuple                 # int bin shift per j (roll amounts)
    win_shifts: tuple            # int bin shift per window tap
    win_taps: np.ndarray         # float32[T, 2] complex tap coefficients


@lru_cache(maxsize=None)
def overlap_plan(sf: int, p: int, fft_factor: int, beta: float,
                 precision: str = "highest",
                 tap_tol: float = 1e-7) -> OverlapPlan:
    n = p << sf
    r = PYRAMID_OVERLAP_FACTOR
    h = n // r
    f = fft_factor * n
    k = fft_factor << sf
    if k % r:
        raise ValueError(f"bin shift K/{r} not integral (K={k})")
    # Exact float64 dechirp chirp (chirp_tables truncates to complex64;
    # the identity below is exact only for the exact quadratic phase).
    i = np.arange(n, dtype=np.float64)
    down = np.exp(1j * (np.pi / p) * (i - i * i / n))

    # -- identity 1: per-position tone correction, verified numerically.
    # Quadratic-phase cross term: down[j*h+u] = beta_j *
    #   exp(-2*pi*i*j*h*u/(p*n)) * down[u]  ->  nu = -j*h/(p*n) cycles/sample.
    u = np.arange(h)
    rho = np.zeros((r, f), np.complex128)
    sigma = []
    for j in range(r):
        tau = down[j * h + u] * np.conj(down[u])
        beta_j = tau[0]
        nu = -j * h / (p * n)
        fit = beta_j * np.exp(2j * np.pi * nu * u)
        err = np.max(np.abs(tau - fit))
        assert err < 1e-9, f"chunk correction j={j} not a pure tone ({err})"
        shift = nu * f
        s_int = int(round(shift))
        assert abs(shift - s_int) < 1e-6, f"non-integer bin shift {shift}"
        sigma.append(s_int % f)
        # Frame spectrum: chunk at position j contributes
        # e^{-2 pi i j h c / F} * beta_j * G[b+j, c - s_int].
        c = np.arange(f)
        rho[j] = beta_j * np.exp(-2j * np.pi * j * h * c / f)
    rho_ri = np.stack([rho.real, rho.imag], axis=-1).astype(np.float32)

    # -- identity 2: window DFT taps (exact; truncation below tap_tol).
    w = np.asarray(kaiser_window(n, beta), np.float64)
    what = np.fft.fft(w) / n
    mag = np.abs(what)
    keep = np.nonzero(mag > tap_tol * mag.max())[0]
    win_shifts = tuple(int(q * fft_factor) % f for q in keep)
    win_taps = np.stack([what[keep].real, what[keep].imag],
                        axis=-1).astype(np.float32)

    plan = ZoomDftPlan(h, f, BandSpec(f, 0), down[:h], precision=precision)
    return OverlapPlan(plan, rho_ri, tuple(sigma), win_shifts, win_taps)


def fast_pyramid_spectra(iq: jnp.ndarray, cfg: LoraConfig, num_hops: int):
    """iq float32[T, 2] -> (fft_add, fft_add_w, h_single), each
    [num_hops, K] — numerically equal to framing + ops/dechirp.
    pyramid_spectra at ~10x fewer FLOPs (see module docstring)."""
    plan = overlap_plan(cfg.sf, cfg.p, cfg.fft_factor, cfg.beta,
                        cfg.precision)
    n = cfg.num_samples
    r = PYRAMID_OVERLAP_FACTOR
    h = n // r
    k = cfg.bin_size
    f = cfg.fft_size
    nchunks = num_hops + r - 1

    chunks = iq[: nchunks * h].reshape(nchunks, h, 2)
    g, _ = plan.chunk_dft(chunks)                     # [nchunks, F, 2]

    rho = jnp.asarray(plan.rho)
    x = None
    for j in range(r):
        gj = jax.lax.slice_in_dim(g, j, j + num_hops, axis=0)
        gj = jnp.roll(gj, plan.sigma[j], axis=1)
        term = cmul(gj, rho[j])
        x = term if x is None else x + term           # [H, F, 2]

    # Top-band fold (== the reference's [K, 2K) fold at p = 2; correct for
    # all p — see ops/dechirp.py docstring on the fold landmine).
    mags = cmag(x)
    fft_add = mags[:, :k] + mags[:, f - k:]
    h_single = jnp.maximum(mags[:, :k], mags[:, f - k:])

    taps = jnp.asarray(plan.win_taps)
    xw = None
    for t, shift in enumerate(plan.win_shifts):
        term = cmul(jnp.roll(x, shift, axis=1), taps[t])
        xw = term if xw is None else xw + term
    magw = cmag(xw)
    fft_add_w = magw[:, :k] + magw[:, f - k:]
    return fft_add, fft_add_w, h_single
