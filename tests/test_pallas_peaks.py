"""Fused in-kernel peak search vs the dense-spectra reference paths.

Both fused kernels (ops/pallas_direct.make_direct_peaks for small frames,
ops/pallas_peaks.make_overlap_peaks for large SF) must reproduce the
models/pyramid.peak_lattice_fn contract exactly at the same numeric tier:
same peak sets, same heights (the tracker's gates consume them).  Run in
interpret mode on the CPU mesh; the real-TPU equivalence is exercised by
bench --mode north_star golden decodes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.models.pyramid import num_hops_for, peak_lattice_fn
from gr_lora_tpu.ops.cplx import to_ri


def _fixture(cfg, seed=0, tail=18):
    n = cfg.num_samples
    pkt = 0.2 * modulate(encode(bytes([1, 2, 3, cfg.sf]), cfg), cfg,
                         pad_front=0, pad_back=0)
    rng = np.random.default_rng(seed)
    total = len(pkt) + tail * n
    iq = (0.01 * (rng.standard_normal(total)
                  + 1j * rng.standard_normal(total))).astype(np.complex64)
    iq[3 * n:3 * n + len(pkt)] += pkt
    return jnp.asarray(to_ri(iq)), total


def _peak_sets(outs):
    bins, h, hs, valid = (np.asarray(x) for x in jax.device_get(outs))
    rows = []
    for t in range(bins.shape[0]):
        v = valid[t]
        rows.append({int(b): (float(hh), float(hhs))
                     for b, hh, hhs in zip(bins[t][v], h[t][v], hs[t][v])})
    return rows


def _assert_equiv(ref_rows, fused_rows, rtol):
    assert len(ref_rows) == len(fused_rows)
    for t, (r, f) in enumerate(zip(ref_rows, fused_rows)):
        assert set(r) == set(f), (t, sorted(r), sorted(f))
        for b in r:
            np.testing.assert_allclose(r[b], f[b], rtol=rtol, err_msg=str((t, b)))


def test_fused_direct_matches_direct_backend():
    """make_direct_peaks ('fused_direct' pins it) == direct-backend
    spectra + XLA peak epilogue (same bf16 tier) — exact equality."""
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=4, fft_factor=8, threshold=5.0)
    iq, total = _fixture(cfg)
    nh = num_hops_for(cfg, total)
    ref = jax.jit(peak_lattice_fn(cfg, nh, 8, "direct"))
    fused = jax.jit(peak_lattice_fn(cfg, nh, 8, "fused_direct"))
    _assert_equiv(_peak_sets(ref(iq)), _peak_sets(fused(iq)), rtol=0)


def test_fused_rdft_matches_rdft_backend():
    """'fused' now dispatches to make_rdft_peaks where supported (round
    5); it must equal rdft-backend spectra + XLA peak epilogue — same
    arithmetic, so exact equality."""
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=4, fft_factor=8, threshold=5.0)
    from gr_lora_tpu.ops.pallas_rdft import rdft_peaks_supported
    assert rdft_peaks_supported(cfg)
    iq, total = _fixture(cfg)
    nh = num_hops_for(cfg, total)
    ref = jax.jit(peak_lattice_fn(cfg, nh, 8, "rdft"))
    fused = jax.jit(peak_lattice_fn(cfg, nh, 8, "fused"))
    _assert_equiv(_peak_sets(ref(iq)), _peak_sets(fused(iq)), rtol=0)


@pytest.mark.parametrize("sf", [9, 10])
def test_fused_overlap_matches_fast_backend(sf):
    """make_overlap_peaks == overlap-decomposed spectra + XLA peak
    epilogue (both f32) — identical peak sets, heights to float rounding.
    The kernel is pinned directly: since the r5 cap raise the 'fused'
    dispatch prefers the (bf16-class) rDFT kernel at SF9, which
    tests/test_pallas_rdft.py covers at its own tier."""
    from gr_lora_tpu.ops.pallas_peaks import make_overlap_peaks

    ldr = (1 << sf) / 125e3 > 16e-3
    cfg = LoraConfig(sf=sf, cr=1, crc=True, ldr=ldr, explicit_header=True,
                     payload_len=4, fft_factor=8, threshold=5.0)
    iq, total = _fixture(cfg, seed=sf, tail=12)
    nh = num_hops_for(cfg, total)
    ref = jax.jit(peak_lattice_fn(cfg, nh, 8, "fast"))
    fused = jax.jit(make_overlap_peaks(cfg, nh, 8, interpret=True))
    _assert_equiv(_peak_sets(ref(iq)), _peak_sets(fused(iq)), rtol=1e-5)


def test_fused_overlap_blocked_matches_unblocked():
    """The block_hops wrapper around the fused overlap kernel slices
    cleanly (each hop window is self-contained)."""
    cfg = LoraConfig(sf=9, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=4, fft_factor=8, threshold=5.0)
    iq, total = _fixture(cfg, seed=3, tail=10)
    nh = num_hops_for(cfg, total)
    whole = jax.jit(peak_lattice_fn(cfg, nh, 8, "fused"))
    blocked = jax.jit(peak_lattice_fn(cfg, nh, 8, "fused", block_hops=64))
    _assert_equiv(_peak_sets(whole(iq)), _peak_sets(blocked(iq)), rtol=1e-5)
