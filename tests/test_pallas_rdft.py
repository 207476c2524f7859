"""Real-DFT-decomposed direct front-end (ops/pallas_rdft) vs the XLA path.

Interpret mode on CPU; real-TPU numbers live in docs/BENCH.md
(tools/kernel_ab.py measures the variants side by side).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri
from gr_lora_tpu.ops.dechirp import pyramid_spectra
from gr_lora_tpu.ops.pallas_rdft import make_rdft_spectra

CFG = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=4, p=2, fft_factor=2, threshold=5.0)


def _signal(cfg=CFG):
    rng = np.random.default_rng(0)
    iq = to_ri(modulate(encode(bytes([1, 2, 3, 4]), cfg), cfg))
    return iq + rng.normal(0, 0.01, iq.shape).astype(np.float32)


def _xla_spectra(iq, cfg, num):
    n = cfg.num_samples
    hop = n // 8
    idx = np.arange(num)[:, None] * hop + np.arange(n)[None, :]
    frames = jnp.asarray(iq)[idx]
    return tuple(np.asarray(x) for x in pyramid_spectra(frames, cfg))


@pytest.mark.parametrize("rev", ["flip", "matmul"])
@pytest.mark.parametrize("ff", [2, 8])
def test_rdft_matches_xla_spectra(rev, ff):
    """The conjugate-recombined negative band equals the direct second
    band dot at bf16 tolerance — both fold tiers and h_single."""
    cfg = CFG.replace(fft_factor=ff)
    iq = _signal(cfg)
    n = cfg.num_samples
    hop = n // 8
    num = (iq.shape[0] - n) // hop + 1
    fa, faw, hs = _xla_spectra(iq, cfg, num)

    fn = make_rdft_spectra(cfg, num, frame_tile=64, rev=rev, interpret=True)
    pfa, pfaw, phs = (np.asarray(jax.device_get(x))
                      for x in fn(jnp.asarray(iq)))

    scale = np.abs(fa).max()
    for a, b in ((fa, pfa), (faw, pfaw), (hs, phs)):
        assert a.shape == b.shape
        assert np.max(np.abs(a - b)) < 5e-3 * scale, np.max(np.abs(a - b))


@pytest.mark.parametrize("ff", [2, 8])
def test_rdft_peaks_match_rdft_spectra_epilogue(ff):
    """make_rdft_peaks == rdft-backend spectra + XLA peak epilogue (the
    same arithmetic, so identical peak sets and heights); vs the XLA
    f32 lattice only marginal plateau maxima may shift (bf16 class —
    the tracker's bin tolerance absorbs them, test_rdft_golden_decode
    proves it at the decode level)."""
    from gr_lora_tpu.models.pyramid import peak_lattice_fn
    from gr_lora_tpu.ops.pallas_rdft import (make_rdft_peaks,
                                             rdft_peaks_supported)

    cfg = CFG.replace(fft_factor=ff, precision="bf16")
    assert rdft_peaks_supported(cfg)
    iq = _signal(cfg)
    n = cfg.num_samples
    hop = n // 8
    nh = (iq.shape[0] - n) // hop

    ref = jax.jit(peak_lattice_fn(cfg, nh, 8, "rdft"))
    got = jax.jit(make_rdft_peaks(cfg, nh, 8, frame_tile=64,
                                  interpret=True))
    rb, rh, rhs, rv = (np.asarray(x) for x in ref(jnp.asarray(iq)))
    gb, gh, ghs, gv = (np.asarray(x) for x in got(jnp.asarray(iq)))
    assert np.array_equal(rv, gv)
    assert np.array_equal(rb[rv], gb[gv])
    np.testing.assert_allclose(rh[rv], gh[gv], rtol=1e-6)
    np.testing.assert_allclose(rhs[rv], ghs[gv], rtol=1e-6)


def test_rdft_golden_decode():
    """Decode-level bar: the README golden collision decodes byte-exact
    through the rdft-dispatched fused backend (what the north-star
    gateway runs at SF7/8)."""
    from gr_lora_tpu.core.codec import decode
    from gr_lora_tpu.models.pyramid import pyramid_demodulate

    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0,
                     precision="bf16")
    n = cfg.num_samples
    p1 = (0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                         pad_front=0, pad_back=0)).astype(np.complex64)
    p2 = (0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                          pad_front=0, pad_back=0)).astype(np.complex64)
    off = 1000 + 16 * n + 4 * n // 8 + 204
    iq = np.zeros(off + len(p2) + 8 * n, np.complex64)
    iq[1000:1000 + len(p1)] += p1
    iq[off:off + len(p2)] += p2
    syms = pyramid_demodulate(iq, cfg, max_peaks=8, backend="fused")
    pdus = {bytes(r.payload).hex() for r in (decode(s, cfg) for s in syms)
            if r.ok}
    assert "0630f0010203040506050801" in pdus, pdus
    assert "0530000707070707e76b01" in pdus, pdus


def test_fused_backend_dispatches_to_rdft():
    """peak_lattice_fn('fused') must pick the rDFT kernel where its
    weight block fits (the SF7/8 collision-zoom north-star windows) and
    still produce the peak-lattice contract."""
    from gr_lora_tpu.models.pyramid import peak_lattice_fn
    from gr_lora_tpu.ops.pallas_rdft import rdft_peaks_supported

    cfg = CFG.replace(fft_factor=8, precision="bf16")
    assert rdft_peaks_supported(cfg)
    iq = _signal(cfg)
    n = cfg.num_samples
    nh = (iq.shape[0] - n) // (n // 8)
    fn = jax.jit(peak_lattice_fn(cfg, nh, 8, "fused"))
    bins, h, hs, valid = (np.asarray(x) for x in fn(jnp.asarray(iq)))
    assert bins.shape == (nh, 8) and valid.any()


def test_rdft_peaks_sf9_collision_zoom():
    """r5 cap raise: the SF9 x ff=8 plan (n*kp = 4.33 M, the largest
    admitted) must dispatch to the rDFT kernel and agree with the
    spectra + XLA-epilogue tier."""
    from gr_lora_tpu.models.pyramid import peak_lattice_fn
    from gr_lora_tpu.ops.pallas_rdft import (make_rdft_peaks,
                                             rdft_peaks_supported)

    cfg = LoraConfig(sf=9, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=4, p=2, fft_factor=8, threshold=5.0,
                     precision="bf16")
    assert rdft_peaks_supported(cfg)
    assert not rdft_peaks_supported(cfg.replace(sf=10))
    iq = _signal(cfg)
    n = cfg.num_samples
    nh = (iq.shape[0] - n) // (n // 8)
    ref = jax.jit(peak_lattice_fn(cfg, nh, 8, "rdft"))
    got = jax.jit(make_rdft_peaks(cfg, nh, 8, frame_tile=64,
                                  interpret=True))
    rb, rh, rhs, rv = (np.asarray(x) for x in ref(jnp.asarray(iq)))
    gb, gh, ghs, gv = (np.asarray(x) for x in got(jnp.asarray(iq)))
    assert rv.any()
    assert np.array_equal(rv, gv)
    assert np.array_equal(rb[rv], gb[gv])
    np.testing.assert_allclose(rh[rv], gh[gv], rtol=1e-6)


def test_rdft_ragged_frames_and_short_input():
    """num_frames not a multiple of frame_tile; frames past the capture
    end are zero-padded, never wrapped."""
    iq = _signal()
    n = CFG.num_samples
    hop = n // 8
    num = (iq.shape[0] - n) // hop + 1 - 7 + 32
    fn = make_rdft_spectra(CFG, num, frame_tile=64, interpret=True)
    fa, faw, hs = (np.asarray(jax.device_get(x)) for x in fn(jnp.asarray(iq)))
    assert fa.shape == (num, CFG.bin_size)
    assert np.all(fa[-8:] < 1e-3)

    ref_num = (iq.shape[0] - n) // hop + 1 - 7
    rfa, _, _ = _xla_spectra(iq, CFG, ref_num)
    scale = np.abs(rfa).max()
    assert np.max(np.abs(rfa - fa[:ref_num])) < 5e-3 * scale


@pytest.mark.parametrize("num", [8, 9, 20, 63])
def test_rdft_short_plans_build(num):
    """num_frames below one frame tile and NOT a multiple of 8 (small
    pyramid_demodulate buffers): the halo BlockSpec indexes in 8-row
    units, so the tile is rounded up and the padding sliced off."""
    from gr_lora_tpu.ops.pallas_rdft import make_rdft_peaks

    iq = _signal()
    fn = make_rdft_spectra(CFG, num, interpret=True)
    fa, faw, hs = fn(jnp.asarray(iq))
    assert fa.shape == (num, CFG.bin_size)
    pk = make_rdft_peaks(CFG, num, 8, interpret=True)
    assert np.asarray(pk(jnp.asarray(iq))[0]).shape == (num, 8)
