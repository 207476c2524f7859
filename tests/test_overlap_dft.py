"""Overlap-decomposed pyramid front-end == direct framed front-end.

The fast path (ops/overlap_dft.py) must be numerically interchangeable with
ops/dechirp.pyramid_spectra: same spectra to float32 round-off, same peaks,
same end-to-end collision PDUs.
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.config import PYRAMID_OVERLAP_FACTOR
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.models.pyramid import make_peak_lattice, pyramid_demodulate
from gr_lora_tpu.ops.cplx import to_ri


def _spectra_pair(cfg, H=40, seed=0):
    import jax.numpy as jnp

    from gr_lora_tpu.ops.dechirp import pyramid_spectra
    from gr_lora_tpu.ops.overlap_dft import fast_pyramid_spectra

    n = cfg.num_samples
    hop = n // PYRAMID_OVERLAP_FACTOR
    rng = np.random.default_rng(seed)
    iq = rng.normal(0, 1, ((H + 7) * hop + n, 2)).astype(np.float32)
    frames = np.stack([iq[b * hop: b * hop + n] for b in range(H)])
    ref = pyramid_spectra(jnp.asarray(frames), cfg)
    fast = fast_pyramid_spectra(jnp.asarray(iq), cfg, H)
    return [np.asarray(x) for x in ref], [np.asarray(x) for x in fast]


@pytest.mark.parametrize("p,ff,sf", [(2, 2, 8), (8, 2, 8), (2, 8, 7),
                                     (4, 2, 8)])
def test_fast_spectra_match_direct(p, ff, sf):
    cfg = LoraConfig(sf=sf, p=p, fft_factor=ff, precision="highest")
    ref, fast = _spectra_pair(cfg)
    for name, a, b in zip(("fft_add", "fft_add_w", "h_single"), ref, fast):
        rel = np.max(np.abs(a - b)) / np.max(np.abs(a))
        assert rel < 2e-5, (name, rel)


def test_fast_lattice_identical_peaks():
    """Same top-M peak bins/heights from both lattice backends on a real
    collision waveform."""
    import jax

    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0)
    n = cfg.num_samples
    pkt1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                          pad_front=0, pad_back=0)
    pkt2 = 0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                           pad_front=0, pad_back=0)
    total = 1000 + len(pkt1) + 20 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(pkt1)] += pkt1
    off = 1000 + 16 * n + 204
    iq[off:off + len(pkt2)] += pkt2
    ri = to_ri(iq)

    from gr_lora_tpu.models.pyramid import num_hops_for
    nh = num_hops_for(cfg, ri.shape[0])
    ref = jax.device_get(make_peak_lattice(cfg, nh, 16, "xla")(ri))
    fast = jax.device_get(make_peak_lattice(cfg, nh, 16, "fast")(ri))
    rb, rh, rs, rv = (np.asarray(x) for x in ref)
    fb, fh, fs, fv = (np.asarray(x) for x in fast)
    assert np.array_equal(rv, fv)
    assert np.array_equal(rb[rv], fb[fv])
    assert np.allclose(rh[rv], fh[fv], rtol=1e-4)
    assert np.allclose(rs[rv], fs[fv], rtol=1e-4)


def test_fast_backend_collision_byte_exact():
    """End-to-end: README two-packet collision decodes byte-exact through
    the fast front-end."""
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0)
    n = cfg.num_samples
    pkt1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                          pad_front=0, pad_back=0)
    pkt2 = 0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                           pad_front=0, pad_back=0)
    off = 1000 + 16 * n + 4 * n // 8 + 204
    total = off + len(pkt2) + 10 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(pkt1)] += pkt1
    iq[off:off + len(pkt2)] += pkt2

    pdus = {bytes(r.payload).hex()
            for r in (decode(s, cfg)
                      for s in pyramid_demodulate(iq, cfg, backend="fast"))
            if r.ok}
    assert "0630f0010203040506050801" in pdus, pdus
    assert "053000" + "07" * 5 + "e76b01" in pdus, pdus
