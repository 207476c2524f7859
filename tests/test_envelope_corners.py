"""Reference-envelope corners (VERDICT r1 #5).

The reference supports fs/bw in {2, 8} (rx_file.grc resampler; pyramid GRC
default fs_bw_ratio=8, grc/lora_pyramid_demod.block.yml:31), SF 6-12, and
LDR.  These corners were previously covered only at the codec layer; here
the full FSM / pyramid paths run them.
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.demodulator import demodulate
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.models.pyramid import pyramid_demodulate


def _loopback(cfg, payload, noise=0.0, seed=0):
    iq = modulate(encode(payload, cfg), cfg)
    if noise:
        rng = np.random.default_rng(seed)
        iq = iq + noise * (rng.standard_normal(len(iq))
                           + 1j * rng.standard_normal(len(iq))
                           ).astype(np.complex64)
    pkts = demodulate(iq, cfg)
    assert len(pkts) == 1, f"{len(pkts)} packets"
    res = decode(pkts[0], cfg)
    assert res.ok
    if cfg.crc:
        assert res.crc_ok
    off = 3 if cfg.explicit_header else 0
    assert bytes(res.payload[off:off + len(payload)]) == payload
    return res


# -- fs/bw = 8 (the reference's other supported ratio) through the FSM.
@pytest.mark.parametrize("sf,explicit", [(7, False), (8, True)])
def test_demod_fsm_p8(sf, explicit):
    cfg = LoraConfig(sf=sf, cr=1, crc=True, ldr=False,
                     explicit_header=explicit, payload_len=5, p=8,
                     fft_factor=2)
    _loopback(cfg, bytes([1, 2, 3, 4, 5]), noise=0.01)


# -- SF extremes through the FSM (codec fuzz covered them; the FSM didn't).
def test_demod_fsm_sf6():
    cfg = LoraConfig(sf=6, cr=2, crc=True, ldr=False, explicit_header=False,
                     payload_len=4, p=2, fft_factor=2)
    _loopback(cfg, bytes([9, 8, 7, 6]), noise=0.01)


def test_demod_fsm_sf11_ldr():
    # 2^11 / 125 kHz = 16.4 ms > 16 ms: the SX127x auto-LDR point.
    cfg = LoraConfig(sf=11, cr=1, crc=True, ldr=True, explicit_header=False,
                     payload_len=4, p=2, fft_factor=2)
    _loopback(cfg, bytes([0xAA, 0x55, 0x0F, 0xF0]))


def test_demod_fsm_sf12_explicit_ldr():
    cfg = LoraConfig(sf=12, cr=4, crc=True, ldr=True, explicit_header=True,
                     payload_len=3, p=2, fft_factor=2)
    _loopback(cfg, bytes([1, 2, 3]))


# -- pyramid at the GRC-default operating point (fft_factor=2,
#    threshold=0.005, fs/bw=8 — grc/lora_pyramid_demod.block.yml:18-33).
def test_pyramid_grc_defaults_p8():
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=8, fft_factor=2, threshold=0.005)
    n = cfg.num_samples
    pkt = 0.05 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                          pad_front=0, pad_back=0)
    total = 1000 + len(pkt) + 40 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(pkt)] += pkt.astype(np.complex64)
    pdus = {bytes(r.payload).hex()
            for r in (decode(s, cfg) for s in pyramid_demodulate(iq, cfg))
            if r.ok}
    assert "0630f0010203040506050801" in pdus, pdus


def test_pyramid_collision_p8():
    """Two-packet collision at fs/bw=8 (the pyramid GRC default ratio)."""
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=8, fft_factor=2, threshold=0.005)
    n = cfg.num_samples
    p1 = 0.05 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                         pad_front=0, pad_back=0)
    p2 = 0.022 * modulate(encode(bytes([7] * 5), cfg), cfg,
                          pad_front=0, pad_back=0)
    off2 = 1000 + 16 * n + 4 * n // 8 + 4 * 204
    total = off2 + len(p2) + 40 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(p1)] += p1.astype(np.complex64)
    iq[off2:off2 + len(p2)] += p2.astype(np.complex64)
    pdus = {bytes(r.payload).hex()
            for r in (decode(s, cfg) for s in pyramid_demodulate(iq, cfg))
            if r.ok}
    assert "0630f0010203040506050801" in pdus, pdus
    assert "053000" + "07" * 5 + "e76b01" in pdus, pdus


def test_pyramid_ldr_sf11():
    """Pyramid with LDR on (bin_tolerance switches to 2*fft_factor,
    pyramid_demod_impl.cc:102)."""
    cfg = LoraConfig(sf=11, cr=1, crc=True, ldr=True, explicit_header=False,
                     payload_len=4, p=2, fft_factor=2, threshold=5.0)
    n = cfg.num_samples
    tx = encode(bytes([3, 1, 4, 1]), cfg)
    pkt = 0.2 * modulate(tx, cfg, pad_front=0, pad_back=0)
    total = 1000 + len(pkt) + 40 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(pkt)] += pkt.astype(np.complex64)
    results = [decode(s, cfg) for s in pyramid_demodulate(iq, cfg)]
    good = [r for r in results if r.ok and r.crc_ok]
    assert good, [(r.ok, r.reason) for r in results]
    assert bytes(good[0].payload[:4]) == bytes([3, 1, 4, 1])


def test_pyramid_sf6():
    """SF6 (the smallest supported SF; implicit header only) through the
    pyramid lattice + tracker.

    Payload chosen without adjacent-equal TX symbols: a reference-inherent
    pyramid limitation (pyramid_demod_impl.cc:382-387) classifies the
    merged track of two consecutive identical symbols as BROKEN (length >
    2*overlaps) and drops both — small-alphabet SFs hit it often."""
    cfg = LoraConfig(sf=6, cr=1, crc=True, ldr=False, explicit_header=False,
                     payload_len=4, p=2, fft_factor=2, threshold=5.0)
    n = cfg.num_samples
    tx = encode(bytes([18, 52, 86, 120]), cfg)
    pkt = 0.2 * modulate(tx, cfg, pad_front=0, pad_back=0)
    total = 1000 + len(pkt) + 40 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(pkt)] += pkt.astype(np.complex64)
    results = [decode(s, cfg) for s in pyramid_demodulate(iq, cfg)]
    good = [r for r in results if r.ok and r.crc_ok]
    assert good, [(r.ok, r.reason) for r in results]
    assert bytes(good[0].payload[:4]) == bytes([18, 52, 86, 120])


def test_pyramid_sf12_uses_overlap_fallback():
    """SF12 at the collision zoom exceeds the direct matmul cap; the
    lattice must fall back to the overlap-decomposed path transparently
    and still decode."""
    from gr_lora_tpu.ops.dft import _DIRECT_MAX_ELEMS

    cfg = LoraConfig(sf=12, cr=1, crc=True, ldr=True, explicit_header=False,
                     payload_len=2, p=2, fft_factor=4, threshold=5.0)
    assert cfg.num_samples * 4 * cfg.bin_size > _DIRECT_MAX_ELEMS
    n = cfg.num_samples
    tx = encode(bytes([0xCA, 0xFE]), cfg)
    pkt = 0.2 * modulate(tx, cfg, pad_front=0, pad_back=0)
    total = 1000 + len(pkt) + 40 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(pkt)] += pkt.astype(np.complex64)
    results = [decode(s, cfg) for s in pyramid_demodulate(iq, cfg)]
    good = [r for r in results if r.ok and r.crc_ok]
    assert good, [(r.ok, r.reason) for r in results]
    assert bytes(good[0].payload[:2]) == bytes([0xCA, 0xFE])
