"""AWGN packet-error-rate behavior (SURVEY.md §4: the test pyramid's PER
curves).  Few trials per point to stay fast; asserts the floor location and
monotonic shape rather than tight probabilities."""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.models.transceiver import loopback

CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=6, p=2, fft_factor=8)
PAYLOAD = bytes([1, 2, 3, 4, 5, 6])
TRIALS = 6


def _per(snr_db):
    fails = 0
    for t in range(TRIALS):
        r = loopback(PAYLOAD, CFG, snr_db=snr_db, seed=1000 + t)
        ok = any(p.hex() == "0630f0010203040506050801" for p in r.payloads)
        fails += not ok
    return fails / TRIALS


def test_per_curve_sf8():
    """SF8 decodes reliably down to ~-12 dB and degrades below -16 dB
    (LoRa SF8 demod limit is about -13.5 dB SNR in-band; our p=2 chain
    should hold at least -12 / fail well below)."""
    per_hi = _per(0.0)
    per_mid = _per(-12.0)
    per_lo = _per(-20.0)
    assert per_hi == 0.0, f"PER at 0 dB should be 0, got {per_hi}"
    assert per_mid <= 1 / TRIALS, f"PER at -12 dB too high: {per_mid}"
    assert per_lo >= 0.5, f"PER at -20 dB suspiciously low: {per_lo}"
    assert per_hi <= per_mid <= per_lo + 1e-9


def test_sf_gain():
    """Higher SF buys sensitivity: SF10 decodes at an SNR where SF7 fails."""
    snr = -16.0
    ok = {}
    for sf in (7, 10):
        cfg = LoraConfig(sf=sf, cr=1, crc=True, ldr=False,
                         explicit_header=True, payload_len=4, p=2,
                         fft_factor=8)
        good = 0
        for t in range(4):
            r = loopback(bytes([1, 2, 3, 4]), cfg, snr_db=snr, seed=50 + t)
            good += bool(r.payloads)
        ok[sf] = good
    assert ok[10] > ok[7], ok


def test_weak_per_curve():
    """Weak-demod PER shape: clean at -8 dB, degraded at -16 dB."""
    from gr_lora_tpu.models.weak import modulate_weak, weak_demodulate

    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=False,
                     payload_len=6, p=2, fft_factor=8, weak_sym_num=12)
    rng0 = np.random.default_rng(0)
    syms = rng0.integers(0, cfg.num_symbols, 12).astype(np.uint16)
    iq = modulate_weak(syms, cfg)

    def per(snr_db):
        fails = 0
        for t in range(TRIALS):
            rng = np.random.default_rng(500 + t)
            sigma = np.sqrt(10 ** (-snr_db / 10) / 2)
            noisy = (iq + sigma * (
                rng.standard_normal(len(iq))
                + 1j * rng.standard_normal(len(iq)))).astype(np.complex64)
            pkts = weak_demodulate(noisy, cfg)
            ok = len(pkts) == 1 and np.array_equal(pkts[0], syms)
            fails += not ok
        return fails / TRIALS

    lo, hi = per(-8.0), per(-16.0)
    assert lo <= 1 / TRIALS, lo      # near-clean at -8 dB (exact-match PER)
    assert hi >= 0.5, hi
    assert lo < hi


def test_waterfall_artifact_machinery():
    """The bench-mode PER machinery (vmapped trials + waterfall
    interpolation) finds an SF7 waterfall in a physically plausible bracket
    (ideal demod bound ~ -12.5 dB; this chain gives some of that back to
    the 4-consecutive-argmax detector + hard-decision FEC)."""
    import bench

    cfg = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=False,
                     payload_len=4, p=2, fft_factor=4)
    pts = [(snr, bench.per_point(cfg, snr, trials=16, seed=7))
           for snr in (-12.0, -8.0, -5.0, -2.0, 2.0)]
    wf = bench._per_waterfall(pts)
    assert wf is not None, pts
    assert -13.0 <= wf <= -1.0, (wf, pts)
    # Monotone-ish: worst at the bottom, clean at the top.
    assert pts[0][1] >= 0.8, pts
    assert pts[-1][1] <= 0.2, pts
