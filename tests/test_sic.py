"""Successive interference cancellation (models/sic).

The reference has no cancellation stage — its README demonstrates one
curated collision alignment (/root/reference/README.md:26-42) and its
tracker heuristics (lib/pyramid_demod_impl.cc:393-473) drop any packet
whose peaks are masked.  SIC is the beyond-reference tier: these tests
pin the three recovery mechanisms (pass-N re-tracking after subtraction,
re-encoded exact templates, targeted re-extraction of corrupted or
truncated tracks) on deterministic fixtures where the plain Pyramid
decoder provably fails.
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.models.pyramid import pyramid_demodulate
from gr_lora_tpu.models.sic import (SicPacket, _reencode, sic_demodulate,
                                    sic_symbol_streams)

CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=8, p=2, fft_factor=8, threshold=5.0)
PAY1, PAY2 = bytes([1, 2, 3, 4, 5, 6]), bytes([7] * 5)
PDU1 = "0630f0010203040506050801"
PDU2 = "053000" + "07" * 5 + "e76b01"


def _mk_collision(off2: int, ratio: float, total: int | None = None):
    n = CFG.num_samples
    p1 = modulate(encode(PAY1, CFG), CFG, pad_front=0, pad_back=0)
    p2 = modulate(encode(PAY2, CFG), CFG, pad_front=0, pad_back=0)
    if total is None:
        total = off2 + len(p2) + 12 * n
    iq = np.zeros(total, np.complex64)
    iq[1000:1000 + len(p1)] += (0.2 * p1).astype(np.complex64)
    iq[off2:off2 + len(p2)] += (0.2 * ratio * p2).astype(np.complex64)
    return iq


def _pdus(streams):
    out = set()
    for s in streams:
        r = decode(s, CFG)
        if r.ok:
            out.add(bytes(r.payload).hex())
    return out


def test_reencode_roundtrip():
    """decode -> _reencode reproduces the exact TX symbol stream."""
    syms = np.asarray(encode(PAY1, CFG), np.uint16)
    r = decode(syms, CFG)
    assert r.crc_ok
    np.testing.assert_array_equal(_reencode(r, CFG), syms)


def test_pass0_matches_plain_pyramid():
    """On the README golden alignment SIC pass 0 is exactly the Pyramid
    decoder — a drop-in superset."""
    n = CFG.num_samples
    off2 = 1000 + 16 * n + 4 * n // 8 + 204     # known-good offset
    iq = _mk_collision(off2, 0.45)
    plain = _pdus(pyramid_demodulate(iq, CFG))
    sic = sic_demodulate(iq, CFG)
    assert _pdus([q.symbols for q in sic]) >= plain
    assert {PDU1, PDU2} <= _pdus([q.symbols for q in sic])
    assert all(q.sic_pass == 0 for q in sic[:2])


def test_recovers_masked_weak_packet():
    """Deep-overlap offsets where the plain tracker (even grace mode)
    loses the weak packet: SIC must recover BOTH byte-exact."""
    n = CFG.num_samples
    for off2 in (1000 + 16 * n + 13, 1000 + 16 * n + n // 2 + 13):
        iq = _mk_collision(off2, 0.2)
        plain = _pdus(pyramid_demodulate(iq, CFG, grace=8))
        got = _pdus(sic_symbol_streams(iq, CFG, grace=8))
        assert {PDU1, PDU2} <= got, (off2, got)
        assert got >= plain


def test_refinement_fixes_truncated_track():
    """depth-8n offset: the weak packet's track is truncated/corrupted by
    the strong packet's tail; targeted re-extraction recovers it."""
    n = CFG.num_samples
    off2 = 1000 + 8 * n + 204
    iq = _mk_collision(off2, 0.45)
    plain = _pdus(pyramid_demodulate(iq, CFG, grace=8))
    assert PDU2 not in plain                   # the failure SIC must fix
    sic = sic_demodulate(iq, CFG, grace=8)
    assert {PDU1, PDU2} <= _pdus([q.symbols for q in sic])
    assert any(q.refined for q in sic)          # via re-extraction


def test_subtracted_diagnostics():
    n = CFG.num_samples
    off2 = 1000 + 16 * n + 4 * n // 8 + 204
    iq = _mk_collision(off2, 0.45)
    sic = sic_demodulate(iq, CFG)
    subbed = [q for q in sic if q.subtracted]
    assert subbed, "strong packet should be reconstructed and removed"
    assert all(0.0 < q.captured <= 1.2 for q in subbed)
    assert all(isinstance(q, SicPacket) for q in sic)


def test_single_packet_noop():
    """No collision: SIC returns the one packet, no spurious extras."""
    n = CFG.num_samples
    p1 = modulate(encode(PAY1, CFG), CFG, pad_front=0, pad_back=0)
    iq = np.zeros(len(p1) + 14 * n, np.complex64)
    iq[1000:1000 + len(p1)] = (0.2 * p1).astype(np.complex64)
    sic = sic_demodulate(iq, CFG)
    assert _pdus([q.symbols for q in sic]) == {PDU1}
    assert len(sic) == 1


def test_refine_disabled_falls_back():
    """refine=False still does plain multi-pass subtraction (no crash,
    pass-0 packets intact)."""
    n = CFG.num_samples
    off2 = 1000 + 16 * n + 4 * n // 8 + 204
    iq = _mk_collision(off2, 0.45)
    got = _pdus(sic_symbol_streams(iq, CFG, refine=False))
    assert {PDU1, PDU2} <= got


@pytest.mark.parametrize("ratio", [0.45, 0.2])
def test_python_tracker_agrees(ratio):
    """use_native=False path produces the same PDUs."""
    n = CFG.num_samples
    off2 = 1000 + 16 * n + 13
    iq = _mk_collision(off2, ratio)
    a = _pdus(sic_symbol_streams(iq, CFG, grace=8, use_native=False))
    b = _pdus(sic_symbol_streams(iq, CFG, grace=8))
    assert a == b
    assert {PDU1, PDU2} <= a


def test_known_fast_path_skips_dense_passes(monkeypatch):
    """r5 gateway fast path: with the tracker's packets passed as
    ``known`` and the residual gate on, a fully-explained window runs
    ZERO dense demod passes — only the cancellations — while a window
    with unexplained residual (the masked-preamble case) still falls
    through to the full loop and recovers the collider."""
    from gr_lora_tpu.models import sic as sic_mod

    calls = {"n": 0}
    real = sic_mod._demod_pass

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sic_mod, "_demod_pass", counting)

    # Single clean packet, known: explained after one subtraction.
    n = CFG.num_samples
    p1 = modulate(encode(PAY1, CFG), CFG, pad_front=0, pad_back=0)
    iq = np.zeros(1000 + len(p1) + 12 * n, np.complex64)
    iq[1000:1000 + len(p1)] += (0.2 * p1).astype(np.complex64)
    # Tracker-convention timestamp (~7 symbols past the packet start) —
    # what the gateway's tracker results carry (models/sic._align hint).
    known = [(1000 + 7 * n, np.asarray(encode(PAY1, CFG), np.uint16))]
    pkts = sic_demodulate(iq, CFG, known=known, residual_gate=0.02,
                          fast_align=True)
    assert _pdus([q.symbols for q in pkts]) == {PDU1}
    assert calls["n"] == 0

    # Masked-preamble collision (hop-aligned, ratio 0.2): the strong
    # packet alone leaves ~3.8 % unexplained -> dense passes run and the
    # weak PDU is recovered.
    iq2 = _mk_collision(1000 + 16 * n, 0.2)
    pkts2 = sic_demodulate(iq2, CFG, known=known, residual_gate=0.02,
                           fast_align=True)
    assert calls["n"] >= 1
    assert {PDU1, PDU2} <= _pdus([q.symbols for q in pkts2])
