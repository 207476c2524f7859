"""Detection-gated collision gateway (dist/collision_gateway.py).

The scan-then-dispatch composition must find the same packets the
always-on Pyramid does: the SF8 golden README collision (both PDUs
byte-exact) plus single packets at other SFs on other channels, streamed
through feed() in irregular chunks, each tagged with the right
channel/sf/position.
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.dist.collision_gateway import TriggeredPyramidGateway
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

PDU1 = "0630f0010203040506050801"
PDU2 = "0530000707070707e76b01"

BASE = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                  payload_len=8, p=2, fft_factor=8, threshold=5.0)


def _golden_collision(cfg):
    n = cfg.num_samples
    p1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                        pad_front=0, pad_back=0)
    p2 = 0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                         pad_front=0, pad_back=0)
    off2 = 16 * n + 4 * n // 8 + 204
    out = np.zeros(off2 + len(p2) + 1, np.complex64)
    out[:len(p1)] += p1
    out[off2:off2 + len(p2)] += p2
    return out


@pytest.mark.parametrize("use_native,tracker,scan_precision",
                         [(True, "host", None), (False, "host", None),
                          (False, "device", "bf16")])
def test_triggered_pyramid_gateway(use_native, tracker, scan_precision):
    """The (False, 'device', 'bf16') case is the north-star bench
    configuration: on-device tracking + bf16 detection scan."""
    if use_native:
        from gr_lora_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
    channels = 3
    # Small scan chunks: CPU-mesh test streams are short; the production
    # default (1 Msample chunks) would spend the test scanning flush pad.
    gw = TriggeredPyramidGateway(BASE, channels, sfs=(7, 8, 9),
                                 max_payload_len=16,
                                 use_native=use_native, tracker=tracker,
                                 scan_precision=scan_precision,
                                 scan_chunk_samples=1 << 16)

    coll = _golden_collision(gw.sf_states[8].cfg)
    cfg9 = gw.sf_states[9].cfg
    pay9 = bytes([0xDE, 0xAD, 0xBE, 0xEF])
    pkt9 = 0.15 * modulate(encode(pay9, cfg9), cfg9, pad_front=0, pad_back=0)

    total = 200_000
    iq = np.zeros((channels, total), np.complex64)
    iq[0, 3000:3000 + len(coll)] += coll          # collision on ch0/sf8
    iq[2, 9000:9000 + len(pkt9)] += pkt9          # single on ch2/sf9
    iq += 0.003 * (np.random.default_rng(0).standard_normal((channels, total))
                   + 1j * np.random.default_rng(1).standard_normal(
                       (channels, total))).astype(np.complex64)

    ri = to_ri(iq)
    pkts = []
    for lo in range(0, total, 37_000):            # irregular chunks
        pkts += gw.feed(ri[:, lo:lo + 37_000])
    pkts += gw.flush()

    got = {}
    for p in pkts:
        if p.result is not None and p.result.ok and p.result.crc_ok:
            got.setdefault((p.channel, p.sf), []).append(
                (bytes(p.result.payload).hex(), p.position))

    sf8 = got.get((0, 8), [])
    hex8 = {h for h, _ in sf8}
    assert PDU1 in hex8 and PDU2 in hex8, got
    # Exactly one copy of each (cross-window dedupe).
    assert len([h for h, _ in sf8 if h == PDU1]) == 1, sf8
    assert len([h for h, _ in sf8 if h == PDU2]) == 1, sf8
    # Positions near the injections (pyramid position = preamble ref ts,
    # ~7 symbols after packet start).
    n8 = gw.sf_states[8].cfg.num_samples
    pos1 = [p for h, p in sf8 if h == PDU1][0]
    assert 0 <= pos1 - 3000 <= 10 * n8, pos1

    sf9 = got.get((2, 9), [])
    assert any(h[6:6 + 2 * len(pay9)] == pay9.hex() for h, _ in sf9), got
    # Nothing on the idle channel.
    assert not any(ch == 1 for ch, _ in got), got

    s = gw.stats()
    assert s["scanned_samples"] > 0 and s["dispatched_samples"] > 0
    assert s["pending_events"] == 0
    assert gw.wall["scan"] > 0 and gw.wall["lattice"] > 0
    if tracker == "device":
        assert s["device_deviations"] == 0, s


def test_cotimed_channels_not_suppressed():
    """An event on one channel must not suppress a co-timed event on
    another channel (per-channel dispatch suppression): the same golden
    collision injected at the SAME position on every channel decodes on
    every channel."""
    channels = 2
    gw = TriggeredPyramidGateway(BASE, channels, sfs=(8,),
                                 max_payload_len=16,
                                 scan_chunk_samples=1 << 16)
    coll = _golden_collision(gw.sf_states[8].cfg)
    total = 150_000
    iq = np.zeros((channels, total), np.complex64)
    for c in range(channels):
        iq[c, 5000:5000 + len(coll)] += coll
    iq += 0.003 * (np.random.default_rng(2).standard_normal(
        (channels, total))
        + 1j * np.random.default_rng(3).standard_normal(
            (channels, total))).astype(np.complex64)
    pkts = gw.feed(to_ri(iq)) + gw.flush()
    got = {}
    for p in pkts:
        if p.result is not None and p.result.ok and p.result.crc_ok:
            got.setdefault(p.channel, set()).add(
                bytes(p.result.payload).hex())
    for c in range(channels):
        assert PDU1 in got.get(c, set()), (c, got)
        assert PDU2 in got.get(c, set()), (c, got)


def test_sic_recovers_masked_preamble_in_gateway():
    """TriggeredPyramidGateway(sic=True) — VERDICT r3 task 5: a weak
    packet whose preamble is fully masked by a strong collider (the
    hop-aligned, ratio-0.2 envelope point where the bare tracker fails)
    is recovered INSIDE the gateway path by the subtract-and-re-read
    pass; without sic the weak PDU is missing."""
    cfg = BASE
    n = cfg.num_samples
    p1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                        pad_front=0, pad_back=0)
    p2 = 0.2 * 0.2 * modulate(encode(bytes([7] * 5), cfg), cfg,
                              pad_front=0, pad_back=0)
    off2 = 16 * n                 # degenerate hop-aligned masking
    total = off2 + len(p2) + 60 * n
    iq = np.zeros((1, total), np.complex64)
    iq[0, 5000:5000 + len(p1)] += p1
    iq[0, 5000 + off2:5000 + off2 + len(p2)] += p2

    def run(sic):
        gw = TriggeredPyramidGateway(cfg, 1, sfs=(8,), max_payload_len=16,
                                     scan_chunk_samples=1 << 16, sic=sic)
        pkts = gw.feed(to_ri(iq)) + gw.flush()
        pdus = {bytes(p.result.payload).hex() for p in pkts
                if p.result is not None and p.result.ok}
        return pdus, gw

    plain, _ = run(False)
    assert PDU1 in plain, plain
    assert PDU2 not in plain, ("fixture not masking enough", plain)
    with_sic, gw = run(True)
    assert PDU1 in with_sic and PDU2 in with_sic, with_sic
    assert gw.sic_windows >= 1 and gw.wall["sic"] > 0
    assert gw.stats()["sic_windows"] == gw.sic_windows


@pytest.mark.parametrize("off2", [
    # Envelope-grid probes (bench --mode collision geometry) at the hard
    # amplitude ratio 0.2: sub-symbol phases across a symbol at 16-symbol
    # overlap depth, the two degenerate hop-aligned points, and a shallow
    # depth — all points the offline SIC tier recovers 66/66
    # (docs/BENCH.md) and at least some of which the bare tracker loses.
    16 * 512 + 13, 16 * 512 + 141, 16 * 512 + 301, 16 * 512 + 461,
    16 * 512, 16 * 512 + 512 // 8, 8 * 512 + 204,
])
def test_sic_envelope_through_gateway(off2):
    """VERDICT r4 item 2: the 66/66 collision-recovery envelope must be
    reachable through the PRODUCT path — TriggeredPyramidGateway(sic=True)
    — not just models/sic offline: both golden PDUs byte-exact at every
    probed envelope point."""
    cfg = BASE
    n = cfg.num_samples
    assert n == 512
    p1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                        pad_front=0, pad_back=0)
    p2 = 0.2 * 0.2 * modulate(encode(bytes([7] * 5), cfg), cfg,
                              pad_front=0, pad_back=0)
    total = 5000 + off2 + len(p2) + 60 * n
    iq = np.zeros((1, total), np.complex64)
    iq[0, 5000:5000 + len(p1)] += p1
    iq[0, 5000 + off2:5000 + off2 + len(p2)] += p2

    gw = TriggeredPyramidGateway(cfg, 1, sfs=(8,), max_payload_len=16,
                                 scan_chunk_samples=1 << 16, sic=True)
    pkts = gw.feed(to_ri(iq)) + gw.flush()
    pdus = {bytes(p.result.payload).hex() for p in pkts
            if p.result is not None and p.result.ok}
    assert PDU1 in pdus and PDU2 in pdus, (off2, pdus)
    assert gw.sic_windows >= 1
