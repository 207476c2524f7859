"""End-to-end wideband gateway chain (VERDICT r1 #9, r2 #4).

ONE fixture through the FULL product path the README advertises — both as
a hand-assembled chain (channelizer -> triggered receiver + pyramid
gateway -> PduSink) and as ONE `apps.gateway --collision` CLI command
(capture -> streaming channelizer -> detection-gated pyramid -> UDP).
Every injected payload must arrive exactly once with the right channel /
SF / position.
"""

import socket

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.apps.common import UdpPduPort
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.dist.pdu_sink import PduEvent, PduSink
from gr_lora_tpu.dist.pyramid_gateway import PyramidGateway
from gr_lora_tpu.dist.triggered import TriggeredReceiver
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.pipeline.channelizer import channel_frequencies, channelize

FS = 500e3
SPACING = 125e3
CHANNELS = 4
P = 2

PYR_CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=P, fft_factor=8, threshold=5.0)
TRIG_BASE = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                       payload_len=8, p=P, fft_factor=4)

PAYLOADS = {
    # channel: (sf, payload bytes, baseband offset in samples)
    # NOTE: payloads chosen so the encoded symbol streams have no
    # adjacent-equal symbols — the Pyramid lattice inherently merges
    # equal back-to-back apexes into one track (documented limitation,
    # tests/test_pyramid.py::test_adjacent_equal_symbols_limitation), and
    # the CLI collision path decodes EVERY channel through the pyramid.
    # (A 3-byte SF7 payload is impossible here: its explicit HEADER
    # symbols alone contain a 1,1,1 run.)  The SF7 single sits AFTER the
    # adjacent-channel collision pair: the pair's spectral skirt on ch0
    # perturbs raw pyramid apex bins by ±1 (verified: 75 -> 74 on one
    # symbol when overlapped), which CR 4/5 detects but cannot correct —
    # the reference tracker has the same exposure.  The SF9 single on the
    # non-adjacent ch2 keeps full temporal overlap with the collision.
    0: (7, bytes([0x10, 0x20, 0x30, 0x40]), 26000),
    2: (9, bytes([0xDE, 0xAD, 0xBE, 0xEF]), 5000),
}
COLL_CH = 1
COLL_P1 = bytes([1, 2, 3, 4, 5, 6])
COLL_P2 = bytes([7] * 5)
PDU_1 = "0630f0010203040506050801"
PDU_2 = "053000" + "07" * 5 + "e76b01"


def _wideband_fixture(seed=0):
    """Per-channel packets synthesized directly AT the wideband rate
    (modulate supports any p — no upsampling images), mixed to their
    channel slots and summed."""
    n8 = PYR_CFG.num_samples
    total_bb = 1000 + 76 * n8
    up = int(FS / (P * SPACING))          # wideband p = P * up
    total = total_bb * up
    pw = P * up
    rng = np.random.default_rng(seed)
    freqs = channel_frequencies(CHANNELS, SPACING)
    t = np.arange(total) / FS
    wide = np.zeros(total, np.complex64)

    def place(ch, sf, iq_w, off_bb):
        off = off_bb * up
        seg = (iq_w * np.exp(2j * np.pi * freqs[ch] * t[off:off + len(iq_w)])
               ).astype(np.complex64)
        wide[off:off + len(iq_w)] += seg

    for ch, (sf, payload, off) in PAYLOADS.items():
        cfg = TRIG_BASE.replace(sf=sf, ldr=(1 << sf) / SPACING > 16e-3)
        pkt = 0.4 * modulate(encode(payload, cfg), cfg, p=pw,
                             pad_front=0, pad_back=0)
        place(ch, sf, pkt, off)

    p1 = 0.4 * modulate(encode(COLL_P1, PYR_CFG), PYR_CFG, p=pw,
                        pad_front=0, pad_back=0)
    p2 = 0.18 * modulate(encode(COLL_P2, PYR_CFG), PYR_CFG, p=pw,
                         pad_front=0, pad_back=0)
    off2 = 1000 + 16 * n8 + 4 * n8 // 8 + 204
    place(COLL_CH, 8, p1, 1000)
    place(COLL_CH, 8, p2, off2)

    wide += 0.01 * (rng.standard_normal(total)
                    + 1j * rng.standard_normal(total)
                    ).astype(np.complex64)
    return wide


def test_wideband_chain_to_udp():
    import jax

    wide = _wideband_fixture()
    wide_ri = np.stack([wide.real, wide.imag], -1).astype(np.float32)
    chans = np.ascontiguousarray(np.asarray(jax.device_get(
        channelize(wide_ri, CHANNELS, FS, SPACING, p=P))))
    assert chans.shape[0] == CHANNELS

    rx_port = UdpPduPort(listen_port=0)
    addr = rx_port.sock.getsockname()
    sink = PduSink(udp=("127.0.0.1", addr[1]), crc_filter=True)

    # Triggered multi-SF receiver for the single packets (skip SF8: the
    # collision channel belongs to the pyramid path).
    trig = TriggeredReceiver(TRIG_BASE, sfs=(7, 9), bw=SPACING)
    for p in trig(chans):
        if p.result.crc_ok:
            sink.emit(PduEvent(p.channel, p.sf, p.position,
                               bytes(p.result.payload), p.result.crc_ok))

    # Pyramid collision gateway over all channels at SF8.
    gw = PyramidGateway(PYR_CFG, CHANNELS, block_hops=512)
    for pkt in gw.feed(chans) + gw.flush():
        if pkt.result is not None and pkt.result.ok and pkt.result.crc_ok:
            sink.emit(PduEvent(pkt.channel, 8, pkt.position,
                               bytes(pkt.result.payload), pkt.result.crc_ok))

    # Collect UDP datagrams (wire format: ch, sf, pos_le32, payload).
    got = []
    rx_port.sock.settimeout(0.5)
    try:
        while True:
            data, _ = rx_port.sock.recvfrom(65536)
            got.append((data[0], data[1],
                        int.from_bytes(data[2:6], "little", signed=False),
                        data[6:].hex()))
    except socket.timeout:
        pass
    finally:
        rx_port.close()
        sink.close()

    # A LoRa signal fills its whole channel, so a strong packet's spectral
    # skirt can decode on neighboring channels too; dedupe by RSSI exactly
    # like apps/gateway.py (production-gateway behavior).
    def rssi(ch, sf, pos):
        n = (1 << sf) * P
        seg = chans[ch, pos:pos + 8 * n]
        return float(np.mean(seg ** 2)) if seg.size else 0.0

    best = {}
    for ch, sf, pos, pdu in got:
        key = (sf, pdu)
        if key not in best or rssi(ch, sf, pos) > rssi(*best[key][:3]):
            best[key] = (ch, sf, pos, pdu)
    deduped = list(best.values())

    def hits(pred):
        return [g for g in deduped if pred(g)]

    # Singles: exactly once, right channel/SF, position near injection
    # (PDU = 3 header bytes + payload + CRC + pass flag).
    for ch, (sf, payload, off) in PAYLOADS.items():
        n = (1 << sf) * P
        matches = hits(lambda g, ch=ch, sf=sf, payload=payload:
                       g[0] == ch and g[1] == sf
                       and g[3][6:].startswith(payload.hex()))
        assert len(matches) == 1, (ch, sf, matches, deduped)
        pos = matches[0][2]
        assert 0 <= pos - off <= 10 * n, (pos, off)

    # Collision pair: both golden PDUs exactly once on the collision
    # channel, positions near the injected preamble starts.
    n8 = PYR_CFG.num_samples
    m1 = hits(lambda g: g[0] == COLL_CH and g[3] == PDU_1)
    m2 = hits(lambda g: g[0] == COLL_CH and g[3] == PDU_2)
    assert len(m1) == 1, (m1, deduped)
    assert len(m2) == 1, (m2, deduped)
    # Pyramid positions are the tracker's preamble REFERENCE timestamp
    # (the walked-back apex of the last trackable preamble chirp, ~7
    # symbols after packet start).
    off2 = 1000 + 16 * n8 + 4 * n8 // 8 + 204
    assert 0 <= m1[0][2] - 1000 <= 10 * n8, m1
    assert 0 <= m2[0][2] - off2 <= 10 * n8, m2

    # Nothing survives on the idle channel.
    assert not hits(lambda g: g[0] == 3), deduped


def test_wideband_cli_collision_to_udp(tmp_path):
    """The SAME fixture through the ONE product command (VERDICT r2 #4):
    `apps.gateway CAPTURE --collision --udp ...` reproduces the README
    collision PDUs plus the single packets, each exactly once, over UDP."""
    from gr_lora_tpu.apps import gateway

    wide = _wideband_fixture()
    cap = tmp_path / "wideband.cf64"
    wide.astype(np.complex64).tofile(cap)

    rx_port = UdpPduPort(listen_port=0)
    addr = rx_port.sock.getsockname()

    rc = gateway.main([
        str(cap), "--collision", "--quiet",
        "--udp", f"127.0.0.1:{addr[1]}",
        "--samp-rate", str(FS), "--channels", str(CHANNELS),
        "--spacing", str(SPACING), "--sfs", "7,8,9",
        "--payload-len", "8", "--fft-factor", "8",
        "--max-payload-len", "16",
    ])
    assert rc == 0

    got = []
    rx_port.sock.settimeout(0.5)
    try:
        while True:
            data, _ = rx_port.sock.recvfrom(65536)
            got.append((data[0], data[1],
                        int.from_bytes(data[2:6], "little", signed=False),
                        data[6:].hex()))
    except socket.timeout:
        pass
    finally:
        rx_port.close()

    def hits(pred):
        return [g for g in got if pred(g)]

    # Singles: exactly once, right channel/SF.
    for ch, (sf, payload, off) in PAYLOADS.items():
        n = (1 << sf) * P
        matches = hits(lambda g, ch=ch, sf=sf, payload=payload:
                       g[0] == ch and g[1] == sf
                       and g[3][6:].startswith(payload.hex()))
        assert len(matches) == 1, (ch, sf, matches, got)
        assert 0 <= matches[0][2] - off <= 10 * n, (matches[0][2], off)

    # Collision pair: both golden PDUs exactly once on the collision
    # channel (positions are the pyramid preamble reference timestamps).
    n8 = PYR_CFG.num_samples
    off2 = 1000 + 16 * n8 + 4 * n8 // 8 + 204
    m1 = hits(lambda g: g[0] == COLL_CH and g[3] == PDU_1)
    m2 = hits(lambda g: g[0] == COLL_CH and g[3] == PDU_2)
    assert len(m1) == 1, (m1, got)
    assert len(m2) == 1, (m2, got)
    assert 0 <= m1[0][2] - 1000 <= 10 * n8, m1
    assert 0 <= m2[0][2] - off2 <= 10 * n8, m2
    assert not hits(lambda g: g[0] == 3), got
