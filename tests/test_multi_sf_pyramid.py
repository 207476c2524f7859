"""Multi-SF collision gateway: Pyramid on every (channel, SF) cell.

The BASELINE.md north-star composition (channels x SF7-12 with collision
decoding) at test scale: every channel carries the SF8 golden two-packet
collision (README.md:26-42 scenario) plus single packets at the other SFs
in the same stream — every payload must come back byte-exact with correct
channel/sf tags.  (Reference: rx_file_collision.grc is one channel, one
SF; README.md:45 TODO.)
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.dist.pyramid_gateway import MultiSFPyramidGateway
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

PDU1 = "0630f0010203040506050801"
PDU2 = "0530000707070707e76b01"


def _clean_payload(cfg, length, seed0=0):
    """A payload whose TX symbol stream has no adjacent-equal symbols —
    the inherent Pyramid merge landmine (SURVEY.md §7: consecutive
    identical symbols form one >2*overlaps track, classified broken).
    Unwhitened zero padding bytes (encode pads AFTER whitening, reference
    encode_impl.cc:298-306) repeat symbols structurally at some payload
    lengths, so the search varies length too."""
    for ln in (length, length + 1, length + 2, length + 3):
        for seed in range(seed0, seed0 + 64):
            rng = np.random.default_rng(seed)
            payload = bytes(int(b) for b in rng.integers(1, 255, ln))
            syms = encode(payload, cfg)
            if not np.any(syms[1:] == syms[:-1]):
                return payload
    raise AssertionError("no clean payload found")


def _golden_collision(cfg):
    """The README two-packet collision at the known-good offset."""
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


@pytest.mark.parametrize("use_native", [True, False])
def test_multi_sf_pyramid_gateway(use_native):
    if use_native:
        from gr_lora_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
    base = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                      payload_len=8, p=2, fft_factor=8, threshold=5.0)
    sfs = (7, 8, 9)
    channels = 2
    gw = MultiSFPyramidGateway(base, channels, sfs=sfs, block_hops=256,
                               use_native=use_native)

    # Per channel: SF8 golden collision late; a single clean packet per
    # other SF early, at disjoint times (quasi-orthogonality at full
    # overlap is a separate property; routing is what's under test here).
    singles = {}
    cursor_packets = []
    for sf in sfs:
        if sf == 8:
            continue
        cfg = gw.cfgs[sf]
        pay = _clean_payload(cfg, 6, seed0=sf * 10)
        singles[sf] = pay
        cursor_packets.append(
            (sf, 0.15 * modulate(encode(pay, cfg), cfg,
                                 pad_front=0, pad_back=0)))
    coll = _golden_collision(gw.cfgs[8])

    total = sum(len(p) + 4000 for _, p in cursor_packets) \
        + len(coll) + 40 * gw.cfgs[max(sfs)].num_samples + 8000
    iq = np.zeros((channels, total), np.complex64)
    for c in range(channels):
        cursor = 1000 + 137 * c
        for sf, pkt in cursor_packets:
            iq[c, cursor:cursor + len(pkt)] += pkt
            cursor += len(pkt) + 4000
        iq[c, cursor:cursor + len(coll)] += coll

    # Feed in two irregular chunks to exercise per-SF pending buffers.
    ri = to_ri(iq)
    cut = total // 3
    pkts = gw.feed(ri[:, :cut])
    pkts += gw.feed(ri[:, cut:])
    pkts += gw.flush()

    got = {}
    for p in pkts:
        if p.result is not None and p.result.ok and p.result.crc_ok:
            got.setdefault((p.channel, p.sf),
                           set()).add(bytes(p.result.payload).hex())
    for c in range(channels):
        # Both golden collision PDUs on the SF8 cell.
        assert PDU1 in got.get((c, 8), set()), (c, got)
        assert PDU2 in got.get((c, 8), set()), (c, got)
        # Each single packet on its own SF cell (PDU layout: 3 header
        # bytes | payload | 2 CRC | 1 pass flag, decode_impl.cc:406-411).
        for sf, pay in singles.items():
            hexes = got.get((c, sf), set())
            assert any(h[6:6 + 2 * len(pay)] == pay.hex() for h in hexes), \
                (c, sf, pay.hex(), hexes)
    # Wall split is populated.
    wall = gw.wall
    assert wall["fetch"] > 0 and wall["tracker"] >= 0
