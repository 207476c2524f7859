"""Gateway-scale collision decoding (VERDICT r1 #1).

The README two-packet collision injected on MANY channels simultaneously,
decoded by the channel-batched lattice + native multi-tracker bank — on one
device and on an 8-device {ch, t} mesh — must recover both golden PDUs on
every channel, including packets spanning streaming block boundaries.
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.dist.pyramid_gateway import PyramidGateway
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=8, p=2, fft_factor=8, threshold=5.0)
_N = CFG.num_samples
PDU_1 = "0630f0010203040506050801"
PDU_2 = "053000" + "07" * 5 + "e76b01"


def _tx(payload, amp):
    return amp * modulate(encode(payload, CFG), CFG, pad_front=0, pad_back=0)


def _collision_matrix(channels, total, seed=3):
    """Every channel gets the known-good README collision alignment at a
    channel-dependent base offset."""
    iq = np.zeros((channels, total), np.complex64)
    p1 = _tx(bytes([1, 2, 3, 4, 5, 6]), 0.2)
    p2 = _tx(bytes([7] * 5), 0.09)
    for c in range(channels):
        base = 1000 + c * 4 * _N
        off2 = base + 16 * _N + 4 * _N // 8 + 204
        iq[c, base:base + len(p1)] += p1
        iq[c, off2:off2 + len(p2)] += p2
        assert off2 + len(p2) < total
    return iq


def _pdus_by_channel(packets):
    out = {}
    for pkt in packets:
        if pkt.result is not None and pkt.result.ok:
            out.setdefault(pkt.channel, set()).add(
                bytes(pkt.result.payload).hex())
    return out


def test_multichannel_collisions_single_device():
    channels = 4
    total = 1000 + channels * 4 * _N + 76 * _N
    iq = _collision_matrix(channels, total)
    gw = PyramidGateway(CFG, channels, block_hops=512)
    got = gw.feed(to_ri(iq))
    got += gw.flush()
    pdus = _pdus_by_channel(got)
    for c in range(channels):
        assert PDU_1 in pdus.get(c, set()), (c, pdus)
        assert PDU_2 in pdus.get(c, set()), (c, pdus)


def test_multichannel_collisions_mesh():
    """Same fixture through a {ch: 2, t: 4} 8-device mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("ch", "t"))
    channels = 4
    total = 1000 + channels * 4 * _N + 76 * _N
    iq = _collision_matrix(channels, total)
    gw = PyramidGateway(CFG, channels, block_hops=512, mesh=mesh)
    got = gw.feed(to_ri(iq))
    got += gw.flush()
    pdus = _pdus_by_channel(got)
    for c in range(channels):
        assert PDU_1 in pdus.get(c, set()), (c, pdus)
        assert PDU_2 in pdus.get(c, set()), (c, pdus)


def test_streaming_blocks_match_one_shot():
    """Feeding in small chunks (packets straddle block boundaries) produces
    exactly the one-shot symbol streams."""
    channels = 2
    total = 1000 + channels * 4 * _N + 76 * _N
    iq = to_ri(_collision_matrix(channels, total))

    one = PyramidGateway(CFG, channels, block_hops=2048,
                         decode_payloads=False)
    ref = [(p.channel, p.symbols.tobytes())
           for p in one.feed(iq) + one.flush()]

    small = PyramidGateway(CFG, channels, block_hops=128,
                           decode_payloads=False)
    got = []
    step = 3000
    for i in range(0, total, step):
        got += small.feed(iq[:, i:i + step])
    got += small.flush()
    got = [(p.channel, p.symbols.tobytes()) for p in got]
    assert sorted(got) == sorted(ref)


def test_python_tracker_bank_matches_native():
    channels = 2
    total = 1000 + channels * 4 * _N + 76 * _N
    iq = to_ri(_collision_matrix(channels, total))
    a = PyramidGateway(CFG, channels, block_hops=512, use_native=True,
                       decode_payloads=False)
    b = PyramidGateway(CFG, channels, block_hops=512, use_native=False,
                       decode_payloads=False)
    ra = sorted((p.channel, p.symbols.tobytes())
                for p in a.feed(iq) + a.flush())
    rb = sorted((p.channel, p.symbols.tobytes())
                for p in b.feed(iq) + b.flush())
    assert ra == rb


def test_stats_counters_zero_on_clean_input():
    channels = 2
    total = 1000 + channels * 4 * _N + 76 * _N
    iq = to_ri(_collision_matrix(channels, total))
    gw = PyramidGateway(CFG, channels, block_hops=512)
    gw.feed(iq)
    gw.flush()
    s = gw.stats()
    assert s["tracks_dropped"] == 0
    assert s["packets_dropped"] == 0
    assert s["tracks_overflow_finalized"] == 0
