"""Multi-chip gateway: channel DP x time-block SP with halo exchange.

Runs on the conftest-forced 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

import jax

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.dist.gateway import (gateway_receive, left_halo_len,
                                      make_gateway, make_mesh, right_halo_len)
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

# fft_factor >= 2: sync granularity is p/fft_factor samples; at factor 1 a
# marginal half-bin alignment can flip a symbol (the reference default is 10).
CFG = LoraConfig(sf=7, cr=2, crc=True, ldr=False, explicit_header=False,
                 payload_len=4, p=2, fft_factor=2)
PAYLOAD = bytes([0xDE, 0xAD, 0xBE, 0xEF])


def _packet(cfg=CFG, payload=PAYLOAD):
    return to_ri(modulate(encode(payload, cfg), cfg, pad_front=0, pad_back=0))


def _decode_all(packets, cfg=CFG):
    out = []
    for chan in packets:
        got = []
        for _, syms in chan:
            r = decode(syms, cfg)
            if r.ok:
                got.append(bytes(r.payload[: len(PAYLOAD)]))
        out.append(got)
    return out


def test_time_sharded_boundary_packets():
    """Packets straddling every shard boundary are each decoded exactly once."""
    nt = 4
    mesh = make_mesh(1, nt, devices=jax.devices()[:nt])
    pkt = _packet()
    # Wide enough that the mid-shard packet never overlaps a boundary packet
    # (overlap would be a collision — the pyramid decoder's job, not this one).
    block_len = max(right_halo_len(CFG), 3 * len(pkt))
    total = nt * block_len

    iq = np.zeros((1, total, 2), np.float32)
    offs = []
    # One packet centered on each interior boundary + one mid-shard.
    for b in range(1, nt):
        off = b * block_len - len(pkt) // 2
        iq[0, off:off + len(pkt)] = pkt
        offs.append(off)
    off = block_len // 4
    iq[0, off:off + len(pkt)] = pkt
    offs.append(off)

    plan = make_gateway(CFG, mesh, 1, block_len, max_packets=4)
    packets = gateway_receive(plan, iq, CFG)

    assert len(packets[0]) == len(offs), (
        f"expected {len(offs)} packets, got {[p for p, _ in packets[0]]}")
    decoded = _decode_all(packets)
    assert decoded[0] == [PAYLOAD] * len(offs)
    # Detection positions are globally consistent (within a couple of symbols
    # of the true packet start + preamble detection latency).
    det = sorted(p for p, _ in packets[0])
    for pos, off in zip(det, sorted(offs)):
        assert off <= pos <= off + 10 * CFG.num_samples


def test_channel_and_time_sharding():
    """2 channel-shards x 4 time-shards, several channels per shard."""
    mesh = make_mesh(2, 4, devices=jax.devices()[:8])
    pkt = _packet()
    block_len = max(right_halo_len(CFG), len(pkt) + 4 * CFG.num_samples)
    total = 4 * block_len
    num_channels = 4

    rng = np.random.default_rng(0)
    iq = np.zeros((num_channels, total, 2), np.float32)
    expected = []
    for c in range(num_channels):
        off = int(rng.integers(0, total - len(pkt)))
        iq[c, off:off + len(pkt)] = pkt
        expected.append([PAYLOAD])

    plan = make_gateway(CFG, mesh, num_channels, block_len, max_packets=4)
    packets = gateway_receive(plan, iq, CFG)
    assert _decode_all(packets) == expected


def test_awgn_multichannel():
    """Noisy channels still decode through the sharded path."""
    nt = 2
    mesh = make_mesh(1, nt, devices=jax.devices()[:nt])
    pkt = _packet()
    block_len = max(right_halo_len(CFG), len(pkt) + 4 * CFG.num_samples)
    total = nt * block_len

    rng = np.random.default_rng(7)
    iq = rng.normal(0, 0.02, (2, total, 2)).astype(np.float32)
    for c in range(2):
        off = c * block_len + (block_len - len(pkt)) // 2
        iq[c, off:off + len(pkt)] += pkt

    plan = make_gateway(CFG, mesh, 2, block_len, max_packets=4)
    packets = gateway_receive(plan, iq, CFG)
    assert _decode_all(packets) == [[PAYLOAD], [PAYLOAD]]
