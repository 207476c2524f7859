"""Streaming demodulator: carried FSM state across arbitrary chunk sizes."""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.demodulator import StreamingDemodulator
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

CFG = LoraConfig(sf=7, cr=2, crc=True, ldr=False, explicit_header=False,
                 payload_len=4, p=2, fft_factor=2)
PAYLOAD = bytes([0xCA, 0xFE, 0x12, 0x34])


def _stream(num_packets=3, gap_syms=40, seed=0):
    pkt = to_ri(modulate(encode(PAYLOAD, CFG), CFG, pad_front=0, pad_back=0))
    n = CFG.num_samples
    rng = np.random.default_rng(seed)
    chunks, positions = [], []
    t = 0
    for i in range(num_packets):
        gap = (gap_syms + int(rng.integers(0, 8))) * n + int(rng.integers(0, n))
        chunks.append(np.zeros((gap, 2), np.float32))
        t += gap
        positions.append(t)
        chunks.append(pkt)
        t += len(pkt)
    chunks.append(np.zeros((8 * n, 2), np.float32))
    return np.concatenate(chunks), positions


@pytest.mark.parametrize("chunk", [1536, 4096, 100_000])
def test_stream_chunksizes(chunk):
    """The same packets come out regardless of how the stream is chopped."""
    iq, positions = _stream()
    sd = StreamingDemodulator(CFG, block_len=8 * CFG.num_samples)
    got = []
    for i in range(0, len(iq), chunk):
        got += sd.feed(iq[i:i + chunk])
    got += sd.flush()
    assert len(got) == len(positions), (len(got), len(positions))
    for (pos, syms), true_pos in zip(got, positions):
        r = decode(syms, CFG)
        assert r.ok and bytes(r.payload[:4]) == PAYLOAD
        assert true_pos <= pos <= true_pos + 10 * CFG.num_samples


def test_stream_matches_batch():
    """Streaming output equals the whole-buffer demodulator's."""
    from gr_lora_tpu.models.demodulator import demodulate

    iq, _ = _stream(num_packets=2, seed=5)
    batch = demodulate(iq, CFG)
    sd = StreamingDemodulator(CFG, block_len=16 * CFG.num_samples)
    got = sd.feed(iq) + sd.flush()
    assert len(got) == len(batch)
    for (pos, syms), bsyms in zip(got, batch):
        assert np.array_equal(syms, bsyms)


def test_stream_packet_across_block_boundary():
    """A packet spanning many tiny blocks is still decoded once."""
    pkt = to_ri(modulate(encode(PAYLOAD, CFG), CFG))
    sd = StreamingDemodulator(CFG, block_len=2 * CFG.num_samples)
    got = sd.feed(pkt) + sd.flush()
    assert len(got) == 1
    r = decode(got[0][1], CFG)
    assert r.ok and bytes(r.payload[:4]) == PAYLOAD


def test_stream_explicit_header_across_boundaries():
    """Explicit-header packets (in-jit header parse sets the packet length
    mid-packet) survive tiny streaming blocks."""
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8)
    payload = bytes([0x42, 0x43, 0x44])
    pkt = to_ri(modulate(encode(payload, cfg), cfg))
    sd = StreamingDemodulator(cfg, block_len=3 * cfg.num_samples)
    got = sd.feed(pkt) + sd.flush()
    assert len(got) == 1
    r = decode(got[0][1], cfg)
    assert r.ok and r.header.payload_len == 3
    assert bytes(r.payload[3:6]) == payload and r.crc_ok
