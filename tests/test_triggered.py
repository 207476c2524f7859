"""Detection-gated receiver: dense scan + targeted demod."""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.dist.triggered import TriggeredReceiver, make_preamble_scan
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

BASE = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                  payload_len=4, p=2, fft_factor=4)


def _pkt(sf, payload):
    cfg = BASE.replace(sf=sf)
    return to_ri(modulate(encode(payload, cfg), cfg, pad_front=0, pad_back=0))


def test_scan_finds_preamble_position():
    cfg = BASE
    n = cfg.num_samples
    pkt = _pkt(7, bytes([1, 2, 3, 4]))
    rng = np.random.default_rng(0)
    iq = rng.normal(0, 0.01, (1, 60 * n, 2)).astype(np.float32)
    start = 17 * n + 100
    iq[0, start:start + len(pkt)] += pkt
    scan = make_preamble_scan(cfg, 60, 4)
    import jax

    starts, valid, _ = (np.asarray(x) for x in jax.device_get(scan(iq)))
    hits = starts[0][valid[0]]
    assert len(hits) >= 1
    # Detection window start within the preamble.
    assert any(16 <= h <= 19 for h in hits), hits


def test_triggered_sparse_stream_multi_sf():
    """Long mostly-idle stream, three packets at two SFs on two channels —
    each found once, positions right."""
    rng = np.random.default_rng(1)
    n7 = BASE.num_samples
    t = 500 * n7
    iq = rng.normal(0, 0.01, (2, t, 2)).astype(np.float32)
    p7 = _pkt(7, bytes([1, 2, 3, 4]))
    p9 = _pkt(9, bytes([5, 6, 7, 8]))
    spots = [(0, 31 * n7 + 77, p7), (0, 300 * n7 + 13, p9),
             (1, 144 * n7 + 200, p7)]
    for ch, off, pkt in spots:
        iq[ch, off:off + len(pkt)] += pkt

    rx = TriggeredReceiver(BASE, sfs=(7, 9))
    pkts = rx(iq)
    found = {(p.channel, p.sf): p for p in pkts}
    assert set(found) == {(0, 7), (0, 9), (1, 7)}, sorted(found)
    assert bytes(found[(0, 7)].result.payload[3:7]) == bytes([1, 2, 3, 4])
    assert bytes(found[(0, 9)].result.payload[3:7]) == bytes([5, 6, 7, 8])
    # Each packet reported exactly once, near its true start.
    assert len(pkts) == 3
    for ch, off, _ in spots:
        assert any(p.channel == ch and abs(p.position - off) < 12 * n7
                   for p in pkts), (ch, off)


def test_triggered_idle_stream_silent():
    rng = np.random.default_rng(2)
    iq = rng.normal(0, 0.01, (2, 200 * BASE.num_samples, 2)).astype(np.float32)
    rx = TriggeredReceiver(BASE, sfs=(7, 8))
    assert rx(iq) == []
