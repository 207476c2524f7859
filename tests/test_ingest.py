"""Threaded ring-buffer ingest == batch demodulation (VERDICT r1 #4).

A capture streamed through producer-thread -> native SPSC ring -> pipelined
StreamingDemodulator must reproduce batch-mode packets exactly, including
with a slow (real-time-paced) producer exercising ring backpressure both
ways.
"""

import io
import time

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.modulator import modulate

CFG = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=False,
                 payload_len=4, p=2, fft_factor=2)


def _native_or_skip():
    from gr_lora_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")


def _capture(num_pkts=5, seed=0):
    rng = np.random.default_rng(seed)
    n = CFG.num_samples
    chunks = []
    for i in range(num_pkts):
        pkt = modulate(encode(bytes([i + 1, 2, 3, 4]), CFG), CFG,
                       pad_front=0, pad_back=0)
        chunks.append(0.3 * pkt)
        gap = int(rng.integers(2, 9)) * n + int(rng.integers(0, n))
        chunks.append(np.zeros(gap, np.complex64))
    iq = np.concatenate(chunks).astype(np.complex64)
    return iq + 0.01 * (rng.standard_normal(len(iq))
                        + 1j * rng.standard_normal(len(iq))).astype(np.complex64)


def _batch_reference(iq):
    from gr_lora_tpu.models.demodulator import StreamingDemodulator

    sd = StreamingDemodulator(CFG)
    return [(p, s.tobytes()) for p, s in sd.feed(iq) + sd.flush()]


def test_ring_ingest_matches_batch():
    _native_or_skip()
    from gr_lora_tpu.pipeline.ingest import stream_demodulate

    iq = _capture()
    got = stream_demodulate(CFG, io.BytesIO(iq.tobytes()))
    got = [(p, s.tobytes()) for p, s in got]
    assert got == _batch_reference(iq)


class _PacedReader:
    """Emits the capture in small chunks with delays: a real-time source."""

    def __init__(self, data: bytes, chunk: int, delay: float):
        self._data = data
        self._off = 0
        self._chunk = chunk
        self._delay = delay

    def read(self, n: int) -> bytes:
        if self._off >= len(self._data):
            return b""
        time.sleep(self._delay)
        take = min(self._chunk, n, len(self._data) - self._off)
        out = self._data[self._off:self._off + take]
        self._off += take
        return out


def test_ring_ingest_slow_producer():
    _native_or_skip()
    from gr_lora_tpu.pipeline.ingest import stream_demodulate

    iq = _capture(num_pkts=3, seed=1)
    src = _PacedReader(iq.tobytes(), chunk=4096 * 8, delay=2e-3)
    got = [(p, s.tobytes()) for p, s in stream_demodulate(CFG, src)]
    assert got == _batch_reference(iq)


def test_ring_ingest_partial_trailing_sample():
    _native_or_skip()
    from gr_lora_tpu.pipeline.ingest import RingIngest

    iq = _capture(num_pkts=1, seed=2)
    raw = iq.tobytes() + b"\x01\x02\x03"      # torn trailing sample
    ing = RingIngest(io.BytesIO(raw), block_samples=4096)
    total = sum(b.shape[0] for b in ing.blocks())
    assert total % 4096 == 0                  # zero-padded final block
    assert ing.trailing_bytes == 3


def test_pipelined_streaming_demod_equals_unpipelined():
    from gr_lora_tpu.models.demodulator import StreamingDemodulator

    iq = _capture(num_pkts=4, seed=3)
    a = StreamingDemodulator(CFG, pipelined=False)
    b = StreamingDemodulator(CFG, pipelined=True)
    ra = [(p, s.tobytes()) for p, s in a.feed(iq) + a.flush()]
    rb = []
    step = 10000
    for i in range(0, len(iq), step):
        rb += b.feed(iq[i:i + step])
    rb += b.flush()
    rb = [(p, s.tobytes()) for p, s in rb]
    assert ra == rb


def test_udp_iq_source_live_feed():
    """Live UDP datagrams -> UdpIqSource -> ring ingest == batch decode
    (the rx_usrp.grc live-source analog)."""
    _native_or_skip()
    import socket
    import threading

    from gr_lora_tpu.apps.rx_stream import UdpIqSource
    from gr_lora_tpu.pipeline.ingest import stream_demodulate

    iq = _capture(num_pkts=2, seed=4)
    raw = iq.tobytes()
    src = UdpIqSource(0, idle_timeout=1.0)
    port = src._sock.getsockname()[1]

    def sender():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(0, len(raw), 8192):
            s.sendto(raw[i:i + 8192], ("127.0.0.1", port))
            time.sleep(0.0005)
        s.close()

    t = threading.Thread(target=sender)
    t.start()
    got = [(p, s.tobytes()) for p, s in stream_demodulate(CFG, src)]
    t.join()
    src.close()
    assert got == _batch_reference(iq)
