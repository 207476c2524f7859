"""Native C++ host library: codec bit-exactness vs the Python core across
the full operating grid, plus the SPSC ring buffer."""

import threading

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig, native
from gr_lora_tpu.core.codec import decode as py_decode
from gr_lora_tpu.core.codec import encode as py_encode
from gr_lora_tpu.core.constants import WHITENING_SEQUENCE
from gr_lora_tpu.core.crc import data_checksum

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_whitening_sequence_identical():
    assert np.array_equal(native.whitening_sequence(), WHITENING_SEQUENCE)


def test_data_checksum_matches():
    rng = np.random.default_rng(0)
    for ln in (0, 1, 2, 3, 8, 64, 255):
        data = bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        assert native.data_checksum(data) == data_checksum(
            np.frombuffer(data, np.uint8), ln)


def _grid():
    rng = np.random.default_rng(42)
    for sf in range(6, 13):
        for cr in (1, 4):
            for ldr in (False, True):
                for hdr in (False, True):
                    if hdr and sf == 6:
                        continue
                    for crc in (False, True):
                        plen = int(rng.integers(1, 24))
                        yield sf, cr, ldr, hdr, crc, plen


def test_codec_grid_bit_exact_with_python():
    rng = np.random.default_rng(7)
    for sf, cr, ldr, hdr, crc, plen in _grid():
        cfg = LoraConfig(sf=sf, cr=cr, crc=crc, ldr=ldr,
                         explicit_header=hdr, payload_len=plen)
        payload = bytes(rng.integers(0, 256, plen, dtype=np.uint8))
        se = native.encode(payload, cfg)
        sp = py_encode(payload, cfg)
        assert np.array_equal(se, sp), (sf, cr, ldr, hdr, crc, plen)

        nb, nhdr, nck, nok = native.decode(sp, cfg)
        r = py_decode(sp, cfg)
        assert nok == r.ok, (sf, cr, ldr, hdr, crc, plen)
        assert np.array_equal(nb, r.payload), (sf, cr, ldr, hdr, crc, plen)
        if crc:
            assert nck == r.crc_ok


def test_decode_rejects_corrupt_header():
    cfg = LoraConfig(sf=8, cr=1, crc=True, explicit_header=True)
    syms = native.encode(bytes([1, 2, 3]), cfg).copy()
    syms[0] = (syms[0] + 96) % 256          # clobber a header symbol
    _, hdr, _, ok = native.decode(syms, cfg)
    rpy = py_decode(syms, cfg)
    assert ok == rpy.ok                      # same accept/reject decision


def test_ring_buffer_basic():
    rb = native.RingBuffer(1 << 12)
    assert rb.capacity == 1 << 12
    data = np.arange(1000, dtype=np.uint8)
    assert rb.write(data) == 1000
    assert rb.readable == 1000
    assert np.array_equal(rb.peek(10), data[:10])
    assert np.array_equal(rb.read(1000), data)
    assert rb.readable == 0


def test_ring_buffer_wraparound_and_partial():
    rb = native.RingBuffer(256)             # rounds to power of two
    cap = rb.capacity
    a = np.full(cap - 10, 7, np.uint8)
    assert rb.write(a) == cap - 10
    assert rb.write(np.full(100, 9, np.uint8)) == 10   # partial write
    got = rb.read(cap)
    assert len(got) == cap
    assert np.all(got[:cap - 10] == 7) and np.all(got[cap - 10:] == 9)


def test_ring_buffer_threaded_stream():
    """1 MB pushed through a small ring from a producer thread arrives
    intact and in order."""
    rb = native.RingBuffer(1 << 10)
    total = 1 << 20
    src = np.random.default_rng(3).integers(0, 256, total).astype(np.uint8)

    def producer():
        sent = 0
        while sent < total:
            sent += rb.write(src[sent:sent + 4096])

    t = threading.Thread(target=producer)
    t.start()
    out = np.zeros(total, np.uint8)
    got = 0
    while got < total:
        chunk = rb.read(min(4096, total - got))
        out[got:got + len(chunk)] = chunk
        got += len(chunk)
    t.join()
    assert np.array_equal(out, src)
