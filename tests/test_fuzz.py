"""Hardening: property-based codec round-trips and garbage-input fuzzing.

The reference silently drops malformed packets (decode_impl.cc:358,378
"TODO report broken packet"); our decoders must likewise never crash on
arbitrary symbol vectors or IQ garbage.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import decode, encode


@settings(max_examples=60, deadline=None)
@given(
    sf=st.integers(6, 12),
    cr=st.integers(1, 4),
    crc=st.booleans(),
    ldr=st.booleans(),
    hdr=st.booleans(),
    payload=st.binary(min_size=1, max_size=48),
)
def test_codec_roundtrip_property(sf, cr, crc, ldr, hdr, payload):
    if sf == 6 and hdr:
        return
    cfg = LoraConfig(sf=sf, cr=cr, crc=crc, ldr=ldr, explicit_header=hdr,
                     payload_len=len(payload))
    res = decode(encode(payload, cfg), cfg)
    assert res.ok
    off = 3 if hdr else 0
    assert bytes(res.payload[off:off + len(payload)]) == payload
    if crc:
        assert res.crc_ok


@settings(max_examples=40, deadline=None)
@given(
    sf=st.integers(6, 12),
    hdr=st.booleans(),
    data=st.lists(st.integers(0, (1 << 12) - 1), min_size=0, max_size=64),
)
def test_decode_never_crashes_on_garbage(sf, hdr, data):
    if sf == 6 and hdr:
        return
    cfg = LoraConfig(sf=sf, cr=1, crc=True, ldr=False, explicit_header=hdr,
                     payload_len=4)
    syms = np.asarray(data, dtype=np.uint16)
    res = decode(syms, cfg)             # must return, not raise
    assert res.ok in (True, False)


def test_native_decode_never_crashes_on_garbage():
    from gr_lora_tpu import native
    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(0)
    for hdr in (False, True):
        cfg = LoraConfig(sf=8, cr=1, crc=True, explicit_header=hdr,
                         payload_len=4)
        for ln in (0, 1, 7, 8, 13, 60):
            syms = rng.integers(0, 4096, ln).astype(np.uint16)
            native.decode(syms, cfg)    # must not crash


def test_pyramid_tracker_random_peaks():
    """Random peak storms must not crash or blow up either tracker."""
    from gr_lora_tpu import native
    from gr_lora_tpu.models.pyramid import PyramidTracker

    cfg = LoraConfig(sf=8, cr=1, crc=True, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0)
    rng = np.random.default_rng(1)
    trackers = [PyramidTracker(cfg)]
    if native.available():
        trackers.append(native.PyramidTracker(cfg))
    for tr in trackers:
        for _ in range(400):
            npk = int(rng.integers(0, 6))
            bins = np.sort(rng.integers(0, cfg.bin_size, npk)).astype(np.int32)
            h = rng.uniform(5, 200, npk).astype(np.float32)
            hs = rng.uniform(5, 200, npk).astype(np.float32)
            tr.step(bins, h, hs)
        for _ in range(tr.flush_hops()):
            tr.step()
