"""Repeat-run track splitting (PyramidTracker(split_repeats=True)).

Beyond-reference opt-in: m consecutive EQUAL symbols merge into one
(m*overlaps+1)-long track because the lattice's rotating bin frame wraps
exactly once per symbol; the reference classifier rejects such tracks as
BROKEN (pyramid_demod_impl.cc:332 — data tracks <= 2*overlaps) or, at
>= num_preamble-1 repeats, misreads them as a PREAMBLE (:316), and the
assembly walk then truncates the packet at the first empty window
(:680-767).  At SF7 ~17 % of random payloads contain an adjacent repeat.
split_repeats=True splits the merged track at exact one-symbol strides
(models/pyramid._split_repeat_track) and disambiguates repeat-runs from
preambles by packet phase.  split_repeats=False remains exact reference
behavior (tests/test_soak.py::test_repeated_symbol_is_a_pyramid_landmine
documents the landmine).
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.models.pyramid import pyramid_demodulate


def _cfg(sf):
    return LoraConfig(sf=sf, cr=1, crc=True, ldr=(1 << sf) / 125e3 > 16e-3,
                      explicit_header=True, payload_len=8, p=2,
                      fft_factor=8, threshold=5.0)


def _air(cfg, pay, seed=3, amp=0.2):
    n = cfg.num_samples
    tx = np.asarray(encode(pay, cfg))
    wave = amp * modulate(tx, cfg, pad_front=0, pad_back=0)
    rng = np.random.default_rng(seed)
    T = 8 * n + len(wave) + 30 * n
    iq = (0.003 * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
          ).astype(np.complex64)
    iq[8 * n:8 * n + len(wave)] += wave
    return iq, tx


def _decoded(out, cfg, pay):
    for s in out:
        r = decode(s, cfg)
        if r.ok and r.crc_ok and bytes(r.payload[3:3 + len(pay)]) == pay:
            return True
    return False


# (sf, payload, repeat runs in the encoding): double, triple, a
# num_preamble-1-length run that aliases as a preamble, and the golden
# collision payloads at the SFs where their encodings carry repeats.
_REPEAT_CASES = [
    (8, bytes([7, 0xA0, 8, 1, 2, 3, 4, 5])),    # ..., 2, 2, ...
    (7, bytes([1, 2, 3, 4, 5, 6])),             # 86,86 AND 1,1,1
    (10, bytes([1, 2, 3, 4, 5, 6])),            # 1,1,1
    (11, bytes([7] * 5)),                        # 1,1 tail
]


@pytest.mark.parametrize("sf,pay", _REPEAT_CASES)
def test_repeat_run_recovered_with_split(sf, pay):
    cfg = _cfg(sf)
    iq, tx = _air(cfg, pay)
    assert np.any(tx[1:] == tx[:-1]), "fixture must contain a repeat"
    ref = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=False)
    assert not _decoded(ref, cfg, pay), \
        "landmine no longer reproduces — retire this test pair"
    out = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=False,
                             split_repeats=True)
    assert _decoded(out, cfg, pay), [list(s) for s in out]


def test_preamble_length_run_disambiguated():
    """A 5-repeat run (ln >= ov*(num_preamble-1)+2) classifies as a
    PREAMBLE under reference rules; with split_repeats the packet-phase
    check consumes it as data instead."""
    cfg = _cfg(12)
    pay = bytes([1, 2, 3, 4, 5, 6])             # tx tail: 1,1,1,1,1
    iq, tx = _air(cfg, pay)
    runs = int(np.sum(tx[1:] == tx[:-1]))
    assert runs >= 4, list(tx)
    out = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=False,
                             split_repeats=True)
    assert _decoded(out, cfg, pay), [list(s) for s in out]


def test_no_repeat_payload_bit_identical():
    """split_repeats must not perturb repeat-free packets: identical
    symbol vectors with and without the flag."""
    cfg = _cfg(9)
    iq, tx = _air(cfg, bytes([0xDE, 0xAD, 0xBE, 0xEF]))
    assert not np.any(tx[1:] == tx[:-1])
    ref = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=False)
    out = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=False,
                             split_repeats=True)
    assert len(ref) == len(out) == 1
    assert np.array_equal(ref[0], out[0])


def test_golden_collision_unaffected():
    """The README two-packet collision still yields both PDUs byte-exact
    with split_repeats on (real preambles keep spawning packets)."""
    cfg = _cfg(8)
    n = cfg.num_samples
    p1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                        pad_front=0, pad_back=0)
    p2 = 0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                         pad_front=0, pad_back=0)
    off2 = 1000 + 16 * n + 4 * n // 8 + 204
    iq = np.zeros(off2 + len(p2) + 30 * n, np.complex64)
    iq[1000:1000 + len(p1)] += p1
    iq[off2:off2 + len(p2)] += p2
    out = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=False,
                             split_repeats=True)
    pdus = sorted(bytes(decode(s, cfg).payload).hex() for s in out
                  if decode(s, cfg).ok)
    assert pdus == ["0530000707070707e76b01",
                    "0630f0010203040506050801"], pdus


def test_gateway_split_repeats():
    """TriggeredPyramidGateway(split_repeats=True): a repeat-carrying
    payload that the reference-exact gateway truncates decodes byte-exact
    when the split is on (both native and Python tracker banks)."""
    from gr_lora_tpu.dist.collision_gateway import TriggeredPyramidGateway
    from gr_lora_tpu.ops.cplx import to_ri

    cfg = _cfg(8)
    pay = bytes([7, 0xA0, 8, 1, 2, 3, 4, 5])
    iq, _ = _air(cfg, pay)

    def run(split, use_native, tracker="host"):
        gw = TriggeredPyramidGateway(
            cfg, 1, sfs=(8,), max_payload_len=8, use_native=use_native,
            scan_chunk_samples=1 << 15, split_repeats=split,
            tracker=tracker)
        pkts = gw.feed(to_ri(iq[None])) + gw.flush()
        return {bytes(p.result.payload[3:11]) for p in pkts
                if p.result is not None and p.result.ok and p.result.crc_ok}

    assert pay not in run(False, False)
    assert pay in run(True, False)
    assert pay in run(True, False, tracker="device")
    from gr_lora_tpu import native
    if native.available():
        assert pay in run(True, True)


@pytest.mark.parametrize("sf,pay", _REPEAT_CASES)
def test_device_split_twin(sf, pay):
    """The on-device lax.scan tracker's split (models/device_tracker:
    split_extract + pkt_step_split) must reproduce the host tracker's
    packets exactly on the repeat fixtures."""
    import jax

    from gr_lora_tpu.models.device_tracker import DevicePyramidTracker
    from gr_lora_tpu.models.pyramid import (PyramidTracker,
                                            make_peak_lattice,
                                            num_hops_for)
    from gr_lora_tpu.ops.cplx import to_ri

    cfg = _cfg(sf)
    iq, _ = _air(cfg, pay)
    iq_ri = np.ascontiguousarray(to_ri(iq), np.float32)
    nh = num_hops_for(cfg, iq_ri.shape[0])
    lat = tuple(np.asarray(x) for x in
                jax.device_get(make_peak_lattice(cfg, nh, 8)(iq_ri)))
    bins, h, hs, valid = lat

    host = PyramidTracker(cfg, split_repeats=True)
    for t in range(nh):
        v = valid[t]
        if v.any():
            o = np.argsort(bins[t][v], kind="stable")
            host.step(bins[t][v][o], h[t][v][o], hs[t][v][o])
        else:
            host.step()
    for _ in range(host.flush_hops()):
        host.step()

    dev = DevicePyramidTracker(cfg, max_peaks=8, split_repeats=True)
    dev.feed(*lat)
    dev.feed_empty(dev.flush_hops())
    syms, pos = dev.drain()
    assert dev.deviations() == 0, dev.stats()
    assert len(syms) == len(host.symbols_out), (
        [list(s) for s in syms], [list(s) for s in host.symbols_out])
    for a, b, pa, pb in zip(host.symbols_out, syms,
                            host.positions_out, pos):
        assert np.array_equal(a, b), (list(a), list(b))
        assert pa == pb
    assert _decoded(syms, cfg, pay)


@pytest.mark.parametrize("sf,pay", _REPEAT_CASES)
def test_native_split_twin(sf, pay):
    """The C++ tracker's split (native/src/pyramid_tracker.cc
    split_repeat_track) must reproduce the Python tracker's packets
    exactly on the repeat fixtures."""
    from gr_lora_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    cfg = _cfg(sf)
    iq, _ = _air(cfg, pay)
    py = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=False,
                            split_repeats=True)
    cc = pyramid_demodulate(iq, cfg, max_peaks=8, use_native=True,
                            split_repeats=True)
    assert len(py) == len(cc)
    for a, b in zip(py, cc):
        assert np.array_equal(a, b), (list(a), list(b))
    assert _decoded(cc, cfg, pay)
