"""quantize='floor'|'round': the bit-true reference bin->symbol rule vs
the shipped rounded quantization (VERDICT r4 item 4).

The reference assembles symbols with FLOOR division
(pyramid_demod_impl.cc:744: ``pmod(bin - pre_bin - bin_shift, bin_size) /
fft_factor``); the product default rounds instead (deliberate deviation,
models/pyramid.py _assemble — absorbs the hop-grid apex quantization
error).  These tests (a) pin floor mode to the reference formula, (b) pin
a deterministic collision phase where floor flips a strong-packet symbol
and round does not (the measured 54->66/66 lift, docs/BENCH.md), and
(c) hold all three tracker tiers bit-identical in floor mode.
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig, native
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.models.pyramid import (
    PyramidTracker,
    _Packet,
    _Peak,
    pyramid_demodulate,
)

CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=8, p=2, fft_factor=8, threshold=5.0)
_N = CFG.num_samples


def _assemble_syms(quantize, bin_err):
    """Feed a fabricated packet straight into _assemble: preamble pseudo-
    peak at ts=0, eight data peaks at exact window centers ts=5n+i*n with
    bins sym*ff + bin_err."""
    tr = PyramidTracker(CFG, quantize=quantize)
    ff = CFG.fft_factor
    tx = [3, 0, 17, 255, 128, 1, 200, 77]
    peaks = [_Peak(0, 0, 1.0, 1.0)]
    for i, s in enumerate(tx):
        peaks.append(_Peak(5 * _N + i * _N, (s * ff + bin_err) % CFG.bin_size,
                           1.0, 1.0))
    tr._assemble(_Packet(peaks=peaks, ttl=0))
    assert len(tr.symbols_out) == 1
    return tx, list(tr.symbols_out[0])


def test_floor_is_the_reference_rule():
    """floor mode == pyramid_demod_impl.cc:744 exactly: a -1 sub-bin error
    flips every symbol down by one; round absorbs it."""
    k, ff = CFG.bin_size, CFG.fft_factor
    tx, floor = _assemble_syms("floor", bin_err=-1)
    assert floor == [((s * ff - 1) % k) // ff for s in tx]  # :744 verbatim
    assert floor == [(s - 1) % (k // ff) for s in tx]
    _, rnd = _assemble_syms("round", bin_err=-1)
    assert rnd == tx


def test_floor_exact_bins_identical():
    """With exact on-grid bins the two modes agree (the deviation only
    fires on sub-bin error)."""
    tx_f, floor = _assemble_syms("floor", bin_err=0)
    tx_r, rnd = _assemble_syms("round", bin_err=0)
    assert floor == tx_f and rnd == tx_r


def _collision_iq(off2_extra):
    p1 = (0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), CFG), CFG,
                         pad_front=0, pad_back=0)).astype(np.complex64)
    p2 = (0.09 * modulate(encode(bytes([7] * 5), CFG), CFG,
                          pad_front=0, pad_back=0)).astype(np.complex64)
    o = 1000 + 16 * _N + off2_extra
    iq = np.zeros(o + len(p2) + 12 * _N, np.complex64)
    iq[1000:1000 + len(p1)] += p1
    iq[o:o + len(p2)] += p2
    return iq


def _recovered(syms):
    out = set()
    for r in (decode(s, CFG) for s in syms):
        if r.ok and r.crc_ok:
            out.add(bytes(r.payload[3:3 + int(r.payload[0])]))
    return out


def test_round_vs_floor_on_offgrid_collision():
    """Deterministic sub-symbol phase (+45 samples) where the reference
    floor rule flips a strong-packet symbol (packet lost) and rounding
    recovers it — the quantization landmine the deviation kills."""
    iq = _collision_iq(45)
    strong = bytes([1, 2, 3, 4, 5, 6])
    got_r = _recovered(pyramid_demodulate(iq, CFG, use_native=False,
                                          quantize="round"))
    got_f = _recovered(pyramid_demodulate(iq, CFG, use_native=False,
                                          quantize="floor"))
    assert strong in got_r
    assert strong not in got_f


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("off2_extra", [45, 204])
def test_native_floor_matches_python_floor(off2_extra):
    iq = _collision_iq(off2_extra)
    py = pyramid_demodulate(iq, CFG, use_native=False, quantize="floor")
    nat = pyramid_demodulate(iq, CFG, use_native=True, quantize="floor")
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert np.array_equal(a, b), (list(a), list(b))


def test_device_floor_matches_host_floor():
    import jax

    from gr_lora_tpu.models.device_tracker import DevicePyramidTracker
    from gr_lora_tpu.models.pyramid import make_peak_lattice, num_hops_for
    from gr_lora_tpu.ops.cplx import to_ri

    iq = np.ascontiguousarray(to_ri(_collision_iq(45)), np.float32)
    nh = num_hops_for(CFG, iq.shape[0])
    lat = tuple(np.asarray(x) for x in
                jax.device_get(make_peak_lattice(CFG, nh, 8)(iq)))
    bins, h, hs, valid = lat

    host = PyramidTracker(CFG, quantize="floor")
    for t in range(nh):
        v = valid[t]
        if v.any():
            order = np.argsort(bins[t][v], kind="stable")
            host.step(bins[t][v][order], h[t][v][order], hs[t][v][order])
        else:
            host.step()
    for _ in range(host.flush_hops()):
        host.step()

    dev = DevicePyramidTracker(CFG, max_peaks=8, quantize="floor")
    dev.feed(bins, h, hs, valid)
    dev.feed_empty(dev.flush_hops())
    dsyms, _ = dev.drain()
    assert dev.deviations() == 0, dev.stats()

    assert len(host.symbols_out) == len(dsyms)
    for a, b in zip(host.symbols_out, dsyms):
        assert np.array_equal(a, b), (list(a), list(b))
