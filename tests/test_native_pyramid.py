"""Native C++ pyramid tracker: behavior-identical to the Python tracker."""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig, native
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.models.pyramid import pyramid_demodulate
from gr_lora_tpu.ops.cplx import to_ri

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=8, p=2, fft_factor=8, threshold=5.0)


def _collision_iq(off2_extra, amp2=0.09):
    tx = lambda pl, a: (a * modulate(encode(pl, CFG), CFG, pad_front=0,
                                     pad_back=0)).astype(np.complex64)
    p1, p2 = tx(bytes([1, 2, 3, 4, 5, 6]), 0.2), tx(bytes([7] * 5), amp2)
    n = CFG.num_samples
    off = 1000 + 16 * n + 4 * n // 8 + off2_extra
    iq = np.zeros(off + len(p2) + 8 * n, np.complex64)
    iq[1000:1000 + len(p1)] += p1
    iq[off:off + len(p2)] += p2
    return iq


@pytest.mark.parametrize("off2_extra", [204, 17, 399])
def test_native_matches_python_tracker(off2_extra):
    """Same lattice, both trackers -> identical symbol vectors, including
    hard alignments where the weak packet is truncated or lost."""
    iq = _collision_iq(off2_extra)
    py = pyramid_demodulate(iq, CFG, use_native=False)
    nat = pyramid_demodulate(iq, CFG, use_native=True)
    assert len(py) == len(nat), (len(py), len(nat))
    for a, b in zip(py, nat):
        assert np.array_equal(a, b), (list(a), list(b))


def test_native_tracker_with_noise():
    rng = np.random.default_rng(11)
    iq = _collision_iq(204)
    iq = iq + (rng.standard_normal(len(iq))
               + 1j * rng.standard_normal(len(iq))).astype(np.complex64) * 0.004
    py = pyramid_demodulate(iq, CFG, use_native=False)
    nat = pyramid_demodulate(iq, CFG, use_native=True)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert np.array_equal(a, b)
