"""Channel impairments: carrier frequency offset, phase, amplitude, and the
non-default peak-search algorithms end-to-end."""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig, PeakSearch
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.demodulator import demodulate
from gr_lora_tpu.models.modulator import modulate

BASE = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                  payload_len=6, p=2, fft_factor=8)
PAYLOAD = bytes([1, 2, 3, 4, 5, 6])
PDU = "0630f0010203040506050801"
BW = 125e3


def _channel(iq, cfo_hz=0.0, phase=0.0, amp=1.0, fs=2 * BW):
    t = np.arange(len(iq)) / fs
    rot = np.exp(2j * np.pi * cfo_hz * t + 1j * phase).astype(np.complex64)
    return (amp * iq * rot).astype(np.complex64)


def _decode_ok(iq, cfg=BASE):
    pkts = demodulate(iq, cfg)
    return any(decode(s, cfg).ok
               and bytes(decode(s, cfg).payload).hex() == PDU for s in pkts)


@pytest.mark.parametrize("cfo_hz", [0.0, 150.0, -300.0, 900.0, -1800.0])
def test_cfo_tolerance(cfo_hz):
    """The demod's CFO estimate (up-peak before the SFD, demod_impl.cc:486)
    absorbs offsets well beyond one bin (488 Hz at SF8/BW125)."""
    iq = _channel(modulate(encode(PAYLOAD, BASE), BASE), cfo_hz=cfo_hz)
    assert _decode_ok(iq), f"failed at CFO {cfo_hz} Hz"


def test_phase_and_amplitude_invariance():
    iq = _channel(modulate(encode(PAYLOAD, BASE), BASE),
                  phase=1.234, amp=0.01)
    assert _decode_ok(iq)


@pytest.mark.parametrize("alg", [PeakSearch.PHASE, PeakSearch.B])
def test_peak_search_algorithms_end_to_end(alg):
    """PHASE and B peak search (demod_impl.cc:162-213) decode the golden
    packet through the full FSM, not just the op-level test."""
    cfg = BASE.replace(peak_search=alg)
    iq = _channel(modulate(encode(PAYLOAD, cfg), cfg), cfo_hz=100.0)
    assert _decode_ok(iq, cfg)


def test_cfo_with_noise():
    rng = np.random.default_rng(4)
    iq = _channel(modulate(encode(PAYLOAD, BASE), BASE), cfo_hz=400.0)
    iq = iq + (rng.standard_normal(len(iq))
               + 1j * rng.standard_normal(len(iq))).astype(np.complex64) * 0.18
    assert _decode_ok(iq)


@pytest.mark.parametrize("ppm", [0, 60, -60])
def test_sample_clock_offset_ldr(ppm):
    """Sample-clock offset between TX and RX: the LDR drift-compensation
    integrator (demod_impl.cc:263-284) absorbs the per-symbol bin creep."""
    import jax

    from gr_lora_tpu.pipeline.frontend import polyphase_resample

    cfg = LoraConfig(sf=10, cr=1, crc=True, ldr=True, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8)
    payload = bytes(range(8))
    iq = modulate(encode(payload, cfg), cfg)
    iq_ri = np.stack([iq.real, iq.imag], -1).astype(np.float32)
    skewed = np.asarray(jax.device_get(
        polyphase_resample(iq_ri, 1.0 + ppm * 1e-6)))
    pkts = demodulate(skewed, cfg)
    ok = [bytes(decode(s, cfg).payload) for s in pkts if decode(s, cfg).ok]
    assert ok and ok[0][3:11] == payload, (ppm, ok)
