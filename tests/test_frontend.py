"""Front-end pipeline: filter design, resampler fidelity, capture replay."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.pipeline.frontend import (
    design_low_pass,
    fir_filter,
    polyphase_resample,
    replay,
    upsample_to_capture_rate,
)

CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=8, p=2, fft_factor=8, threshold=5.0)
PAYLOAD = bytes([1, 2, 3, 4, 5, 6])
PDU = "0630f0010203040506050801"
FS = 1e6
BW = 125e3


def test_low_pass_response():
    fs = 1e6
    taps = design_low_pass(1.0, fs, 75e3, 10e3)
    w = np.fft.rfftfreq(8192, 1 / fs)
    h = np.abs(np.fft.rfft(taps, 8192))
    assert abs(h[0] - 1.0) < 1e-3                        # unity DC gain
    assert h[w < 60e3].min() > 0.98                      # passband flat
    assert h[w > 120e3].max() < 0.01                     # stopband down


def test_resampler_tone_fidelity():
    """A complex tone survives 4x downsampling with correct frequency."""
    fs, f0, rrate = 1e6, 31e3, 0.25
    t = np.arange(65536) / fs
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    xr = np.stack([x.real, x.imag], -1).astype(np.float32)
    y = np.asarray(jax.device_get(polyphase_resample(jnp.asarray(xr), rrate)))
    yc = y[..., 0] + 1j * y[..., 1]
    yc = yc[200:-200]                                    # trim edges
    spec = np.abs(np.fft.fft(yc * np.hanning(len(yc))))
    fpk = np.fft.fftfreq(len(yc), 1 / (fs * rrate))[np.argmax(spec)]
    assert abs(fpk - f0) < 50.0, fpk
    # amplitude preserved within a few percent
    assert abs(np.abs(yc).mean() - 1.0) < 0.05


def test_replay_single_packet_capture():
    """Fabricated 1 Msps capture -> LPF -> resample -> demod -> golden PDU
    (the rx_file.grc scenario end-to-end)."""
    iq1 = modulate(encode(PAYLOAD, CFG), CFG, p=1)      # 1 samp/chip = bw rate
    cap = upsample_to_capture_rate(iq1, 1, FS, CFG, BW)  # 8x to 1 Msps
    cap = (0.3 * cap).astype(np.complex64)
    results = replay(cap, FS, CFG, BW, mode="plain")
    pdus = [bytes(r.payload).hex() for _, r in results if r.ok]
    assert PDU in pdus, [(len(s), r.ok) for s, r in results]


def test_replay_collision_capture_pyramid():
    """Fabricated collision capture through the pyramid replay path.

    The LPF + polyphase chain adds sub-bin peak wobble, so (as with the
    reference on real captures) individual symbols can flip by +-1; we
    require both packets recovered with near-perfect symbol accuracy and at
    least one byte-exact golden PDU.
    """
    syms_a = encode(PAYLOAD, CFG)
    syms_b = encode(bytes([7] * 5), CFG)
    iq_a = modulate(syms_a, CFG, p=1)
    iq_b = modulate(syms_b, CFG, p=1)
    n1 = 1 << CFG.sf
    off = 19 * n1 + (5 * 37) % n1
    total = off + len(iq_b) + 8 * n1
    mix = np.zeros(total, np.complex64)
    mix[: len(iq_a)] += 0.25 * iq_a
    mix[off: off + len(iq_b)] += 0.12 * iq_b
    cap = upsample_to_capture_rate(mix, 1, FS, CFG, BW)
    results = replay(cap, FS, CFG, BW, mode="pyramid")
    assert len(results) == 2, f"expected 2 packets, got {len(results)}"

    def accuracy(got, want):
        m = min(len(got), len(want))
        return np.mean(np.asarray(got[:m]) == np.asarray(want[:m]))

    accs = sorted(max(accuracy(s, syms_a), accuracy(s, syms_b))
                  for s, _ in results)
    assert all(a >= 16 / 18 for a in accs), accs
    pdus = {bytes(r.payload).hex() for _, r in results if r.ok}
    assert "053000" + "07" * 5 + "e76b01" in pdus, pdus
