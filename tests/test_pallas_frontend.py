"""Pallas fused front-end vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri
from gr_lora_tpu.ops.dechirp import pyramid_spectra
from gr_lora_tpu.ops.pallas_frontend import make_pallas_spectra, pad_chunks

CFG = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=4, p=2, fft_factor=2, threshold=5.0)


def _signal():
    rng = np.random.default_rng(0)
    iq = to_ri(modulate(encode(bytes([1, 2, 3, 4]), CFG), CFG))
    return iq + rng.normal(0, 0.01, iq.shape).astype(np.float32)


def test_pallas_matches_xla_spectra():
    iq = _signal()
    n = CFG.num_samples
    hop = n // 8
    num = (iq.shape[0] - n) // hop + 1

    # XLA reference path.
    idx = np.arange(num)[:, None] * hop + np.arange(n)[None, :]
    frames = jnp.asarray(iq)[idx]
    fa, faw, hs = (np.asarray(x) for x in pyramid_spectra(frames, CFG))

    fn = make_pallas_spectra(CFG, num, frame_tile=64, interpret=True)
    chunks = pad_chunks(iq, CFG, num, frame_tile=64)
    pfa, pfaw, phs = (np.asarray(jax.device_get(x))
                      for x in fn(jnp.asarray(chunks)))

    scale = np.abs(fa).max()
    for a, b in ((fa, pfa[:num]), (faw, pfaw[:num]), (hs, phs[:num])):
        assert np.max(np.abs(a - b)) < 5e-3 * scale, np.max(np.abs(a - b))  # bf16 operands


def test_pallas_padding_region_is_consistent():
    """Frames in the padded tail (zero input) give zero spectra."""
    iq = _signal()
    n = CFG.num_samples
    hop = n // 8
    num = (iq.shape[0] - n) // hop + 1
    fn = make_pallas_spectra(CFG, num, frame_tile=64, interpret=True)
    chunks = pad_chunks(iq, CFG, num, frame_tile=64)
    fa, _, _ = (np.asarray(jax.device_get(x)) for x in fn(jnp.asarray(chunks)))
    if fa.shape[0] > num + 8:
        assert np.all(fa[num + 8:] < 1e-3)


def test_pyramid_demodulate_pallas_backend():
    """The full collision pipeline through the Pallas lattice backend."""
    from gr_lora_tpu.core.codec import decode
    from gr_lora_tpu.models.pyramid import pyramid_demodulate

    cfg = CFG
    iq = np.concatenate([
        np.zeros((1000, 2), np.float32),
        0.2 * to_ri(modulate(encode(bytes([1, 2, 3, 4]), cfg), cfg,
                             pad_front=0, pad_back=0)),
        np.zeros((4 * cfg.num_samples, 2), np.float32),
    ]).astype(np.float32)
    xla = pyramid_demodulate(iq, cfg, backend="xla")
    pls = pyramid_demodulate(iq, cfg, backend="pallas")
    assert len(xla) == len(pls) == 1
    # bf16 operands may flip a marginal trailing noise peak, so allow the
    # symbol vectors to differ by at most one trailing entry.
    a, b = xla[0], pls[0]
    m = min(len(a), len(b))
    assert abs(len(a) - len(b)) <= 1
    # ... and the last assembled window may resolve differently.
    assert np.array_equal(a[:m - 1], b[:m - 1]), (list(a), list(b))
