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
        assert np.max(np.abs(a - b)) < 1e-3 * scale, np.max(np.abs(a - b))


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
