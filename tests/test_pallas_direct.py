"""Grid-pipelined direct front-end (ops/pallas_direct) vs the XLA path.

Interpret mode on CPU; the real-TPU numbers live in docs/BENCH.md
(tools/frontend_probe.py measures both paths side by side).
"""

import numpy as np

import jax
import jax.numpy as jnp

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri
from gr_lora_tpu.ops.dechirp import pyramid_spectra
from gr_lora_tpu.ops.pallas_direct import make_direct_spectra

CFG = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=4, p=2, fft_factor=2, threshold=5.0)


def _signal(cfg=CFG):
    rng = np.random.default_rng(0)
    iq = to_ri(modulate(encode(bytes([1, 2, 3, 4]), cfg), cfg))
    return iq + rng.normal(0, 0.01, iq.shape).astype(np.float32)


def _xla_spectra(iq, cfg, num):
    n = cfg.num_samples
    hop = n // 8
    idx = np.arange(num)[:, None] * hop + np.arange(n)[None, :]
    frames = jnp.asarray(iq)[idx]
    return tuple(np.asarray(x) for x in pyramid_spectra(frames, cfg))


def test_direct_matches_xla_spectra():
    iq = _signal()
    n = CFG.num_samples
    hop = n // 8
    num = (iq.shape[0] - n) // hop + 1
    fa, faw, hs = _xla_spectra(iq, CFG, num)

    fn = make_direct_spectra(CFG, num, frame_tile=64, interpret=True)
    pfa, pfaw, phs = (np.asarray(jax.device_get(x))
                      for x in fn(jnp.asarray(iq)))

    scale = np.abs(fa).max()
    for a, b in ((fa, pfa), (faw, pfaw), (hs, phs)):
        assert a.shape == b.shape
        assert np.max(np.abs(a - b)) < 5e-3 * scale, np.max(np.abs(a - b))


def test_direct_k_tiling_and_ragged_frames():
    """num_frames not a multiple of frame_tile + k split across tiles."""
    cfg = CFG.replace(fft_factor=4)          # K = 512 -> two 256-bin tiles
    iq = _signal(cfg)
    n = cfg.num_samples
    hop = n // 8
    num = (iq.shape[0] - n) // hop + 1
    num = num - 7                            # force a ragged final tile
    fa, faw, hs = _xla_spectra(iq, cfg, num)

    fn = make_direct_spectra(cfg, num, frame_tile=64, k_tile=256,
                             interpret=True)
    pfa, pfaw, phs = (np.asarray(jax.device_get(x))
                      for x in fn(jnp.asarray(iq)))

    scale = np.abs(fa).max()
    for a, b in ((fa, pfa), (faw, pfaw), (hs, phs)):
        assert a.shape == b.shape
        assert np.max(np.abs(a - b)) < 5e-3 * scale, np.max(np.abs(a - b))


def test_direct_lattice_backend_under_vmap():
    """peak_lattice_fn(backend='direct') inside vmap (the gateway's event
    batching) matches the xla lattice at bf16 on peak bins."""
    from gr_lora_tpu.models.pyramid import peak_lattice_fn

    cfg = CFG.replace(precision="bf16", threshold=5.0)
    iq = _signal(cfg)
    n = cfg.num_samples
    hop = n // 8
    nh = (iq.shape[0] - n) // hop
    batch = np.stack([iq, np.roll(iq, 3 * hop, axis=0)])

    import jax

    ref = jax.jit(jax.vmap(peak_lattice_fn(cfg, nh, 8, "xla")))
    got = jax.jit(jax.vmap(peak_lattice_fn(cfg, nh, 8, "direct")))
    rb, rh, rhs, rv = (np.asarray(x) for x in ref(jnp.asarray(batch)))
    gb, gh, ghs, gv = (np.asarray(x) for x in got(jnp.asarray(batch)))
    # bf16 rounding can flip marginal threshold peaks; the overwhelming
    # majority of (bin, valid) decisions must agree.
    agree = (rv == gv) & ((rb == gb) | ~rv)
    assert agree.mean() > 0.98, agree.mean()


def test_direct_short_input_is_padded():
    """iq shorter than the padded frame span zero-fills, no wrap."""
    iq = _signal()
    n = CFG.num_samples
    hop = n // 8
    num = (iq.shape[0] - n) // hop + 1 + 32  # frames past the capture end
    fn = make_direct_spectra(CFG, num, frame_tile=64, interpret=True)
    fa, _, _ = (np.asarray(jax.device_get(x)) for x in fn(jnp.asarray(iq)))
    assert fa.shape[0] == num
    assert np.all(fa[-8:] < 1e-3)            # pure-pad frames -> ~zero
