"""Debug taps and profiling — the reference's DUMP_IQ/DEBUG levels, redone.

The reference compiles dumps in with ``#define DUMP_IQ 1`` and writes raw
streams to fixed filenames from inside each block (demod_impl.cc:33,337-355,
pyramid_demod_impl.cc:34,574-591, mod_impl.cc:28,136-138).  Here the
per-stage tensors are ordinary jit outputs: ``rx_taps`` computes them in one
batched pass and ``dump_rx_taps`` writes .npy files; ``profile`` wraps
``jax.profiler.trace`` for TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import PYRAMID_OVERLAP_FACTOR, LoraConfig
from .ops.chirp import chirp_tables
from .ops.cplx import cmag, cmul, to_ri
from .ops.dechirp import frame_signal, pyramid_spectra, up_bands


def rx_taps(iq, cfg: LoraConfig, hop: int | None = None) -> dict:
    """Per-stage RX tensors for a capture: raw frames, dechirped frames,
    folded up-chirp spectra, and the pyramid spectra triple.

    Equivalent streams in the reference: ``raw.out``, ``up_windowless.out``,
    ``fft.out`` (demod_impl.cc:337-355, pyramid_demod_impl.cc:574-591).
    """
    if np.iscomplexobj(iq):
        iq = to_ri(np.asarray(iq))
    iq = jnp.asarray(np.asarray(iq, np.float32))
    n = cfg.num_samples
    hop = hop or n // PYRAMID_OVERLAP_FACTOR
    num = max((iq.shape[0] - n) // hop + 1, 0)
    frames = frame_signal(iq, n, hop, num)

    _, down = chirp_tables(cfg.sf, cfg.p)
    dc = np.stack([down.real, down.imag], -1).astype(np.float32)
    dechirped = cmul(frames, jnp.asarray(dc))

    lo, hi = up_bands(frames, cfg)
    folded = cmag(lo) + cmag(hi)

    fft_add, fft_add_w, h_single = pyramid_spectra(frames, cfg)
    return {
        "raw": frames,
        "dechirped": dechirped,
        "folded": folded,
        "pyramid_fft_add": fft_add,
        "pyramid_fft_add_w": fft_add_w,
        "pyramid_h_single": h_single,
    }


def dump_rx_taps(iq, cfg: LoraConfig, out_dir: str | Path,
                 hop: int | None = None) -> dict:
    """Write every tap to ``out_dir/<name>.npy``; returns the arrays."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    taps = {k: np.asarray(jax.device_get(v))
            for k, v in rx_taps(iq, cfg, hop).items()}
    for name, arr in taps.items():
        np.save(out_dir / f"{name}.npy", arr)
    return taps


@contextlib.contextmanager
def profile(log_dir: str | Path = "/tmp/gr_lora_tpu_profile"):
    """Device trace for TensorBoard: ``with debug.profile(): run()``."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield Path(log_dir)
    finally:
        jax.profiler.stop_trace()
