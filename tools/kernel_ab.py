"""A/B microbench for direct-formulation pyramid front-end kernels.

Paired-length on-device timing (bench._paired_time) of the shipping
kernel (ops/pallas_direct) vs candidate variants at the bench operating
points (sf=8, p=2, ff in {2, 8}).  Run on the TPU:

    python tools/kernel_ab.py [--ff 8] [--frames 4096] [--variants a,b]

Decisions recorded here and in docs/BENCH.md:
- split_dots (four narrow dots vs one wide, r5): parity at ff=8
  (318 vs 317 Msps), 2 % SLOWER at ff=2 (1041 vs 1065 Msps) — deleted.
- peaks k_tile (r5): full-K one-block top-M 339 Msps at ff=8 vs 110
  (kt=512) / 109 (kt=128); ff=2 645 vs 630 — the per-block
  scalar-guarded branch machinery dominated, not the selection
  arithmetic.  SHIPPED as the make_rdft_peaks default (k_tile=0).

CPU correctness (interpret mode) is checked by tests/test_pallas_direct.py
and tests/test_pallas_rdft.py; this tool only measures.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=int, default=8)
    ap.add_argument("--ff", type=int, default=8)
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--variants", type=str,
                    default="direct,rdft_flip,rdft_matmul")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.ops.pallas_direct import make_direct_spectra
    from gr_lora_tpu.ops.pallas_rdft import make_rdft_spectra

    cfg = LoraConfig(sf=args.sf, cr=1, crc=True, ldr=False,
                     explicit_header=True, payload_len=8, p=2,
                     fft_factor=args.ff, threshold=5.0, precision="bf16")
    hop = cfg.num_samples // 8
    total = (args.frames + 8) * hop
    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.normal(0, 1, (total, 2)).astype(np.float32))

    sys.path.insert(0, ".")
    from bench import _paired_time

    from gr_lora_tpu.ops.pallas_direct import make_direct_peaks
    from gr_lora_tpu.ops.pallas_rdft import make_rdft_peaks

    makers = {
        "direct": lambda: make_direct_spectra(cfg, args.frames),
        "rdft": lambda: make_rdft_spectra(cfg, args.frames),
        "rdft_flip": lambda: make_rdft_spectra(cfg, args.frames, rev="flip"),
        "rdft_ft64": lambda: make_rdft_spectra(cfg, args.frames,
                                               frame_tile=64),
        "rdft_ft128": lambda: make_rdft_spectra(cfg, args.frames,
                                                frame_tile=128),
        "rdft_ft256": lambda: make_rdft_spectra(cfg, args.frames,
                                                frame_tile=256),
        "rdft_ft512": lambda: make_rdft_spectra(cfg, args.frames,
                                                frame_tile=512),
        "rdft_fuse": lambda: make_rdft_spectra(cfg, args.frames, fuse=True),
        "rdft_nofuse": lambda: make_rdft_spectra(cfg, args.frames,
                                                 fuse=False),
        "rdft_fuse_ft128": lambda: make_rdft_spectra(cfg, args.frames,
                                                     frame_tile=128,
                                                     fuse=True),
        # Diagnostic: reversal skipped (WRONG fold) — its wall delta vs
        # plain rdft is the per-128-block anti-identity matmuls' cost.
        "rdft_norev": lambda: make_rdft_spectra(cfg, args.frames,
                                                rev="none"),
        "direct_peaks": lambda: make_direct_peaks(cfg, args.frames, 8),
        "rdft_peaks": lambda: make_rdft_peaks(cfg, args.frames, 8),
        "rdft_peaks_ft128": lambda: make_rdft_peaks(cfg, args.frames, 8,
                                                    frame_tile=128),
        "rdft_peaks_ft256": lambda: make_rdft_peaks(cfg, args.frames, 8,
                                                    frame_tile=256),
        "rdft_peaks_kt128": lambda: make_rdft_peaks(cfg, args.frames, 8,
                                                    k_tile=128),
        "rdft_peaks_kt512": lambda: make_rdft_peaks(cfg, args.frames, 8,
                                                    k_tile=512),
    }

    for name in args.variants.split(","):
        step = makers[name]()

        def make_run(reps, _step=step):
            @jax.jit
            def run(x=iq):
                def body(c, _):
                    outs = _step(x + c * 0)
                    s = sum(jnp.sum(o.astype(jnp.float32))
                            for o in jax.tree.leaves(outs))
                    return c + s, ()
                tot, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=reps)
                return tot
            return run

        base = 16
        try:
            per = _paired_time(make_run, base, 5 * base, rounds=args.rounds)
        except Exception as e:  # compile failure on one variant: keep going
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        sps = args.frames * hop / per
        print(f"{name}: {per * 1e3:.3f} ms/pass = {sps / 1e6:.0f} Msps")


if __name__ == "__main__":
    main()
