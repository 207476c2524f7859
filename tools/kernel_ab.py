"""A/B microbench for ops/pallas_direct.make_direct_spectra variants.

Paired-length on-device timing (bench._paired_time) of the shipping
one-wide-dot kernel vs the split-dots variant at the bench operating
points (sf=8, p=2, ff in {2, 8}).  Run on the TPU:

    python tools/kernel_ab.py [--ff 8] [--frames 4096]

CPU correctness (interpret mode) is checked by tests/test_pallas_direct.py;
this tool only measures.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ff", type=int, default=8)
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.ops.pallas_direct import make_direct_spectra

    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=args.ff, threshold=5.0,
                     precision="bf16")
    hop = cfg.num_samples // 8
    total = (args.frames + 8) * hop
    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.normal(0, 1, (total, 2)).astype(np.float32))

    sys.path.insert(0, ".")
    from bench import _paired_time

    # Variants under A/B.  split_dots was measured here (r5: parity at
    # ff=8, 2 % slower at ff=2) and deleted; the harness stays for the
    # next kernel candidate.
    for name in ("direct",):
        step = make_direct_spectra(cfg, args.frames)

        def make_run(reps, _step=step):
            @jax.jit
            def run(x=iq):
                def body(c, _):
                    fa, faw, hs = _step(x + c * 0)
                    s = (jnp.sum(fa) + jnp.sum(faw) + jnp.sum(hs)
                         ).astype(jnp.float32)
                    return c + s, ()
                tot, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=reps)
                return tot
            return run

        base = 16
        per = _paired_time(make_run, base, 5 * base, rounds=args.rounds)
        sps = args.frames * hop / per
        print(f"{name}: {per * 1e3:.3f} ms/pass = {sps / 1e6:.0f} Msps")


if __name__ == "__main__":
    main()
