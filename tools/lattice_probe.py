"""Per-SF peak-lattice backend probe at the north-star window shapes.

Measures `models.pyramid.peak_lattice_fn` throughput (samples/s, one chip)
for each backend at the exact (win_hops, block_hops, event_batch) the
collision gateway dispatches, so the gateway can pick the fastest plan per
SF instead of one global backend (the r3 north-star lattice wall was SF11/12
windows silently falling back to the HBM-bound overlap-XLA path).

Usage: python tools/lattice_probe.py [--sfs 9,10,11,12] [--backends ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="9,10,11,12")
    ap.add_argument("--backends", default="xla,fast,fastp,direct")
    ap.add_argument("--event-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.dist.collision_gateway import TriggeredPyramidGateway
    from gr_lora_tpu.models.pyramid import peak_lattice_fn

    base = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                      payload_len=8, p=2, fft_factor=8, threshold=5.0)
    sfs = tuple(int(s) for s in args.sfs.split(","))
    gw = TriggeredPyramidGateway(base, 1, sfs=sfs, max_payload_len=16,
                                 event_batch=args.event_batch)
    rng = np.random.default_rng(0)
    for sf in sfs:
        st = gw.sf_states[sf]
        win = gw._win_samples(st)
        blk = gw._lattice_block_hops(st)
        x = jnp.asarray(rng.standard_normal(
            (args.event_batch, win, 2)).astype(np.float32))
        for be in args.backends.split(","):
            try:
                fn = jax.jit(jax.vmap(peak_lattice_fn(
                    st.cfg, st.win_hops, gw.max_peaks, be, block_hops=blk)))
                out = fn(x)
                jax.device_get(out[0][:, :1, :1])  # sync, tiny fetch
                best = float("inf")
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    out = fn(x)
                    jax.device_get(out[0][:, :1, :1])
                    best = min(best, time.perf_counter() - t0)
                sps = args.event_batch * win / best
                print(f"sf={sf} backend={be:6s} win={win} hops={st.win_hops} "
                      f"blk={blk} {sps/1e6:8.1f} Msps  ({best:.3f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001 - probe keeps going
                print(f"sf={sf} backend={be:6s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
