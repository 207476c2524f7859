"""Where does the SF12xff=8 window batch spend its time?

Times, for one [eb, win] SF12 collision-zoom window batch:
  - full blocked lattice per backend (spectra + local-max + top_k)
  - spectra alone per backend (the dense DFT front-end, same blocking)
so extraction cost = full - spectra.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sf12_probe.py
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=int, default=12)
    ap.add_argument("--eb", type=int, default=8)
    ap.add_argument("--backends", type=str, default="fast,fastp")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.dist.collision_gateway import TriggeredPyramidGateway
    from gr_lora_tpu.models.pyramid import peak_lattice_fn

    base = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                      payload_len=8, p=2, fft_factor=8, threshold=5.0,
                      precision="default")
    gw = TriggeredPyramidGateway(base, 1, sfs=(args.sf,), max_payload_len=16,
                                 event_batch=args.eb, tracker="host")
    st = gw.sf_states[args.sf]
    cfg = st.cfg
    win = gw._win_samples(st)
    blk = gw._lattice_block_hops(st) or st.win_hops
    eb = args.eb
    n = cfg.num_samples
    hop = n // 8
    x = jnp.zeros((eb, win, 2), jnp.float32)
    xblk = jnp.zeros((eb, blk * hop + n - hop, 2), jnp.float32)
    nblocks = -(-st.win_hops // blk)
    print(f"sf={args.sf} eb={eb} win={win} hops={st.win_hops} blk={blk} "
          f"nblocks={nblocks} bins={cfg.bin_size}", flush=True)

    def timeit(tag, fn, inp, samples):
        o = fn(inp)
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0])  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = fn(inp)
            jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"  {tag:24s} {best * 1e3:9.2f} ms "
              f"({samples / best / 1e6:7.1f} Msps)", flush=True)

    for be in args.backends.split(","):
        run = peak_lattice_fn(cfg, st.win_hops, gw.max_peaks, be,
                              block_hops=blk if nblocks > 1 else None)
        timeit(f"lattice[{be}]", jax.jit(jax.vmap(run)), x, eb * win)

        if be == "fast":
            from gr_lora_tpu.ops.overlap_dft import fast_pyramid_spectra
            sp = lambda iq: fast_pyramid_spectra(iq, cfg, blk)
        elif be == "fastp":
            from gr_lora_tpu.ops.pallas_overlap import make_overlap_spectra
            sp = make_overlap_spectra(cfg, blk)
        else:
            continue
        timeit(f"spectra[{be}] 1-block", jax.jit(jax.vmap(sp)), xblk,
               eb * blk * hop)


if __name__ == "__main__":
    main()
