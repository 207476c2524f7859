"""Split one dispatched lattice window batch into its cost terms.

For a north-star SF/eb cell, times separately:
  gather   — DeviceRing HBM->HBM window gather (sync via 1-elem fetch)
  compute  — lattice fn queued + synced via a 1-element fetch
  fetch    — full [eb, hops, peaks] peak fetch through the tunnel

Usage: python tools/lattice_probe.py [--sf 12] [--ebs 4,8,32]
       [--backend xla] [--tracker host]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", type=str, default="7,12")
    ap.add_argument("--ebs", type=str, default="4,8,32")
    ap.add_argument("--backend", type=str, default="xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.dist.collision_gateway import TriggeredPyramidGateway

    base = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                      payload_len=8, p=2, fft_factor=8, threshold=5.0,
                      precision="default")
    sfs = tuple(int(s) for s in args.sfs.split(","))

    for eb in (int(x) for x in args.ebs.split(",")):
        for sf in sfs:
            gw = TriggeredPyramidGateway(
                base, 1, sfs=(sf,), max_payload_len=16, event_batch=eb,
                backend=args.backend, tracker="host")
            st = gw.sf_states[sf]
            win = gw._win_samples(st)
            x = jnp.zeros((eb, win, 2), jnp.float32)
            fn = gw._lattice(st)

            outs = fn(x)                      # compile
            jax.device_get(outs)

            def t_compute():
                t0 = time.perf_counter()
                o = fn(x)
                jax.device_get(o[0][0, 0])    # sync, tiny fetch
                return time.perf_counter() - t0, o

            def t_fetch(o):
                t0 = time.perf_counter()
                tuple(np.asarray(v) for v in jax.device_get(o))
                return time.perf_counter() - t0

            comp = fet = float("inf")
            for _ in range(3):
                c, o = t_compute()
                comp = min(comp, c)
                fet = min(fet, t_fetch(o))
            nb = sum(int(np.asarray(v).nbytes) for v in jax.device_get(fn(x)))
            sps = eb * win / (comp + fet)
            print(f"eb={eb:3d} sf={sf:2d} win={win:8d} hops={st.win_hops:5d} "
                  f"blk={gw._lattice_block_hops(st)} "
                  f"compute={comp * 1e3:8.2f} ms fetch={fet * 1e3:8.2f} ms "
                  f"({nb / 1e6:.2f} MB, {nb / fet / 1e6:6.1f} MB/s) "
                  f"total={sps / 1e6:7.1f} Msps", flush=True)


if __name__ == "__main__":
    main()
