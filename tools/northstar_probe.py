"""Per-SF window-batch cost on the TPU: device tracker vs host lattice.

For each SF in the north-star set, times ONE dispatched window batch
through (a) the fused lattice+device-tracker jit and (b) the bare lattice
with the peak fetch the host tracker would need — at several event-batch
widths.  This is the number the north-star wall is made of
(dist/collision_gateway._launch_batch/_drain_batch).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/northstar_probe.py
       [--sfs 7,8,10,12] [--ebs 8,32] [--mode device,host]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", type=str, default="7,8,10,12")
    ap.add_argument("--ebs", type=str, default="8,32")
    ap.add_argument("--mode", type=str, default="device,host")
    ap.add_argument("--backend", type=str, default="xla")
    ap.add_argument("--precision", type=str, default="default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.dist.collision_gateway import TriggeredPyramidGateway

    base = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                      payload_len=8, p=2, fft_factor=8, threshold=5.0,
                      precision=args.precision)
    sfs = tuple(int(s) for s in args.sfs.split(","))
    modes = args.mode.split(",")

    for eb in (int(x) for x in args.ebs.split(",")):
        for mode in modes:
            gw = TriggeredPyramidGateway(
                base, 1, sfs=sfs, max_payload_len=16, event_batch=eb,
                backend=args.backend,
                tracker="device" if mode == "device" else "host")
            for sf in sfs:
                st = gw.sf_states[sf]
                win = gw._win_samples(st)
                x = jnp.zeros((eb, win, 2), jnp.float32)
                if mode == "device":
                    fn = gw._device_window_fn(st)

                    def run():
                        return jax.device_get(fn(x)[0])
                else:
                    fn = gw._lattice(st)

                    def run():
                        return tuple(np.asarray(o) for o in
                                     jax.device_get(fn(x)))

                t0 = time.perf_counter()
                run()
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    run()
                    best = min(best, time.perf_counter() - t0)
                sps = eb * win / best
                print(f"eb={eb:3d} {mode:6s} sf={sf:2d} win={win:8d} "
                      f"hops={st.win_hops:5d} batch={best*1e3:9.2f} ms "
                      f"({sps/1e6:7.1f} Msps) compile={compile_s:.1f}s",
                      flush=True)


if __name__ == "__main__":
    main()
