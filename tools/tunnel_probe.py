"""Measure axon-tunnel transfer cost vs on-device scan compute.

Times, on the real TPU:
  up32 / up256   — host->device device_put of 32 MB / 256 MB
  scan_upload    — one preamble-scan chunk including the upload (status quo,
                   dist/collision_gateway._scan_new)
  scan_resident  — the same scan on a device-resident buffer (target design)
  roundtrip      — tiny device_get latency

Usage: python tools/tunnel_probe.py
"""

from __future__ import annotations

import time

import numpy as np


def t(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.dist.triggered import make_preamble_scan

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    rng = np.random.default_rng(0)
    mb32 = rng.standard_normal((64, 32768, 2)).astype(np.float32)
    mb256 = rng.standard_normal((64, 262144, 2)).astype(np.float32)

    def up(x):
        y = jax.device_put(x)
        jax.device_get(y[0, :1])
        return y

    up(mb32)   # warm
    d32 = t(lambda: up(mb32))
    print(f"up32 : {d32*1e3:8.1f} ms  {mb32.nbytes/d32/1e6:7.1f} MB/s",
          flush=True)
    d256 = t(lambda: up(mb256), reps=2)
    print(f"up256: {d256*1e3:8.1f} ms  {mb256.nbytes/d256/1e6:7.1f} MB/s",
          flush=True)

    small = jax.device_put(np.zeros(8, np.float32))
    jax.device_get(small)
    dr = t(lambda: jax.device_get(small), reps=5)
    print(f"roundtrip: {dr*1e3:.1f} ms", flush=True)

    cfg = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0)
    scan_cfg = cfg.replace(fft_factor=2)
    chunk_w = 256
    n = cfg.num_samples
    scan = make_preamble_scan(scan_cfg, chunk_w, 8, 3.0)
    seg = mb256[:, : chunk_w * n]
    print(f"scan chunk: {seg.nbytes/1e6:.1f} MB ({chunk_w} windows, "
          f"n={n})", flush=True)

    def scan_upload():
        out = scan(jnp.asarray(seg))
        return jax.device_get(out)

    scan_upload()   # compile
    du = t(scan_upload)
    print(f"scan_upload  : {du*1e3:8.1f} ms  "
          f"{64*seg.shape[1]/du/1e6:7.1f} Msps", flush=True)

    dseg = jax.device_put(seg)
    jax.device_get(dseg[0, :1])

    def scan_res():
        return jax.device_get(scan(dseg))

    scan_res()
    ds = t(scan_res)
    print(f"scan_resident: {ds*1e3:8.1f} ms  "
          f"{64*seg.shape[1]/ds/1e6:7.1f} Msps", flush=True)


if __name__ == "__main__":
    main()
