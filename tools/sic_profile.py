"""Per-window SIC cost breakdown on the TPU (bench --mode north_star
--sic wall decomposition).  Builds one single-packet window per SF and
one SF8 golden collision window, runs sic_demodulate with the tracker's
known packets (the r5 gateway fast path), and times each stage via
wrapped module functions.

    python tools/sic_profile.py [--sfs 7,8,10,12]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", type=str, default="7,8,10,12")
    args = ap.parse_args()

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.core.codec import encode
    from gr_lora_tpu.models import sic as sic_mod
    from gr_lora_tpu.models.modulator import modulate

    walls = {}

    def wrap(name):
        real = getattr(sic_mod, name)

        def timed(*a, **kw):
            t0 = time.perf_counter()
            r = real(*a, **kw)
            walls.setdefault(name, []).append(time.perf_counter() - t0)
            return r
        setattr(sic_mod, name, timed)

    for name in ("_demod_pass", "_subtract", "_refine", "_align",
                 "_align_fast", "_reextract"):
        wrap(name)

    for sf in (int(s) for s in args.sfs.split(",")):
        ldr = (1 << sf) / 125e3 > 16e-3
        cfg = LoraConfig(sf=sf, cr=1, crc=True, ldr=ldr,
                         explicit_header=True, payload_len=4, p=2,
                         fft_factor=8, threshold=5.0, precision="default")
        n = cfg.num_samples
        syms = np.asarray(encode(bytes([sf, 1, 2, sf]), cfg), np.uint16)
        pkt = 0.15 * modulate(syms, cfg, pad_front=0, pad_back=0)
        lead = 4 * n
        iq = np.zeros(lead + len(pkt) + 14 * n, np.complex64)
        iq[lead:lead + len(pkt)] += pkt.astype(np.complex64)
        iq += (0.003 * (np.random.default_rng(0).standard_normal(len(iq))
               + 1j * np.random.default_rng(1).standard_normal(len(iq)))
               ).astype(np.complex64)
        known = [(lead + 7 * n, syms)]
        for tag in ("cold", "warm"):
            walls.clear()
            t0 = time.perf_counter()
            pkts = sic_mod.sic_demodulate(
                iq, cfg, max_peaks=8, backend="fused", fast_align=True,
                known=known, residual_gate=0.02)
            wall = time.perf_counter() - t0
            stage = " ".join(f"{k}={sum(v):.3f}s/{len(v)}"
                             for k, v in sorted(walls.items()))
            print(f"sf{sf} single {tag}: wall={wall:.3f}s "
                  f"pkts={len(pkts)} {stage}", flush=True)

    # SF8 golden collision window.
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0,
                     precision="default")
    n = cfg.num_samples
    s1 = np.asarray(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), np.uint16)
    s2 = np.asarray(encode(bytes([7] * 5), cfg), np.uint16)
    p1 = 0.2 * modulate(s1, cfg, pad_front=0, pad_back=0)
    p2 = 0.09 * modulate(s2, cfg, pad_front=0, pad_back=0)
    lead = 4 * n
    off2 = lead + 16 * n + 4 * n // 8 + 204
    iq = np.zeros(off2 + len(p2) + 14 * n, np.complex64)
    iq[lead:lead + len(p1)] += p1.astype(np.complex64)
    iq[off2:off2 + len(p2)] += p2.astype(np.complex64)
    known = [(lead + 7 * n, s1), (off2 + 7 * n, s2)]
    for tag in ("cold", "warm"):
        walls.clear()
        t0 = time.perf_counter()
        pkts = sic_mod.sic_demodulate(
            iq, cfg, max_peaks=8, backend="fused", fast_align=True,
            known=known, residual_gate=0.02)
        wall = time.perf_counter() - t0
        stage = " ".join(f"{k}={sum(v):.3f}s/{len(v)}"
                         for k, v in sorted(walls.items()))
        print(f"sf8 collision {tag}: wall={wall:.3f}s pkts={len(pkts)} "
              f"{stage}", flush=True)


if __name__ == "__main__":
    main()
