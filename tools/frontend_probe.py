"""Stage-by-stage front-end timing on the TPU: where does the pass go?

Decomposes bench.py's default pyramid front-end pass (SF8, B frames) into:
  framing   — overlapped frame stack only
  matmul    — bare packed zoom-DFT matmul (the MXU floor)
  spectra   — matmul + magnitude + fold (pyramid_spectra)
  step      — spectra + per-hop argmax/max reductions (the bench step)
for each --precision, plus the pallas backends.  Prints one line per stage.

Usage: python tools/frontend_probe.py [--sf 8] [--ff 2] [--frames 16384]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def sync_time(fn, x, iters=8):
    import jax
    jax.device_get(fn(x))
    jax.device_get(fn(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.device_get(jax.tree.leaves(out)[0][..., :1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=int, default=8)
    ap.add_argument("--ff", type=int, default=2)
    ap.add_argument("--frames", type=int, default=16384)
    ap.add_argument("--stages", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_inputs, make_step
    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.ops.dechirp import _pyramid_plan, pyramid_spectra

    B = args.frames
    stages = set(args.stages.split(",")) if args.stages else None

    def want(name):
        return stages is None or name in stages

    for precision in ("default", "bf16"):
        cfg = LoraConfig(sf=args.sf, cr=1, crc=True, ldr=False,
                         explicit_header=False, payload_len=6, p=2,
                         fft_factor=args.ff, precision=precision)
        n = cfg.num_samples
        hop = n // 8
        iq, _, total = build_inputs(cfg, B)
        samples = B * hop

        def report(name, dt, flops=None):
            line = (f"{precision:8s} {name:10s} {dt*1e3:8.2f} ms "
                    f"{samples/dt/1e6:8.1f} Msps")
            if flops:
                line += f"  {flops/dt/1e12:6.1f} TF/s"
            print(line, flush=True)

        r = 8

        def frame(iq):
            chunks = iq[: (B + r - 1) * hop].reshape(-1, hop, 2)
            fr = jnp.stack(
                [jax.lax.slice_in_dim(chunks, k, k + B, axis=0)
                 for k in range(r)], axis=1).reshape(B, n, 2)
            return fr

        plan = _pyramid_plan(cfg.sf, cfg.p, cfg.fft_factor, cfg.beta,
                             cfg.precision)
        w2 = plan._w2
        mm_flops = 2 * B * w2.shape[0] * w2.shape[1]

        if want("framing"):
            report("framing", sync_time(jax.jit(frame), iq))

        if want("matmul"):
            def mat(iq):
                fr = frame(iq)
                xp = jnp.concatenate([fr[..., 0], fr[..., 1]], axis=-1)
                w = jnp.asarray(w2)
                if precision == "bf16":
                    xp, w = xp.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
                return jnp.matmul(
                    xp, w,
                    precision=None if precision == "bf16"
                    else jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
            report("matmul", sync_time(jax.jit(mat), iq), mm_flops)

        if want("matmul16"):
            def mat16(iq):
                fr = frame(iq)
                xp = jnp.concatenate([fr[..., 0], fr[..., 1]],
                                     axis=-1).astype(jnp.bfloat16)
                w = jnp.asarray(w2).astype(jnp.bfloat16)
                y = jnp.matmul(xp, w, preferred_element_type=jnp.float32)
                return y.astype(jnp.bfloat16)   # bf16 spectra store
            report("matmul16", sync_time(jax.jit(mat16), iq), mm_flops)

        if want("spectra"):
            def spec(iq):
                return pyramid_spectra(frame(iq), cfg)
            report("spectra", sync_time(jax.jit(spec), iq), mm_flops)

        if want("step"):
            step = make_step(cfg, B, hop, "xla")
            report("step", sync_time(step, iq), mm_flops)

        if want("direct"):
            try:
                stepd = make_step(cfg, B, hop, "direct")
                report("direct", sync_time(stepd, iq), mm_flops)
            except Exception as e:       # noqa: BLE001
                print(f"{precision:8s} direct     FAILED: {e}")

        if want("fastp"):
            try:
                stepf = make_step(cfg, B, hop, "fastp")
                report("fastp", sync_time(stepf, iq))
            except Exception as e:       # noqa: BLE001
                print(f"{precision:8s} fastp      FAILED: {e}")

        if want("pallas"):
            try:
                stepp = make_step(cfg, B, hop, "pallas")
                report("pallas", sync_time(stepp, iq))
            except Exception as e:       # noqa: BLE001
                print(f"{precision:8s} pallas     FAILED: {e}")


if __name__ == "__main__":
    main()
