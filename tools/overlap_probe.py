"""Does Mosaic dual-issue MXU and VPU work inside one grid step?

Three kernels, identical grid machinery, paired-length timed on the TPU:
  mxu:  one [R, n] @ [n, W] bf16 dot per step into a VMEM scratch
  vpu:  an independent elementwise chain (the rdft epilogue's op mix)
        on a separate VMEM scratch
  both: the dot ISSUED FIRST, then the independent VPU chain

If wall(both) ~= max(wall(mxu), wall(vpu)) the hardware overlaps the
units (the dot retires asynchronously while the VPU chain runs) and a
software-pipelined epilogue can hide the rdft kernels' serial VPU term.
If wall(both) ~= mxu + vpu, Mosaic serializes and the roofline's
serial-VPU model (bench.bench_roofline) is the machine truth.

    python tools/overlap_probe.py [--rows 256] [--width 4352] [--vpu-rounds 2]
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--depth", type=int, default=512)
    ap.add_argument("--width", type=int, default=4352)
    ap.add_argument("--vpu-rounds", type=int, default=2)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, ".")
    from bench import _paired_time

    R, D, W, T = args.rows, args.depth, args.width, args.steps
    VR = args.vpu_rounds
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (R, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 1, (D, W)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    v0 = jnp.asarray(rng.uniform(0.5, 1.5, (R, 1280)).astype(np.float32))

    def vpu_chain(a):
        for _ in range(VR):
            b = a * 1.0001 + 0.1
            m = jnp.sqrt(a * a + b * b)
            g = jnp.sqrt(jnp.maximum(a + m, 0.1) * (b - m) * (b - m) + 1.0)
            a = 0.25 * (m + g) + 0.5 * jnp.maximum(m, g)
        return a

    def make(kind):
        def kern(x_ref, w_ref, v_ref, o_ref, acc, vs):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                vs[...] = v_ref[:]

            if kind in ("mxu", "both"):
                acc[...] = jnp.dot(x_ref[:], w_ref[:],
                                   preferred_element_type=jnp.float32)
            if kind in ("vpu", "both"):
                vs[...] = vpu_chain(vs[...])

            @pl.when(i == T - 1)
            def _():
                o_ref[:, :] = acc[0:1, 0:1] + vs[0:1, 0:1]

        return pl.pallas_call(
            kern, grid=(T,),
            in_specs=[pl.BlockSpec((R, D), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((D, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, 1280), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, W), jnp.float32),
                            pltpu.VMEM((R, 1280), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    walls = {}
    for kind in ("mxu", "vpu", "both"):
        call = make(kind)

        def make_run(k, _call=call):
            @jax.jit
            def run(xx=x, ww=w, vv=v0):
                def body(c, _):
                    o = _call(xx + c * 0, ww, vv)
                    return c + o[0, 0], ()
                tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
                return tot
            return run

        per = _paired_time(make_run, 8, 48)
        walls[kind] = per
        print(f"{kind}: {per * 1e3:.3f} ms/call "
              f"({per / T * 1e6:.2f} us/step)")

    s = walls["mxu"] + walls["vpu"]
    m = max(walls["mxu"], walls["vpu"])
    b = walls["both"]
    print(f"serial-sum={s * 1e3:.3f} ms  max={m * 1e3:.3f} ms  "
          f"both={b * 1e3:.3f} ms  -> overlap_efficiency="
          f"{(s - b) / max(s - m, 1e-12):.0%} (100%=full dual-issue, "
          f"0%=serialized)")


if __name__ == "__main__":
    main()
