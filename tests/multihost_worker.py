"""Worker process for tests/test_multihost.py: one host of a 2-host gateway.

Each process synthesizes the SAME capture deterministically, keeps only its
own time range (as a real host would only see its own antenna feed), joins
the distributed runtime, and runs the {ch, t} gateway with replicated
result gathering.  Prints one JSON line of decoded payloads.
"""

import json
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    from gr_lora_tpu.dist import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid, platform="cpu")

    import jax
    import numpy as np

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.core.codec import decode, encode
    from gr_lora_tpu.dist.gateway import make_gateway, right_halo_len
    from gr_lora_tpu.models.modulator import modulate
    from gr_lora_tpu.ops.cplx import to_ri

    cfg = LoraConfig(sf=6, cr=1, crc=False, ldr=False, explicit_header=False,
                     payload_len=2, p=2, fft_factor=1)
    mesh = multihost.make_multihost_mesh(1, len(jax.devices()))
    nt = mesh.shape["t"]
    block_len = max(right_halo_len(cfg), 4 * cfg.num_samples)
    total = nt * block_len

    payload = bytes([7, 9])
    pkt = to_ri(modulate(encode(payload, cfg), cfg, pad_front=0, pad_back=0))
    iq = np.zeros((2, total, 2), np.float32)
    # One packet per channel; channel 1's packet STRADDLES the process seam
    # (the host boundary at total//nproc; mid-stream for a single process).
    seam = total // max(nproc, 2)
    offs = [cfg.num_samples, seam - len(pkt) // 2]
    for c, off in enumerate(offs):
        iq[c, off:off + len(pkt)] = pkt

    plan = make_gateway(cfg, mesh, 2, block_len, max_packets=2,
                        gather_results=True)
    lo, hi = multihost.time_range_of_process(plan, total)
    giq = multihost.process_local_input(plan, iq[:, lo:hi], total)
    out, stats = multihost.multihost_gateway_receive(plan, giq, cfg)

    got = []
    for c, chan in enumerate(out):
        for pos, syms in chan:
            r = decode(syms, cfg)
            if r.ok:
                got.append([c, pos, bytes(r.payload).hex()])
    # Scaling measurement: steady-state samples/s of the sharded gateway
    # step (the dense compute path; packet lists are tiny).
    import time as _time

    iters = 3
    jax.block_until_ready(plan.fn(giq))
    t0 = _time.perf_counter()
    for _ in range(iters):
        out = plan.fn(giq)
    jax.block_until_ready(out)
    dt = _time.perf_counter() - t0
    sps = 2 * total * iters / dt     # 2 channels

    print(json.dumps({
        "pid": pid, "range": [lo, hi], "packets": got,
        "dropped": stats["dropped"],
        "expected_payload": payload.hex(),
        "offs": offs,
        "samples_per_sec": sps,
        "devices": len(jax.devices()),
    }), flush=True)


if __name__ == "__main__":
    main()
