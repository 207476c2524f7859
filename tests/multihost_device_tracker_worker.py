"""Worker for tests/test_multihost.py: 2-host collision gateway with the
ON-DEVICE tracker (VERDICT r3 task 3).  Each process owns one channel row
of a {ch: 2, t: 2} mesh; the peak lattices are consumed where they are
produced and only the replicated 4 B/channel counter plus the finished-
packet pools (~KB) ever cross the link — fetched_bytes is recorded so the
test can assert the fetch is packet-sized, not lattice-sized."""

import json
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    from gr_lora_tpu.dist import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid, platform="cpu")

    import numpy as np

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.core.codec import encode
    from gr_lora_tpu.dist.pyramid_gateway import PyramidGateway
    from gr_lora_tpu.models.modulator import modulate
    from gr_lora_tpu.ops.cplx import to_ri

    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0)
    mesh = multihost.make_multihost_mesh(num_channel_shards=nproc)
    n = cfg.num_samples

    p1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                        pad_front=0, pad_back=0)
    p2 = 0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                         pad_front=0, pad_back=0)
    base = 1000 + pid * 2 * n
    off2 = base + 16 * n + 4 * n // 8 + 204
    total = 1000 + nproc * 2 * n + 76 * n
    iq = np.zeros((1, total), np.complex64)
    iq[0, base:base + len(p1)] += p1
    iq[0, off2:off2 + len(p2)] += p2

    gw = PyramidGateway(cfg, channels=nproc, block_hops=512, mesh=mesh,
                        tracker="device")
    assert gw.local_channels == 1, gw.local_channels
    got = gw.feed(to_ri(iq)) + gw.flush()
    pdus = sorted(
        (p.channel, bytes(p.result.payload).hex(), int(p.position))
        for p in got if p.result is not None and p.result.ok)
    print(json.dumps({"pid": pid, "pdus": pdus, "base": base,
                      "fetched_bytes": gw.fetched_bytes,
                      "stats": gw.stats()}), flush=True)


if __name__ == "__main__":
    main()
