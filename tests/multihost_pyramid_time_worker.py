"""Worker for tests/test_multihost.py: time-ONLY multihost collision
sharding (VERDICT r2 weak #7).  Two processes form one {ch: 1, t: 8} mesh —
a single channel row spanning BOTH processes — so the lattice compute is
split along time over DCN while the row's peak lattice is all_gathered
on-device and its tracker runs on the owning process (the one holding the
row's first t-shard).  Both golden README PDUs must decode exactly once,
on the owner."""

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
    # One channel row over every device: pure time sharding.
    mesh = multihost.make_multihost_mesh(num_channel_shards=1)
    n = cfg.num_samples

    p1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                        pad_front=0, pad_back=0)
    p2 = 0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                         pad_front=0, pad_back=0)
    base = 1000
    off2 = base + 16 * n + 4 * n // 8 + 204
    total = base + 76 * n
    iq = np.zeros((1, total), np.complex64)
    iq[0, base:base + len(p1)] += p1
    iq[0, off2:off2 + len(p2)] += p2

    gw = PyramidGateway(cfg, channels=1, block_hops=512, mesh=mesh)
    # Gathered layout: every process feeds the full chunk; only the owner
    # of the (single) row tracks and reports.
    assert gw.ingest_channels == 1
    expected_local = 1 if pid == 0 else 0
    assert gw.local_channels == expected_local, \
        (pid, gw.local_channels)
    got = gw.feed(to_ri(iq)) + gw.flush()
    pdus = sorted(
        (p.channel, bytes(p.result.payload).hex(), int(p.position))
        for p in got if p.result is not None and p.result.ok)
    print(json.dumps({"pid": pid, "pdus": pdus, "base": base,
                      "local_channels": gw.local_channels}), flush=True)


if __name__ == "__main__":
    main()
