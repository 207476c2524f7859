"""Worker for tests/test_multihost.py: one host of a 2-host detection-
gated collision gateway (VERDICT r3 task 2).  Channels are sharded over
the mesh's 'ch' axis; both processes feed the full (identical) channel
matrix — the device transfer is per-shard — and every process takes the
same dispatch decisions from replicated scan results, but emits only the
channels whose first shard it hosts."""

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
    from gr_lora_tpu.dist.collision_gateway import TriggeredPyramidGateway
    from gr_lora_tpu.models.modulator import modulate
    from gr_lora_tpu.ops.cplx import to_ri

    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8, threshold=5.0)
    mesh = multihost.make_multihost_mesh(num_channel_shards=nproc)
    # Collapse {ch, t} -> pure channel sharding: the gated path needs no
    # time axis (windows are self-contained).
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()), ("ch",))
    n = cfg.num_samples
    channels = len(jax.devices())      # one channel per device

    p1 = 0.2 * modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg,
                        pad_front=0, pad_back=0)
    p2 = 0.09 * modulate(encode(bytes([7] * 5), cfg), cfg,
                         pad_front=0, pad_back=0)
    bases = {}
    total = 1000 + channels * 2 * n + 90 * n
    iq = np.zeros((channels, total), np.complex64)
    for c in range(channels):
        base = 1000 + c * 2 * n
        bases[c] = base
        off2 = base + 16 * n + 4 * n // 8 + 204
        iq[c, base:base + len(p1)] += p1
        iq[c, off2:off2 + len(p2)] += p2

    gw = TriggeredPyramidGateway(cfg, channels, sfs=(8,),
                                 max_payload_len=16, mesh=mesh)
    got = gw.feed(to_ri(iq)) + gw.flush()
    pdus = sorted(
        (p.channel, bytes(p.result.payload).hex(), int(p.position))
        for p in got if p.result is not None and p.result.ok)
    print(json.dumps({"pid": pid, "pdus": pdus, "bases": bases,
                      "own": sorted(gw._own_channels),
                      "channels": channels}), flush=True)


if __name__ == "__main__":
    main()
