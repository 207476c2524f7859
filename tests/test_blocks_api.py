"""Block-style API parity: the reference factory surface works end-to-end,
and streaming checkpoint/resume restores mid-stream state exactly."""

import numpy as np
import pytest

import gr_lora_tpu
from gr_lora_tpu import blocks
from gr_lora_tpu.core.codec import decode as core_decode


def test_blocks_encode_mod_demod_decode_chain():
    """The reference flowgraph wiring, as calls:
    encode -> mod -> demod -> decode (txrx_sim.grc)."""
    enc = blocks.encode(8, 1, True, False, True)     # sf, cr, crc, ldr, header
    tx = blocks.mod(8)
    rx = blocks.demod(8, True, 8, 1, True, False, fft_factor=8, fs_bw_ratio=2)
    dec = blocks.decode(8, True, 8, 1, True, False)

    syms = enc(bytes([1, 2, 3, 4, 5, 6]))
    iq = tx(syms, p=2)
    pkts = rx(iq)
    assert len(pkts) == 1
    res = dec(pkts[0])
    assert res.ok and bytes(res.payload).hex() == "0630f0010203040506050801"


def test_blocks_pyramid_factory():
    enc = blocks.encode(8, 1, True, False, True)
    tx = blocks.mod(8)
    pyr = blocks.pyramid_demod(8, False, fft_factor=8, threshold=5.0,
                               fs_bw_ratio=2)
    iq = np.concatenate([np.zeros(1000, np.complex64),
                         0.2 * tx(enc(bytes([1, 2, 3, 4, 5, 6])), p=2),
                         np.zeros(4096, np.complex64)])
    pkts = pyr(iq.astype(np.complex64))
    assert len(pkts) == 1
    res = core_decode(pkts[0], pyr.cfg.replace(explicit_header=True, p=2))
    assert res.ok


def test_streaming_checkpoint_resume():
    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.core.codec import encode
    from gr_lora_tpu.models.demodulator import StreamingDemodulator
    from gr_lora_tpu.models.modulator import modulate
    from gr_lora_tpu.ops.cplx import to_ri

    cfg = LoraConfig(sf=7, cr=2, crc=True, ldr=False, explicit_header=False,
                     payload_len=4, p=2, fft_factor=2)
    pkt = to_ri(modulate(encode(bytes([9, 9, 9, 9]), cfg), cfg))

    # Feed half the packet, checkpoint mid-packet, restore into a NEW
    # instance, feed the rest: the packet must still decode.
    sd1 = StreamingDemodulator(cfg, block_len=2 * cfg.num_samples)
    half = len(pkt) // 2
    got = sd1.feed(pkt[:half])
    ckpt = sd1.state_dict()

    sd2 = StreamingDemodulator(cfg, block_len=2 * cfg.num_samples)
    sd2.load_state_dict(ckpt)
    got += sd2.feed(pkt[half:]) + sd2.flush()
    assert len(got) == 1
    res = core_decode(got[0][1], cfg)
    assert res.ok and bytes(res.payload[:4]) == bytes([9, 9, 9, 9])


def test_blocks_weak_demod_factory():
    """weak_demod factory round-trips symbols through the block API."""
    from gr_lora_tpu.models.weak import modulate_weak

    wd = blocks.weak_demod(8, False, 6, 1, True, False, sym_num=10,
                           fft_factor=8, fs_bw_ratio=2)
    rng = np.random.default_rng(3)
    syms = rng.integers(0, 256, 10).astype(np.uint16)
    pkts = wd(modulate_weak(syms, wd.cfg))
    assert len(pkts) == 1 and np.array_equal(pkts[0], syms)
