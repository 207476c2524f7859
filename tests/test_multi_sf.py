"""Multi-SF gateway reception: quasi-orthogonal SFs on one channel."""

import numpy as np

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.dist.multi_sf import MultiSFReceiver
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

BASE = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                  payload_len=4, p=2, fft_factor=4)


def _pkt(sf, payload, ldr=False):
    cfg = BASE.replace(sf=sf, ldr=ldr)
    return to_ri(modulate(encode(payload, cfg), cfg, pad_front=0, pad_back=0))


def test_two_sfs_same_channel():
    """SF7 and SF9 packets overlapping in time on one channel are each
    recovered by their own demodulator."""
    p7 = _pkt(7, bytes([0x11, 0x22]))
    p9 = _pkt(9, bytes([0x33, 0x44, 0x55]))
    total = 3000 + max(len(p7) + 2000, len(p9)) + 4096
    iq = np.zeros((total, 2), np.float32)
    iq[3000 + 2000:3000 + 2000 + len(p7)] += 0.5 * p7   # inside p9's span
    iq[3000:3000 + len(p9)] += 0.5 * p9

    rx = MultiSFReceiver(BASE, sfs=(7, 9))
    pkts = rx(iq)
    payloads = {p.sf: bytes(p.result.payload) for p in pkts}
    assert 7 in payloads and payloads[7][3:5] == bytes([0x11, 0x22])
    assert 9 in payloads and payloads[9][3:6] == bytes([0x33, 0x44, 0x55])


def test_multi_channel_multi_sf():
    """2 channels x 2 SFs: every (channel, sf) packet lands correctly."""
    p7 = _pkt(7, bytes([0xAA, 0xBB]))
    p8 = _pkt(8, bytes([0xCC, 0xDD]))
    total = 4000 + max(len(p7), len(p8)) + 4096
    iq = np.zeros((2, total, 2), np.float32)
    iq[0, 1000:1000 + len(p7)] += 0.5 * p7
    iq[1, 2000:2000 + len(p8)] += 0.5 * p8

    rx = MultiSFReceiver(BASE, sfs=(7, 8))
    pkts = rx(iq)
    found = {(p.channel, p.sf) for p in pkts}
    assert (0, 7) in found and (1, 8) in found
    assert (0, 8) not in found and (1, 7) not in found
