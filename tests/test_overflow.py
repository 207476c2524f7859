"""Packet/event slot overflow must be visible, not silent (VERDICT r1 #10).

The reference prints on pool exhaustion (pyramid_demod_impl.cc:256-260) or
silently truncates; here every fixed-slot surface reports a drop counter.
"""

import numpy as np

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.demodulator import demod_fn
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

CFG = LoraConfig(sf=7, cr=1, crc=False, ldr=False, explicit_header=False,
                 payload_len=2, p=2, fft_factor=2)


def _stream(num_pkts):
    pkt = to_ri(modulate(encode(bytes([1, 2]), CFG), CFG,
                         pad_front=0, pad_back=0))
    gap = 4 * CFG.num_samples
    chunks = []
    for _ in range(num_pkts):
        chunks.append(pkt)
        chunks.append(np.zeros((gap, 2), np.float32))
    return np.concatenate(chunks)


def test_demod_reports_slot_overflow():
    import jax

    iq = _stream(4)
    fn = jax.jit(demod_fn(CFG, iq.shape[0], 2))   # 2 slots, 4 packets
    syms, lens, pos, cnt, dropped, _ = jax.device_get(fn(iq))
    assert int(cnt) == 2
    assert int(dropped) == 2
    # The surviving slots are intact, fully decodable packets.
    from gr_lora_tpu.core.codec import decode
    for r in range(int(cnt)):
        assert decode(syms[r, :lens[r]], CFG).ok


def test_demod_no_overflow_when_slots_suffice():
    import jax

    iq = _stream(3)
    fn = jax.jit(demod_fn(CFG, iq.shape[0], 8))
    _, _, _, cnt, dropped, _ = jax.device_get(fn(iq))
    assert int(cnt) == 3
    assert int(dropped) == 0


def test_streaming_demod_accumulates_drop_counter():
    from gr_lora_tpu.models.demodulator import StreamingDemodulator

    iq = _stream(5)
    d = StreamingDemodulator(CFG, block_len=iq.shape[0], max_packets=2)
    got = d.feed(iq)
    got += d.flush()
    assert len(got) == 2
    assert d.dropped == 3


def test_triggered_receiver_counts_event_overflow():
    from gr_lora_tpu.dist.triggered import TriggeredReceiver

    rng = np.random.default_rng(0)
    n = CFG.num_samples
    pkt = to_ri(modulate(encode(bytes([1, 2]), CFG), CFG,
                         pad_front=0, pad_back=0))
    t = 400 * n
    iq = rng.normal(0, 0.01, (1, t, 2)).astype(np.float32)
    span = t - len(pkt) - n
    for i in range(6):
        off = n + i * span // 6
        iq[0, off:off + len(pkt)] += pkt
    rx = TriggeredReceiver(CFG, sfs=(7,), max_events=2)
    rx(iq)
    assert rx.dropped_events > 0
