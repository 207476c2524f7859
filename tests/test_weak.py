"""Weak-signal demodulator: two-copy combining loopback + low-SNR behavior.

Operating point follows the reference GRC defaults
(grc/lora_weak_demod.block.yml): fft_factor=8, beta=25.  The modulus-1
dynamic compensation (weak_demod_impl.cc:196-217) tracks fractional bin
drift, so coarse fft_factor values make it misfire on quantization jitter —
tests run at the reference default resolution.
"""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.models.weak import modulate_weak, weak_demodulate


def _cfg(**kw):
    base = dict(sf=8, cr=1, crc=True, ldr=False, explicit_header=False,
                payload_len=6, p=2, fft_factor=8, weak_sym_num=12)
    base.update(kw)
    return LoraConfig(**base)


def _rng_syms(cfg, count, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, cfg.num_symbols, count).astype(np.uint16)


def _noisy(iq, snr_db, seed):
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(10 ** (-snr_db / 10) / 2)
    return (iq + sigma * (rng.standard_normal(len(iq))
                          + 1j * rng.standard_normal(len(iq)))
            ).astype(np.complex64)


def test_weak_loopback_clean():
    cfg = _cfg()
    syms = _rng_syms(cfg, cfg.weak_sym_num)
    pkts = weak_demodulate(modulate_weak(syms, cfg), cfg)
    assert len(pkts) == 1
    assert np.array_equal(pkts[0], syms), (pkts[0], syms)


def test_weak_loopback_ldr():
    cfg = _cfg(ldr=True, weak_sym_num=10)
    # LDR compensation (modulus 4, v_last init 1) assumes the TX mapping
    # g*4+1 (reference encode_impl.cc:133), i.e. symbols == 1 (mod 4).
    syms = ((_rng_syms(cfg, cfg.weak_sym_num) & ~np.uint16(3)) + 1).astype(np.uint16)
    pkts = weak_demodulate(modulate_weak(syms, cfg), cfg)
    assert len(pkts) == 1
    assert np.array_equal(pkts[0], syms)


def test_weak_loopback_noisy_exact():
    cfg = _cfg()
    syms = _rng_syms(cfg, cfg.weak_sym_num, seed=5)
    pkts = weak_demodulate(_noisy(modulate_weak(syms, cfg), -8.0, 7), cfg)
    assert len(pkts) == 1
    assert np.array_equal(pkts[0], syms), (pkts[0], syms)


def test_weak_low_snr_ser():
    """At -12 dB SNR (below typical single-copy operating points) the weak
    demod still finds every packet and keeps symbol error rate low — the
    non-coherent +3 dB combining claim (weak_demod_impl.cc:192)."""
    cfg = _cfg(weak_sym_num=16)
    errs = tot = 0
    for t in range(8):
        syms = _rng_syms(cfg, cfg.weak_sym_num, seed=100 + t)
        iq = _noisy(modulate_weak(syms, cfg), -12.0, 200 + t)
        pkts = weak_demodulate(iq, cfg)
        assert len(pkts) == 1, f"trial {t}: packet not found"
        errs += int(np.sum(pkts[0] != syms))
        tot += len(syms)
    assert errs / tot < 0.15, f"SER {errs / tot} at -12 dB"


def test_weak_packet_duration_matches_waveform():
    from gr_lora_tpu.models.weak import modulate_weak, weak_packet_duration

    for sym_num in (1, 2, 3, 8, 13):
        cfg = _cfg(weak_sym_num=sym_num)
        syms = _rng_syms(cfg, sym_num)
        iq = modulate_weak(syms, cfg, pad_front=0, pad_back=0)
        assert len(iq) == weak_packet_duration(sym_num, cfg), sym_num


# ---------------------------------------------------------------------------
# Weak chain to bytes (reference wiring: weak_demod -> decode,
# weak_demod_impl.cc:451-471 publishes the symbol PDU that decode consumes).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cr,ldr,crc", [
    (1, False, True), (4, False, True), (2, False, False),
    (1, True, True), (3, True, False),
])
def test_weak_chain_to_bytes(cr, ldr, crc):
    """encode -> weak-layout TX -> weak demod -> decode, byte-exact."""
    from gr_lora_tpu.core.codec import decode, encode

    payload = bytes([0x11, 0x22, 0x33, 0x44, 0x55])
    base = _cfg(cr=cr, ldr=ldr, crc=crc, payload_len=len(payload))
    cfg = base.replace(weak_sym_num=base.packet_symbol_len())
    tx_syms = encode(payload, cfg)
    assert len(tx_syms) == cfg.weak_sym_num
    pkts = weak_demodulate(modulate_weak(tx_syms, cfg), cfg)
    assert len(pkts) == 1
    res = decode(pkts[0], cfg)
    assert res.ok
    if crc:
        assert res.crc_ok
    assert bytes(res.payload[:len(payload)]) == payload


def test_weak_chain_to_bytes_explicit_header():
    from gr_lora_tpu.core.codec import decode, encode

    payload = bytes([7, 7, 7, 7, 7])
    base = _cfg(cr=1, explicit_header=True, payload_len=len(payload))
    cfg = base.replace(weak_sym_num=base.packet_symbol_len())
    tx_syms = encode(payload, cfg)
    pkts = weak_demodulate(modulate_weak(tx_syms, cfg), cfg)
    assert len(pkts) == 1
    res = decode(pkts[0], cfg)
    assert res.ok and res.header is not None and res.header.is_valid
    assert res.header.payload_len == len(payload)
    assert res.crc_ok
    assert bytes(res.payload[3:3 + len(payload)]) == payload


def test_weak_chain_to_bytes_noisy():
    from gr_lora_tpu.core.codec import decode, encode

    payload = bytes(range(1, 7))
    base = _cfg(cr=1, payload_len=len(payload))
    cfg = base.replace(weak_sym_num=base.packet_symbol_len())
    tx_syms = encode(payload, cfg)
    iq = _noisy(modulate_weak(tx_syms, cfg), -10.0, seed=42)
    pkts = weak_demodulate(iq, cfg)
    assert len(pkts) == 1
    res = decode(pkts[0], cfg)
    assert res.ok and res.crc_ok
    assert bytes(res.payload[:len(payload)]) == payload


def test_streaming_weak_matches_batch():
    """Chunked feeding through the carried-state weak FSM == one-shot."""
    from gr_lora_tpu.models.weak import StreamingWeakDemodulator

    cfg = _cfg(weak_sym_num=12)
    rng = np.random.default_rng(3)
    chunks = []
    wanted = []
    for t in range(3):
        syms = _rng_syms(cfg, cfg.weak_sym_num, seed=40 + t)
        wanted.append(syms)
        chunks.append(modulate_weak(syms, cfg))
        chunks.append(np.zeros(int(rng.integers(1000, 4000)), np.complex64))
    iq = np.concatenate(chunks).astype(np.complex64)
    iq += 0.01 * (rng.standard_normal(len(iq))
                  + 1j * rng.standard_normal(len(iq))).astype(np.complex64)

    batch = weak_demodulate(iq, cfg)
    sd = StreamingWeakDemodulator(cfg, block_len=20000)
    got = []
    step = 13000
    from gr_lora_tpu.ops.cplx import to_ri
    ri = to_ri(iq)
    for i in range(0, len(iq), step):
        got += sd.feed(ri[i:i + step])
    got += sd.flush()
    assert [g.tobytes() for g in got] == [b.tobytes() for b in batch]
    assert len(got) == 3
    for g, w in zip(got, wanted):
        assert np.array_equal(g, w)


def test_ldr_only_compensation_recovers_packet_per():
    """The opt-in 'ldr-only' compensation policy (beyond-reference) beats
    the reference's always-on modulus-1 integrator on packet-perfect
    decode at non-LDR SFs, and is identical on clean input."""
    from gr_lora_tpu.core.codec import decode, encode

    base = _cfg(cr=1, payload_len=6)
    tx = encode(bytes(range(1, 7)), base.replace(
        weak_sym_num=base.packet_symbol_len()))

    def per(cfg, snr_db, trials=12):
        cfg = cfg.replace(weak_sym_num=base.packet_symbol_len())
        iq0 = modulate_weak(tx, cfg)
        fails = 0
        for t in range(trials):
            iq = _noisy(iq0, snr_db, 700 + t)
            ok = False
            for s in weak_demodulate(iq, cfg):
                r = decode(s, cfg)
                if r.ok and r.crc_ok:
                    ok = True
            fails += not ok
        return fails / trials

    ref = per(base, -11.0)
    fixed = per(base.replace(weak_compensation="ldr-only"), -11.0)
    assert fixed <= ref, (fixed, ref)
    # Clean input: both byte-perfect.
    assert per(base.replace(weak_compensation="ldr-only"), 10.0,
               trials=2) == 0.0
