"""Wideband channelizer: packets on different RF channels of one stream."""

import numpy as np
import pytest

import jax

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import decode, encode
from gr_lora_tpu.models.demodulator import demodulate
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.pipeline.channelizer import channel_frequencies, channelize

CFG = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=True,
                 payload_len=4, p=2, fft_factor=4)
SPACING = 125e3
NCH = 8
FS_IN = NCH * SPACING          # 1 Msps wideband, 8 channels


def _wideband(packets):
    """packets: list of (channel_index, payload, start_sym). Upconvert each
    TX to its channel offset at FS_IN and sum."""
    from gr_lora_tpu.pipeline.frontend import polyphase_resample

    freqs = channel_frequencies(NCH, SPACING)
    ratio = int(FS_IN / (CFG.p * SPACING))   # demod-rate -> wideband factor
    total = 0
    parts = []
    for ch, payload, start in packets:
        base = modulate(encode(payload, CFG), CFG, pad_front=0, pad_back=0)
        base_ri = np.stack([base.real, base.imag], -1).astype(np.float32)
        up_ri = np.asarray(jax.device_get(
            polyphase_resample(base_ri, float(ratio))))
        up = (up_ri[:, 0] + 1j * up_ri[:, 1]).astype(np.complex64)
        t0 = int(start * CFG.num_samples * ratio)
        t = (t0 + np.arange(len(up))) / FS_IN
        rf = up * np.exp(2j * np.pi * freqs[ch] * t)
        parts.append((t0, rf.astype(np.complex64)))
        total = max(total, t0 + len(rf))
    rng = np.random.default_rng(9)
    # A realistic noise floor: without it even -60 dB filter residue
    # "decodes" (LoRa's processing gain has no competing noise to beat).
    iq = (rng.standard_normal(total + 4096)
          + 1j * rng.standard_normal(total + 4096)).astype(np.complex64) * 3e-3
    for t0, rf in parts:
        iq[t0:t0 + len(rf)] += rf
    return iq


def _decode_channel(ch_iq):
    pkts = demodulate(np.ascontiguousarray(ch_iq), CFG)
    return [bytes(decode(s, CFG).payload) for s in pkts
            if decode(s, CFG).ok]


def test_two_channels_simultaneous():
    """Concurrent packets on two different RF channels both decode."""
    pay_a, pay_b = bytes([0x10, 0x20, 0x30, 0x40]), bytes([0x0A, 0x0B, 0x0C, 0x0D])
    iq = _wideband([(1, pay_a, 2), (5, pay_b, 4)])
    chans = np.asarray(jax.device_get(
        channelize(np.stack([iq.real, iq.imag], -1), NCH, FS_IN, SPACING,
                   p=CFG.p)))
    got_a = _decode_channel(chans[1])
    got_b = _decode_channel(chans[5])
    assert any(pay_a == g[3:7] for g in got_a), got_a
    assert any(pay_b == g[3:7] for g in got_b), got_b


def test_channel_isolation():
    """A packet on channel 2 does not appear on channel 6."""
    iq = _wideband([(2, bytes([1, 2, 3, 4]), 2)])
    chans = np.asarray(jax.device_get(
        channelize(np.stack([iq.real, iq.imag], -1), NCH, FS_IN, SPACING,
                   p=CFG.p)))
    assert _decode_channel(chans[2])
    assert not _decode_channel(chans[6])
    # Adjacent-channel leakage is filtered well below the signal level.
    p_sig = np.mean(chans[2] ** 2)
    p_adj = np.mean(chans[3] ** 2)
    assert p_adj < 0.05 * p_sig, (p_sig, p_adj)


def test_gateway_app_wideband_multi_sf(tmp_path, capsys):
    """End-to-end gateway CLI: two packets, different channels AND SFs, one
    wideband capture."""
    from gr_lora_tpu.apps import gateway

    cfg9 = CFG.replace(sf=9)
    from gr_lora_tpu.pipeline.frontend import polyphase_resample

    freqs = channel_frequencies(NCH, SPACING)
    ratio = int(FS_IN / (CFG.p * SPACING))

    def rf(cfg, payload, ch, t0):
        base = modulate(encode(payload, cfg), cfg, pad_front=0, pad_back=0)
        ri = np.stack([base.real, base.imag], -1).astype(np.float32)
        up = np.asarray(jax.device_get(polyphase_resample(ri, float(ratio))))
        sig = (up[:, 0] + 1j * up[:, 1]).astype(np.complex64)
        t = (t0 + np.arange(len(sig))) / FS_IN
        return t0, sig * np.exp(2j * np.pi * freqs[ch] * t)

    parts = [rf(CFG, bytes([1, 2, 3, 4]), 1, 3000),
             rf(cfg9, bytes([5, 6, 7, 8]), 6, 9000)]
    total = max(t0 + len(s) for t0, s in parts) + 8192
    rng = np.random.default_rng(2)
    iq = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
          ).astype(np.complex64) * 3e-3
    for t0, s in parts:
        iq[t0:t0 + len(s)] += s.astype(np.complex64)

    cap = tmp_path / "wideband.cf64"
    iq.tofile(cap)
    rc = gateway.main([str(cap), "--samp-rate", str(FS_IN),
                       "--channels", str(NCH), "--sfs", "7,9",
                       "--fft-factor", "4", "--payload-len", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ch=1" in out and "sf=7" in out and "01 02 03 04" in out
    assert "ch=6" in out and "sf=9" in out and "05 06 07 08" in out


def test_streaming_channelizer_matches_whole():
    """StreamingChannelizer fed irregular blocks reproduces the one-shot
    channelize output exactly (filter history + phase continuity across
    block seams)."""
    from gr_lora_tpu.pipeline.channelizer import StreamingChannelizer

    rng = np.random.default_rng(5)
    total = 40_000
    iq = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
          ).astype(np.complex64)
    ri = np.stack([iq.real, iq.imag], -1).astype(np.float32)

    whole = np.asarray(jax.device_get(
        channelize(ri, NCH, FS_IN, SPACING, p=CFG.p)))

    sc = StreamingChannelizer(NCH, FS_IN, SPACING, p=CFG.p)
    outs = []
    lo = 0
    for size in (7, 1111, 5000, 13, 9000, total):   # irregular seams
        outs.append(sc.feed(ri[lo:lo + size]))
        lo += size
        if lo >= total:
            break
    streamed = np.concatenate(outs, axis=1)

    m = min(whole.shape[1], streamed.shape[1])
    np.testing.assert_allclose(streamed[:, :m], whole[:, :m],
                               rtol=0, atol=1e-5)
    assert m >= whole.shape[1] - 1
