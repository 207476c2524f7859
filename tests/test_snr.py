"""Per-packet SNR estimates (beyond-reference observability).

The FSM records the peak/mean ratio of the detection spectrum;
snr_db_estimate converts it to an in-band SNR figure via the Rayleigh
noise-floor model.  Calibration: within a few dB of the injected SNR
across the usable range.
"""

import numpy as np

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.models.demodulator import (StreamingDemodulator,
                                            snr_db_estimate)
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

CFG = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=False,
                 payload_len=4, p=2, fft_factor=4)


def _packet_at_snr(snr_db, seed=0):
    iq = modulate(encode(bytes([1, 2, 3, 4]), CFG), CFG)
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(CFG.p * 10 ** (-snr_db / 10) / 2)
    return (iq + sigma * (rng.standard_normal(len(iq))
                          + 1j * rng.standard_normal(len(iq)))
            ).astype(np.complex64)


def test_snr_estimate_tracks_injected_snr():
    est = {}
    for snr in (-5.0, 0.0, 10.0):
        vals = []
        for t in range(4):
            sd = StreamingDemodulator(CFG)
            iq = _packet_at_snr(snr, seed=100 + t)
            pkts = sd.feed(to_ri(iq))
            vals += [snr_db_estimate(r, CFG) for r in sd.snr_ratios]
            pkts += sd.flush()     # snr_ratios is per-call: collect again
            vals += [snr_db_estimate(r, CFG) for r in sd.snr_ratios]
            assert pkts, snr
        est[snr] = float(np.mean(vals))
    # Monotone and within a few dB of truth (saturates at high SNR where
    # the "noise floor" becomes the chirp's own spectral leakage).
    assert est[-5.0] < est[0.0] < est[10.0], est
    assert abs(est[-5.0] - (-5.0)) < 4.0, est
    assert abs(est[0.0] - 0.0) < 4.0, est


def test_snr_surfaces_in_receivers():
    from gr_lora_tpu.dist.multi_sf import MultiSFReceiver

    iq = _packet_at_snr(5.0)
    rx = MultiSFReceiver(CFG.replace(explicit_header=False), sfs=(8,),
                         num_samples=len(iq))
    pkts = rx(np.stack([iq.real, iq.imag], -1).astype(np.float32)[None])
    assert pkts and pkts[0].snr_ratio > 0.0
    db = snr_db_estimate(pkts[0].snr_ratio, CFG)
    assert -10.0 < db < 20.0, db
