"""Multi-SF reception: demodulate every spreading factor on every channel.

A LoRa gateway must listen for all spreading factors simultaneously on each
frequency channel — LoRa SFs are quasi-orthogonal, so one IQ stream is fed
to one demodulator per SF and each finds only its own packets.  The
reference can only instantiate one demod per flowgraph (README.md:45 TODO
"Decoding multiple channels simultaneously"); here the SF axis is just
another batch loop of jitted programs, and the channel axis is vmapped
inside each.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from ..config import LoraConfig
from ..core.codec import DecodeResult, decode
from ..models.demodulator import demod_fn


@dataclass
class SfPacket:
    channel: int
    sf: int
    position: int
    symbols: np.ndarray
    result: DecodeResult
    #: Peak/mean detection ratio (models.demodulator.snr_db_estimate).
    snr_ratio: float = 0.0


class MultiSFReceiver:
    """Demodulate [channels, T] IQ at several spreading factors at once.

    One jitted vmapped demodulator per SF (shapes differ per SF, so the SF
    axis is a Python loop over compiled programs; the channel axis is
    vmapped inside each).
    """

    def __init__(self, base: LoraConfig, sfs=(7, 8, 9, 10, 11, 12),
                 num_samples: int | None = None, max_packets: int = 4,
                 bw: float = 125e3):
        self.cfgs = {}
        for sf in sfs:
            ldr = (1 << sf) / bw > 16e-3   # SX127x LDR rule (rx_file.grc)
            self.cfgs[sf] = base.replace(sf=sf, ldr=ldr)
        self.max_packets = max_packets
        self._fns: dict[int, object] = {}
        self._num_samples = num_samples
        #: Packets lost to slot overflow (raise max_packets if nonzero).
        self.dropped = 0

    def _fn(self, sf: int, total: int):
        key = (sf, total)
        if key not in self._fns:
            self._fns[key] = jax.jit(
                jax.vmap(demod_fn(self.cfgs[sf], total, self.max_packets)))
        return self._fns[key]

    def __call__(self, iq) -> list[SfPacket]:
        if np.iscomplexobj(iq):
            iq = np.stack([np.asarray(iq).real, np.asarray(iq).imag], -1)
        iq = np.asarray(iq, np.float32)
        if iq.ndim == 2:
            iq = iq[None]
        total = iq.shape[1]
        out: list[SfPacket] = []
        for sf, cfg in self.cfgs.items():
            syms, lens, pos, cnt, dropped, snr = (
                np.asarray(x) for x in jax.device_get(self._fn(sf, total)(iq)))
            self.dropped += int(np.sum(dropped))
            for c in range(iq.shape[0]):
                for r in range(int(cnt[c])):
                    s = syms[c, r, :lens[c, r]].copy()
                    res = decode(s, cfg)
                    if res.ok:
                        out.append(SfPacket(c, sf, int(pos[c, r]), s, res,
                                            float(snr[c, r])))
        out.sort(key=lambda p: (p.channel, p.position))
        return out
