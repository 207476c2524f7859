"""Multi-channel multi-SF gateway over a wideband capture.

    python -m gr_lora_tpu.apps.gateway wideband.cf64 --samp-rate 1e6 \
        --channels 8 --sfs 7,8,9

The full gateway pipeline on one stream: channelize (one packed matmul per
block) -> per-channel, per-SF demodulation (vmapped FSMs) -> decode ->
one PDU line per packet with channel / SF / position metadata.  This is the
BASELINE north-star configuration (N x 125 kHz channels x SF7-12) — the
reference is single-channel single-SF (its README.md:45 TODO).
"""

from __future__ import annotations

import argparse

import numpy as np

from .common import add_config_args, config_from_args, format_pdu, read_capture


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("capture", help="raw complex64 wideband IQ")
    ap.add_argument("--samp-rate", type=float, default=1e6)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--spacing", type=float, default=125e3)
    ap.add_argument("--sfs", type=str, default="7,8,9,10,11,12")
    ap.add_argument("--all", action="store_true",
                    help="emit CRC-failed PDUs too")
    add_config_args(ap)
    args = ap.parse_args(argv)
    base = config_from_args(args)
    sfs = tuple(int(s) for s in args.sfs.split(","))

    import jax

    from ..dist.multi_sf import MultiSFReceiver
    from ..pipeline.channelizer import channel_frequencies, channelize

    iq = read_capture(args.capture)
    iq_ri = np.stack([iq.real, iq.imag], -1).astype(np.float32)
    chans = np.ascontiguousarray(np.asarray(jax.device_get(
        channelize(iq_ri, args.channels, args.samp_rate, args.spacing,
                   p=base.p))))

    rx = MultiSFReceiver(base, sfs=sfs, bw=args.spacing)
    packets = rx(chans)
    if not args.all:
        # Adjacent-channel skirts of strong packets decode as corrupted
        # copies; CRC filters them (use --all for the raw PDU stream).
        packets = [p for p in packets if p.result.crc_ok is not False]

    # A LoRa signal fills its whole channel (spacing == bw, no guard band),
    # so a strong packet's spectral skirt can also decode on the adjacent
    # channels; like production gateways, dedupe identical decodes at the
    # same time by RSSI and keep the strongest channel.
    def rssi(p):
        n = (1 << p.sf) * base.p
        seg = chans[p.channel, p.position:p.position + 8 * n]
        return float(np.mean(seg ** 2)) if seg.size else 0.0

    best: dict = {}
    for p in packets:
        n = (1 << p.sf) * base.p
        key = (p.sf, bytes(p.result.payload),
               int(round(p.position / (4 * n))))
        if key not in best or rssi(p) > rssi(best[key]):
            best[key] = p
    packets = sorted(best.values(), key=lambda p: (p.position, p.channel))

    from ..models.demodulator import snr_db_estimate

    freqs = channel_frequencies(args.channels, args.spacing)
    for p in packets:
        snr = snr_db_estimate(p.snr_ratio, rx.cfgs[p.sf])
        print(f"ch={p.channel} f={freqs[p.channel] / 1e3:+.0f}kHz sf={p.sf} "
              f"@{p.position} snr={snr:+.1f}dB: "
              f"{format_pdu(bytes(p.result.payload))}")
    return 0 if packets else 1


if __name__ == "__main__":
    raise SystemExit(main())
