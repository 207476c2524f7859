"""Streaming receiver: demodulate an unbounded IQ stream incrementally.

    # from a growing capture file or a fifo:
    python -m gr_lora_tpu.apps.rx_stream capture.cf64 --samp-rate 250e3

    # from stdin (e.g. an SDR tool piping complex64):
    some_sdr_rx | python -m gr_lora_tpu.apps.rx_stream - --samp-rate 250e3

Unlike rx_file (whole-capture replay), this uses the carried-state
streaming FSM (StreamingDemodulator): packets are reported as soon as they
complete, chunk boundaries are invisible, and memory stays O(block).  Input
must already be at the demod rate fs = p * bw (use rx_file for raw captures
needing the LPF/resampler front-end).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .common import add_config_args, config_from_args, print_pdu


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source", help="raw complex64 stream ('-' for stdin)")
    ap.add_argument("--samp-rate", type=float, default=250e3,
                    help="stream rate; must equal p*bw")
    ap.add_argument("--chunk", type=int, default=1 << 16,
                    help="samples per read")
    ap.add_argument("--no-ring", action="store_true",
                    help="disable the threaded native ring-buffer ingest "
                         "(synchronous reads instead)")
    add_config_args(ap)
    args = ap.parse_args(argv)
    cfg = config_from_args(args)
    if abs(args.samp_rate - cfg.p * args.bw) > 1e-6:
        print(f"warning: samp_rate {args.samp_rate} != p*bw "
              f"{cfg.p * args.bw}; resample first (see rx_file)",
              file=sys.stderr)

    from ..core.codec import decode
    from ..models.demodulator import StreamingDemodulator

    stream = sys.stdin.buffer if args.source == "-" else open(args.source, "rb")

    from .. import native
    if not args.no_ring and native.available():
        # Product path: producer thread -> lock-free ring -> pipelined
        # device blocks (pipeline/ingest.py).
        from ..pipeline.ingest import stream_demodulate

        found = 0

        def on_packet(pos, syms):
            nonlocal found
            res = decode(syms, cfg)
            if res.ok:
                print_pdu(bytes(res.payload), prefix=f"pdu @{pos}")
                found += 1

        try:
            stream_demodulate(cfg, stream, on_packet)
        finally:
            if stream is not sys.stdin.buffer:
                stream.close()
        return 0 if found else 1

    sd = StreamingDemodulator(cfg)
    found = 0
    try:
        while True:
            raw = stream.read(args.chunk * 8)   # complex64 = 8 bytes
            if not raw:
                break
            usable = len(raw) - (len(raw) % 8)
            if not usable:
                break
            iq = np.frombuffer(raw[:usable], np.complex64)
            for pos, syms in sd.feed(iq):
                res = decode(syms, cfg)
                if res.ok:
                    print_pdu(bytes(res.payload), prefix=f"pdu @{pos}")
                    found += 1
        for pos, syms in sd.flush():
            res = decode(syms, cfg)
            if res.ok:
                print_pdu(bytes(res.payload), prefix=f"pdu @{pos}")
                found += 1
    finally:
        if stream is not sys.stdin.buffer:
            stream.close()
    return 0 if found else 1


if __name__ == "__main__":
    raise SystemExit(main())
