"""CLI apps: tx_file -> rx_file / rx_file_collision round trip, txrx_sim,
UDP PDU service, whitening consensus."""

import socket
import threading

import numpy as np
import pytest

from gr_lora_tpu.apps import rx_file, rx_file_collision, tx_file, txrx_sim
from gr_lora_tpu.apps.whitening_consensus import consensus

PDU_1 = "0630f0010203040506050801"


def test_tx_rx_file_roundtrip(tmp_path, capsys):
    cap = tmp_path / "single.cf64"
    assert tx_file.main([str(cap), "--payload", "010203040506",
                         "--amplitude", "0.3"]) == 0
    capsys.readouterr()
    assert rx_file.main([str(cap)]) == 0
    out = capsys.readouterr().out
    assert "06 30 f0 01 02 03 04 05 06 05 08 01" in out


def test_tx_rx_collision_roundtrip(tmp_path, capsys):
    cap = tmp_path / "collision.cf64"
    assert tx_file.main([
        str(cap),
        "--payload", "010203040506", "--payload", "0707070707",
        "--offset", "0", "--offset", "19.72265625",   # 5049/256 samples
        "--amplitude", "0.25", "--amplitude", "0.12",
    ]) == 0
    capsys.readouterr()
    assert rx_file_collision.main([str(cap)]) == 0
    out = capsys.readouterr().out
    assert "07 07 07 07 07" in out          # weak packet payload recovered


def test_txrx_sim_cli(capsys):
    assert txrx_sim.main(["--payload", "0102030405"]) == 0
    out = capsys.readouterr().out
    assert "01 02 03 04 05" in out


def test_txrx_sim_udp(capsys):
    port_in, port_out = 55101, 55102
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", port_out))
    rx.settimeout(120)

    t = threading.Thread(target=txrx_sim.main, args=(
        ["--udp", "--udp-in", str(port_in), "--udp-out", str(port_out),
         "--count", "1"],))
    t.start()
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        import time
        time.sleep(0.2)
        tx.sendto(bytes([9, 8, 7]), ("127.0.0.1", port_in))
        data, _ = rx.recvfrom(65536)
        assert bytes([9, 8, 7]) == data[:3]
    finally:
        t.join(timeout=120)
        rx.close()


def test_whitening_consensus():
    true = bytes([0xFF, 0x12, 0x34, 0x56])
    obs = [bytearray(true) for _ in range(5)]
    obs[0][1] ^= 0x40            # minority bit errors
    obs[3][2] ^= 0x01
    assert consensus([bytes(o) for o in obs]) == true


def test_rx_stream_cli(tmp_path, capsys):
    """Streaming CLI over a demod-rate capture."""
    import numpy as np

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.apps import rx_stream
    from gr_lora_tpu.core.codec import encode
    from gr_lora_tpu.models.modulator import modulate

    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True,
                     payload_len=8, p=2, fft_factor=8)
    iq = modulate(encode(bytes([1, 2, 3, 4, 5, 6]), cfg), cfg)
    path = tmp_path / "stream.cf64"
    np.asarray(0.5 * iq, np.complex64).tofile(path)
    assert rx_stream.main([str(path), "--chunk", "4096"]) == 0
    out = capsys.readouterr().out
    assert "06 30 f0 01 02 03 04 05 06 05 08 01" in out


def test_plot_per_renders_svg(tmp_path):
    import json

    from gr_lora_tpu.apps.plot_per import render

    art = {"device": "cpu", "p": 2, "precision": "default", "curves": {
        f"sf{sf}_{kind}": {"snr_db": [-12.0, -8.0, -4.0],
                           "per": [1.0, 0.5, 0.0], "trials": 4,
                           "waterfall_db": -8.0}
        for sf in (7, 8) for kind in ("plain", "weak")}}
    svg = render(art)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("SF7") == 1 and svg.count("SF8") == 1
    assert "plain FSM" in svg and "weak demod" in svg


def test_plot_collision_renders_svg():
    from gr_lora_tpu.apps.plot_collision import render

    art = {"device": "cpu", "sf": 8, "p": 2, "fft_factor": 8, "grid": {
        g: {f"{kind}_r0.45": {"trials": 4, "strong": 4, "both": b}
            for kind, b in (("phase", 2), ("depth", 1), ("aligned", 0))}
        for g, b0 in (("grace0", 1), ("grace8", 2))}}
    svg = render(art)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "grace mode" in svg and "reference-exact" in svg
