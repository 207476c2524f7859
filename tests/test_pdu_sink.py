"""PDU sink: gateway outputs fan out to callbacks and UDP."""

import socket

import numpy as np

import jax

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.dist.gateway import gateway_receive, make_gateway, make_mesh, right_halo_len
from gr_lora_tpu.dist.pdu_sink import PduEvent, PduSink
from gr_lora_tpu.models.modulator import modulate
from gr_lora_tpu.ops.cplx import to_ri

CFG = LoraConfig(sf=7, cr=2, crc=True, ldr=False, explicit_header=False,
                 payload_len=4, p=2, fft_factor=2)
PAYLOAD = bytes([0xDE, 0xAD, 0xBE, 0xEF])


def test_sink_from_sharded_gateway_to_udp():
    nt = 2
    mesh = make_mesh(1, nt, devices=jax.devices()[:nt])
    pkt = to_ri(modulate(encode(PAYLOAD, CFG), CFG, pad_front=0, pad_back=0))
    block_len = max(right_halo_len(CFG), 3 * len(pkt))
    iq = np.zeros((1, nt * block_len, 2), np.float32)
    iq[0, 500:500 + len(pkt)] = pkt
    plan = make_gateway(CFG, mesh, 1, block_len, max_packets=4)
    packets = gateway_receive(plan, iq, CFG)

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(10)
    port = rx.getsockname()[1]

    got = []
    sink = PduSink(udp=("127.0.0.1", port), callback=got.append)
    n = sink.drain_gateway(packets, CFG)
    sink.close()

    assert n == 1 and len(got) == 1
    ev = got[0]
    assert ev.payload[:4] == PAYLOAD and ev.crc_ok
    data, _ = rx.recvfrom(65536)
    rx.close()
    assert data == ev.to_wire()
    assert data[0] == 0 and data[1] == CFG.sf
    assert int.from_bytes(data[2:6], "little") == ev.position
    assert data[6:10] == PAYLOAD


def test_sink_crc_filter():
    sink = PduSink(crc_filter=True)
    sink.emit(PduEvent(0, 7, 0, b"bad", False))
    sink.emit(PduEvent(0, 7, 0, b"good", True))
    sink.emit(PduEvent(0, 7, 0, b"nocrc", None))
    assert [e.payload for e in sink.events] == [b"good", b"nocrc"]
