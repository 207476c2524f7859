"""encode->decode round-trip property tests over the full operating grid,
plus byte-exact reproduction of the README golden PDUs."""

import numpy as np
import pytest

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core import decode, decode_header, encode


def _roundtrip(cfg: LoraConfig, payload: bytes):
    syms = encode(payload, cfg)
    res = decode(syms, cfg)
    assert res.ok, res.reason
    offset = 3 if cfg.explicit_header else 0
    got = bytes(res.payload[offset:offset + len(payload)])
    assert got == payload
    if cfg.crc:
        assert res.crc_ok
        assert res.payload[-1] == 1
    if cfg.explicit_header:
        assert res.header is not None and res.header.is_valid
        assert res.header.payload_len == len(payload)
        assert res.header.cr == cfg.cr
        assert res.header.crc == cfg.crc
    return res


def test_readme_golden_pdu_1():
    """README.md:30-32 — payload 01..06, SF8 CR4/5 explicit header + CRC."""
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True)
    res = _roundtrip(cfg, bytes([1, 2, 3, 4, 5, 6]))
    assert bytes(res.payload) == bytes.fromhex("0630f001020304050605 0801".replace(" ", ""))


def test_readme_golden_pdu_2():
    """README.md:36-38 — payload 07 x5, SF8 CR4/5 explicit header + CRC."""
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True)
    res = _roundtrip(cfg, bytes([7, 7, 7, 7, 7]))
    assert bytes(res.payload) == bytes.fromhex("05300007070707 07e76b01".replace(" ", ""))


@pytest.mark.parametrize("sf", range(6, 13))
@pytest.mark.parametrize("cr", range(1, 5))
def test_roundtrip_sf_cr_grid(sf, cr):
    cfg = LoraConfig(sf=sf, cr=cr, crc=True, ldr=False, explicit_header=False,
                     payload_len=11)
    payload = bytes(range(11))
    syms = encode(payload, cfg)
    assert len(syms) == cfg.packet_symbol_len(11)
    _roundtrip(cfg, payload)


@pytest.mark.parametrize("ldr", [False, True])
@pytest.mark.parametrize("crc", [False, True])
@pytest.mark.parametrize("header", [False, True])
def test_roundtrip_mode_grid(ldr, crc, header):
    cfg = LoraConfig(sf=9, cr=2, crc=crc, ldr=ldr, explicit_header=header,
                     payload_len=17)
    _roundtrip(cfg, bytes((i * 7 + 3) % 256 for i in range(17)))


@pytest.mark.parametrize("n", [1, 2, 16, 64, 128])
def test_roundtrip_payload_lengths(n):
    cfg = LoraConfig(sf=10, cr=3, crc=True, ldr=True, explicit_header=True)
    _roundtrip(cfg, bytes((i * 31 + 1) % 256 for i in range(n)))


def test_roundtrip_random_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(50):
        sf = int(rng.integers(6, 13))
        header = bool(rng.integers(0, 2)) and sf != 6
        cfg = LoraConfig(
            sf=sf,
            cr=int(rng.integers(1, 5)),
            crc=bool(rng.integers(0, 2)),
            ldr=bool(rng.integers(0, 2)),
            explicit_header=header,
            payload_len=int(rng.integers(1, 60)),
        )
        payload = bytes(rng.integers(0, 256, size=cfg.payload_len, dtype=np.uint8))
        _roundtrip(cfg, payload)


def test_decode_header_matches_full_decode():
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True)
    syms = encode(bytes([9, 8, 7]), cfg)
    info = decode_header(syms[:8], cfg)
    assert info.is_valid and info.payload_len == 3 and info.cr == 1 and info.crc


def test_decode_rejects_corrupt_header():
    cfg = LoraConfig(sf=8, cr=1, crc=True, ldr=False, explicit_header=True)
    syms = encode(bytes([1, 2, 3]), cfg).copy()
    # A single-symbol hit is a 1-bit Gray error that Hamming(8,4) corrects;
    # smash several header symbols so the checksum cannot survive.
    for i, d in ((0, 64), (1, 128), (2, 32), (3, 192)):
        syms[i] = (syms[i] + d) % 256
    res = decode(syms, cfg)
    assert not res.ok


def test_max_payload_roundtrip():
    """255-byte payload (the wire-format maximum) across extreme SFs."""
    import numpy as np

    from gr_lora_tpu import LoraConfig
    from gr_lora_tpu.core.codec import decode, encode

    rng = np.random.default_rng(0)
    payload = bytes(rng.integers(0, 256, 255, dtype=np.uint8))
    for sf in (7, 12):
        cfg = LoraConfig(sf=sf, cr=4, crc=True, ldr=(sf == 12),
                         explicit_header=True, payload_len=255)
        res = decode(encode(payload, cfg), cfg)
        assert res.ok and res.crc_ok
        assert bytes(res.payload[3:3 + 255]) == payload
