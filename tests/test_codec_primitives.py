"""Golden-vector tests for the bit-level codec primitives.

Golden values come from the reference repo's README PDUs (README.md:26-42)
and the published whitening table (include/lora/lora.h:30) — pinned here as
data so the suite is self-contained.
"""

import hashlib

import numpy as np
import pytest

from gr_lora_tpu.core import (
    WHITENING_SEQUENCE,
    calc_sym_num,
    data_checksum,
    deinterleave,
    from_gray,
    gen_header_nibbles,
    hamming_decode,
    hamming_encode,
    header_checksum,
    interleave,
    parse_header_nibbles,
    to_gray,
    whiten_rx,
    whiten_tx,
)


def test_whitening_sequence_matches_reference_table():
    # SHA256 of the 255-byte table from include/lora/lora.h:30.
    assert len(WHITENING_SEQUENCE) == 255
    assert WHITENING_SEQUENCE[:8].tolist() == [0xFF, 0xFE, 0xFC, 0xF8, 0xF0, 0xE1, 0xC2, 0x85]
    assert WHITENING_SEQUENCE[-4:].tolist() == [0x4F, 0x9F, 0x3F, 0x7F]
    digest = hashlib.sha256(WHITENING_SEQUENCE.tobytes()).hexdigest()
    assert digest == hashlib.sha256(bytes(_REFERENCE_TABLE)).hexdigest()


# Spot sample of the reference table for the hash cross-check (lora.h:30).
_REFERENCE_TABLE = [
    0xFF, 0xFE, 0xFC, 0xF8, 0xF0, 0xE1, 0xC2, 0x85, 0x0B, 0x17, 0x2F, 0x5E,
    0xBC, 0x78, 0xF1, 0xE3, 0xC6, 0x8D, 0x1A, 0x34, 0x68, 0xD0, 0xA0, 0x40,
    0x80, 0x01, 0x02, 0x04, 0x08, 0x11, 0x23, 0x47, 0x8E, 0x1C, 0x38, 0x71,
    0xE2, 0xC4, 0x89, 0x12, 0x25, 0x4B, 0x97, 0x2E, 0x5C, 0xB8, 0x70, 0xE0,
    0xC0, 0x81, 0x03, 0x06, 0x0C, 0x19, 0x32, 0x64, 0xC9, 0x92, 0x24, 0x49,
    0x93, 0x26, 0x4D, 0x9B, 0x37, 0x6E, 0xDC, 0xB9, 0x72, 0xE4, 0xC8, 0x90,
    0x20, 0x41, 0x82, 0x05, 0x0A, 0x15, 0x2B, 0x56, 0xAD, 0x5B, 0xB6, 0x6D,
    0xDA, 0xB5, 0x6B, 0xD6, 0xAC, 0x59, 0xB2, 0x65, 0xCB, 0x96, 0x2C, 0x58,
    0xB0, 0x61, 0xC3, 0x87, 0x0F, 0x1F, 0x3E, 0x7D, 0xFB, 0xF6, 0xED, 0xDB,
    0xB7, 0x6F, 0xDE, 0xBD, 0x7A, 0xF5, 0xEB, 0xD7, 0xAE, 0x5D, 0xBA, 0x74,
    0xE8, 0xD1, 0xA2, 0x44, 0x88, 0x10, 0x21, 0x43, 0x86, 0x0D, 0x1B, 0x36,
    0x6C, 0xD8, 0xB1, 0x63, 0xC7, 0x8F, 0x1E, 0x3C, 0x79, 0xF3, 0xE7, 0xCE,
    0x9C, 0x39, 0x73, 0xE6, 0xCC, 0x98, 0x31, 0x62, 0xC5, 0x8B, 0x16, 0x2D,
    0x5A, 0xB4, 0x69, 0xD2, 0xA4, 0x48, 0x91, 0x22, 0x45, 0x8A, 0x14, 0x29,
    0x52, 0xA5, 0x4A, 0x95, 0x2A, 0x54, 0xA9, 0x53, 0xA7, 0x4E, 0x9D, 0x3B,
    0x77, 0xEE, 0xDD, 0xBB, 0x76, 0xEC, 0xD9, 0xB3, 0x67, 0xCF, 0x9E, 0x3D,
    0x7B, 0xF7, 0xEF, 0xDF, 0xBF, 0x7E, 0xFD, 0xFA, 0xF4, 0xE9, 0xD3, 0xA6,
    0x4C, 0x99, 0x33, 0x66, 0xCD, 0x9A, 0x35, 0x6A, 0xD4, 0xA8, 0x51, 0xA3,
    0x46, 0x8C, 0x18, 0x30, 0x60, 0xC1, 0x83, 0x07, 0x0E, 0x1D, 0x3A, 0x75,
    0xEA, 0xD5, 0xAA, 0x55, 0xAB, 0x57, 0xAF, 0x5F, 0xBE, 0x7C, 0xF9, 0xF2,
    0xE5, 0xCA, 0x94, 0x28, 0x50, 0xA1, 0x42, 0x84, 0x09, 0x13, 0x27, 0x4F,
    0x9F, 0x3F, 0x7F,
]


def test_data_checksum_readme_goldens():
    # README.md:30-38 — payload `01..06` has CRC bytes 05 08 (little-endian),
    # payload `07 x5` has CRC bytes e7 6b.
    assert data_checksum(np.array([1, 2, 3, 4, 5, 6], np.uint8), 6) == 0x0805
    assert data_checksum(np.array([7, 7, 7, 7, 7], np.uint8), 5) == 0x6BE7


def test_header_checksum_readme_goldens():
    # README PDU #1: header bytes 06 30 f0 -> len 6, cr_crc 3, checksum 0x0f.
    assert header_checksum(6, 3) == 0x0F
    # README PDU #2: header bytes 05 30 00 -> len 5, cr_crc 3, checksum 0x00.
    assert header_checksum(5, 3) == 0x00


def test_header_nibbles_roundtrip():
    for length in (0, 5, 6, 23, 255):
        for cr in (1, 2, 3, 4):
            for crc in (False, True):
                nib = gen_header_nibbles(length, cr, crc)
                info = parse_header_nibbles(nib)
                assert info.is_valid
                assert info.payload_len == length
                assert info.cr == cr
                assert info.crc == crc
    bad = gen_header_nibbles(10, 1, True)
    bad[0] ^= 1
    assert not parse_header_nibbles(bad).is_valid


def test_gray_roundtrip():
    v = np.arange(4096, dtype=np.uint16)
    assert np.array_equal(from_gray(to_gray(v)), v)
    assert np.array_equal(to_gray(np.array([0, 1, 2, 3], np.uint16)),
                          np.array([0, 1, 3, 2], np.uint16))


@pytest.mark.parametrize("sf", range(6, 13))
@pytest.mark.parametrize("cr", range(1, 5))
def test_hamming_roundtrip_and_correction(sf, cr):
    rng = np.random.default_rng(sf * 10 + cr)
    nibbles = rng.integers(0, 16, size=64, dtype=np.uint8)
    cw = hamming_encode(nibbles, sf, cr)
    assert np.array_equal(hamming_decode(cw.copy(), sf, cr), nibbles)

    # Single data-bit error correction for CR 4/7 and 4/8 codewords.
    if cr > 2:
        for bit in range(4):
            bit_mask = {0: 0x08, 1: 0x04, 2: 0x01, 3: 0x02}  # d1 d2 d3 d4 positions
            corrupted = cw.copy()
            corrupted[8] ^= bit_mask[bit]
            decoded = hamming_decode(corrupted, sf, cr)
            assert decoded[8] == nibbles[8], f"bit {bit} not corrected"


@pytest.mark.parametrize("sf", range(6, 13))
@pytest.mark.parametrize("cr", range(1, 5))
@pytest.mark.parametrize("ldr", [False, True])
def test_interleaver_roundtrip(sf, cr, ldr):
    rng = np.random.default_rng(sf * 100 + cr * 10 + ldr)
    ppm_first, ppm_rest = sf - 2, sf - 2 * int(ldr)
    n_blocks = 3
    cw = rng.integers(0, 256, size=ppm_first + n_blocks * ppm_rest, dtype=np.uint8)
    # Mask to the bit widths actually carried per block.
    cw[:ppm_first] &= 0xFF
    cw[ppm_first:] &= (1 << (cr + 4)) - 1

    syms = interleave(cw, sf, cr, ldr)
    assert len(syms) == 8 + n_blocks * (cr + 4)

    hdr = deinterleave(syms[:8], ppm_first, 4)
    rest = deinterleave(syms[8:], ppm_rest, cr)
    assert np.array_equal(hdr, cw[:ppm_first])
    assert np.array_equal(rest, cw[ppm_first:])


def test_whitening_roundtrip():
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, size=32, dtype=np.uint8)
    # TX whitens only the first payload_len bytes.
    tx = whiten_tx(payload, 30)
    assert np.array_equal(tx[30:], payload[30:])
    # RX with no header and no CRC undoes the full prefix.
    assert np.array_equal(whiten_rx(tx, False, False)[:30], payload[:30])


def test_calc_sym_num_reference_formula():
    # txrx_sim config: SF8, CR4, implicit header, LDR on, CRC on.
    assert calc_sym_num(8, sf=8, cr=4, crc=True, ldr=True, explicit_header=False) == \
        8 + 8 * int(np.ceil((16 - 8 + 7 + 4 - 5) / 6))
    # Degenerate tiny payload must clamp at 8 symbols.
    assert calc_sym_num(0, sf=12, cr=1, crc=False, ldr=False, explicit_header=False) == 8
