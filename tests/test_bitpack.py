"""Bit/byte primitive golden vectors, ported from BitManipulation_Test.cs."""

import numpy as np
import pytest

from apacheorcdotnet_ray.codecs import bitpack


def bitstring_to_bytes(bits: str) -> bytes:
    # mirrors BitStringToByteArray (BitManipulation_Test.cs:186-210)
    out = bytearray()
    cur = 0
    count = 0
    for c in bits:
        if c not in "01":
            continue
        cur = (cur << 1) | (c == "1")
        count += 1
        if count == 8:
            out.append(cur)
            cur = count = 0
    if count:
        out.append(cur << (8 - count))
    return bytes(out)


CASES = [
    ([1, 0, 1, 1, 0], "1 0 1 1 0", 1),
    ([0, 1, 2, 3, 0, 1, 2, 3], "00 01 10 11 00 01 10 11", 2),
    ([0, 1, 2, 3, 4, 5, 6, 7], "000 001 010 011 100 101 110 111", 3),
    ([0, 1, 2, 4, 8, 15], "0000 0001 0010 0100 1000 1111", 4),
    ([0, 1, 2, 4, 8, 16, 31], "00000 00001 00010 00100 01000 10000 11111", 5),
    ([0, 1, 2, 4, 8, 16, 32, 63],
     "000000 000001 000010 000100 001000 010000 100000 111111", 6),
    ([0, 1, 2, 4, 8, 16, 32, 64, 127],
     "0000000 0000001 0000010 0000100 0001000 0010000 0100000 1000000 1111111", 7),
    ([0, 1, 2, 4, 8, 16, 32, 64, 128, 255],
     "00000000 00000001 00000010 00000100 00001000 00010000 00100000 01000000 10000000 11111111", 8),
    ([0, 511, 0], "000000000 111111111 000000000", 9),
    ([0, 1023, 0], "0000000000 1111111111 0000000000", 10),
    ([0, 131071, 0], "0 " * 17 + "1 " * 17 + "0 " * 17, 17),
    ([0, 8589934591, 0], "0 " * 33 + "1 " * 33 + "0 " * 33, 33),
    ([0, -1, 0], "0 " * 64 + "1 " * 64 + "0 " * 64, 64),
]


@pytest.mark.parametrize("expected,bits,width", CASES)
def test_bitpack_golden(expected, bits, width):
    data = bitstring_to_bytes(bits)
    vals, consumed = bitpack.unpack_bits(data, width, len(expected))
    assert consumed == len(data)
    assert vals.view(np.int64).tolist() == expected
    packed = bitpack.pack_bits(np.array(expected, dtype=np.int64).view(np.uint64), width)
    assert packed == data


def test_varint_unsigned_golden():
    # BitManipulation_Test.cs:210-232
    table = {
        0: bytes([0x00]), 1: bytes([0x01]), 127: bytes([0x7F]),
        128: bytes([0x80, 0x01]), 129: bytes([0x81, 0x01]),
        16383: bytes([0xFF, 0x7F]), 16384: bytes([0x80, 0x80, 0x01]),
        16385: bytes([0x81, 0x80, 0x01]),
    }
    for value, data in table.items():
        got, pos = bitpack.read_varint_unsigned(data, 0)
        assert (got, pos) == (value, len(data))
        out = bytearray()
        bitpack.write_varint_unsigned(out, value)
        assert bytes(out) == data


@pytest.mark.parametrize("v", [0, 1000, -1000, 10000, -10000, 100000, -100000,
                               2**31 - 1, -(2**31), 2**63 - 1, -(2**63)])
def test_varint_signed_roundtrip(v):
    out = bytearray()
    bitpack.write_varint_signed(out, v)
    got, pos = bitpack.read_varint_signed(bytes(out), 0)
    assert got == v and pos == len(out)


def test_zigzag_roundtrip():
    vals = np.array([0, 1, -1, 2, -2, 2**62, -(2**62), 2**63 - 1, -(2**63)], dtype=np.int64)
    assert np.array_equal(bitpack.zigzag_decode(bitpack.zigzag_encode(vals)), vals)
    # known mapping: 0→0, -1→1, 1→2, -2→3, 2→4
    assert bitpack.zigzag_encode(np.array([0, -1, 1, -2, 2], dtype=np.int64)).tolist() == [0, 1, 2, 3, 4]


def test_bit_widths():
    vals = np.array([0, 1, 2, 3, 4, 255, 256, 2**31, 2**63 - 1, -1], dtype=np.int64)
    assert bitpack.bit_widths(vals).tolist() == [0, 1, 2, 2, 3, 8, 9, 32, 63, 64]


def test_width_tables():
    for enc in range(32):
        w = bitpack.decode_direct_width(enc)
        assert bitpack.encode_direct_width(w) == enc
    assert bitpack.find_nearest_direct_width(0) == 1
    assert bitpack.find_nearest_direct_width(25) == 26
    assert bitpack.find_nearest_direct_width(33) == 40
    assert bitpack.find_nearest_aligned_direct_width(3) == 4
    assert bitpack.find_nearest_aligned_direct_width(9) == 16


def test_subtraction_overflow():
    assert bitpack.subtraction_would_overflow(2**63 - 1, 0) is False
    assert bitpack.subtraction_would_overflow(2**63 - 1, -1) is True
    assert bitpack.subtraction_would_overflow(2**63 - 1, -2) is True
    assert bitpack.subtraction_would_overflow(-(2**63), 1) is True
    assert bitpack.subtraction_would_overflow(100, 50) is False
