"""Bit-level primitives for the ORC-style lightweight codecs.

Vectorized (NumPy) reimplementation of the bit-twiddling utilities of the
reference engine (``/root/reference/src/ApacheOrcDotNet/Encodings/BitManipulation.cs``):
zigzag, MSB-first bit-packing at arbitrary widths, LEB128 varints, big-endian
fixed-width longs, the direct-width tables (1-24,26,28,30,32,40,48,56,64) and
bit-width histograms / percentile widths that drive codec selection.

All functions operate on whole NumPy arrays (no per-value Python loops on hot
paths) and are bit-exact with the reference: the golden byte vectors from
``BitManipulation_Test.cs`` are ported to ``tests/test_bitpack.py``.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
I64 = np.int64
_MASK64 = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------------------
# zigzag


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """(v << 1) ^ (v >> 63) on int64 with wraparound; returns int64 bit pattern.

    Reference: BitManipulation.cs:69-72.
    """
    v = np.asarray(values, dtype=I64)
    with np.errstate(over="ignore"):
        return (v << np.int64(1)) ^ (v >> np.int64(63))


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """Inverse of zigzag_encode. Reference: BitManipulation.cs:64-67."""
    v = np.asarray(values, dtype=I64)
    u = v.view(U64) >> np.uint64(1)
    with np.errstate(over="ignore"):
        return u.view(I64) ^ -(v & np.int64(1))


def zigzag_encode_scalar(value: int) -> int:
    """Scalar zigzag on Python ints with 64-bit wrap; returns uint64 pattern."""
    value &= _MASK64
    sign = (value >> 63) & 1
    return (((value << 1) & _MASK64) ^ (_MASK64 if sign else 0)) & _MASK64


def zigzag_decode_scalar(value: int) -> int:
    """Scalar inverse zigzag; value is a uint64 pattern, result a signed int."""
    value &= _MASK64
    res = (value >> 1) ^ -(value & 1)
    # convert to signed 64
    res &= _MASK64
    return res - (1 << 64) if res >> 63 else res


# ---------------------------------------------------------------------------
# bit widths

_BYTE_BITLEN = np.array([b.bit_length() for b in range(256)], dtype=np.int64)


def bit_widths(values: np.ndarray) -> np.ndarray:
    """Number of significant bits per value (0 for 0), on uint64 views.

    Vectorized equivalent of BitManipulation.NumBits (BitManipulation.cs:148-157):
    locate the highest non-zero byte, then table-look-up its bit length.
    """
    v = np.ascontiguousarray(np.asarray(values).view(U64))
    b = v.view(np.uint8).reshape(-1, 8)  # little-endian byte lanes
    rev_nz = b[:, ::-1] != 0
    hi = 7 - rev_nz.argmax(axis=1)  # index of highest non-zero byte (0 if all zero)
    w = hi * 8 + _BYTE_BITLEN[b[np.arange(len(v)), hi]]
    if not rev_nz[:, -1].all():  # argmax on all-False rows points at byte 7
        w[~rev_nz.any(axis=1)] = 0
    return w


def num_bits(value: int) -> int:
    """Scalar NumBits on a uint64 pattern."""
    return int(value & _MASK64).bit_length()


# Direct-width tables (BitManipulation.cs:79-113,159-207)
_DECODE_DIRECT = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


def decode_direct_width(encoded: int) -> int:
    return _DECODE_DIRECT[encoded]


def encode_direct_width(bits: int) -> int:
    if bits <= 24:
        return bits - 1
    return {26: 24, 28: 25, 30: 26, 32: 27, 40: 28, 48: 29, 56: 30, 64: 31}[bits]


def find_nearest_direct_width(bits: int) -> int:
    if bits == 0:
        return 1
    if bits <= 24:
        return bits
    for w in (26, 28, 30, 32, 40, 48, 56):
        if bits <= w:
            return w
    return 64


def find_nearest_aligned_direct_width(bits: int) -> int:
    for w in (1, 2, 4, 8, 16, 24, 32, 40, 48, 56):
        if bits <= w:
            return w
    return 64


# vectorized nearest-direct-width lookup tables: index by exact bit count 0..64
_NEAREST_TABLE = np.array([find_nearest_direct_width(b) for b in range(65)], dtype=np.int64)
_ALIGNED_TABLE = np.array(
    [find_nearest_aligned_direct_width(b) for b in range(65)], dtype=np.int64
)
_ENCODED_OF_NEAREST = np.array(
    [encode_direct_width(find_nearest_direct_width(b)) for b in range(65)], dtype=np.int64
)


def histogram_of_bit_widths(values: np.ndarray) -> tuple[int, np.ndarray]:
    """(total, 32-bucket histogram of encoded nearest direct widths).

    Reference: BitManipulation.GenerateHistogramOfBitWidths (cs:115-129).
    """
    bw = bit_widths(values)
    enc = _ENCODED_OF_NEAREST[bw]
    hist = np.bincount(enc, minlength=32)
    return len(bw), hist


def bits_for_percentile(total: int, hist: np.ndarray, percentile: float) -> int:
    """Reference: BitManipulation.GetBitsRequiredForPercentile (cs:131-146)."""
    num_to_drop = int(total * (1.0 - percentile))
    for i in range(31, -1, -1):
        num_to_drop -= int(hist[i])
        if num_to_drop < 0:
            return decode_direct_width(i)
    return 0


def subtraction_would_overflow(left: int, right: int) -> bool:
    """64-bit signed overflow check for left-right (BitManipulation.cs:427-431)."""

    def wrap(x: int) -> int:
        x &= _MASK64
        return x - (1 << 64) if x >> 63 else x

    diff = wrap(left - right)
    no_overflow = (left ^ right) >= 0 or (left ^ diff) >= 0
    return not no_overflow


# ---------------------------------------------------------------------------
# MSB-first bit packing (BitManipulation.cs:209-264)


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """MSB-first bit-pack each value's low `width` bits; final byte zero-padded."""
    if width == 8:
        return np.asarray(values).view(U64).astype(np.uint8).tobytes()
    v = np.ascontiguousarray(np.asarray(values).view(U64), dtype=U64)
    be = v.astype(">u8")
    bits = np.unpackbits(be.view(np.uint8).reshape(-1, 8), axis=1)[:, 64 - width:]
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(buf, width: int, count: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Read `count` MSB-first `width`-bit integers from buf starting at byte
    `offset`. Returns (uint64 array, bytes consumed)."""
    nbytes = (count * width + 7) // 8
    if count == 0:
        return np.empty(0, dtype=U64), 0
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=offset)
    if width == 8:
        return raw.astype(U64), nbytes
    bits = np.unpackbits(raw)[: count * width].reshape(count, width)
    out = np.zeros((count, 64), dtype=np.uint8)
    out[:, 64 - width:] = bits
    packed = np.packbits(out, axis=1)
    return np.ascontiguousarray(packed).view(">u8").ravel().astype(U64), nbytes


# ---------------------------------------------------------------------------
# LEB128 varints (BitManipulation.cs:266-311) — scalar versions for headers


def write_varint_unsigned(out: bytearray, value: int) -> None:
    value &= _MASK64
    while True:
        if value & ~0x7F == 0:
            out.append(value)
            return
        out.append((value & 0x7F) | 0x80)
        value >>= 7


def write_varint_signed(out: bytearray, value: int) -> None:
    write_varint_unsigned(out, zigzag_encode_scalar(value))


def read_varint_unsigned(buf, pos: int) -> tuple[int, int]:
    """Returns (value as signed int64 per C# semantics, new position)."""
    result = 0
    bit_count = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << bit_count
        bit_count += 7
        if b < 0x80:
            break
    result &= _MASK64
    if result >> 63:
        result -= 1 << 64
    return result, pos


def read_varint_signed(buf, pos: int) -> tuple[int, int]:
    v, pos = read_varint_unsigned(buf, pos)
    return zigzag_decode_scalar(v & _MASK64), pos


# ---------------------------------------------------------------------------
# big-endian fixed-width longs (BitManipulation.cs:20-29,55-62)


def write_long_be(out: bytearray, num_bytes: int, value: int) -> None:
    value &= _MASK64
    for i in range(num_bytes - 1, -1, -1):
        out.append((value >> (i * 8)) & 0xFF)


def read_long_be(buf, pos: int, num_bytes: int) -> tuple[int, int]:
    result = 0
    for i in range(num_bytes):
        result = (result << 8) | buf[pos + i]
    return result, pos + num_bytes
