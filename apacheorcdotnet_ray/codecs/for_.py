"""Standalone frame-of-reference codec.

Generalizes the PATCHED_BASE frame-of-reference idea of the reference
(IntegerRunLengthEncodingV2Writer.cs:312-415) into a simple whole-chunk codec:
subtract the minimum, bit-pack the residuals at their exact maximum width.
Wins over RLEv2 DIRECT when values are clustered in a narrow range far from
zero (RLEv2 only frame-shifts inside PATCHED_BASE windows).

Layout: varint_signed(min) | varint(width) | varint(count) | bitpacked residuals.
"""

from __future__ import annotations

import numpy as np

from .bitpack import (
    I64,
    U64,
    bit_widths,
    pack_bits,
    read_varint_signed,
    read_varint_unsigned,
    subtraction_would_overflow,
    unpack_bits,
    write_varint_signed,
    write_varint_unsigned,
)


def encode(values: np.ndarray) -> bytes | None:
    """Returns None when FoR can't represent the chunk (range overflow)."""
    v = np.ascontiguousarray(values, dtype=I64)
    out = bytearray()
    if len(v) == 0:
        write_varint_signed(out, 0)
        write_varint_unsigned(out, 0)
        write_varint_unsigned(out, 0)
        return bytes(out)
    minv = int(v.min())
    if subtraction_would_overflow(int(v.max()), minv):
        return None
    with np.errstate(over="ignore"):
        reduced = (v - np.int64(minv)).view(U64)
    width = int(bit_widths(reduced).max())
    if width == 0:
        width = 1
    write_varint_signed(out, minv)
    write_varint_unsigned(out, width)
    write_varint_unsigned(out, len(v))
    out.extend(pack_bits(reduced, width))
    return bytes(out)


def decode(buf: bytes) -> np.ndarray:
    minv, pos = read_varint_signed(buf, 0)
    width, pos = read_varint_unsigned(buf, pos)
    count, pos = read_varint_unsigned(buf, pos)
    if count == 0:
        return np.empty(0, dtype=I64)
    reduced, consumed = unpack_bits(buf, int(width), int(count), pos)
    with np.errstate(over="ignore"):
        return reduced.view(I64) + np.int64(minv)
