"""Vectorized LEB128 varint stream codec.

The Ray-native analog of the reference's decimal-mantissa stream codec
(``/root/reference/src/ApacheOrcDotNet/Encodings/VarIntWriter.cs:18-32`` /
``VarIntReader.cs:19-29``): one zigzag varint per value, concatenated.
Encode scatters each value's 7-bit groups with one vector op per group
position (<=10); decode reconstructs values with one ``np.add.reduceat``
over shifted 7-bit contributions — no per-value Python loops.
"""

from __future__ import annotations

import numpy as np

from .bitpack import I64, U64, bit_widths, zigzag_decode, zigzag_encode


def encode(values: np.ndarray, signed: bool = True) -> bytes:
    v = np.ascontiguousarray(values, dtype=I64)
    if len(v) == 0:
        return b""
    zz = (zigzag_encode(v) if signed else v).view(U64)
    nbytes = np.maximum((bit_widths(zz) + 6) // 7, 1)
    starts = np.concatenate([[0], np.cumsum(nbytes)])
    out = np.empty(int(starts[-1]), dtype=np.uint8)
    for g in range(10):
        mask = nbytes > g
        if not mask.any():
            break
        group = ((zz[mask] >> np.uint64(7 * g)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > g).astype(np.uint8) << 7
        out[starts[:-1][mask] + g] = group | cont
    return out.tobytes()


def decode(buf: bytes, count: int | None = None, signed: bool = True) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=I64)
    term = (b & 0x80) == 0
    starts = np.concatenate([[0], np.nonzero(term)[0][:-1] + 1])
    n = len(starts)
    if count is not None and n != count:
        raise ValueError(f"varint stream has {n} values, expected {count}")
    vidx = np.cumsum(term) - term  # value index per byte
    shift = np.arange(len(b), dtype=np.int64) - starts[vidx]
    contrib = (b & 0x7F).astype(U64) << (np.uint64(7) * shift.astype(U64))
    vals = np.add.reduceat(contrib, starts)
    return zigzag_decode(vals.view(I64)) if signed else vals.view(I64)
