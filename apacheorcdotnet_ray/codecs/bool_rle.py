"""ORC boolean bit encoding: MSB-first bit-pack 8 bools/byte, then ByteRLE.

Reference: ``/root/reference/src/ApacheOrcDotNet/Encodings/BitWriter.cs`` /
``BitReader.cs``. Used for PRESENT (validity) streams. NumPy ``packbits`` /
``unpackbits`` default to MSB-first ("big" bitorder), matching the reference;
Arrow validity bitmaps are LSB-first, so callers must convert (we always go
through a boolean array, which makes the order explicit).
"""

from __future__ import annotations

import numpy as np

from . import byte_rle


def encode(values: np.ndarray) -> bytes:
    b = np.ascontiguousarray(values, dtype=bool)
    return byte_rle.encode(np.packbits(b))


def decode(buf: bytes, count: int) -> np.ndarray:
    """Decode exactly `count` bools (up to 7 trailing pad bits are discarded)."""
    nbytes = (count + 7) // 8
    packed = byte_rle.decode(buf, expected_count=nbytes)
    return np.unpackbits(packed[:nbytes])[:count].astype(bool)


def decode_from(buf: bytes, pos: int, count: int) -> tuple[np.ndarray, int]:
    nbytes = (count + 7) // 8
    packed, pos = byte_rle.decode_from(buf, pos, expected_count=nbytes)
    return np.unpackbits(packed[:nbytes])[:count].astype(bool), pos
