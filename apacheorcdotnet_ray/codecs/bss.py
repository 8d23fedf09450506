"""Byte-stream-split codec for IEEE float columns.

The public BYTE_STREAM_SPLIT encoding from the Parquet format spec: the k-th
byte of every value is gathered into plane k, planes concatenated
(plane-major). The transform is size-neutral on its own but groups the
slowly-varying sign/exponent bytes together, so the downstream zlib/zstd
framing (stripe/framing.py) compresses embedding-style float columns far
better than interleaved raw IEEE bytes. Pure NumPy, one transpose each way.

The C# reference has no float-specific codec (ColumnTypes/DoubleWriter.cs
writes raw IEEE bytes); this is a north-star extension selected by
sample-compression compete against "raw" (stripe/columns.py).
"""

from __future__ import annotations

import numpy as np


def encode(vals: np.ndarray) -> bytes:
    """Plane-major byte transpose of a contiguous float array."""
    v = np.ascontiguousarray(vals)
    if v.size == 0:
        return b""
    planes = v.view(np.uint8).reshape(len(v), v.itemsize)
    return np.ascontiguousarray(planes.T).tobytes()


def decode(data: bytes, n: int, dtype) -> np.ndarray:
    """Inverse transpose back to the original dtype (zero-copy view)."""
    dt = np.dtype(dtype)
    if n == 0:
        return np.empty(0, dtype=dt)
    planes = np.frombuffer(data, dtype=np.uint8, count=n * dt.itemsize)
    out = np.ascontiguousarray(planes.reshape(dt.itemsize, n).T)
    return out.reshape(-1).view(dt)
