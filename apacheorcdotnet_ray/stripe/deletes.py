"""Delete vectors: per-stripe row-deletion sidecars (merge-on-read).

A curation pipeline that drops rows (dedup rejects, decontamination hits,
quality fails) should not rewrite multi-GB stripes to delete 0.1% of them.
Instead ``pipelines.deletes.delete_where`` writes a tiny ``<stripe>.del``
sidecar — a zlib-packed row bitmap — and every decode applies it as a final
filter (the lakehouse merge-on-read delete-vector pattern; same role as the
reference rewriting a file to drop rows, done lazily). Sidecars accumulate
(set-OR) across delete operations and are removed when ``compact_stripes``
physically rewrites.

Sidecar layout::

    b"ORAYDEL1" | uint32 LE rows | uint32 LE n_deleted
    | zlib(np.packbits(mask))   # mask[i] True = row i deleted
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

MAGIC = b"ORAYDEL1"


def sidecar_path(stripe_path: str) -> str:
    return stripe_path + ".del"


def encode_sidecar(mask: np.ndarray) -> bytes:
    """mask: bool array over the stripe's physical rows (True = deleted)."""
    mask = np.asarray(mask, dtype=bool)
    return (MAGIC
            + struct.pack("<II", len(mask), int(mask.sum()))
            + zlib.compress(np.packbits(mask).tobytes(), 6))


def decode_sidecar(buf: bytes) -> np.ndarray:
    if buf[:8] != MAGIC:
        raise ValueError("not an ORAYDEL1 delete sidecar")
    rows, n_del = struct.unpack("<II", buf[8:16])
    bits = np.unpackbits(
        np.frombuffer(zlib.decompress(buf[16:]), dtype=np.uint8))[:rows]
    mask = bits.astype(bool)
    if int(mask.sum()) != n_del:
        raise ValueError("delete sidecar corrupt: bit count != header count")
    return mask


def read_delete_mask(stripe_path: str) -> np.ndarray | None:
    """The stripe's accumulated delete mask, or None if nothing is deleted."""
    p = sidecar_path(stripe_path)
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return decode_sidecar(f.read())


def write_delete_mask(stripe_path: str, mask: np.ndarray) -> int:
    """Merge ``mask`` (OR) into the stripe's sidecar atomically; returns the
    number of NEWLY deleted rows. A no-new-rows merge leaves the file
    untouched (idempotent re-runs don't churn mtimes)."""
    existing = read_delete_mask(stripe_path)
    mask = np.asarray(mask, dtype=bool)
    if existing is not None:
        if len(existing) != len(mask):
            raise ValueError(
                f"delete mask length {len(mask)} != sidecar rows {len(existing)}")
        new = int((mask & ~existing).sum())
        if new == 0:
            return 0
        mask = mask | existing
    else:
        new = int(mask.sum())
        if new == 0:
            return 0
    p = sidecar_path(stripe_path)
    tmp = p + ".tmp"
    with open(tmp, "wb") as f:
        f.write(encode_sidecar(mask))
    os.replace(tmp, p)
    return new
