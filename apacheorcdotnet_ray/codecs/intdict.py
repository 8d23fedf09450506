"""Integer dictionary codec.

The reference only dictionary-encodes strings (StringWriter.cs:155-249); the
north star adds dictionary encoding as a first-class integer codec. Uniques are
sorted ascending (so their RLEv2 stream delta-encodes well — the analog of the
reference's ordinal dictionary sort at StringWriter.cs:187-191) and ids are
RLEv2-unsigned.

Layout: varint(n_dict) | varint(len(dict_rle)) | dict_rle | ids_rle.
"""

from __future__ import annotations

import numpy as np

from . import rlev2
from .bitpack import I64, read_varint_unsigned, write_varint_unsigned


def encode(values: np.ndarray, max_card: int | None = None) -> bytes | None:
    """Returns None if cardinality exceeds max_card (not worth a dictionary)."""
    v = np.ascontiguousarray(values, dtype=I64)
    uniques, ids = np.unique(v, return_inverse=True)
    if max_card is not None and len(uniques) > max_card:
        return None
    dict_rle = rlev2.encode(uniques, signed=True)
    ids_rle = rlev2.encode(ids.astype(I64), signed=False)
    out = bytearray()
    write_varint_unsigned(out, len(uniques))
    write_varint_unsigned(out, len(dict_rle))
    out.extend(dict_rle)
    out.extend(ids_rle)
    return bytes(out)


def decode(buf: bytes) -> np.ndarray:
    n_dict, pos = read_varint_unsigned(buf, 0)
    dict_len, pos = read_varint_unsigned(buf, pos)
    n_dict, dict_len = int(n_dict), int(dict_len)
    uniques = rlev2.decode(buf[pos : pos + dict_len], signed=True, expected_count=n_dict)
    ids = rlev2.decode(buf[pos + dict_len :], signed=False)
    return uniques[ids]
