"""Integer dictionary codec.

The reference only dictionary-encodes strings (StringWriter.cs:155-249); the
north star adds dictionary encoding as a first-class integer codec. Uniques
are sorted ascending (so their RLEv2 stream delta-encodes well — the analog
of the reference's ordinal dictionary sort at StringWriter.cs:187-191); the
id stream picks between RLEv2-unsigned (wins on runs/clusters) and flat
fixed-width bit-packing (wins on high-entropy ids and encodes in one
pack_bits call) by competing on a bounded sample.

Layout: varint(n_dict) | varint(len(dict_rle)) | dict_rle | varint(n_values)
| mode byte (0 = ids RLEv2, 1 = width byte + flat MSB-first bitpack) | ids
payload. n_values is stored so decode needs no external count — the mode-1
bitpack payload is padded to a byte boundary, making the count otherwise
unrecoverable (a 97-value width-1 stream would infer 104).
"""

from __future__ import annotations

import numpy as np

from . import rlev2
from .bitpack import (
    I64,
    U64,
    num_bits,
    pack_bits,
    read_varint_unsigned,
    unpack_bits,
    write_varint_unsigned,
)

_SAMPLE = 4096


def encode(values: np.ndarray, max_card: int | None = None) -> bytes | None:
    """Returns None if cardinality exceeds max_card (not worth a dictionary)."""
    v = np.ascontiguousarray(values, dtype=I64)
    uniques, ids = np.unique(v, return_inverse=True)
    if max_card is not None and len(uniques) > max_card:
        return None
    dict_rle = rlev2.encode(uniques, signed=True)
    ids = ids.astype(I64)
    width = max(num_bits(max(len(uniques) - 1, 0)), 1)
    # representative sample: contiguous 512-value chunks at evenly spaced
    # offsets (a head-only sample misjudges mixed-regime streams; a strided
    # one destroys the run structure RLEv2 feeds on)
    if len(ids) <= _SAMPLE:
        sample = ids
    else:
        n_chunks = _SAMPLE // 512
        offs = np.linspace(0, len(ids) - 512, n_chunks).astype(np.int64)
        sample = np.concatenate([ids[o : o + 512] for o in offs])
    rle_sample = len(rlev2.encode(sample, signed=False))
    pack_sample = 1 + (len(sample) * width + 7) // 8
    out = bytearray()
    write_varint_unsigned(out, len(uniques))
    write_varint_unsigned(out, len(dict_rle))
    out.extend(dict_rle)
    write_varint_unsigned(out, len(ids))
    # flat pack must win clearly — on a tie RLEv2's adaptivity is worth more
    # than the pack's encode speed
    if pack_sample < 0.95 * rle_sample:
        out.append(1)
        out.append(width)
        out.extend(pack_bits(ids.view(U64), width))
    else:
        out.append(0)
        out.extend(rlev2.encode(ids, signed=False))
    return bytes(out)


def decode(buf: bytes, expected_count: int | None = None) -> np.ndarray:
    n_dict, pos = read_varint_unsigned(buf, 0)
    dict_len, pos = read_varint_unsigned(buf, pos)
    n_dict, dict_len = int(n_dict), int(dict_len)
    uniques = rlev2.decode(buf[pos : pos + dict_len], signed=True, expected_count=n_dict)
    pos += dict_len
    n_values, pos = read_varint_unsigned(buf, pos)
    n_values = int(n_values)
    if expected_count is not None and expected_count != n_values:
        raise ValueError(
            f"intdict stream holds {n_values} values, caller expected {expected_count}")
    expected_count = n_values
    mode = buf[pos]
    pos += 1
    if mode == 1:
        width = buf[pos]
        pos += 1
        ids, _ = unpack_bits(buf, width, expected_count, pos)
        ids = ids.view(I64)
    else:
        ids = rlev2.decode(buf[pos:], signed=False, expected_count=expected_count)
    return uniques[ids]
