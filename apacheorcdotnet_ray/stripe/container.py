"""Stripe file container: magic + compressed stream segments + footer tail.

Analog of the reference's stripe layout + FileTail
(``/root/reference/src/ApacheOrcDotNet/OrcWriter.cs:57-104``, ``FileTail.cs:22-54``):
each stripe is fully self-describing — a footer holds the stream directory
(column path, kind, codec, offset, length, value count), the Arrow schema,
row count, per-column statistics and an optional lineage record (input
fragment + row range) used for checkpoint/resume. Unlike the reference we use
a JSON footer (we need decoded-value parity and size parity, not ORC binary
compatibility — see SURVEY.md §2.6 C4).

Layout::

    b"ORAY1" | stream segments (each zlib-block-framed) | footer(zlib json)
    | uint32 LE footer length | b"ORAY"
"""

from __future__ import annotations

import base64
import json
import struct
import zlib

import pyarrow as pa

from .columns import Stream, decode_column, encode_column
from .config import EncodeConfig
from .framing import compress, decompress

MAGIC = b"ORAY1"
TAIL_MAGIC = b"ORAY"
# bump when any codec's internal layout changes incompatibly (readers check
# the footer's version; scratch caches key on it)
FORMAT_VERSION = 2


def encode_stripe(
    table: pa.Table, config: EncodeConfig | None = None, lineage: dict | None = None,
    fsst_tables: dict | None = None,
) -> tuple[bytes, dict]:
    """Encode one Arrow table (= one stripe) to container bytes + footer dict.

    ``fsst_tables``: optional per-actor symbol-table cache shared across
    stripes of the same source (see encode_column)."""
    config = config or EncodeConfig()
    out = bytearray(MAGIC)
    stream_dir = []
    columns_meta = []
    for name in table.column_names:
        col = table.column(name)
        enc_name, streams, stats = encode_column(name, col, config, fsst_tables)
        columns_meta.append({"name": name, "encoding": enc_name, "stats": stats})
        for s in streams:
            if config.compression == "zlib":
                payload = compress(s.data, config.compression_block_size, config.zlib_level)
            elif config.compression == "zstd":
                payload = compress(s.data, config.compression_block_size,
                                   config.zstd_level, codec="zstd")
            else:
                payload = s.data
            stream_dir.append(
                {
                    "col": s.col,
                    "kind": s.kind,
                    "codec": s.codec,
                    "params": s.params,
                    "offset": len(out),
                    "length": len(payload),
                    "raw_length": len(s.data),
                    "n": s.n,
                }
            )
            out.extend(payload)

    footer = {
        "version": FORMAT_VERSION,
        "rows": table.num_rows,
        "compression": config.compression,
        "schema": base64.b64encode(table.schema.serialize().to_pybytes()).decode(),
        "columns": columns_meta,
        "streams": stream_dir,
        "data_length": len(out),
    }
    if lineage:
        footer["lineage"] = lineage
    footer_bytes = zlib.compress(json.dumps(footer).encode(), 1)
    out.extend(footer_bytes)
    out.extend(struct.pack("<I", len(footer_bytes)))
    out.extend(TAIL_MAGIC)
    return bytes(out), footer


def read_footer(buf: bytes) -> dict:
    """FileTail analog: parse the footer from the stripe tail (FileTail.cs:22-54)."""
    if buf[:5] != MAGIC or buf[-4:] != TAIL_MAGIC:
        raise ValueError("not an ORAY1 stripe file")
    (footer_len,) = struct.unpack("<I", buf[-8:-4])
    footer_bytes = buf[-8 - footer_len : -8]
    return json.loads(zlib.decompress(footer_bytes))


def decode_stripe(buf: bytes, columns: list[str] | None = None) -> pa.Table:
    """Decode container bytes back to an Arrow table (optionally projected).

    Column pruning here is the analog of ORC's per-stream reads
    (Stripes/StripeStreamReader.cs:33-39): untouched columns' segments are
    never decompressed.
    """
    footer = read_footer(buf)
    if footer.get("version", 1) != FORMAT_VERSION:
        raise ValueError(
            f"stripe format v{footer.get('version', 1)} != reader v{FORMAT_VERSION};"
            " re-encode the input")
    schema = pa.ipc.read_schema(pa.py_buffer(base64.b64decode(footer["schema"])))
    n_rows = footer["rows"]
    codec = footer.get("compression")
    framed = codec in ("zlib", "zstd")

    arrays = []
    fields = []
    for field_ in schema:
        if columns is not None and field_.name not in columns:
            continue
        streams = []
        for meta in footer["streams"]:
            if meta["col"] == field_.name or meta["col"].startswith(field_.name + "."):
                payload = buf[meta["offset"] : meta["offset"] + meta["length"]]
                data = decompress(payload, codec) if framed else payload
                streams.append(
                    Stream(meta["col"], meta["kind"], meta["codec"], data, meta["n"], meta["params"])
                )
        arrays.append(decode_column(field_, streams, n_rows))
        fields.append(field_)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
