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
import bisect
import json
import struct
import zlib

import pyarrow as pa

from .columns import (Stream, column_predicate_mask, decode_column,
                      encode_column)
from .config import EncodeConfig
from .framing import compress, decompress
from .stats import maybe_satisfies, merge_stats

MAGIC = b"ORAY1"
TAIL_MAGIC = b"ORAY"
# bump when any codec's internal layout changes incompatibly (readers check
# the footer's version; scratch caches key on it)
# v3: intdict streams embed their value count; strided (row-index) stripes
# v4: ORC-layout two-stream timestamps (readers accept v3 single-stream too)
# v5: strided stripes share ONE physical stream per (column, kind) with
#     per-stride POSITIONS (raw offset/length/count/crc) — the reference's
#     positions-in-shared-stream ROW_INDEX (OrcCompressedBuffer.cs:66-72)
#     instead of v3/v4's independently framed per-stride segments; recovers
#     the compression-context + footer cost of segmentation (readers still
#     accept v3/v4 strided layouts)
FORMAT_VERSION = 5
READABLE_VERSIONS = (3, 4, 5)


def encode_stripe(
    table: pa.Table, config: EncodeConfig | None = None, lineage: dict | None = None,
    fsst_tables: dict | None = None,
) -> tuple[bytes, dict]:
    """Encode one Arrow table (= one stripe) to container bytes + footer dict.

    ``fsst_tables``: optional per-actor symbol-table cache shared across
    stripes of the same source (see encode_column)."""
    config = config or EncodeConfig()
    if table.schema.metadata is not None or any(f.metadata for f in table.schema):
        # schemas with metadata are unhashable (breaks Ray's block-schema
        # dedup downstream of decode) and bloat every footer — normalize
        table = table.cast(pa.schema([f.remove_metadata() for f in table.schema]))
    if config.sort_within_stripe and config.sort_within_stripe in table.column_names:
        table = table.sort_by(config.sort_within_stripe)
    out = bytearray(MAGIC)
    stream_dir = []
    columns_meta = []

    def emit(streams: list[Stream], stride_idx: int | None) -> None:
        for s in streams:
            if config.compression == "zlib":
                payload = compress(s.data, config.compression_block_size, config.zlib_level)
            elif config.compression == "zstd":
                payload = compress(s.data, config.compression_block_size,
                                   config.zstd_level, codec="zstd")
            else:
                payload = s.data
            entry = {
                "col": s.col,
                "kind": s.kind,
                "codec": s.codec,
                "params": s.params,
                "offset": len(out),
                "length": len(payload),
                "raw_length": len(s.data),
                "n": s.n,
                # integrity: at 100 TB, silent bit-rot in transit/storage is
                # a when, not an if — decode verifies before decompressing
                "crc32": zlib.crc32(payload),
            }
            if stride_idx is not None:
                entry["stride"] = stride_idx
            stream_dir.append(entry)
            out.extend(payload)

    stride = config.row_index_stride
    if stride:
        # ROW_INDEX mode (v5): every column still ENCODES in stride-row
        # units (codec selection per stride, so a locally-constant stride
        # can still pick SHORT_REPEAT etc.), but all strides of one
        # (column, kind) share ONE physical stream: raw segments are
        # concatenated and block-framed together (one compression context),
        # with per-stride positions (raw offset/length/count/crc) in the
        # stream entry — the reference's shared-stream ROW_INDEX
        # (Compression/OrcCompressedBuffer.cs:66-72). A predicate read
        # seeks via positions and decompresses only covering blocks.
        n = table.num_rows
        bounds = list(range(0, n, stride)) + [n]
        stride_rows = [bounds[i + 1] - bounds[i] for i in range(len(bounds) - 1)]
        n_strides = len(stride_rows)
        for name in table.column_names:
            col = table.column(name)
            row_index = []
            enc_name = None
            by_kind: dict[tuple, list] = {}  # (subcol, kind) → [(si, Stream)]
            for si in range(n_strides):
                sl = col.slice(bounds[si], stride_rows[si])
                enc_name, streams, st = encode_column(name, sl, config, fsst_tables)
                row_index.append(st)
                for s in streams:
                    by_kind.setdefault((s.col, s.kind), []).append((si, s))
            for (scol, kind), items in by_kind.items():
                segs = {si: s for si, s in items}
                raw_parts, pos_len, pos_n, pos_crc = [], [], [], []
                codecs, params_list = [], []
                for si in range(n_strides):
                    s = segs.get(si)
                    d = s.data if s is not None else b""
                    raw_parts.append(d)
                    pos_len.append(len(d))
                    pos_n.append(s.n if s is not None else 0)
                    pos_crc.append(zlib.crc32(d))
                    codecs.append(s.codec if s is not None else None)
                    params_list.append(s.params if s is not None else {})
                raw = b"".join(raw_parts)
                # block size ≈ avg stride segment (pow2, clamped): deflate's
                # 32 KiB window means blocks beyond that gain no context, so
                # the shared stream's win is block FILL — and stride-sized
                # blocks keep partial reads proportional (a stride touches
                # ~1-2 blocks, never the whole stream)
                nonzero = [ln for ln in pos_len if ln]
                avg = (sum(nonzero) // len(nonzero)) if nonzero else 1
                bs = min(config.compression_block_size,
                         max(4096, 1 << (max(avg, 1) - 1).bit_length()))
                if config.compression == "zlib":
                    payload = compress(raw, bs, config.zlib_level)
                elif config.compression == "zstd":
                    payload = compress(raw, bs, config.zstd_level, codec="zstd")
                else:
                    payload = raw
                base_codec = next(c for c in codecs if c is not None)
                base_params = next(s.params for _, s in items)
                entry = {
                    "col": scol, "kind": kind,
                    "codec": base_codec, "params": base_params,
                    "offset": len(out), "length": len(payload),
                    "raw_length": len(raw), "n": sum(pos_n),
                    "crc32": zlib.crc32(payload),
                    "bs": bs,
                    # raw offsets are the cumsum of pos_len — not stored
                    "pos_len": pos_len, "pos_n": pos_n, "pos_crc": pos_crc,
                }
                # per-stride codec/params only when heterogeneous (rare —
                # e.g. a string column flipping dict↔direct across strides)
                if any(c not in (None, base_codec) for c in codecs):
                    entry["pos_codec"] = codecs
                if any(p not in ({}, base_params) for p in params_list):
                    entry["pos_params"] = params_list
                stream_dir.append(entry)
                out.extend(payload)
            stats = None
            for st in row_index:
                stats = merge_stats(stats, st)
            columns_meta.append({"name": name, "encoding": enc_name,
                                 "stats": stats or {}, "row_index": row_index})
    else:
        stride_rows = None
        for name in table.column_names:
            col = table.column(name)
            enc_name, streams, stats = encode_column(name, col, config, fsst_tables)
            columns_meta.append({"name": name, "encoding": enc_name, "stats": stats})
            emit(streams, None)

    if config.bloom_columns:
        from . import bloom as bloom_mod

        for meta in columns_meta:
            if meta["name"] in config.bloom_columns:
                col = table.column(meta["name"])
                valid = col.combine_chunks().drop_null() \
                    if isinstance(col, pa.ChunkedArray) else col.drop_null()
                if len(valid):
                    meta["bloom"] = bloom_mod.build(valid)

    footer = {
        "version": FORMAT_VERSION,
        "rows": table.num_rows,
        "compression": config.compression,
        "block_size": config.compression_block_size,
        "schema": base64.b64encode(table.schema.serialize().to_pybytes()).decode(),
        "columns": columns_meta,
        "streams": stream_dir,
        "data_length": len(out),
    }
    if config.bloom_columns:
        from . import bloom as bloom_mod

        footer["bloom_hash"] = bloom_mod.hash_version()
    if stride:
        footer["row_index_stride"] = stride
        footer["stride_rows"] = stride_rows
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


def footer_schema(footer: dict) -> pa.Schema:
    """Deserialize the Arrow schema embedded in a stripe footer."""
    return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(footer["schema"])))


def normalize_predicate(predicate) -> list[tuple]:
    """One (col, op, lit) triple or a list of them (conjunction) → list."""
    if predicate is None:
        return []
    if isinstance(predicate, tuple) and len(predicate) == 3 \
            and isinstance(predicate[1], str):
        return [predicate]
    return list(predicate)


def qualifying_strides(footer: dict, predicate) -> list[int]:
    """Stride indexes whose per-stride [min, max] could satisfy EVERY
    (col, op, lit) in the conjunction. Columns without a row index qualify
    every stride (conservative)."""
    n_strides = len(footer.get("stride_rows", []))
    keep = list(range(n_strides))
    for col, op, lit in normalize_predicate(predicate):
        meta = next((c for c in footer["columns"] if c["name"] == col), None)
        ri = (meta or {}).get("row_index")
        if not ri:
            continue
        keep = [i for i in keep if maybe_satisfies(ri[i], op, lit)]
    return keep


def decode_stripe(
    buf: bytes,
    columns: list[str] | None = None,
    predicate: tuple | None = None,
    io_stats: dict | None = None,
    row_range: tuple[int, int] | None = None,
    delete_mask=None,
) -> pa.Table:
    """Decode container bytes back to an Arrow table (optionally projected).

    Column pruning here is the analog of ORC's per-stream reads
    (Stripes/StripeStreamReader.cs:33-39): untouched columns' segments are
    never decompressed. On stripes written with ``row_index_stride``, a
    ``predicate`` (col, op, lit) additionally skips whole strides whose
    footer row-index range excludes it — the ROW_INDEX seek analog
    (ColumnWriterStatistics.cs:12-33); the result still needs the exact
    row filter applied by the caller. ``row_range`` = stripe-local
    ``(start, stop)`` row positions: on strided stripes only the
    overlapping strides decompress (the ORC seek-to-row analog), then the
    exact slice is taken — the trainer fast-forward path. ``io_stats``,
    when passed, is filled with {bytes_read, bytes_decompressed,
    strides_total, strides_read}. ``delete_mask`` (bool array over the
    stripe's PHYSICAL rows, True = deleted; see stripe/deletes.py) is
    applied as the final filter — with ``row_range`` the range addresses
    physical rows and deleted rows are dropped from the slice after.
    """
    footer = read_footer(buf)
    if footer.get("version", 1) not in READABLE_VERSIONS:  # v3: ts fallback
        raise ValueError(
            f"stripe format v{footer.get('version', 1)} != reader v{FORMAT_VERSION};"
            " re-encode the input")
    schema = pa.ipc.read_schema(pa.py_buffer(base64.b64decode(footer["schema"])))
    n_rows = footer["rows"]
    codec = footer.get("compression")
    framed = codec in ("zlib", "zstd")

    range_slice = None  # (local offset into the decoded strides, length)
    range_sel = None    # stride indexes the range overlaps
    if row_range is not None:
        if predicate is not None:
            raise ValueError("row_range and predicate are mutually exclusive")
        r0, r1 = max(0, int(row_range[0])), min(int(row_range[1]), n_rows)
        if r0 >= r1:
            proj_f = [f for f in schema if columns is None or f.name in columns]
            return pa.schema(proj_f).empty_table()
        srs = footer.get("stride_rows")
        if srs:
            bounds = [0]
            for sr in srs:
                bounds.append(bounds[-1] + sr)
            i0 = bisect.bisect_right(bounds, r0) - 1
            i1 = bisect.bisect_left(bounds, r1)
            range_sel = list(range(i0, i1))
            range_slice = (r0 - bounds[i0], r1 - r0)
        else:
            range_slice = (r0, r1 - r0)

    if io_stats is not None:
        io_stats.setdefault("bytes_read", 0)
        io_stats.setdefault("bytes_decompressed", 0)

    def make_stream(meta: dict) -> Stream:
        payload = buf[meta["offset"] : meta["offset"] + meta["length"]]
        expected = meta.get("crc32")
        if expected is not None and zlib.crc32(payload) != expected:
            raise ValueError(
                f"stripe stream corrupt: col={meta['col']} kind={meta['kind']}"
                f" (crc mismatch at offset {meta['offset']})")
        data = decompress(payload, codec) if framed else payload
        if io_stats is not None:
            io_stats["bytes_read"] += meta["length"]
            io_stats["bytes_decompressed"] += meta["raw_length"]
        return Stream(meta["col"], meta["kind"], meta["codec"], data, meta["n"],
                      meta["params"])

    def col_metas(name: str) -> list[dict]:
        return [m for m in footer["streams"]
                if m["col"] == name or m["col"].startswith(name + ".")]

    stride_rows = footer.get("stride_rows")
    if stride_rows is not None and footer.get("version", 1) >= 5:
        sel = (range_sel if range_sel is not None
               else qualifying_strides(footer, predicate)
               if predicate is not None
               else list(range(len(stride_rows))))
        if io_stats is not None:
            io_stats["strides_total"] = len(stride_rows)
            io_stats["strides_read"] = len(sel)
        block_size = footer.get("block_size", 256 * 1024)
        from .framing import block_offsets, decompress_range

        def stride_stream(m: dict, si: int, state: dict) -> Stream | None:
            ln = m["pos_len"][si]
            if ln == 0:
                return None
            if "pos_off" not in state:  # raw offsets = cumsum of pos_len
                offs, acc = [], 0
                for l_ in m["pos_len"]:
                    offs.append(acc)
                    acc += l_
                state["pos_off"] = offs
            pos_off = state["pos_off"][si]
            if framed:
                seg = buf[m["offset"] : m["offset"] + m["length"]]
                if "offsets" not in state:
                    state["offsets"] = block_offsets(seg)
                    state["cache"] = {}
                data = decompress_range(
                    seg, pos_off, ln, codec,
                    m.get("bs", block_size),
                    cache=state["cache"], io_stats=io_stats,
                    offsets=state["offsets"])
            else:
                data = buf[m["offset"] + pos_off
                           : m["offset"] + pos_off + ln]
                if io_stats is not None:
                    io_stats["bytes_read"] += ln
                    io_stats["bytes_decompressed"] += ln
            if zlib.crc32(data) != m["pos_crc"][si]:
                raise ValueError(
                    f"stripe stream corrupt: col={m['col']} kind={m['kind']}"
                    f" stride={si} (crc mismatch)")
            cdc = m["pos_codec"][si] if "pos_codec" in m else m["codec"]
            prm = m["pos_params"][si] if "pos_params" in m else m["params"]
            return Stream(m["col"], m["kind"], cdc, data, m["pos_n"][si], prm)

        def field_chunks(field_):
            metas = col_metas(field_.name)
            states = [dict() for _ in metas]  # per-stream block cache
            for si in sel:
                streams = [s for m, st in zip(metas, states)
                           if (s := stride_stream(m, si, st)) is not None]
                yield streams, stride_rows[si]
    elif stride_rows is not None:
        # v3/v4 strided layout: independently framed per-stride segments
        sel = (range_sel if range_sel is not None
               else qualifying_strides(footer, predicate)
               if predicate is not None
               else list(range(len(stride_rows))))
        if io_stats is not None:
            io_stats["strides_total"] = len(stride_rows)
            io_stats["strides_read"] = len(sel)

        def field_chunks(field_):
            by_stride: dict[int, list[dict]] = {}
            for m in col_metas(field_.name):
                by_stride.setdefault(m["stride"], []).append(m)
            for si in sel:
                yield ([make_stream(m) for m in by_stride.get(si, [])],
                       stride_rows[si])
    else:
        def field_chunks(field_):
            yield [make_stream(m) for m in col_metas(field_.name)], n_rows

    def decode_field(field_):
        chunks = [decode_column(field_, s, n) for s, n in field_chunks(field_)]
        return pa.chunked_array(chunks, type=field_.type) \
            if chunks else pa.chunked_array([], type=field_.type)

    def predicate_mask_field(field_, op, lit):
        # dictionary fast path: one compare over the tiny dict per chunk +
        # a fancy-index over ids — row strings never materialize
        out = []
        for s, n in field_chunks(field_):
            m = column_predicate_mask(field_, s, n, op, lit)
            if m is None:
                return None
            out.append(m)
        return pa.chunked_array(out, type=pa.bool_()) \
            if out else pa.chunked_array([], type=pa.bool_())

    proj = [f for f in schema if columns is None or f.name in columns]
    out_schema = pa.schema(proj)

    # late materialization (CompressDB-style compressed-scan refinement,
    # PAPERS.md SIGMOD 2022): decode the predicate column FIRST, and only
    # materialize the remaining columns for stripes/strides where rows
    # actually match — a selective scan never decodes non-matching data
    decoded: dict[str, object] = {}
    mask = None
    preds = [p for p in normalize_predicate(predicate)
             if any(f.name == p[0] for f in proj)]
    if preds:
        import pyarrow.compute as pc

        from .stats import compare_mask

        for col, op, lit in preds:
            pred_field = next(f for f in proj if f.name == col)
            m = None
            if col not in decoded:
                m = predicate_mask_field(pred_field, op, lit)
                if m is not None and io_stats is not None:
                    io_stats["dict_masked_cols"] = \
                        io_stats.get("dict_masked_cols", 0) + 1
            if m is None:
                if col not in decoded:
                    decoded[col] = decode_field(pred_field)
                try:
                    # compare_mask casts the literal to the column type when
                    # no direct kernel exists (ISO string vs temporal column)
                    m = compare_mask(decoded[col], op, lit)
                except (pa.ArrowInvalid, pa.ArrowTypeError,
                        pa.ArrowNotImplementedError, TypeError, KeyError):
                    continue  # incomparable literal/op → can't refine
            mask = m if mask is None else pc.and_kleene(mask, m)
            if not pc.any(mask).as_py():
                return out_schema.empty_table()

    cols = {f.name: decoded[f.name] if f.name in decoded else decode_field(f)
            for f in proj}
    tbl = pa.table(cols, schema=out_schema)

    keep = None  # ~delete_mask aligned to the DECODED rows (selected strides)
    if delete_mask is not None:
        import numpy as np

        dm = np.asarray(delete_mask, dtype=bool)
        if len(dm) != n_rows:
            raise ValueError(
                f"delete mask length {len(dm)} != stripe rows {n_rows}")
        if stride_rows is not None and sel != list(range(len(stride_rows))):
            bounds = [0]
            for sr in stride_rows:
                bounds.append(bounds[-1] + sr)
            parts = [~dm[bounds[si]:bounds[si + 1]] for si in sel]
            keep = (np.concatenate(parts) if parts
                    else np.zeros(0, dtype=bool))
        else:
            keep = ~dm

    if mask is not None:
        if keep is not None:
            import pyarrow.compute as pc

            mask = pc.and_(mask, pa.array(keep))
        tbl = tbl.filter(mask)  # non-matching rows never leave the task
    elif range_slice is not None:
        tbl = tbl.slice(*range_slice)  # zero-copy exact-row trim
        if keep is not None:
            tbl = tbl.filter(pa.array(
                keep[range_slice[0]:range_slice[0] + range_slice[1]]))
    elif keep is not None:
        tbl = tbl.filter(pa.array(keep))
    return tbl
