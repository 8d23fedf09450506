"""Apache ORC writer: this repo's codecs emitting REAL ``.orc`` files.

The reference's headline capability is writing ORC files other engines can
read (``/root/reference/src/ApacheOrcDotNet/OrcWriter.cs``,
``Stripes/StripeWriter.cs:241-333``). This module closes that gap for the
Ray engine: integer columns go through ``codecs.rlev2`` (the byte-faithful
reimplementation of the reference's writer), strings through DIRECT_V2 /
DICTIONARY_V2, doubles as IEEE-LE, nulls through ``codecs.bool_rle``
PRESENT streams — all laid out per the public ORC spec (magic, stripes,
protobuf StripeFooter/Metadata/Footer/PostScript, ZLIB or ZSTD chunk
framing). Conformance check: ``tests/test_orc_conformance.py`` round-trips
files through BOTH pyarrow's independent C++ ORC reader and this repo's
``orc_reader``.

Production-grade layout (the reference flushes a stripe per ~64 MB with a
ROW_INDEX every 10k rows — ``StripeWriter.cs:116-191``,
``OrcWriter.cs:57-104``):

- **multi-stripe**: rows are split into stripes by a byte budget (64 MB
  default) or an explicit ``stripe_rows``;
- **ROW_INDEX streams**: every RLE/bool/raw stream restarts its encoder at
  each ``row_index_stride`` boundary, so RowIndexEntry positions are exact
  ([chunk offset, offset in chunk][, run offset, bit offset] per the spec)
  and downstream readers can seek/prune row groups. Per-entry column
  statistics included;
- **Metadata section**: per-stripe ColumnStatistics (StripeStatistics);
- **true per-node statistics**: numberOfValues is the node's own non-null
  count (LIST children count their flattened values), and hasNull (field
  10) is always emitted;
- **timestamps**: the C++ ORC dialect — seconds truncated toward zero,
  SIGNED scaled nanos for pre-1970 fractional values (cross-checked
  byte-level against pyarrow's writer on 1969-12-31 23:59:59.5).

Supported column types: int8/16/32/64 → SHORT/INT/LONG, string (dictionary
or direct per the reference's 0.8 distinct-ratio rule), float64 → DOUBLE,
bool → BOOLEAN, timestamp → TIMESTAMP, date32 → DATE, decimal(≤18 digits)
→ DECIMAL, struct → STRUCT, list → LIST; nullable throughout.
"""

from __future__ import annotations

import struct
import zlib
from bisect import bisect_right

import numpy as np
import pyarrow as pa

from ..codecs import bool_rle, rlev2, varint

# --- minimal protobuf wire-format writer ------------------------------------


def _vint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def pb_field(tag: int, value) -> bytes:
    """Encode one field: int → varint wire, bytes/str → length-delimited."""
    if isinstance(value, int):
        return _vint(tag << 3 | 0) + _vint(value)
    if isinstance(value, str):
        value = value.encode("utf-8")
    return _vint(tag << 3 | 2) + _vint(len(value)) + value


def pb_field_double(tag: int, value: float) -> bytes:
    return _vint(tag << 3 | 1) + struct.pack("<d", value)


def pb_msg(*fields: bytes) -> bytes:
    return b"".join(fields)


def _zz(v: int) -> int:
    """zigzag for proto sint64 fields (ORC statistics use sint64)."""
    return (v << 1) ^ (v >> 63)  # Python's arithmetic shift: -1 for v<0


# --- constants ---------------------------------------------------------------

_KIND = {"PRESENT": 0, "DATA": 1, "LENGTH": 2, "DICTIONARY_DATA": 3,
         "SECONDARY": 5, "ROW_INDEX": 6}
_TYPE_LONG, _TYPE_STRING, _TYPE_DOUBLE, _TYPE_BOOLEAN, _TYPE_STRUCT = 4, 7, 6, 0, 12
_TYPE_TIMESTAMP, _TYPE_DECIMAL, _TYPE_DATE, _TYPE_LIST = 9, 14, 15, 10
_TYPE_MAP, _TYPE_FLOAT, _TYPE_BINARY, _TYPE_BYTE = 11, 5, 8, 1
_TYPE_SHORT, _TYPE_INT = 2, 3
_ENC_DIRECT, _ENC_DIRECT_V2, _ENC_DICTIONARY_V2 = 0, 2, 3

_DEFAULT_STRIPE_BYTES = 64 * 2**20   # the reference's WriterConfiguration
_DEFAULT_STRIDE = 10_000


# --- schema walk (type tree is data-independent) -----------------------------


class _Node:
    __slots__ = ("id", "type", "kind", "children")

    def __init__(self, nid: int, t: pa.DataType, kind: int,
                 children: list["_Node"]):
        self.id, self.type, self.kind, self.children = nid, t, kind, children


def _build_node(t: pa.DataType, next_id: list[int]) -> _Node:
    nid = next_id[0]
    next_id[0] += 1
    if pa.types.is_map(t):
        key = _build_node(t.key_type, next_id)
        val = _build_node(t.item_type, next_id)
        return _Node(nid, t, _TYPE_MAP, [key, val])
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _Node(nid, t, _TYPE_LIST, [_build_node(t.value_type, next_id)])
    if pa.types.is_struct(t):
        return _Node(nid, t, _TYPE_STRUCT,
                     [_build_node(t.field(i).type, next_id)
                      for i in range(t.num_fields)])
    if pa.types.is_integer(t):
        kind = _TYPE_BYTE if t.bit_width == 8 else \
            _TYPE_SHORT if t.bit_width == 16 else \
            _TYPE_INT if t.bit_width == 32 else _TYPE_LONG
        return _Node(nid, t, kind, [])
    if pa.types.is_boolean(t):
        return _Node(nid, t, _TYPE_BOOLEAN, [])
    if pa.types.is_float32(t):
        return _Node(nid, t, _TYPE_FLOAT, [])
    if pa.types.is_floating(t):
        return _Node(nid, t, _TYPE_DOUBLE, [])
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _Node(nid, t, _TYPE_BINARY, [])
    if pa.types.is_timestamp(t):
        return _Node(nid, t, _TYPE_TIMESTAMP, [])
    if pa.types.is_date(t):
        return _Node(nid, t, _TYPE_DATE, [])
    if pa.types.is_decimal(t):
        return _Node(nid, t, _TYPE_DECIMAL, [])
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _Node(nid, t, _TYPE_STRING, [])
    raise NotImplementedError(f"ORC writer: unsupported type {t}")


def _type_msgs(node: _Node) -> list[bytes]:
    """Pre-order protobuf Type messages for a subtree."""
    if node.kind == _TYPE_LIST:
        return [pb_msg(pb_field(1, _TYPE_LIST),
                       pb_field(2, node.children[0].id))] \
            + _type_msgs(node.children[0])
    if node.kind == _TYPE_MAP:
        return [pb_msg(pb_field(1, _TYPE_MAP),
                       pb_field(2, node.children[0].id),
                       pb_field(2, node.children[1].id))] \
            + _type_msgs(node.children[0]) + _type_msgs(node.children[1])
    if node.kind == _TYPE_STRUCT:
        head = pb_msg(pb_field(1, _TYPE_STRUCT),
                      *[pb_field(2, c.id) for c in node.children],
                      *[pb_field(3, node.type.field(i).name)
                        for i in range(node.type.num_fields)])
        out = [head]
        for c in node.children:
            out.extend(_type_msgs(c))
        return out
    if node.kind == _TYPE_DECIMAL:
        return [pb_msg(pb_field(1, _TYPE_DECIMAL),
                       pb_field(5, node.type.precision),
                       pb_field(6, node.type.scale))]
    return [pb_msg(pb_field(1, node.kind))]


# --- segmented stream builders (encoder restarts at row-group bounds) --------


def _seg_rle(vals: np.ndarray, signed: bool, bounds) -> tuple[bytes, list]:
    parts, poss, off = [], [], 0
    ends = list(bounds[1:]) + [len(vals)]
    for a, b in zip(bounds, ends):
        poss.append([off, 0])
        seg = rlev2.encode(np.ascontiguousarray(vals[int(a):int(b)]),
                           signed=signed)
        parts.append(seg)
        off += len(seg)
    return b"".join(parts), poss


def _seg_varint(vals: np.ndarray, signed: bool, bounds) -> tuple[bytes, list]:
    parts, poss, off = [], [], 0
    ends = list(bounds[1:]) + [len(vals)]
    for a, b in zip(bounds, ends):
        poss.append([off])
        seg = varint.encode(np.ascontiguousarray(vals[int(a):int(b)]),
                            signed=signed)
        parts.append(seg)
        off += len(seg)
    return b"".join(parts), poss


def _seg_bool(bits: np.ndarray, bounds) -> tuple[bytes, list]:
    """Boolean / PRESENT stream restarted at each row group's byte; the
    position triple is [stream offset, byte-RLE run offset (0 — restart),
    bit offset within the byte]."""
    n_bytes = (len(bits) + 7) // 8
    byte_starts = sorted({int(b) // 8 for b in bounds} | {0})
    seg_off: dict[int, int] = {}
    parts, off = [], 0
    for i, bs in enumerate(byte_starts):
        be = byte_starts[i + 1] if i + 1 < len(byte_starts) else n_bytes
        seg = bool_rle.encode(
            np.ascontiguousarray(bits[bs * 8:min(be * 8, len(bits))]))
        seg_off[bs] = off
        parts.append(seg)
        off += len(seg)
    poss = [[seg_off[int(b) // 8], 0, int(b) % 8] for b in bounds]
    return b"".join(parts), poss


# --- per-node column statistics ----------------------------------------------


def _stats_msg(arr: pa.Array | None, n_rows: int = 0) -> bytes:
    """ColumnStatistics: true numberOfValues (this node's own non-null
    count) + hasNull, plus min/max(/sum) for int/double/string/bool."""
    import pyarrow.compute as pc

    if arr is None:  # root struct
        return pb_msg(pb_field(1, n_rows), pb_field(10, 0))
    nn = len(arr) - arr.null_count
    msg = pb_field(1, nn)
    t = arr.type
    if nn:
        if pa.types.is_integer(t):
            mm = pc.min_max(arr)
            sub = pb_msg(pb_field(1, _zz(int(mm["min"].as_py()))),
                         pb_field(2, _zz(int(mm["max"].as_py()))))
            try:
                sub += pb_field(3, _zz(int(pc.sum(arr).as_py())))
            except pa.ArrowInvalid:  # pragma: no cover - int64 overflow
                pass
            msg += pb_field(2, sub)
        elif pa.types.is_floating(t):
            mm = pc.min_max(arr)
            msg += pb_field(3, pb_msg(
                pb_field_double(1, float(mm["min"].as_py())),
                pb_field_double(2, float(mm["max"].as_py())),
                pb_field_double(3, float(pc.sum(arr).as_py()))))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            mm = pc.min_max(arr)
            msg += pb_field(4, pb_msg(
                pb_field(1, str(mm["min"].as_py())),
                pb_field(2, str(mm["max"].as_py()))))
        elif pa.types.is_boolean(t):
            msg += pb_field(5, pb_msg(pb_field(
                1, b"".join([_vint(int(pc.sum(arr).as_py() or 0))]))))
    msg += pb_field(10, 1 if arr.null_count else 0)
    return pb_msg(msg)


# --- per-stripe node encode ----------------------------------------------


def _encode_node_stripe(node: _Node, arr, row_bounds: np.ndarray,
                        recs: list, encs: dict, stats_rows: list) -> None:
    """Encode one column subtree for ONE stripe. ``row_bounds`` are the
    row-group start indices in this node's own row space; they propagate
    to children through PRESENT densification and LIST lengths so every
    stream's per-group restart offsets line up with the same top-level
    row groups."""
    import pyarrow.compute as pc

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    stats_rows.append((node.id, a, row_bounds))
    streams: list[tuple[str, bytes, list | None]] = []
    if a.null_count:
        present = np.invert(np.asarray(a.is_null()))
        cp = np.zeros(len(a) + 1, dtype=np.int64)
        np.cumsum(present, out=cp[1:])
        dense_bounds = cp[row_bounds]
        raw, poss = _seg_bool(present, row_bounds)
        streams.append(("PRESENT", raw, poss))
        d = a.drop_null()
    else:
        dense_bounds = row_bounds
        d = a
    t = node.type
    if node.kind == _TYPE_LIST:
        lengths = pc.list_value_length(d).to_numpy(zero_copy_only=False) \
            .astype(np.int64) if len(d) else np.empty(0, np.int64)
        raw, poss = _seg_rle(lengths, False, dense_bounds)
        streams.append(("LENGTH", raw, poss))
        encs[node.id] = pb_msg(pb_field(1, _ENC_DIRECT_V2))
        recs.extend((_KIND[n], node.id, r, p) for n, r, p in streams)
        cl = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=cl[1:])
        child_bounds = cl[dense_bounds]
        _encode_node_stripe(node.children[0], d.flatten(), child_bounds,
                            recs, encs, stats_rows)
        return
    if node.kind == _TYPE_MAP:
        # NOTE: MapArray.keys/.items ignore slices — slice them by the
        # absolute offsets window instead (offsets ARE slice-aware)
        off = np.asarray(d.offsets, dtype=np.int64) if len(d) \
            else np.zeros(1, dtype=np.int64)
        lengths = np.diff(off)
        raw, poss = _seg_rle(lengths, False, dense_bounds)
        streams.append(("LENGTH", raw, poss))
        encs[node.id] = pb_msg(pb_field(1, _ENC_DIRECT_V2))
        recs.extend((_KIND[n], node.id, r, p) for n, r, p in streams)
        cl = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=cl[1:])
        child_bounds = cl[dense_bounds]
        keys = d.keys.slice(int(off[0]), int(off[-1] - off[0]))
        items = d.items.slice(int(off[0]), int(off[-1] - off[0]))
        _encode_node_stripe(node.children[0], keys, child_bounds,
                            recs, encs, stats_rows)
        _encode_node_stripe(node.children[1], items, child_bounds,
                            recs, encs, stats_rows)
        return
    if node.kind == _TYPE_STRUCT:
        encs[node.id] = pb_msg(pb_field(1, _ENC_DIRECT))
        recs.extend((_KIND[n], node.id, r, p) for n, r, p in streams)
        for fi, child in enumerate(node.children):
            _encode_node_stripe(child, d.field(fi), dense_bounds,
                                recs, encs, stats_rows)
        return
    # --- scalar leaves ---
    enc_msg = pb_msg(pb_field(1, _ENC_DIRECT_V2))
    if node.kind in (_TYPE_SHORT, _TYPE_INT, _TYPE_LONG):
        vals = d.to_numpy(zero_copy_only=False).astype(np.int64)
        raw, poss = _seg_rle(vals, True, dense_bounds)
        streams.append(("DATA", raw, poss))
    elif node.kind == _TYPE_BYTE:  # tinyint: byte-RLE DATA
        from ..codecs import byte_rle as _brle

        bv = d.to_numpy(zero_copy_only=False).astype(np.int8).view(np.uint8)
        parts, poss, off = [], [], 0
        ends = list(dense_bounds[1:]) + [len(bv)]
        for a, b in zip(dense_bounds, ends):
            poss.append([off, 0])
            seg = _brle.encode(np.ascontiguousarray(bv[int(a):int(b)]))
            parts.append(seg)
            off += len(seg)
        streams.append(("DATA", b"".join(parts), poss))
        enc_msg = pb_msg(pb_field(1, _ENC_DIRECT))
    elif node.kind == _TYPE_BOOLEAN:
        bits = d.to_numpy(zero_copy_only=False).astype(bool)
        raw, poss = _seg_bool(bits, dense_bounds)
        streams.append(("DATA", raw, poss))
        enc_msg = pb_msg(pb_field(1, _ENC_DIRECT))
    elif node.kind == _TYPE_DOUBLE:
        vals = d.to_numpy(zero_copy_only=False).astype("<f8")
        streams.append(("DATA", vals.tobytes(),
                        [[8 * int(b)] for b in dense_bounds]))
        enc_msg = pb_msg(pb_field(1, _ENC_DIRECT))
    elif node.kind == _TYPE_FLOAT:
        vals = d.to_numpy(zero_copy_only=False).astype("<f4")
        streams.append(("DATA", vals.tobytes(),
                        [[4 * int(b)] for b in dense_bounds]))
        enc_msg = pb_msg(pb_field(1, _ENC_DIRECT))
    elif node.kind == _TYPE_BINARY:
        sa = d.cast(pa.large_binary())
        offs = np.frombuffer(sa.buffers()[1], dtype=np.int64,
                             count=len(sa) + 1, offset=8 * sa.offset)
        lengths = np.diff(offs)
        buf = sa.buffers()[2]
        data = buf.to_pybytes()[offs[0]:offs[-1]] if buf is not None else b""
        streams.append(("DATA", data,
                        [[int(offs[int(b)] - offs[0])]
                         for b in dense_bounds]))
        raw, poss = _seg_rle(lengths, False, dense_bounds)
        streams.append(("LENGTH", raw, poss))
    elif node.kind == _TYPE_TIMESTAMP:
        # C++ ORC dialect: seconds truncated toward ZERO, SIGNED scaled
        # nanos for pre-1970 fractions (pyarrow writes -0.5s as secs=0,
        # nanos=-5e8 → frac -33); readers apply the Java positive-nanos
        # adjustment only when nanos > 999999, which signed nanos dodge.
        from ..stripe.columns import (_ORC_EPOCH_S, _UNIT_FACTOR,
                                      _encode_orc_nanos)

        factor = _UNIT_FACTOR[t.unit]
        v = d.cast(pa.int64()).to_numpy(zero_copy_only=False)
        secs = v // factor
        rem = v - secs * factor            # in [0, factor)
        negfrac = ((v < 0) & (rem != 0)).astype(np.int64)
        secs = secs + negfrac              # truncate toward zero
        nanos = (rem - negfrac * factor) * (1_000_000_000 // factor)
        raw, poss = _seg_rle(secs - _ORC_EPOCH_S, True, dense_bounds)
        streams.append(("DATA", raw, poss))
        raw, poss = _seg_rle(_encode_orc_nanos(nanos), False, dense_bounds)
        streams.append(("SECONDARY", raw, poss))
    elif node.kind == _TYPE_DATE:
        days = d.cast(pa.int32()).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        raw, poss = _seg_rle(days, True, dense_bounds)
        streams.append(("DATA", raw, poss))
    elif node.kind == _TYPE_DECIMAL:
        buf = d.buffers()[1]
        pairs = np.frombuffer(buf, dtype=np.int64,
                              count=2 * (d.offset + len(d)))
        mant = pairs.reshape(-1, 2)[d.offset:d.offset + len(d), 0].copy()
        raw, poss = _seg_varint(mant, True, dense_bounds)
        streams.append(("DATA", raw, poss))
        raw, poss = _seg_rle(np.full(len(d), t.scale, dtype=np.int64),
                             True, dense_bounds)
        streams.append(("SECONDARY", raw, poss))
    elif node.kind == _TYPE_STRING:
        import pyarrow.compute as pc

        uniq = pc.unique(d)
        if len(d) and len(uniq) / len(d) <= 0.8:
            # the reference's dictionary-vs-direct decision (StringWriter
            # .cs:89-92, 155-249): sorted dictionary, unsigned id stream
            dct = uniq.sort()
            ids = pc.index_in(d, value_set=dct).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            entries = dct.cast(pa.large_string())
            offs = np.frombuffer(entries.buffers()[1], dtype=np.int64,
                                 count=len(entries) + 1)
            blob_buf = entries.buffers()[2]
            blob = blob_buf.to_pybytes()[offs[0]:offs[-1]] \
                if blob_buf is not None else b""
            dlens = np.diff(offs)
            raw, poss = _seg_rle(ids, False, dense_bounds)
            streams.append(("DATA", raw, poss))
            streams.append(("DICTIONARY_DATA", blob, None))
            streams.append(("LENGTH",
                            rlev2.encode(dlens, signed=False), None))
            enc_msg = pb_msg(pb_field(1, _ENC_DICTIONARY_V2),
                             pb_field(2, len(entries)))
        else:
            sa = d.cast(pa.large_string())
            offs = np.frombuffer(sa.buffers()[1], dtype=np.int64,
                                 count=len(sa) + 1, offset=8 * sa.offset)
            lengths = np.diff(offs)
            buf = sa.buffers()[2]
            data = buf.to_pybytes()[offs[0]:offs[-1]] \
                if buf is not None else b""
            streams.append(("DATA", data,
                            [[int(offs[int(b)] - offs[0])]
                             for b in dense_bounds]))
            raw, poss = _seg_rle(lengths, False, dense_bounds)
            streams.append(("LENGTH", raw, poss))
    else:  # pragma: no cover
        raise NotImplementedError(f"ORC writer: node kind {node.kind}")
    encs[node.id] = enc_msg
    recs.extend((_KIND[n], node.id, r, p) for n, r, p in streams)


def _collect_node_arrays(node: _Node, arr, out: dict) -> None:
    """Full-table row-space array per node id (for file-level stats)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    out[node.id] = a
    if node.kind == _TYPE_MAP:
        d = a.drop_null() if a.null_count else a
        off = np.asarray(d.offsets, dtype=np.int64) if len(d) \
            else np.zeros(1, dtype=np.int64)
        keys = d.keys.slice(int(off[0]), int(off[-1] - off[0]))
        items = d.items.slice(int(off[0]), int(off[-1] - off[0]))
        _collect_node_arrays(node.children[0], keys, out)
        _collect_node_arrays(node.children[1], items, out)
    elif node.kind == _TYPE_LIST:
        _collect_node_arrays(node.children[0], a.drop_null().flatten(), out)
    elif node.kind == _TYPE_STRUCT:
        d = a.drop_null() if a.null_count else a
        for fi, child in enumerate(node.children):
            _collect_node_arrays(child, d.field(fi), out)


# --- framing with chunk table (for compressed position conversion) ----------


def _frame_chunks(raw: bytes, compression: str,
                  block: int = 256 * 1024) -> tuple[bytes, list | None]:
    """ORC compressed-stream framing: 3-byte LE header per chunk,
    (len << 1) | is_original; compressed body, stored when bigger.
    Returns (framed bytes, [(decompressed offset, compressed offset)] per
    chunk — None when compression is 'none')."""
    if compression == "none":
        return raw, None
    out = bytearray()
    table: list[tuple[int, int]] = []
    for i in range(0, max(len(raw), 1), block):
        chunk = raw[i:i + block]
        table.append((i, len(out)))
        if compression == "zlib":
            comp = zlib.compress(chunk, 6)[2:-4]  # raw deflate body
        else:  # zstd frame (ORC compression kind 5)
            comp = bytes(pa.Codec("zstd").compress(chunk))
        if len(comp) < len(chunk):
            out += int.to_bytes(len(comp) << 1, 3, "little") + comp
        else:
            out += int.to_bytes((len(chunk) << 1) | 1, 3, "little") + chunk
    return bytes(out), table


def _frame(raw: bytes, compression: str, block: int = 256 * 1024) -> bytes:
    return _frame_chunks(raw, compression, block)[0]


def _conv_positions(poss: list | None, table: list | None) -> list | None:
    """Raw-domain positions → file positions: with compression the stream
    offset becomes (compressed chunk offset, offset in decompressed
    chunk); RLE-state values pass through."""
    if poss is None or table is None:
        return poss
    decomps = [t[0] for t in table]
    out = []
    for p in poss:
        k = bisect_right(decomps, p[0]) - 1
        out.append([table[k][1], p[0] - table[k][0]] + p[1:])
    return out


# --- file assembly -----------------------------------------------------------


def write_orc(table: pa.Table, path: str, compression: str = "zlib",
              stripe_rows: int | None = None,
              row_index_stride: int = _DEFAULT_STRIDE,
              bloom_columns: list[str] | tuple[str, ...] = (),
              bloom_fpp: float = 0.05) -> None:
    """Write a multi-stripe ORC file (readable by Apache ORC readers).

    ``stripe_rows`` rows per stripe (default: sized so a stripe holds
    ~64 MB of Arrow data, the reference's stripe budget); a ROW_INDEX
    stream per column with exact seek positions and per-row-group stats
    every ``row_index_stride`` rows (0 disables); per-stripe column stats
    in the Metadata section.

    ``bloom_columns``: top-level int/float/string/binary/date columns to
    also get a BLOOM_FILTER_UTF8 (kind 8) stream — one spec bloom per row
    group (expected entries = stride, ``bloom_fpp``), hash-pinned
    byte-identical to the C++/Java ORC writers, so external engines can
    skip row groups on equality predicates (and ``read_orc_files`` /
    ``import-orc`` prune stripes). Exceeds the reference, which never
    implemented bloom filters."""
    from ..codecs import orc_bloom

    comp_enum = {"none": 0, "zlib": 1, "zstd": 5}[compression]
    n_rows = table.num_rows
    if bloom_columns and not row_index_stride:
        raise ValueError("bloom_columns require row_index_stride > 0")
    missing = [c for c in bloom_columns if c not in table.column_names]
    if missing:
        raise ValueError(f"bloom_columns not in table: {missing}")

    next_id = [1]  # 0 = root struct
    roots = [_build_node(table.column(i).type, next_id)
             for i in range(table.num_columns)]
    bloom_ids = {}
    for ci, name in enumerate(table.column_names):
        if name in bloom_columns:
            if orc_bloom.hash_arrow_values(
                    table.column(ci).slice(0, 0).combine_chunks()) is None:
                raise ValueError(
                    f"bloom_columns: no ORC bloom hash for column {name!r} "
                    f"of type {table.column(ci).type}")
            bloom_ids[roots[ci].id] = name
    n_ids = next_id[0]
    types = [pb_msg(pb_field(1, _TYPE_STRUCT),
                    *[pb_field(2, r.id) for r in roots],
                    *[pb_field(3, name) for name in table.column_names])]
    for r in roots:
        types.extend(_type_msgs(r))

    if stripe_rows is None:
        bpr = max(1, table.nbytes // max(n_rows, 1))
        stripe_rows = max(1, min(n_rows or 1,
                                 _DEFAULT_STRIPE_BYTES // bpr))
    slices = [table.slice(o, min(stripe_rows, n_rows - o))
              for o in range(0, n_rows, stripe_rows)] or [table]

    body = bytearray(b"ORC")
    stripe_info_msgs: list[bytes] = []
    stripe_stats_msgs: list[list[bytes]] = []
    for sl in slices:
        k_rows = sl.num_rows
        stride = row_index_stride if row_index_stride else max(k_rows, 1)
        bounds = np.arange(0, max(k_rows, 1), stride, dtype=np.int64)
        recs: list = []
        encs: dict[int, bytes] = {0: pb_msg(pb_field(1, _ENC_DIRECT))}
        stats_rows: list = []
        for ci, rnode in enumerate(roots):
            _encode_node_stripe(rnode, sl.column(ci), bounds,
                                recs, encs, stats_rows)
        framed = []
        for kind, cid, raw, poss in recs:
            fb, chtable = _frame_chunks(raw, compression)
            framed.append((kind, cid, fb, _conv_positions(poss, chtable)))
        stats_by_id = {nid: (a, rb) for nid, a, rb in stats_rows}
        # ROW_INDEX streams (index region, one per column id)
        index_recs: list[tuple[int, int, bytes]] = []
        if row_index_stride:
            K = len(bounds)
            by_id: dict[int, list] = {}
            for kind, cid, _, poss in framed:
                if poss is not None:
                    by_id.setdefault(cid, []).append(poss)
            for nid in range(n_ids):
                entries = []
                for k in range(K):
                    pos_vals = [v for poss in by_id.get(nid, [])
                                for v in poss[k]]
                    if nid == 0:
                        lo = int(bounds[k])
                        hi = int(bounds[k + 1]) if k + 1 < K else k_rows
                        stm = _stats_msg(None, hi - lo)
                    else:
                        a, rb = stats_by_id[nid]
                        lo = int(rb[k])
                        hi = int(rb[k + 1]) if k + 1 < K else len(a)
                        stm = _stats_msg(a.slice(lo, hi - lo))
                    fields = []
                    if pos_vals:
                        fields.append(pb_field(
                            1, b"".join(_vint(int(v)) for v in pos_vals)))
                    fields.append(pb_field(2, stm))
                    entries.append(pb_msg(*fields))
                ri = pb_msg(*[pb_field(1, e) for e in entries])
                index_recs.append((_KIND["ROW_INDEX"], nid,
                                   _frame(ri, compression)))
                if nid in bloom_ids:
                    # BLOOM_FILTER_UTF8: one spec bloom per row group over
                    # the group's non-null values (liborc stream order:
                    # right after the column's ROW_INDEX)
                    from ..codecs import orc_bloom

                    a, rb = stats_by_id[nid]
                    blooms = []
                    for k in range(K):
                        lo = int(rb[k])
                        hi = int(rb[k + 1]) if k + 1 < K else len(a)
                        hashes = orc_bloom.hash_arrow_values(
                            a.slice(lo, hi - lo))
                        nh, bits = orc_bloom.bloom_build(
                            hashes, row_index_stride, bloom_fpp)
                        blooms.append(pb_msg(pb_field(1, nh),
                                             pb_field(3, bits)))
                    bfi = pb_msg(*[pb_field(1, b) for b in blooms])
                    index_recs.append((8, nid, _frame(bfi, compression)))
        index_bytes = b"".join(fb for _, _, fb in index_recs)
        data_bytes = b"".join(fb for _, _, fb, _ in framed)
        stripe_footer = pb_msg(
            *[pb_field(1, pb_msg(pb_field(1, k), pb_field(2, c),
                                 pb_field(3, len(fb))))
              for k, c, fb in index_recs],
            *[pb_field(1, pb_msg(pb_field(1, k), pb_field(2, c),
                                 pb_field(3, len(fb))))
              for k, c, fb, _ in framed],
            *[pb_field(2, encs[i]) for i in range(n_ids)],
            pb_field(3, "UTC"),  # writerTimezone (UTC-normalized)
        )
        sff = _frame(stripe_footer, compression)
        stripe_info_msgs.append(pb_msg(
            pb_field(1, len(body)), pb_field(2, len(index_bytes)),
            pb_field(3, len(data_bytes)), pb_field(4, len(sff)),
            pb_field(5, k_rows)))
        body += index_bytes + data_bytes + sff
        stripe_stats_msgs.append(
            [_stats_msg(None, k_rows) if nid == 0
             else _stats_msg(stats_by_id[nid][0]) for nid in range(n_ids)])

    # Metadata: per-stripe column statistics
    metadata = pb_msg(*[pb_field(1, pb_msg(*[pb_field(1, cs) for cs in ss]))
                        for ss in stripe_stats_msgs])
    metadata_framed = _frame(metadata, compression)
    # file-level statistics from the full table (true per-node counts)
    file_arrays: dict[int, pa.Array] = {}
    for ci, rnode in enumerate(roots):
        _collect_node_arrays(rnode, table.column(ci), file_arrays)
    file_stats = [_stats_msg(None, n_rows) if nid == 0
                  else _stats_msg(file_arrays[nid]) for nid in range(n_ids)]
    footer = pb_msg(
        pb_field(1, 3),                                   # headerLength
        pb_field(2, len(body)),                           # contentLength
        *[pb_field(3, si) for si in stripe_info_msgs],
        *[pb_field(4, t) for t in types],
        pb_field(6, n_rows),
        *[pb_field(7, st) for st in file_stats],          # file column stats
        pb_field(8, row_index_stride),
        # writer = ORC_CPP: this writer's DOUBLE bloom hashing follows
        # liborc's arithmetic-shift dialect, which is what this field
        # disambiguates (Java hashes doubles differently)
        pb_field(9, 1),
    )
    footer_framed = _frame(footer, compression)
    postscript = pb_msg(
        pb_field(1, len(footer_framed)),
        pb_field(2, comp_enum),
        pb_field(3, 256 * 1024),
        pb_field(4, 0), pb_field(4, 12),                  # version 0.12
        pb_field(5, len(metadata_framed)),
        pb_field(6, 6),     # writerVersion ORC_517 (same as liborc; ≥
                            # ORC_101 so readers trust kind-8 blooms)
        pb_field(8000, "ORC"),
    )
    assert len(postscript) < 256
    with open(path, "wb") as f:
        f.write(bytes(body))
        f.write(metadata_framed)
        f.write(footer_framed)
        f.write(postscript)
        f.write(bytes([len(postscript)]))


def write_orc_dataset(ds, out_dir: str, compression: str = "zlib",
                      prefix: str = "part",
                      stripe_rows: int | None = None,
                      row_index_stride: int = _DEFAULT_STRIDE,
                      bloom_columns: list[str] | tuple[str, ...] = (),
                      bloom_fpp: float = 0.05) -> int:
    """Ray Data sink: one ``.orc`` file per input block (resumable
    partitioned output — a failed run just rewrites missing parts).
    Returns the number of files written."""
    import os

    import ray.data as rd  # noqa: F401  (type context)

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        name = f"{prefix}-{uuid.uuid4().hex[:12]}.orc"
        tmp = os.path.join(out_dir, "." + name)
        write_orc(batch, tmp, compression=compression,
                  stripe_rows=stripe_rows,
                  row_index_stride=row_index_stride,
                  bloom_columns=bloom_columns, bloom_fpp=bloom_fpp)
        os.rename(tmp, os.path.join(out_dir, name))  # atomic publish
        return pa.table({"path": pa.array([os.path.join(out_dir, name)]),
                         "rows": pa.array([batch.num_rows], type=pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None).take_all()
    return len(manifest)
