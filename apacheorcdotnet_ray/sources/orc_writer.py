"""Apache ORC writer: this repo's codecs emitting REAL ``.orc`` files.

The reference's headline capability is writing ORC files other engines can
read (``/root/reference/src/ApacheOrcDotNet/OrcWriter.cs``,
``Stripes/StripeWriter.cs:241-333``). This module closes that gap for the
Ray engine: integer columns go through ``codecs.rlev2`` (the byte-faithful
reimplementation of the reference's writer), strings through DIRECT_V2
LENGTH streams, doubles as IEEE-LE, nulls through ``codecs.bool_rle``
PRESENT streams — all laid out per the public ORC spec (magic, stripes,
protobuf StripeFooter/Footer/PostScript, ZLIB or ZSTD chunk framing).
Conformance check: ``tests/test_orc_conformance.py`` round-trips files
through BOTH pyarrow's independent C++ ORC reader and this repo's
``orc_reader``.

Supported column types: int8/16/32/64 → LONG, string, float64 → DOUBLE,
bool → BOOLEAN, timestamp → TIMESTAMP (the container's shared two-stream
kernel: floor-division seconds + trailing-zero-stripped nanos), date32 →
DATE, decimal(≤18 digits) → DECIMAL (varint mantissas + RLEv2 scales);
nullable throughout. Nested types stay on the repo's own container format,
which is the production surface.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..codecs import bool_rle, rlev2

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


def pb_msg(*fields: bytes) -> bytes:
    return b"".join(fields)


# --- stream building ---------------------------------------------------------

_KIND = {"PRESENT": 0, "DATA": 1, "LENGTH": 2, "SECONDARY": 5}
_TYPE_LONG, _TYPE_STRING, _TYPE_DOUBLE, _TYPE_BOOLEAN, _TYPE_STRUCT = 4, 7, 6, 0, 12
_TYPE_TIMESTAMP, _TYPE_DECIMAL, _TYPE_DATE = 9, 14, 15
_ENC_DIRECT, _ENC_DIRECT_V2 = 0, 2


def _frame(raw: bytes, compression: str, block: int = 256 * 1024) -> bytes:
    """ORC compressed-stream framing: 3-byte LE header per chunk,
    (len << 1) | is_original; compressed body, stored when bigger."""
    if compression == "none":
        return raw
    out = bytearray()
    for i in range(0, len(raw), block):
        chunk = raw[i:i + block]
        if compression == "zlib":
            comp = zlib.compress(chunk, 6)[2:-4]  # raw deflate body
        else:  # zstd frame (ORC compression kind 5)
            import pyarrow as _pa

            comp = bytes(_pa.Codec("zstd").compress(chunk))
        if len(comp) < len(chunk):
            out += int.to_bytes(len(comp) << 1, 3, "little") + comp
        else:
            out += int.to_bytes((len(chunk) << 1) | 1, 3, "little") + chunk
    return bytes(out)


def _column_streams(col: pa.ChunkedArray | pa.Array) -> tuple[int, list[tuple[str, bytes]]]:
    """(orc type kind, [(stream kind name, raw bytes)]) for one column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    streams: list[tuple[str, bytes]] = []
    if arr.null_count:
        present = np.invert(np.asarray(arr.is_null()))
        streams.append(("PRESENT", bool_rle.encode(present)))
        arr = arr.drop_null()
    t = arr.type
    if pa.types.is_integer(t):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        streams.append(("DATA", rlev2.encode(vals, signed=True)))
        return _TYPE_LONG, streams
    if pa.types.is_boolean(t):
        streams.append(("DATA", bool_rle.encode(
            arr.to_numpy(zero_copy_only=False).astype(bool))))
        return _TYPE_BOOLEAN, streams
    if pa.types.is_floating(t):
        vals = arr.to_numpy(zero_copy_only=False).astype("<f8")
        streams.append(("DATA", vals.tobytes()))
        return _TYPE_DOUBLE, streams
    if pa.types.is_timestamp(t):
        # ORC two-stream layout (shared kernel with the repo container):
        # DATA = signed seconds since 2015-01-01 UTC, SECONDARY = nanos
        # with trailing decimal zeros stripped, (scaled << 3) | zeros
        from ..stripe.columns import _encode_orc_nanos, _ORC_EPOCH_S, _UNIT_FACTOR

        factor = _UNIT_FACTOR[t.unit]
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        secs = v // factor - _ORC_EPOCH_S
        nanos = (v % factor) * (1_000_000_000 // factor)
        streams.append(("DATA", rlev2.encode(secs, signed=True)))
        streams.append(("SECONDARY",
                        rlev2.encode(_encode_orc_nanos(nanos), signed=False)))
        return _TYPE_TIMESTAMP, streams
    if pa.types.is_date(t):
        days = arr.cast(pa.int32()).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        streams.append(("DATA", rlev2.encode(days, signed=True)))
        return _TYPE_DATE, streams
    if pa.types.is_decimal(t):
        from ..codecs import varint

        mant = np.array([int(v.as_py().scaleb(t.scale)) for v in arr],
                        dtype=np.int64)
        streams.append(("DATA", varint.encode(mant, signed=True)))
        streams.append(("SECONDARY", rlev2.encode(
            np.full(len(arr), t.scale, dtype=np.int64), signed=True)))
        return (_TYPE_DECIMAL,
                pb_field(5, t.precision) + pb_field(6, t.scale)), streams
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        sa = arr.cast(pa.large_string())
        offs = np.frombuffer(sa.buffers()[1], dtype=np.int64,
                             count=len(sa) + 1, offset=8 * sa.offset)
        lengths = np.diff(offs)
        buf = sa.buffers()[2]
        data = buf.to_pybytes()[offs[0]:offs[-1]] if buf is not None else b""
        streams.append(("DATA", data))
        streams.append(("LENGTH", rlev2.encode(lengths, signed=False)))
        return _TYPE_STRING, streams
    raise NotImplementedError(f"ORC writer: unsupported type {t}")


def write_orc(table: pa.Table, path: str, compression: str = "zlib") -> None:
    """Write one single-stripe ORC file (readable by Apache ORC readers)."""
    comp_enum = {"none": 0, "zlib": 1, "zstd": 5}[compression]
    n_rows = table.num_rows
    n_cols = table.num_columns

    # per-column streams, in ORC column order (0 = struct root, no streams)
    stream_recs: list[tuple[int, int, bytes]] = []  # (kind, column, framed)
    kinds: list[int] = []
    encodings = [pb_msg(pb_field(1, _ENC_DIRECT))]  # root struct
    extras: list[bytes] = []
    for ci in range(n_cols):
        tkind, streams = _column_streams(table.column(ci))
        tkind, extra = tkind if isinstance(tkind, tuple) else (tkind, b"")
        kinds.append(tkind)
        extras.append(extra)
        enc = _ENC_DIRECT_V2 if tkind in (_TYPE_LONG, _TYPE_STRING,
                                          _TYPE_TIMESTAMP, _TYPE_DATE,
                                          _TYPE_DECIMAL) else _ENC_DIRECT
        encodings.append(pb_msg(pb_field(1, enc)))
        for sk, raw in streams:
            stream_recs.append((_KIND[sk], ci + 1, _frame(raw, compression)))

    data = b"".join(framed for _, _, framed in stream_recs)
    stripe_footer = pb_msg(
        *[pb_field(1, pb_msg(pb_field(1, k), pb_field(2, c),
                             pb_field(3, len(framed))))
          for k, c, framed in stream_recs],
        *[pb_field(2, e) for e in encodings],
        pb_field(3, "UTC"),  # writerTimezone (timestamps are UTC-normalized)
    )
    stripe_footer_framed = _frame(stripe_footer, compression)

    # types: root struct lists subtypes + field names, then leaves
    types = [pb_msg(pb_field(1, _TYPE_STRUCT),
                    *[pb_field(2, i + 1) for i in range(n_cols)],
                    *[pb_field(3, name) for name in table.column_names])]
    types += [pb_msg(pb_field(1, k) + x) for k, x in zip(kinds, extras)]

    stripe_offset = 3  # after magic
    stripe_info = pb_msg(
        pb_field(1, stripe_offset), pb_field(2, 0),  # no index streams
        pb_field(3, len(data)), pb_field(4, len(stripe_footer_framed)),
        pb_field(5, n_rows))
    footer = pb_msg(
        pb_field(1, 3),                                   # headerLength
        pb_field(2, 3 + len(data) + len(stripe_footer_framed)),  # contentLength
        pb_field(3, stripe_info),
        *[pb_field(4, t) for t in types],
        pb_field(6, n_rows),
        pb_field(8, 0),                                   # rowIndexStride
    )
    footer_framed = _frame(footer, compression)
    metadata_framed = _frame(pb_msg(), compression)
    postscript = pb_msg(
        pb_field(1, len(footer_framed)),
        pb_field(2, comp_enum),
        pb_field(3, 256 * 1024),
        pb_field(4, 0), pb_field(4, 12),                  # version 0.12
        pb_field(5, len(metadata_framed)),
        pb_field(6, 1),                                   # writerVersion
        pb_field(8000, "ORC"),
    )
    assert len(postscript) < 256
    with open(path, "wb") as f:
        f.write(b"ORC")
        f.write(data)
        f.write(stripe_footer_framed)
        f.write(metadata_framed)
        f.write(footer_framed)
        f.write(postscript)
        f.write(bytes([len(postscript)]))


def write_orc_dataset(ds, out_dir: str, compression: str = "zlib",
                      prefix: str = "part") -> int:
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
        write_orc(batch, tmp, compression=compression)
        os.rename(tmp, os.path.join(out_dir, name))  # atomic publish
        return pa.table({"path": pa.array([os.path.join(out_dir, name)]),
                         "rows": pa.array([batch.num_rows], type=pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None).take_all()
    return len(manifest)
