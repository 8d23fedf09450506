"""Arrow column ↔ encoded streams, with per-chunk codec auto-selection.

The Ray-Data-native analog of the reference's ``ColumnTypes/*Writer.cs`` /
``*Reader.cs`` pairs: each Arrow column chunk is decomposed into named streams
(PRESENT / DATA / LENGTH / DICT_DATA / DICT_LENGTH — mirroring
``Protocol/Stream.cs:10-29``) encoded with vectorized codec kernels. Nulls
become a PRESENT bool-RLE stream that is only emitted when at least one null
occurred (same rule as ``ColumnTypes/LongWriter.cs:78-79``); ``list`` columns
decompose into a LENGTH stream plus recursively-encoded flattened child values
(the reference's Binary/String writer shape, ``ColumnTypes/BinaryWriter.cs:49-82``
— the central mapping for the ``tokens: list<int32>`` column).

Codec selection samples each chunk (generalizing the reference's
dictionary-vs-direct sample decision, ``ColumnTypes/StringWriter.cs:83-96``)
and competes the allow-listed codecs on actual encoded size, with RLEv2 as the
parity floor for integers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs import bool_rle, bss, byte_rle, for_, fsst, intdict, rlev2, varint
from .config import EncodeConfig
from .stats import column_stats

PRESENT = "PRESENT"
DATA = "DATA"
LENGTH = "LENGTH"
DICT_DATA = "DICT_DATA"
DICT_LENGTH = "DICT_LENGTH"
SECONDARY = "SECONDARY"


@dataclass
class Stream:
    col: str          # column path ("tokens", "tokens.item")
    kind: str
    codec: str
    data: bytes
    n: int            # number of logical values encoded
    params: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# integer data-stream encode/decode with selection


def _unique_ratio(sample: np.ndarray) -> float:
    if len(sample) == 0:
        return 1.0
    return len(np.unique(sample)) / len(sample)


def _encode_int_data(vals: np.ndarray, config: EncodeConfig, signed: bool = True) -> tuple[str, bytes]:
    """Pick the smallest codec by competing on a sample; RLEv2 is the floor."""
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    sample = vals[: config.selector_sample_size]
    aligned = config.aligned_bit_widths
    sizes: dict[str, int] = {}
    sizes["rlev2"] = len(rlev2.encode(sample, signed, aligned))
    if "for" in config.int_codecs:
        f = for_.encode(sample)
        if f is not None:
            sizes["for"] = len(f)
    if "intdict" in config.int_codecs and _unique_ratio(sample) <= config.intdict_max_card_ratio:
        d = intdict.encode(sample)
        if d is not None:
            sizes["intdict"] = len(d)
    best = min(sizes, key=lambda k: sizes[k])
    # prefer the parity floor unless the challenger wins by ≥10% on the sample
    if best != "rlev2" and sizes[best] >= 0.9 * sizes["rlev2"]:
        best = "rlev2"
    if best == "for":
        enc = for_.encode(vals)
        if enc is not None:
            return "for", enc
    elif best == "intdict":
        enc = intdict.encode(vals)
        if enc is not None:
            return "intdict", enc
    return "rlev2", rlev2.encode(vals, signed, aligned)


def _decode_int_data(stream: Stream) -> np.ndarray:
    if stream.codec == "rlev2":
        return rlev2.decode(stream.data, stream.params.get("signed", True), stream.n)
    if stream.codec == "rlev2u":
        return rlev2.decode(stream.data, False, stream.n)
    if stream.codec == "for":
        return for_.decode(stream.data)
    if stream.codec == "intdict":
        return intdict.decode(stream.data, stream.n)
    if stream.codec == "varint":
        return varint.decode(stream.data, stream.n, stream.params.get("signed", True))
    raise ValueError(f"unknown int codec {stream.codec}")


# ---------------------------------------------------------------------------
# ORC timestamp fraction codec (TimestampWriter.cs RemoveZeros semantics)

_ORC_EPOCH_S = 1_420_070_400  # 2015-01-01T00:00:00Z in unix seconds
_UNIT_FACTOR = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}
# scale s in the low 3 bits means scaled was multiplied back by this
_NANO_MULT = np.array([1, 100, 10**3, 10**4, 10**5, 10**6, 10**7, 10**8],
                      dtype=np.int64)


def _encode_orc_nanos(nanos: np.ndarray) -> np.ndarray:
    """(scaled << 3) | scale, scale = count of stripped decimal zeros - 1
    (0 = none stripped), vectorized over the column."""
    scaled = nanos.copy()
    scale = np.zeros(len(nanos), dtype=np.int64)
    done = np.zeros(len(nanos), dtype=bool)
    for s in range(7, 0, -1):
        div = _NANO_MULT[s]
        m = ~done & (nanos % div == 0)
        scaled[m] = nanos[m] // div
        scale[m] = s
        done |= m
    return (scaled << 3) | scale


def _decode_orc_nanos(frac: np.ndarray) -> np.ndarray:
    return (frac >> 3) * _NANO_MULT[frac & 7]


# ---------------------------------------------------------------------------
# column encode


def encode_column(
    name: str, arr: pa.Array | pa.ChunkedArray, config: EncodeConfig,
    fsst_tables: dict | None = None,
) -> tuple[str, list[Stream], dict]:
    """Returns (encoding_name, streams, stats) for one top-level column chunk.

    ``fsst_tables`` is an optional mutable per-actor cache (column name →
    trained FSST symbol table): pass the same dict across stripes of one
    ``source`` to amortize symbol-table training (the north-star stateful
    actor-pool pattern; cf. the reference's per-stripe dictionary state,
    StringWriter.cs:155-175)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if config.column_overrides:
        ov = config.column_overrides.get(name.split(".", 1)[0])
        if ov:
            from dataclasses import replace

            config = replace(config, **ov, column_overrides={})
    stats = column_stats(arr)
    streams: list[Stream] = []
    n = len(arr)

    if arr.null_count > 0:
        mask = np.invert(arr.is_null().to_numpy(zero_copy_only=False))
        streams.append(Stream(name, PRESENT, "boolrle", bool_rle.encode(mask), n))
        valid = arr.drop_null()
    else:
        valid = arr

    enc_name = _encode_values(name, valid, config, streams, fsst_tables)
    return enc_name, streams, stats


def _encode_values(name: str, valid: pa.Array, config: EncodeConfig,
                   streams: list[Stream], fsst_tables: dict | None = None) -> str:
    """Encode the non-null values of a column into DATA/LENGTH/... streams."""
    t = valid.type
    nv = len(valid)

    if pa.types.is_integer(t):
        if t.bit_width == 8:
            # 8-bit columns take the reference's ByteRLE path
            # (ColumnTypes/ByteWriter.cs; sbyte is viewed as its byte pattern)
            raw = valid.to_numpy(zero_copy_only=False).astype(
                np.int8 if pa.types.is_signed_integer(t) else np.uint8, copy=False
            ).view(np.uint8)
            streams.append(Stream(name, DATA, "byterle", byte_rle.encode(raw), nv))
            return "byterle"
        vals = valid.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        codec, enc = _encode_int_data(vals, config, signed=True)
        streams.append(Stream(name, DATA, codec, enc, nv, {"signed": True}))
        return codec

    if pa.types.is_decimal(t):
        if not pa.types.is_decimal128(t):
            raise NotImplementedError(
                f"decimal column {name}: only decimal128 (precision<=38) is supported")
        # decimal128 mantissas: the common case (precision <= 18, like the
        # reference, ColumnTypes/DecimalWriter.cs:30-31) fits int64 and takes
        # a single zigzag-varint DATA stream; wider mantissas (precision up
        # to 38) split into low-64 (unsigned varint DATA) + high-64 (zigzag
        # varint SECONDARY) lanes — the analog of the reference reader's
        # BigInteger varint path (Encodings/BitManipulation.cs:313-425).
        # Arrow's scale is per-type, so no scale stream is needed.
        lanes = np.frombuffer(
            valid.buffers()[1], dtype=np.int64, count=2 * nv, offset=valid.offset * 16
        )
        lo, hi = lanes[0::2], lanes[1::2]
        if (hi == (lo >> 63)).all():
            streams.append(Stream(name, DATA, "varint", varint.encode(lo, True), nv,
                                  {"signed": True}))
            return "varint"
        streams.append(Stream(name, DATA, "varint", varint.encode(lo, False), nv,
                              {"signed": False}))
        streams.append(Stream(name, SECONDARY, "varint", varint.encode(hi, True), nv,
                              {"signed": True}))
        return "varint2"

    if pa.types.is_timestamp(t):
        # ORC-layout two-stream timestamps (TimestampWriter.cs:111-161):
        # DATA = signed seconds since the ORC epoch (2015-01-01 UTC),
        # SECONDARY = nanos with trailing decimal zeros stripped, encoded
        # (scaled << 3) | zeros_removed. We use floor division so pre-2015
        # values round-trip exactly (the C# writer truncates toward zero and
        # abs()es the remainder, which is lossy there — deliberate fix).
        factor = _UNIT_FACTOR[t.unit]
        v = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
        secs = v // factor - _ORC_EPOCH_S
        nanos = (v % factor) * (1_000_000_000 // factor)
        codec_s, enc_s = _encode_int_data(secs, config, signed=True)
        streams.append(Stream(name, DATA, codec_s, enc_s, nv, {"signed": True}))
        frac = _encode_orc_nanos(nanos)
        codec_f, enc_f = _encode_int_data(frac, config, signed=False)
        streams.append(Stream(name, SECONDARY, codec_f, enc_f, nv, {"signed": False}))
        return "timestamp2"

    if pa.types.is_date(t):
        # date32 has no direct int64 cast; bridge through its storage width
        via = valid.cast(pa.int32()) if t == pa.date32() else valid
        vals = via.cast(pa.int64()).to_numpy(zero_copy_only=False)
        codec, enc = _encode_int_data(vals, config, signed=True)
        streams.append(Stream(name, DATA, codec, enc, nv, {"signed": True}))
        return codec

    if pa.types.is_boolean(t):
        b = valid.to_numpy(zero_copy_only=False)
        streams.append(Stream(name, DATA, "boolrle", bool_rle.encode(b), nv))
        return "boolrle"

    if pa.types.is_floating(t):
        # raw IEEE-754 LE, like the reference (ColumnTypes/FloatWriter.cs),
        # vs byte-stream-split — competed on a zlib'd sample, since BSS only
        # pays off through the downstream block compression
        vals_np = valid.to_numpy(zero_copy_only=False)
        if ("bss" in config.float_codecs and nv
                and config.compression != "none"):
            from .framing import compress as _fcompress

            level = (config.zlib_level if config.compression == "zlib"
                     else config.zstd_level)
            sample = vals_np[: config.selector_sample_size]
            raw_c = len(_fcompress(sample.tobytes(), config.compression_block_size,
                                   level, codec=config.compression))
            bss_c = len(_fcompress(bss.encode(sample), config.compression_block_size,
                                   level, codec=config.compression))
            if bss_c < 0.98 * raw_c:
                streams.append(Stream(name, DATA, "bss", bss.encode(vals_np),
                                      nv, {"dtype": str(valid.type)}))
                return "bss"
        streams.append(Stream(name, DATA, "raw", vals_np.tobytes(), nv,
                              {"dtype": str(valid.type)}))
        return "raw"

    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        return _encode_string(name, valid, config, streams, fsst_tables)

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        offsets = valid.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(offsets)
        codec, enc = _encode_int_data(lengths, config, signed=False)
        streams.append(Stream(name, LENGTH, codec, enc, nv, {"signed": False}))
        child = valid.flatten()
        child_enc, child_streams, _ = encode_column(f"{name}.item", child, config, fsst_tables)
        streams.extend(child_streams)
        return f"list[{child_enc}]"

    if pa.types.is_dictionary(t):
        # dictionary-typed (categorical) input: encode the logical values —
        # the string/int dict codecs re-discover the dictionary anyway, and
        # decode rebuilds the categorical type from the stored schema
        child_enc, child_streams, _ = encode_column(
            f"{name}.values", valid.cast(t.value_type), config, fsst_tables)
        streams.extend(child_streams)
        return f"cat[{child_enc}]"

    if pa.types.is_fixed_size_list(t):
        # fixed-size list (embedding vectors): no LENGTH stream needed —
        # the width lives in the type; child values encode flattened
        child = valid.flatten()
        child_enc, child_streams, _ = encode_column(
            f"{name}.item", child, config, fsst_tables)
        streams.extend(child_streams)
        return f"flist[{child_enc}]"

    if pa.types.is_map(t):
        # map<k,v> is physically list<struct<key,value>> — reuse the list
        # LENGTH stream + recursive struct child encode
        offsets = valid.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(offsets)
        codec, enc = _encode_int_data(lengths, config, signed=False)
        streams.append(Stream(name, LENGTH, codec, enc, nv, {"signed": False}))
        # .keys/.items return the FULL child arrays with absolute offsets —
        # slice to this array's window
        lo, hi = int(offsets[0]), int(offsets[-1])
        kv = pa.StructArray.from_arrays(
            [valid.keys.slice(lo, hi - lo), valid.items.slice(lo, hi - lo)],
            names=["key", "value"])
        child_enc, child_streams, _ = encode_column(
            f"{name}.entries", kv, config, fsst_tables)
        streams.extend(child_streams)
        return f"map[{child_enc}]"

    if pa.types.is_struct(t):
        # struct: no DATA stream of its own (nulls already peeled into the
        # struct-level PRESENT stream); each child field encodes recursively
        # under the dotted path "name.field" — the reference's (root-only)
        # StructWriter shape (ColumnTypes/StructWriter.cs:33-41), generalized
        # to arbitrary nesting because paths compose.
        child_names = []
        for i in range(t.num_fields):
            f_ = t.field(i)
            child_enc, child_streams, _ = encode_column(
                f"{name}.{f_.name}", valid.field(i), config, fsst_tables)
            streams.extend(child_streams)
            child_names.append(child_enc)
        return f"struct[{','.join(child_names)}]"

    raise NotImplementedError(f"unsupported Arrow type for column {name}: {t}")


def _string_bytes(valid: pa.Array) -> tuple[np.ndarray, bytes]:
    """(lengths, concatenated utf8/binary bytes) for a no-null string array."""
    if pa.types.is_large_string(valid.type):
        valid = valid.cast(pa.string())
    offsets = np.frombuffer(valid.buffers()[1], dtype=np.int32,
                            count=len(valid) + 1, offset=valid.offset * 4).astype(np.int64)
    data_buf = valid.buffers()[2]
    data = data_buf.to_pybytes()[offsets[0]: offsets[-1]] if data_buf is not None else b""
    lengths = np.diff(offsets)
    return lengths, data


def _encode_string(name: str, valid: pa.Array, config: EncodeConfig,
                   streams: list[Stream], fsst_tables: dict | None = None) -> str:
    nv = len(valid)
    if nv == 0:
        streams.append(Stream(name, DATA, "raw", b"", 0, {"dtype": "bytes"}))
        streams.append(Stream(name, LENGTH, "rlev2", b"", 0, {"signed": False}))
        return "direct"

    sample_n = min(nv, config.selector_sample_size)
    sample = valid.slice(0, sample_n)
    distinct = pc.count_distinct(sample).as_py()
    use_dict = (
        "dict" in config.string_codecs
        and distinct / sample_n <= config.dictionary_threshold
    )
    if use_dict:
        # dictionary encoding with ordinally-sorted dictionary
        # (StringWriter.cs:155-249; sort at :187-191)
        denc = valid.dictionary_encode()
        dictionary = denc.dictionary
        order = pc.array_sort_indices(dictionary)
        sorted_dict = dictionary.take(order)
        remap = np.empty(len(dictionary), dtype=np.int64)
        remap[order.to_numpy(zero_copy_only=False)] = np.arange(len(dictionary))
        ids = remap[denc.indices.to_numpy(zero_copy_only=False)]
        dlens, dbytes = _string_bytes(sorted_dict)
        streams.append(Stream(name, DICT_DATA, "raw", dbytes, len(sorted_dict), {"dtype": "bytes"}))
        streams.append(Stream(name, DICT_LENGTH, "rlev2",
                              rlev2.encode(dlens, False, config.aligned_bit_widths),
                              len(sorted_dict), {"signed": False}))
        streams.append(Stream(name, DATA, "rlev2",
                              rlev2.encode(ids, False, config.aligned_bit_widths),
                              nv, {"signed": False}))
        return "dict"

    lengths, data = _string_bytes(valid)
    len_codec, len_enc = _encode_int_data(lengths, config, signed=False)
    streams.append(Stream(name, LENGTH, len_codec, len_enc, nv, {"signed": False}))

    if config.enable_fsst and "fsst" in config.string_codecs and len(data) > 0:
        import zlib

        sample_bytes = data[: 1 << 15]
        table = fsst_tables.get(name) if fsst_tables is not None else None
        if table is None:
            table = fsst.train(sample_bytes)
            if fsst_tables is not None:
                fsst_tables[name] = table
        fsst_sample = fsst.encode_chunk(sample_bytes, table=table)
        # compare post-zlib sizes — both streams get block-compressed later
        z_direct = len(zlib.compress(sample_bytes, 1))
        z_fsst = len(zlib.compress(fsst_sample, 1))
        if z_fsst < 0.9 * z_direct:
            streams.append(Stream(name, DATA, "fsst", fsst.encode_chunk(data, table=table), nv))
            return "fsst"

    streams.append(Stream(name, DATA, "raw", data, nv, {"dtype": "bytes"}))
    return "direct"


# ---------------------------------------------------------------------------
# column decode


def decode_column(field_: pa.Field, streams: list[Stream], n_rows: int) -> pa.Array:
    """Rebuild one top-level Arrow column from its streams (zero row objects)."""
    by_kind = {}
    child_streams = []
    for s in streams:
        if s.col == field_.name:
            by_kind[s.kind] = s
        else:
            child_streams.append(s)

    present = by_kind.get(PRESENT)
    if present is not None:
        mask = bool_rle.decode(present.data, n_rows)
        n_valid = int(mask.sum())
    else:
        mask = None
        n_valid = n_rows

    values = _decode_values(field_.name, field_.type, by_kind, child_streams, n_valid)
    if mask is None:
        return values
    return _scatter_valid(values, mask, field_.type)


def _decode_values(name: str, t: pa.DataType, by_kind: dict, child_streams: list[Stream], nv: int) -> pa.Array:
    if pa.types.is_integer(t):
        if t.bit_width == 8:
            raw = byte_rle.decode(by_kind[DATA].data, nv)
            return pa.array(raw.view(np.int8 if pa.types.is_signed_integer(t) else np.uint8), type=t)
        vals = _decode_int_data(by_kind[DATA])
        return pa.array(vals, type=pa.int64()).cast(t)

    if pa.types.is_decimal(t):
        if SECONDARY in by_kind:  # two-lane path: precision > 18
            lo = varint.decode(by_kind[DATA].data, nv, False)
            hi = varint.decode(by_kind[SECONDARY].data, nv, True)
        else:
            lo = varint.decode(by_kind[DATA].data, nv, True)
            hi = lo >> 63
        lanes = np.empty(2 * nv, dtype=np.int64)
        lanes[0::2], lanes[1::2] = lo, hi
        return pa.Array.from_buffers(t, nv, [None, pa.py_buffer(lanes.tobytes())])

    if pa.types.is_timestamp(t):
        if SECONDARY not in by_kind:  # legacy single-stream layout (pre-v4)
            return pa.array(_decode_int_data(by_kind[DATA]), type=pa.int64()).cast(t)
        secs = _decode_int_data(by_kind[DATA])
        frac = _decode_int_data(by_kind[SECONDARY])
        nanos = _decode_orc_nanos(frac)
        factor = _UNIT_FACTOR[t.unit]
        v = (secs + _ORC_EPOCH_S) * factor + nanos // (1_000_000_000 // factor)
        return pa.array(v, type=pa.int64()).cast(t)

    if pa.types.is_date(t):
        vals = _decode_int_data(by_kind[DATA])
        arr = pa.array(vals, type=pa.int64())
        if t == pa.date32():
            arr = arr.cast(pa.int32())
        return arr.cast(t)

    if pa.types.is_boolean(t):
        return pa.array(bool_rle.decode(by_kind[DATA].data, nv))

    if pa.types.is_floating(t):
        dtype = np.float32 if pa.types.is_float32(t) else np.float64
        s = by_kind[DATA]
        if s.codec == "bss":
            return pa.array(bss.decode(s.data, nv, dtype), type=t)
        return pa.array(np.frombuffer(s.data, dtype=dtype, count=nv), type=t)

    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        return _decode_string(t, by_kind, nv)

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        lengths = _decode_int_data(by_kind[LENGTH])
        n_child = int(lengths.sum())
        child_field = pa.field(f"{name}.item", t.value_type)
        child = decode_column(child_field, child_streams, n_child)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(
            np.int64 if pa.types.is_large_list(t) else np.int32)
        cls = pa.LargeListArray if pa.types.is_large_list(t) else pa.ListArray
        return cls.from_arrays(pa.array(offsets), child)

    if pa.types.is_dictionary(t):
        values = decode_column(pa.field(f"{name}.values", t.value_type),
                               child_streams, nv)
        return values.dictionary_encode().cast(t)

    if pa.types.is_fixed_size_list(t):
        child = decode_column(pa.field(f"{name}.item", t.value_type),
                              child_streams, nv * t.list_size)
        return pa.FixedSizeListArray.from_arrays(child, t.list_size)

    if pa.types.is_map(t):
        lengths = _decode_int_data(by_kind[LENGTH])
        n_child = int(lengths.sum())
        entries = decode_column(
            pa.field(f"{name}.entries",
                     pa.struct([("key", t.key_type), ("value", t.item_type)])),
            child_streams, n_child)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        return pa.MapArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            entries.field(0), entries.field(1))

    if pa.types.is_struct(t):
        children = []
        for i in range(t.num_fields):
            f_ = t.field(i)
            path = f"{name}.{f_.name}"
            mine = [s for s in child_streams
                    if s.col == path or s.col.startswith(path + ".")]
            children.append(decode_column(pa.field(path, f_.type), mine, nv))
        return pa.StructArray.from_arrays(
            children, fields=[t.field(i) for i in range(t.num_fields)])

    raise NotImplementedError(f"unsupported Arrow type for decode: {t}")


def _decode_string(t: pa.DataType, by_kind: dict, nv: int) -> pa.Array:
    if DICT_DATA in by_kind:
        dstream = by_kind[DICT_DATA]
        dlens = rlev2.decode(by_kind[DICT_LENGTH].data, False, dstream.n)
        dictionary = _build_string_array(pa.string(), dlens, dstream.data)
        ids = rlev2.decode(by_kind[DATA].data, False, nv)
        return dictionary.take(pa.array(ids, type=pa.int64())).cast(t)

    data_stream = by_kind[DATA]
    lengths = _decode_int_data(by_kind[LENGTH]) if nv else np.zeros(0, np.int64)
    if data_stream.codec == "fsst":
        data = fsst.decode_chunk(data_stream.data)
    else:
        data = data_stream.data
    return _build_string_array(t, lengths, data)


def column_predicate_mask(field_: pa.Field, streams: list[Stream], n_rows: int,
                          op: str, lit) -> pa.Array | None:
    """Evaluate (op, lit) directly on a dict-encoded string/binary column:
    ONE comparison over the (tiny) sorted dictionary, then a fancy-index
    over the id stream — row strings never materialize for the predicate
    (the classic predicate-on-encoded-data win for low-cardinality
    columns). Returns None when the column isn't dict-encoded or the op
    has no kernel; the caller then decodes + compares normally. Null rows
    yield null (Kleene), matching ``compare_mask`` on a decoded column."""
    by_kind = {s.kind: s for s in streams if s.col == field_.name}
    t = field_.type
    if DICT_DATA not in by_kind or not (
            pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t)):
        return None
    from .stats import compare_mask

    dstream = by_kind[DICT_DATA]
    dlens = rlev2.decode(by_kind[DICT_LENGTH].data, False, dstream.n)
    dictionary = _build_string_array(t, dlens, dstream.data)
    try:
        dmask = compare_mask(dictionary, op, lit)
    except (pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError, TypeError, KeyError):
        return None
    dmask_np = dmask.to_numpy(zero_copy_only=False).astype(bool)
    present = by_kind.get(PRESENT)
    if present is None:
        ids = rlev2.decode(by_kind[DATA].data, False, n_rows)
        return pa.array(dmask_np[ids])
    mask = bool_rle.decode(present.data, n_rows)
    ids = rlev2.decode(by_kind[DATA].data, False, int(mask.sum()))
    return _scatter_valid(pa.array(dmask_np[ids]), mask, pa.bool_())


def _build_string_array(t: pa.DataType, lengths: np.ndarray, data: bytes) -> pa.Array:
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    n = len(lengths)
    storage = pa.binary() if pa.types.is_binary(t) else pa.string()
    arr = pa.Array.from_buffers(
        storage, n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)])
    return arr if t == storage else arr.cast(t)


def _scatter_valid(values: pa.Array, mask: np.ndarray, t: pa.DataType) -> pa.Array:
    """Spread non-null values back to full length: take() with null indices
    yields nulls, which works uniformly for primitives, strings and lists."""
    n = len(mask)
    idx = np.zeros(n, dtype=np.int64)
    idx[mask] = np.arange(int(mask.sum()))
    take_idx = pa.array(idx, mask=~mask)
    return values.take(take_idx)
