"""v5 shared-stream ROW_INDEX: size, seekability, and back-compat.

v5 strided stripes keep ONE physical stream per (column, kind) with
per-stride positions (raw length/count/crc; offsets are the cumsum) —
the reference's positions-in-shared-stream design
(/root/reference/src/ApacheOrcDotNet/Compression/OrcCompressedBuffer.cs:66-72)
— instead of v3/v4's independently framed per-stride segments. Pins:
the stride size cost on the token-corpus shape is ~zero, partial reads
stay byte-proportional, per-stride CRCs catch corruption on partial
reads, and v4 files (committed fixtures) still decode.
"""

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from apacheorcdotnet_ray.stripe.config import EncodeConfig
from apacheorcdotnet_ray.stripe.container import (
    decode_stripe,
    encode_stripe,
    read_footer,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _tokens_table(n_docs=2000, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(200, 1200, n_docs)
    toks = pa.array([rng.integers(0, 50000, l).tolist() for l in lens],
                    type=pa.list_(pa.int32()))
    return pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n_docs)]),
        "tokens": toks,
        "n_tok": pa.array(lens.astype(np.int32)),
        "source": pa.array([f"src{i % 5}" for i in range(n_docs)]),
    })


def test_stride_size_cost_near_zero_on_tokens():
    t = _tokens_table()
    plain, _ = encode_stripe(t, EncodeConfig())
    strided, footer = encode_stripe(t, EncodeConfig(row_index_stride=400))
    assert footer["version"] >= 5
    # one stream entry per (col, kind), NOT per stride
    assert all("pos_len" in m for m in footer["streams"])
    assert len({(m["col"], m["kind"]) for m in footer["streams"]}) \
        == len(footer["streams"])
    # the headline invariant: row-index stripes cost <=0.1% on the token
    # corpus shape (v4's per-stride segments cost ~1.5%)
    assert len(strided) <= len(plain) * 1.001
    assert decode_stripe(strided).combine_chunks().equals(t)


def test_partial_read_bytes_proportional():
    rng = np.random.default_rng(1)
    n = 40_000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.normal(size=n)),  # incompressible 8 B/row
    })
    buf, _ = encode_stripe(t, EncodeConfig(row_index_stride=4000))
    io_part, io_full = {}, {}
    part = decode_stripe(buf, predicate=("k", ">=", 36_000), io_stats=io_part)
    decode_stripe(buf, io_stats=io_full)
    assert part.num_rows == 4000
    assert io_part["strides_read"] == 1 and io_part["strides_total"] == 10
    # seek via positions: only blocks covering the selected stride decompress
    assert io_part["bytes_decompressed"] < io_full["bytes_decompressed"] / 3


def test_partial_read_crc_catches_corruption():
    import pytest

    n = 20_000
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(np.arange(n, dtype=np.int64) * 3)})
    buf, footer = encode_stripe(t, EncodeConfig(row_index_stride=2000,
                                                compression=None))
    # flip a byte inside v's LAST stride segment (uncompressed → position
    # arithmetic is exact); a read selecting that stride must fail its crc
    m = next(m for m in footer["streams"] if m["col"] == "v")
    off = m["offset"] + sum(m["pos_len"][:-1]) + 2
    bad = bytearray(buf)
    bad[off] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        decode_stripe(bytes(bad), predicate=("k", ">=", 18_000))
    # a read that never touches the corrupt stride succeeds
    ok = decode_stripe(bytes(bad), predicate=("k", "<", 2000))
    assert ok.num_rows == 2000


def test_v4_fixtures_still_decode():
    exp = pq.read_table(os.path.join(FIX, "v4_expected.parquet"))
    for name in ("v4_strided.oray", "v4_plain.oray"):
        buf = open(os.path.join(FIX, name), "rb").read()
        footer = read_footer(buf)
        assert footer["version"] == 4
        got = decode_stripe(buf).combine_chunks()
        assert got.equals(exp)
    # predicate + projection on the old strided layout
    buf = open(os.path.join(FIX, "v4_strided.oray"), "rb").read()
    io: dict = {}
    part = decode_stripe(buf, columns=["k", "ts"],
                         predicate=("k", "<", 500), io_stats=io)
    assert part.num_rows == 500
    assert io["strides_read"] == 1 and io["strides_total"] == 6


def test_heterogeneous_codec_across_strides():
    # first strides dictionary-friendly, later ones high-cardinality: the
    # per-stride codec decision diverges within one shared stream and the
    # pos_codec/pos_params arrays must carry it
    n = 6000
    vals = [f"w{i % 4}" for i in range(n // 2)] \
        + [f"unique-{i}-{'x' * (i % 11)}" for i in range(n // 2)]
    t = pa.table({"s": pa.array(vals)})
    buf, footer = encode_stripe(t, EncodeConfig(row_index_stride=1000))
    assert decode_stripe(buf).combine_chunks().equals(t)
    kinds = {m["kind"] for m in footer["streams"]}
    assert any("pos_codec" in m or "pos_params" in m
               for m in footer["streams"]), kinds
