"""Byte-stream-split float codec: bit-exactness (incl. NaN/inf payloads),
compete selection, strided container roundtrip, and the size win that
justifies it."""

import zlib

import numpy as np
import pyarrow as pa

from apacheorcdotnet_ray.codecs import bss
from apacheorcdotnet_ray.stripe.columns import decode_column, encode_column
from apacheorcdotnet_ray.stripe.config import EncodeConfig
from apacheorcdotnet_ray.stripe.container import decode_stripe, encode_stripe


def test_codec_bit_exact_specials():
    for dt, big in ((np.float32, 3.1e38), (np.float64, 1e300)):
        v = np.array([1.5, -0.0, np.nan, np.inf, -np.inf, big, -big, 0.125],
                     dtype=dt)
        d = bss.decode(bss.encode(v), len(v), dt)
        assert np.array_equal(v.view(np.uint8), d.view(np.uint8))


def test_codec_empty():
    assert bss.encode(np.empty(0, np.float32)) == b""
    assert len(bss.decode(b"", 0, np.float64)) == 0


def test_compete_picks_bss_and_wins_on_embedding_like_data():
    rng = np.random.default_rng(7)
    v = pa.array(rng.uniform(-1, 1, 50_000).astype(np.float32))
    _, raw_streams, _ = encode_column("x", v, EncodeConfig(float_codecs=("raw",)))
    enc, bss_streams, _ = encode_column("x", v, EncodeConfig())
    assert enc == "bss"
    raw_c = sum(len(zlib.compress(s.data, 1)) for s in raw_streams)
    bss_c = sum(len(zlib.compress(s.data, 1)) for s in bss_streams)
    assert bss_c < 0.97 * raw_c  # the win that justifies the codec
    dec = decode_column(pa.field("x", pa.float32()), bss_streams, len(v))
    assert dec.equals(v)


def test_raw_kept_when_bss_disabled_or_uncompressed():
    v = pa.array(np.random.default_rng(3).uniform(-1, 1, 8192).astype(np.float32))
    enc, _, _ = encode_column("x", v, EncodeConfig(compression="none"))
    assert enc == "raw"
    enc, _, _ = encode_column("x", v, EncodeConfig(float_codecs=("raw",)))
    assert enc == "raw"


def test_strided_container_roundtrip_nullable_floats():
    rng = np.random.default_rng(11)
    vals = rng.uniform(-1, 1, 25_000).astype(np.float64)
    mask = rng.random(25_000) < 0.1
    col = pa.array(np.where(mask, np.nan, vals), mask=mask)
    t = pa.table({"rid": pa.array(np.arange(25_000, dtype=np.int64)), "f": col})
    blob, _ = encode_stripe(t, EncodeConfig(row_index_stride=10_000))
    back = decode_stripe(blob)
    assert back.equals(t)
