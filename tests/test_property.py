"""Hypothesis property suites for the codec kernels — the analog of the
reference's randomized round-trip Facts (IntegerRunLengthEncodingV2_Test.cs
:352-422: random ints/longs, extremes, overflow triples)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from apacheorcdotnet_ray.codecs import bool_rle, byte_rle, rlev2, varint

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
small = st.integers(min_value=-100, max_value=100)


@settings(deadline=None, max_examples=60)
@given(st.lists(st.one_of(i64, small), max_size=600), st.booleans(), st.booleans())
def test_rlev2_roundtrip(vals, signed, aligned):
    v = np.array(vals, dtype=np.int64)
    enc = rlev2.encode(v, signed, aligned)
    dec = rlev2.decode(enc, signed, len(v))
    assert np.array_equal(dec, v)


@settings(deadline=None, max_examples=60)
@given(st.lists(i64, max_size=400), st.booleans())
def test_varint_roundtrip(vals, signed):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(varint.decode(varint.encode(v, signed), len(v), signed), v)


@settings(deadline=None, max_examples=60)
@given(st.binary(max_size=1500))
def test_byte_rle_roundtrip(data):
    v = np.frombuffer(data, dtype=np.uint8)
    enc = byte_rle.encode(v)
    assert np.array_equal(byte_rle.decode(enc, len(v)), v)


@settings(deadline=None, max_examples=60)
@given(st.lists(st.booleans(), max_size=1200))
def test_bool_rle_roundtrip(vals):
    v = np.array(vals, dtype=bool)
    enc = bool_rle.encode(v)
    assert np.array_equal(bool_rle.decode(enc, len(v)), v)


# run-heavy shapes hit the vectorized SHORT_REPEAT stream + batch interleave
@settings(deadline=None, max_examples=40)
@given(st.lists(st.tuples(small, st.integers(min_value=1, max_value=15)), max_size=120),
       st.booleans())
def test_rlev2_runs_roundtrip(run_pairs, signed):
    if not run_pairs:
        return
    vals = np.repeat(np.array([v for v, _ in run_pairs], dtype=np.int64),
                     [r for _, r in run_pairs])
    enc = rlev2.encode(vals, signed)
    assert np.array_equal(rlev2.decode(enc, signed, len(vals)), vals)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_ppm_bmp_roundtrip_property(h, w, seed):
    from apacheorcdotnet_ray.codecs import media

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(media.decode_ppm(media.encode_ppm(img)), img)
    assert np.array_equal(media.decode_bmp(media.encode_bmp(img)), img)


@given(st.integers(0, 999_999_999))
@settings(max_examples=200, deadline=None)
def test_orc_nanos_roundtrip_property(nanos):
    from apacheorcdotnet_ray.stripe.columns import _decode_orc_nanos, _encode_orc_nanos

    arr = np.array([nanos], dtype=np.int64)
    assert _decode_orc_nanos(_encode_orc_nanos(arr))[0] == nanos


@given(st.lists(st.integers(-2**62, 2**62), min_size=0, max_size=300),
       st.integers(0, 50))
@settings(max_examples=60, deadline=None)
def test_intdict_roundtrip_property(vals, pad):
    from apacheorcdotnet_ray.codecs import intdict

    # pad with repeats to vary cardinality/width regimes
    v = np.array(vals + vals[:pad], dtype=np.int64) if vals else np.array([], dtype=np.int64)
    if len(v) == 0:
        return
    enc = intdict.encode(v)
    assert np.array_equal(intdict.decode(enc), v)


@given(st.integers(-2**40, 2**40), st.integers(0, 999_999), st.sampled_from(["us", "ms", "s"]))
@settings(max_examples=100, deadline=None)
def test_timestamp_two_stream_property(sec, micro, unit):
    import pyarrow as pa

    from apacheorcdotnet_ray.stripe import decode_stripe, encode_stripe

    factor = {"us": 1_000_000, "ms": 1_000, "s": 1}[unit]
    v = sec * factor + (micro % factor if factor > 1 else 0)
    t = pa.table({"ts": pa.array([v], type=pa.int64()).cast(pa.timestamp(unit))})
    buf, _ = encode_stripe(t)
    assert decode_stripe(buf).equals(t)
