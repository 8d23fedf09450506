"""Frame-of-reference, integer-dictionary and FSST codec tests."""

import numpy as np

from apacheorcdotnet_ray.codecs import for_, fsst, intdict


def test_for_roundtrip():
    cases = [
        np.array([], dtype=np.int64),
        np.array([5], dtype=np.int64),
        np.arange(1000, dtype=np.int64) + 10_000_000,
        np.array([-5, -4, -3, 100], dtype=np.int64),
        np.full(1000, 42, dtype=np.int64),
    ]
    for v in cases:
        enc = for_.encode(v)
        assert enc is not None
        assert np.array_equal(for_.decode(enc), v)


def test_for_overflow_returns_none():
    v = np.array([-(2**63), 2**63 - 1], dtype=np.int64)
    assert for_.encode(v) is None


def test_for_beats_rlev2_on_clustered_far_from_zero():
    from apacheorcdotnet_ray.codecs import rlev2

    rng = np.random.default_rng(3)
    v = rng.integers(10_000_000_000, 10_000_000_255, size=10000, dtype=np.int64)
    f = for_.encode(v)
    r = rlev2.encode(v, True)
    assert len(f) < len(r)


def test_intdict_roundtrip():
    rng = np.random.default_rng(5)
    v = rng.choice(np.array([3, 900000, -17, 123456789], dtype=np.int64), size=5000)
    enc = intdict.encode(v)
    assert np.array_equal(intdict.decode(enc), v)


def test_intdict_max_card():
    v = np.arange(100, dtype=np.int64)
    assert intdict.encode(v, max_card=10) is None


def test_fsst_roundtrip_text():
    data = (b"http://example.com/page/1 http://example.com/page/2 "
            b"http://example.org/index.html " * 200)
    enc = fsst.encode_chunk(data)
    assert fsst.decode_chunk(enc) == data
    assert len(enc) < len(data) * 0.6  # repetitive URLs compress well


def test_fsst_roundtrip_binary_all_bytes():
    data = bytes(range(256)) * 4  # forces escapes incl. byte 255
    enc = fsst.encode_chunk(data)
    assert fsst.decode_chunk(enc) == data


def test_fsst_empty():
    assert fsst.decode_chunk(fsst.encode_chunk(b"")) == b""


# ---------------------------------------------------------------------------
# varint stream codec (reference VarIntWriter.cs/VarIntReader.cs analog)


def test_varint_roundtrip_random():
    from apacheorcdotnet_ray.codecs import varint

    rng = np.random.default_rng(3)
    for vals in (
        rng.integers(-(2**62), 2**62, 10_000).astype(np.int64),
        np.array([0, -1, 1, 2**63 - 1, -(2**63), 127, 128, -128], dtype=np.int64),
        np.zeros(1000, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    ):
        for signed in (True, False):
            enc = varint.encode(vals, signed)
            dec = varint.decode(enc, len(vals), signed)
            assert np.array_equal(dec, vals)


def test_varint_single_byte_values():
    from apacheorcdotnet_ray.codecs import varint

    # zigzag(0..63) fits in one byte each
    vals = np.arange(64, dtype=np.int64)
    enc = varint.encode(vals, True)
    assert len(enc) == 64
    assert np.array_equal(varint.decode(enc, 64, True), vals)


def test_intdict_padding_not_decoded_as_values():
    # 97 two-valued entries at width 1: the mode-1 bitpack pads to a byte
    # boundary; the embedded count must stop decode at exactly 97 values
    v = np.tile(np.array([5, 9], dtype=np.int64), 49)[:97]
    # force mode 1 by making ids high-entropy enough? width-1 flat pack wins
    enc = intdict.encode(v)
    out = intdict.decode(enc)  # no expected_count
    assert len(out) == 97
    assert np.array_equal(out, v)


def test_intdict_count_mismatch_raises():
    v = np.array([1, 2, 3, 1, 2, 3], dtype=np.int64)
    enc = intdict.encode(v)
    import pytest
    with pytest.raises(ValueError):
        intdict.decode(enc, expected_count=5)
