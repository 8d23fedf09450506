"""ByteRLE + boolean bit-encoding golden vectors.

Ported from ByteRunLengthEncoding_Test.cs and BitEncoding_Test.cs.
"""

import numpy as np

from apacheorcdotnet_ray.codecs import bool_rle, byte_rle
from dotnet_random import DotNetRandom


def check(values, encoded=None, expected_len=None):
    arr = np.array(values, dtype=np.uint8)
    enc = byte_rle.encode(arr)
    if encoded is not None:
        assert enc == bytes(encoded)
    if expected_len is not None:
        assert len(enc) == expected_len
    dec = byte_rle.decode(enc)
    assert dec.tolist() == arr.tolist()


def test_repeated():
    check([0] * 100, encoded=[0x61, 0x00])


def test_literals():
    check([0x44, 0x45], encoded=[0xFE, 0x44, 0x45])


def test_set_of_repeats():
    check([1, 1, 1, 2, 2, 2, 3, 3, 3], encoded=[0x0, 0x1, 0x0, 0x2, 0x0, 0x3])


def test_repeats_literal_repeats():
    check([1, 1, 1, 2, 3, 4, 5, 5, 5], encoded=[0x0, 0x1, 0xFD, 0x2, 0x3, 0x4, 0x0, 0x5])


def test_interspersed_repeats():
    check([1, 2, 2, 2, 3, 3, 4, 4, 4, 5], expected_len=2 + 2 + 3 + 2 + 2)


def test_130_repeats():
    check([1] * (130 * 5), expected_len=5 * 2)


def test_128_literals():
    check(list(range(128)) * 5, expected_len=5 * 129)


def test_long_random_roundtrip():
    rng = np.random.default_rng(99)
    vals = rng.integers(0, 4, size=50000, dtype=np.uint8)  # plenty of runs
    check(vals.tolist())
    vals2 = rng.integers(0, 256, size=50000, dtype=np.uint8)  # mostly literals
    check(vals2.tolist())


def test_literal_cap_boundary():
    # no repeat triple in the first 126 → reference takes 128 literals
    vals = list(range(120)) + [7, 8] * 20
    check(vals)
    # run starting exactly at index 126
    vals = list(np.arange(126) % 97) + [200] * 10
    check(vals)


# --- boolean bit encoding (BitEncoding_Test.cs) -------------------------


def test_bool_readwrite():
    bools = [True] + [False] * 7
    enc = bool_rle.encode(np.array(bools))
    assert enc == bytes([0xFF, 0x80])
    assert bool_rle.decode(enc, len(bools)).tolist() == bools


def test_bool_roundtrips():
    for bools in ([False], [True], [False, False], [False, True],
                  [True, False], [True, True]):
        arr = np.array(bools)
        assert bool_rle.decode(bool_rle.encode(arr), len(bools)).tolist() == bools


def test_bool_random_dotnet_seeded():
    rng = DotNetRandom(123)
    bools = [(rng.next() & 1) == 0 for _ in range(10000)]
    arr = np.array(bools)
    assert bool_rle.decode(bool_rle.encode(arr), len(bools)).tolist() == bools
