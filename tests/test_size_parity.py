"""Size parity against the reference's committed artifact.

Reproduces the WriterTest.App dataset exactly (DotNetRandom(123) — one
``Next()`` per row, ``src/ApacheOrcDotNet.WriterTest.App/Program.cs:12-50``)
and compares our encoded+framed stream sizes with the per-stream sizes the
reference's own ORC output reports in its committed ``results.txt``
(orc-tools meta over test.orc). The encoding bytes are identical by
construction (bit-exact RLEv2, same 10k-stride restarts, same 256 KiB
block framing); the only divergence is .NET's DeflateStream vs zlib, so a
small tolerance applies. This pins the "compressed size <= reference ORC
size" criterion to the reference's own artifact.
"""

import numpy as np
import pytest

from apacheorcdotnet_ray.codecs import rlev2
from apacheorcdotnet_ray.stripe import framing
from dotnet_random import DotNetRandom

STRIDE = 10_000  # WriterConfiguration.cs:29 — encoders restart per stride
N_ROWS = 80_000

# results.txt:59-62,76-78 — DATA stream lengths of the committed test.orc
REF_SIZES = {
    "random": 320_326,
    "random_in_range": 159_064,
    "incrementing": 350,
    "set_number": 52,
    "dict_ids": 50,
    "dict_lengths": 5,
    "dict_data": 36,
}


@pytest.fixture(scope="module")
def columns():
    rng = DotNetRandom(123)
    random_col = np.empty(N_ROWS, dtype=np.int64)
    rir_col = np.empty(N_ROWS, dtype=np.int64)
    for i in range(N_ROWS):
        r = rng.next()
        s = i // STRIDE
        random_col[i] = r
        rir_col[i] = (r % STRIDE) + s * STRIDE - 40_000
    return {
        "random": random_col,
        "random_in_range": rir_col,
        "incrementing": np.arange(N_ROWS, dtype=np.int64),
        "set_number": np.arange(N_ROWS, dtype=np.int64) // STRIDE,
    }


def _stream_size(vals: np.ndarray, signed: bool = True) -> int:
    encoded = b"".join(
        rlev2.encode(vals[k : k + STRIDE], signed)
        for k in range(0, len(vals), STRIDE)
    )
    return len(framing.compress(encoded, 256 * 1024, 1))


@pytest.mark.parametrize("col", ["random", "random_in_range", "incrementing", "set_number"])
def test_int_column_size_parity(columns, col):
    ours = _stream_size(columns[col])
    ref = REF_SIZES[col]
    # identical algorithm; deflate implementations differ by <3%
    assert ours <= ref * 1.03, f"{col}: ours {ours} vs reference {ref}"
    assert ours >= ref * 0.90, f"{col}: suspiciously small — check stride restarts"


def test_dictionary_string_column_size_parity():
    """DictionaryStr = 'SetNumber={i//10000}': 8 distinct values
    (results.txt:76-78,91 — DICTIONARY_V2[8], DATA 50 + LENGTH 5 + DICT 36)."""
    values = [f"SetNumber={i // STRIDE}" for i in range(N_ROWS)]
    uniq = sorted(set(values))
    ids = np.array([uniq.index(v) for v in values], dtype=np.int64)
    id_stream = b"".join(
        rlev2.encode(ids[k : k + STRIDE], False) for k in range(0, N_ROWS, STRIDE)
    )
    lengths = rlev2.encode(np.array([len(u) for u in uniq], dtype=np.int64), False)
    dict_bytes = "".join(uniq).encode()
    assert len(framing.compress(id_stream, 256 * 1024, 1)) <= REF_SIZES["dict_ids"] * 1.1
    assert len(framing.compress(lengths, 256 * 1024, 1)) <= REF_SIZES["dict_lengths"] + 3
    assert len(framing.compress(dict_bytes, 256 * 1024, 1)) <= REF_SIZES["dict_data"] * 1.1
