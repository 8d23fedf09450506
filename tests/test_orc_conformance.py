"""Cross-validation against an INDEPENDENT ORC writer: decode the reference's
committed Hive-written conformance file (demo-12-zlib.orc, 1,920,800 rows,
1 stripe, ZLIB) with THIS repo's RLEv2 decoder and check the closed-form
column formulas the reference pins its LongReader to
(/root/reference/test/ApacheOrcDotNet.Test/ColumnTypes/LongReader_Test.cs:24-102).

This is the one place the codec stack meets bytes it never wrote — a decode
mismatch here means the RLEv2 reader only round-trips its own encoder's
dialect. No Ray needed: the reader is pure tail-parse + codec calls.
"""

import os

import numpy as np
import pytest

from apacheorcdotnet_ray.sources.orc_reader import OrcFile

DEMO = "/root/reference/test/ApacheOrcDotNet.Test/Data/demo-12-zlib.orc"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO), reason="reference conformance file not present")


@pytest.fixture(scope="module")
def demo():
    return OrcFile(DEMO)


def test_tail_parse(demo):
    assert demo.number_of_rows == 1_920_800
    assert len(demo.stripes) == 1
    assert demo.compression == 1  # ZLIB
    assert demo.stripes[0].number_of_rows == 1_920_800


@pytest.mark.parametrize("column,formula", [
    (1, lambda i: i + 1),                          # LongReader_Test.cs:24
    (5, lambda i: ((i // 70) * 500) % 10_000 + 500),  # :41
    (7, lambda i: (i // 5_600) % 7),               # :58
    (8, lambda i: (i // 39_200) % 7),              # :75
    (9, lambda i: i // 274_400),                   # :92
])
def test_int_column_formulas(demo, column, formula):
    vals = demo.read_int_column(column)
    assert len(vals) == 1_920_800
    idx = np.arange(len(vals), dtype=np.int64)
    assert (vals == formula(idx)).all()


def test_matches_pyarrow_orc(demo):
    """Same bytes through pyarrow's independent C++ ORC reader."""
    po = pytest.importorskip("pyarrow.orc")
    t = po.ORCFile(DEMO).read()
    ours = demo.read_int_column(1)
    theirs = t.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    assert (ours == theirs).all()


@pytest.mark.parametrize("column", [2, 3, 4, 6])
def test_string_columns_match_pyarrow(demo, column):
    """DICTIONARY_V2 string columns (unsigned RLEv2 ids + lengths) decoded
    with the repo codecs, cross-checked against pyarrow's C++ ORC reader."""
    po = pytest.importorskip("pyarrow.orc")
    t = po.ORCFile(DEMO).read()
    ours = demo.read_string_column(column)
    theirs = t.column(column - 1).to_pylist()
    assert demo.column_encoding(column) == 3  # DICTIONARY_V2
    assert ours == theirs


def test_decimal_column_matches_pyarrow():
    """decimal.orc: zigzag-varint mantissas + signed-RLEv2 scales + a real
    PRESENT stream (2,000 nulls) — three repo codecs (varint, rlev2,
    bool_rle) against independently written bytes."""
    po = pytest.importorskip("pyarrow.orc")
    path = "/root/reference/test/ApacheOrcDotNet.Test/Data/decimal.orc"
    if not os.path.exists(path):
        pytest.skip("reference decimal.orc not present")
    ours = OrcFile(path).read_decimal_column(1)
    theirs = po.ORCFile(path).read().column(0).to_pylist()
    assert len(ours) == 6000
    assert sum(v is None for v in ours) == 2000
    assert ours == theirs  # Decimal equality is numeric-exact
