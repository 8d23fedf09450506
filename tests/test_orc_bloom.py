"""ORC BLOOM_FILTER_UTF8 (stream kind 8): hash pinning, byte-identity
with pyarrow's C++ ORC writer, and equality-predicate stripe pruning.

The reference never implemented bloom filters; the hash contract here is
the public ORC spec / Java ORC ``BloomFilter``+``Murmur3`` (seed 104729),
pinned empirically against liborc via pyarrow."""

import numpy as np
import pyarrow as pa
import pyarrow.orc as pa_orc
import pytest

from apacheorcdotnet_ray.codecs import orc_bloom as ob
from apacheorcdotnet_ray.sources.orc_reader import OrcFile, pb_parse
from apacheorcdotnet_ray.sources.orc_writer import write_orc


def _pyarrow_blooms(path: str) -> dict[int, tuple[int, bytes]]:
    """column id -> (numHashFunctions, bitset) of the FIRST row group."""
    f = OrcFile(path)
    st = f.stripes[0]
    out = {}
    sf = f._stripe_footer(st)
    pos = st.offset
    for raw in sf.get(1, []):
        s = pb_parse(raw)
        kind, col, ln = s.get(1, [0])[0], s.get(2, [0])[0], s.get(3, [0])[0]
        if kind == 8:
            idx = pb_parse(bytes(f._buf[pos:pos + ln]))
            bd = pb_parse(idx[1][0])
            out[col] = (bd[1][0], bd[3][0])
        pos += ln
    f.close()
    return out


def test_vectorized_murmur_matches_scalar():
    rng = np.random.default_rng(11)
    vals = [rng.bytes(int(n)) for n in rng.integers(0, 45, 300)]
    blob = b"".join(vals)
    offs = np.concatenate([[0], np.cumsum([len(v) for v in vals])])
    vec = ob.murmur3_hash64_many(blob, offs)
    for i, v in enumerate(vals):
        assert int(vec[i]) == ob.murmur3_hash64(v)


def test_bitsets_byte_identical_to_pyarrow(tmp_path):
    """Build the same blooms as liborc and compare bitsets byte-for-byte
    — pins Wang's long hash, Murmur3-64 seed 104729, the double-hash
    probe scheme, AND the Java numBits round-up quirk all at once."""
    n = 1000
    t = pa.table({
        "i": pa.array(np.arange(n, dtype=np.int64) * 7 + 3),
        "s": pa.array([f"doc-{k:05d}" for k in range(n)]),
        "f": pa.array(np.linspace(-5.0, 5.0, n)),
    })
    p = str(tmp_path / "pa_bloom.orc")
    pa_orc.write_table(t, p, compression="uncompressed",
                       bloom_filter_columns=[1, 2, 3], bloom_filter_fpp=0.05,
                       stripe_size=1 << 26, row_index_stride=10000)
    ref = _pyarrow_blooms(p)
    assert set(ref) == {1, 2, 3}
    for cid, name in [(1, "i"), (2, "s"), (3, "f")]:
        k, bits = ob.bloom_build(ob.hash_arrow_values(
            t.column(name).combine_chunks(), dialect="cpp"),
            10000, 0.05)
        assert (k, bits) == ref[cid], name
    # the double column only matches under liborc's arithmetic-shift
    # dialect; the Java (unsigned-shift) dialect diverges — that's a real
    # cross-implementation incompatibility this module models explicitly
    kj, bj = ob.bloom_build(ob.hash_arrow_values(
        t.column("f").combine_chunks(), dialect="java"), 10000, 0.05)
    assert (kj, bj) != ref[3]
    # sizing: n=10000 fpp=0.05 -> 62352 bits rounded up to 62400, k=4
    assert ob.bloom_params(10000, 0.05) == (62400, 4)


def test_date_bitset_byte_identical_to_pyarrow(tmp_path):
    """DATE columns hash as Wang(days) — same in both implementations."""
    days = np.arange(15_000, 16_000, dtype=np.int32)
    t = pa.table({"d": pa.array(days).cast(pa.date32())})
    p = str(tmp_path / "pa_date.orc")
    pa_orc.write_table(t, p, compression="uncompressed",
                       bloom_filter_columns=[1], stripe_size=1 << 26,
                       row_index_stride=10000)
    ref = _pyarrow_blooms(p)
    k, bits = ob.bloom_build(
        ob.hash_arrow_values(t.column("d").combine_chunks()), 10000)
    assert (k, bits) == ref[1]


def test_float32_bitset_byte_identical_to_pyarrow(tmp_path):
    """FLOAT columns widen to double before the (cpp-dialect) Wang mix."""
    vals = np.linspace(-3, 3, 1000).astype(np.float32)
    t = pa.table({"f": pa.array(vals)})
    p = str(tmp_path / "pa_f32.orc")
    pa_orc.write_table(t, p, compression="uncompressed",
                       bloom_filter_columns=[1], stripe_size=1 << 26,
                       row_index_stride=10000)
    ref = _pyarrow_blooms(p)
    k, bits = ob.bloom_build(
        ob.hash_arrow_values(t.column("f").combine_chunks()), 10000)
    assert (k, bits) == ref[1]


def test_negative_int_bitset_byte_identical_to_pyarrow(tmp_path):
    """liborc runs EVERY long hash through the arithmetic-shift Wang mix
    — the unsigned ("java") variant coincides only on small positive
    longs. Negative ints pin the divergence (the original int pin used
    positives, where both dialects agree)."""
    vals = np.concatenate([-np.arange(1, 500, dtype=np.int64) * 9,
                           np.array([2**61 + 5, -2**55], dtype=np.int64)])
    t = pa.table({"i": pa.array(vals)})
    p = str(tmp_path / "pa_neg.orc")
    pa_orc.write_table(t, p, compression="uncompressed",
                       bloom_filter_columns=[1], stripe_size=1 << 26,
                       row_index_stride=10000)
    ref = _pyarrow_blooms(p)
    k, bits = ob.bloom_build(
        ob.hash_arrow_values(t.column("i").combine_chunks(),
                             dialect="cpp"), 10000)
    assert (k, bits) == ref[1]
    kj, bj = ob.bloom_build(
        ob.hash_arrow_values(t.column("i").combine_chunks(),
                             dialect="java"), 10000)
    assert (kj, bj) != ref[1]


def test_timestamp_bitset_byte_identical_to_pyarrow(tmp_path):
    """Timestamps hash as Wang(trunc-toward-zero millis) in the cpp
    dialect — liborc derives millis from its (trunc seconds, signed
    nanos) pair, so -123 µs hashes as 0 ms, not -1 ms."""
    us = pa.array([1_500_000_000_123_456, -1_000_000_000_500_000,
                   1_700_000_000_000_001, -123], type=pa.int64())
    t = pa.table({"ts": us.cast(pa.timestamp("us"))})
    p = str(tmp_path / "pa_ts.orc")
    pa_orc.write_table(t, p, compression="uncompressed",
                       bloom_filter_columns=[1], stripe_size=1 << 26,
                       row_index_stride=10000)
    ref = _pyarrow_blooms(p)
    k, bits = ob.bloom_build(
        ob.hash_arrow_values(t.column("ts").combine_chunks()), 10000)
    assert (k, bits) == ref[1]


def test_negative_int_bloom_prune_on_foreign_file(tmp_path):
    """End-to-end regression: equality probes on a liborc file with
    negative ints must use the cpp dialect or present values would be
    wrongly pruned (a false negative, i.e. WRONG results)."""
    vals = np.arange(-5_000, 5_000, dtype=np.int64) * 3
    t = pa.table({"i": pa.array(vals)})
    p = str(tmp_path / "pa_negprune.orc")
    pa_orc.write_table(t, p, compression="zlib", stripe_size=1 << 16,
                       row_index_stride=1_000, bloom_filter_columns=[1])
    f = OrcFile(p)
    hit = f.read_table(predicate=("i", "==", -9_000))
    assert -9_000 in hit.column("i").to_pylist()  # no false negative
    assert f.read_table(predicate=("i", "==", -9_001)).num_rows \
        < f.number_of_rows  # absent in-range value prunes
    f.close()


def test_probe_semantics():
    vals = np.arange(2000, dtype=np.int64) * 7
    k, bits = ob.bloom_build(ob.wang_hash64(vals), 10000)
    assert ob.bloom_might_contain(k, bits, ob.wang_hash64(vals)).all()
    absent = ob.bloom_might_contain(k, bits, ob.wang_hash64(vals + 1))
    assert absent.mean() < 0.05  # ~fpp for a 1/5-full filter


def test_writer_blooms_roundtrip_and_prune(tmp_path):
    n = 40_000
    ids = np.arange(n, dtype=np.int64) * 10  # gaps: in-range absents exist
    t = pa.table({
        "id": pa.array(ids),
        "name": pa.array([f"u-{k % 25000:06d}" for k in range(n)]),
    })
    p = str(tmp_path / "w_bloom.orc")
    # fpp 0.01: at the default 0.05 the per-stripe OR over 5 row groups
    # has a ~20% false-positive rate — real but untestable deterministically
    write_orc(t, p, compression="zlib", stripe_rows=10_000,
              row_index_stride=2_000, bloom_columns=["id", "name"],
              bloom_fpp=0.01)

    # interop intact: pyarrow's independent C++ reader decodes the file
    assert pa_orc.ORCFile(p).read().equals(t)

    f = OrcFile(p)
    assert len(f.stripes) == 4
    blooms = f.bloom_filters(f.stripes[0], 1)
    assert blooms is not None and len(blooms) == 5  # 10k rows / 2k stride

    # present value: exactly its row GROUP decodes (ROW_INDEX seek)
    hit = f.read_table(predicate=("id", "==", 350_000))
    assert hit.num_rows == 2_000
    assert 350_000 in hit.column("id").to_pylist()
    # absent but inside every stripe's [min, max]: only the bloom can
    # prune (stats cannot) -> zero stripes decoded
    assert f.read_table(predicate=("id", "==", 350_005)).num_rows == 0
    # string probe: in-range absent value ("u-012345x" sorts between
    # min and max of every stripe)
    assert f.read_table(predicate=("name", "==", "u-012345x")).num_rows == 0
    # "u-017000" occurs exactly once (name indices 15000-19999 appear
    # once in the 40k-row cycle-by-25000 layout) → one row group decodes
    hit = f.read_table(predicate=("name", "==", "u-017000"))
    assert hit.num_rows == 2_000
    assert "u-017000" in hit.column("name").to_pylist()
    f.close()


def test_double_bloom_prune_dispatches_on_writer(tmp_path):
    """Our files stamp writer=ORC_CPP and hash doubles in the liborc
    dialect; the reader dispatches the probe hash on that field."""
    vals = np.arange(4000, dtype=np.float64) * 0.25
    t = pa.table({"x": pa.array(vals)})
    p = str(tmp_path / "dbl_bloom.orc")
    write_orc(t, p, stripe_rows=2_000, row_index_stride=500,
              bloom_columns=["x"], bloom_fpp=0.01)
    f = OrcFile(p)
    assert f.writer_impl == 1
    hit = f.read_table(predicate=("x", "==", 300.25))
    assert hit.num_rows == 500  # one row group
    assert 300.25 in hit.column("x").to_pylist()
    # in-range but absent (off the 0.25 grid)
    assert f.read_table(predicate=("x", "==", 300.26)).num_rows == 0
    f.close()

    # a pyarrow/liborc-written double bloom probes identically
    p2 = str(tmp_path / "dbl_pa.orc")
    pa_orc.write_table(t, p2, compression="uncompressed",
                       bloom_filter_columns=[1], stripe_size=1 << 16)
    f2 = OrcFile(p2)
    assert f2.writer_impl == 1
    sub = f2.read_table(predicate=("x", "==", 300.26))
    assert sub.num_rows < t.num_rows  # blooms pruned at least one stripe
    f2.close()


def test_bloomless_and_unhashable_predicates_never_prune(tmp_path):
    t = pa.table({"id": pa.array(np.arange(100, dtype=np.int64)),
                  "b": pa.array([k % 2 == 0 for k in range(100)])})
    p = str(tmp_path / "nobloom.orc")
    write_orc(t, p, row_index_stride=50)
    f = OrcFile(p)
    # no bloom stream -> advisory True -> ROW_INDEX stats narrow to the
    # one 50-row group containing the key
    hit = f.read_table(predicate=("id", "==", 5))
    assert hit.num_rows == 50 and 5 in hit.column("id").to_pylist()
    # bool literal is unhashable for ORC blooms and carries no min/max
    # stats -> no pruning anywhere, no crash
    assert f.read_table(predicate=("b", "==", True)).num_rows == 100
    f.close()


def test_bloom_validation_errors(tmp_path):
    t = pa.table({"ok": pa.array([1, 2], type=pa.int64()),
                  "lst": pa.array([[1], [2]])})
    with pytest.raises(ValueError, match="not in table"):
        write_orc(t, str(tmp_path / "x.orc"), bloom_columns=["nope"])
    with pytest.raises(ValueError, match="no ORC bloom hash"):
        write_orc(t, str(tmp_path / "x.orc"), bloom_columns=["lst"])
    with pytest.raises(ValueError, match="row_index_stride"):
        write_orc(t, str(tmp_path / "x.orc"), bloom_columns=["ok"],
                  row_index_stride=0)


def test_nullable_bloom_column(tmp_path):
    vals = pa.array([1, None, 3, None, 5] * 2000, type=pa.int64())
    t = pa.table({"v": vals})
    p = str(tmp_path / "null_bloom.orc")
    write_orc(t, p, stripe_rows=5_000, row_index_stride=1_000,
              bloom_columns=["v"])
    assert pa_orc.ORCFile(p).read().equals(t)
    f = OrcFile(p)
    assert f.read_table(predicate=("v", "==", 3)).num_rows > 0
    assert f.read_table(predicate=("v", "==", 4)).num_rows == 0
    f.close()
