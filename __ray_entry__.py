"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline on sf0.001 — tokenize documents into the
  BASELINE.json input_hint shape (doc_id, tokens:list<int32>, n_tok, source),
  encode to .oray stripes via the resumable corpus job, decode back, return
  the decoded Dataset.
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2 +
  the training-data operator suite); each takes sf_dir.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query
  (tables pre-registered as views). Column names match exactly.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np

# log hygiene only (no ray.init here — driver owns the session): drop Ray's
# cosmetic empty-range-partition schema warnings, see apacheorcdotnet_ray/raylog.py
from apacheorcdotnet_ray.raylog import suppress_empty_schema_warnings

suppress_empty_schema_warnings()

_SCRATCH = "/tmp/oray_queries"


def _table_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns=None):
    # strips the pandas schema-metadata blob (unhashable → would defeat
    # Ray's block-schema dedup and spam warnings)
    from apacheorcdotnet_ray.sources.parquet import read_parquet_clean

    return read_parquet_clean(_table_path(sf_dir, table), columns=columns)


def _out_dir(sf_dir: str, tag: str) -> str:
    from apacheorcdotnet_ray.stripe.container import FORMAT_VERSION

    paths = [_table_path(sf_dir, t) for t in
             ("lineitem", "documents", "embeddings")]
    fp = "|".join(f"{p}:{os.path.getsize(p)}" for p in paths if os.path.exists(p))
    h = hashlib.sha256(f"{sf_dir}{fp}v{FORMAT_VERSION}".encode()).hexdigest()[:12]
    return os.path.join(_SCRATCH, f"{tag}-{h}")


def _roundtrip(sf_dir: str, table: str, compression: str = "zlib"):
    """Encode a testdata table to stripes and decode it back — the correctness
    gate for the whole engine: the oracle is a plain SELECT of the source."""
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_corpus
    from apacheorcdotnet_ray.stripe import EncodeConfig

    out = _out_dir(sf_dir, f"rt-{table}-{compression}" if compression != "zlib"
                   else f"rt-{table}")
    encode_corpus([_table_path(sf_dir, table)], out,
                  config=EncodeConfig(compression=compression))  # resume-aware
    return decode_dataset(out)


def _ann_ivf_indexed(sf_dir: str):
    """Materialized IVF: bucket-partitioned parquet index built once, search
    reads only the probed partitions."""
    import numpy as np
    import pyarrow.parquet as pq

    from apacheorcdotnet_ray.pipelines import similarity

    idx = _out_dir(sf_dir, "ivf-index")
    if not os.path.exists(os.path.join(idx, "centroids.npy")):
        similarity.ivf_build(_read(sf_dir, "embeddings"), idx)
    t = pq.read_table(_table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    q = np.asarray(t["embedding"][int(np.argmin(ids))].as_py(), dtype=np.float64)
    # n_probe = n_centroids: every bucket probed → exact top-k (the same
    # exact-oracle trick as ann_ivf_quantized); ids only, scores are float
    return similarity.ivf_search(idx, q[None, :], k=10,
                                 n_probe=16).select(["vec_id"])


def _ann_ivf_quantized(sf_dir: str):
    """int8-quantized IVF probed exhaustively (n_probe = n_centroids) with
    exact-rerank refinement: the quantized index retrieves 4k candidates,
    their true vectors are point-looked-up, and the final top-10 is ranked
    on exact cosines — so the result matches the exact oracle outright."""
    import numpy as np
    import pyarrow.parquet as pq

    from apacheorcdotnet_ray.pipelines import similarity

    idx = _out_dir(sf_dir, "ivf-index-q8")
    if not os.path.exists(os.path.join(idx, "centroids.npy")):
        similarity.ivf_build(_read(sf_dir, "embeddings"), idx, n_centroids=8,
                             quantize=True)
    t = pq.read_table(_table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    q = np.asarray(t["embedding"][int(np.argmin(ids))].as_py(), dtype=np.float64)
    return similarity.ivf_search(idx, q[None, :], k=10, n_probe=8,
                                 refine_ds=_read(sf_dir, "embeddings")).select(["vec_id"])


def _dedup_incremental(sf_dir: str):
    """Ingestion-time dedup: the corpus (source != src5) is fingerprint-
    indexed ONCE into bucket-partitioned parquet; the incoming batch
    (source == src5) probes only the buckets its hashes fall in. The
    oracle is the equivalent prefix-match EXISTS."""
    import pyarrow.compute as pc

    from apacheorcdotnet_ray.pipelines import dedup

    idx = _out_dir(sf_dir, "fp-index")
    done = os.path.join(idx, "_built")  # marker: dir alone may be half-built
    if not os.path.exists(done):
        corpus = _read(sf_dir, "documents", columns=["doc_id", "source", "text"]) \
            .map_batches(lambda t: t.filter(pc.not_equal(t.column("source"), "src5")),
                         batch_format="pyarrow")
        dedup.build_fingerprint_index(corpus, idx)
        open(done, "w").close()
    incoming = _read(sf_dir, "documents", columns=["doc_id", "source", "text"]) \
        .map_batches(lambda t: t.filter(pc.equal(t.column("source"), "src5")),
                     batch_format="pyarrow")
    return dedup.dedup_against_index(incoming, idx).select(["doc_id"])


def _curate_end_to_end(sf_dir: str):
    """The composed curation job: Gopher gate + repetition gate in one
    streaming pass, then prefix-fingerprint dedup keeping the lowest
    surviving id — the whole chain checked value-exactly against one
    chained-CTE oracle."""
    from apacheorcdotnet_ray.pipelines import curate

    return curate.curate_pipeline(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def _quantile_sketch_bound(sf_dir: str):
    """One-pass weighted-sample quantile sketch checked against its rank
    guarantee: the exact rank of the estimate (one count pass) must sit
    within ~n/(2k) of the target — the hll_error_bound pattern, turning a
    sketch into a checkable correctness row."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apacheorcdotnet_ray.pipelines import stats

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    est = stats.quantile_sketch(ds, "l_extendedprice", q=0.5, k=256)

    def rank_partial(batch: pa.Table) -> pa.Table:
        col = batch.column("l_extendedprice")
        return pa.table({
            "le": pa.array([pc.sum(pc.less_equal(col, est)).as_py() or 0]),
            "n": pa.array([len(col) - col.null_count]),
        })

    rows = _read(sf_dir, "lineitem", columns=["l_extendedprice"]).map_batches(
        rank_partial, batch_format="pyarrow").take_all()
    le, n = sum(r["le"] for r in rows), sum(r["n"] for r in rows)
    ok = abs(le / n - 0.5) <= 0.01  # theory: 1/(2*256) + stride slack
    return pa.table({"within_bound": pa.array([ok], type=pa.bool_())})


def _embedding_centroids(sf_dir: str):
    """Per-label element-wise embedding mean, exploded to (label, pos, val)
    so DuckDB can check it value-exactly (rounded to absorb ulp-order
    drift between the two engines' float summation)."""
    from apacheorcdotnet_ray.pipelines import cluster

    return cluster.group_vector_mean(
        _read(sf_dir, "embeddings", columns=["embedding", "label"]))


def _footer_stats_lineitem(sf_dir: str):
    """Aggregate pushdown to metadata: the stats_lineitem answer computed
    ONLY from stripe footers (tail reads) — no data decompressed."""
    from apacheorcdotnet_ray.pipelines import stats
    from apacheorcdotnet_ray.pipelines.encode import encode_corpus

    out = _out_dir(sf_dir, "rt-lineitem")
    encode_corpus([_table_path(sf_dir, "lineitem")], out)  # resume-aware
    return stats.stats_from_footers(
        out,
        int_columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        float_columns=["l_quantity", "l_extendedprice"],
    )


def _quantile_median(sf_dir: str):
    import pyarrow as pa

    from apacheorcdotnet_ray.pipelines import stats

    v = stats.quantile_exact(_read(sf_dir, "events", columns=["value"]), "value", 0.5)
    return pa.table({"median": pa.array([v], type=pa.float64())})


def _collect(ds):
    """Schema-true small-result collection (Dataset.to_pandas drops columns
    when every block is empty — bites possibly-empty pair queries)."""
    from apacheorcdotnet_ray.pipelines.setops import to_arrow_table

    return to_arrow_table(ds)


def _keyed(sf_dir: str, table: str, col: str):
    import pyarrow as pa

    return _read(sf_dir, table, columns=[col]).map_batches(
        lambda b: pa.table({"key": b.column(col)}), batch_format="pyarrow")


def _set_intersect(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.setops import intersect, to_arrow_table

    return to_arrow_table(
        intersect(_keyed(sf_dir, "customer", "c_custkey"),
                  _keyed(sf_dir, "orders", "o_custkey"), ["key"]))


def _set_except(sf_dir: str):
    # result may be EMPTY (every customer ordered) — to_arrow_table keeps
    # the schema where Dataset.to_pandas would drop the columns
    from apacheorcdotnet_ray.pipelines.setops import except_, to_arrow_table

    return to_arrow_table(
        except_(_keyed(sf_dir, "customer", "c_custkey"),
                _keyed(sf_dir, "orders", "o_custkey"), ["key"]))


def _set_union(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.setops import to_arrow_table, union_distinct

    return to_arrow_table(
        union_distinct(_keyed(sf_dir, "customer", "c_custkey"),
                       _keyed(sf_dir, "orders", "o_custkey"), ["key"]))


def _distinct_sources(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.setops import distinct, to_arrow_table

    return to_arrow_table(
        distinct(_read(sf_dir, "documents", columns=["source"]), ["source"]))


def _broadcast_join(sf_dir: str):
    import pyarrow.parquet as pq

    from apacheorcdotnet_ray.pipelines.joins import broadcast_hash_join

    small = pq.read_table(_table_path(sf_dir, "part"), columns=["p_partkey", "p_name"])
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])
    return broadcast_hash_join(ds, small, "l_partkey", "p_partkey")


def _range_join_follow(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.joins import range_join_follow_counts

    return range_join_follow_counts(
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]))


def _asof_join(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.joins import asof_join

    return asof_join(
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]),
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]),
        left_id="event_id", left_key="user_id", left_on="ts",
        right_key="o_custkey", right_on="o_orderdate", right_value="o_totalprice",
    )


def _hash_join(sf_dir: str):
    """Large-large shuffle join (both sides co-partitioned by key);
    broadcast_threshold=0 pins the native shuffle path — this query exists
    to demonstrate it (broadcast_join covers the small-side path). Safe:
    the o_orderkey domain (15k at sf0.01) vastly exceeds the partition
    count."""
    from apacheorcdotnet_ray.pipelines.joins import hash_join

    return hash_join(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]),
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]),
        left_on="l_orderkey", right_on="o_orderkey", broadcast_threshold=0,
    )


def _orc_bloom_point_lookup(sf_dir: str):
    """Point lookup through REAL ORC with BLOOM_FILTER_UTF8 streams:
    orders exported as multi-stripe .orc with a bloom on o_orderkey (our
    writer — hashes byte-identical to liborc, tests/test_orc_bloom.py),
    then an equality-predicate import through our reader: footer-stats
    file pruning → Metadata stripe-stats pruning → kind-8 bloom probe →
    exact row filter. The oracle is a plain SELECT, so a bloom false
    NEGATIVE (wrongly pruned stripe) fails the row-count/hash check."""
    from apacheorcdotnet_ray.sources.orc_reader import read_orc_files
    from apacheorcdotnet_ray.sources.orc_writer import write_orc_dataset

    out = _out_dir(sf_dir, "orc-bloom-sink")
    done = os.path.join(out, "_built")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_orc_dataset(
            _read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_totalprice"]),
            out, stripe_rows=2000, bloom_columns=["o_orderkey"])
        open(done, "w").close()
    return read_orc_files(out, predicate=("o_orderkey", "==", 7))


def _orc_file_roundtrip(sf_dir: str):
    """REAL ORC interop inside the correctness gate: the documents table is
    written as .orc files by this repo's writer (Ray sink, our RLEv2/
    bool-RLE/length codecs) and read back by pyarrow's INDEPENDENT C++ ORC
    reader — the oracle is a plain SELECT, so any spec deviation in our
    encoder bytes fails the value hash."""
    import glob

    import pyarrow as pa
    import pyarrow.orc as po

    from apacheorcdotnet_ray.sources.orc_writer import write_orc_dataset

    out = _out_dir(sf_dir, "orc-sink")
    done = os.path.join(out, "_built")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_orc_dataset(_read(sf_dir, "documents"), out)
        open(done, "w").close()
    return pa.concat_tables(
        [po.ORCFile(p).read() for p in sorted(glob.glob(out + "/*.orc"))])


def _orc_file_roundtrip_events(sf_dir: str):
    """Same interop gate over the events table — timestamps (two-stream
    ORC layout) and doubles cross the independent-reader boundary too."""
    import glob

    import pyarrow as pa
    import pyarrow.orc as po

    from apacheorcdotnet_ray.sources.orc_writer import write_orc_dataset

    out = _out_dir(sf_dir, "orc-sink-events")
    done = os.path.join(out, "_built")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_orc_dataset(_read(sf_dir, "events"), out)
        open(done, "w").close()
    t = pa.concat_tables(
        [po.ORCFile(p).read() for p in sorted(glob.glob(out + "/*.orc"))])
    # pyarrow reads ORC timestamps as ns; the oracle view is us
    return t.set_column(t.schema.get_field_index("ts"), "ts",
                        t.column("ts").cast(pa.timestamp("us")))


def _orc_file_roundtrip_tokens(sf_dir: str):
    """The FLAGSHIP shape (doc_id, tokens:list<int32>, n_tok, source)
    through REAL ORC: tokenize → write .orc (LIST columns: LENGTH stream +
    pre-order child numbering) → read back with pyarrow's independent C++
    reader. n_tok is recomputed FROM the round-tripped token lists, so the
    SQL oracle's len(string_split()) catches any list corruption; exact
    token-value equality is pinned by pytest (test_orc_conformance)."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.orc as po

    from apacheorcdotnet_ray.pipelines.text import tokenize_documents
    from apacheorcdotnet_ray.sources.orc_writer import write_orc_dataset

    out = _out_dir(sf_dir, "orc-sink-tokens")
    done = os.path.join(out, "_built")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_orc_dataset(tokenize_documents(_read(sf_dir, "documents")), out)
        open(done, "w").close()
    t = pa.concat_tables(
        [po.ORCFile(p).read() for p in sorted(glob.glob(out + "/*.orc"))])
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_tok": pc.list_value_length(t.column("tokens")).cast(pa.int32()),
        "source": t.column("source"),
    })


def _full_outer_join(sf_dir: str):
    """Full outer equi-join through the co-partitioned repartition path
    (each key's rows from BOTH sides land in one partition, so the
    per-partition full outer is globally correct): customers without
    orders survive left-only, orders of filtered-out customers right-only."""
    import pyarrow.compute as pc

    from apacheorcdotnet_ray.pipelines.joins import hash_join

    def mod_filter(col, m):
        def fn(b):
            return b.filter(pc.equal(
                pc.bit_wise_and(b.column(col), m - 1) if (m & (m - 1)) == 0
                else pc.subtract(b.column(col),
                                 pc.multiply(pc.divide(b.column(col), m),
                                             m)), 0))
        return fn

    left = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]) \
        .map_batches(mod_filter("c_custkey", 2), batch_format="pyarrow")
    right = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                             "o_totalprice"]) \
        .map_batches(mod_filter("o_orderkey", 5), batch_format="pyarrow") \
        .select_columns(["o_custkey", "o_totalprice"])
    return hash_join(left, right, "c_custkey", "o_custkey", how="full")


def _bm25_index_search(sf_dir: str):
    """BM25 from a MATERIALIZED inverted index (postings parquet partitioned
    by term-hash bucket, built once): search reads only the query terms'
    partitions, scores bit-identically to the streaming bm25_search — same
    SQL oracle."""
    import glob

    from apacheorcdotnet_ray.pipelines import text

    idx = _out_dir(sf_dir, "txt-index")
    if not glob.glob(os.path.join(idx, "meta.json")):
        text.text_index_build(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), idx)
    return text.text_index_search(idx, "hash join merge", k=10, idf="linear")


def _delete_scan(sf_dir: str):
    """Merge-on-read delete vectors: two delete_where passes write per-stripe
    bitmap sidecars (no stripe bytes rewritten); the decode applies them as a
    final row filter. Deletes accumulate and re-runs are idempotent, so the
    cached encode dir stays deterministic."""
    from apacheorcdotnet_ray.pipelines.deletes import delete_where
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_corpus

    out = _out_dir(sf_dir, "del-orders")
    encode_corpus([_table_path(sf_dir, "orders")], out)  # resume-aware
    delete_where(out, ("o_totalprice", ">", 200000.0))
    delete_where(out, [("o_orderstatus", "==", "F"),
                       ("o_custkey", "<", 500)])
    return decode_dataset(out)


def _bloom_semi_join(sf_dir: str):
    """Semi join via broadcast Bloom prefilter + exact co-partition verify:
    the scale path when the key set is too large to broadcast exactly."""
    from apacheorcdotnet_ray.pipelines.joins import bloom_semi_join

    return bloom_semi_join(
        _read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_linenumber", "l_quantity"]),
        _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).filter(
            expr="o_totalprice > 150000").select_columns(["o_orderkey"]),
        "l_orderkey", "o_orderkey")


def _semi_join(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.joins import semi_join

    return semi_join(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        _read(sf_dir, "orders", columns=["o_custkey"]),
        "c_custkey", "o_custkey")


def _anti_join(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.joins import anti_join

    return anti_join(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"]),
        _read(sf_dir, "orders", columns=["o_orderkey"]).filter(
            lambda r: r["o_orderkey"] % 3 == 0),
        "l_orderkey", "o_orderkey")


def _predicate_scan(sf_dir: str):
    """Stat-pruned decode: stripes whose footer min/max exclude the predicate
    are never read (the ORC ROW_INDEX analog)."""
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_corpus

    out = _out_dir(sf_dir, "rt-lineitem-pred")
    encode_corpus([_table_path(sf_dir, "lineitem")], out)
    return decode_dataset(
        out, columns=["l_orderkey", "l_partkey", "l_quantity"],
        predicate=("l_orderkey", "<=", 5000),
    )


def _predicate_scan_dict(sf_dir: str):
    """String predicate evaluated ON the dictionary encoding: one compare
    over the tiny sorted dict + a fancy-index over the id stream — row
    strings never materialize for the filter (columns.py
    column_predicate_mask)."""
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_corpus

    out = _out_dir(sf_dir, "rt-documents")
    encode_corpus([_table_path(sf_dir, "documents")], out)
    return decode_dataset(out, columns=["doc_id", "source", "n_chars"],
                          predicate=("source", "==", "src3"))


def _predicate_scan_stride(sf_dir: str):
    """Per-stride ROW_INDEX pushdown: stripes encode with row_index_stride
    so the predicate decompresses only qualifying 10k-row strides inside
    each surviving stripe (ColumnWriterStatistics.cs:12-33 analog)."""
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_corpus
    from apacheorcdotnet_ray.stripe import EncodeConfig

    out = _out_dir(sf_dir, "rt-lineitem-stride")
    encode_corpus([_table_path(sf_dir, "lineitem")], out,
                  config=EncodeConfig(row_index_stride=10_000))
    return decode_dataset(
        out, columns=["l_orderkey", "l_partkey", "l_quantity"],
        predicate=("l_orderkey", "<=", 5000),
    )


def _predicate_scan_zorder(sf_dir: str):
    """Z-order clustering: predicate on the NON-leading key still prunes
    (a plain sort would only serve its first column)."""
    import shutil

    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_zordered
    from apacheorcdotnet_ray.stripe import EncodeConfig

    out = _out_dir(sf_dir, "rt-events-zorder")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = _read(sf_dir, "events", columns=["event_id", "user_id"])
        encode_zordered(ds, out, by=["user_id", "event_id"],
                        config=EncodeConfig(row_index_stride=2000),
                        batch_size=2000).materialize()
        open(os.path.join(out, "_done"), "w").close()
    return _collect(decode_dataset(
        out, predicate=[("event_id", ">=", 2000), ("event_id", "<", 2500)]))


def _predicate_scan_bloom(sf_dir: str):
    """Point lookup with per-stripe Bloom filters: equality pruning on an
    unclustered key that min/max stats cannot exclude."""
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_corpus
    from apacheorcdotnet_ray.stripe import EncodeConfig

    out = _out_dir(sf_dir, "rt-lineitem-bloom")
    encode_corpus([_table_path(sf_dir, "lineitem")], out,
                  config=EncodeConfig(bloom_columns=("l_partkey",)))
    return _collect(decode_dataset(
        out, columns=["l_orderkey", "l_partkey", "l_quantity"],
        predicate=("l_partkey", "==", 577),
    ))


def _predicate_scan_sorted(sf_dir: str):
    """Key-clustered corpus: distributed sort by user_id before encoding,
    so stripe footer ranges are disjoint and a point/range predicate
    prunes nearly every stripe at the tail read."""
    import shutil

    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_sorted
    from apacheorcdotnet_ray.stripe import EncodeConfig

    out = _out_dir(sf_dir, "rt-events-sorted")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
        encode_sorted(ds, out, by="user_id",
                      config=EncodeConfig(row_index_stride=2000),
                      batch_size=2000).materialize()
        open(os.path.join(out, "_done"), "w").close()
    return _collect(decode_dataset(
        out, columns=["event_id", "user_id"],
        predicate=[("user_id", ">=", 100), ("user_id", "<", 120)],
    ))


def _predicate_scan_temporal(sf_dir: str):
    """Temporal predicate pushdown: ts-sorted stripes prune at the footer
    AND stride level, with one literal working end-to-end — an ISO string
    (with 'T' separator) for the lower bound and a datetime object for the
    upper bound, both pruning via parsed footer stats and filtering via the
    literal-casting compare kernel."""
    import datetime
    import shutil

    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_sorted
    from apacheorcdotnet_ray.stripe import EncodeConfig

    out = _out_dir(sf_dir, "rt-events-ts")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = _read(sf_dir, "events", columns=["event_id", "ts"])
        encode_sorted(ds, out, by="ts",
                      config=EncodeConfig(row_index_stride=2000),
                      batch_size=2000).materialize()
        open(os.path.join(out, "_done"), "w").close()
    return _collect(decode_dataset(
        out,
        predicate=[("ts", ">=", "2024-01-10T00:00:00"),
                   ("ts", "<", datetime.datetime(2024, 1, 12))],
    ))


def _dedup_minhash_exact(sf_dir: str):
    """MinHash+LSH against an EXACT SQL oracle: at jaccard_threshold=1.0 the
    sketch+verify pipeline must find precisely the identical-shingle-set
    pairs, which on this corpus equal the identical-text pairs (verified: no
    distinct-text set collisions). The corpus has no natural exact dups, so
    the query doubles it (each doc + an offset-id copy) — the full banded
    LSH shuffle + in-bucket verify path then has one guaranteed pair per
    doc, value-checked (ids AND jaccard=1.0) against the self-join oracle."""
    import pyarrow.compute as pc

    from apacheorcdotnet_ray.pipelines import dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def copy_ids(b):
        i = b.schema.get_field_index("doc_id")
        return b.set_column(i, "doc_id", pc.add(b.column("doc_id"), 1_000_000))

    doubled = docs.union(docs.map_batches(copy_ids, batch_format="pyarrow"))
    return dedup.dedup_minhash_lsh(doubled, jaccard_threshold=1.0)


def _hll_error_bound(sf_dir: str):
    """HyperLogLog estimate checked against the exact distributed distinct
    count: |est - n| must sit within 3σ = 3·1.04/√m of relative error —
    turns the sketch's no_oracle row into a checkable correctness row."""
    import pyarrow as pa

    from apacheorcdotnet_ray.pipelines import stats
    from apacheorcdotnet_ray.pipelines.stats import _HLL_P

    ds = _read(sf_dir, "lineitem", columns=["l_partkey"])
    est = stats.distinct_count_hll(ds, "l_partkey")["n_distinct_approx"][0].as_py()
    exact = stats.distinct_count(
        _read(sf_dir, "lineitem", columns=["l_partkey"]), "l_partkey"
    )["n_distinct"][0].as_py()
    sigma = 1.04 / (1 << _HLL_P) ** 0.5
    ok = abs(est - exact) <= 3 * sigma * exact
    return pa.table({"within_3sigma": pa.array([ok], type=pa.bool_())})


def _predicate_scan_conj(sf_dir: str):
    """Conjunction pushdown: two predicate terms prune stripes+strides and
    late-materialize together."""
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_corpus
    from apacheorcdotnet_ray.stripe import EncodeConfig

    out = _out_dir(sf_dir, "rt-lineitem-stride")
    encode_corpus([_table_path(sf_dir, "lineitem")], out,
                  config=EncodeConfig(row_index_stride=10_000))
    return decode_dataset(
        out, columns=["l_orderkey", "l_partkey", "l_quantity"],
        predicate=[("l_orderkey", "<=", 5000), ("l_quantity", ">=", 30.0)],
    )


def _roundtrip_structs(sf_dir: str):
    """Struct column round-trip: pack events columns into a (nested) struct,
    encode to stripes, decode, unpack back to flat columns."""
    import shutil

    import pyarrow as pa

    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_dataset

    def pack(batch: pa.Table) -> pa.Table:
        rec = pa.StructArray.from_arrays(
            [batch.column("user_id").combine_chunks(),
             batch.column("event_type").combine_chunks(),
             batch.column("value").combine_chunks()],
            names=["user_id", "event_type", "value"])
        return pa.table({"event_id": batch.column("event_id"), "rec": rec})

    def unpack(batch: pa.Table) -> pa.Table:
        rec = batch.column("rec").combine_chunks()
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": rec.field("user_id"),
            "event_type": rec.field("event_type"),
            "value": rec.field("value"),
        })

    out = _out_dir(sf_dir, "rt-structs")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "event_type", "value"]) \
            .map_batches(pack, batch_format="pyarrow")
        encode_dataset(ds, out, batch_size=50_000).materialize()
        open(os.path.join(out, "_done"), "w").close()
    return decode_dataset(out).map_batches(unpack, batch_format="pyarrow")


def _roundtrip_decimal38(sf_dir: str):
    """decimal(38,10) two-lane varint round-trip: mantissas pushed beyond 64
    bits so the DATA+SECONDARY path is exercised on real keys."""
    import shutil
    from decimal import Decimal

    import pyarrow as pa
    import pyarrow.compute as pc

    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_dataset

    def widen(batch: pa.Table) -> pa.Table:
        big = pc.multiply(
            pc.add(batch.column("o_orderkey"), 1).cast(pa.decimal128(19, 0)),
            pa.scalar(Decimal("10000000000000"), type=pa.decimal128(14, 0)),
        ).cast(pa.decimal128(38, 10))
        return pa.table({"o_orderkey": batch.column("o_orderkey"), "big": big})

    out = _out_dir(sf_dir, "rt-decimal38")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = _read(sf_dir, "orders", columns=["o_orderkey"]) \
            .map_batches(widen, batch_format="pyarrow")
        encode_dataset(ds, out, batch_size=100_000).materialize()
        open(os.path.join(out, "_done"), "w").close()

    def stringify(batch: pa.Table) -> pa.Table:
        # DuckDB's pandas bridge renders DECIMAL(38,10) as lossy float64, so
        # the oracle comparison runs on the exact string form instead
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "big": batch.column("big").cast(pa.string()),
        })

    return decode_dataset(out).map_batches(stringify, batch_format="pyarrow")


def _json_struct_roundtrip(sf_dir: str):
    """Real-data struct path: parse events.props JSON into a typed struct,
    round-trip it through stripe struct streams, flatten for the oracle."""
    import shutil

    import pyarrow as pa

    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_dataset
    from apacheorcdotnet_ray.pipelines.text import parse_json_struct

    out = _out_dir(sf_dir, "rt-json-struct")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = parse_json_struct(
            _read(sf_dir, "events", columns=["event_id", "props"]), "props")
        encode_dataset(ds, out, batch_size=50_000).materialize()
        open(os.path.join(out, "_done"), "w").close()

    def unpack(batch: pa.Table) -> pa.Table:
        rec = batch.column("props").combine_chunks()
        return pa.table({"event_id": batch.column("event_id"),
                         "k": rec.field("k")})

    return decode_dataset(out).map_batches(unpack, batch_format="pyarrow")


def _tokenize_roundtrip(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_dataset
    from apacheorcdotnet_ray.pipelines.text import tokenize_documents
    import shutil

    out = _out_dir(sf_dir, "rt-tokens")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = tokenize_documents(_read(sf_dir, "documents"))
        encode_dataset(ds, out, batch_size=10_000).materialize()
        open(os.path.join(out, "_done"), "w").close()
    dec = decode_dataset(out)
    return dec.select_columns(["doc_id", "n_tok", "source"])


def _grouped_roundtrip(sf_dir: str):
    """Tokenize → source-keyed skew-split stripe packing → decode."""
    import shutil

    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_grouped
    from apacheorcdotnet_ray.pipelines.text import tokenize_documents

    out = _out_dir(sf_dir, "rt-grouped")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        ds = tokenize_documents(_read(sf_dir, "documents"))
        encode_grouped(ds, out).materialize()
        open(os.path.join(out, "_done"), "w").close()
    return decode_dataset(out).select_columns(["doc_id", "n_tok", "source"])


def _grouped_source_scan(sf_dir: str):
    """Lineage partition pruning: the grouped corpus stamps each stripe
    with its source; a per-source read touches only those stripes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apacheorcdotnet_ray.sources.stripes import read_stripes

    _grouped_roundtrip(sf_dir)  # ensure the grouped corpus exists (cached)
    out = _out_dir(sf_dir, "rt-grouped")
    ds = read_stripes(out, columns=["doc_id", "n_tok", "source"],
                      lineage_filter={"source": "src3"})

    def exact(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("source"), "src3"))

    return ds.map_batches(exact, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline, the north-star shape end-to-end: documents →
    tokenize (vectorized map_batches) → source-keyed skew-split stripe
    packing through the actor-pool encoder (per-source FSST state, lineage
    per stripe) → decode back to the input_hint schema."""
    sf_dir = "/root/testdata/sf0.001"
    from apacheorcdotnet_ray.pipelines.encode import decode_dataset, encode_grouped
    from apacheorcdotnet_ray.pipelines.text import tokenize_documents
    import shutil

    out = _out_dir(sf_dir, "entry-tokens")
    shutil.rmtree(out, ignore_errors=True)
    ds = tokenize_documents(_read(sf_dir, "documents"))
    encode_grouped(ds, out).materialize()
    return decode_dataset(out)


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    from apacheorcdotnet_ray.pipelines import dedup, sample, similarity, stats, text

    def roundtrip(table):
        return lambda sf_dir: _roundtrip(sf_dir, table)

    def ann_topk(sf_dir):
        import numpy as np
        import pyarrow.parquet as pq

        t = pq.read_table(_table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        q = np.asarray(t["embedding"][int(np.argmin(ids))].as_py(), dtype=np.float64)
        res = similarity.brute_force_topk(_read(sf_dir, "embeddings"), q[None, :], k=10)
        return res.select(["vec_id"])

    def ann_filtered(sf_dir):
        import numpy as np
        import pyarrow.parquet as pq

        t = pq.read_table(_table_path(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        q = np.asarray(t["embedding"][int(np.argmin(ids))].as_py(),
                       dtype=np.float64)
        res = similarity.filtered_topk(
            _read(sf_dir, "embeddings",
                  columns=["vec_id", "embedding", "label"]),
            q[None, :], k=10, filter_expr="label == 1")
        return res.select(["vec_id"])

    def ann_ivf(sf_dir):
        import numpy as np
        import pyarrow.parquet as pq

        t = pq.read_table(_table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        q = np.asarray(t["embedding"][int(np.argmin(ids))].as_py(), dtype=np.float64)
        # n_probe = n_centroids → exact (every bucket scored); ids only
        return similarity.ivf_topk(_read(sf_dir, "embeddings"), q[None, :],
                                   k=10, n_centroids=16,
                                   n_probe=16).select(["vec_id"])

    # NOTE on dict ORDER: the driver evaluates roughly the first ~50 entries
    # per round, so queries are ordered by correctness-evidence need. The
    # literal dict below keeps its thematic grouping; _DRIVER_WINDOW_FIRST
    # (applied at the end) pulls this round's must-verify entries — fixed
    # oracle (group_cube), never-run (curate_end_to_end), newly-oracled,
    # new operators, and changed pipelines — into the window, then fills
    # the remaining slots with the entries whose last driver row is oldest.
    # Every entry also passes the identical local gate
    # (tools/check_queries.py).
    q = {
        # --- (1) never driver-verified (oracle-backed unless noted) ---
        "ngram_counts": lambda sf_dir: text.ngram_counts(
            _read(sf_dir, "documents", columns=["text"]), n=2, k=10),
        # idf="linear" for the oracle: its score uses only IEEE *,/ so the
        # doubles match DuckDB bit-for-bit (ln differs in the last ulp)
        "bm25_search": lambda sf_dir: text.bm25_search(
            _read(sf_dir, "documents", columns=["doc_id", "text"]),
            "hash join merge", k=10, idf="linear"),
        "tfidf_top_terms": lambda sf_dir: text.tfidf_top_terms(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), k=3,
            idf="linear"),
        "train_val_split": _train_val_split,
        "corpus_mix": _corpus_mix,
        "stratified_sample": _stratified_sample,
        "pack_sequences": _pack_sequences,
        "vocab_counts": lambda sf_dir: text.vocab_counts(
            text.tokenize_documents(_read(sf_dir, "documents")), k=20),
        "audio_features": _audio_features,
        # --- (2) new in round 3, no driver row yet ---
        "predicate_scan_temporal": _predicate_scan_temporal,
        "dedup_minhash_exact": _dedup_minhash_exact,
        "hll_error_bound": _hll_error_bound,
        "decontaminate": _decontaminate,
        "redact_terms": _redact_terms,
        "gopher_filter": _gopher_filter,
        "chunk_documents": _chunk_documents,
        "percentile_filter": _percentile_filter,
        "kmeans_assign": _kmeans_assign,
        "kmeans_clusters": _kmeans_clusters,
        "bpe_merges": _bpe_merges,
        "bpe_token_count": _bpe_token_count,
        "bpe_roundtrip": _bpe_roundtrip,
        "row_range_scan": _row_range_scan,
        "dup_ngram_spans": lambda sf_dir: dedup.dup_ngram_spans(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), n=4),
        "oov_rate": lambda sf_dir: text.oov_rate(
            _read(sf_dir, "documents", columns=["source", "text"]), k=12),
        "token_budget_sample": lambda sf_dir: sample.token_budget_sample(
            _read(sf_dir, "documents", columns=["doc_id", "text"]),
            budget=10000).select_columns(["doc_id"]),
        "epoch_shuffle_rank": lambda sf_dir: sample.epoch_shuffle_rank(
            _read(sf_dir, "documents", columns=["doc_id"]), epoch=3),
        "repetition_filter": _repetition_filter,
        "value_histogram": lambda sf_dir: stats.value_histogram(
            _read(sf_dir, "events", columns=["value"]), "value",
            bin_width=0.25),
        "corr_lineitem": lambda sf_dir: stats.corr_columns(
            _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]),
            "l_partkey", "l_suppkey"),
        "normalize_text": lambda sf_dir: text.normalize_text(
            _read(sf_dir, "documents", columns=["doc_id", "text"])),
        "running_total": lambda sf_dir: stats.running_total(
            _read(sf_dir, "events",
                  columns=["event_id", "user_id", "ts", "value"])),
        "event_paths": lambda sf_dir: stats.event_paths(
            _read(sf_dir, "events",
                  columns=["event_id", "user_id", "ts", "event_type"])),
        "top_orders_by_revenue": _top_orders_by_revenue,
        "group_cube": lambda sf_dir: stats.group_cube(
            _read(sf_dir, "documents", columns=["source", "lang", "n_chars"]),
            "source", "lang", "n_chars"),
        "heavy_hitters": lambda sf_dir: text.heavy_hitters(
            _read(sf_dir, "documents", columns=["text"]), phi=0.01),
        "weighted_sample": lambda sf_dir: sample.weighted_sample(
            _read(sf_dir, "documents", columns=["doc_id", "n_chars"]), k=20),
        "bloom_semi_join": _bloom_semi_join,
        "delete_scan": _delete_scan,
        "windowed_distinct": lambda sf_dir: stats.windowed_distinct(
            _read(sf_dir, "events", columns=["ts", "user_id"])),
        "bm25_index_search": _bm25_index_search,
        "profile_documents": lambda sf_dir: stats.profile_table(
            _read(sf_dir, "documents")),
        "ann_ivf_quantized": _ann_ivf_quantized,
        "knn_join": lambda sf_dir: similarity.knn_join(
            _read(sf_dir, "embeddings"), k=1).select_columns(["vec_id", "nn_id"]),
        # the beyond-RAM path: bucketed self-join, nothing broadcast; with
        # n_probe = n_centroids every (query, member) pair is scored in
        # exactly one bucket → exact, same oracle as knn_join
        "knn_join_ivf": lambda sf_dir: similarity.knn_join_ivf(
            _read(sf_dir, "embeddings"), k=1,
            n_centroids=4).select_columns(["vec_id", "nn_id"]),
        "embedding_centroids": _embedding_centroids,
        "quantile_sketch_bound": _quantile_sketch_bound,
        "predicate_scan_dict": _predicate_scan_dict,
        "dedup_incremental": _dedup_incremental,
        "lag_delta": lambda sf_dir: stats.lag_delta(
            _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])),
        "row_number_global": lambda sf_dir: stats.row_number_global(
            _read(sf_dir, "events", columns=["event_id", "value"]),
            "value", "event_id"),
        "curate_end_to_end": _curate_end_to_end,
        # --- (3) round-1 rows only ---
        "token_count_regex": lambda sf_dir: text.token_count_regex(
            _read(sf_dir, "documents", columns=["doc_id", "text"])),
        "token_count_by_source": lambda sf_dir: text.token_count_by_source(
            _read(sf_dir, "documents", columns=["source", "text"])),
        "quality_scores": lambda sf_dir: text.quality_scores(_read(sf_dir, "documents")),
        "quality_filter": lambda sf_dir: text.quality_filter(
            _read(sf_dir, "documents", columns=["doc_id", "text"]),
            min_words=40, min_uniq_ratio=0.25).select_columns(["doc_id"]),
        "lang_id": lambda sf_dir: text.lang_id(_read(sf_dir, "documents")),
        "doc_fingerprints": lambda sf_dir: text.doc_fingerprints(_read(sf_dir, "documents")),
        "dedup_exact": lambda sf_dir: dedup.dedup_exact(_read(sf_dir, "documents")),
        "dedup_minhash": lambda sf_dir: dedup.dedup_minhash_lsh(
            _read(sf_dir, "documents"), jaccard_threshold=0.8),
        "dedup_simhash": lambda sf_dir: dedup.dedup_simhash(_read(sf_dir, "documents")),
        "dedup_ngram_jaccard": lambda sf_dir: _collect(dedup.dedup_ngram_jaccard(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.8)),
        "dedup_embedding": lambda sf_dir: _collect(dedup.dedup_embedding_cosine(
            _read(sf_dir, "embeddings"), threshold=0.48)),
        # bands=8 (bits_per_band=2): measured recall 1.0 at threshold 0.45
        # on this corpus (14/14 exact pairs, 0 extras; deterministic seeded
        # planes) → exact all-pairs SQL oracle; precision is always exact
        # (in-bucket verify computes true cosine)
        "dedup_embedding_lsh": lambda sf_dir: dedup.dedup_embedding_lsh(
            _read(sf_dir, "embeddings"), threshold=0.45, n_planes=16,
            bands=8).select_columns(["vec_a", "vec_b"]),
        "dedup_end_to_end": _dedup_end_to_end,
        "ann_topk": ann_topk,
        "ann_filtered": ann_filtered,
        "ann_ivf": ann_ivf,
        "ann_ivf_indexed": _ann_ivf_indexed,
        "media_features": _media_features,
        "media_frame_sample": _media_frame_sample,
        # --- (4) round-2 rows ---
        "roundtrip_region": roundtrip("region"),
        "roundtrip_nation": roundtrip("nation"),
        "roundtrip_supplier": roundtrip("supplier"),
        "roundtrip_structs": _roundtrip_structs,
        "roundtrip_decimal38": _roundtrip_decimal38,
        "json_struct_roundtrip": _json_struct_roundtrip,
        "predicate_scan_stride": _predicate_scan_stride,
        "predicate_scan_conj": _predicate_scan_conj,
        "predicate_scan_sorted": _predicate_scan_sorted,
        "predicate_scan_bloom": _predicate_scan_bloom,
        "predicate_scan_zorder": _predicate_scan_zorder,
        "grouped_source_scan": _grouped_source_scan,
        "footer_stats_lineitem": _footer_stats_lineitem,
        "rollup_by_source": lambda sf_dir: stats.group_rollup(
            _read(sf_dir, "documents", columns=["source", "n_chars"]),
            "source", "n_chars"),
        "sliding_window_agg": lambda sf_dir: stats.sliding_windowed_agg(
            _read(sf_dir, "events", columns=["ts", "event_type", "value"])),
        "group_quantile": lambda sf_dir: stats.group_quantile(
            _read(sf_dir, "events", columns=["event_type", "value"]),
            "event_type", "value", q=0.5),
        "pivot_event_counts": lambda sf_dir: stats.pivot_counts(
            _read(sf_dir, "events", columns=["user_id", "event_type"]),
            "user_id", "event_type",
            ["click", "error", "purchase", "signup", "view"]),
        "set_intersect": _set_intersect,
        "set_except": _set_except,
        "set_union": _set_union,
        "distinct_sources": _distinct_sources,
        "hash_join": _hash_join,
        "orc_file_roundtrip": _orc_file_roundtrip,
        "orc_file_roundtrip_events": _orc_file_roundtrip_events,
        "orc_file_roundtrip_tokens": _orc_file_roundtrip_tokens,
        "orc_bloom_point_lookup": _orc_bloom_point_lookup,
        "full_outer_join": _full_outer_join,
        "semi_join": _semi_join,
        "anti_join": _anti_join,
        "group_dense_rank": lambda sf_dir: stats.group_dense_rank(
            _read(sf_dir, "events",
                  columns=["event_id", "user_id", "event_type"])),
        # --- (5) double-verified (rounds 1 AND 2) ---
        "roundtrip_lineitem": roundtrip("lineitem"),
        "roundtrip_orders": roundtrip("orders"),
        "roundtrip_customer": roundtrip("customer"),
        "roundtrip_part": roundtrip("part"),
        "roundtrip_events": roundtrip("events"),
        "roundtrip_documents": roundtrip("documents"),
        "roundtrip_embeddings": roundtrip("embeddings"),
        "roundtrip_orders_zstd": lambda sf_dir: _roundtrip(sf_dir, "orders", "zstd"),
        "predicate_scan": _predicate_scan,
        "tokenize_roundtrip": _tokenize_roundtrip,
        "grouped_encode_roundtrip": _grouped_roundtrip,
        # --- statistics (partial+final aggregation tree) ---
        "stats_lineitem": lambda sf_dir: stats.stats_row(
            _read(sf_dir, "lineitem"),
            int_columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
            float_columns=["l_quantity", "l_extendedprice"],
        ),
        "stats_by_source": lambda sf_dir: stats.group_stats_by(
            _read(sf_dir, "documents", columns=["source", "n_chars"]), "source", "n_chars"
        ),
        "windowed_agg_events": lambda sf_dir: stats.windowed_agg(
            _read(sf_dir, "events", columns=["ts", "event_type", "value"])),
        "distinct_count": lambda sf_dir: stats.distinct_count(
            _read(sf_dir, "lineitem", columns=["l_partkey"]), "l_partkey"),
        "distinct_count_hll": lambda sf_dir: stats.distinct_count_hll(
            _read(sf_dir, "lineitem", columns=["l_partkey"]), "l_partkey"),
        "top_k_event_types": lambda sf_dir: stats.top_k(
            _read(sf_dir, "events", columns=["event_type"]), "event_type", k=5),
        "pricing_summary": lambda sf_dir: stats.pricing_summary(
            _read(sf_dir, "lineitem", columns=[
                "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])),
        "top_k_by_user": lambda sf_dir: stats.top_k_by_group(
            _read(sf_dir, "events", columns=["user_id", "event_type"]),
            "user_id", "event_type", k=2),
        "sessionize": lambda sf_dir: stats.sessionize(
            _read(sf_dir, "events", columns=["user_id", "ts"])),
        "quantile_median": _quantile_median,
        "json_extract": lambda sf_dir: text.extract_json_field(
            _read(sf_dir, "events", columns=["event_id", "props"]), "props", "k"),
        "broadcast_join": _broadcast_join,
        "asof_join": _asof_join,
        "range_join_follow": _range_join_follow,
        "token_count": lambda sf_dir: text.token_count(_read(sf_dir, "documents")),
    }
    out = {k: q[k] for k in _DRIVER_WINDOW_FIRST}
    out.update(q)
    return out


# Round-5 driver window (first 50), rotated per the round-4 verdict item 7:
# the 36 queries whose newest green driver row is r01/r02 (stalest evidence
# first — includes distinct_count_hll, the one rows-only sketch query), the
# 3 orc_file_roundtrip* entries (the ORC writer was reworked this round:
# multi-stripe + ROW_INDEX + Metadata), hll_error_bound (the 3σ invariant
# companion the verdict asked to re-prove alongside distinct_count_hll),
# and the 10 stalest r03 rows to fill the window.
_DRIVER_WINDOW_FIRST = [
    # stalest: newest green row is r01/r02
    "footer_stats_lineitem", "rollup_by_source", "sliding_window_agg",
    "group_quantile", "pivot_event_counts", "set_intersect", "set_except",
    "set_union", "distinct_sources", "semi_join", "anti_join",
    "roundtrip_lineitem", "roundtrip_orders", "roundtrip_customer",
    "roundtrip_part", "roundtrip_events", "roundtrip_documents",
    "roundtrip_embeddings", "roundtrip_orders_zstd", "predicate_scan",
    "tokenize_roundtrip", "grouped_encode_roundtrip", "stats_lineitem",
    "stats_by_source", "windowed_agg_events", "distinct_count",
    "distinct_count_hll", "hll_error_bound", "top_k_event_types",
    "pricing_summary", "top_k_by_user", "sessionize", "quantile_median",
    "json_extract", "broadcast_join", "asof_join", "token_count",
    # pipelines touched this round (ORC writer rework + new round-5 ops)
    "orc_file_roundtrip", "orc_file_roundtrip_events",
    "orc_file_roundtrip_tokens", "orc_bloom_point_lookup", "ann_filtered",
    # stalest r03 rows, filling the 50-slot window (gopher_filter and
    # redact_terms rotated back out — their green r03 rows stand — to make
    # room for the two new round-5 ops' first driver runs)
    "ngram_counts", "bm25_search", "tfidf_top_terms", "train_val_split",
    "corpus_mix", "stratified_sample", "predicate_scan_temporal",
    "decontaminate",
]


def _dedup_end_to_end(sf_dir: str):
    """Full near-dup removal: exact ngram-jaccard pairs → connected
    components → canonical-survivor filter over the corpus."""
    from apacheorcdotnet_ray.pipelines import dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup.dedup_ngram_jaccard(docs, threshold=0.8)
    clusters = dedup.dup_clusters(pairs)
    return dedup.keep_canonical(docs, clusters).select_columns(["doc_id"])


def _train_val_split(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.sample import train_val_split

    _, val = train_val_split(_read(sf_dir, "documents", columns=["doc_id"]),
                             val_frac=0.25)
    return val


def _corpus_mix(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.sample import mix_sources

    return mix_sources(
        _read(sf_dir, "documents", columns=["doc_id", "source"]),
        {"src0": 1.0, "src1": 0.5, "src2": 0.25})


def _stratified_sample(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.sample import stratified_sample

    return stratified_sample(
        _read(sf_dir, "documents", columns=["doc_id", "source"]), n_per_group=5)


def _pack_sequences(sf_dir: str):
    from apacheorcdotnet_ray.pipelines.pack import pack_sequences
    from apacheorcdotnet_ray.pipelines.text import tokenize_documents

    ds = tokenize_documents(_read(sf_dir, "documents"))
    return pack_sequences(ds, seq_len=512, pad_id=0) \
        .select_columns(["first_doc", "n_docs", "n_tokens"])


def _decontaminate(sf_dir: str):
    """Benchmark decontamination: remove train docs sharing any 8-word
    shingle with the eval set (here: the src0 slice stands in for the eval
    benchmark)."""
    from apacheorcdotnet_ray.pipelines import curate

    train = _read(sf_dir, "documents", columns=["doc_id", "text"])
    test = _read(sf_dir, "documents", columns=["source", "text"]) \
        .filter(expr="source == 'src0'")
    return curate.decontaminate(train, test, n=8)


def _redact_terms(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import curate

    return curate.redact_terms(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        terms=("data", "hash"))


def _gopher_filter(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import curate

    return curate.gopher_filter(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def _chunk_documents(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import curate

    return curate.chunk_documents(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), chunk_words=32)


def _percentile_filter(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import curate

    return curate.percentile_filter(
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        "n_chars", q=0.5)


def _kmeans_assign(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import cluster

    return cluster.kmeans_assign(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), k=8)


def _kmeans_clusters(sf_dir: str):
    """Corpus-exact distributed Lloyd (iterative → rows-only check)."""
    from apacheorcdotnet_ray.pipelines import cluster

    return cluster.kmeans(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=8, iters=5)


def _top_orders_by_revenue(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import analytics

    return analytics.top_orders_by_revenue(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"]),
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]),
        min_total=100_000.0, k=10)


def _repetition_filter(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import curate

    # max_dup_frac=0 is the discriminative setting on this corpus (drops the
    # 27 docs with any duplicated 3-gram at sf0.01)
    return curate.repetition_filter(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        n=3, max_dup_frac=0.0)


def _bpe_merges(sf_dir: str):
    """BPE vocabulary training (iterative merge loop → rows-only check)."""
    from apacheorcdotnet_ray.pipelines import bpe

    return bpe.bpe_train(
        _read(sf_dir, "documents", columns=["text"]), n_merges=20)


def _bpe_token_count(sf_dir: str):
    """Apply a trained merge table per doc (model-derived → rows-only)."""
    from apacheorcdotnet_ray.pipelines import bpe

    return bpe.bpe_token_count(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), n_merges=20)


def _row_range_scan(sf_dir: str):
    """Trainer fast-forward: rows [3000, 4000) of the encoded lineitem
    corpus in encode order (== parquet row order) — non-overlapping stripes
    never open; inside a strided stripe only the overlapping strides
    decompress."""
    from apacheorcdotnet_ray.pipelines.encode import encode_corpus
    from apacheorcdotnet_ray.sources.stripes import read_row_range

    out = _out_dir(sf_dir, "rt-lineitem")
    encode_corpus([_table_path(sf_dir, "lineitem")], out)  # resume-aware
    return read_row_range(
        out, 3000, 1000,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity"])


def _bpe_roundtrip(sf_dir: str):
    """Full tokenizer fit→encode→decode; lossless, so the oracle is the
    identity SELECT over the source text (exact value-hash check)."""
    from apacheorcdotnet_ray.pipelines import bpe

    return bpe.bpe_roundtrip(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), n_merges=20)


def _media_features(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import multimodal as mm

    base = _read(sf_dir, "documents", columns=["doc_id"])
    # fmt="mixed": per-id rotation over synthetic / PPM / BMP payloads — the
    # PPM+BMP legs decode REAL byte formats (pure-NumPy parsers)
    return mm.extract_features(mm.decode_media(mm.synthesize_media(base, fmt="mixed"))) \
        .select_columns(["media_id", "mean_pixel", "std_pixel"])


def _audio_features(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import multimodal as mm

    base = _read(sf_dir, "documents", columns=["doc_id"])
    return mm.audio_features(mm.decode_audio(mm.synthesize_audio(base)))


def _media_frame_sample(sf_dir: str):
    from apacheorcdotnet_ray.pipelines import multimodal as mm

    base = _read(sf_dir, "documents", columns=["doc_id"])
    sampled = mm.sample_frames(mm.decode_media(mm.synthesize_media(base)), every_n=2)
    return sampled.select_columns(["media_id", "n_frames", "width", "height"])


# ---------------------------------------------------------------------------
# oracle-side independent recomputations (NO Ray — pure numpy/polars/pyarrow)
#
# Some operators are deterministic but not SQL-expressible (xxhash token ids,
# simhash bit votes, BPE merge loops, synthetic-media physics). Their oracles
# are generated here at oracle_sql() time by an INDEPENDENT naive
# reimplementation (per-doc Python/numpy loops instead of the pipelines'
# vectorized batch kernels) and emitted as VALUES tables, so DuckDB still
# executes the comparison and the driver's value-hash check stays exact.
# The driver's gate runs at sf0.01; _ORACLE_SF pins the generation input to
# the same tables (override with GRAFT_ORACLE_SF for local experiments).

_ORACLE_SF = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
_ORACLE_CACHE: dict[str, str] = {}


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        # as a QUOTED string: DuckDB parses bare decimal literals as
        # DECIMAL (lossy at >18 digits) before any cast, while
        # CAST(VARCHAR AS DOUBLE) is exact strtod of the shortest
        # round-trip repr → bit-identical double
        return "'" + repr(v) + "'"
    return str(int(v))


def _values_sql(names_types: list[tuple[str, str]], rows: list[tuple]) -> str:
    """SELECT CAST(cN AS T) AS name... FROM (VALUES ...) — dtype-pinned."""
    sel = ", ".join(f"CAST(c{i} AS {t}) AS {n}"
                    for i, (n, t) in enumerate(names_types))
    cols = ", ".join(f"c{i}" for i in range(len(names_types)))
    vals = ", ".join("(" + ", ".join(_sql_lit(v) for v in r) + ")"
                     for r in rows)
    return f"SELECT {sel} FROM (VALUES {vals}) AS t({cols})"


def _oracle_docs():
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(_ORACLE_SF, "documents.parquet"),
                         columns=["doc_id", "text"])


def _naive_word_hashes(texts: list[str]):
    """Per-doc uint64 word hashes via a naive Python split + one polars hash
    call (hash(value, seed) is position-independent, so this checks the
    pipelines' Arrow split_pattern/flatten path against plain str.split)."""
    import polars as pl

    words_per_doc = [t.split(" ") for t in texts]
    flat = [w for ws in words_per_doc for w in ws]
    wh = pl.Series("w", flat, dtype=pl.String).hash(seed=0) \
        .to_numpy().astype(np.uint64) if flat else np.empty(0, np.uint64)
    lens = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    return wh, offs


def _shingle_mult_naive(k: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (np.arange(k, dtype=np.uint64) * np.uint64(2) + np.uint64(1)) \
            * np.uint64(0x9E3779B97F4A7C15)


def _oracle_doc_fingerprints() -> str:
    """doc_fingerprints expected values: per-doc min of rolling 8-word
    shingle hashes (window fold for <8-word docs), naive per-doc loop."""
    t = _oracle_docs()
    ids = t["doc_id"].to_numpy()
    wh, offs = _naive_word_hashes(t["text"].to_pylist())
    mult = _shingle_mult_naive(8)
    rows = []
    for d in range(len(ids)):
        seg = wh[offs[d]:offs[d + 1]]
        with np.errstate(over="ignore"):
            if len(seg) >= 8:
                sh = np.zeros(len(seg) - 7, dtype=np.uint64)
                for j in range(8):
                    sh += seg[j:len(seg) - 7 + j] * mult[j]
                fp = sh.min()
            else:
                fp = (seg * mult[:len(seg)]).sum()
        rows.append((int(ids[d]), int(np.uint64(fp).astype(np.int64))))
    return _values_sql([("doc_id", "BIGINT"), ("fingerprint", "BIGINT")], rows)


def _oracle_dedup_simhash() -> str:
    """dedup_simhash expected pairs: naive per-doc 64-bit simhash (unit
    word-hash votes) + all-pairs popcount at hamming <= 3. Exactness of the
    pipeline's block trick is pigeonhole (d <= 3 < 4 blocks ⇒ one exact
    block shared), so the naive all-pairs set IS the expected output."""
    t = _oracle_docs()
    ids = t["doc_id"].to_numpy()
    wh, offs = _naive_word_hashes(t["text"].to_pylist())
    n = len(ids)
    sigs = np.empty(n, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    for d in range(n):
        seg = wh[offs[d]:offs[d + 1]]
        bits = ((seg[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sigs[d] = ((votes > 0).astype(np.uint64)
                   << shifts).sum(dtype=np.uint64)
    order = np.argsort(ids)
    ids_s, sig_s = ids[order], sigs[order]
    rows = []
    for i in range(n):
        x = sig_s[i] ^ sig_s[i + 1:]
        if not len(x):
            continue
        # popcount via uint8 view (byte order irrelevant for a popcount)
        d = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                          axis=1).sum(axis=1).astype(np.int64)
        for j in np.nonzero(d <= 3)[0]:
            rows.append((int(ids_s[i]), int(ids_s[i + 1 + j]), int(d[j])))
    rows.sort()
    return _values_sql(
        [("doc_a", "BIGINT"), ("doc_b", "BIGINT"), ("hamming", "BIGINT")], rows)


def _oracle_vocab_counts() -> str:
    """vocab_counts expected top-20: naive histogram over xxhash%50257 token
    ids (the pipelines' distributed bincount tree vs one flat bincount)."""
    t = _oracle_docs()
    wh, _ = _naive_word_hashes(t["text"].to_pylist())
    tok = (wh % np.uint64(50257)).astype(np.int64)
    total = np.bincount(tok, minlength=50257)[:50257].astype(np.int64)
    order = np.argsort(-total, kind="stable")[:20]
    rows = [(int(i), int(total[i])) for i in order]
    return _values_sql([("token_id", "INTEGER"), ("cnt", "BIGINT")], rows)


def _oracle_pack_sequences() -> str:
    """pack_sequences oracle: only the partition assignment (polars
    hash_rows — not SQL-expressible) is injected as VALUES; DuckDB then
    recomputes the greedy flat-stream packing itself from (part, doc_id,
    n_tok) with window functions — a genuine cross-engine check of the
    searchsorted/bincount packing math."""
    import polars as pl

    t = _oracle_docs()
    ids = [str(i) for i in t["doc_id"].to_pylist()]
    import pyarrow as pa

    h = pl.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.string())})) \
        .hash_rows(seed=1).to_numpy()
    parts = (h % np.uint64(64)).astype(np.int64)
    pv = _values_sql([("doc_id_s", "VARCHAR"), ("part", "BIGINT")],
                     list(zip(ids, parts.tolist())))
    return (
        f"WITH parts AS ({pv}),"
        " d AS (SELECT CAST(doc_id AS VARCHAR) AS s,"
        "   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok"
        "   FROM documents),"
        " t AS (SELECT p.part, d.s AS doc_id, d.n_tok,"
        "   sum(d.n_tok) OVER (PARTITION BY p.part ORDER BY d.s"
        "     ROWS UNBOUNDED PRECEDING) - d.n_tok AS st"
        "   FROM parts p JOIN d ON d.s = p.doc_id_s),"
        " tot AS (SELECT part, CAST(sum(n_tok) AS BIGINT) AS tt"
        "   FROM t GROUP BY part),"
        " seqs AS (SELECT part, tt,"
        "   unnest(range(CAST(ceil(tt / 512.0) AS BIGINT))) AS w FROM tot)"
        " SELECT min(t.doc_id) AS first_doc,"
        "  CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(least(s.w * 512 + 512, s.tt) - s.w * 512 AS BIGINT)"
        "    AS n_tokens"
        " FROM seqs s JOIN t ON t.part = s.part"
        "  AND t.st < least(s.w * 512 + 512, s.tt)"
        "  AND t.st + t.n_tok > s.w * 512"
        " GROUP BY s.part, s.w, s.tt"
    )


def _oracle_kmeans_clusters() -> str:
    """kmeans_clusters oracle: centroids from an independent numpy Lloyd
    replication (chunked in file order like the streaming pass), injected
    as VALUES; DuckDB then recomputes the FINAL assignment + per-cluster
    counts itself (argmax cosine — normalization-free since centroids are
    unit vectors)."""
    import pyarrow.parquet as pq

    e = pq.read_table(os.path.join(_ORACLE_SF, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = e["vec_id"].to_numpy()
    m = np.array(e["embedding"].to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    k = 8
    seed_idx = np.argsort(ids)[:k]
    seed_ids_order = np.argsort(ids[seed_idx])  # already sorted, keep explicit
    cent = mn[seed_idx[seed_ids_order]].copy()
    for _ in range(5):
        sums = np.zeros_like(cent)
        counts = np.zeros(k, dtype=np.int64)
        for c0 in range(0, len(mn), 1024):  # replicate the batch structure
            mb = mn[c0:c0 + 1024]
            assign = np.argmax(mb @ cent.T, axis=1)
            np.add.at(sums, assign, mb)
            counts += np.bincount(assign, minlength=k)
        nz = counts > 0
        upd = sums[nz] / counts[nz, None]
        cent[nz] = upd / np.linalg.norm(upd, axis=1, keepdims=True)
    rows = [(ci, pi + 1, float(cent[ci, pi]))
            for ci in range(k) for pi in range(cent.shape[1])]
    cv = _values_sql([("cluster", "BIGINT"), ("pos", "BIGINT"),
                      ("val", "DOUBLE")], rows)
    return (
        f"WITH c AS ({cv}),"
        " e AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS ev,"
        "   unnest(generate_series(1, len(embedding))) AS pos"
        "   FROM embeddings),"
        " s AS (SELECT e.vec_id, c.cluster, sum(e.ev * c.val) AS sim"
        "   FROM e JOIN c USING (pos) GROUP BY 1, 2),"
        " a AS (SELECT vec_id, cluster FROM s QUALIFY row_number() OVER"
        "   (PARTITION BY vec_id ORDER BY sim DESC, cluster) = 1),"
        " kk AS (SELECT DISTINCT cluster FROM c),"
        " g AS (SELECT cluster, count(*) AS cnt FROM a GROUP BY cluster)"
        " SELECT kk.cluster, CAST(coalesce(g.cnt, 0) AS BIGINT) AS n_members"
        " FROM kk LEFT JOIN g USING (cluster)"
    )


def _naive_bpe():
    """Independent BPE reimplementation: plain Counter histogram + per-word
    Python merge loop (greedy left-to-right fusion, max-freq/min-pair-key
    tie-break — the _merge_loop contract re-derived without numpy)."""
    from collections import Counter

    t = _oracle_docs()
    texts = t["text"].to_pylist()
    hist = Counter(w for txt in texts for w in txt.split(" "))
    syms = {w: list(w) for w in hist}
    merges = []
    for rank in range(20):
        pairs: Counter = Counter()
        for w, cnt in hist.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        (l, r), f = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + "\x00" + kv[0][1]))
        if f <= 0:
            break
        merges.append((rank, l, r, int(f)))
        for w in hist:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms, t


def _oracle_bpe_merges() -> str:
    merges, _, _ = _naive_bpe()
    return _values_sql([("rank", "BIGINT"), ("left", "VARCHAR"),
                        ("right", "VARCHAR"), ("freq", "BIGINT")], merges)


def _oracle_bpe_token_count() -> str:
    _, syms, t = _naive_bpe()
    rows = [(int(i), sum(len(syms[w]) for w in txt.split(" ")))
            for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())]
    return _values_sql([("doc_id", "BIGINT"), ("n_bpe_tokens", "BIGINT")], rows)


def _oracle_audio_features() -> str:
    """audio_features expected values re-derived from the synthesis physics
    (sine + seeded noise → PCM16): every feature is exact integer arithmetic
    in float64 (squares < 2^42), so the WAV encode→decode→reduceat pipeline
    must reproduce these doubles bit-for-bit."""
    t = _oracle_docs()
    rows = []
    rate = 16_000
    for i in t["doc_id"].to_pylist():
        rng = np.random.default_rng(int(i))
        n = int(rate // 10 + (i % 7) * rate // 100)
        tt = np.arange(n) / rate
        freq = 220.0 + float(i % 24) * 55.0
        wave = 0.6 * np.sin(2 * np.pi * freq * tt) + 0.1 * rng.normal(size=n)
        pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        flat = pcm.astype(np.float64)
        rms = float(np.sqrt((flat * flat).sum() / n))
        zc = int((np.signbit(flat[1:]) != np.signbit(flat[:-1])).sum())
        rows.append((int(i), float(n / rate), rms, float(zc / n)))
    return _values_sql([("media_id", "BIGINT"), ("duration_s", "DOUBLE"),
                        ("rms", "DOUBLE"), ("zcr", "DOUBLE")], rows)


def _oracle_media_features() -> str:
    """media_features (fmt='mixed') expected values: re-synthesize each
    item's pixels from its seeded RNG, apply the integer gray transform for
    the PPM/BMP legs, and compute mean/std — exact integer sums in float64,
    so the real byte-format encode→decode path must match bit-for-bit."""
    t = _oracle_docs()
    rows = []
    for i in t["doc_id"].to_pylist():
        i = int(i)
        w = 16 + (i % 3) * 8
        h = 16 + (i % 5) * 4
        fmt = ["synthetic", "ppm", "bmp"][i % 3]
        rng = np.random.default_rng(i)
        if fmt == "synthetic":
            frames = 6 if i % 4 == 0 else 1
            gray = rng.integers(0, 256, size=frames * w * h, dtype=np.uint8)
        else:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            r = img[..., 0].astype(np.uint32)
            g = img[..., 1].astype(np.uint32)
            b = img[..., 2].astype(np.uint32)
            gray = ((r * 299 + g * 587 + b * 114) // 1000) \
                .astype(np.uint8).ravel()
        fl = gray.astype(np.float64)
        n = len(fl)
        mean = fl.sum() / n
        std = float(np.sqrt(max((fl * fl).sum() / n - mean * mean, 0.0)))
        rows.append((i, float(mean), std))
    return _values_sql([("media_id", "BIGINT"), ("mean_pixel", "DOUBLE"),
                        ("std_pixel", "DOUBLE")], rows)


def oracle_sql() -> dict[str, str]:
    stopword_terms = " + ".join(
        f"CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' {w} ', '')))/{len(w)+2} AS BIGINT)"
        for w in ("the", "a", "of", "and", "to", "in", "is", "on")
    )
    return {
        "roundtrip_lineitem": "SELECT * FROM lineitem",
        "roundtrip_orders": "SELECT * FROM orders",
        "roundtrip_customer": "SELECT * FROM customer",
        "roundtrip_part": "SELECT * FROM part",
        "roundtrip_events": "SELECT * FROM events",
        "roundtrip_region": "SELECT * FROM region",
        "roundtrip_nation": "SELECT * FROM nation",
        "roundtrip_supplier": "SELECT * FROM supplier",
        "roundtrip_documents": "SELECT * FROM documents",
        "roundtrip_embeddings": "SELECT * FROM embeddings",
        "roundtrip_orders_zstd": "SELECT * FROM orders",
        "predicate_scan": (
            "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem"
            " WHERE l_orderkey <= 5000"
        ),
        "predicate_scan_stride": (
            "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem"
            " WHERE l_orderkey <= 5000"
        ),
        "predicate_scan_conj": (
            "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem"
            " WHERE l_orderkey <= 5000 AND l_quantity >= 30.0"
        ),
        "predicate_scan_sorted": (
            "SELECT event_id, user_id FROM events"
            " WHERE user_id >= 100 AND user_id < 120"
        ),
        "predicate_scan_temporal": (
            "SELECT event_id, ts FROM events"
            " WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'"
            " AND ts < TIMESTAMP '2024-01-12 00:00:00'"
        ),
        "dedup_minhash_exact": (
            "WITH pool AS (SELECT doc_id, text FROM documents"
            " UNION ALL SELECT doc_id + 1000000, text FROM documents)"
            " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            " CAST(1.0 AS DOUBLE) AS jaccard"
            " FROM pool a JOIN pool b ON a.text = b.text AND a.doc_id < b.doc_id"
        ),
        "hll_error_bound": "SELECT TRUE AS within_3sigma",
        "quantile_sketch_bound": "SELECT TRUE AS within_bound",
        "predicate_scan_dict": (
            "SELECT doc_id, source, n_chars FROM documents"
            " WHERE source = 'src3'"
        ),
        "dedup_incremental": (
            "SELECT d.doc_id FROM documents d WHERE d.source = 'src5'"
            " AND EXISTS (SELECT 1 FROM documents c WHERE c.source <> 'src5'"
            "  AND substr(c.text, 1, 100) = substr(d.text, 1, 100))"
        ),
        "curate_end_to_end": (
            "WITH base AS (SELECT doc_id, text,"
            "   len(string_split(text, ' ')) AS nw, length(text) AS tl"
            "   FROM documents),"
            " top AS (SELECT doc_id, max(c) AS topc FROM"
            "   (SELECT doc_id, w, count(*) AS c FROM"
            "     (SELECT doc_id, unnest(string_split(text, ' ')) AS w"
            "      FROM documents) GROUP BY doc_id, w) GROUP BY doc_id),"
            " gpass AS (SELECT b.doc_id FROM base b JOIN top USING (doc_id)"
            "  WHERE nw BETWEEN 30 AND 100000"
            "   AND CAST(tl - (nw - 1) AS DOUBLE) / nw >= 2.5"
            "   AND CAST(tl - (nw - 1) AS DOUBLE) / nw <= 10.0"
            f"  AND ({stopword_terms}) >= 2"
            "   AND CAST(topc AS DOUBLE) / nw <= 0.2),"
            " w AS (SELECT doc_id, string_split(text, ' ') AS ws, text"
            "   FROM documents),"
            " sh AS (SELECT doc_id,"
            "   CASE WHEN len(ws) < 3 THEN [text]"
            "        ELSE list_transform(range(1, len(ws) - 1),"
            "             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])"
            "   END AS s FROM w),"
            " rpass AS (SELECT doc_id FROM sh"
            "  WHERE CAST(len(s) - len(list_distinct(s)) AS DOUBLE) / len(s)"
            "    <= 0.2),"
            " surv AS (SELECT d.doc_id, substr(d.text, 1, 100) AS pfx,"
            "   b.nw AS n_tok FROM documents d JOIN base b USING (doc_id)"
            "  WHERE d.doc_id IN (SELECT doc_id FROM gpass)"
            "   AND d.doc_id IN (SELECT doc_id FROM rpass))"
            " SELECT s.doc_id, CAST(s.n_tok AS BIGINT) AS n_tok FROM surv s"
            " WHERE s.doc_id = (SELECT min(s2.doc_id) FROM surv s2"
            "   WHERE s2.pfx = s.pfx)"
        ),
        "lag_delta": (
            "SELECT event_id, user_id,"
            " CAST(epoch_ms(ts) - LAG(epoch_ms(ts)) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)"
            " AS delta_ms FROM events"
        ),
        "row_number_global": (
            "SELECT event_id, CAST(ROW_NUMBER() OVER ("
            " ORDER BY value, event_id) AS BIGINT) AS rn FROM events"
        ),
        # CUBE key columns are non-null in the data, so the grouping-set
        # NULLs are unambiguous without GROUPING()
        "group_cube": (
            "SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS sum_val,"
            " count(*) AS n_rows"
            " FROM documents GROUP BY CUBE(source, lang)"
        ),
        # threshold = floor(phi * N): int() truncation in Python ==
        # FLOOR here (both positive), same single IEEE multiply
        "heavy_hitters": (
            "WITH t AS (SELECT unnest(string_split(text, ' ')) AS w"
            "   FROM documents),"
            " g AS (SELECT w, count(*) AS cnt FROM t GROUP BY w),"
            " n AS (SELECT count(*) AS total FROM t)"
            " SELECT w, cnt FROM g, n WHERE cnt > FLOOR(0.01 * total)"
        ),
        # priority is ONE IEEE double division on both sides (hash and
        # n_chars are exactly representable), so selection is bit-exact
        "weighted_sample": (
            "SELECT doc_id, CAST((doc_id % 2147483647) * 2654435761"
            "   % 1000000 AS DOUBLE) / n_chars AS priority"
            " FROM documents ORDER BY priority, doc_id LIMIT 20"
        ),
        "bloom_semi_join": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
            " WHERE l_orderkey IN (SELECT o_orderkey FROM orders"
            "   WHERE o_totalprice > 150000)"
        ),
        "profile_documents": (
            " UNION ALL ".join(
                f"SELECT '{c}' AS col, count(*) AS n_rows,"
                f" count(*) - count({c}) AS n_nulls,"
                f" count(DISTINCT {c}) AS n_distinct FROM documents"
                for c in ("doc_id", "text", "lang", "source", "n_chars"))
        ),
        "windowed_distinct": (
            "SELECT date_trunc('hour', ts) AS window_start,"
            " CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct"
            " FROM events GROUP BY 1"
        ),
        # rows surviving both delete_where passes
        "delete_scan": (
            "SELECT * FROM orders"
            " WHERE NOT (o_totalprice > 200000)"
            " AND NOT (o_orderstatus = 'F' AND o_custkey < 500)"
        ),
        "predicate_scan_bloom": (
            "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem"
            " WHERE l_partkey = 577"
        ),
        "predicate_scan_zorder": (
            "SELECT event_id, user_id FROM events"
            " WHERE event_id >= 2000 AND event_id < 2500"
        ),
        "roundtrip_structs": (
            "SELECT event_id, user_id, event_type, value FROM events"
        ),
        "json_struct_roundtrip": (
            "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events"
        ),
        "roundtrip_decimal38": (
            "SELECT o_orderkey, CAST(CAST((CAST(o_orderkey AS HUGEINT) + 1)"
            " * 10000000000000 AS DECIMAL(38,10)) AS VARCHAR) AS big FROM orders"
        ),
        "tokenize_roundtrip": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
            " CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok, source"
            " FROM documents"
        ),
        "grouped_encode_roundtrip": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
            " CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok, source"
            " FROM documents"
        ),
        "grouped_source_scan": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
            " CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok, source"
            " FROM documents WHERE source = 'src3'"
        ),
        "stats_lineitem": (
            "SELECT count(*) AS n_rows,"
            " min(l_orderkey) AS l_orderkey_min, max(l_orderkey) AS l_orderkey_max,"
            " CAST(sum(l_orderkey) AS BIGINT) AS l_orderkey_sum,"
            " min(l_partkey) AS l_partkey_min, max(l_partkey) AS l_partkey_max,"
            " CAST(sum(l_partkey) AS BIGINT) AS l_partkey_sum,"
            " min(l_suppkey) AS l_suppkey_min, max(l_suppkey) AS l_suppkey_max,"
            " CAST(sum(l_suppkey) AS BIGINT) AS l_suppkey_sum,"
            " min(l_linenumber) AS l_linenumber_min, max(l_linenumber) AS l_linenumber_max,"
            " CAST(sum(l_linenumber) AS BIGINT) AS l_linenumber_sum,"
            " min(l_quantity) AS l_quantity_min, max(l_quantity) AS l_quantity_max,"
            " min(l_extendedprice) AS l_extendedprice_min, max(l_extendedprice) AS l_extendedprice_max"
            " FROM lineitem"
        ),
        "footer_stats_lineitem": (
            "SELECT count(*) AS n_rows,"
            " min(l_orderkey) AS l_orderkey_min, max(l_orderkey) AS l_orderkey_max,"
            " CAST(sum(l_orderkey) AS BIGINT) AS l_orderkey_sum,"
            " min(l_partkey) AS l_partkey_min, max(l_partkey) AS l_partkey_max,"
            " CAST(sum(l_partkey) AS BIGINT) AS l_partkey_sum,"
            " min(l_suppkey) AS l_suppkey_min, max(l_suppkey) AS l_suppkey_max,"
            " CAST(sum(l_suppkey) AS BIGINT) AS l_suppkey_sum,"
            " min(l_linenumber) AS l_linenumber_min, max(l_linenumber) AS l_linenumber_max,"
            " CAST(sum(l_linenumber) AS BIGINT) AS l_linenumber_sum,"
            " min(l_quantity) AS l_quantity_min, max(l_quantity) AS l_quantity_max,"
            " min(l_extendedprice) AS l_extendedprice_min, max(l_extendedprice) AS l_extendedprice_max"
            " FROM lineitem"
        ),
        "rollup_by_source": (
            "SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_val,"
            " count(*) AS n_rows FROM documents GROUP BY ROLLUP(source)"
        ),
        "stats_by_source": (
            "SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_val,"
            " count(*) AS n_rows FROM documents GROUP BY source"
        ),
        "token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words"
            " FROM documents"
        ),
        "token_count_regex": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text,"
            " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens"
            " FROM documents"
        ),
        "windowed_agg_events": (
            "SELECT date_trunc('hour', ts) AS window_start, event_type,"
            " CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_millis,"
            " count(*) AS n_events"
            " FROM events GROUP BY 1, 2"
        ),
        "sliding_window_agg": (
            "WITH e AS (SELECT ts, event_type,"
            "   CAST(floor(value * 1000) AS BIGINT) AS v FROM events),"
            " x AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts)"
            "   - j * INTERVAL 15 MINUTE AS window_start, event_type, v"
            "   FROM e, (SELECT unnest([0, 1, 2, 3]) AS j) t)"
            " SELECT window_start, event_type,"
            " CAST(sum(v) AS BIGINT) AS sum_millis, count(*) AS n_events"
            " FROM x GROUP BY 1, 2"
        ),
        "distinct_count": (
            "SELECT count(DISTINCT l_partkey) AS n_distinct FROM lineitem"
        ),
        "top_k_event_types": (
            "SELECT event_type, count(*) AS cnt FROM events"
            " GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 5"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,"
            " CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,"
            " count(*) AS count_order"
            " FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "top_k_by_user": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS cnt FROM events"
            "   GROUP BY user_id, event_type),"
            " r AS (SELECT *, row_number() OVER (PARTITION BY user_id"
            "   ORDER BY cnt DESC, event_type) AS rank FROM c)"
            " SELECT user_id, event_type, CAST(cnt AS BIGINT) AS cnt,"
            " CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 2"
        ),
        "sessionize": (
            "WITH g AS (SELECT user_id, CASE WHEN lag(ts) OVER w IS NULL"
            "  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s"
            " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))"
            " SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,"
            " count(*) AS n_events FROM g GROUP BY user_id"
        ),
        "quantile_median": (
            "SELECT quantile_disc(value, 0.5) AS median FROM events"
        ),
        "group_quantile": (
            "SELECT event_type, quantile_disc(value, 0.5) AS q50"
            " FROM events GROUP BY event_type"
        ),
        "pivot_event_counts": (
            "SELECT user_id,"
            + ",".join(
                f" CAST(sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS n_{c}"
                for c in ("click", "error", "purchase", "signup", "view"))
            + " FROM events GROUP BY user_id"
        ),
        "json_extract": (
            "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events"
        ),
        "set_intersect": (
            "SELECT c_custkey AS key FROM customer"
            " INTERSECT SELECT o_custkey AS key FROM orders"
        ),
        "set_union": (
            "SELECT c_custkey AS key FROM customer"
            " UNION SELECT o_custkey AS key FROM orders"
        ),
        "distinct_sources": "SELECT DISTINCT source FROM documents",
        "set_except": (
            "SELECT c_custkey AS key FROM customer"
            " EXCEPT SELECT o_custkey AS key FROM orders"
        ),
        "broadcast_join": (
            "SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_name"
            " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
        ),
        "range_join_follow": (
            "SELECT a.event_id, CAST(count(b.event_id) AS BIGINT) AS n_follow"
            " FROM events a LEFT JOIN events b"
            " ON b.user_id = a.user_id AND b.ts > a.ts"
            "  AND b.ts <= a.ts + INTERVAL 1 HOUR"
            " GROUP BY a.event_id"
        ),
        "semi_join": (
            "SELECT c_custkey, c_name FROM customer"
            " WHERE c_custkey IN (SELECT o_custkey FROM orders)"
        ),
        "anti_join": (
            "SELECT l_orderkey, l_linenumber FROM lineitem"
            " WHERE l_orderkey NOT IN"
            "  (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)"
        ),
        "hash_join": (
            "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,"
            " o.o_custkey, o.o_totalprice"
            " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        ),
        "orc_bloom_point_lookup": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "WHERE o_orderkey = 7"),
        "orc_file_roundtrip": "SELECT * FROM documents",
        "orc_file_roundtrip_events": "SELECT * FROM events",
        "orc_file_roundtrip_tokens": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
            " CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok, source"
            " FROM documents"
        ),
        "full_outer_join": (
            "SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,"
            " c.c_name, o.o_totalprice"
            " FROM (SELECT c_custkey, c_name FROM customer"
            "   WHERE c_custkey % 2 = 0) c"
            " FULL OUTER JOIN (SELECT o_custkey, o_totalprice FROM orders"
            "   WHERE o_orderkey % 5 = 0) o"
            " ON c.c_custkey = o.o_custkey"
        ),
        "group_dense_rank": (
            "SELECT event_id, user_id, CAST(DENSE_RANK() OVER ("
            " PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS drank"
            " FROM events"
        ),
        "asof_join": (
            "WITH r AS (SELECT o_custkey AS k, o_orderdate AS t,"
            "   max(o_totalprice) AS val FROM orders GROUP BY 1, 2)"
            " SELECT e.event_id, e.ts, r.val AS o_totalprice"
            " FROM events e ASOF LEFT JOIN r ON e.user_id = r.k AND e.ts >= r.t"
        ),
        "dedup_ngram_jaccard": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents),"
            " sh AS (SELECT doc_id,"
            "   CASE WHEN len(ws) < 3 THEN [text]"
            "        ELSE list_distinct(list_transform(range(1, len(ws)-1),"
            "             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s"
            "   FROM w)"
            " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            "  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
            "    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard"
            " FROM sh a, sh b"
            " WHERE a.doc_id < b.doc_id"
            "  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
            "    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8"
        ),
        "token_count_by_source": (
            "SELECT source,"
            " CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words,"
            " count(*) AS n_docs FROM documents GROUP BY source"
        ),
        "quality_scores": (
            "SELECT doc_id,"
            " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,"
            " CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_words,"
            " CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
            "   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,"
            " CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)"
            "   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len"
            " FROM documents"
        ),
        "quality_filter": (
            "SELECT doc_id FROM documents"
            " WHERE len(string_split(text, ' ')) BETWEEN 40 AND 10000"
            " AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
            "   / len(string_split(text, ' ')) >= 0.25"
        ),
        "lang_id": (
            f"SELECT doc_id, ({stopword_terms}) AS stop_hits,"
            f" CASE WHEN ({stopword_terms}) > 0 THEN 'en' ELSE 'other' END AS lang_pred"
            " FROM documents"
        ),
        "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        "ngram_counts": (
            "WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),"
            " u AS (SELECT unnest(list_transform(range(1, len(ws)),"
            "   i -> ws[i] || ' ' || ws[i+1])) AS ng FROM w)"
            " SELECT ng, count(*) AS cnt FROM u GROUP BY ng"
            " ORDER BY cnt DESC, ng LIMIT 10"
        ),
        # bm25: idf="linear" + identical IEEE evaluation order on both sides
        # (sum over terms left-assoc in sorted term order); tf counts use the
        # shared non-overlapping ' term ' convention (same as lang_id)
        # tf = exact tokenized term frequency (count of words equal to the
        # term), matching text.bm25_search's index_in+bincount kernel
        "bm25_search": (
            "WITH p AS (SELECT doc_id, string_split(text, ' ') AS ws,"
            "   len(string_split(text, ' ')) AS dl FROM documents),"
            " tf AS (SELECT doc_id, CAST(dl AS DOUBLE) AS dl,"
            "   CAST(len(list_filter(ws, w -> w = 'hash')) AS DOUBLE) AS tf0,"
            "   CAST(len(list_filter(ws, w -> w = 'join')) AS DOUBLE) AS tf1,"
            "   CAST(len(list_filter(ws, w -> w = 'merge')) AS DOUBLE) AS tf2"
            "   FROM p),"
            " g AS (SELECT count(*) AS n, sum(dl) AS sdl,"
            "   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,"
            "   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,"
            "   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM tf),"
            " s AS (SELECT tf.doc_id,"
            "   (CAST(g.n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) * tf0 * (1.2 + 1.0)"
            "     / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (g.sdl / g.n)))"
            "   + (CAST(g.n AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) * tf1 * (1.2 + 1.0)"
            "     / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (g.sdl / g.n)))"
            "   + (CAST(g.n AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) * tf2 * (1.2 + 1.0)"
            "     / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (g.sdl / g.n)))"
            "   AS score FROM tf, g)"
            " SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "bm25_index_search": (
            "WITH p AS (SELECT doc_id, string_split(text, ' ') AS ws,"
            "   len(string_split(text, ' ')) AS dl FROM documents),"
            " tf AS (SELECT doc_id, CAST(dl AS DOUBLE) AS dl,"
            "   CAST(len(list_filter(ws, w -> w = 'hash')) AS DOUBLE) AS tf0,"
            "   CAST(len(list_filter(ws, w -> w = 'join')) AS DOUBLE) AS tf1,"
            "   CAST(len(list_filter(ws, w -> w = 'merge')) AS DOUBLE) AS tf2"
            "   FROM p),"
            " g AS (SELECT count(*) AS n, sum(dl) AS sdl,"
            "   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,"
            "   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,"
            "   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM tf),"
            " s AS (SELECT tf.doc_id,"
            "   (CAST(g.n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) * tf0 * (1.2 + 1.0)"
            "     / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (g.sdl / g.n)))"
            "   + (CAST(g.n AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) * tf1 * (1.2 + 1.0)"
            "     / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (g.sdl / g.n)))"
            "   + (CAST(g.n AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) * tf2 * (1.2 + 1.0)"
            "     / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (g.sdl / g.n)))"
            "   AS score FROM tf, g)"
            " SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "tfidf_top_terms": (
            "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term"
            "   FROM documents),"
            " tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),"
            " df AS (SELECT term, count(*) AS df FROM"
            "   (SELECT DISTINCT doc_id, term FROM t) GROUP BY 1),"
            " s AS (SELECT tf.doc_id, tf.term,"
            "   tf.tf * (SELECT count(*) FROM documents) / CAST(df.df AS DOUBLE)"
            "     AS score FROM tf JOIN df USING (term)),"
            " r AS (SELECT *, row_number() OVER (PARTITION BY doc_id"
            "   ORDER BY score DESC, term) AS rank FROM s)"
            " SELECT doc_id, term, score, CAST(rank AS BIGINT) AS rank"
            " FROM r WHERE rank <= 3"
        ),
        "train_val_split": (
            "SELECT doc_id FROM documents"
            " WHERE (doc_id % 2147483647) * 2654435761 % 1000000 < 250000"
        ),
        "corpus_mix": (
            "SELECT doc_id, source FROM documents"
            " WHERE (doc_id % 2147483647) * 2654435761 % 1000000 <"
            "  CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000"
            "   WHEN 'src2' THEN 250000 ELSE 0 END"
        ),
        "stratified_sample": (
            "WITH h AS (SELECT doc_id, source,"
            "   (doc_id % 2147483647) * 2654435761 % 1000000 AS hh FROM documents),"
            " r AS (SELECT *, row_number() OVER (PARTITION BY source"
            "   ORDER BY hh, doc_id) AS rn FROM h)"
            " SELECT doc_id, source FROM r WHERE rn <= 5"
        ),
        "dedup_end_to_end": (
            "WITH RECURSIVE"
            " w AS (SELECT doc_id, string_split(text,' ') AS ws, text FROM documents),"
            " sh AS (SELECT doc_id,"
            "   CASE WHEN len(ws) < 3 THEN [text]"
            "        ELSE list_distinct(list_transform(range(1, len(ws)-1),"
            "             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s"
            "   FROM w),"
            " p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b"
            "   FROM sh a, sh b WHERE a.doc_id < b.doc_id"
            "   AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
            "     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),"
            " e AS (SELECT doc_a AS a, doc_b AS b FROM p"
            "   UNION ALL SELECT doc_b, doc_a FROM p),"
            " reach(n, r) AS ("
            "   SELECT a, a FROM e"
            "   UNION"
            "   SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.n),"
            " rejects AS (SELECT n FROM reach GROUP BY n HAVING min(r) < n)"
            " SELECT doc_id FROM documents"
            " WHERE doc_id NOT IN (SELECT n FROM rejects)"
        ),
        "dedup_embedding": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b"
            " FROM embeddings a, embeddings b"
            " WHERE a.vec_id < b.vec_id"
            " AND list_cosine_similarity(a.embedding, b.embedding) >= 0.48"
        ),
        "ann_topk": (
            "SELECT vec_id FROM embeddings"
            " ORDER BY list_cosine_similarity(embedding,"
            "   (SELECT embedding FROM embeddings"
            "    WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC, vec_id"
            " LIMIT 10"
        ),
        "ann_filtered": (
            "SELECT vec_id FROM embeddings WHERE label = 1"
            " ORDER BY list_cosine_similarity(embedding,"
            "   (SELECT embedding FROM embeddings"
            "    WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC, vec_id"
            " LIMIT 10"
        ),
        # DOUBLE[] casts force f64 cosine (matching numpy); ties break on id
        "knn_join": (
            "SELECT vec_id, nn_id FROM ("
            " SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,"
            "  ROW_NUMBER() OVER (PARTITION BY a.vec_id"
            "   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
            "     CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rn"
            " FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)"
            " WHERE rn = 1"
        ),
        "embedding_centroids": (
            "SELECT label, pos, round(avg(val), 6) AS centroid_val FROM ("
            " SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS val,"
            "  unnest(generate_series(1, len(embedding))) AS pos"
            " FROM embeddings) GROUP BY label, pos"
        ),
        # quantized IVF probes every bucket, so int8 rounding is the only
        # approximation; the top-10 id SET survives it on this data and the
        # gate's compare is order-insensitive → exact-oracle checkable
        "ann_ivf_quantized": (
            "SELECT vec_id FROM embeddings"
            " ORDER BY list_cosine_similarity(embedding,"
            "   (SELECT embedding FROM embeddings"
            "    WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC, vec_id"
            " LIMIT 10"
        ),
        "decontaminate": (
            "WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws"
            "   FROM documents),"
            " sh AS (SELECT doc_id, source,"
            "   unnest(list_transform(range(1, len(ws) - 6), i -> "
            + " || ' ' || ".join(f"ws[i+{j}]" for j in range(8)) +
            ")) AS s FROM w WHERE len(ws) >= 8),"
            " t AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),"
            " dirty AS (SELECT DISTINCT doc_id FROM sh"
            "   WHERE s IN (SELECT s FROM t))"
            " SELECT doc_id FROM documents"
            " WHERE doc_id NOT IN (SELECT doc_id FROM dirty)"
        ),
        "redact_terms": (
            r"SELECT doc_id, regexp_replace(text, '\b(data|hash)\b',"
            " '[REDACTED]', 'g') AS clean_text,"
            r" CAST(len(regexp_extract_all(text, '\b(data|hash)\b'))"
            " AS BIGINT) AS n_redacted FROM documents"
        ),
        "gopher_filter": (
            "WITH base AS (SELECT doc_id, text,"
            "   len(string_split(text, ' ')) AS nw, length(text) AS tl"
            "   FROM documents),"
            " top AS (SELECT doc_id, max(c) AS topc FROM"
            "   (SELECT doc_id, w, count(*) AS c FROM"
            "     (SELECT doc_id, unnest(string_split(text, ' ')) AS w"
            "      FROM documents) GROUP BY doc_id, w) GROUP BY doc_id)"
            " SELECT b.doc_id FROM base b JOIN top USING (doc_id)"
            " WHERE nw BETWEEN 30 AND 100000"
            "  AND CAST(tl - (nw - 1) AS DOUBLE) / nw >= 2.5"
            "  AND CAST(tl - (nw - 1) AS DOUBLE) / nw <= 10.0"
            f"  AND ({stopword_terms}) >= 2"
            "  AND CAST(topc AS DOUBLE) / nw <= 0.2"
        ),
        "chunk_documents": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws"
            "   FROM documents),"
            " c AS (SELECT doc_id, ws, unnest(range(0,"
            "   CAST(ceil(len(ws) / 32.0) AS BIGINT))) AS chunk_idx FROM w)"
            " SELECT doc_id, chunk_idx,"
            " array_to_string(ws[chunk_idx * 32 + 1 :"
            "   least((chunk_idx + 1) * 32, len(ws))], ' ') AS chunk_text,"
            " CAST(least((chunk_idx + 1) * 32, len(ws)) - chunk_idx * 32"
            "   AS BIGINT) AS n_words FROM c"
        ),
        "percentile_filter": (
            "SELECT doc_id FROM documents WHERE n_chars >"
            " (SELECT quantile_disc(n_chars, 0.5) FROM documents)"
        ),
        "value_histogram": (
            "SELECT CAST(floor(value / 0.25) AS BIGINT) AS bin,"
            " count(*) AS n FROM events GROUP BY bin"
        ),
        # all six sums are exact integers (HUGEINT in DuckDB, arbitrary-
        # precision int in Python); the single closing float expression is
        # written identically on both sides → bit-equal double
        "corr_lineitem": (
            "WITH s AS (SELECT count(*) AS n,"
            "   CAST(sum(l_partkey) AS HUGEINT) AS sx,"
            "   CAST(sum(l_suppkey) AS HUGEINT) AS sy,"
            "   CAST(sum(l_partkey * l_partkey) AS HUGEINT) AS sxx,"
            "   CAST(sum(l_suppkey * l_suppkey) AS HUGEINT) AS syy,"
            "   CAST(sum(l_partkey * l_suppkey) AS HUGEINT) AS sxy"
            "   FROM lineitem)"
            " SELECT CAST(n AS BIGINT) AS n_rows,"
            " CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
            "    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr FROM s"
        ),
        "normalize_text": (
            "SELECT doc_id, trim(regexp_replace(lower(text),"
            " '[^a-z0-9]+', ' ', 'g'), ' ') AS norm_text FROM documents"
        ),
        "running_total": (
            "SELECT event_id, user_id,"
            " CAST(sum(CAST(floor(value * 1000) AS BIGINT))"
            "   OVER (PARTITION BY user_id ORDER BY ts, event_id"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS BIGINT) AS cum_millis FROM events"
        ),
        "event_paths": (
            "SELECT user_id,"
            " string_agg(event_type, '>' ORDER BY ts, event_id) AS path,"
            " count(*) AS n_events FROM events GROUP BY user_id"
        ),
        "top_orders_by_revenue": (
            "SELECT l.l_orderkey, o.o_custkey,"
            " CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))"
            "   AS BIGINT) AS revenue_cents"
            " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
            " WHERE o.o_totalprice > 100000.0"
            " GROUP BY l.l_orderkey, o.o_custkey"
            " ORDER BY revenue_cents DESC, l.l_orderkey LIMIT 10"
        ),
        # bpe_roundtrip is LOSSLESS by construction (fit→encode→decode is
        # the identity on text), so the oracle is a plain SELECT
        "bpe_roundtrip": "SELECT doc_id, text FROM documents",
        # encode order == parquet row order (DuckDB preserves insertion
        # order for a plain scan, so the bare row_number() matches it)
        "row_range_scan": (
            "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
            " l_quantity FROM"
            " (SELECT *, row_number() OVER () AS rn FROM lineitem)"
            " WHERE rn BETWEEN 3001 AND 4000"
        ),
        # epoch-3 deterministic shuffle position (hash formula mirrored
        # from sample._row_hash with the 65599 epoch fold)
        "epoch_shuffle_rank": (
            "WITH h AS (SELECT doc_id,"
            "   ((doc_id + 3 * 65599) % 2147483647) * 2654435761 % 1000000"
            "     AS hv FROM documents)"
            " SELECT doc_id, CAST(row_number() OVER (ORDER BY hv, doc_id)"
            "   - 1 AS BIGINT) AS epoch_rank FROM h"
        ),
        # first occurrence = smallest (doc_id, pos) of each 4-gram; every
        # later occurrence counts as a duplicated span position
        "dup_ngram_spans": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws"
            "   FROM documents),"
            " g AS (SELECT doc_id, i AS pos,"
            "   ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]"
            "     AS ng"
            "   FROM w, unnest(range(1, len(ws) - 2)) AS t(i)"
            "   WHERE len(ws) >= 4),"
            " r AS (SELECT doc_id, CASE WHEN row_number()"
            "   OVER (PARTITION BY ng ORDER BY doc_id, pos) > 1"
            "   THEN 1 ELSE 0 END AS dup FROM g),"
            " d AS (SELECT doc_id, count(*) AS n_pos,"
            "   CAST(sum(dup) AS BIGINT) AS n_dup FROM r GROUP BY doc_id)"
            " SELECT doc_id, n_pos, n_dup,"
            " CAST(n_dup AS DOUBLE) / n_pos AS dup_frac FROM d"
        ),
        # top-12 vocab by (count DESC, word) — same tie-break as the engine
        "oov_rate": (
            "WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w"
            "   FROM documents),"
            " v AS (SELECT w FROM (SELECT w, count(*) AS c FROM t"
            "   GROUP BY w ORDER BY c DESC, w LIMIT 12)),"
            " j AS (SELECT source,"
            "   CASE WHEN w IN (SELECT w FROM v) THEN 0 ELSE 1 END AS oov"
            "   FROM t)"
            " SELECT source, count(*) AS n_tokens,"
            " CAST(sum(oov) AS BIGINT) AS n_oov,"
            " CAST(sum(oov) AS DOUBLE) / count(*) AS oov_rate"
            " FROM j GROUP BY source"
        ),
        # prefix of the (row-hash, id) order while cumulative word count
        # stays <= budget; word counts are strictly positive so the WHERE
        # over the running total is exactly that prefix
        "token_budget_sample": (
            "WITH h AS (SELECT doc_id,"
            "   (doc_id % 2147483647) * 2654435761 % 1000000 AS hv,"
            "   len(string_split(text, ' ')) AS nt FROM documents),"
            " c AS (SELECT doc_id, sum(nt) OVER (ORDER BY hv, doc_id"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum"
            "   FROM h)"
            " SELECT doc_id FROM c WHERE cum <= 10000"
        ),
        "repetition_filter": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, text"
            "   FROM documents),"
            " sh AS (SELECT doc_id,"
            "   CASE WHEN len(ws) < 3 THEN [text]"
            "        ELSE list_transform(range(1, len(ws) - 1),"
            "             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])"
            "   END AS s FROM w)"
            " SELECT doc_id FROM sh"
            " WHERE CAST(len(s) - len(list_distinct(s)) AS DOUBLE) / len(s)"
            "   <= 0.0"
        ),
        # IDs-only result so ulp-level cosine differences between engines
        # can't flip the value hash (same discipline as ann_topk)
        "kmeans_assign": (
            "WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1"
            "   AS cluster, embedding"
            "   FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),"
            " s AS (SELECT e.vec_id, c.cluster,"
            "   list_cosine_similarity(e.embedding, c.embedding) AS sim"
            "   FROM embeddings e CROSS JOIN c),"
            " r AS (SELECT *, row_number() OVER (PARTITION BY vec_id"
            "   ORDER BY sim DESC, cluster) AS rn FROM s)"
            " SELECT vec_id, cluster FROM r WHERE rn = 1"
        ),
        # dedup_minhash at threshold 0.8 verifies candidates with EXACT
        # jaccard over the same 3-word shingles the SQL computes; LSH
        # recall is 1.0 on this corpus (25/25 pairs, verified — identical
        # result to dedup_ngram_jaccard, deterministic pipeline)
        "dedup_minhash": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents),"
            " sh AS (SELECT doc_id,"
            "   CASE WHEN len(ws) < 3 THEN [text]"
            "        ELSE list_distinct(list_transform(range(1, len(ws)-1),"
            "             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s"
            "   FROM w)"
            " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            "  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
            "    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard"
            " FROM sh a, sh b"
            " WHERE a.doc_id < b.doc_id"
            "  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
            "    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8"
        ),
        # exact all-pairs cosine; pipeline recall is 1.0 at these LSH
        # params on this corpus (measured, deterministic seeded planes)
        "dedup_embedding_lsh": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b"
            " FROM embeddings a, embeddings b"
            " WHERE a.vec_id < b.vec_id"
            " AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
            "   CAST(b.embedding AS DOUBLE[])) >= 0.45"
        ),
        # ann_ivf / ann_ivf_indexed probe every bucket → exact top-10
        "ann_ivf": (
            "SELECT vec_id FROM embeddings"
            " ORDER BY list_cosine_similarity(embedding,"
            "   (SELECT embedding FROM embeddings"
            "    WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC, vec_id"
            " LIMIT 10"
        ),
        "ann_ivf_indexed": (
            "SELECT vec_id FROM embeddings"
            " ORDER BY list_cosine_similarity(embedding,"
            "   (SELECT embedding FROM embeddings"
            "    WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC, vec_id"
            " LIMIT 10"
        ),
        # exact with n_probe = n_centroids (every pair scored once)
        "knn_join_ivf": (
            "SELECT vec_id, nn_id FROM ("
            " SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,"
            "  ROW_NUMBER() OVER (PARTITION BY a.vec_id"
            "   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
            "     CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rn"
            " FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)"
            " WHERE rn = 1"
        ),
        # --- VALUES oracles: independent naive recomputation at
        # oracle-generation time (no Ray), executed by DuckDB ---
        "doc_fingerprints": _ORACLE_CACHE.setdefault(
            "doc_fingerprints", _oracle_doc_fingerprints()),
        "dedup_simhash": _ORACLE_CACHE.setdefault(
            "dedup_simhash", _oracle_dedup_simhash()),
        "vocab_counts": _ORACLE_CACHE.setdefault(
            "vocab_counts", _oracle_vocab_counts()),
        "pack_sequences": _ORACLE_CACHE.setdefault(
            "pack_sequences", _oracle_pack_sequences()),
        "kmeans_clusters": _ORACLE_CACHE.setdefault(
            "kmeans_clusters", _oracle_kmeans_clusters()),
        "bpe_merges": _ORACLE_CACHE.setdefault(
            "bpe_merges", _oracle_bpe_merges()),
        "bpe_token_count": _ORACLE_CACHE.setdefault(
            "bpe_token_count", _oracle_bpe_token_count()),
        "audio_features": _ORACLE_CACHE.setdefault(
            "audio_features", _oracle_audio_features()),
        "media_features": _ORACLE_CACHE.setdefault(
            "media_features", _oracle_media_features()),
        # media dims/frame counts are closed-form in doc_id (every_n=2 over
        # 6-frame videos at id%4==0, single-frame images otherwise)
        "media_frame_sample": (
            "SELECT doc_id AS media_id,"
            " CAST(CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 1 END AS INTEGER)"
            "   AS n_frames,"
            " CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS width,"
            " CAST(16 + (doc_id % 5) * 4 AS INTEGER) AS height"
            " FROM documents"
        ),
        # distinct_count_hll: intentionally no oracle (sketch estimate) —
        # its error bound is driver-checked by hll_error_bound instead
    }
