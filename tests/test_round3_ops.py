"""Round-3 operators: GROUP BY CUBE, Misra-Gries heavy hitters,
deterministic weighted sampling, and the Bloom-prefiltered semi join."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from apacheorcdotnet_ray.pipelines.joins import bloom_semi_join, semi_join
from apacheorcdotnet_ray.pipelines.sample import weighted_sample
from apacheorcdotnet_ray.pipelines.stats import group_cube
from apacheorcdotnet_ray.pipelines.text import heavy_hitters


def test_group_cube_all_grouping_sets(ray_session):
    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y", "y", "y"]),
        "b": pa.array(["p", "q", "p", "p", "q"]),
        "v": pa.array([1, 2, 4, 8, 16], type=pa.int64()),
    })).repartition(3)
    rows = {(r["a"], r["b"]): (r["sum_val"], r["n_rows"])
            for r in group_cube(ds, "a", "b", "v").take_all()}
    assert rows[("x", "p")] == (1, 1)
    assert rows[("x", "q")] == (2, 1)
    assert rows[("y", "p")] == (12, 2)
    assert rows[("y", "q")] == (16, 1)
    assert rows[("x", None)] == (3, 2)
    assert rows[("y", None)] == (28, 3)
    assert rows[(None, "p")] == (13, 3)
    assert rows[(None, "q")] == (18, 2)
    assert rows[(None, None)] == (31, 5)
    assert len(rows) == 9


def test_group_cube_empty(ray_session):
    ds = rd.from_arrow(pa.table({
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.int64()),
    }))
    rows = group_cube(ds, "a", "b", "v").take_all()
    assert len(rows) == 1  # just the () grouping set, like SQL CUBE
    assert rows[0]["sum_val"] is None and rows[0]["n_rows"] == 0


def test_heavy_hitters_exact_vs_naive(ray_session):
    # skewed corpus: 'hot' dominates, tail words are unique
    docs = [("hot " * 50).strip() for _ in range(20)]
    docs += [f"w{i} hot filler{i}" for i in range(200)]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(8)
    # exact ground truth
    words = " ".join(docs).split(" ")
    total = len(words)
    from collections import Counter

    cnt = Counter(words)
    phi = 0.05
    expect = {w: c for w, c in cnt.items() if c > int(phi * total)}
    got = {r["w"]: r["cnt"] for r in heavy_hitters(ds, phi=phi).take_all()}
    assert got == expect
    assert "hot" in got


def test_heavy_hitters_tiny_corpus_degenerate(ray_session):
    # phi*N < 1: every word qualifies (count > 0); the sketch must not drop any
    ds = rd.from_arrow(pa.table({"text": pa.array(["a b", "b c"])}))
    got = {r["w"]: r["cnt"] for r in heavy_hitters(ds, phi=0.001).take_all()}
    assert got == {"a": 1, "b": 2, "c": 1}


def test_weighted_sample_matches_priority_order(ray_session):
    ids = np.arange(100, dtype=np.int64)
    w = (ids % 7 + 1).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})) \
        .repartition(5)
    out = weighted_sample(ds, k=10, weight_col="n_chars").take_all()
    h = ((ids % 2147483647) * 2654435761) % 1_000_000
    pri = h.astype(np.float64) / w
    order = np.lexsort((ids, pri))[:10]
    assert [r["doc_id"] for r in out] == list(ids[order])
    assert [r["priority"] for r in out] == list(pri[order])


def test_bloom_semi_join_equals_exact_semi(ray_session):
    rng = np.random.default_rng(7)
    left_keys = rng.integers(0, 1000, size=5000).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(left_keys),
        "x": pa.array(np.arange(5000, dtype=np.int64)),
    })).repartition(4)
    right = rd.from_arrow(pa.table({
        "rk": pa.array(np.arange(0, 1000, 3, dtype=np.int64)),
    })).repartition(2)
    got = bloom_semi_join(left, right, "k", "rk", num_partitions=8).take_all()
    exact_mask = (left_keys % 3) == 0
    assert len(got) == int(exact_mask.sum())
    assert sorted(r["x"] for r in got) == list(np.arange(5000)[exact_mask])
    # schema: left columns only
    assert sorted(got[0].keys()) == ["k", "x"]


def test_bloom_semi_join_string_keys(ray_session):
    left = rd.from_arrow(pa.table({
        "k": pa.array([f"id{i % 50}" for i in range(400)]),
        "x": pa.array(np.arange(400, dtype=np.int64)),
    })).repartition(3)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([f"id{i}" for i in range(0, 50, 5)]),
    }))
    got = bloom_semi_join(left, right, "k", "rk", num_partitions=4).take_all()
    exact = semi_join(left, right, "k", "rk").take_all()
    assert sorted(r["x"] for r in got) == sorted(r["x"] for r in exact)


def test_windowed_distinct(ray_session):
    import pandas as pd

    from apacheorcdotnet_ray.pipelines.stats import windowed_distinct

    ts = pd.to_datetime([
        "2024-01-01 10:05", "2024-01-01 10:55", "2024-01-01 10:59",
        "2024-01-01 11:01", "2024-01-01 11:30",
    ])
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 1, 1], type=pa.int64()),
    })).repartition(3)
    got = {str(r["window_start"]): r["n_distinct"]
           for r in windowed_distinct(ds).take_all()}
    assert got == {"2024-01-01 10:00:00": 2, "2024-01-01 11:00:00": 1}


def test_text_index_matches_streaming_bm25(ray_session, tmp_path):
    from apacheorcdotnet_ray.pipelines.text import (
        bm25_search, text_index_build, text_index_search)

    docs = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array([
            f"alpha beta {'gamma ' * (i % 5)}delta w{i}".strip()
            for i in range(60)]),
    })
    ds = rd.from_arrow(docs).repartition(4)
    idx = str(tmp_path / "txtidx")
    meta = text_index_build(ds, idx, num_buckets=8)
    assert meta["n_docs"] == 60
    for q in ("gamma delta", "alpha missingword", "w7"):
        a = text_index_search(idx, q, k=5, idf="log").take_all()
        b = bm25_search(ds, q, k=5, idf="log").take_all()
        ai = [(r["doc_id"], r["score"]) for r in a]
        bi = [(r["doc_id"], r["score"]) for r in b]
        # streaming top-k may include zero-score docs when fewer than k
        # contain any term; the index path only returns matching docs
        # (here every doc matches 'alpha'/'delta', so the sets coincide)
        assert ai == bi[:len(ai)]


def test_profile_table_nulls_and_distincts(ray_session):
    from apacheorcdotnet_ray.pipelines.stats import profile_table

    ds = rd.from_arrow(pa.table({
        "a": pa.array([1, 1, 2, None, 3], type=pa.int64()),
        "b": pa.array(["x", None, None, "x", "y"]),
    })).repartition(3)
    rows = {r["col"]: r for r in profile_table(ds).to_pylist()}
    assert rows["a"]["n_rows"] == 5 and rows["b"]["n_rows"] == 5
    assert rows["a"]["n_nulls"] == 1 and rows["b"]["n_nulls"] == 2
    assert rows["a"]["n_distinct"] == 3   # nulls excluded, like SQL
    assert rows["b"]["n_distinct"] == 2


def test_quantile_sketch_rank_bound(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from apacheorcdotnet_ray.pipelines import stats

    rng = np.random.default_rng(4)
    v = rng.lognormal(3, 1, size=50_000)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(8)
    for q in (0.1, 0.5, 0.9):
        est = stats.quantile_sketch(ds, "x", q=q, k=256)
        rank = float((v <= est).mean())
        assert abs(rank - q) <= 0.01, (q, rank)


def test_incremental_fingerprint_dedup(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from apacheorcdotnet_ray.pipelines import dedup

    corpus_texts = [f"corpus doc {i} " + "w " * 60 for i in range(50)]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(50, dtype=np.int64)),
        "text": pa.array(corpus_texts),
    })).repartition(3)
    idx = str(tmp_path / "fpidx")
    dedup.build_fingerprint_index(corpus, idx, prefix_len=40, n_buckets=8)
    # incoming: 2 copies of corpus docs (same prefix), 3 fresh docs
    inc = rd.from_arrow(pa.table({
        "doc_id": pa.array([100, 101, 102, 103, 104], type=pa.int64()),
        "text": pa.array([corpus_texts[7], corpus_texts[33] + "tail differs",
                          "fresh one " * 10, "fresh two " * 10,
                          "fresh three " * 10]),
    }))
    hits = dedup.dedup_against_index(inc, idx, prefix_len=40, n_buckets=8)
    assert sorted(hits["doc_id"].to_pylist()) == [100, 101]
    # empty incoming → typed empty result
    empty = dedup.dedup_against_index(
        rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64()),
                                "text": pa.array([], type=pa.string())})),
        idx, prefix_len=40, n_buckets=8)
    assert empty.num_rows == 0


def test_lag_delta_and_row_number(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from apacheorcdotnet_ray.pipelines import stats

    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "value": rng.normal(size=n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)

    out = stats.lag_delta(ds).to_pandas().set_index("event_id").sort_index()
    ref = df.sort_values(["user_id", "ts", "event_id"])
    ref["delta_ms"] = ref.groupby("user_id")["ts"].diff().dt.total_seconds() * 1000
    ref = ref.set_index("event_id").sort_index()
    got = out["delta_ms"].astype("float64")
    want = ref["delta_ms"]
    assert ((got.isna() == want.isna()).all()
            and np.allclose(got.dropna(), want.dropna()))

    rn = stats.row_number_global(
        rd.from_arrow(pa.Table.from_pandas(df[["event_id", "value"]]))
        .repartition(5), "value", "event_id").to_pandas()
    order = df.sort_values(["value", "event_id"])["event_id"].to_numpy()
    expect = {eid: i + 1 for i, eid in enumerate(order)}
    assert all(expect[e] == r for e, r in zip(rn["event_id"], rn["rn"]))
