"""Curation operators: decontamination, redaction, gopher gate, chunking,
percentile filter. Value-level oracle parity runs in tools/check_queries.py;
here: edge cases the sf tables don't exercise (short docs, exact-boundary
chunking, empty selections)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from apacheorcdotnet_ray.pipelines import curate


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_decontaminate_short_docs_never_match(ray_session):
    # docs with < n words have no shingle: a 3-word doc identical to a test
    # doc must NOT be flagged at n=8 (mirrors SQL WHERE len(ws) >= 8)
    train = _ds([
        {"doc_id": 1, "text": "a b c"},
        {"doc_id": 2, "text": "one two three four five six seven eight nine"},
        {"doc_id": 3, "text": "x y z w p q r s t"},
    ])
    test = _ds([
        {"doc_id": 100, "text": "a b c"},  # short: contributes nothing
        {"doc_id": 101, "text": "one two three four five six seven eight"},
    ])
    kept = sorted(r["doc_id"] for r in curate.decontaminate(train, test, n=8).take_all())
    assert kept == [1, 3]  # doc 2 shares the 8-gram; doc 1 is short → kept


def test_decontaminate_empty_test_set(ray_session):
    train = _ds([{"doc_id": i, "text": "w1 w2 w3 w4 w5 w6 w7 w8 w9"} for i in range(4)])
    test = _ds([{"doc_id": 99, "text": "tiny"}])  # short → empty shingle set
    assert curate.decontaminate(train, test, n=8).count() == 4


def test_redact_terms_word_boundaries(ray_session):
    ds = _ds([{"doc_id": 1, "text": "spark sparkly spark"},
              {"doc_id": 2, "text": "no match here"}])
    out = {r["doc_id"]: r for r in curate.redact_terms(ds, ("spark",)).take_all()}
    assert out[1]["clean_text"] == "[REDACTED] sparkly [REDACTED]"
    assert out[1]["n_redacted"] == 2
    assert out[2]["n_redacted"] == 0 and out[2]["clean_text"] == "no match here"


def test_chunk_documents_boundaries(ray_session):
    # 1-word doc → 1 chunk; exactly-W doc → 1 chunk; W+1 → 2 chunks
    ds = _ds([
        {"doc_id": 1, "text": "only"},
        {"doc_id": 2, "text": " ".join(f"w{i}" for i in range(4))},
        {"doc_id": 3, "text": " ".join(f"v{i}" for i in range(5))},
    ])
    rows = sorted(((r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_words"])
                   for r in curate.chunk_documents(ds, chunk_words=4).take_all()))
    assert rows == [
        (1, 0, "only", 1),
        (2, 0, "w0 w1 w2 w3", 4),
        (3, 0, "v0 v1 v2 v3", 4),
        (3, 1, "v4", 1),
    ]
    # reassembly invariant: joining chunks reproduces the doc
    by_doc = {}
    for d, _, t, _ in rows:
        by_doc.setdefault(d, []).append(t)
    assert " ".join(by_doc[3]) == " ".join(f"v{i}" for i in range(5))


def test_gopher_filter_repetition_cap(ray_session):
    base = ("the a of and to in is on " + " ".join(f"u{i}" for i in range(40))).strip()
    spam = "the a of and " + " ".join(["buy"] * 60)  # top_word_frac ≈ 0.94
    ds = _ds([{"doc_id": 1, "text": base}, {"doc_id": 2, "text": spam}])
    kept = [r["doc_id"] for r in curate.gopher_filter(ds).take_all()]
    assert kept == [1]


def test_top_word_counts_vectorized():
    texts = pa.array(["a a b", "x y z", "q q q q"])
    assert curate._top_word_counts(texts).tolist() == [2, 1, 4]


def test_repetition_filter(ray_session):
    ds = _ds([
        {"doc_id": 1, "text": "a b c d e f g"},          # all 3-grams distinct
        {"doc_id": 2, "text": "x y z x y z x y z"},      # heavy repetition
        {"doc_id": 3, "text": "hi"},                      # short → trivially kept
    ])
    kept = sorted(r["doc_id"] for r in
                  curate.repetition_filter(ds, n=3, max_dup_frac=0.0).take_all())
    assert kept == [1, 3]
    # loose threshold keeps the repetitive doc too (4 dup of 7 ≈ 0.57)
    kept = sorted(r["doc_id"] for r in
                  curate.repetition_filter(ds, n=3, max_dup_frac=0.6).take_all())
    assert kept == [1, 2, 3]


def test_percentile_filter_strictly_above(ray_session):
    ds = _ds([{"doc_id": i, "n_chars": v} for i, v in enumerate([1, 2, 3, 4, 5])])
    kept = sorted(r["doc_id"] for r in
                  curate.percentile_filter(ds, "n_chars", 0.5).take_all())
    assert kept == [3, 4]  # quantile_disc(0.5) = 3 → strictly greater
