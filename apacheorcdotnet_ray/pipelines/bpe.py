"""Byte-pair-encoding vocabulary training over a document corpus.

The scale split mirrors production BPE trainers: the CORPUS-sized work is
one streaming word-frequency histogram pass (per-batch ``value_counts``
partials → bounded hash-partition sum); the merge loop then runs on the
(word, count) HISTOGRAM, whose size is the distinct-word vocabulary — corpus
-size-independent. Driver-side loop state is the flattened symbol array of
that vocabulary, vectorized NumPy per merge (pair counting via np.unique +
bincount, fusion via mask arithmetic); no per-character Python.

``bpe_token_count`` applies a trained merge table: the word → subword-count
mapping (again vocabulary-sized) ships once via ``ray.put``; the corpus pass
is a streaming per-batch dictionary lookup + reduceat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def word_histogram(ds: rd.Dataset, text_col: str = "text") -> tuple[np.ndarray, np.ndarray]:
    """Distributed (word, count) histogram: per-batch value_counts partial,
    bounded-partition sum, one vocabulary-sized driver collection."""
    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        vc = pc.split_pattern(texts, " ").flatten().value_counts()
        return pa.table({"w": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    from .dedup import _grouped_map

    def reduce_part(df):
        return df.groupby("w", sort=False, as_index=False)["cnt"].sum()

    summed = _grouped_map(ds.map_batches(partial, batch_format="pyarrow"),
                          ["w"], reduce_part)
    rows = summed.take_all()  # vocabulary-sized by construction
    words = np.array([r["w"] for r in rows], dtype=object)
    counts = np.array([r["cnt"] for r in rows], dtype=np.int64)
    order = np.argsort(words)  # deterministic regardless of partition order
    return words[order], counts[order]


def _merge_loop(words: np.ndarray, counts: np.ndarray, n_merges: int):
    """Vectorized BPE merges on a word histogram. Returns (merge rows,
    per-word symbol arrays) — symbols as (flat object array, word_id array)."""
    sym = np.array([ch for w in words for ch in w], dtype=object)
    wid = np.repeat(np.arange(len(words)), [len(w) for w in words])
    merges = []
    for rank in range(n_merges):
        if len(sym) < 2:
            break
        adj = wid[1:] == wid[:-1]
        if not adj.any():
            break
        left, right = sym[:-1][adj], sym[1:][adj]
        pair_keys = np.array([l + "\x00" + r for l, r in zip(left, right)],
                             dtype=object)
        uniq, inv = np.unique(pair_keys, return_inverse=True)
        freq = np.bincount(inv, weights=counts[wid[:-1][adj]].astype(np.float64))
        best = int(np.lexsort((uniq, -freq))[0])  # max freq, ties → smallest pair
        l, r = uniq[best].split("\x00")
        f = int(freq[best])
        if f <= 0:
            break
        merges.append({"rank": rank, "left": l, "right": r, "freq": f})
        # fuse non-overlapping occurrences, greedy left-to-right within runs
        cand = np.nonzero((sym[:-1] == l) & (sym[1:] == r)
                          & (wid[:-1] == wid[1:]))[0]
        keep_pos, last = [], -2
        for p in cand.tolist():
            if p == last + 1 and sym[p] == sym[p + 1] == l == r:
                continue  # overlapping run like "aaa" under (a,a)
            keep_pos.append(p)
            last = p
        kp = np.asarray(keep_pos, dtype=np.int64)
        sym[kp] = l + r
        dead = np.zeros(len(sym), dtype=bool)
        dead[kp + 1] = True
        sym, wid = sym[~dead], wid[~dead]
    return merges, (sym, wid)


def bpe_train(ds: rd.Dataset, n_merges: int = 20,
              text_col: str = "text") -> pa.Table:
    """Train BPE merges; returns (rank, left, right, freq) — freq is the
    corpus-weighted pair frequency at merge time."""
    words, counts = word_histogram(ds, text_col)
    merges, _ = _merge_loop(words, counts, n_merges)
    return pa.table({
        "rank": pa.array([m["rank"] for m in merges], type=pa.int64()),
        "left": pa.array([m["left"] for m in merges], type=pa.string()),
        "right": pa.array([m["right"] for m in merges], type=pa.string()),
        "freq": pa.array([m["freq"] for m in merges], type=pa.int64()),
    })


def bpe_token_count(ds: rd.Dataset, n_merges: int = 20,
                    id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Per-doc subword count under a freshly trained merge table. The
    word → n_subwords map (vocabulary-sized) broadcasts once; each batch does
    a dictionary-encode lookup + per-doc reduceat — unseen words fall back to
    character count (standard char-level fallback)."""
    words, counts = word_histogram(ds, text_col)
    _, (sym, wid) = _merge_loop(words, counts, n_merges)
    tok_len = np.bincount(wid, minlength=len(words)).astype(np.int64)
    lookup_ref = ray.put({w: int(n) for w, n in zip(words, tok_len)})

    def fn(batch: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        wl = pc.split_pattern(texts, " ")
        flat = wl.flatten().dictionary_encode()
        dvals = flat.dictionary.to_pylist()  # batch-distinct words only
        per_distinct = np.array([lut.get(w, len(w)) for w in dvals],
                                dtype=np.int64)
        per_word = per_distinct[flat.indices.to_numpy(zero_copy_only=False)]
        offs = wl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        per_doc = np.add.reduceat(per_word, offs[:-1]) if len(per_word) \
            else np.zeros(batch.num_rows, dtype=np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bpe_tokens": pa.array(per_doc, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
