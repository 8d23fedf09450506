"""Deduplication operators over the documents table.

Exact dedup (hash-partition → per-group first), MinHash+LSH, SimHash and
n-gram-Jaccard near-dup, embedding-cosine near-dup. All follow the
shuffle-aware pattern: vectorized per-batch signature computation inside
``map_batches``, then a ``groupby`` over small signature rows (never over full
documents), candidate verification per group, tiny driver-side merge.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


# ---------------------------------------------------------------------------
# exact dedup


def dedup_exact(ds: rd.Dataset, key: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep the min-id row per distinct key value. groupby(key) shuffles only
    (key, id) pairs, projected before the shuffle."""

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: [g[id_col].min()]})

    return (
        ds.select_columns([id_col, key])
        .groupby(key)
        .map_groups(keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingles + minhash


def _word_shingles(text: str, k: int) -> np.ndarray:
    words = text.split(" ")
    if len(words) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    return np.unique(np.array(
        [zlib.crc32(" ".join(words[i : i + k]).encode()) for i in range(len(words) - k + 1)],
        dtype=np.uint64,
    ))


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    return a, b


def _minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (a*x+b) mod p per permutation, vectorized over shingles × perms
    with np.errstate(over="ignore"):
        prod = np.multiply.outer(shingles, a) + b  # wraps in uint64; fine as a hash
    return prod.min(axis=0)


def minhash_signatures(ds: rd.Dataset, k: int = 3, num_perm: int = 64) -> rd.Dataset:
    a, b = _minhash_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        sigs = [
            _minhash(_word_shingles(t, k), a, b).astype(np.int64)
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_minhash_lsh(
    ds: rd.Dataset, k: int = 3, num_perm: int = 64, bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> rd.Dataset:
    """MinHash → LSH band buckets → candidate pairs → exact-Jaccard verify.

    Emits (doc_a, doc_b, jaccard) for verified near-duplicate pairs.
    Partitioning assumption: all members of one LSH bucket fit in one group
    (true unless a bucket degenerates; buckets are (band_id, band_hash))."""
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes, shingle_json = [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sh = _word_shingles(text, k)
            sig = _minhash(sh, a, b)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(zlib.crc32(chunk.tobytes()))
            # ship the shingle set (as int64 list) for in-group verification
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_hashes, type=pa.int64()),
        })

    candidates = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    # dedupe pairs discovered by multiple bands, then verify exact jaccard
    pairs = candidates.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    # verification joins back on a broadcast id→text map (fine while the
    # corpus-side lookup fits the driver; at scale, ship shingle sets through
    # the band groupby instead — documented partitioning assumption)
    docs = ds.select_columns(["doc_id", "text"]).take_all()
    text_by_id = {r["doc_id"]: r["text"] for r in docs}

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in batch.iterrows():
            sa = _word_shingles(text_by_id[row.doc_a], k)
            sb = _word_shingles(text_by_id[row.doc_b], k)
            inter = len(np.intersect1d(sa, sb))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 1.0
            if j >= jaccard_threshold:
                out.append({"doc_a": row.doc_a, "doc_b": row.doc_b, "jaccard": j})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    return pairs.map_batches(verify, batch_format="pandas")


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(g["doc_id"].tolist())
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            out.append({"doc_a": ids[i], "doc_b": ids[j]})
    return pd.DataFrame(out, columns=["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# simhash


def simhash_signatures(ds: rd.Dataset) -> rd.Dataset:
    """64-bit SimHash over word crc32 hashes (unit weights), vectorized."""

    def fn(batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch.column("text").to_pylist():
            words = text.split(" ")
            h = np.array([zlib.crc32(w.encode()) for w in words], dtype=np.uint64)
            h = h * np.uint64(0x9E3779B97F4A7C15)  # spread to 64 bits
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            sig = int(((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            sigs.append(sig - (1 << 64) if sig >> 63 else sig)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(sigs, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_simhash(ds: rd.Dataset, max_hamming: int = 3, blocks: int = 4) -> rd.Dataset:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via the block-key
    trick: split 64 bits into `blocks` blocks; any pair within distance d <
    blocks shares ≥1 exact block → groupby(block_id, block_value)."""
    sigs = simhash_signatures(ds)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, block_ids, block_vals, full = [], [], [], []
        width = 64 // blocks
        for doc_id, sig in zip(batch.column("doc_id").to_pylist(),
                               batch.column("simhash").to_pylist()):
            u = sig & ((1 << 64) - 1)
            for bi in range(blocks):
                doc_ids.append(doc_id)
                block_ids.append(bi)
                block_vals.append((u >> (bi * width)) & ((1 << width) - 1))
                full.append(sig)
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "block_id": pa.array(block_ids, type=pa.int32()),
            "block_val": pa.array(block_vals, type=pa.int64()),
            "simhash": pa.array(full, type=pa.int64()),
        })

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = g[["doc_id", "simhash"]].drop_duplicates().sort_values("doc_id").values
        out = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((int(rows[i][1]) ^ int(rows[j][1])) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    out.append({"doc_a": rows[i][0], "doc_b": rows[j][0], "hamming": d})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["block_id", "block_val"])
        .map_groups(bucket_verify, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def dedup_embedding_cosine(emb_ds: rd.Dataset, threshold: float = 0.95) -> rd.Dataset:
    """Near-duplicate (vec_a < vec_b) pairs with cosine ≥ threshold.

    Block-local matmul against a broadcast matrix of all vectors — valid while
    the embedding matrix fits in memory (N×D float32); the LSH-bucketed
    variant in similarity.py is the scale path."""
    import ray

    rows = emb_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        b_ids = batch.column("vec_id").to_numpy()
        b_mat = np.stack([np.asarray(v, dtype=np.float64)
                          for v in batch.column("embedding").to_pylist()])
        b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
        sims = b_mat @ all_mat.T
        ai, bj = np.nonzero(sims >= threshold)
        keep = b_ids[ai] < all_ids[bj]
        return pa.table({
            "vec_a": pa.array(b_ids[ai][keep], type=pa.int64()),
            "vec_b": pa.array(all_ids[bj][keep], type=pa.int64()),
        })

    return emb_ds.map_batches(fn, batch_format="pyarrow")
