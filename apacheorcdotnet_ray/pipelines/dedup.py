"""Deduplication operators over the documents table.

Exact dedup (hash-partition → per-group first), MinHash+LSH, SimHash and
n-gram-Jaccard near-dup, embedding-cosine near-dup. All follow the
shuffle-aware pattern: vectorized per-batch signature computation inside
``map_batches``, then a ``groupby`` over small signature rows (never over full
documents), candidate verification per group, tiny driver-side merge.
"""

from __future__ import annotations

import numpy as np

# polars imports at module level: its lazy submodule init is not
# thread-safe, and Ray workers can hit first-use concurrently from
# multiple task threads (observed: AttributeError on polars._reexport)
import polars  # noqa: F401

import pandas as pd
import pyarrow as pa
import ray.data as rd


# ---------------------------------------------------------------------------
# bounded hash-partition grouping
#
# Ray's groupby(...).map_groups(fn) invokes fn once per group; with
# near-unique keys (LSH buckets, full texts) that is one Python call per row.
# Instead: hash the key to a bounded partition id, groupby the partition id
# (fixed number of groups regardless of key cardinality), and run a VECTORIZED
# pandas group-reduction inside each partition. All rows of one key land in
# one partition, so semantics match a per-key groupby; skew is bounded because
# the partition key is a uniform hash.


def _grouped_map(
    ds: rd.Dataset, keys: list[str], fn, num_partitions: int = 64
) -> rd.Dataset:
    """groupby(keys)-equivalent with O(num_partitions) group invocations:
    fn(df) receives complete key-groups and must itself reduce per key."""

    def add_pk(batch: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(batch.select(keys)).hash_rows(seed=1).to_numpy()
        return batch.append_column(
            "_pk", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(lambda g: fn(g.drop(columns="_pk")), batch_format="pandas")
        .map_batches(_strip_meta_drop_empty, batch_format="pyarrow",
                     zero_copy_batch=True)
    )


def _grouped_map_arrow(
    ds: rd.Dataset, keys: list[str], fn, num_partitions: int = 64
) -> rd.Dataset:
    """Arrow-format twin of ``_grouped_map``: fn(pa.Table) receives complete
    key-groups, zero pandas conversion — the right variant when the payload
    has list/tensor columns (object-dtype pandas would force per-row
    materialization)."""

    def add_pk(batch: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(batch.select(keys)).hash_rows(seed=1).to_numpy()
        return batch.append_column(
            "_pk", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(lambda g: fn(g.drop_columns(["_pk"])), batch_format="pyarrow")
        .map_batches(_strip_meta_drop_empty, batch_format="pyarrow",
                     zero_copy_batch=True)
    )


def _strip_meta(batch: pa.Table) -> pa.Table:
    """Ray's pandas→Arrow conversion after map_groups re-attaches the pandas
    metadata blob, making the schema unhashable (defeats Ray's block-schema
    dedup and spams warnings downstream) — strip it (zero-copy). Shared by
    every pandas map_groups consumer (_grouped_map, asof_join)."""
    return batch.replace_schema_metadata(None) if batch.schema.metadata else batch


def _strip_meta_drop_empty(batch: pa.Table):
    """_strip_meta plus: DROP the zero-COLUMN blocks Ray's map_groups emits
    for empty sort-range partitions (schema "."). They poison schema-strict
    consumers — pa.Table.join inside Dataset.join's aggregators raises
    'No match ... FieldRef' when such a block lands alone in a partition
    (flaky, depends on range-partition sampling). Consumers whose whole
    result may be empty keep their schema via a setops._schema_seed union
    block, which this stage never sees."""
    if batch.num_columns == 0:
        return
    yield _strip_meta(batch)


# ---------------------------------------------------------------------------
# vectorized segment kernels (shared by every in-bucket verify stage)
#
# The LSH-family operators all reduce to "within each bucket, enumerate the
# (i < j) pairs, then score each pair". Buckets are many and small, so a
# Python loop over buckets (or worse, over pairs) dominates; these kernels do
# the enumeration and set-intersection for ALL buckets/pairs of a partition
# in a handful of NumPy calls.


def _segment_pairs(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment (i < j) index pairs for consecutive segments of the
    given sizes, as GLOBAL indices into the concatenated segments.

    Pair rank r inside a segment maps to (i, j) via the triangular inversion
    j = floor((1 + sqrt(1 + 8r)) / 2), i = r - j(j-1)/2 (exact in float64 up
    to 2^52 pairs per segment; ±1-ulp sqrt rounding is corrected below)."""
    sizes = np.asarray(sizes, dtype=np.int64)
    npairs = sizes * (sizes - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    seg = np.repeat(np.arange(len(sizes)), npairs)
    pair_starts = np.concatenate([[0], np.cumsum(npairs)])[:-1]
    loc = np.arange(total, dtype=np.int64) - pair_starts[seg]
    j = ((np.sqrt(8.0 * loc + 1.0) + 1.0) // 2).astype(np.int64)
    over = j * (j - 1) // 2 > loc
    j[over] -= 1
    under = (j + 1) * j // 2 <= loc
    j[under] += 1
    i = loc - j * (j - 1) // 2
    val_starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    base = val_starts[seg]
    return base + i, base + j


def _group_sizes(
    group_keys: list[np.ndarray], tiebreak: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sort rows by (group_keys..., tiebreak) and return (order, group sizes)
    where groups are runs of equal group_keys in the sorted order — the
    prelude every batched in-bucket verify needs before ``_segment_pairs``."""
    order = np.lexsort((tiebreak, *group_keys[::-1]))
    change = np.zeros(len(order), dtype=bool)
    for k in group_keys:
        ks = k[order]
        change[1:] |= ks[1:] != ks[:-1]
    change[0] = bool(len(order))
    starts = np.nonzero(change)[0]
    return order, np.diff(np.append(starts, len(order)))


def _gather_segments(
    vals: np.ndarray, offs: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate vals[offs[d]:offs[d+1]] for each d in idx (vectorized).
    Returns (flat gathered values, per-segment lengths)."""
    lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return vals[:0], lens
    cum = np.concatenate([[0], np.cumsum(lens)])[:-1]
    pos = np.arange(total, dtype=np.int64) + np.repeat(offs[idx] - cum, lens)
    return vals[pos], lens


def _pair_intersections(
    vals: np.ndarray, offs: np.ndarray, ia: np.ndarray, ib: np.ndarray,
    chunk: int = 4_000_000,
) -> np.ndarray:
    """|set_a ∩ set_b| for each pair (ia[p], ib[p]), where doc d's UNIQUE
    value set is vals[offs[d]:offs[d+1]]. One lexsort over (pair, value) per
    chunk + an adjacent-duplicate count — no per-pair Python. Chunked so the
    gathered working set stays bounded regardless of pair fan-out."""
    la = (offs[ia + 1] - offs[ia]).astype(np.int64)
    lb = (offs[ib + 1] - offs[ib]).astype(np.int64)
    inter = np.empty(len(ia), dtype=np.int64)
    p0 = 0
    n = len(ia)
    while p0 < n:
        p1 = p0 + 1
        tot = la[p0] + lb[p0]
        while p1 < n and tot + la[p1] + lb[p1] <= chunk:
            tot += la[p1] + lb[p1]
            p1 += 1
        ga, _ = _gather_segments(vals, offs, ia[p0:p1])
        gb, _ = _gather_segments(vals, offs, ib[p0:p1])
        pids = np.arange(p0, p1, dtype=np.int64)
        tags = np.concatenate([np.repeat(pids, la[p0:p1]), np.repeat(pids, lb[p0:p1])])
        gv = np.concatenate([ga, gb])
        order = np.lexsort((gv, tags))
        gv, tags = gv[order], tags[order]
        dup = (gv[1:] == gv[:-1]) & (tags[1:] == tags[:-1])
        inter[p0:p1] = np.bincount(tags[1:][dup] - p0, minlength=p1 - p0)
        p0 = p1
    return inter


# ---------------------------------------------------------------------------
# exact dedup


def dedup_exact(ds: rd.Dataset, key: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep the min-id row per distinct key value. The shuffle ships only
    (key, id) pairs (projected first); per-partition reduction is one
    vectorized pandas groupby-min."""

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, sort=False, as_index=False)[id_col].min()[[id_col]]

    return _grouped_map(ds.select_columns([id_col, key]), [key], keep_first)


# ---------------------------------------------------------------------------
# shingles + minhash

def _shingle_mult(k: int) -> np.ndarray:
    """k odd 64-bit multipliers combining k consecutive word hashes into one
    shingle hash (position-dependent so "a b c" != "c b a")."""
    with np.errstate(over="ignore"):
        return (np.arange(k, dtype=np.uint64) * np.uint64(2) + np.uint64(1)) \
            * np.uint64(0x9E3779B97F4A7C15)


_SHINGLE_MULT = _shingle_mult(6)  # shared default for small-k call sites


def _batch_word_hashes(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized words→uint64 hashes for a whole batch: Arrow split_pattern
    + polars hash (Rust xxhash kernel). Returns (flat word hashes, offsets)."""
    import polars as pl
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    flat = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), offs
    wh = pl.from_arrow(pa.table({"w": flat}))["w"].hash(seed=0).to_numpy().astype(np.uint64)
    return wh, offs


def _batch_shingle_hashes(
    texts: pa.Array | pa.ChunkedArray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-word-shingle hash sets for a whole batch, vectorized.

    Returns (flat shingle hashes, doc boundary offsets into it). A doc with
    fewer than k words contributes one fallback hash (its word-hash fold)."""
    wh, offs = _batch_word_hashes(texts)
    n_docs = len(offs) - 1
    wc = np.diff(offs)
    n_sh = np.maximum(wc - k + 1, 0)
    mult = _shingle_mult(k)
    if len(wh) >= k:
        with np.errstate(over="ignore"):
            s = wh[: len(wh) - k + 1] * mult[0]
            for j in range(1, k):
                s = s + wh[j : len(wh) - k + 1 + j] * mult[j]
        # drop cross-boundary positions: for each internal doc start b, flat
        # positions b-k+1..b-1 span two docs
        valid = np.ones(len(s), dtype=bool)
        if n_docs > 1 and k > 1:
            bad = (np.add.outer(offs[1:-1], np.arange(-(k - 1), 0))).ravel()
            bad = bad[(bad >= 0) & (bad < len(s))]
            valid[bad] = False
        s = s[valid]
    else:
        s = np.empty(0, dtype=np.uint64)

    # docs with <k words: fold their word hashes into one fallback hash
    # (split_pattern yields >=1 word per doc, so every doc emits something)
    short = np.nonzero(wc < k)[0]
    if len(short):
        out_counts = np.where(wc >= k, n_sh, 1)
        out = np.empty(int(out_counts.sum()), dtype=np.uint64)
        out_offs = np.concatenate([[0], np.cumsum(out_counts)])
        s_offs = np.concatenate([[0], np.cumsum(n_sh)])
        copy_docs = np.nonzero(wc >= k)[0]
        for d in copy_docs.tolist():
            out[out_offs[d] : out_offs[d + 1]] = s[s_offs[d] : s_offs[d + 1]]
        with np.errstate(over="ignore"):
            for d in short.tolist():
                seg = wh[offs[d] : offs[d + 1]]
                # position-dependent fold (mult[:len] = same family as full
                # shingles) so permuted word orders do NOT collide — matches
                # the order-sensitive oracle semantics for <k-word docs
                out[out_offs[d]] = (seg * mult[: len(seg)]).sum()
        return out, out_offs
    return s, np.concatenate([[0], np.cumsum(n_sh)])


_MERSENNE = np.uint64((1 << 61) - 1)
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    return a, b


def _minhash_from_shingles(
    sh: np.ndarray, offs: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures from a flat shingle
    stream + doc offsets.

    Outer product (shingles x permutations) chunked to bound memory, with one
    ``np.minimum.reduceat`` per chunk collapsing doc segments — no per-doc
    Python-level hashing (duplicate shingles cannot change a min, so the
    flat shingle stream needs no per-doc unique)."""
    n_docs = len(offs) - 1
    num_perm = len(a)
    sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
    chunk = max(1, 8_000_000 // num_perm)
    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        while d1 < n_docs and offs[d1 + 1] - offs[d0] <= chunk:
            d1 += 1
        seg = sh[offs[d0] : offs[d1]]
        with np.errstate(over="ignore"):
            prod = seg[:, None] * a[None, :] + b
        starts = (offs[d0:d1] - offs[d0]).astype(np.int64)
        sigs[d0:d1] = np.minimum.reduceat(prod, starts, axis=0)
        d0 = d1
    return sigs


def _batch_minhash(
    texts: pa.Array | pa.ChunkedArray, k: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    sh, offs = _batch_shingle_hashes(texts, k)
    return _minhash_from_shingles(sh, offs, a, b)


def minhash_signatures(ds: rd.Dataset, k: int = 3, num_perm: int = 64) -> rd.Dataset:
    a, b = _minhash_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        sigs = _batch_minhash(batch.column("text"), k, a, b).view(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.array(sigs.tolist(), type=pa.list_(pa.int64())),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_minhash_lsh(
    ds: rd.Dataset, k: int = 3, num_perm: int = 64, bands: int = 16,
    jaccard_threshold: float = 0.8, num_partitions: int = 64,
) -> rd.Dataset:
    """MinHash → LSH band buckets → candidate pairs → exact-Jaccard verify.

    Emits (doc_a, doc_b, jaccard) for verified near-duplicate pairs. The
    banding shuffle moves (doc_id, band_id, band_hash) POSTINGS only — 24
    bytes per (doc, band) — not shingle sets: candidate pairs come out of
    the buckets first, and only the docs actually referenced by a candidate
    pair have their shingle sets computed (one filtered corpus pass) and
    joined back for the exact verify. Versus shipping each doc's set once
    per band, the banding shuffle shrinks ~bands× (16× at the defaults) and
    verify traffic is proportional to CANDIDATES, not corpus.

    Partitioning assumptions: all members of one LSH bucket fit in one
    group (buckets are (band_id, band_hash)), and the candidate-pair doc
    set is far smaller than the corpus (the semi-join broadcast below —
    same bound dup_clusters already relies on)."""
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)

    def explode(batch: pa.Table) -> pa.Table:
        sh, offs = _batch_shingle_hashes(batch.column("text"), k)
        sigs = _minhash_from_shingles(sh, offs, a, b)
        n = len(sigs)
        banded = sigs.reshape(n, bands, rows_per_band)
        with np.errstate(over="ignore"):
            # positional fold of each band's rows into one 64-bit bucket hash
            mult = (np.arange(rows_per_band, dtype=np.uint64) * np.uint64(2) + np.uint64(1)) \
                * np.uint64(0x9E3779B97F4A7C15)
            bh = (banded * mult).sum(axis=2)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, bands)),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.ravel().view(np.int64)),
        })

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Candidate (doc_a < doc_b) pairs from every bucket in this
        partition, deduped across buckets — vectorized (no Python loop
        over buckets or pairs)."""
        empty = pd.DataFrame({"doc_a": pd.Series(dtype=df["doc_id"].dtype),
                              "doc_b": pd.Series(dtype=df["doc_id"].dtype)})
        dup = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        if dup.empty:
            return empty
        # sort=True so code order == id order → pairs come out (min, max)
        dcodes, duniq = pd.factorize(dup["doc_id"], sort=True)
        band = dup["band_id"].to_numpy(np.int32)
        bh = dup["band_hash"].to_numpy(np.int64)
        order = np.lexsort((dcodes, bh, band))
        dc_s, b_s, h_s = dcodes[order], band[order], bh[order]
        gstart = np.ones(len(b_s), dtype=bool)
        gstart[1:] = (b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
        bsizes = np.diff(np.append(np.nonzero(gstart)[0], len(b_s)))
        ia, ib = _segment_pairs(bsizes)
        if not len(ia):
            return empty
        n_docs = len(duniq)
        pkey = np.unique(dc_s[ia].astype(np.int64) * n_docs + dc_s[ib])
        return pd.DataFrame({"doc_a": duniq[pkey // n_docs],
                             "doc_b": duniq[pkey % n_docs]})

    postings = ds.map_batches(explode, batch_format="pyarrow")
    pairs = _grouped_map(postings, ["band_id", "band_hash"], bucket_pairs,
                         num_partitions)
    pairs = _grouped_map(
        pairs, ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]), num_partitions)
    # candidates are small (near-dups + band collisions); pin them so the
    # banding shuffle runs ONCE even though verify consumes pairs three
    # times (two id projections + the join left side)
    return _verify_pairs_jaccard(ds, pairs.materialize(), k, jaccard_threshold)


def _verify_pairs_jaccard(
    ds: rd.Dataset, pairs: rd.Dataset, k: int, jaccard_threshold: float,
    broadcast_pairs: int = 1_000_000,
) -> rd.Dataset:
    """Exact-Jaccard verify for candidate (doc_a, doc_b) pairs: shingle
    sets are computed ONLY for referenced docs, shipped as packed int32
    binary, and scored with the chunked vectorized intersection kernel.

    Two paths on the already-materialized ``pairs``:
    - ≤ ``broadcast_pairs`` candidates (the common case — candidates are
      near-dups + band collisions): candidate ids and their sets broadcast
      via ``ray.put`` (the same boundedness dup_clusters relies on), so
      verify is ONE filtered corpus pass + ONE map over pairs — no extra
      shuffles.
    - larger candidate sets: fully distributed — semi-join corpus filter,
      then two adaptive hash_joins attach set_a/set_b (Arrow joins carry
      binary payloads, not list columns).

    Sets are 32-bit hash truncations: half the bytes; expected Jaccard
    inflation from 32-bit collisions is ~|A||B|/2^32 ≈ 1e-5 for typical
    shingle sets — far below any useful threshold."""
    import ray

    from .joins import hash_join, semi_join

    def make_sets(batch: pa.Table) -> pa.Table:
        sh, offs = _batch_shingle_hashes(batch.column("text"), k)
        u32, o32 = _unique_per_doc((sh & np.uint64(0xFFFFFFFF)), offs)
        vals = u32.astype(np.int32)
        bufs = [vals[o32[i]:o32[i + 1]].tobytes()
                for i in range(len(o32) - 1)]
        return pa.table({
            "_d": batch.column("doc_id"),
            "_set": pa.array(bufs, type=pa.binary()),
        })

    n_pairs = pairs.count()  # pairs is materialized → count is free
    if n_pairs <= broadcast_pairs:
        import pyarrow.compute as pc

        cand = set()
        for r in pairs.take_all():
            cand.add(r["doc_a"])
            cand.add(r["doc_b"])
        ids_ref = ray.put(pa.array(sorted(cand)))

        def filt(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("doc_id"), value_set=ray.get(ids_ref))
            return batch.filter(m)

        set_rows = ds.select_columns(["doc_id", "text"]) \
            .map_batches(filt, batch_format="pyarrow") \
            .map_batches(make_sets, batch_format="pyarrow").take_all()
        sets_ref = ray.put({r["_d"]: r["_set"] for r in set_rows})

        def attach(batch: pa.Table) -> pa.Table:
            lut = ray.get(sets_ref)
            sa = [lut[d] for d in batch.column("doc_a").to_pylist()]
            sb = [lut[d] for d in batch.column("doc_b").to_pylist()]
            return pa.table({
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "set_a": pa.array(sa, type=pa.binary()),
                "set_b": pa.array(sb, type=pa.binary()),
            })

        j = pairs.map_batches(attach, batch_format="pyarrow")
    else:
        def ids_only(col):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table({"_d": batch.column(col)})
            return fn

        cand_ids = pairs.map_batches(ids_only("doc_a"), batch_format="pyarrow") \
            .union(pairs.map_batches(ids_only("doc_b"), batch_format="pyarrow"))
        cand_docs = semi_join(ds.select_columns(["doc_id", "text"]), cand_ids,
                              "doc_id", "_d")

        def rename(ka, sa):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.rename_columns([ka, sa])
            return fn

        # sets computed ONCE for the candidate docs, pinned, then renamed
        # per join side (rename over materialized blocks is zero-copy)
        sets = cand_docs.map_batches(make_sets, batch_format="pyarrow") \
            .materialize()
        sets_a = sets.map_batches(rename("_da", "set_a"), batch_format="pyarrow")
        sets_b = sets.map_batches(rename("_db", "set_b"), batch_format="pyarrow")
        j = hash_join(pairs, sets_a, "doc_a", "_da")
        j = hash_join(j, sets_b, "doc_b", "_db")

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table({
            "doc_a": pa.array([], type=batch.schema.field("doc_a").type),
            "doc_b": pa.array([], type=batch.schema.field("doc_b").type),
            "jaccard": pa.array([], type=pa.float64()),
        })
        if n == 0:
            return empty
        sa = [np.frombuffer(x.as_py(), dtype=np.int32).astype(np.int64)
              for x in batch.column("set_a")]
        sb = [np.frombuffer(x.as_py(), dtype=np.int32).astype(np.int64)
              for x in batch.column("set_b")]
        lens = np.array([len(s) for s in sa] + [len(s) for s in sb],
                        dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        vals = np.concatenate(sa + sb) if (sa or sb) else np.empty(0, np.int64)
        ia = np.arange(n, dtype=np.int64)
        ib = ia + n
        inter = _pair_intersections(vals, offs, ia, ib)
        union = lens[ia] + lens[ib] - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        hit = jac >= jaccard_threshold
        if not hit.any():
            return empty
        mask = pa.array(hit)
        return pa.table({
            "doc_a": batch.column("doc_a").filter(mask),
            "doc_b": batch.column("doc_b").filter(mask),
            "jaccard": pa.array(jac[hit], type=pa.float64()),
        })

    return j.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash


def simhash_signatures(ds: rd.Dataset) -> rd.Dataset:
    """64-bit SimHash over vectorized word hashes (unit weights): per-bit
    votes summed per doc with one ``np.add.reduceat`` over the flat stream."""

    def fn(batch: pa.Table) -> pa.Table:
        wh, offs = _batch_word_hashes(batch.column("text"))
        n_docs = len(offs) - 1
        shifts = np.arange(64, dtype=np.uint64)
        sigs = np.empty(n_docs, dtype=np.uint64)
        chunk = 200_000  # words per chunk: bounds the (words x 64) bit matrix
        d0 = 0
        weights = np.uint64(1) << shifts
        while d0 < n_docs:
            d1 = d0 + 1
            while d1 < n_docs and offs[d1 + 1] - offs[d0] <= chunk:
                d1 += 1
            seg = wh[offs[d0] : offs[d1]]
            bits = ((seg[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            starts = (offs[d0:d1] - offs[d0]).astype(np.int64)
            votes = np.add.reduceat(2 * bits - 1, starts, axis=0)
            sigs[d0:d1] = ((votes > 0).astype(np.uint64) * weights).sum(axis=1)
            d0 = d1
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(sigs.view(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_simhash(ds: rd.Dataset, max_hamming: int = 3, blocks: int = 4) -> rd.Dataset:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via the block-key
    trick: split 64 bits into `blocks` blocks; any pair within distance d <
    blocks shares ≥1 exact block → groupby(block_id, block_value)."""
    sigs = simhash_signatures(ds)

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        width = 64 // blocks
        mask = np.uint64((1 << width) - 1)
        vals = np.stack(
            [(sig >> np.uint64(bi * width)) & mask for bi in range(blocks)], axis=1
        )
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, blocks)),
            "block_id": pa.array(np.tile(np.arange(blocks, dtype=np.int32), len(ids))),
            "block_val": pa.array(vals.ravel().view(np.int64)),
            "simhash": pa.array(np.repeat(sig.view(np.int64), blocks)),
        })

    def bucket_verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype=df["doc_id"].dtype),
                              "doc_b": pd.Series(dtype=df["doc_id"].dtype),
                              "hamming": pd.Series(dtype=np.int64)})
        dup = df[df.duplicated(["block_id", "block_val"], keep=False)]
        if dup.empty:
            return empty
        # batched across ALL buckets: sort by (bucket, doc code), dedupe
        # same-doc repeats within a bucket, expand pairs once, popcount once
        dcodes, duniq = pd.factorize(dup["doc_id"], sort=True)
        blk = dup["block_id"].to_numpy(np.int32)
        bv = dup["block_val"].to_numpy(np.int64)
        h = dup["simhash"].to_numpy(np.int64).view(np.uint64)
        order = np.lexsort((dcodes, bv, blk))
        dc_s, b_s, v_s, h_s = dcodes[order], blk[order], bv[order], h[order]
        keep = np.ones(len(order), dtype=bool)
        keep[1:] = ((b_s[1:] != b_s[:-1]) | (v_s[1:] != v_s[:-1])
                    | (dc_s[1:] != dc_s[:-1]))
        dc_s, b_s, v_s, h_s = dc_s[keep], b_s[keep], v_s[keep], h_s[keep]
        gstart = np.ones(len(b_s), dtype=bool)
        gstart[1:] = (b_s[1:] != b_s[:-1]) | (v_s[1:] != v_s[:-1])
        sizes = np.diff(np.append(np.nonzero(gstart)[0], len(b_s)))
        ia, ib = _segment_pairs(sizes)
        if not len(ia):
            return empty
        x = h_s[ia] ^ h_s[ib]
        d = np.zeros(len(x), dtype=np.int64)  # popcount via byte LUT
        for shift in range(0, 64, 8):
            d += _POPCOUNT8[(x >> np.uint64(shift)) & np.uint64(0xFF)]
        hit = d <= max_hamming
        if not hit.any():
            return empty
        return pd.DataFrame({"doc_a": duniq[dc_s[ia][hit]],
                             "doc_b": duniq[dc_s[ib][hit]],
                             "hamming": d[hit]})

    pairs = _grouped_map(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["block_id", "block_val"],
        bucket_verify,
    )
    return _grouped_map(
        pairs, ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard join


def _unique_per_doc(flat: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate each doc's segment of a flat hash stream (vectorized:
    one lexsort over (doc, hash) + an adjacent-duplicate mask)."""
    n_docs = len(offs) - 1
    doc_of = np.repeat(np.arange(n_docs), np.diff(offs))
    order = np.lexsort((flat, doc_of))
    fs, ds_ = flat[order], doc_of[order]
    keep = np.ones(len(fs), dtype=bool)
    keep[1:] = (fs[1:] != fs[:-1]) | (ds_[1:] != ds_[:-1])
    fs, ds_ = fs[keep], ds_[keep]
    new_counts = np.bincount(ds_, minlength=n_docs)
    return fs, np.concatenate([[0], np.cumsum(new_counts)])


def dedup_ngram_jaccard(
    ds: rd.Dataset, k: int = 3, threshold: float = 0.8,
    id_col: str = "doc_id", text_col: str = "text",
    df_cap: int | None = None,
) -> rd.Dataset:
    """Exact all-pairs n-gram Jaccard ≥ threshold, distributed via an
    inverted shingle index — no candidate pruning, so the result is exact
    when ``df_cap`` is None:

    1. per-doc unique shingle-hash sets (vectorized), emitted as
       (shingle, doc, |set|) postings — each posting carries its doc's set
       size so NOTHING is collected to the driver or broadcast;
    2. shuffle postings by shingle (bounded hash partitions); each shingle
       shared by m docs yields its m(m-1)/2 doc pairs annotated with both
       set sizes;
    3. count pair occurrences per (doc_a, doc_b) group = |A ∩ B|;
       jaccard = c / (|A| + |B| - c).

    Skew bound: a shingle appearing in f docs emits O(f^2) pairs; with
    ``df_cap`` set, shingles with in-partition document frequency > df_cap
    are dropped (logged per partition via Ray's stdout capture). That makes
    the intersection count a LOWER bound, i.e. recall can drop for pairs
    whose overlap is concentrated in stop-shingles — the standard corpus-
    scale trade. The oracle query runs with df_cap=None (exact)."""

    def explode(batch: pa.Table) -> pa.Table:
        flat, offs = _batch_shingle_hashes(batch.column(text_col), k)
        flat, offs = _unique_per_doc(flat, offs)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        return pa.table({
            "sh": pa.array(flat.view(np.int64)),
            "doc": pa.array(np.repeat(ids, counts)),
            "n": pa.array(np.repeat(counts.astype(np.int64), counts)),
        })

    def shingle_pairs(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated(["sh"], keep=False)]
        if df_cap is not None and len(dup):
            f = dup.groupby("sh", sort=False)["sh"].transform("size")
            hot = f > df_cap
            if hot.any():
                n_hot = dup.loc[hot, "sh"].nunique()
                print(f"dedup_ngram_jaccard: dropped {n_hot} shingles "
                      f"with df > {df_cap}")
                dup = dup[~hot]
        if dup.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype=df["doc"].dtype),
                                 "doc_b": pd.Series(dtype=df["doc"].dtype),
                                 "n_a": pd.Series(dtype=np.int64),
                                 "n_b": pd.Series(dtype=np.int64)})
        # batched pair expansion over ALL shingle groups at once: sort by
        # (shingle, doc code), then one _segment_pairs call. sort=True codes
        # preserve doc order, so pairs come out (smaller doc, larger doc) as
        # the per-group argsort used to produce.
        dcodes, duniq = pd.factorize(dup["doc"], sort=True)
        sh = dup["sh"].to_numpy(np.int64)
        ns = dup["n"].to_numpy(np.int64)
        order, sizes = _group_sizes([sh], dcodes)
        dc_s, ns_s = dcodes[order], ns[order]
        ia, ib = _segment_pairs(sizes)
        return pd.DataFrame({"doc_a": duniq[dc_s[ia]],
                             "doc_b": duniq[dc_s[ib]],
                             "n_a": ns_s[ia],
                             "n_b": ns_s[ib]})

    def count_and_score(df: pd.DataFrame) -> pd.DataFrame:
        c = (df.groupby(["doc_a", "doc_b"], sort=False)
             .agg(inter=("n_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first"))
             .reset_index())
        inter = c["inter"].to_numpy(dtype=np.float64)
        j = inter / (c["n_a"].to_numpy(dtype=np.float64)
                     + c["n_b"].to_numpy(dtype=np.float64) - inter)
        c["jaccard"] = j
        return c[j >= threshold][["doc_a", "doc_b", "jaccard"]]

    postings = ds.map_batches(explode, batch_format="pyarrow")
    pairs = _grouped_map(postings, ["sh"], shingle_pairs)
    return _grouped_map(pairs, ["doc_a", "doc_b"], count_and_score)


def dup_clusters(pairs_ds: rd.Dataset, a_col: str = "doc_a", b_col: str = "doc_b") -> rd.Dataset:
    """Connected components over verified near-dup pairs → (doc_id, cluster)
    rows, cluster = min doc id of the component (the canonical survivor).

    The pair set is orders of magnitude smaller than the corpus (only
    verified near-duplicates), so union-find on the driver is the right
    tool (cf. Ray guide: driver-side only when the candidate set is provably
    small). At extreme pair counts, swap in a few rounds of distributed
    min-label propagation over the same (node, label) schema."""
    rows = pairs_ds.select_columns([a_col, b_col]).take_all()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r[a_col]), find(r[b_col])
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    members = sorted(parent)
    out = pa.table({
        "doc_id": pa.array(members),
        "cluster": pa.array([find(m) for m in members]),
    })
    return rd.from_arrow(out)


def keep_canonical(ds: rd.Dataset, clusters: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """Drop every clustered doc except its canonical (min-id) survivor: the
    reject set {doc_id != cluster} broadcasts via ray.put and filters inside
    map_batches — an anti-join with no shuffle of the corpus."""
    import ray

    import pyarrow.compute as pc

    rej_tbl = clusters.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("doc_id"), b.column("cluster")))
        .select(["doc_id"]),
        batch_format="pyarrow",
    ).take_all()
    rej_ref = ray.put(pa.array([r["doc_id"] for r in rej_tbl]))

    def fn(batch: pa.Table) -> pa.Table:
        rejects = ray.get(rej_ref)
        keep = pc.invert(pc.is_in(batch.column(id_col), value_set=rejects))
        return batch.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_embedding_lsh(
    emb_ds: rd.Dataset, threshold: float = 0.9, n_planes: int = 16,
    bands: int = 4, seed: int = 19,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> rd.Dataset:
    """Scale-path embedding near-dup: random-hyperplane (cosine) LSH.

    Sign bits of R @ v give an n_planes-bit signature; banding the bits (as
    in MinHash LSH) buckets candidates, which verify with exact cosine inside
    their group. Nothing is broadcast and no all-pairs matrix exists — the
    shuffle moves (band, bucket, id, vector) rows only. Approximate: a pair
    is found iff it shares all bits of >=1 band (high recall near
    threshold->1; tune n_planes/bands for lower thresholds)."""
    planes_by_dim: dict[int, np.ndarray] = {}
    bits_per_band = n_planes // bands

    def explode(batch: pa.Table) -> pa.Table:
        from .similarity_util import to_matrix, normalize

        m = normalize(to_matrix(batch.column(emb_col)))
        d = m.shape[1]
        if d not in planes_by_dim:  # same seed per dim → identical planes everywhere
            planes_by_dim[d] = np.random.default_rng(seed).normal(size=(d, n_planes))
        bits = (m @ planes_by_dim[d]) > 0  # (n, planes)
        weights = (np.uint64(1) << np.arange(bits_per_band, dtype=np.uint64))
        banded = bits.reshape(len(m), bands, bits_per_band)
        bh = (banded.astype(np.uint64) * weights).sum(axis=2)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat = m.astype(np.float32)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(np.repeat(flat, bands, axis=0).ravel(), type=pa.float32()), d)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), len(m))),
            "band_hash": pa.array(bh.ravel().view(np.int64)),
            "vec": emb,
        })

    def bucket_verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype=df[id_col].dtype),
                              "vec_b": pd.Series(dtype=df[id_col].dtype),
                              "cosine": pd.Series(dtype=np.float64)})
        dup = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        if dup.empty:
            return empty
        # batched across ALL buckets: expand in-bucket pairs once, then one
        # row-wise einsum for every pair's cosine (vectors are pre-normalized)
        dcodes, duniq = pd.factorize(dup[id_col], sort=True)
        band = dup["band_id"].to_numpy(np.int32)
        bh = dup["band_hash"].to_numpy(np.int64)
        order = np.lexsort((dcodes, bh, band))
        dc_s, b_s, h_s = dcodes[order], band[order], bh[order]
        keep = np.ones(len(order), dtype=bool)
        keep[1:] = ((b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
                    | (dc_s[1:] != dc_s[:-1]))
        sel = order[keep]
        dc_s, b_s, h_s = dc_s[keep], b_s[keep], h_s[keep]
        gstart = np.ones(len(b_s), dtype=bool)
        gstart[1:] = (b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
        sizes = np.diff(np.append(np.nonzero(gstart)[0], len(b_s)))
        ia, ib = _segment_pairs(sizes)
        if not len(ia):
            return empty
        m = np.stack(dup["vec"].to_numpy()[sel]).astype(np.float64)
        sims = np.einsum("ij,ij->i", m[ia], m[ib])
        hit = sims >= threshold
        if not hit.any():
            return empty
        return pd.DataFrame({"vec_a": duniq[dc_s[ia][hit]],
                             "vec_b": duniq[dc_s[ib][hit]],
                             "cosine": sims[hit]})

    pairs = _grouped_map(
        emb_ds.map_batches(explode, batch_format="pyarrow"),
        ["band_id", "band_hash"], bucket_verify)
    return _grouped_map(pairs, ["vec_a", "vec_b"],
                        lambda df: df.drop_duplicates(["vec_a", "vec_b"]))


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def dedup_embedding_cosine(emb_ds: rd.Dataset, threshold: float = 0.95,
                           max_rows: int = 2_000_000) -> rd.Dataset:
    """Near-duplicate (vec_a < vec_b) pairs with cosine ≥ threshold.

    Block-local matmul against a broadcast matrix of all vectors — valid
    while the embedding matrix fits in memory (N×D float64). The guard
    counts the corpus FIRST and refuses above ``max_rows`` (2M vectors ×
    768 dims ≈ 12 GB broadcast) instead of OOM-ing the driver;
    ``dedup_embedding_lsh`` is the no-broadcast scale path."""
    import ray

    n = emb_ds.count()
    if n > max_rows:
        raise ValueError(
            f"dedup_embedding_cosine materializes the whole corpus "
            f"({n} rows > max_rows={max_rows}); use dedup_embedding_lsh "
            f"(random-hyperplane LSH, no broadcast) at this scale")
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


def dup_ngram_spans(
    ds: rd.Dataset, n: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
    hashed: bool = False, num_partitions: int = 64,
) -> rd.Dataset:
    """Per-doc count of word n-gram positions whose n-gram already occurred
    EARLIER in the corpus (earlier = smaller (doc_id, pos)) — the
    span-level duplication profile behind suffix-array corpus dedup
    ("remove every repeated span after its first occurrence"), reduced to
    a distributable postings shape. Output: (doc_id, n_pos, n_dup,
    dup_frac) for every doc with at least n words.

    One postings pass builds (ngram, doc_id, pos) per batch (vectorized
    shifted-slice join, cross-doc windows masked); ONE bounded hash
    shuffle keyed on the ngram co-locates each ngram's occurrences; inside
    a partition a single sort + duplicated-mask marks every non-first
    occurrence, pre-aggregated to per-doc counts before the tiny final
    groupby. Per-doc totals ride the adaptive hash_join (broadcast while
    doc metadata is small, shuffle at scale).

    ``hashed=True`` ships 64-bit ngram hashes through the shuffle instead
    of the strings (~constant width, collision odds ~N²/2⁶⁴) — the 100 TB
    path; the default keeps exact strings so the SQL oracle can reproduce
    results value-for-value."""
    import pyarrow.compute as pc

    from .joins import hash_join

    def postings(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(texts, " ")
        flat = words.flatten()
        offs = np.asarray(words.offsets, dtype=np.int64)
        offs = offs - offs[0]
        m = len(flat) - n + 1
        empty = pa.table({
            "ng": pa.array([], type=pa.int64() if hashed else pa.string()),
            id_col: pa.array([], type=batch.schema.field(id_col).type),
            "pos": pa.array([], type=pa.int64()),
        })
        if m <= 0:
            return empty
        shifted = [flat.slice(j, m) for j in range(n)]
        grams = pc.binary_join_element_wise(*shifted, " ")
        starts = offs[:-1]
        doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                            np.diff(offs))[:m]
        pos = np.arange(m, dtype=np.int64) - starts[doc_idx]
        # a window starting within n-1 words of a doc's end spans two docs
        valid = pos <= (np.diff(offs) - n)[doc_idx]
        if not valid.any():
            return empty
        grams = grams.filter(pa.array(valid))
        if hashed:
            import polars as pl

            grams = pa.array(pl.from_arrow(pa.table({"g": grams}))["g"]
                             .hash(seed=0).to_numpy().view(np.int64))
        ids = batch.column(id_col).take(pa.array(doc_idx[valid]))
        return pa.table({"ng": grams, id_col: ids,
                         "pos": pa.array(pos[valid])})

    def mark_dups(df):
        df = df.sort_values(["ng", id_col, "pos"], kind="mergesort")
        dup = df["ng"].duplicated().to_numpy()
        out = df.assign(_d=dup.astype(np.int64)) \
            .groupby(id_col, sort=False, as_index=False)["_d"].sum()
        return out.rename(columns={"_d": "n_dup"})

    per_part = _grouped_map(ds.map_batches(postings, batch_format="pyarrow"),
                            ["ng"], mark_dups, num_partitions)

    def dup_reduce(df):
        return df.groupby(id_col, sort=False, as_index=False)["n_dup"].sum()

    dups = _grouped_map(per_part, [id_col], dup_reduce, num_partitions)

    def totals(batch: pa.Table) -> pa.Table:
        wc = pc.add(pc.count_substring(batch.column(text_col), " "), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({id_col: batch.column(id_col),
                      "n_pos": pa.array(wc - n + 1)})
        return t.filter(pa.array(wc >= n))

    joined = hash_join(ds.map_batches(totals, batch_format="pyarrow"),
                       dups, id_col, id_col, how="left",
                       num_partitions=num_partitions)

    def final(batch: pa.Table) -> pa.Table:
        nd = pc.coalesce(batch.column("n_dup"), pa.scalar(0, pa.int64()))
        np_ = batch.column("n_pos").to_numpy(zero_copy_only=False)
        ndv = nd.to_numpy(zero_copy_only=False) if isinstance(nd, pa.ChunkedArray) \
            else np.asarray(nd)
        return pa.table({
            id_col: batch.column(id_col),
            "n_pos": batch.column("n_pos"),
            "n_dup": nd,
            "dup_frac": pa.array(ndv.astype(np.float64) / np_.astype(np.float64)),
        })

    return joined.map_batches(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental dedup: fingerprint index on disk, probed by ingestion batches


def _prefix_fingerprints(batch: pa.Table, id_col: str, text_col: str,
                         prefix_len: int) -> tuple[pa.Array, np.ndarray]:
    import polars as pl
    import pyarrow.compute as pc

    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    pref = pc.utf8_slice_codeunits(txt, 0, prefix_len)
    h = pl.from_arrow(pa.table({"p": pref}))["p"].hash(seed=7) \
        .to_numpy().astype(np.uint64)
    return batch.column(id_col), h


def build_fingerprint_index(
    ds: rd.Dataset, index_dir: str, prefix_len: int = 100,
    n_buckets: int = 64, id_col: str = "doc_id", text_col: str = "text",
) -> None:
    """Materialize an exact-dup fingerprint index: one xxhash of each doc's
    first ``prefix_len`` chars, written as (fp, doc_id) parquet PARTITIONED
    by fp's bucket. Ingestion-time dedup then probes only the buckets its
    batch hashes into — the corpus is indexed once and never re-scanned."""
    def fp_batch(batch: pa.Table) -> pa.Table:
        ids, h = _prefix_fingerprints(batch, id_col, text_col, prefix_len)
        return pa.table({
            id_col: ids,
            "fp": pa.array(h.view(np.int64)),
            "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
        })

    ds.map_batches(fp_batch, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["bucket"])


def dedup_against_index(
    new_ds: rd.Dataset, index_dir: str, prefix_len: int = 100,
    n_buckets: int = 64, id_col: str = "doc_id", text_col: str = "text",
) -> pa.Table:
    """Incremental dedup: which incoming docs already exist in the indexed
    corpus (by prefix fingerprint)? The INCOMING batch is the small side of
    ingestion, so its distinct fingerprints collect to the driver and
    broadcast; the index — the 100 TB side — is read ONLY in the buckets
    those fingerprints hash to, filtered by ``pc.is_in`` per batch. Returns
    the hit rows' (doc_id, fp), never shipping corpus text anywhere."""
    import glob
    import os

    import pyarrow.compute as pc
    import ray

    parts = [_prefix_fingerprints(b, id_col, text_col, prefix_len)
             for b in new_ds.map_batches(
                 lambda t: t.select([id_col, text_col]),
                 batch_format="pyarrow").iter_batches(
                     batch_format="pyarrow", batch_size=65536)]
    def _flat(col) -> pa.Array:
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    inc_ids = (pa.concat_arrays([_flat(i) for i, _ in parts])
               if parts else pa.array([], type=pa.int64()))
    inc_fp = (np.concatenate([h for _, h in parts]) if parts
              else np.empty(0, dtype=np.uint64))
    fps = np.unique(inc_fp)
    buckets = sorted({int(b) for b in (fps % np.uint64(n_buckets))})
    paths = [p for b in buckets
             for p in glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))]
    if not paths or not len(fps):
        return pa.table({id_col: pa.array([], inc_ids.type),
                         "fp": pa.array([], type=pa.int64())})
    from ..sources.parquet import read_parquet_clean

    fset = ray.put(pa.array(fps.view(np.int64)))

    def probe(batch: pa.Table) -> pa.Table:
        return batch.select(["fp"]).filter(
            pc.is_in(batch.column("fp"), value_set=ray.get(fset)))

    matched = pa.concat_tables(ray.get(
        read_parquet_clean(paths, columns=["fp"])
        .map_batches(probe, batch_format="pyarrow").to_arrow_refs()))
    mset = np.unique(matched.column("fp").to_numpy())
    hit = np.isin(inc_fp.view(np.int64), mset)
    return pa.table({id_col: inc_ids.filter(pa.array(hit)),
                     "fp": pa.array(inc_fp.view(np.int64)[hit])})
