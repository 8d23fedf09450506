"""Distributed k-means: recovery of separable blobs, deterministic seeding,
packed-partial reduction correctness vs a local NumPy reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from apacheorcdotnet_ray.pipelines import cluster


def _blob_ds(n_per=40, d=8, seed=5):
    rng = np.random.default_rng(seed)
    centers = np.eye(3, d) * 10
    vecs, ids = [], []
    for c in range(3):
        vecs.append(centers[c] + rng.normal(0, 0.1, (n_per, d)))
        # interleave ids across blobs so the k lowest-id seeds span blobs
        ids.extend(c + 3 * i for i in range(n_per))
    m = np.concatenate(vecs).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1)), d).cast(pa.list_(pa.float32())),
    })
    return t, m


def test_kmeans_recovers_blobs(ray_session):
    t, _ = _blob_ds()
    ds = rd.from_arrow(t).repartition(4)
    out = cluster.kmeans(ds, k=3, iters=5).to_pandas()
    # three well-separated blobs of 40: every cluster converges to one blob
    assert sorted(out["n_members"].tolist()) == [40, 40, 40]


def test_kmeans_assign_matches_local_argmax(ray_session):
    t, m = _blob_ds(seed=9)
    ds = rd.from_arrow(t).repartition(3)
    out = cluster.kmeans_assign(ds, k=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    mm = m.astype(np.float64)
    mm /= np.linalg.norm(mm, axis=1, keepdims=True)
    t_ids = t["vec_id"].to_numpy()
    order = np.argsort(t_ids)
    cent = mm[order[:4]]  # the 4 lowest-id vectors
    expect = np.argmax(mm[order] @ cent.T, axis=1)
    assert (out["cluster"].values == expect).all()


def test_seed_centroids_order_independent(ray_session):
    t, m = _blob_ds(seed=3)
    perm = np.random.default_rng(0).permutation(len(m))
    shuffled = t.take(pa.array(perm))
    c1 = cluster.seed_centroids(rd.from_arrow(t).repartition(4), 4)
    c2 = cluster.seed_centroids(rd.from_arrow(shuffled).repartition(4), 4)
    assert np.allclose(c1, c2)


def test_group_vector_mean_matches_numpy(ray_session):
    t, m = _blob_ds(seed=7)
    labels = pa.array((t["vec_id"].to_numpy() % 3).astype(np.int32))
    t2 = t.append_column("label", labels)
    out = cluster.group_vector_mean(
        rd.from_arrow(t2).repartition(4), round_to=None).to_pandas()
    lab = labels.to_numpy()
    for g in range(3):
        got = out[out["label"] == g].sort_values("pos")["centroid_val"].values
        want = m[lab == g].astype(np.float64).mean(axis=0)
        assert np.allclose(got, want, rtol=1e-12)
    # exploded shape: one row per (group, dim), pos is 1-based
    assert len(out) == 3 * m.shape[1]
    assert out["pos"].min() == 1 and out["pos"].max() == m.shape[1]
