"""Join operators: broadcast hash join (zero large-side shuffle) and the
co-partitioned as-of join (latest-before semantics via merge_asof per
bounded hash partition)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from apacheorcdotnet_ray.pipelines.joins import asof_join, broadcast_hash_join


def test_broadcast_hash_join(ray_session):
    big = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 1, 2, 9], type=pa.int64()),
        "x": pa.array([10, 20, 30, 40, 50, 60], type=pa.int64()),
    })).repartition(3)
    small = pa.table({"pk": pa.array([1, 2, 3], type=pa.int64()),
                      "name": pa.array(["a", "b", "c"])})
    out = broadcast_hash_join(big, small, "k", "pk").to_pandas()
    assert len(out) == 5  # key 9 unmatched (inner)
    assert dict(zip(out["x"], out["name"])) == {10: "a", 40: "a", 20: "b", 50: "b", 30: "c"}


def test_asof_join_latest_before(ray_session):
    ts = lambda d: pd.Timestamp(f"2024-01-{d:02d}")
    left = rd.from_arrow(pa.table({
        "eid": pa.array([1, 2, 3, 4], type=pa.int64()),
        "uk": pa.array([7, 7, 8, 9], type=pa.int64()),
        "t": pa.array([ts(10), ts(20), ts(15), ts(5)], type=pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([7, 7, 8, 8], type=pa.int64()),
        "rt": pa.array([ts(1), ts(12), ts(14), ts(16)], type=pa.timestamp("us")),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
    }))
    out = asof_join(left, right, "eid", "uk", "t", "rk", "rt", "v").to_pandas()
    got = dict(zip(out["eid"], out["v"]))
    assert got[1] == 1.0       # only ts(1) <= jan10 for key 7
    assert got[2] == 2.0       # latest before jan20
    assert got[3] == 3.0       # jan14 <= jan15 < jan16
    assert np.isnan(got[4])    # key 9 has no right rows
