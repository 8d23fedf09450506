"""Statistics pipelines — the reference's stats aggregators as Ray Data stages.

A1/A2 analog (SURVEY.md §2.5): per-batch partial stats inside ``map_batches``
(pyarrow.compute kernels), file-level final merge as a tiny driver-side reduce
over one small partial row per batch — the partial+final aggregation tree,
never a full shuffle."""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from ..stripe.stats import column_stats, merge_stats


def dataset_column_stats(ds: rd.Dataset, columns: list[str] | None = None) -> dict[str, dict]:
    """column → merged stats over the whole dataset."""

    def partials(batch: pa.Table) -> pa.Table:
        cols = columns or batch.column_names
        st = {c: column_stats(batch.column(c)) for c in cols if c in batch.column_names}
        return pa.table({"stats_json": pa.array([json.dumps(st)])})

    merged: dict[str, dict] = {}
    for row in ds.map_batches(partials, batch_format="pyarrow").take_all():
        for c, st in json.loads(row["stats_json"]).items():
            merged[c] = merge_stats(merged.get(c), st)
    return merged


def stats_row(ds: rd.Dataset, int_columns: list[str], float_columns: list[str] = ()) -> pa.Table:
    """One-row summary table with SQL-matchable column names:
    n_rows plus {col}_min/{col}_max/{col}_sum (ints) and min/max (floats —
    sums of floats are association-order-dependent, so they stay out of the
    oracle-comparable surface)."""
    merged = dataset_column_stats(ds, list(int_columns) + list(float_columns))
    out: dict[str, list] = {}
    any_col = next(iter(merged.values()))
    out["n_rows"] = [any_col["count"]]
    for c in int_columns:
        out[f"{c}_min"] = [merged[c].get("min")]
        out[f"{c}_max"] = [merged[c].get("max")]
        out[f"{c}_sum"] = [merged[c].get("sum")]
    for c in float_columns:
        out[f"{c}_min"] = [merged[c].get("min")]
        out[f"{c}_max"] = [merged[c].get("max")]
    return pa.table(out)


def windowed_agg(ds: rd.Dataset, ts_col: str = "ts", key: str = "event_type",
                 value_col: str = "value", window: str = "hour") -> rd.Dataset:
    """Tumbling-window aggregate over an event stream: per (window_start, key)
    event count + quantized value sum. Pure batch semantics (the reference has
    no watermarks): the window id is a column derived per batch, then the
    grouped partial+final sum pattern applies. Values are quantized to integer
    millis (floor(value*1000)) so the sum is association-order-independent and
    oracle-comparable."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(batch.column(ts_col), unit=window)
        millis = pc.floor(pc.multiply(batch.column(value_col), pa.scalar(1000.0)))
        t = pa.table({
            "window_start": ws,
            key: batch.column(key),
            "v": millis.cast(pa.int64()),
        })
        g = t.group_by(["window_start", key]).aggregate([("v", "sum"), ([], "count_all")])
        return g.select(["window_start", key, "v_sum", "count_all"]).rename_columns(
            ["window_start", key, "p_sum", "p_cnt"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", key])
        .aggregate(Sum("p_sum", alias_name="sum_millis"), Sum("p_cnt", alias_name="n_events"))
    )


def group_stats_by(ds: rd.Dataset, key: str, sum_col: str) -> rd.Dataset:
    """Grouped count+sum with pre-aggregation: one partial row per (batch, key)
    before the shuffle, so the groupby moves partials, not rows."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key).aggregate([(sum_col, "sum"), ([], "count_all")])
        g = g.select([key, f"{sum_col}_sum", "count_all"])
        return g.rename_columns([key, "p_sum", "p_cnt"])

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby(key)
        .aggregate(Sum("p_sum", alias_name="sum_val"), Sum("p_cnt", alias_name="n_rows"))
    )
