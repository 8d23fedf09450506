"""Read a directory of .oray stripe files back as a ray.data.Dataset.

One stripe = one independent unit of decode (the reference's stripes are
self-describing for the same reason, Stripes/StripeReader.cs:38-61), so
``read_binary_files`` + a stateless decode ``map_batches`` parallelizes
embarrassingly: each file decodes in its own task, streaming with backpressure.

Predicate pushdown (the reference's ROW_INDEX/seek-statistics analog,
ColumnTypes/ColumnWriterStatistics.cs:12-33): stripe footers carry per-column
min/max stats, so whole stripe files whose stat range cannot satisfy the
predicate are pruned driver-side by a cheap tail read — only surviving
stripes are scheduled, then the exact filter applies per decoded batch.
"""

from __future__ import annotations

import glob
import json
import os
import struct
import zlib

import ray.data as rd

from ..stages.decode import StripeDecoder

# predicate: (column, op, literal) with op in <, <=, >, >=, ==, !=
_OPS = {"<", "<=", ">", ">=", "==", "!="}


def stripe_paths(stripe_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(stripe_dir, "*.oray")))


def read_stripe_footer(path: str) -> dict:
    """Tail-only footer read (FileTail.cs:22-54): seek to the end, read the
    footer length + compressed footer — never the data segments."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != b"ORAY":
            raise ValueError(f"not an ORAY1 stripe file: {path}")
        (footer_len,) = struct.unpack("<I", tail[:4])
        f.seek(size - 8 - footer_len)
        return json.loads(zlib.decompress(f.read(footer_len)))


# Footer stats for timestamp/date columns are stored as ISO-ish strings
# (str(datetime)); temporal predicates accept EITHER an ISO string or a
# datetime/date literal — maybe_satisfies parses both sides to datetimes
# for pruning and compare_mask casts the literal to the column type for
# the exact filter, so one literal form prunes AND filters. A genuinely
# incomparable literal degrades to no-prune rather than raising.
from ..stripe.stats import maybe_satisfies as _maybe_satisfies


def _prune_one(path: str, predicate) -> bool:
    from ..stripe import bloom as bloom_mod
    from ..stripe.container import normalize_predicate

    footer = read_stripe_footer(path)
    bloom_ok = footer.get("bloom_hash") == bloom_mod.hash_version()
    schema = None
    for col, op, lit in normalize_predicate(predicate):
        meta = next((c for c in footer["columns"] if c["name"] == col), {})
        if not _maybe_satisfies(meta.get("stats", {}), op, lit):
            return False
        # equality predicates additionally probe the per-stripe bloom (when
        # written under the same hash version) — prunes point lookups on
        # unclustered keys that min/max cannot. The literal is cast to the
        # column's footer-schema type first (polars hashes 577 and 577.0
        # differently — a raw-literal probe could false-negative).
        if op == "==" and bloom_ok and "bloom" in meta:
            if schema is None:
                from ..stripe.container import footer_schema

                schema = footer_schema(footer)
            try:
                col_type = schema.field(col).type
            except KeyError:
                col_type = None
            if not bloom_mod.might_contain(meta["bloom"], lit, col_type):
                return False
    return True


def map_footers(paths: list[str], fn, chunk_size: int = 64,
                fan_out_threshold: int = 256) -> list:
    """Apply ``fn(path)`` per stripe (tail-only footer work), fanning out as
    Ray tasks above the threshold — a big corpus has far more stripes than
    a serial driver scan should touch. The single shared implementation for
    pruning, schema unification, and footer-stat aggregation."""
    if len(paths) > fan_out_threshold:
        import ray

        @ray.remote(num_cpus=0.25)
        def run(chunk: list[str]) -> list:
            return [fn(p) for p in chunk]

        chunks = [paths[i : i + chunk_size] for i in range(0, len(paths), chunk_size)]
        return [r for sub in ray.get([run.remote(c) for c in chunks]) for r in sub]
    return [fn(p) for p in paths]


def prune_stripes(paths: list[str], predicate) -> list[str]:
    """Stat/bloom-based stripe pruning via tail-only footer reads."""
    flags = map_footers(paths, lambda p: _prune_one(p, predicate))
    return [p for p, f in zip(paths, flags) if f]


def unified_schema(paths: list[str]) -> "pa.Schema":
    """Union of all stripe footers' schemas, first-seen field order/types —
    the read-side schema-evolution contract (reference RoundTrip_Test.cs:
    40-62 reads with a narrower/wider row shape). Fans out as Ray tasks
    above a few hundred files, like prune_stripes."""
    import pyarrow as pa

    from ..stripe.container import footer_schema

    blobs = map_footers(
        paths,
        lambda p: footer_schema(read_stripe_footer(p)).serialize().to_pybytes())
    schema_list = [pa.ipc.read_schema(pa.py_buffer(b)) for b in blobs]
    seen: dict[str, "pa.Field"] = {}
    for s in schema_list:
        for f in s:
            if f.name not in seen:
                seen[f.name] = f
            elif seen[f.name].type != f.type:
                # widen: let Arrow pick the common type (errors on
                # genuinely incompatible evolution, which should be loud)
                seen[f.name] = pa.field(
                    f.name, pa.unify_schemas(
                        [pa.schema([seen[f.name]]), pa.schema([f])],
                        promote_options="permissive").field(f.name).type)
    return pa.schema(list(seen.values()))


def read_stripes(
    stripe_dir: str,
    columns: list[str] | None = None,
    predicate=None,
    unify_schema: bool = False,
    on_error: str = "raise",
    lineage_filter: dict | None = None,
) -> rd.Dataset:
    """predicate: one (column, op, literal) triple or a LIST of them (a
    conjunction); stripes whose footer stats exclude any term are never
    read, row-indexed stripes additionally skip non-qualifying strides,
    the decode task late-materializes (predicate columns decode first and
    non-matching rows never leave the task), and surviving batches get the
    exact filter. unify_schema=True tolerates schema-evolved stripe sets:
    every batch conforms to the union of all footers' schemas, with columns
    missing from a stripe decoded as typed nulls."""
    import pyarrow as pa

    from ..stripe.container import normalize_predicate

    preds = normalize_predicate(predicate)
    for p in preds:
        if p[1] not in _OPS:
            raise ValueError(f"unsupported predicate op {p[1]}")

    paths = stripe_paths(stripe_dir)
    if not paths:
        raise FileNotFoundError(f"no .oray stripes under {stripe_dir}")
    # unified schema over the FULL stripe set (before pruning) so the
    # all-pruned empty path and the decode path agree on one schema
    target_schema = unified_schema(paths) if unify_schema else None
    if target_schema is not None and columns is not None:
        unknown = [c for c in columns if c not in target_schema.names]
        if unknown:
            raise ValueError(
                f"columns {unknown} exist in no stripe's schema under {stripe_dir}")
        keep = [c for c in columns if c in target_schema.names]
        for p in preds:
            if p[0] in target_schema.names and p[0] not in keep:
                keep = keep + [p[0]]
        target_schema = pa.schema([target_schema.field(c) for c in keep])
    if lineage_filter or preds:
        # ONE footer pass for both pruning axes (folding lineage + stat/
        # bloom checks avoids a second map_footers wave over the corpus):
        # - lineage: grouped encodes stamp each stripe with its group key
        #   (e.g. source), so a per-source read touches only those stripes;
        #   stripes WITHOUT the key are kept conservatively (values compared
        #   as strings on both sides — lineage stamps are stringified).
        # - predicate: footer min/max + bloom checks, as before.
        def keep_stripe(p: str) -> bool:
            if lineage_filter:
                lin = read_stripe_footer(p).get("lineage", {})
                if not all(k not in lin or str(lin[k]) == str(v)
                           for k, v in lineage_filter.items()):
                    return False
            return _prune_one(p, preds) if preds else True

        flags = map_footers(paths, keep_stripe)
        kept = [p for p, f in zip(paths, flags) if f]
        if not kept:
            # everything pruned: return a TYPED empty dataset (a schema-less
            # pa.table({}) breaks downstream column references), projected
            # like a normal read would be — the unified schema when
            # unify_schema is on, else the first footer's
            if target_schema is not None:
                sch = target_schema
            else:
                from ..stripe.container import footer_schema

                sch = footer_schema(read_stripe_footer(paths[0]))
                if columns is not None:
                    sch = pa.schema([sch.field(c) for c in columns
                                     if c in sch.names])
            return rd.from_arrow(sch.empty_table())
        paths = kept
    read_cols = columns
    if preds and columns is not None:
        extra = [p[0] for p in preds if p[0] not in columns]
        if extra:
            read_cols = list(columns) + sorted(set(extra), key=extra.index)
    fallback_schema = None
    if on_error == "skip" and target_schema is None:
        # derive the typed-empty schema for all-corrupt tasks from the first
        # READABLE footer (one driver-side tail read; corrupt candidates are
        # skipped the same way the decode tasks will skip them)
        from ..stripe.container import footer_schema

        for p in paths[:8]:
            try:
                sch = footer_schema(read_stripe_footer(p))
            except Exception:  # noqa: BLE001 — corrupt candidate, try next
                continue
            if read_cols is not None:
                sch = pa.schema([sch.field(c) for c in read_cols
                                 if c in sch.names])
            fallback_schema = sch
            break
    # include_paths: the decoder needs each stripe's path to find its
    # merge-on-read delete sidecar (<file>.del, stripe/deletes.py)
    ds = rd.read_binary_files(paths, include_paths=True)
    # stateless → plain-function task pool; the predicate additionally skips
    # non-qualifying strides inside row-indexed stripes (ROW_INDEX analog)
    decoder = StripeDecoder(columns=read_cols, predicate=preds or None,
                            schema=target_schema, on_error=on_error,
                            fallback_schema=fallback_schema)
    ds = ds.map_batches(
        decoder.__call__,
        batch_format="pyarrow",
        batch_size=None,  # one input file is already a full stripe
    )
    if preds:
        from ..stripe.stats import compare_mask

        def exact_filter(batch: pa.Table) -> pa.Table:
            out = batch
            if out.num_rows == 0 and not out.column_names:
                # schema-less empty block: every stripe of the task was
                # skipped (on_error="skip") — nothing to filter or project
                return out
            for col, op, lit in preds:
                # compare_mask casts the literal to the column type when no
                # direct kernel exists (ISO string vs timestamp/date column)
                out = out.filter(compare_mask(out.column(col), op, lit))
            return out.select(columns) if columns is not None else out

        ds = ds.map_batches(exact_filter, batch_format="pyarrow")
    return ds


def _natural_key(path: str) -> tuple:
    """Numeric-aware filename sort: 'rg10' orders after 'rg2' (plain
    lexicographic glob order would interleave rowgroup spans at >=10
    rowgroups, breaking the corpus row-order contract)."""
    import re

    name = os.path.basename(path)
    return tuple(int(p) if p.isdigit() else p
                 for p in re.split(r"(\d+)", name))


def read_row_range(
    stripe_dir: str,
    offset: int,
    limit: int,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Rows [offset, offset + limit) of the corpus in encode order — the
    trainer fast-forward path (resume an interrupted epoch without
    re-streaming the prefix). Corpus row order = stripe files in
    numeric-aware name order (encoders name stripes
    <source>_rg<span>-s<idx>-<hash>.oray, so this is input order).

    Cost is proportional to the RANGE, not the corpus: per-stripe row
    counts come from tail-only footer reads (fanned out as tasks on big
    corpora), non-overlapping stripes are never opened, and inside a
    strided stripe only the overlapping strides decompress
    (decode_stripe's row_range seek, the ORC ROW_INDEX skip analog)."""
    import pyarrow as pa

    from ..stripe.container import decode_stripe, footer_schema

    paths = sorted(stripe_paths(stripe_dir), key=_natural_key)
    if not paths:
        raise FileNotFoundError(f"no .oray stripes under {stripe_dir}")
    counts = map_footers(paths, lambda p: read_stripe_footer(p)["rows"])
    start, want = max(0, int(offset)), max(0, int(limit))
    ranges: dict[str, tuple[int, int]] = {}
    acc = 0
    for p, n in zip(paths, counts):
        lo = max(start, acc)
        hi = min(start + want, acc + n)
        if lo < hi:
            ranges[os.path.basename(p)] = (lo - acc, hi - acc)
        acc += n
    if not ranges:
        sch = footer_schema(read_stripe_footer(paths[0]))
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns if c in sch.names])
        return rd.from_arrow(sch.empty_table())

    sel_paths = [p for p in paths if os.path.basename(p) in ranges]

    def dec(batch: pa.Table) -> pa.Table:
        from ..stripe.deletes import read_delete_mask

        out = []
        for path, blob in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            # row_range addresses PHYSICAL rows (stable across deletes, so a
            # resume offset never shifts); deleted rows drop from the slice
            out.append(decode_stripe(
                blob, columns=columns,
                row_range=ranges[os.path.basename(path)],
                delete_mask=read_delete_mask(path)))
        return pa.concat_tables(out)

    # rows must come out in encode order, but Ray Data's default
    # preserve_order=False lets blocks surface in task-COMPLETION order
    # under load. The DataContext is captured per-dataset at creation, so
    # toggling the flag around creation pins THIS dataset without leaking
    # the (slightly less pipelined) setting to unrelated datasets.
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        return rd.read_binary_files(sel_paths, include_paths=True) \
            .map_batches(dec, batch_format="pyarrow", batch_size=None)
    finally:
        ctx.execution_options.preserve_order = prev
