"""Per-column statistics: partial (per stripe) + final (file) aggregation.

Analog of the reference's ``ColumnTypes/*WriterStatistics.cs`` accumulators and
the stride→stripe→file roll-up (``Stripes/StripeWriter.cs:151-158``): min / max
/ sum (sum nulled on overflow, mirroring LongWriterStatistics.cs:32-56) / count
/ null count, computed vectorized per Arrow chunk and merged associatively —
the classic partial+final aggregation tree, which is what makes file-level
stats a tiny driver-side reduce over per-stripe metric rows."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_I64_MAX = 2**63 - 1
_I64_MIN = -(2**63)


def column_stats(arr: pa.ChunkedArray | pa.Array) -> dict:
    """JSON-safe partial stats for one column chunk."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    stats: dict = {
        "count": len(arr),
        "null_count": arr.null_count,
    }
    if len(arr) == arr.null_count:
        return stats
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        mm = pc.min_max(arr)
        stats["min"] = mm["min"].as_py()
        stats["max"] = mm["max"].as_py()
        s = pc.sum(arr)
        total = s.as_py()
        if pa.types.is_integer(t) and total is not None and not (_I64_MIN <= total <= _I64_MAX):
            total = None  # overflow → null, like the reference
        stats["sum"] = total
    elif pa.types.is_boolean(t):
        stats["true_count"] = pc.sum(arr.cast(pa.int64())).as_py() or 0
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        mm = pc.min_max(arr)
        stats["min"] = mm["min"].as_py()
        stats["max"] = mm["max"].as_py()
        stats["sum"] = pc.sum(pc.utf8_length(arr)).as_py()  # total char length
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        stats["sum"] = pc.sum(pc.binary_length(arr)).as_py()
    elif pa.types.is_decimal(t):
        import math

        mm = pc.min_max(arr)
        # float() rounds to nearest, which for >15-digit decimals can push
        # the stored min ABOVE the true min (or max below true max) and make
        # predicate pushdown silently prune a matching stripe — widen each
        # bound by one ULP outward so the footer range always contains the
        # true range
        stats["min"] = math.nextafter(float(mm["min"].as_py()), -math.inf)
        stats["max"] = math.nextafter(float(mm["max"].as_py()), math.inf)
    elif pa.types.is_timestamp(t) or pa.types.is_date(t):
        mm = pc.min_max(arr)
        try:
            stats["min"] = str(mm["min"].as_py())
            stats["max"] = str(mm["max"].as_py())
        except (OverflowError, ValueError):
            # outside Python datetime's year range → store raw epoch units;
            # predicate comparisons vs string literals then degrade to
            # conservative no-prune (maybe_satisfies catches the TypeError)
            stats["min"] = mm["min"].value
            stats["max"] = mm["max"].value
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        lens = pc.list_value_length(arr)
        stats["sum"] = pc.sum(lens).as_py()  # total element count
        mm = pc.min_max(lens)
        stats["min_len"] = mm["min"].as_py()
        stats["max_len"] = mm["max"].as_py()
    return stats


_CMP_KERNELS = None


def compare_mask(col, op: str, lit):
    """Arrow comparison kernel with literal coercion: when no kernel exists
    for (column type, literal type) — e.g. a timestamp column vs an
    ISO-string literal — cast the literal to the column's type and retry,
    so ONE literal form (ISO string or datetime) works end-to-end for both
    footer-stat pruning and the exact row filter."""
    global _CMP_KERNELS
    if _CMP_KERNELS is None:
        _CMP_KERNELS = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater,
                        ">=": pc.greater_equal, "==": pc.equal,
                        "!=": pc.not_equal}
    fn = _CMP_KERNELS[op]
    try:
        return fn(col, pa.scalar(lit))
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
        t = col.type
        # cast fallback ONLY for temporal columns: elsewhere an incomparable
        # literal keeps its documented degrade-to-no-refinement behavior
        # (a blanket cast would silently turn e.g. int-vs-string into a
        # lexicographic compare)
        if not (pa.types.is_timestamp(t) or pa.types.is_date(t)
                or pa.types.is_time(t)):
            raise
        return fn(col, pa.scalar(lit).cast(t))


import re as _re

_TEMPORAL_PREFIX = _re.compile(r"^\d{4}-\d{2}-\d{2}")


def _parse_temporal(v):
    import datetime as dt

    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, dt.date):
        return dt.datetime.combine(v, dt.time())
    return dt.datetime.fromisoformat(v)  # accepts ' ' and 'T', opt. fraction


def maybe_satisfies(stats: dict, op: str, lit) -> bool:
    """Can any value in [min, max] satisfy ``value <op> lit``? Missing stats
    or an incomparable literal degrade to conservative True (no pruning).

    Temporal columns store min/max as strings (str(datetime): space
    separator, microseconds omitted when zero) — compared as raw strings, a
    'T'-separated or '.000000'-suffixed literal would order WRONG, so when
    both bounds look temporal all three values are parsed to datetimes
    before comparing; an unparsable literal falls back to no-prune."""
    lo, hi = stats.get("min"), stats.get("max")
    if lo is None or hi is None:
        return True
    if (isinstance(lo, str) and isinstance(hi, str)
            and _TEMPORAL_PREFIX.match(lo) and _TEMPORAL_PREFIX.match(hi)):
        try:
            lo, hi, lit = _parse_temporal(lo), _parse_temporal(hi), _parse_temporal(lit)
        except (TypeError, ValueError):
            pass  # incomparable forms fall through to the outer guard
    try:
        if op == "<":
            return lo < lit
        if op == "<=":
            return lo <= lit
        if op == ">":
            return hi > lit
        if op == ">=":
            return hi >= lit
        if op == "==":
            return lo <= lit <= hi
        return not (lo == hi == lit)  # !=
    except TypeError:
        return True


def merge_stats(a: dict | None, b: dict | None) -> dict:
    """Associative merge of two partial stats dicts (stripe → file roll-up)."""
    if a is None:
        return dict(b or {})
    if b is None:
        return dict(a)
    out = {
        "count": a.get("count", 0) + b.get("count", 0),
        "null_count": a.get("null_count", 0) + b.get("null_count", 0),
    }
    for key, fn in (("min", min), ("max", max), ("min_len", min), ("max_len", max)):
        va, vb = a.get(key), b.get(key)
        present = [v for v in (va, vb) if v is not None]
        if present:
            try:
                out[key] = fn(present) if len(present) == 2 else present[0]
            except TypeError:
                # mixed stat forms (e.g. one stripe's timestamps stored as
                # ISO strings, another's as the extreme-value int fallback)
                # → drop the bound; absent stats mean conservative no-prune
                pass
    if "sum" in a or "sum" in b:
        sa, sb = a.get("sum"), b.get("sum")
        if sa is None and "sum" in a or sb is None and "sum" in b:
            out["sum"] = None  # overflow poisoning propagates
        else:
            total = (sa or 0) + (sb or 0)
            out["sum"] = total if isinstance(total, float) or _I64_MIN <= total <= _I64_MAX else None
    if "true_count" in a or "true_count" in b:
        out["true_count"] = a.get("true_count", 0) + b.get("true_count", 0)
    return out
