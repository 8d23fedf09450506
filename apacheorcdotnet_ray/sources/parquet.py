"""read_parquet with schema metadata stripped.

pandas-written parquet embeds a ``b"pandas"`` schema-metadata blob; a
``pyarrow.Schema`` carrying ANY metadata is unhashable (``hash(schema)``
raises ``unhashable type: 'dict'``), which defeats Ray Data's block-schema
deduplication and spams "Failed to hash the schemas" warnings on every
multi-block unify. Passing an explicitly stripped schema to
``read_parquet`` makes every downstream block carry the clean (hashable)
schema with no extra pipeline stage.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def strip_metadata(schema: pa.Schema) -> pa.Schema:
    if schema.metadata is None and not any(f.metadata for f in schema):
        return schema
    return pa.schema([f.remove_metadata() for f in schema])


def read_parquet_clean(paths, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    import pyarrow.parquet as pq

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    schema = strip_metadata(pq.read_schema(first))
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(paths, columns=columns, schema=schema, **kwargs)
