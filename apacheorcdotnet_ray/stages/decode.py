"""StripeDecoder — stateless decode stage for `map_batches`.

Input batches carry stripe file contents (from ``ray.data.read_binary_files``)
or paths; output is the decoded Arrow table. The analog of the reference's
read path (OrcReader.cs:18-47) except we never materialize rows — streams
decode straight into Arrow arrays (values+offsets+validity), cf. SURVEY.md §2.4 T5.
"""

from __future__ import annotations

import pyarrow as pa

from ..stripe.container import decode_stripe


class StripeDecoder:
    def __init__(self, columns: list[str] | None = None,
                 predicate: tuple | None = None):
        self.columns = columns
        # (col, op, lit): on row-indexed stripes, skips non-qualifying
        # strides before decompression; caller still applies the exact filter
        self.predicate = predicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "bytes" in batch.column_names:
            blobs = batch.column("bytes").to_pylist()
        else:  # paths only
            blobs = []
            for p in batch.column("path").to_pylist():
                with open(p, "rb") as f:
                    blobs.append(f.read())
        tables = [decode_stripe(b, columns=self.columns, predicate=self.predicate)
                  for b in blobs]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)
