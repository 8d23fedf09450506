"""Targeted Ray Data log hygiene.

Ray's sort-based shuffle (behind ``groupby().map_groups`` and ``Dataset.sort``)
emits EMPTY range partitions as schema-less zero-row blocks; the streaming
executor then warns ``Operator produced a RefBundle with a different schema
... new schema: .`` once per empty partition. Our own stages always return
typed (possibly empty) tables — these bundles never pass through user code,
so they can't be typed from here. The warning is cosmetic (zero-row bundles
carry no data), so entry points opt into suppressing exactly that variant:
only messages whose *new* schema is empty are dropped; a genuine schema
mismatch between non-empty bundles still surfaces.
"""

from __future__ import annotations

import logging


class _EmptySchemaBundleFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: ." in msg
        )


def suppress_empty_schema_warnings() -> None:
    """Install the filter on the emitting logger (idempotent).

    Logger *filters* don't propagate to children, so this targets the exact
    module logger that owns the message rather than the ``ray.data`` root.
    """
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptySchemaBundleFilter) for f in logger.filters):
        logger.addFilter(_EmptySchemaBundleFilter())
