"""User-facing Ray Data pipelines."""

from .encode import (  # noqa: F401
    compact_stripes,
    decode_dataset,
    encode_corpus,
    encode_dataset,
    encode_grouped,
)
from .verify import verify_roundtrip  # noqa: F401
