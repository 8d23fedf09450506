"""User-facing Ray Data pipelines."""

from .encode import decode_dataset, encode_corpus, encode_dataset  # noqa: F401
from .verify import verify_roundtrip  # noqa: F401
