"""Sources: stripe-directory reader + deterministic corpus synthesizers."""

from .stripes import read_stripes  # noqa: F401
from .tokens import generate_tokens_shard, write_tokens_corpus  # noqa: F401
