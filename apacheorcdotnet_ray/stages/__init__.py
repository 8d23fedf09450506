"""map_batches callables: encode/decode stages for Ray Data pipelines."""

from .encode import StripeEncoder  # noqa: F401
from .decode import StripeDecoder  # noqa: F401
