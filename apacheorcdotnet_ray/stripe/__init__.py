"""Stripe container: column-stream layout, codec selection, footer, framing."""

from .config import EncodeConfig  # noqa: F401
from .container import decode_stripe, encode_stripe, read_footer  # noqa: F401
