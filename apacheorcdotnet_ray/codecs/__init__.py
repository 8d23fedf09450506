"""Pure NumPy codec kernels (no Ray dependencies)."""

from . import bitpack, bool_rle, byte_rle, rlev2  # noqa: F401
