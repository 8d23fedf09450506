"""Block-compression framing — reimplements the reference's compressed-buffer
container (/root/reference/src/ApacheOrcDotNet/Compression/OrcCompressedStream.cs:49-107,
OrcCompressedBuffer.cs:35-59): data is chunked into `block_size` blocks, each
raw-DEFLATE-compressed, preceded by a 3-byte little-endian header
``(block_len << 1) | is_original`` where is_original=1 means stored
uncompressed (store-if-bigger rule — it matters for size parity)."""

from __future__ import annotations

import zlib

_MAX_BLOCK = 0x7FFFFF


def compress(data: bytes, block_size: int = 256 * 1024, level: int = 1) -> bytes:
    out = bytearray()
    for start in range(0, len(data), block_size):
        block = data[start : start + block_size]
        comp = zlib.compressobj(level, zlib.DEFLATED, -15)
        cdata = comp.compress(block) + comp.flush()
        if len(cdata) >= len(block):
            header = (len(block) << 1) | 1
            payload = block
        else:
            header = len(cdata) << 1
            payload = cdata
        if len(payload) > _MAX_BLOCK:
            raise OverflowError("compressed block larger than 8MB")
        out.extend(header.to_bytes(3, "little"))
        out.extend(payload)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        raw = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        block_len = raw >> 1
        block = data[pos : pos + block_len]
        pos += block_len
        if raw & 1:  # stored original
            out.extend(block)
        else:
            out.extend(zlib.decompress(block, -15))
    return bytes(out)
