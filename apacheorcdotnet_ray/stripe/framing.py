"""Block-compression framing — reimplements the reference's compressed-buffer
container (/root/reference/src/ApacheOrcDotNet/Compression/OrcCompressedStream.cs:49-107,
OrcCompressedBuffer.cs:35-59): data is chunked into `block_size` blocks, each
raw-DEFLATE-compressed, preceded by a 3-byte little-endian header
``(block_len << 1) | is_original`` where is_original=1 means stored
uncompressed (store-if-bigger rule — it matters for size parity)."""

from __future__ import annotations

import zlib

_MAX_BLOCK = 0x7FFFFF


def _compress_block(block: bytes, codec: str, level: int) -> bytes:
    if codec == "zlib":
        comp = zlib.compressobj(level, zlib.DEFLATED, -15)
        return comp.compress(block) + comp.flush()
    if codec == "zstd":
        import pyarrow as pa

        # pyarrow's zstd decompress requires the decompressed size, so zstd
        # blocks carry a 3-byte little-endian raw-length prefix (counted in
        # the store-if-bigger comparison)
        z = pa.Codec("zstd", compression_level=level).compress(block, asbytes=True)
        return len(block).to_bytes(3, "little") + z
    raise ValueError(f"unknown framing codec {codec}")


def _decompress_block(block: bytes, codec: str) -> bytes:
    if codec == "zlib":
        return zlib.decompress(block, -15)
    if codec == "zstd":
        import pyarrow as pa

        raw_len = int.from_bytes(block[:3], "little")
        return pa.Codec("zstd").decompress(block[3:], raw_len, asbytes=True)
    raise ValueError(f"unknown framing codec {codec}")


def compress(data: bytes, block_size: int = 256 * 1024, level: int = 1,
             codec: str = "zlib") -> bytes:
    out = bytearray()
    for start in range(0, len(data), block_size):
        block = data[start : start + block_size]
        cdata = _compress_block(block, codec, level)
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


def decompress(data: bytes, codec: str = "zlib") -> bytes:
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
            out.extend(_decompress_block(block, codec))
    return bytes(out)
