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


def block_offsets(data: bytes) -> list[int]:
    """Byte offsets of each framed block's 3-byte header within ``data`` —
    a cheap header walk (no decompression). Block i holds raw bytes
    [i*block_size, (i+1)*block_size) because ``compress`` chunks its input
    at exactly block_size (the stored-original rule preserves raw size)."""
    offs = []
    pos = 0
    n = len(data)
    while pos < n:
        offs.append(pos)
        raw = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3 + (raw >> 1)
    return offs


def decompress_range(
    data: bytes, raw_start: int, raw_len: int, codec: str = "zlib",
    block_size: int = 256 * 1024, cache: dict | None = None,
    io_stats: dict | None = None, offsets: list[int] | None = None,
) -> bytes:
    """Decompress only the framed blocks covering raw bytes
    [raw_start, raw_start + raw_len) — the seek primitive behind shared-
    stream ROW_INDEX positions (a stride read touches its blocks, never the
    whole stream). ``cache`` (block_idx → raw bytes) lets a caller decoding
    several strides of one stream decompress each block once; ``io_stats``
    accounts bytes_read/bytes_decompressed per NEW block touched."""
    if raw_len == 0:
        return b""
    if offsets is None:
        offsets = block_offsets(data)
    first = raw_start // block_size
    last = (raw_start + raw_len - 1) // block_size
    parts = []
    for bi in range(first, last + 1):
        blk = cache.get(bi) if cache is not None else None
        if blk is None:
            pos = offsets[bi]
            hdr = int.from_bytes(data[pos : pos + 3], "little")
            payload = data[pos + 3 : pos + 3 + (hdr >> 1)]
            blk = payload if hdr & 1 else _decompress_block(payload, codec)
            if cache is not None:
                cache[bi] = blk
            if io_stats is not None:
                io_stats["bytes_read"] = io_stats.get("bytes_read", 0) + len(payload) + 3
                io_stats["bytes_decompressed"] = (
                    io_stats.get("bytes_decompressed", 0) + len(blk))
        parts.append(blk)
    joined = parts[0] if len(parts) == 1 else b"".join(parts)
    lo = raw_start - first * block_size
    return joined[lo : lo + raw_len]
