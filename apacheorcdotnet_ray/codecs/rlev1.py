"""ORC integer Run-Length Encoding version 1 (pre-Hive-0.12 files).

Public-spec layout (apache.org/orc/specification, "Integer RLE v1"):

- run:      control byte 0..127 = run_length - 3, then one SIGNED delta
            byte, then the base value varint → base, base+delta, ...
- literals: control byte as signed int8 in -1..-128 = -count, then that
            many varints.

Signed columns zigzag each varint. The reference reads v1 via
``IntegerRunLengthEncodingV1Reader.cs``; this repo needs it only to DECODE
old third-party files (``sources/orc_reader``) — the writer always emits v2
— but an encoder is included so the property suite can round-trip.

Spec example vectors pin the byte format in ``tests/test_rlev1.py``:
100 copies of 7 → ``61 00 07``; literals [2,3,6,7,11] → ``fb 02 03 06 07 0b``.
"""

from __future__ import annotations

import numpy as np

from .bitpack import I64, U64, zigzag_decode, zigzag_encode


def _read_varint_u64(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7


def _write_varint_u64(out: bytearray, v: int) -> None:
    v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode(buf: bytes, signed: bool, expected_count: int | None = None) -> np.ndarray:
    out: list[np.ndarray] = []
    pos = 0
    n = len(buf)
    while pos < n:
        ctrl = buf[pos]
        pos += 1
        if ctrl < 0x80:  # run
            length = ctrl + 3
            delta = (buf[pos] ^ 0x80) - 0x80  # signed int8
            pos += 1
            base, pos = _read_varint_u64(buf, pos)
            with np.errstate(over="ignore"):
                steps = (np.arange(length, dtype=np.int64)
                         * np.int64(delta)).view(U64)
                vals = np.uint64(base) + steps
            out.append(vals)
        else:  # literals
            count = 256 - ctrl
            vals = np.empty(count, dtype=np.uint64)
            for i in range(count):
                v, pos = _read_varint_u64(buf, pos)
                vals[i] = v
            out.append(vals)
    flat = np.concatenate(out) if out else np.empty(0, dtype=np.uint64)
    if expected_count is not None and len(flat) != expected_count:
        raise ValueError(
            f"RLEv1 stream decoded {len(flat)} values, expected {expected_count}")
    return zigzag_decode(flat.view(I64)) if signed else flat.view(I64)


def encode(values: np.ndarray, signed: bool) -> bytes:
    """Simple spec-conformant v1 encoder (runs of constant delta in
    [-128, 127] and length 3..130; varint literals otherwise). Exists for
    round-trip tests — production writes are always RLEv2."""
    v = np.ascontiguousarray(values, dtype=I64)
    zz = (zigzag_encode(v) if signed else v).view(U64)
    out = bytearray()
    i = 0
    n = len(zz)
    lit_start = 0

    def flush_literals(upto: int) -> None:
        nonlocal lit_start
        j = lit_start
        while j < upto:
            cnt = min(128, upto - j)
            out.append(256 - cnt)
            for k in range(cnt):
                _write_varint_u64(out, int(zz[j + k]))
            j += cnt
        lit_start = upto

    # wraparound diffs once, vectorized (avoids per-element overflow noise)
    with np.errstate(over="ignore"):
        diffs = np.diff(zz.view(I64)) if n > 1 else np.empty(0, I64)
    while i < n:
        run_len = 1
        delta = 0
        if i + 1 < n:
            d = int(diffs[i])
            if -128 <= d <= 127:
                delta = d
                while (i + run_len < n and run_len < 130
                       and int(diffs[i + run_len - 1]) == delta):
                    run_len += 1
        if run_len >= 3:
            flush_literals(i)
            out.append(run_len - 3)
            out.append(delta & 0xFF)
            _write_varint_u64(out, int(zz[i]))
            i += run_len
            lit_start = i
        else:
            i += 1
    flush_literals(n)
    return bytes(out)
