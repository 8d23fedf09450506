"""ORC RLEv2 integer codec — vectorized, bit-exact with the reference.

Reimplements the greedy 512-value-window codec auto-selection cascade of
``/root/reference/src/ApacheOrcDotNet/Encodings/IntegerRunLengthEncodingV2Writer.cs``
(SHORT_REPEAT → DELTA → PATCHED_BASE → DIRECT) and its reader
(``IntegerRunLengthEncodingV2Reader.cs``), producing byte-identical output so
that our compressed sizes equal the reference's by construction.

Inner math is NumPy over whole windows; the only Python-level loop is per
encoded run (≤512 values each). Golden byte vectors from
``IntegerRunLengthEncodingV2_Test.cs`` are ported to ``tests/test_rlev2.py``.
"""

from __future__ import annotations

import numpy as np

from .bitpack import (
    I64,
    U64,
    _ALIGNED_TABLE,
    _DECODE_DIRECT,
    _ENCODED_OF_NEAREST,
    _MASK64,
    _NEAREST_TABLE,
    bit_widths,
    bits_for_percentile,
    encode_direct_width,
    decode_direct_width,
    find_nearest_aligned_direct_width,
    find_nearest_direct_width,
    histogram_of_bit_widths,
    num_bits,
    pack_bits,
    read_long_be,
    read_varint_signed,
    read_varint_unsigned,
    subtraction_would_overflow,
    unpack_bits,
    write_long_be,
    write_varint_signed,
    write_varint_unsigned,
    zigzag_decode,
    zigzag_encode,
    zigzag_encode_scalar,
)

_WINDOW = 512
_MAX_BATCH = 256  # windows analyzed per vectorized pass (128k values)
_DECODE_ARR = np.array(_DECODE_DIRECT, dtype=np.int64)


def encode(values: np.ndarray, signed: bool, aligned: bool = False) -> bytes:
    """Encode int64 values with ORC RLEv2. Byte-identical to the reference writer.

    Fast path: SHORT_REPEAT is the only sub-mode that consumes fewer than 512
    values (Writer.cs:19-28 feeds the consumed run length back into the scan),
    so window boundaries stay 512-aligned until one fires — all per-window
    stats (min/max/deltas/bit-width histograms) are computed vectorized across
    up to ``_MAX_BATCH`` windows at once, and the scalar path only handles
    short-repeat runs and the final partial window.
    """
    v = np.ascontiguousarray(values, dtype=I64)
    out = bytearray()
    pos = 0
    n = len(v)
    zz_all = (zigzag_encode(v) if signed else v).view(U64)
    while pos < n:
        if n - pos >= _WINDOW:
            consumed = _encode_batch(out, v, zz_all, pos, signed, aligned)
            if consumed:
                pos += consumed
                continue
            # first window starts with a 3..10 repeat → vectorized SR stream
            consumed = _encode_sr_stream(out, v, zz_all, pos, n)
            if consumed:
                pos += consumed
                continue
        consumed = _encode_window(out, v[pos : pos + _WINDOW], signed, aligned)
        pos += consumed
    return bytes(out)


def _encode_sr_stream(
    out: bytearray, v: np.ndarray, zz_all: np.ndarray, pos: int, n: int
) -> int:
    """Emit consecutive SHORT_REPEAT runs vectorized: while the leading run at
    the scan position is 3..10 long, the window encoder consumes exactly that
    run (Writer.cs:52-59), so a maximal-run scan emits them all in one pass.
    Stops at the first run outside [3,10] (the caller's window logic resumes
    there) or at a lookahead-truncated run (next call re-examines it)."""
    look = v[pos : pos + (1 << 13)]  # bounded: re-scanned when SR and batch
    # encoding interleave, so the lookahead cost must stay proportional
    change = np.nonzero(look[1:] != look[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    lens = np.diff(np.concatenate([starts, [len(look)]]))
    truncated_last = pos + len(look) < n  # final run may continue beyond lookahead
    ok = (lens >= 3) & (lens <= 10)
    if truncated_last:
        ok[-1] = False
    stop = int(np.argmin(ok)) if not ok.all() else len(ok)
    if stop == 0:
        return 0
    run_starts = starts[:stop]
    run_lens = lens[:stop]
    vals = zz_all[pos + run_starts]
    nb = np.maximum((bit_widths(vals) + 7) // 8, 1)
    out_offs = np.concatenate([[0], np.cumsum(nb + 1)])
    buf = np.empty(int(out_offs[-1]), dtype=np.uint8)
    buf[out_offs[:-1]] = ((nb - 1) << 3) | (run_lens - 3)
    for b in range(8):
        mask = nb > b
        if not mask.any():
            break
        shift = ((nb[mask] - 1 - b) * 8).astype(np.uint64)
        buf[out_offs[:-1][mask] + 1 + b] = ((vals[mask] >> shift) & np.uint64(0xFF)).astype(np.uint8)
    out.extend(buf.tobytes())
    return int(run_starts[-1] + run_lens[-1])


def _encode_batch(
    out: bytearray, v: np.ndarray, zz_all: np.ndarray, pos: int, signed: bool, aligned: bool
) -> int:
    """Vectorized window classification + emission for 512-aligned full windows
    starting at ``pos``. Returns values consumed (0 → caller uses scalar path).
    Bit-exact with _encode_window: same cascade, same stats."""
    n = len(v)
    nw = min((n - pos) // _WINDOW, _MAX_BATCH)
    W = v[pos : pos + nw * _WINDOW].reshape(nw, _WINDOW)
    # leading-repeat length per window, bounded scan (Writer.cs:52-59)
    neq = W[:, :11] != W[:, :1]
    any_neq = neq.any(axis=1)
    rep = np.where(any_neq, neq.argmax(axis=1), 11)
    sr = (rep >= 3) & (rep <= 10)
    limit = int(sr.argmax()) if sr.any() else nw
    if limit == 0:
        return 0
    Wl = W[:limit]
    ZZl = zz_all[pos : pos + limit * _WINDOW].reshape(limit, _WINDOW)
    mins = Wl.min(axis=1)
    maxs = Wl.max(axis=1)
    with np.errstate(over="ignore"):
        diff = maxs - mins
        D = Wl[:, 1:] - Wl[:, :-1]
        absD = np.abs(D)
    ovf = ((maxs ^ mins) < 0) & ((maxs ^ diff) < 0)
    d0 = D[:, 0]
    fixed = maxs == mins
    constd = (D == D[:, :1]).all(axis=1)
    inc = (D >= 0).all(axis=1) & (d0 > 0)
    dec = (D <= 0).all(axis=1) & (d0 < 0)
    # per-window bit-width histograms in one bincount (BitManipulation.cs:115-146)
    enc_w = _ENCODED_OF_NEAREST[bit_widths(ZZl.ravel())]
    hist = np.bincount(
        enc_w + 32 * np.repeat(np.arange(limit), _WINDOW), minlength=limit * 32
    ).reshape(limit, 32)
    revc = np.cumsum(hist[:, ::-1], axis=1)
    bits100 = _DECODE_ARR[31 - (revc > 0).argmax(axis=1)]
    drop90 = int(_WINDOW * (1.0 - 0.9))
    bits90 = _DECODE_ARR[31 - (revc > drop90).argmax(axis=1)]

    # batched base-reduced percentiles for the PATCHED_BASE candidates
    # (Writer.cs:74-85): only windows that fail every earlier check and have
    # a 90th/100th percentile width gap
    is_delta = ~ovf & (fixed | constd | inc | dec)
    pb_cand = ~ovf & ~is_delta & (bits100 != bits90)
    pb_idx = np.nonzero(pb_cand)[0]
    br100 = br95 = BR = None
    pb_pos = np.full(limit, -1, dtype=np.int64)
    is_patch = np.zeros(limit, dtype=bool)
    if len(pb_idx):
        pb_pos[pb_idx] = np.arange(len(pb_idx))
        with np.errstate(over="ignore"):
            BR = (Wl[pb_idx] - mins[pb_idx, None]).view(U64)
        benc = _ENCODED_OF_NEAREST[bit_widths(BR.ravel())]
        bhist = np.bincount(
            benc + 32 * np.repeat(np.arange(len(pb_idx)), _WINDOW),
            minlength=len(pb_idx) * 32,
        ).reshape(len(pb_idx), 32)
        brevc = np.cumsum(bhist[:, ::-1], axis=1)
        br100 = _DECODE_ARR[31 - (brevc > 0).argmax(axis=1)]
        drop95 = int(_WINDOW * (1.0 - 0.95))
        br95 = _DECODE_ARR[31 - (brevc > drop95).argmax(axis=1)]
        is_patch[pb_idx] = br100 != br95

    # group-pack DIRECT payloads by bit width: a 512-value window at width w
    # packs to exactly 64*w bytes, so one pack_bits call serves a whole group
    is_direct = ~is_delta & ~is_patch
    wdir = (_ALIGNED_TABLE if aligned else _NEAREST_TABLE)[bits100]
    payloads: dict[int, bytes] = {}
    di = np.nonzero(is_direct)[0]
    if len(di):
        for wbits in np.unique(wdir[di]).tolist():
            rows = di[wdir[di] == wbits]
            packed = pack_bits(ZZl[rows].ravel(), wbits)
            sz = 64 * wbits
            for j, r in enumerate(rows.tolist()):
                payloads[r] = packed[j * sz : (j + 1) * sz]

    for i in range(limit):
        if is_direct[i]:
            wbits = int(wdir[i])
            enc_w = encode_direct_width(wbits)
            out.append((0x1 << 6) | ((enc_w & 0x1F) << 1) | ((_WINDOW - 1) >> 8))
            out.append((_WINDOW - 1) & 0xFF)
            out.extend(payloads[i])
        elif fixed[i]:
            _delta_encode(out, int(mins[i]), signed, _WINDOW, [0], 0)
        elif constd[i]:
            _delta_encode(out, int(Wl[i, 0]), signed, _WINDOW, [int(d0[i])], 0)
        elif inc[i] or dec[i]:
            bits = num_bits(int(absD[i, 1:].max()))
            bits = (
                find_nearest_aligned_direct_width(bits)
                if aligned
                else find_nearest_direct_width(bits)
            )
            packed_deltas = np.concatenate([[d0[i]], absD[i, 1:]]).astype(I64)
            _delta_encode(out, int(Wl[i, 0]), signed, _WINDOW, packed_deltas, bits)
        else:
            k = pb_pos[i]
            _patch_encode(out, int(mins[i]), BR[k].copy(), int(br100[k]), int(br95[k]))
    return limit * _WINDOW


def _encode_window(out: bytearray, w: np.ndarray, signed: bool, aligned: bool) -> int:
    n = len(w)
    # Writer.cs:45-50 — too short for anything but DIRECT
    if n <= 3:
        zz = zigzag_encode(w) if signed else w
        _direct_encode(out, zz.view(U64), n, aligned, None)
        return n

    # Writer.cs:52-59 — SHORT_REPEAT for 3..10 leading repeats (a leading run
    # of 11+ can never be SHORT_REPEAT, so scanning the first 11 values is exact)
    head = w[:11]
    neq = head != w[0]
    rep = int(np.argmax(neq)) if neq.any() else len(head)
    if 3 <= rep <= 10:
        val = zigzag_encode_scalar(int(w[0])) if signed else int(w[0]) & _MASK64
        _short_repeat_encode(out, val, rep)
        return rep

    # Writer.cs:61-72 — DELTA attempt over the whole window
    with np.errstate(over="ignore"):
        deltas = w[1:] - w[:-1]
    minv = int(w.min())
    maxv = int(w.max())
    if subtraction_would_overflow(maxv, minv):
        zz = zigzag_encode(w) if signed else w
        _direct_encode(out, zz.view(U64), n, aligned, None)
        return n

    d0 = int(deltas[0])
    if maxv == minv:  # all values after the first were identical → fixed delta 0
        _delta_encode(out, minv, signed, n, [0], 0)
        return n
    if bool(np.all(deltas == deltas[0])):  # constant delta
        _delta_encode(out, int(w[0]), signed, n, [d0], 0)
        return n
    is_increasing = d0 > 0 and bool(np.all(deltas >= 0))
    is_decreasing = d0 < 0 and bool(np.all(deltas <= 0))
    if is_increasing or is_decreasing:
        with np.errstate(over="ignore"):
            abs_d = np.abs(deltas)
        delta_max = int(abs_d[1:].max()) if n > 2 else 0
        bits = num_bits(delta_max)
        bits = (
            find_nearest_aligned_direct_width(bits)
            if aligned
            else find_nearest_direct_width(bits)
        )
        packed_deltas = np.concatenate([[d0], abs_d[1:]]).astype(I64)
        _delta_encode(out, int(w[0]), signed, n, packed_deltas, bits)
        return n

    # Writer.cs:74-85 — PATCHED_BASE attempt, else DIRECT
    zz = (zigzag_encode(w) if signed else w).view(U64)
    fixed_bit_width = None
    total, hist = histogram_of_bit_widths(zz)
    bits100 = bits_for_percentile(total, hist, 1.0)
    fixed_bit_width = bits100
    bits90 = bits_for_percentile(total, hist, 0.9)
    if bits100 - bits90 != 0:
        with np.errstate(over="ignore"):
            base_reduced = (w - np.int64(minv)).view(U64)
        btotal, bhist = histogram_of_bit_widths(base_reduced)
        br100 = bits_for_percentile(btotal, bhist, 1.0)
        br95 = bits_for_percentile(btotal, bhist, 0.95)
        if br100 - br95 != 0:
            _patch_encode(out, minv, base_reduced.copy(), br100, br95)
            return n

    _direct_encode(out, zz, n, aligned, fixed_bit_width)
    return n


def _direct_encode(
    out: bytearray, values_u64: np.ndarray, n: int, aligned: bool, fixed_bit_width
) -> None:
    """Writer.cs:234-260."""
    if fixed_bit_width is None:
        total, hist = histogram_of_bit_widths(values_u64)
        fixed_bit_width = bits_for_percentile(total, hist, 1.0)
    if aligned:
        fixed_bit_width = find_nearest_aligned_direct_width(fixed_bit_width)
    else:
        fixed_bit_width = find_nearest_direct_width(fixed_bit_width)
    enc_w = encode_direct_width(fixed_bit_width)
    byte1 = (0x1 << 6) | ((enc_w & 0x1F) << 1) | ((n - 1) >> 8)
    out.append(byte1)
    out.append((n - 1) & 0xFF)
    out.extend(pack_bits(values_u64, fixed_bit_width))


def _short_repeat_encode(out: bytearray, value_u64: int, repeat_count: int) -> None:
    """Writer.cs:262-276."""
    bits = find_nearest_direct_width(num_bits(value_u64))
    width = (bits + 7) // 8
    out.append(((width - 1) << 3) | (repeat_count - 3))
    write_long_be(out, width, value_u64)


def _delta_encode(
    out: bytearray, initial: int, signed: bool, n: int, deltas, delta_bit_width: int
) -> None:
    """Writer.cs:288-310. deltas[0] is the signed delta base; deltas[1:] are abs."""
    if delta_bit_width == 1:
        delta_bit_width = 2  # width 1 is reserved for constant run-lengths
    enc_w = encode_direct_width(delta_bit_width) if delta_bit_width > 1 else 0
    byte1 = (0x3 << 6) | ((enc_w & 0x1F) << 1) | ((n - 1) >> 8)
    out.append(byte1)
    out.append((n - 1) & 0xFF)
    if signed:
        write_varint_signed(out, initial)
    else:
        write_varint_unsigned(out, initial)
    write_varint_signed(out, int(deltas[0]))
    if len(deltas) > 1:
        out.extend(pack_bits(np.asarray(deltas[1:], dtype=I64).view(U64), delta_bit_width))


def _patch_encode(
    out: bytearray, base_value: int, base_reduced: np.ndarray, w100: int, w95: int
) -> None:
    """Writer.cs:312-415 — frame-of-reference with exception patch list."""
    base_is_negative = base_value < 0
    if base_is_negative:
        base_value = -base_value
    num_bits_base = num_bits(base_value) + 1  # +1 sign bit
    num_bytes_base = (num_bits_base + 7) // 8
    if base_is_negative:
        base_value |= 1 << ((num_bytes_base * 8) - 1)

    patch_bit_width = find_nearest_direct_width(w100 - w95)
    reduced_bit_width = w95
    if patch_bit_width == 64:
        patch_bit_width = 56
        reduced_bit_width = 8
    enc_patch_w = encode_direct_width(patch_bit_width)
    value_bit_width = find_nearest_direct_width(reduced_bit_width)
    enc_value_w = encode_direct_width(value_bit_width)

    patch_gap_list, gap_bit_width = _generate_patch_list(
        base_reduced, patch_bit_width, reduced_bit_width
    )
    patch_list_width = find_nearest_direct_width(gap_bit_width + patch_bit_width)

    n = len(base_reduced)
    out.append((0x2 << 6) | ((enc_value_w & 0x1F) << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.append(((num_bytes_base - 1) << 5) | (enc_patch_w & 0x1F))
    out.append(((gap_bit_width - 1) << 5) | (len(patch_gap_list) & 0x1F))
    write_long_be(out, num_bytes_base, base_value)
    out.extend(pack_bits(base_reduced, value_bit_width))
    out.extend(pack_bits(np.asarray(patch_gap_list, dtype=U64), patch_list_width))


def _generate_patch_list(
    base_reduced: np.ndarray, patch_bit_width: int, reduced_bit_width: int
) -> tuple[list[int], int]:
    """Writer.cs:358-415. Mutates base_reduced (masks patched values)."""
    mask = np.uint64((1 << reduced_bit_width) - 1)
    idx = np.nonzero(base_reduced > mask)[0]
    gaps = np.diff(np.concatenate([[0], idx])).astype(np.int64) if len(idx) else np.empty(0, np.int64)
    patches = (base_reduced[idx] >> np.uint64(reduced_bit_width)).astype(U64)
    base_reduced[idx] &= mask
    max_gap = int(gaps.max()) if len(gaps) else 0

    if max_gap == 0 and len(idx) != 0:
        gap_bit_width = 1
    else:
        gap_bit_width = find_nearest_direct_width(num_bits(max_gap))
    actual_length = len(idx)
    if gap_bit_width > 8:
        gap_bit_width = 8  # special case: emit zero-patch links for gaps > 255
        actual_length += 2 if max_gap == 511 else 1

    result: list[int] = []  # uint64 bit patterns (C# long arithmetic wraps)
    for gap, patch in zip(gaps.tolist(), patches.tolist()):
        while gap > 255:
            result.append((255 << patch_bit_width) & _MASK64)
            gap -= 255
        result.append(((gap << patch_bit_width) | int(patch)) & _MASK64)
    assert len(result) == actual_length
    return result, gap_bit_width


# ---------------------------------------------------------------------------
# decoder


def decode(buf: bytes, signed: bool, expected_count: int | None = None) -> np.ndarray:
    """Decode RLEv2 bytes to int64. Consumes the entire buffer (or stops once
    expected_count values are produced). Reference: IntegerRunLengthEncodingV2Reader.cs."""
    values, pos = decode_from(buf, 0, signed, expected_count)
    if expected_count is None and pos != len(buf):
        raise ValueError(f"RLEv2 decode consumed {pos} of {len(buf)} bytes")
    return values


def decode_from(
    buf: bytes, pos: int, signed: bool, expected_count: int | None = None,
    allow_overshoot: bool = False,
) -> tuple[np.ndarray, int]:
    """Decode starting at ``pos``. With ``expected_count`` the loop stops
    once that many values are available; ``allow_overshoot`` tolerates the
    final run producing MORE than requested (an ORC ROW_INDEX seek into a
    foreign writer's stream lands on a run header that can span a
    row-group boundary — the caller slices). Without it a count mismatch
    raises (the native container's segments are exact)."""
    chunks: list[np.ndarray] = []
    total = 0
    end = len(buf)
    # consecutive SHORT_REPEAT runs batch into one np.repeat (run-heavy
    # streams would otherwise pay one np.full per 3-10 values)
    sr_vals: list[int] = []
    sr_reps: list[int] = []
    sr_pending = 0

    def flush_sr():
        nonlocal total, sr_pending
        if not sr_vals:
            return
        raw = np.array(sr_vals, dtype=U64)
        vals = zigzag_decode(raw.view(I64)) if signed else raw.view(I64)
        arr = np.repeat(vals, sr_reps)
        chunks.append(arr)
        total += len(arr)
        sr_vals.clear()
        sr_reps.clear()
        sr_pending = 0

    while pos < end and (expected_count is None or total + sr_pending < expected_count):
        first = buf[pos]
        pos += 1
        etype = (first >> 6) & 0x3
        if etype == 0:
            width = ((first >> 3) & 0x7) + 1
            sr_vals.append(int.from_bytes(buf[pos : pos + width], "big"))
            rep = (first & 0x7) + 3
            sr_reps.append(rep)
            sr_pending += rep
            pos += width
            continue
        flush_sr()
        if etype == 1:
            arr, pos = _read_direct(buf, pos, first, signed)
        elif etype == 2:
            arr, pos = _read_patched_base(buf, pos, first)
        else:
            arr, pos = _read_delta(buf, pos, first, signed)
        chunks.append(arr)
        total += len(arr)
    flush_sr()
    if expected_count is not None and (
            total < expected_count
            or (total != expected_count and not allow_overshoot)):
        raise ValueError(f"RLEv2 decode produced {total} values, expected {expected_count}")
    if not chunks:
        return np.empty(0, dtype=I64), pos
    return np.concatenate(chunks), pos


def _read_short_repeat(buf, pos, first, signed):
    """Reader.cs:53-62."""
    width = ((first >> 3) & 0x7) + 1
    repeat = (first & 0x7) + 3
    value, pos = read_long_be(buf, pos, width)
    if signed:
        value = int(zigzag_decode(np.array([value & _MASK64], dtype=U64).view(I64))[0])
    elif value >> 63:
        value -= 1 << 64
    return np.full(repeat, value, dtype=I64), pos


def _read_direct(buf, pos, first, signed):
    """Reader.cs:64-78."""
    width = decode_direct_width((first >> 1) & 0x1F)
    length = ((first & 0x1) << 8) | buf[pos]
    pos += 1
    length += 1
    raw, consumed = unpack_bits(buf, width, length, pos)
    pos += consumed
    vals = raw.view(I64)
    if signed:
        vals = zigzag_decode(vals)
    return vals, pos


def _read_patched_base(buf, pos, first):
    """Reader.cs:80-149."""
    width = decode_direct_width((first >> 1) & 0x1F)
    length = (((first & 0x1) << 8) | buf[pos]) + 1
    pos += 1
    third = buf[pos]
    pos += 1
    base_value_width = ((third >> 5) & 0x7) + 1
    patch_width = decode_direct_width(third & 0x1F)
    fourth = buf[pos]
    pos += 1
    patch_gap_width = ((fourth >> 5) & 0x7) + 1
    patch_list_length = fourth & 0x1F

    base_value, pos = read_long_be(buf, pos, base_value_width)
    msb_mask = 1 << (base_value_width * 8 - 1)
    if base_value & msb_mask:
        base_value = -(base_value & ~msb_mask)

    data, consumed = unpack_bits(buf, width, length, pos)
    pos += consumed
    if patch_gap_width + patch_width > 64:
        raise ValueError("patchGapWidth + patchWidth > 64")
    patch_list_width = find_nearest_direct_width(patch_width + patch_gap_width)
    patch_list, consumed = unpack_bits(buf, patch_list_width, patch_list_length, pos)
    pos += consumed

    # apply patches (≤31 entries → Python loop is fine)
    patch_mask = (1 << patch_width) - 1
    gap_acc = 0
    data = data.copy()
    for raw in patch_list.tolist():
        cur_gap = raw >> patch_width
        patch = raw & patch_mask
        if cur_gap == 255 and patch == 0:
            gap_acc += 255
            continue
        gap_acc += cur_gap
        data[gap_acc] |= np.uint64(patch << width)
    with np.errstate(over="ignore"):
        result = (data.view(I64) + np.int64(base_value))
    return result, pos


def _read_delta(buf, pos, first, signed):
    """Reader.cs:151-199."""
    enc_w = (first >> 1) & 0x1F
    width = decode_direct_width(enc_w) if enc_w != 0 else 0
    length = ((first & 0x1) << 8) | buf[pos]
    pos += 1
    if signed:
        base, pos = read_varint_signed(buf, pos)
    else:
        base, pos = read_varint_unsigned(buf, pos)
    delta_base, pos = read_varint_signed(buf, pos)
    if width == 0:
        with np.errstate(over="ignore"):
            out = np.int64(base) + np.int64(delta_base) * np.arange(length + 1, dtype=I64)
        return out, pos
    deltas, consumed = unpack_bits(buf, width, length - 1, pos)
    pos += consumed
    sign = 1 if delta_base > 0 else -1
    with np.errstate(over="ignore"):
        steps = np.concatenate(
            [
                np.array([base, delta_base], dtype=I64),
                np.int64(sign) * deltas.view(I64),
            ]
        )
        out = np.cumsum(steps, dtype=I64)
    return out, pos
