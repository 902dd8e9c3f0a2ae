"""Arrow-native key normalization + row fingerprints (zero per-row Python).

Same contract as keys.py but sourced straight from Arrow buffers, so the
kernel never materializes pandas object arrays for strings.  The string
prefix code is built by vectorized gather over the (offsets, data)
buffers; the row fingerprint folds normalized codes, lengths, and a
position-weighted byte sum — all NumPy array ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .keys import NormalizedKey, _float_to_u64, _int_to_u64

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _chunks(arr) -> list[pa.Array]:
    if isinstance(arr, pa.ChunkedArray):
        return list(arr.chunks)
    return [arr]


def _string_buffers(chunk: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(starts, lens, data) for a string/binary/large_* chunk."""
    t = chunk.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    else:
        odt = np.int32
    bufs = chunk.buffers()
    # buffers: [validity, offsets, data]
    off = np.frombuffer(bufs[1], dtype=odt, count=len(chunk) + 1 + chunk.offset)
    off = off[chunk.offset : chunk.offset + len(chunk) + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    )
    starts = off[:-1]
    lens = off[1:] - starts
    return starts, lens, data


def _string_prefix_u64_chunk(chunk: pa.Array) -> np.ndarray:
    """Vectorized big-endian 8-byte prefix of each value in one chunk."""
    n = len(chunk)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    starts, lens, data = _string_buffers(chunk)
    take = np.minimum(lens, 8)
    buf = np.zeros((n, 8), dtype=np.uint8)
    j = np.arange(8, dtype=np.int64)[None, :]
    mask = j < take[:, None]
    idx = starts[:, None] + j
    buf[mask] = data[idx[mask]]
    return buf.view(">u8").ravel().astype(np.uint64)


def _string_lens(arr) -> np.ndarray:
    parts = []
    for chunk in _chunks(arr):
        if len(chunk) == 0:
            continue
        starts, lens, _ = _string_buffers(chunk)
        parts.append(lens)
    return np.concatenate(parts) if parts else np.zeros(0, np.int64)


def _weighted_byte_sum_chunk(chunk: pa.Array) -> np.ndarray:
    """Per-row position-weighted byte sum (full content, vectorized):
    sum over bytes of data[i] * W[(i - start) mod 16].  Content-sensitive
    beyond the 8-byte prefix; used only for fingerprints."""
    n = len(chunk)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    starts, lens, data = _string_buffers(chunk)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=np.uint64)
    W = np.array(
        [1, 31, 131, 257, 8191, 524287, 2147483647, 3, 7, 127, 911, 5381, 40503,
         69061, 99991, 15485863],
        dtype=np.uint64,
    )
    # explicit gather (safe for sliced/offset layouts)
    row_start = np.cumsum(lens) - lens                # flat start of each row
    pos = np.arange(total, dtype=np.int64) - np.repeat(row_start, lens)
    idx = np.repeat(starts, lens) + pos
    contrib = data[idx].astype(np.uint64) * W[pos & 15]
    sums = np.concatenate([[np.uint64(0)], np.cumsum(contrib, dtype=np.uint64)])
    ends = np.cumsum(lens)
    return (sums[ends] - sums[ends - lens]).astype(np.uint64)


def string_prefix_u64(arr) -> np.ndarray:
    parts = [_string_prefix_u64_chunk(c) for c in _chunks(arr)]
    return np.concatenate(parts) if parts else np.zeros(0, np.uint64)


def normalize_arrow_column(arr) -> NormalizedKey:
    """Arrow column -> uint64 codes (same semantics as keys.normalize_column)."""
    t = arr.type
    isnull = np.asarray(pc.is_null(arr)) if arr.null_count else None
    if pa.types.is_integer(t):
        vals = arr.to_numpy(zero_copy_only=False)
        codes = _int_to_u64(np.nan_to_num(vals) if vals.dtype.kind == "f" else vals)
        return NormalizedKey(codes, True, 64, isnull)
    if pa.types.is_floating(t):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        codes = _float_to_u64(np.nan_to_num(vals, nan=0.0))
        return NormalizedKey(codes, True, 64, isnull)
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        vals = pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
        codes = _int_to_u64(np.nan_to_num(vals))
        return NormalizedKey(codes, True, 64, isnull)
    if pa.types.is_boolean(t):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return NormalizedKey(vals, True, 64, isnull)
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return NormalizedKey(string_prefix_u64(arr), False, 64, isnull)
    raise TypeError(f"unsupported key type {t}")


def key_matrix_table(tbl: pa.Table, key_cols: list[str]) -> tuple[np.ndarray, bool]:
    """(n, k') uint64 matrix + exactness, straight from Arrow buffers."""
    cols = []
    exact = True
    for c in key_cols:
        nk = normalize_arrow_column(tbl.column(c))
        if nk.isnull is not None:
            cols.append((~nk.isnull).astype(np.uint64))
            codes = np.where(nk.isnull, np.uint64(0), nk.codes)
        else:
            codes = nk.codes
        cols.append(codes)
        exact = exact and nk.exact
    if not cols:
        return np.zeros((tbl.num_rows, 0), dtype=np.uint64), True
    return np.column_stack(cols), exact


def row_fingerprint_table(tbl: pa.Table, *, full: bool = False) -> int:
    """Order-independent 64-bit content fingerprint: xor-fold of per-row
    mixed hashes over ALL columns.  Batching-invariant; vectorized.

    Default (fast): normalized codes (8-byte prefix for strings) +
    string lengths — discriminates re-dealt partitions via any unique
    column prefix at ~0 cost.  ``full=True`` additionally folds a
    position-weighted sum over every string byte (content-sensitive past
    the prefix; ~3x the fingerprint cost on text-heavy rows)."""
    n = tbl.num_rows
    if n == 0:
        return 0
    acc = np.full(n, _GOLD, dtype=np.uint64)

    def mix(a, v):
        v = v.astype(np.uint64, copy=False)
        a ^= v + _GOLD + (a << np.uint64(6)) + (a >> np.uint64(2))
        return a

    for name in tbl.schema.names:
        col = tbl.column(name)
        nk = normalize_arrow_column(col)
        acc = mix(acc, nk.codes)
        if nk.isnull is not None:
            acc = mix(acc, nk.isnull.astype(np.uint64))
        t = col.type
        if (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
        ):
            acc = mix(acc, _string_lens(col).astype(np.uint64))
            if full:
                ws = np.concatenate(
                    [_weighted_byte_sum_chunk(c) for c in _chunks(col)]
                ) if col.length() else np.zeros(0, np.uint64)
                acc = mix(acc, ws)
    # final per-row avalanche then xor-fold
    acc ^= acc >> np.uint64(33)
    acc *= np.uint64(0xFF51AFD7ED558CCD)
    acc ^= acc >> np.uint64(33)
    return int(np.bitwise_xor.reduce(acc))
