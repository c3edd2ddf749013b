"""Posting-list compression codecs: delta + varint (LEB128), block-max metadata.

All encode/decode paths are vectorized numpy — no per-posting Python loop —
so compression runs at memory bandwidth inside map_groups during the merge
(SURVEY.md §7.2 step 5).  Values are full uint64 (hashed docIDs are 63-bit;
deltas can need up to 10 varint bytes, but mean delta shrinks ~ 2^63/N as the
corpus grows, so at 10^12 docs deltas take ~4 bytes).
"""

from __future__ import annotations

import numpy as np

from .schema import BLOCK_SIZE

_MAX_VARINT_BYTES = 10


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized (loop over byte position only)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    lens = np.ones(v.size, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        lens += (shifted > 0).astype(np.int64)
        shifted = shifted >> np.uint64(7)
    ends = np.cumsum(lens)
    starts = ends - lens
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(_MAX_VARINT_BYTES):
        mask = lens > j
        if not mask.any():
            break
        pos = starts[mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lens[mask] > j + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array, vectorized."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    ends = np.nonzero(is_end)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    n = ends.size
    out = np.zeros(n, dtype=np.uint64)
    for j in range(int(lens.max())):
        mask = lens > j
        byte = raw[starts[mask] + j].astype(np.uint64)
        out[mask] |= (byte & np.uint64(0x7F)) << np.uint64(7 * j)
    if count is not None and n != count:
        raise ValueError(f"varint_decode: expected {count} values, got {n}")
    return out


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """First value + successive deltas, varint-encoded. Input must be sorted asc."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    deltas = varint_decode(buf, count)
    return np.cumsum(deltas, dtype=np.uint64)


def floats_encode(values: np.ndarray) -> bytes:
    """float64 little-endian raw bytes (impacts are not integer-compressible)."""
    return np.ascontiguousarray(values, dtype="<f8").tobytes()


def floats_decode(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f8")


def block_metadata(
    doc_ids: np.ndarray, impacts: np.ndarray, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last_doc, max_impact) for Block-Max WAND skipping.

    Blocks are consecutive runs of `block_size` postings in docID order.
    max_impact excludes the per-term idf factor (a constant multiplier
    applied at query time), so the bound stays exact.
    """
    n = doc_ids.size
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
    nblocks = (n + block_size - 1) // block_size
    last = doc_ids[np.minimum(np.arange(1, nblocks + 1) * block_size - 1, n - 1)]
    pad = nblocks * block_size - n
    padded = np.pad(impacts.astype(np.float64), (0, pad), constant_values=-np.inf)
    maxes = padded.reshape(nblocks, block_size).max(axis=1)
    return last.astype(np.uint64), maxes
