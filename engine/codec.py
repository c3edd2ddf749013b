"""Posting-list compression codecs: delta + varint (LEB128) + PForDelta,
block-max metadata.

All encode/decode paths are vectorized numpy — no per-posting Python loop —
so compression runs at memory bandwidth inside map_groups during the merge
(SURVEY.md §7.2 step 5).  Values are full uint64 (hashed docIDs are 63-bit;
deltas can need up to 10 varint bytes, but mean delta shrinks ~ 2^63/N as the
corpus grows, so at 10^12 docs deltas take ~4 bytes).

Integer sequences go through `ints_encode`, which emits a 1-byte tag and the
SMALLER of (varint, PForDelta): PFor (Zukowski et al. 2006; NewPFD exception
layout per Yan, Ding & Suel WWW'09) bit-packs each 128-value frame at a width
covering the common case and patches outliers separately, beating varint on
the near-uniform delta streams long posting lists produce, while varint wins
on short/skewed lists.  The choice is per list and self-describing.
"""

from __future__ import annotations

import numpy as np

from .schema import BLOCK_SIZE

_MAX_VARINT_BYTES = 10
_PFOR_FRAME = 128
_TAG_VARINT = 0
_TAG_PFOR = 1


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


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Bit length per value, min 1 (so a frame of zeros still packs)."""
    bl = np.ones(v.size, dtype=np.int64)
    shifted = v >> np.uint64(1)
    while shifted.any():
        bl += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(1)
    return bl


def pfor_encode(values: np.ndarray) -> bytes:
    """PForDelta frames: [b][n_exc][packed b-bit LSB-first][exc pos varint]
    [exc high-bits varint] per 128-value frame; frame width b chosen to
    minimize packed + patch bytes."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    parts: list[bytes] = []
    for s in range(0, v.size, _PFOR_FRAME):
        f = v[s:s + _PFOR_FRAME]
        n = f.size
        bl = _bit_lengths(f)
        max_bl = int(bl.max())
        # cost(b) = packed bytes + per-exception (1 pos byte + high varint)
        best_b, best_cost = max_bl, (n * max_bl + 7) // 8
        for b in range(1, max_bl):
            exc = bl > b
            n_exc = int(exc.sum())
            high_bytes = int(((bl[exc] - b + 6) // 7).sum()) if n_exc else 0
            cost = (n * b + 7) // 8 + n_exc + high_bytes
            if cost < best_cost:
                best_b, best_cost = b, cost
        b = best_b
        mask = np.uint64((1 << b) - 1) if b < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
        low = f & mask
        bits = ((low[:, None] >> np.arange(b, dtype=np.uint64)) & np.uint64(1)
                ).astype(np.uint8)
        packed = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
        exc_idx = np.nonzero(bl > b)[0]
        highs = f[exc_idx] >> np.uint64(b)
        parts.append(bytes((b, exc_idx.size)))
        parts.append(packed)
        if exc_idx.size:
            parts.append(exc_idx.astype(np.uint8).tobytes())  # pos < 128
            parts.append(varint_encode(highs))
    return b"".join(parts)


def pfor_decode(buf: bytes, count: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(count, dtype=np.uint64)
    pos = 0
    done = 0
    while done < count:
        n = min(_PFOR_FRAME, count - done)
        b, n_exc = int(raw[pos]), int(raw[pos + 1])
        pos += 2
        packed_len = (n * b + 7) // 8
        bits = np.unpackbits(
            raw[pos:pos + packed_len], count=n * b, bitorder="little"
        ).reshape(n, b).astype(np.uint64)
        f = (bits << np.arange(b, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
        pos += packed_len
        if n_exc:
            idx = raw[pos:pos + n_exc].astype(np.int64)
            pos += n_exc
            # decode exactly n_exc varints from raw[pos:]
            seg = raw[pos:]
            is_end = (seg & 0x80) == 0
            ends = np.nonzero(is_end)[0][:n_exc]
            highs = varint_decode(seg[: ends[-1] + 1].tobytes(), n_exc)
            pos += int(ends[-1] + 1)
            f[idx] |= highs << np.uint64(b)
        out[done:done + n] = f
        done += n
    return out


def ints_encode(values: np.ndarray) -> bytes:
    """Tagged integer-sequence codec: 1-byte tag + min(varint, PForDelta)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    a = varint_encode(v)
    b = pfor_encode(v)
    if len(b) < len(a):
        return bytes((_TAG_PFOR,)) + b
    return bytes((_TAG_VARINT,)) + a


def ints_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    if not buf:
        return np.empty(0, dtype=np.uint64)
    tag = buf[0]
    if tag == _TAG_PFOR:
        if count is None:
            raise ValueError("pfor decode requires count")
        return pfor_decode(buf[1:], count)
    return varint_decode(buf[1:], count)


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """First value + successive deltas, tagged-codec-encoded (varint or
    PForDelta, whichever is smaller). Input must be sorted asc."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return ints_encode(deltas)


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    deltas = ints_decode(buf, count)
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
