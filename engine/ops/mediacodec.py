"""Pure-stdlib + numpy media codecs: REAL decoders for the formats that
need no native media library (PNG via zlib, BMP, PPM, WAV via the stdlib
`wave` module), so the multimodal pipeline's decode stage is genuinely
exercised end-to-end in this container.  Only JPEG (needs libjpeg) remains
a declared stub in `multimodal.decode_image`.

Encoders for the same formats live here too — they exist so tests can
round-trip `decode(encode(img)) == img` and so the media fixture carries
real payloads, mirroring how the reference ships its own fixture corpora
(/root/reference/tests/ uses crafted inputs, not downloads).
"""

from __future__ import annotations

import binascii
import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG — 8-bit grayscale / RGB / RGBA, interlace 0, all five row filters.


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = binascii.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, {1,3,4}) uint8 -> PNG bytes (filter 0 rows)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    colortype = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8.  Supports the subset a data pipeline
    meets in practice for lossless thumbnails: 8-bit depth, colortype
    0/2/6, no interlace.  Filters 0/2 unfilter as one vectorized cumsum
    over rows; 1/3/4 need the left neighbor so they run row-sequentially
    (still numpy per row, never per pixel except avg/paeth's carry)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, colortype, _comp, _filt, interlace = meta
    if depth != 8 or interlace != 0 or colortype not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG depth={depth} colortype={colortype} interlace={interlace}"
        )
    c = {0: 1, 2: 3, 6: 4}[colortype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * c
    if raw.size != h * stride:
        raise ValueError("PNG size mismatch")
    rows = raw.reshape(h, stride)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, w * c), np.int32)
    prior = np.zeros(w * c, np.int32)
    for y in range(h):
        f, row = int(filters[y]), data[y]
        if f == 0:
            rec = row
        elif f == 2:
            rec = (row + prior) & 0xFF
        elif f == 1:
            rec = row.reshape(w, c)
            rec = np.cumsum(rec, axis=0) & 0xFF
            rec = rec.reshape(-1)
        elif f in (3, 4):
            rec = np.empty(w * c, np.int32)
            up = prior
            for x in range(w * c):
                left = rec[x - c] if x >= c else 0
                ul = up[x - c] if x >= c else 0
                if f == 3:
                    pred = (left + up[x]) // 2
                else:
                    pred = int(
                        _paeth(
                            np.uint8(left), np.uint8(up[x]), np.uint8(ul)
                        )
                    )
                rec[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prior = out[y]
    return out.astype(np.uint8).reshape(h, w, c)


# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit bottom-up (the universal interchange layout).


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    assert c == 3, "BMP encoder writes 24-bit RGB"
    pad = (-(w * 3)) % 4
    rows = np.concatenate(
        [img[::-1, :, ::-1].reshape(h, w * 3), np.zeros((h, pad), np.uint8)],
        axis=1,
    ).tobytes()
    pixel_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(rows), 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=h * stride, offset=pixel_off)
    img = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


# ---------------------------------------------------------------------------
# PPM (P6) — the trivial raw-RGB format.


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = three whitespace-separated tokens after the magic (comments
    # start with '#' and run to end-of-line)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    raw = np.frombuffer(payload, np.uint8, count=h * w * 3, offset=pos)
    return raw.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# WAV — stdlib `wave` handles RIFF; numpy views the PCM frames.


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> WAV bytes."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        data = np.frombuffer(f.readframes(n), "<i2").reshape(-1, ch)
    return data, rate


# ---------------------------------------------------------------------------
# Transforms over decoded arrays (vectorized; no media lib involved).


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index grids — one fancy-index, no loops."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys[:, None], xs[None, :]]


def sample_audio_frames(
    samples: np.ndarray, rate: int, frame_s: float = 0.5, hop_s: float = 0.5
) -> np.ndarray:
    """Fixed-window frame sampling: (n, ch) -> (n_frames, frame_len, ch)
    via stride tricks (zero-copy view)."""
    frame = max(1, int(frame_s * rate))
    hop = max(1, int(hop_s * rate))
    if len(samples) < frame:
        return samples[None, :, :][:0]
    n_frames = 1 + (len(samples) - frame) // hop
    return np.lib.stride_tricks.as_strided(
        samples,
        shape=(n_frames, frame, samples.shape[1]),
        strides=(samples.strides[0] * hop, *samples.strides),
        writeable=False,
    )
