"""Pure-stdlib + numpy media codecs: REAL decoders for the formats the
multimodal pipeline meets (PNG via zlib, BMP, PPM, WAV via the stdlib
`wave` module, and DCT JPEG implemented from the public ITU T.81 spec —
baseline SOF0, 12-bit extended-sequential SOF1, and progressive SOF2:
header/DQT/DHT/SOF/SOS parsing, Huffman entropy decode (multi-scan spectral
selection + successive approximation for SOF2), dequantize, inverse zigzag,
separable IDCT, chroma upsampling, YCbCr->RGB), so the
decode stage is genuinely exercised end-to-end in this container with no
native media library.

Encoders for the same formats live here too — they exist so tests can
round-trip `decode(encode(img)) == img` (JPEG: == within quantization
error) and so the media fixture carries real payloads, mirroring how the
reference ships its own fixture corpora (/root/reference/tests/ uses
crafted inputs, not downloads).
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
# JPEG — baseline DCT (ITU T.81), pure numpy.  The decoder reads quant +
# Huffman tables from the FILE (DQT/DHT segments), so externally-produced
# baseline JPEGs decode with their own tables; the spec's Annex-K standard
# tables below are used only by the encoder.  Supported: 8-bit baseline
# (SOF0) and 8/12-bit extended sequential Huffman (SOF1), 1 or 3
# components, sampling factors up to 2x2, restart intervals.
# Progressive (SOF2) / arithmetic raise NotImplementedError.

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_STD_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

_STD_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# standard Huffman tables (T.81 Annex K.3): (BITS counts per code length,
# HUFFVAL symbol list)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: spatial = C.T @ coeff @ C
_DCT_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table clipped to [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)


def _flat_table(symbols, length: int) -> tuple[list[int], list[int]]:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


# Extended-sequential (12-bit, SOF1) entropy tables: Annex K's standard
# tables only cover 8-bit magnitude categories (DC <= 11, AC size <= 10),
# so the 12-bit encoder emits these flat canonical tables instead — DC
# categories 0..15 as 5-bit codes (Kraft 16/32) and the 226 AC symbols
# (EOB, ZRL, run 0..15 x size 1..14) as 8-bit codes (Kraft 226/256, last
# code 225 so the all-ones code stays unused as T.81 C.2 requires).  They
# ride in the file's own DHT segment like any other table, so the decoder
# needs nothing special.
_EXT_DC = _flat_table(range(16), 5)
_EXT_AC = _flat_table(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)], 8
)

# Progressive (SOF2) AC table: progressive scans use EOBn symbols
# (r<<4)|0 for r 0..14 (end-of-band runs of 2^r..2^{r+1}-1 blocks, T.81
# G.1.2.2) which Annex K's sequential tables don't carry, so the
# progressive encoder emits one flat 8-bit table covering EOB0..EOB14,
# ZRL, and run/size pairs up to the 8-bit size-10 ceiling (176 symbols,
# Kraft 176/256; codes 0..175 so the all-ones byte stays unused).
_PROG_AC = _flat_table(
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
    8,
)


class _HuffEncoder:
    """Canonical Huffman codes from a (BITS, HUFFVAL) table spec."""

    def __init__(self, bits, vals):
        self.bits, self.vals = bits, vals
        self.code: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.code[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad(self) -> None:
        if self.nbits:
            n = 8 - self.nbits
            self.write((1 << n) - 1, n)  # pad with 1s

    def marker(self, byte: int) -> None:
        """Emit a raw (unstuffed) marker after byte-aligning."""
        self.pad()
        self.out += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _encode_block(
    w: _BitWriter, zz: np.ndarray, prev_dc: int, dc: _HuffEncoder, ac: _HuffEncoder
) -> int:
    size, bits = _magnitude(int(zz[0]) - prev_dc)
    c, l = dc.code[size]
    w.write(c, l)
    if size:
        w.write(bits, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac.code[0xF0]  # ZRL
            w.write(c, l)
            run -= 16
        size, bits = _magnitude(v)
        c, l = ac.code[(run << 4) | size]
        w.write(c, l)
        w.write(bits, size)
        run = 0
    if last < 63:
        c, l = ac.code[0x00]  # EOB
        w.write(c, l)
    return int(zz[0])


def _plan_jpeg(
    img: np.ndarray, quality: int, subsample: bool, precision: int
) -> tuple[list[np.ndarray], list[np.ndarray], list[tuple[int, int]], int, int, int]:
    """Shared front half of sequential AND progressive encoding: validate,
    color-convert to YCbCr, pad to MCU multiples (edge replicate), chroma
    downsample, FDCT, quantize, zigzag.  Returns (zz_per_plane, qts,
    sampling, h, w, nc): identical quantized coefficients feed both entropy
    coders, so a progressive and a baseline encode of the same image MUST
    decode pixel-identically — the property the round-trip tests assert."""
    if precision not in (8, 12):
        raise NotImplementedError(f"JPEG encoder: precision {precision}")
    center = 1 << (precision - 1)
    maxval = (1 << precision) - 1
    img = np.ascontiguousarray(img, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and img.max(initial=0) > maxval:
        raise ValueError("12-bit JPEG encoder: samples must be in [0, 4095]")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise NotImplementedError(f"JPEG encoder: {nc} channels")
    if nc == 3:  # JFIF YCbCr
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + center
        cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + center
        full_planes = [y, cb, cr]
    else:
        full_planes = [img[..., 0].astype(np.float64)]
    sampling = (
        [(2, 2), (1, 1), (1, 1)] if (subsample and nc == 3) else [(1, 1)] * nc
    )
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    qts = [_quality_scale(_STD_QT_LUMA, quality)]
    if nc == 3:
        qts.append(_quality_scale(_STD_QT_CHROMA, quality))
    # pad to full MCU multiples (edge replicate), then per-component
    # downsample by the factor ratio (2x2 mean for 4:2:0 chroma)
    H, W = -(-h // (8 * vmax)) * 8 * vmax, -(-w // (8 * hmax)) * 8 * hmax
    zz_per_plane = []
    for ci, plane in enumerate(full_planes):
        p = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
        dy, dx = vmax // sampling[ci][1], hmax // sampling[ci][0]
        if dy > 1 or dx > 1:
            p = p.reshape(H // dy, dy, W // dx, dx).mean(axis=(1, 3))
        p = p - float(center)
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        coeff = np.einsum("ux,byxw,vw->byuv", _DCT_C, blocks, _DCT_C)
        q = qts[min(ci, len(qts) - 1)].reshape(8, 8)
        # zigzag: zz[i] = raster[ZIGZAG[i]] — a direct gather
        zz = np.round(coeff / q).astype(np.int64).reshape(by, bx, 64)[:, :, _ZIGZAG]
        if precision == 12 and np.abs(zz[:, :, 1:]).max(initial=0) > 16383:
            # _EXT_AC stops at size 14 (T.81 F.1.3's 12-bit AC ceiling)
            raise ValueError("12-bit JPEG encoder: AC coefficient > 16383; "
                             "raise quality's quant floor")
        zz_per_plane.append(zz)
    return zz_per_plane, qts, sampling, h, w, nc


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """(h, w) or (h, w, {1,3}) uint8 -> baseline JPEG (interleaved single
    scan, standard Annex-K Huffman tables).  ``subsample`` emits 4:2:0
    chroma (Y 2x2 / Cb,Cr 1x1 sampling, 2x2-mean downsample);
    ``restart_interval`` emits DRI + RSTn markers every N MCUs — both exist
    so the decoder's sampling-factor and restart paths are round-trippable
    in-container.  ``precision=12`` takes uint16 samples in [0, 4095] and
    emits a 12-bit extended-sequential (SOF1) stream with the _EXT Huffman
    tables (T.81 F.1.3; Annex K's tables stop at 8-bit categories)."""
    zz_per_plane, qts, sampling, h, w, nc = _plan_jpeg(
        img, quality, subsample, precision
    )
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    H, W = -(-h // (8 * vmax)) * 8 * vmax, -(-w // (8 * hmax)) * 8 * hmax
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(qt[_ZIGZAG[i]]) for i in range(64)
        )
    # SOF0 (8-bit baseline) / SOF1 (12-bit extended sequential)
    sof = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for ci in range(nc):
        hv = (sampling[ci][0] << 4) | sampling[ci][1]
        out += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    # DHT
    if precision == 8:
        dc_luma, ac_luma = _STD_DC_LUMA, _STD_AC_LUMA
        dc_chroma, ac_chroma = _STD_DC_CHROMA, _STD_AC_CHROMA
    else:
        dc_luma = dc_chroma = _EXT_DC
        ac_luma = ac_chroma = _EXT_AC
    tables = [(0x00, dc_luma), (0x10, ac_luma)]
    if nc == 3:
        tables += [(0x01, dc_chroma), (0x11, ac_chroma)]
    for tclass_id, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tclass_id)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    dc_enc = [_HuffEncoder(*dc_luma)] + [_HuffEncoder(*dc_chroma)] * (nc - 1)
    ac_enc = [_HuffEncoder(*ac_luma)] + [_HuffEncoder(*ac_chroma)] * (nc - 1)
    wtr = _BitWriter()
    prev = [0] * nc
    mcuy, mcux = H // (8 * vmax), W // (8 * hmax)
    n_rst = 0
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            wtr.marker(0xD0 + (n_rst % 8))
            n_rst += 1
            prev = [0] * nc
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            hc, vc = sampling[ci]
            for vy in range(vc):
                for vx in range(hc):
                    prev[ci] = _encode_block(
                        wtr,
                        zz_per_plane[ci][my * vc + vy, mx * hc + vx],
                        prev[ci],
                        dc_enc[ci],
                        ac_enc[ci],
                    )
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) encoder — T.81 Annex G.  The scan script follows
# libjpeg's documented default shape (DC first at Al=1, spectral-selection
# AC bands at Al=2/1, then one successive-approximation refinement pass per
# level down to Al=0), so every decoder path — DC first/refine, AC
# first/refine, EOBRUN — is exercised by our own streams.

# (component ids, Ss, Se, Ah, Al) per scan; comps index into zz planes
_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
]


def _emit_dc_scan(
    zz_per_plane, comps, sampling, mcuy, mcux, real_dims, Ah, Al, dc_enc
) -> bytes:
    """One progressive DC scan (T.81 G.1.2.1).  Interleaved MCU order when
    ns > 1; a single-component scan is non-interleaved per A.2.2 — raster
    over the component's REAL block grid (MCU padding blocks not coded)."""
    w = _BitWriter()
    if len(comps) == 1:
        ci = comps[0]
        bh, bw = real_dims[ci]
        blocks = (zz_per_plane[ci][by, bx] for by in range(bh) for bx in range(bw))
        if Ah == 0:
            prev = 0
            for blk in blocks:
                dc = int(blk[0]) >> Al  # arithmetic shift = DC point transform
                size, bits = _magnitude(dc - prev)
                c, l = dc_enc[ci].code[size]
                w.write(c, l)
                if size:
                    w.write(bits, size)
                prev = dc
        else:
            for blk in blocks:
                w.write((int(blk[0]) >> Al) & 1, 1)
        return w.flush()
    prev = [0] * len(comps)
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        for j, ci in enumerate(comps):
            hc, vc = sampling[ci]
            for vy in range(vc):
                for vx in range(hc):
                    dc = int(zz_per_plane[ci][my * vc + vy, mx * hc + vx, 0]) >> Al
                    if Ah == 0:
                        size, bits = _magnitude(dc - prev[j])
                        c, l = dc_enc[ci].code[size]
                        w.write(c, l)
                        if size:
                            w.write(bits, size)
                        prev[j] = dc
                    else:
                        w.write(dc & 1, 1)
    return w.flush()


def _emit_ac_first(zz, bh, bw, Ss, Se, Al, ac: _HuffEncoder) -> bytes:
    """AC first scan for one component's band (T.81 G.1.2.2): run/size on
    the point-transformed magnitudes, all-zero-band blocks folded into
    EOBn runs of up to 32767 blocks."""
    w = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            c, l = ac.code[nbits << 4]
            w.write(c, l)
            if nbits:
                w.write(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for by in range(bh):
        for bx in range(bw):
            blk = zz[by, bx]
            r = 0
            for k in range(Ss, Se + 1):
                v = int(blk[k])
                t = abs(v) >> Al  # AC point transform: magnitude shift
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    c, l = ac.code[0xF0]
                    w.write(c, l)
                    r -= 16
                size = t.bit_length()
                _, bits = _magnitude(t if v > 0 else -t)
                c, l = ac.code[(r << 4) | size]
                w.write(c, l)
                w.write(bits, size)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 32767:
                    flush_eob()
    flush_eob()
    return w.flush()


def _emit_ac_refine(zz, bh, bw, Ss, Se, Al, ac: _HuffEncoder) -> bytes:
    """AC refinement scan (T.81 G.1.2.3): newly-significant coefficients
    (|coeff| >> Al == 1) get run/size-1 codes + a sign bit; already-nonzero
    ones get one buffered correction bit each, emitted after the next
    symbol (or with the EOBn run) in the exact order the decoder's
    coefficient walk consumes them."""
    w = _BitWriter()
    eobrun = 0
    be: list[int] = []  # correction bits deferred with the pending EOB run

    def flush_eob():
        nonlocal eobrun, be
        if eobrun:
            nbits = eobrun.bit_length() - 1
            c, l = ac.code[nbits << 4]
            w.write(c, l)
            if nbits:
                w.write(eobrun - (1 << nbits), nbits)
            eobrun = 0
        for b in be:
            w.write(b, 1)
        be = []

    for by in range(bh):
        for bx in range(bw):
            blk = zz[by, bx]
            absval = [abs(int(blk[k])) >> Al for k in range(Ss, Se + 1)]
            eob = Ss - 1  # last newly-significant position in this block
            for i, t in enumerate(absval):
                if t == 1:
                    eob = Ss + i
            r = 0
            br: list[int] = []  # correction bits since the last symbol
            for i, t in enumerate(absval):
                k = Ss + i
                if t == 0:
                    r += 1
                    continue
                # ZRLs only when a newly-significant coeff still follows;
                # otherwise trailing zeros fold into the EOB run
                while r > 15 and k <= eob:
                    flush_eob()
                    c, l = ac.code[0xF0]
                    w.write(c, l)
                    r -= 16
                    for b in br:
                        w.write(b, 1)
                    br = []
                if t > 1:  # already nonzero: one correction bit
                    br.append(t & 1)
                    continue
                flush_eob()
                c, l = ac.code[(r << 4) | 1]
                w.write(c, l)
                w.write(1 if int(blk[k]) > 0 else 0, 1)
                r = 0
                for b in br:
                    w.write(b, 1)
                br = []
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 32767:
                    flush_eob()
    flush_eob()
    return w.flush()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(h, w) or (h, w, {1,3}) uint8 -> progressive JPEG (SOF2, 8-bit).

    Identical coefficient planning to ``encode_jpeg`` (same ``_plan_jpeg``
    call), so ``decode_jpeg`` of the two encodes is pixel-identical — the
    progressive entropy coding is lossless re-ordering of the same data."""
    zz_per_plane, qts, sampling, h, w, nc = _plan_jpeg(img, quality, subsample, 8)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    H, W = -(-h // (8 * vmax)) * 8 * vmax, -(-w // (8 * hmax)) * 8 * hmax
    mcuy, mcux = H // (8 * vmax), W // (8 * hmax)
    # real (non-interleaved) block grid per component, A.1.1/A.2.2
    real_dims = []
    for ci in range(nc):
        hc, vc = sampling[ci]
        cw, ch = -(-w * hc // hmax), -(-h * vc // vmax)
        real_dims.append((-(-ch // 8), -(-cw // 8)))
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(qt[_ZIGZAG[i]]) for i in range(64)
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)  # SOF2
    for ci in range(nc):
        hv = (sampling[ci][0] << 4) | sampling[ci][1]
        out += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    tables = [(0x00, _STD_DC_LUMA), (0x10, _PROG_AC)]
    if nc == 3:
        tables.append((0x01, _STD_DC_CHROMA))
    for tclass_id, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tclass_id)
        out += bytes(bits) + bytes(vals)
    dc_enc = [_HuffEncoder(*_STD_DC_LUMA)] + [_HuffEncoder(*_STD_DC_CHROMA)] * (
        nc - 1
    )
    ac_enc = _HuffEncoder(*_PROG_AC)
    script = _PROG_SCRIPT_GRAY if nc == 1 else _PROG_SCRIPT_COLOR
    for comps, Ss, Se, Ah, Al in script:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
        for ci in comps:
            dc_id = 0 if ci == 0 else 1
            out += bytes([ci + 1, (dc_id << 4) | 0])
        out += bytes([Ss, Se, (Ah << 4) | Al])
        if Ss == 0:
            out += _emit_dc_scan(
                zz_per_plane, comps, sampling, mcuy, mcux, real_dims, Ah, Al, dc_enc
            )
        else:
            ci = comps[0]
            bh, bw = real_dims[ci]
            emit = _emit_ac_first if Ah == 0 else _emit_ac_refine
            out += emit(zz_per_plane[ci], bh, bw, Ss, Se, Al, ac_enc)
    out += b"\xff\xd9"
    return bytes(out)


class _HuffDecoder:
    """Canonical decode via the T.81 F.2.2.3 mincode/maxcode walk."""

    def __init__(self, bits, vals):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, rd: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | rd.bit()
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("bad JPEG Huffman code")


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0  # trailing pad per spec
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_chunks(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff 0xFF00 and split one scan's entropy data at RSTn markers.
    Returns (chunks, position of the terminating marker's 0xFF)."""
    chunks: list[bytes] = []
    cur = bytearray()
    i = start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                chunks.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next real marker
        cur.append(b)
        i += 1
    chunks.append(bytes(cur))
    return chunks, i


def _jpeg_reconstruct(
    comps: list[dict],
    stores: list[np.ndarray],
    qt: dict[int, np.ndarray],
    prec: int,
    h: int,
    w: int,
    hmax: int,
    vmax: int,
) -> np.ndarray:
    """Dequantize + inverse zigzag + IDCT + upsample + color convert —
    shared by the sequential and progressive paths (vectorized per comp)."""
    planes = []
    for ci, c in enumerate(comps):
        by, bx = stores[ci].shape[:2]
        coeff = np.zeros((by, bx, 64))
        coeff[:, :, _ZIGZAG] = stores[ci] * qt[c["tq"]].reshape(-1)[_ZIGZAG]
        coeff = coeff.reshape(by, bx, 8, 8)
        spatial = np.einsum("xu,byuv,wv->byxw", _DCT_C.T, coeff, _DCT_C.T)
        center = float(1 << (prec - 1))
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + center
        # upsample to full resolution (nearest), crop to (h, w)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(plane)
    center = float(1 << (prec - 1))
    maxval = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, maxval).astype(dtype)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxval).astype(dtype)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, c) array, uint8 for 8-bit precision and uint16
    (samples in [0, 4095]) for 12-bit (c = 1 grayscale / 3 RGB).

    Tables come from the file's own DQT/DHT segments; supports interleaved
    8-bit baseline (SOF0), 8/12-bit extended-sequential Huffman (SOF1), and
    8-bit progressive Huffman (SOF2, routed to :func:`_decode_progressive`)
    scans, component sampling factors up to 2x2, and restart intervals.
    Lossless/hierarchical/arithmetic raise NotImplementedError.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[dict] = []
    h = w = 0
    prec = 8
    restart = 0
    scan_comps: list[dict] = []
    entropy = b""
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    vals = np.frombuffer(seg, ">u2", count=64, offset=i)
                    i += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, count=64, offset=i)
                    i += 64
                t = np.zeros(64, np.int64)
                t[_ZIGZAG] = vals.astype(np.int64)
                qt[tid] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec not in (8, 12) or (marker == 0xC0 and prec != 8):
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for ci in range(nc):  # header = prec(1)+h(2)+w(2)+ncomp(1)
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker == 0xC2:  # SOF2: progressive DCT, own decode path
            return _decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF {marker:#x})")
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(tclass, tid)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: header, then entropy data to EOI
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tt = struct.unpack_from("BB", seg, 1 + 2 * ci)
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 0xF}
                )
            entropy = payload[pos + seglen :]
            break
        pos += seglen
    if not scan_comps or not h:
        raise ValueError("JPEG missing SOF/SOS")
    # split entropy data at restart markers, unstuff 0xFF00
    chunks, _ = _entropy_chunks(entropy, 0)
    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # per-component zigzag coefficient store (filled MCU by MCU)
    store = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
        for c in scan_comps
    ]
    rd = _BitReader(chunks[0])
    chunk_i = 0
    prev = [0] * len(scan_comps)
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            chunk_i += 1  # RST: realign and reset predictors
            rd = _BitReader(chunks[chunk_i])
            prev = [0] * len(scan_comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan_comps):
            dc_t = huff[(0, c["dc"])]
            ac_t = huff[(1, c["ac"])]
            for vy in range(c["v"]):
                for vx in range(c["h"]):
                    zz = np.zeros(64, np.int64)
                    size = dc_t.decode(rd)
                    prev[ci] += _extend(rd.bits(size), size)
                    zz[0] = prev[ci]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(rd)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(rd.bits(size), size)
                        k += 1
                    store[ci][my * c["v"] + vy, mx * c["h"] + vx] = zz
    return _jpeg_reconstruct(scan_comps, store, qt, prec, h, w, hmax, vmax)


def _decode_prog_scan(
    chunks: list[bytes],
    scomps: list[tuple[int, int, int]],  # (frame comp index, Td, Ta)
    Ss: int,
    Se: int,
    Ah: int,
    Al: int,
    huff: dict,
    comps: list[dict],
    stores: list[np.ndarray],
    restart: int,
    geom: tuple[int, int, int, int],
) -> None:
    """Apply one progressive scan's coefficient updates (T.81 G.1.2).

    DC scans (Ss == 0): first pass (Ah == 0) Huffman-decodes point-
    transformed diffs, refinements read one raw bit per block.  AC scans
    are single-component over the REAL block grid; first passes run
    run/size + EOBRUN, refinements walk the band reading correction bits
    for already-nonzero coefficients exactly where the encoder buffered
    them.  Restart markers realign the bit stream and reset predictors
    and the EOB run."""
    hmax, vmax, mcux, mcuy = geom
    rd = _BitReader(chunks[0])
    chunk_i = 0
    if Ss == 0:  # DC scan
        if Se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if len(scomps) > 1:  # interleaved MCU order
            dc_tabs = [huff[(0, td)] if Ah == 0 else None for (_, td, _) in scomps]
            prev = [0] * len(scomps)
            for m in range(mcuy * mcux):
                if restart and m and m % restart == 0:
                    chunk_i += 1
                    rd = _BitReader(chunks[chunk_i])
                    prev = [0] * len(scomps)
                my, mx = divmod(m, mcux)
                for j, (idx, _td, _) in enumerate(scomps):
                    c = comps[idx]
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            blk = stores[idx][my * c["v"] + vy, mx * c["h"] + vx]
                            if Ah == 0:
                                size = dc_tabs[j].decode(rd)
                                prev[j] += _extend(rd.bits(size), size)
                                blk[0] = prev[j] << Al
                            elif rd.bit():
                                blk[0] |= 1 << Al
        else:  # single component: non-interleaved real block grid (A.2.2)
            idx, td, _ = scomps[0]
            c = comps[idx]
            dc_t = huff[(0, td)] if Ah == 0 else None
            prev = n = 0
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    if restart and n and n % restart == 0:
                        chunk_i += 1
                        rd = _BitReader(chunks[chunk_i])
                        prev = 0
                    n += 1
                    blk = stores[idx][by, bx]
                    if Ah == 0:
                        size = dc_t.decode(rd)
                        prev += _extend(rd.bits(size), size)
                        blk[0] = prev << Al
                    elif rd.bit():
                        blk[0] |= 1 << Al
        return
    # AC scan: always single-component in progressive mode (T.81 G.1.1)
    if len(scomps) != 1:
        raise ValueError("progressive AC scan with ns != 1")
    idx, _, ta = scomps[0]
    ac_t = huff[(1, ta)]
    c = comps[idx]
    store = stores[idx]
    eobrun = n = 0
    p1, m1 = 1 << Al, -(1 << Al)
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            if restart and n and n % restart == 0:
                chunk_i += 1
                rd = _BitReader(chunks[chunk_i])
                eobrun = 0
            n += 1
            blk = store[by, bx]
            if Ah == 0:  # band's first pass (G.1.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = Ss
                while k <= Se:
                    rs = ac_t.decode(rd)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.bits(r)
                        break
                    k += r
                    if k > Se:
                        raise ValueError("JPEG AC run past band end")
                    blk[k] = _extend(rd.bits(s), s) << Al
                    k += 1
            else:  # refinement pass (G.1.2.3)
                k = Ss
                if eobrun == 0:
                    while k <= Se:
                        rs = ac_t.decode(rd)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r != 15:  # EOBn: rest of block is corrections
                                eobrun = 1 << r
                                if r:
                                    eobrun += rd.bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history coeffs
                        else:
                            val = p1 if rd.bit() else m1
                        # walk: correction bit per nonzero-history coeff,
                        # burn r zero-history slots, land on the new coeff
                        while k <= Se:
                            cur = int(blk[k])
                            if cur != 0:
                                if rd.bit() and (cur & p1) == 0:
                                    blk[k] = cur + (p1 if cur > 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= Se:
                            blk[k] = val
                        k += 1
                if eobrun:  # EOB region: corrections only, to band end
                    while k <= Se:
                        cur = int(blk[k])
                        if cur != 0:
                            if rd.bit() and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur > 0 else m1)
                        k += 1
                    eobrun -= 1


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2, T.81 Annex G): coefficients accumulate
    across scans — DC first/refine (interleaved or single-component), AC
    first/refine (single-component spectral bands with EOBRUN), successive
    approximation via the Al point transform.  DQT/DHT/DRI may be redefined
    between scans; each scan's entropy data is decoded with the tables in
    effect at its SOS."""
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[dict] = []
    stores: list[np.ndarray] = []
    h = w = 0
    prec = 8
    restart = 0
    hmax = vmax = mcux = mcuy = 1
    saw_scan = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                tprec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if tprec:
                    vals = np.frombuffer(seg, ">u2", count=64, offset=i)
                    i += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, count=64, offset=i)
                    i += 64
                t = np.zeros(64, np.int64)
                t[_ZIGZAG] = vals.astype(np.int64)
                qt[tid] = t.reshape(8, 8)
        elif marker == 0xC2:  # SOF2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec not in (8, 12):
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for c in comps:  # real (non-interleaved) block grid, A.1.1
                cw, ch = -(-w * c["h"] // hmax), -(-h * c["v"] // vmax)
                c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
            stores = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                for c in comps
            ]
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                huff[(tclass, tid)] = _HuffDecoder(
                    bits, list(seg[i + 17 : i + 17 + nsym])
                )
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: decode this scan, keep going
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []
            for ci in range(ns):
                cid, tt = struct.unpack_from("BB", seg, 1 + 2 * ci)
                idx = next(i for i, c in enumerate(comps) if c["id"] == cid)
                scomps.append((idx, tt >> 4, tt & 0xF))
            Ss, Se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            chunks, nxt = _entropy_chunks(payload, pos + seglen)
            _decode_prog_scan(
                chunks, scomps, Ss, Se, a >> 4, a & 0xF,
                huff, comps, stores, restart, (hmax, vmax, mcux, mcuy),
            )
            saw_scan = True
            pos = nxt
            continue
        pos += seglen
    if not saw_scan or not h:
        raise ValueError("JPEG missing SOF/SOS")
    return _jpeg_reconstruct(comps, stores, qt, prec, h, w, hmax, vmax)


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
