"""Stdlib-only media codecs for the multimodal stages.

This container ships no PIL/ffmpeg, but several real formats need
nothing beyond the standard library + numpy:

- PNG  (zlib inflate + scanline unfilter; encode with filter 0)
- BMP  (uncompressed 24-bit BI_RGB)
- PPM/PGM (binary P6/P5)
- WAV  (stdlib `wave`, PCM 8/16/32-bit)
- JPEG (baseline sequential DCT, ITU-T T.81: 4:4:4 and 4:2:0,
  restart markers; progressive raises NotImplementedError)

These give `MediaDecoder(decoder="real")` a genuine decode path for
deterministic synthetic corpora; formats that do need external
libraries (MP3/AAC, any video codec) still raise
`NotImplementedError` with a clear message.

All decoders take `bytes` and return numpy arrays; all encoders are
deterministic, so media payloads synthesized from a seed round-trip
bit-identically across processes — the property the e2e media tests
pin.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (H,W) grayscale, (H,W,3) RGB or (H,W,4) RGBA → PNG bytes
    (8-bit, non-interlaced, filter 0 on every scanline)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color = 6
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 (H,W,C). Supports the web-common subset: bit depth
    8, color types 0/2/4/6, non-interlaced. All five scanline filters
    handled (None/Up vectorized; Sub/Average/Paeth sequential — our own
    encoder only emits filter 0, foreign files may use any)."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(PNG_MAGIC)
    width = height = None
    color = interlace = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} unsupported")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color} unsupported")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    scan = raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for r in range(height):
        f = filters[r]
        line = scan[r].copy()
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[r] = line
        elif f == 2:  # Up
            out[r] = (line + prev) & 0xFF
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[r, x - ch] if x >= ch else 0
                out[r, x] = (line[x] + left) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[r, x - ch] if x >= ch else 0
                out[r, x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = out[r, x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                out[r, x] = (line[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"PNG filter {f} invalid")
    return out.astype(np.uint8).reshape(height, width, ch)


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed) / PPM / PGM
# ---------------------------------------------------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H,W,3) RGB → 24-bit bottom-up BI_RGB BMP."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        arr[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    px = px.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]
    return px[::-1] if flip else px


def encode_ppm(arr: np.ndarray) -> bytes:
    """PPM/PGM encode with channel normalization: decode_png can yield
    (H,W,1) grayscale, (H,W,2) gray+alpha, or (H,W,4) RGBA — a naive P6
    header over those payloads mis-sizes the body (decode crashes or
    reads misaligned garbage). Squeeze 1/2 channels to P5 grayscale and
    drop alpha from RGBA before writing the 3-channel P6 body."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3:
        if arr.shape[2] in (1, 2):
            arr = np.ascontiguousarray(arr[:, :, 0])
        elif arr.shape[2] == 4:
            arr = np.ascontiguousarray(arr[:, :, :3])
    if arr.ndim == 2:
        return b"P5 %d %d 255\n" % (arr.shape[1], arr.shape[0]) + arr.tobytes()
    h, w, _ = arr.shape
    return b"P6 %d %d 255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while data[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    return px.reshape(h, w, ch) if ch == 3 else px.reshape(h, w)


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 mono [-1, 1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 mono samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch, width, rate, nframes = (
            f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes(),
        )
        raw = f.readframes(nframes)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


# ---------------------------------------------------------------------------
# Format sniffing + deterministic synthesis
# ---------------------------------------------------------------------------

def sniff(data: bytes) -> str:
    if data.startswith(PNG_MAGIC):
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P6", b"P5"):
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


def synth_image(seed: int, width: int = 48, height: int = 32) -> np.ndarray:
    """Deterministic RGB test image: seeded gradient + blocky noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    base = np.stack(
        [
            (xx * 255) // max(width - 1, 1),
            (yy * 255) // max(height - 1, 1),
            ((xx + yy) * 255) // max(width + height - 2, 1),
        ],
        axis=-1,
    )
    noise = rng.integers(0, 64, size=(height // 4 + 1, width // 4 + 1, 3))
    noise = np.repeat(np.repeat(noise, 4, axis=0), 4, axis=1)[:height, :width]
    return ((base + noise) % 256).astype(np.uint8)


def synth_audio(seed: int, rate: int = 8000, ms: int = 250) -> np.ndarray:
    """Deterministic mono tone burst: seeded frequency + AM envelope."""
    rng = np.random.default_rng(seed)
    freq = float(rng.uniform(110.0, 1760.0))
    n = rate * ms // 1000
    t = np.arange(n, dtype=np.float32) / rate
    env = 0.5 * (1 - np.cos(2 * np.pi * np.minimum(t / t[-1], 1.0)))
    return (np.sin(2 * np.pi * freq * t) * env * 0.8).astype(np.float32)


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81; stdlib + numpy only)
# ---------------------------------------------------------------------------
# Encoder: 8-bit baseline JFIF, 4:4:4 (no chroma subsampling), standard
# Annex-K quantization tables scaled IJG-style by `quality`, standard
# Annex-K Huffman tables (emitted as DHT, so decode is self-consistent).
# Decoder: baseline (SOF0/SOF1) with arbitrary DQT/DHT from the stream,
# sampling factors 1-2 per axis (4:4:4 / 4:2:2 / 4:2:0), restart
# markers, FF00 byte-stuffing. Progressive (SOF2) and arithmetic coding
# raise NotImplementedError. The DCT/IDCT and color transforms are
# vectorized numpy; the entropy coder is a per-symbol Python loop —
# acceptable at the small-batch sizes the actor-pool media stages use.

JPEG_MAGIC = b"\xff\xd8"

_JPEG_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _zigzag() -> np.ndarray:
    """Indices mapping zigzag position → row-major position."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZZ = _zigzag()          # zigzag pos → raster pos
_ZZ_INV = np.argsort(_ZZ)  # raster pos → zigzag pos


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c


_DCT = _dct_matrix()

# Annex K.3 "typical" Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(bits, values):
    """(bits, values) → {symbol: (code, length)} (canonical JPEG codes)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decoder(bits, values):
    """(bits, values) → {(length, code): symbol} for bitwise decode."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_JPEG_QY, _JPEG_QC):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(zz: np.ndarray, pred: int, dc_codes, ac_codes,
                  w: _BitWriter) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    w.put(code, length)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            w.put(zc, zl)
            run -= 16
        s = _category(v)
        ac, al = ac_codes[(run << 4) | s]
        w.put(ac, al)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        w.put(ec, el)
    return dc


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H,W) float, H/W multiples of 8 → (n, 8, 8) raster-ordered."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _dht_segment(tc_th: int, bits, values) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 75,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H,W) grayscale or (H,W,3) RGB → baseline JFIF JPEG bytes
    (Annex-K tables scaled by quality). subsample: "444" (default) or
    "420" (2×2 box-averaged chroma). restart_interval > 0 emits DRI +
    RSTn markers every that many MCUs (resync/robustness testing)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported image shape {arr.shape}")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    sub = subsample == "420" and not gray
    h, w = arr.shape[:2]
    qy, qc = _quality_tables(quality)

    # color transform → list of (plane, quant table, is_luma, (sh, sv))
    px = arr.astype(np.float64)
    y_samp = (2, 2) if sub else (1, 1)
    if gray:
        planes = [(px, qy, True, (1, 1))]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sub:
            # pad to even, then 2×2 box-average the chroma planes
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cb = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            cr = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = cb.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        planes = [
            (y, qy, True, y_samp), (cb, qc, False, (1, 1)),
            (cr, qc, False, (1, 1)),
        ]

    hmax = max(p[3][0] for p in planes)
    vmax = max(p[3][1] for p in planes)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_zz, comp_bw = [], []
    for plane, qt, _, (sh, sv) in planes:
        bh, bw = mcuy * sv * 8, mcux * sh * 8
        padded = np.pad(
            plane,
            ((0, bh - plane.shape[0]), (0, bw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = _blocks_of(padded)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        zz = np.rint(coef / qt).astype(np.int64).reshape(-1, 64)[:, _ZZ]
        comp_zz.append(zz)
        comp_bw.append(bw // 8)  # blocks per row

    # entropy-coded scan: interleaved MCUs, sh×sv blocks per component
    wtr = _BitWriter()
    dc_y, ac_y = _huff_codes(*_DC_LUMA), _huff_codes(*_AC_LUMA)
    dc_c, ac_c = _huff_codes(*_DC_CHROMA), _huff_codes(*_AC_CHROMA)
    preds = [0] * len(planes)
    scan = bytearray()
    rst = 0
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                scan += wtr.flush()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                preds = [0] * len(planes)
                mcu_in_seg = 0
            for ci, (_, _, luma, (sh, sv)) in enumerate(planes):
                dcc, acc = (dc_y, ac_y) if luma else (dc_c, ac_c)
                for by in range(sv):
                    for bx in range(sh):
                        bidx = (my * sv + by) * comp_bw[ci] + mx * sh + bx
                        preds[ci] = _encode_block(
                            comp_zz[ci][bidx], preds[ci], dcc, acc, wtr
                        )
            mcu_in_seg += 1
    scan += wtr.flush()

    # headers
    out = bytearray(JPEG_MAGIC)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        qy.reshape(-1)[_ZZ].astype(np.uint8)
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            qc.reshape(-1)[_ZZ].astype(np.uint8)
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = planes[ci][3]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, *_DC_LUMA) + _dht_segment(0x10, *_AC_LUMA)
    if not gray:
        out += _dht_segment(0x01, *_DC_CHROMA) + _dht_segment(0x11, *_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan + b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Bit reader over UNSTUFFED scan bytes (FF00 → FF already applied)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0  # past-end pad (valid streams end on EOB)
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


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(r: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (H,W) grayscale or (H,W,3) RGB. Supports
    SOF0/SOF1, sampling factors 1-2, restart intervals; progressive and
    arithmetic-coded streams raise NotImplementedError."""
    if not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, h, v, tq)
    height = width = None
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq:
                    vals = np.frombuffer(body, dtype=">u2", count=64, offset=bp)
                    bp += 128
                else:
                    vals = np.frombuffer(body, dtype=np.uint8, count=64, offset=bp)
                    bp += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZZ] = vals.astype(np.int32)
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1:bp + 17])
                n = sum(bits)
                values = list(body[bp + 17:bp + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, values)
                bp += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            _prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker {marker:#x} unsupported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = body[0]
            scan_sel = {}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_sel[cs] = (tdta >> 4, tdta & 0x0F)
            scan_start = pos
            # find the end of the entropy stream (next non-RST marker)
            p = scan_start
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] != 0x00 and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
            scan_bytes = data[scan_start:p]
            return _decode_scan(
                scan_bytes, comps, scan_sel, qtables, htables,
                height, width, restart,
            )
    raise ValueError("JPEG missing SOS")


def _decode_scan(scan_bytes, comps, scan_sel, qtables, htables,
                 height, width, restart):
    # split on restart markers; unstuff each segment
    segments = []
    cur = bytearray()
    i = 0
    n = len(scan_bytes)
    while i < n:
        b = scan_bytes[i]
        if b == 0xFF and i + 1 < n:
            nxt = scan_bytes[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors >2 unsupported")
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64)
        for (_, h, v, _) in comps
    ]
    # decode into per-component coefficient planes (IDCT per block)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_in_seg == restart:
                seg_idx += 1
                reader = _BitReader(
                    segments[seg_idx] if seg_idx < len(segments) else b""
                )
                preds = [0] * len(comps)
                mcu_in_seg = 0
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = scan_sel[cid]
                dc_tbl = htables[(0, td)]
                ac_tbl = htables[(1, ta)]
                qt = qtables[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _decode_huff(reader, dc_tbl)
                        preds[ci] += _receive_extend(reader, t)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _receive_extend(reader, s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZZ] = zz
                        block = _DCT.T @ (coef.reshape(8, 8) * qt) @ _DCT
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_in_seg += 1

    # upsample to full resolution, crop, color-convert
    full = []
    for ci, (_, ch, cv, _) in enumerate(comps):
        p = planes[ci] + 128.0
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:height, :width])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# AVI / MJPEG (RIFF 'AVI ' container, Motion-JPEG video; stdlib only)
# ---------------------------------------------------------------------------
# Writer: minimal single-stream AVI-1.0 — hdrl(avih + strl(strh/strf)),
# movi with one '00dc' chunk per baseline-JPEG frame, idx1 index. Frame
# payloads are the exact bytes produced by encode_jpeg, stored verbatim
# (MJPEG is "a JPEG per frame"), so container round-trips are byte-exact
# per frame. Reader: a plain RIFF chunk walk — no seeking heuristics, no
# OpenDML extensions. This is the honest stdlib-only video path the
# container allows: real parsing + real per-frame JPEG decode, while
# inter-frame codecs (H.264 etc.) stay NotImplementedError.

def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 4
) -> bytes:
    """Encoded-JPEG frame payloads → single-stream MJPEG AVI bytes."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    max_frame = max(len(f) for f in frames)

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        max_frame * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(frames), 0, 1,       # dwTotalFrames, dwInitialFrames, dwStreams
        max_frame,               # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0,             # dwFlags, wPriority, wLanguage
            0,                   # dwInitialFrames
            1, fps,              # dwScale, dwRate (fps = rate/scale)
            0, len(frames),      # dwStart, dwLength
            max_frame,           # dwSuggestedBufferSize
            0xFFFFFFFF, 0,       # dwQuality, dwSampleSize
            0, 0, width, height, # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets point at the chunk TAG, relative to 'movi' tag start
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, len(movi_body) - 4, len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(data: bytes) -> tuple[list[bytes], int, int, int]:
    """MJPEG AVI bytes → (JPEG frame payloads, fps, width, height).

    Walks RIFF chunks directly; only '00dc'/'00db' video chunks are
    collected, so audio-bearing files degrade gracefully to video-only."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI stream")
    usec_per_frame, width, height = 0, -1, -1
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal usec_per_frame, width, height
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body0 = pos + 8
            if tag == b"LIST":
                walk(buf, body0 + 4, body0 + size)
            elif tag == b"avih":
                usec_per_frame = struct.unpack_from("<I", buf, body0)[0]
                width, height = struct.unpack_from("<II", buf, body0 + 32)
            elif tag in (b"00dc", b"00db") and size:
                frames.append(buf[body0:body0 + size])
            pos = body0 + size + (size % 2)

    walk(data, 12, len(data))
    fps = round(1_000_000 / usec_per_frame) if usec_per_frame else 1
    return frames, max(fps, 1), width, height


def synth_video(
    seed: int, n_frames: int = 6, width: int = 48, height: int = 32,
    fps: int = 4, quality: int = 85,
) -> bytes:
    """Deterministic MJPEG AVI: the seeded synth_image panned 4 px/frame
    (temporal coherence, like a camera pass over a static scene)."""
    base = synth_image(seed, width, height)
    frames = [
        encode_jpeg(np.roll(base, -4 * i, axis=1), quality=quality)
        for i in range(n_frames)
    ]
    return encode_avi_mjpeg(frames, width, height, fps=fps)
