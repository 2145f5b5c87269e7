"""Stdlib-only media codecs for the multimodal stages.

This container ships no PIL/ffmpeg, but several real formats need
nothing beyond the standard library + numpy:

- PNG  (zlib inflate + scanline unfilter; encode with filter 0)
- BMP  (uncompressed 24-bit BI_RGB)
- PPM/PGM (binary P6/P5)
- WAV  (stdlib `wave`, PCM 8/16/32-bit)

These give `MediaDecoder(decoder="real")` a genuine decode path for
deterministic synthetic corpora; compressed formats that do need
external libraries (JPEG, MP3/AAC, any video codec) still raise
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
