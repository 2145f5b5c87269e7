"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Two decoder modes:

- `decoder="real"` — actual codec work via the stdlib+numpy codecs in
  `yago4_ray.dataops.codecs` (PNG/BMP/PPM/baseline-JPEG images, PCM
  WAV audio, MJPEG-AVI video): decode, grid-pooled grayscale features
  for images, segment-RMS features for audio, frame-sampled mean
  features for video, real width/height/duration. Formats that require
  external libraries this container doesn't ship (MP3, inter-frame
  video codecs) raise `NotImplementedError` with a clear message.
- `decoder="fake"` — deterministic bytes-derived features with no
  decode, for plumbing tests and unknown payloads.

Batch-size guidance: media rows are wide — size `batch_size` so
batch_size × concurrency × avg_payload stays well under the worker
heap; prefer small batches (32–256) and let the object store stream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from . import codecs

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),       # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),          # -1 when unknown
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _ref_seed(ref: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(ref.encode(), digest_size=8).digest(), "little"
    )


def media_table_from_refs(
    refs: list[str], kind: str = "image", payload: str = "fake"
) -> pa.Table:
    """Deterministic synthetic media rows from ref strings.

    payload="fake": opaque seeded bytes (pure plumbing).
    payload="real": genuinely encoded media — a seeded PNG for images,
    a seeded 16-bit PCM WAV tone for audio — so `decoder="real"` has
    actual codec work to do, bit-identical across processes."""
    payloads, mimes = [], []
    for r in refs:
        if payload == "real" and kind == "image":
            payloads.append(codecs.encode_png(codecs.synth_image(_ref_seed(r))))
            mimes.append("image/png")
        elif payload == "jpeg" and kind == "image":
            payloads.append(
                codecs.encode_jpeg(codecs.synth_image(_ref_seed(r)), quality=85)
            )
            mimes.append("image/jpeg")
        elif payload == "real" and kind == "audio":
            payloads.append(
                codecs.encode_wav(codecs.synth_audio(_ref_seed(r), rate=8000), 8000)
            )
            mimes.append("audio/wav")
        elif payload == "real" and kind == "video":
            payloads.append(codecs.synth_video(_ref_seed(r)))
            mimes.append("video/x-msvideo")
        else:
            h = hashlib.blake2b(r.encode(), digest_size=32).digest()
            payloads.append(h * 8)  # 256-byte fake payload
            mimes.append("application/x-fake")
    return pa.table(
        {
            "media_id": pa.array(refs, pa.string()),
            "kind": pa.array([kind] * len(refs), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array([-1] * len(refs), pa.int32()),
            "height": pa.array([-1] * len(refs), pa.int32()),
            "duration_ms": pa.array([-1] * len(refs), pa.int32()),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature stage. One decoder instance per actor;
    `__call__` per (small) Arrow batch of binary payloads."""

    def __init__(self, decoder: str = "fake", feature_dim: int = 16,
                 target_size: tuple[int, int] = (64, 64)):
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.feature_dim = feature_dim
        self.target_size = target_size
        # grid side for image grid-pool features, fixed per actor
        self.grid = max(1, int(np.sqrt(feature_dim)))

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic features from payload bytes: stable across
        # processes, exercises the full Arrow plumbing
        h = hashlib.blake2b(payload, digest_size=self.feature_dim * 4).digest()
        return np.frombuffer(h, dtype=np.uint32).astype(np.float32) / 2**32

    def _pad(self, f: np.ndarray) -> np.ndarray:
        if len(f) < self.feature_dim:
            f = np.pad(f, (0, self.feature_dim - len(f)))
        return f[: self.feature_dim].astype(np.float32)

    def _image_features(self, px: np.ndarray) -> np.ndarray:
        """Grid-pooled grayscale means: g×g cell averages in [0, 1]."""
        gray = px.astype(np.float32)
        if gray.ndim == 3:
            gray = gray[:, :, : 3].mean(axis=2)
        h, w = gray.shape
        g = self.grid
        rows = (np.arange(h) * g) // h
        cols = (np.arange(w) * g) // w
        cell = rows[:, None] * g + cols[None, :]
        sums = np.bincount(cell.ravel(), weights=gray.ravel(), minlength=g * g)
        counts = np.bincount(cell.ravel(), minlength=g * g)
        return self._pad(sums / np.maximum(counts, 1) / 255.0)

    def _audio_features(self, x: np.ndarray) -> np.ndarray:
        """Segment RMS over feature_dim equal slices of the clip."""
        k = self.feature_dim
        if len(x) == 0:
            return np.zeros(k, dtype=np.float32)
        bounds = (np.arange(k + 1) * len(x)) // k
        seg = np.add.reduceat(x.astype(np.float64) ** 2, bounds[:-1])
        n = np.maximum(np.diff(bounds), 1)
        return self._pad(np.sqrt(seg / n))

    def _decode_real(self, payload: bytes) -> tuple[np.ndarray, int, int, int]:
        """→ (features, width, height, duration_ms)."""
        fmt = codecs.sniff(payload)
        if fmt == "png":
            px = codecs.decode_png(payload)
        elif fmt == "bmp":
            px = codecs.decode_bmp(payload)
        elif fmt == "ppm":
            px = codecs.decode_ppm(payload)
        elif fmt == "jpeg":
            px = codecs.decode_jpeg(payload)
        elif fmt == "wav":
            x, rate = codecs.decode_wav(payload)
            return self._audio_features(x), -1, -1, int(len(x) * 1000 / rate)
        elif fmt == "avi":
            # MJPEG video: sample frames on the 1 s grid (frame_sample_plan),
            # decode each sampled JPEG, mean-pool the per-frame grid features
            frames, fps, w, h = codecs.decode_avi_mjpeg(payload)
            duration_ms = int(len(frames) * 1000 / fps)
            idxs = sorted(
                {
                    min(ts * fps // 1000, len(frames) - 1)
                    for ts in frame_sample_plan(duration_ms)
                }
            )
            feats = [
                self._image_features(codecs.decode_jpeg(frames[i])) for i in idxs
            ]
            return (
                np.mean(feats, axis=0).astype(np.float32),
                w,
                h,
                duration_ms,
            )
        else:
            raise NotImplementedError(
                "real decode supports PNG/BMP/PPM/JPEG images, WAV audio and "
                "MJPEG-AVI video (stdlib+numpy codecs); MP3 / inter-frame "
                "video codecs need external libraries not in this container "
                "— use decoder='fake' for opaque payloads"
            )
        h, w = px.shape[:2]
        return self._image_features(px), w, h, -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, widths, heights, durations = [], [], [], []
        for p in batch["payload"]:
            payload = p.as_py() if hasattr(p, "as_py") else p
            if self.decoder == "real":
                f, w, h, d = self._decode_real(payload)
            else:
                f, w, h, d = (
                    self._fake_features(payload),
                    self.target_size[0],
                    self.target_size[1],
                    -1,
                )
            feats.append(f)
            widths.append(w)
            heights.append(h)
            durations.append(d)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_ms": pa.array(durations, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def decode_media(
    ds: Dataset,
    decoder: str = "fake",
    feature_dim: int = 16,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
) -> Dataset:
    """Media rows → (media_id, kind, width, height, features)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_args=(decoder, feature_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_plan(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Deterministic frame-sampling timestamps for video rows (shared by
    MediaDecoder's AVI branch and FrameSampler)."""
    if duration_ms <= 0:
        return [0]
    return list(range(0, duration_ms, every_ms))


class FrameSampler:
    """Actor-pool frame-sampling stage: video rows fan out to one IMAGE
    row per sampled frame (`media_id#t<ms>`, payload = that frame's JPEG
    bytes, verbatim from the container), so the output composes directly
    with MediaResizer / MediaDecoder. Non-video rows and undecodable
    video payloads pass through unchanged with frame_ts_ms = -1."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, payloads, mimes = [], [], [], []
        widths, heights, durations, ts_out = [], [], [], []

        def passthrough(i: int) -> None:
            ids.append(batch["media_id"][i].as_py())
            kinds.append(batch["kind"][i].as_py())
            payloads.append(batch["payload"][i].as_py())
            mimes.append(batch["mime"][i].as_py())
            widths.append(batch["width"][i].as_py())
            heights.append(batch["height"][i].as_py())
            durations.append(batch["duration_ms"][i].as_py())
            ts_out.append(-1)

        for i in range(batch.num_rows):
            payload = batch["payload"][i].as_py()
            if (
                batch["kind"][i].as_py() != "video"
                or codecs.sniff(payload) != "avi"
            ):
                passthrough(i)
                continue
            frames, fps, w, h = codecs.decode_avi_mjpeg(payload)
            duration_ms = int(len(frames) * 1000 / fps)
            mid = batch["media_id"][i].as_py()
            seen: set[int] = set()
            for ts in frame_sample_plan(duration_ms, self.every_ms):
                fi = min(ts * fps // 1000, len(frames) - 1)
                if fi in seen:
                    continue
                seen.add(fi)
                ids.append(f"{mid}#t{ts}")
                kinds.append("image")
                payloads.append(frames[fi])
                mimes.append("image/jpeg")
                widths.append(w)
                heights.append(h)
                durations.append(-1)
                ts_out.append(ts)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_ms": pa.array(durations, pa.int32()),
                "frame_ts_ms": pa.array(ts_out, pa.int32()),
            }
        )


def sample_frames(
    ds: Dataset,
    every_ms: int = 1000,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 32,
) -> Dataset:
    """Video rows → per-sampled-frame image rows (+ passthrough others);
    feeds resize_media / decode_media directly."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(every_ms,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_pixels(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index sampling (no image
    library): rows/cols are gathered with two integer index arrays —
    one vectorized take, any channel count."""
    h, w = px.shape[:2]
    rows = np.minimum((np.arange(height) * h) // max(height, 1), h - 1)
    cols = np.minimum((np.arange(width) * w) // max(width, 1), w - 1)
    return px[rows[:, None], cols[None, :]]


class MediaResizer:
    """Actor-pool resize stage: decode (stdlib codecs) → nearest-neighbor
    resize → re-encode as PPM (stdlib). Non-image kinds and undecodable
    payloads pass through untouched with resized=False, so the stage can
    sit in a mixed media pipeline without dropping rows."""

    def __init__(self, width: int = 64, height: int = 64):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, widths, heights, mimes, resized = [], [], [], [], []
        for p, kind, mime in zip(
            batch["payload"], batch["kind"], batch["mime"]
        ):
            payload = p.as_py()
            out = None
            if kind.as_py() == "image":
                fmt = codecs.sniff(payload)
                decode = {
                    "png": codecs.decode_png,
                    "bmp": codecs.decode_bmp,
                    "ppm": codecs.decode_ppm,
                    "jpeg": codecs.decode_jpeg,
                }.get(fmt)
                if decode is not None:
                    out = resize_pixels(decode(payload), self.width, self.height)
            if out is None:
                payloads.append(payload)
                widths.append(-1)
                heights.append(-1)
                mimes.append(mime.as_py())
                resized.append(False)
            else:
                payloads.append(codecs.encode_ppm(out))
                widths.append(self.width)
                heights.append(self.height)
                mimes.append("image/x-portable-pixmap")
                resized.append(True)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "resized": pa.array(resized, pa.bool_()),
            }
        )


def resize_media(
    ds: Dataset,
    width: int = 64,
    height: int = 64,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
) -> Dataset:
    """Media rows → same rows with image payloads resized to
    width×height (PPM re-encode); output feeds decode_media directly."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
