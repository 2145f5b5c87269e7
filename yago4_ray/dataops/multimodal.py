"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Ray-side architecture (schemas, actor signatures, batch sizing,
output layout) is real and tested; the codec calls themselves are
STUBBED — this container ships no image/audio libraries — behind
`decoder="fake"` (deterministic bytes-derived features, used in tests)
or `decoder="real"` (raises NotImplementedError until PIL/ffmpeg-class
libs exist in the runtime).

Batch-size guidance: media rows are wide — size `batch_size` so
batch_size × concurrency × avg_payload stays well under the worker
heap; prefer small batches (32–256) and let the object store stream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

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


def media_table_from_refs(refs: list[str], kind: str = "image") -> pa.Table:
    """Deterministic synthetic media rows from ref strings (payload =
    seeded bytes): the stand-in for real binary ingestion."""
    payloads = []
    for r in refs:
        h = hashlib.blake2b(r.encode(), digest_size=32).digest()
        payloads.append(h * 8)  # 256-byte fake payload
    return pa.table(
        {
            "media_id": pa.array(refs, pa.string()),
            "kind": pa.array([kind] * len(refs), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/x-fake"] * len(refs), pa.string()),
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
        self.decoder = decoder
        self.feature_dim = feature_dim
        self.target_size = target_size
        if decoder == "real":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real media decoding needs an image library not present "
                    "in this container; use decoder='fake'"
                ) from e

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic features from payload bytes: stable across
        # processes, exercises the full Arrow plumbing
        h = hashlib.blake2b(payload, digest_size=self.feature_dim * 4).digest()
        return np.frombuffer(h, dtype=np.uint32).astype(np.float32) / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real decode path is stubbed")
        feats = [
            self._fake_features(p.as_py() if hasattr(p, "as_py") else p)
            for p in batch["payload"]
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "width": pa.array(
                    [self.target_size[0]] * len(feats), pa.int32()
                ),
                "height": pa.array(
                    [self.target_size[1]] * len(feats), pa.int32()
                ),
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
    """Deterministic frame-sampling timestamps for video rows (plumbing
    for the stubbed video path)."""
    if duration_ms <= 0:
        return [0]
    return list(range(0, duration_ms, every_ms))
