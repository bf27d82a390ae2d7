"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as ``binary`` columns with typed
metadata columns, processed by actor-pool ``map_batches`` stages.  The codec
libraries (PIL/ffmpeg/librosa) are NOT in this container, so the decode
kernels are deterministically FAKED behind ``_HAS_CODECS`` (clearly marked)
— the Ray-side plumbing (schema, batch sizing for large binary rows, actor
signature, output layout) is real and tested:

- :class:`ImageDecoder` — binary -> (width, height, mode) metadata + a
  feature vector; small ``batch_size`` because rows are large (the
  memory-aware sizing rule for binary payloads).
- :class:`FrameSampler` — "video" -> every-nth-frame offsets.
- :func:`synth_media` — deterministic fake payloads for tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core.config import pool

_HAS_CODECS = False  # no PIL/ffmpeg in this container
try:  # pragma: no cover - exercised only where codecs exist
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    pass

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def synth_media(batch: pa.Table) -> pa.Table:
    """doc rows -> deterministic fake media payloads (hash-derived bytes)."""
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    kinds = np.array(["image", "audio", "video"])[doc_id % 3]
    payloads = [
        (int(d) * 2654435761 % (1 << 32)).to_bytes(4, "little") * (64 + int(d) % 64)
        for d in doc_id
    ]
    return pa.table(
        {
            "media_id": pa.array(doc_id),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class ImageDecoder:
    """binary image -> (width, height, mode, feat: list<float>).

    With codecs present this would be ``PIL.Image.open`` + a resize +
    channel-mean feature.  Here the decode is a deterministic fake keyed by
    the payload bytes; raising instead is available via ``strict=True``.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not _HAS_CODECS:
            raise NotImplementedError("image codecs not available in this environment")
        payloads = batch["payload"].to_pylist()
        h = np.array([len(p) for p in payloads], dtype=np.int64)
        width = 16 + (h % 16) * 4
        height = 16 + ((h // 16) % 16) * 4
        feats = np.stack(
            [np.frombuffer(p[:16].ljust(16, b"\0"), dtype=np.uint8).astype(np.float64) / 255.0
             for p in payloads]
        )
        return (
            batch.select(["media_id", "kind", "n_bytes"])
            .append_column("width", pa.array(width))
            .append_column("height", pa.array(height))
            .append_column("feat", pa.array(feats.tolist(), pa.list_(pa.float64())))
        )


class FrameSampler:
    """'video' payload -> sampled frame offsets (every nth 4-byte 'frame')."""

    def __init__(self, every_n: int = 8):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bytes = batch["n_bytes"].to_numpy(zero_copy_only=False)
        offsets = [list(range(0, int(nb), 4 * self.every_n)) for nb in n_bytes]
        return (
            batch.select(["media_id", "kind"])
            .append_column("frame_offsets", pa.array(offsets, pa.list_(pa.int64())))
            .append_column("n_frames", pa.array([len(o) for o in offsets], pa.int64()))
        )


def decode_images(ds: ray.data.Dataset, *, concurrency: int | None = None) -> ray.data.Dataset:
    """Small batch_size: payload rows are large, so batch x concurrency must
    fit the worker heap (the ray_guide memory-aware rule)."""
    return ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=512, concurrency=pool(concurrency)
    )


def sample_frames(ds: ray.data.Dataset, every_n: int = 8,
                  *, concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=512,
        concurrency=pool(concurrency), fn_constructor_kwargs=dict(every_n=every_n),
    )
