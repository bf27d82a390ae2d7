"""Multimodal column stages: binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns processed by actor-pool
``map_batches`` stages with SMALL batch sizes (rows are large — the
memory-aware sizing rule for binary payloads).

The container has no external codec libraries (PIL/ffmpeg/librosa), so
EXTERNAL formats (JPEG/PNG/WAV/MP4) are gated behind ``_HAS_CODECS`` and
raise under ``strict=True``.  The engine's own raw formats are REAL,
however — decode, resize, feature extraction and frame sampling are actual
math over actual pixel/sample buffers, implemented in pure numpy:

- ``ORI1`` image: 10-byte header (magic, u16 width, u16 height, u16
  channels, u16 pad) + uint8 pixels, row-major HWC.
- ``ORA1`` audio: 8-byte header (magic, u32 n_samples) + int16 PCM.
- ``ORV1`` video: 10-byte header (magic, u16 w, u16 h, u16 channels,
  u16 n_frames) + frames of ORI1-layout pixels.

Stages:
- :class:`ImageDecoder` — parse header + per-channel mean/std features
  computed from the pixels.
- :class:`ImageResizer` — REAL bilinear resize (align-corners sampling
  grid, separable weights) re-encoded as ORI1.
- :class:`AudioFeatures` — RMS + zero-crossing rate from the PCM.
- :class:`FrameSampler` — every-nth REAL frame slices + per-frame means.
- :func:`synth_media` — deterministic payload generator for tests/bench.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core.config import pool

_HAS_CODECS = False  # no PIL/ffmpeg in this container (external formats)
try:  # pragma: no cover - exercised only where codecs exist
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    pass

MAGIC_IMAGE = b"\x4f\x49"  # "OI"
MAGIC_AUDIO = b"\x4f\x41"  # "OA"
MAGIC_VIDEO = b"\x4f\x56"  # "OV"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def encode_image(pixels: np.ndarray) -> bytes:
    """(h, w, c) uint8 -> ORI1 bytes."""
    h, w, c = pixels.shape
    head = MAGIC_IMAGE + np.array([w, h, c, 0], dtype=np.uint16).tobytes()
    return head + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """ORI1 bytes -> (h, w, c) uint8 (zero-copy view over the buffer)."""
    if payload[:2] != MAGIC_IMAGE:
        raise ValueError("not an ORI1 image payload")
    w, h, c, _ = np.frombuffer(payload, dtype=np.uint16, count=4, offset=2)
    return np.frombuffer(payload, dtype=np.uint8, offset=10,
                         count=int(w) * int(h) * int(c)).reshape(int(h), int(w), int(c))


def encode_audio(samples: np.ndarray) -> bytes:
    head = MAGIC_AUDIO + b"\0\0" + np.array([samples.shape[0]], dtype=np.uint32).tobytes()
    return head + np.ascontiguousarray(samples, dtype=np.int16).tobytes()


def decode_audio(payload: bytes) -> np.ndarray:
    if payload[:2] != MAGIC_AUDIO:
        raise ValueError("not an ORA1 audio payload")
    n = int(np.frombuffer(payload, dtype=np.uint32, count=1, offset=4)[0])
    return np.frombuffer(payload, dtype=np.int16, offset=8, count=n)


def encode_video(frames: np.ndarray) -> bytes:
    """(f, h, w, c) uint8 -> ORV1 bytes."""
    f, h, w, c = frames.shape
    head = MAGIC_VIDEO + np.array([w, h, c, f], dtype=np.uint16).tobytes()
    return head + np.ascontiguousarray(frames, dtype=np.uint8).tobytes()


def decode_video(payload: bytes) -> np.ndarray:
    if payload[:2] != MAGIC_VIDEO:
        raise ValueError("not an ORV1 video payload")
    w, h, c, f = (int(v) for v in np.frombuffer(payload, dtype=np.uint16, count=4, offset=2))
    return np.frombuffer(payload, dtype=np.uint8, offset=10,
                         count=f * h * w * c).reshape(f, h, w, c)


def synth_media(batch: pa.Table) -> pa.Table:
    """doc rows -> deterministic REAL payloads in the engine's raw formats:
    images are gradient+checker patterns, audio a quantized sine, video a
    shifting gradient — every byte derived from doc_id, no RNG."""
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    payloads: list[bytes] = []
    kinds: list[str] = []
    for d in doc_id:
        d = int(d)
        kind = ("image", "audio", "video")[d % 3]
        kinds.append(kind)
        if kind == "image":
            w, h = 16 + d % 17, 16 + (d // 3) % 13
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 255 // max(1, w - 1)).astype(np.uint8),
                    (yy * 255 // max(1, h - 1)).astype(np.uint8),
                    (((xx // 4 + yy // 4) % 2) * 255).astype(np.uint8),
                ],
                axis=2,
            )
            payloads.append(encode_image(px))
        elif kind == "audio":
            n = 256 + d % 256
            t = np.arange(n)
            s = (np.sin(t * (0.05 + (d % 7) * 0.03)) * 12000).astype(np.int16)
            payloads.append(encode_audio(s))
        else:
            f, w, h = 2 + d % 6, 8 + d % 9, 8 + (d // 5) % 7
            yy, xx = np.mgrid[0:h, 0:w]
            frames = np.stack(
                [((xx + yy + 7 * fi) % 256).astype(np.uint8)[..., None]
                 for fi in range(f)]
            )
            payloads.append(encode_video(frames))
    return pa.table(
        {
            "media_id": pa.array(doc_id),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def _bilinear_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """REAL separable bilinear resize of (h, w, c) uint8 (align-corners)."""
    h, w, _ = px.shape
    xs = np.linspace(0.0, w - 1.0, out_w)
    ys = np.linspace(0.0, h - 1.0, out_h)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (xs - x0)[None, :, None]
    fy = (ys - y0)[:, None, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


class ImageDecoder:
    """ORI1 image -> (width, height, channels) + per-channel mean/std
    features computed from the REAL pixel buffer.  ``strict=True`` raises
    for external formats (no codecs in this container)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        width = np.empty(len(payloads), dtype=np.int64)
        height = np.empty(len(payloads), dtype=np.int64)
        chans = np.empty(len(payloads), dtype=np.int64)
        feats: list[list[float]] = []
        for i, p in enumerate(payloads):
            if p[:2] != MAGIC_IMAGE:
                if self.strict:
                    # strict means strict: no external decode path is
                    # implemented in this class, so PIL being importable
                    # must not flip strict mode into silently emitting
                    # -1/-1/-1 rows for undecodable payloads (r3 review)
                    raise NotImplementedError(
                        "external image formats are not decodable here "
                        "(only the ORI1 raw codec is implemented)"
                    )
                width[i] = height[i] = chans[i] = -1
                feats.append([])
                continue
            px = decode_image(p)
            height[i], width[i], chans[i] = px.shape
            f = px.astype(np.float64) / 255.0
            feats.append(
                np.concatenate([f.mean(axis=(0, 1)), f.std(axis=(0, 1))]).tolist()
            )
        return (
            batch.select(["media_id", "kind", "n_bytes"])
            .append_column("width", pa.array(width))
            .append_column("height", pa.array(height))
            .append_column("channels", pa.array(chans))
            .append_column("feat", pa.array(feats, pa.list_(pa.float64())))
        )


class ImageResizer:
    """ORI1 image -> bilinear-resized ORI1 image (real resample)."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for p in batch["payload"].to_pylist():
            px = decode_image(p)
            out.append(encode_image(_bilinear_resize(px, self.out_w, self.out_h)))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out, pa.binary()),
                "n_bytes": pa.array([len(p) for p in out], pa.int64()),
            }
        )


class AudioFeatures:
    """ORA1 PCM -> n_samples, RMS (millis), zero-crossing count."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_samples = []
        rms_milli = []
        zero_cross = []
        for p in batch["payload"].to_pylist():
            s = decode_audio(p).astype(np.float64)
            n_samples.append(s.shape[0])
            rms_milli.append(int(np.floor(np.sqrt((s * s).mean()) * 1000 / 32768)))
            zero_cross.append(int((np.diff(np.signbit(s)) != 0).sum()))
        return (
            batch.select(["media_id", "kind"])
            .append_column("n_samples", pa.array(n_samples, pa.int64()))
            .append_column("rms_milli", pa.array(rms_milli, pa.int64()))
            .append_column("zero_cross", pa.array(zero_cross, pa.int64()))
        )


class FrameSampler:
    """ORV1 video -> every-nth REAL frame: count + per-frame mean (milli)."""

    def __init__(self, every_n: int = 2):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = []
        frame_means: list[list[int]] = []
        for p in batch["payload"].to_pylist():
            frames = decode_video(p)[:: self.every_n]
            n_frames.append(frames.shape[0])
            frame_means.append(
                [int(np.floor(f.mean() * 1000 / 255)) for f in frames]
            )
        return (
            batch.select(["media_id", "kind"])
            .append_column("n_frames", pa.array(n_frames, pa.int64()))
            .append_column(
                "frame_mean_milli", pa.array(frame_means, pa.list_(pa.int64()))
            )
        )


def decode_images(ds: ray.data.Dataset, *, concurrency: int | None = None) -> ray.data.Dataset:
    """Small batch_size: payload rows are large, so batch x concurrency must
    fit the worker heap (the ray_guide memory-aware rule)."""
    return ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=512, concurrency=pool(concurrency)
    )


def resize_images(ds: ray.data.Dataset, out_w: int = 8, out_h: int = 8,
                  *, concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer, batch_format="pyarrow", batch_size=512,
        concurrency=pool(concurrency),
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
    )


def audio_features(ds: ray.data.Dataset, *, concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=512,
        concurrency=pool(concurrency),
    )


def sample_frames(ds: ray.data.Dataset, every_n: int = 2,
                  *, concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=512,
        concurrency=pool(concurrency), fn_constructor_kwargs=dict(every_n=every_n),
    )


def media_features(keys_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Rows-only driver query: synth -> REAL per-kind decode + features in
    one unified schema (media_id, kind, n_units, feat_milli): images ->
    pixel count + first-channel mean, audio -> sample count + RMS, video ->
    frame count + first-frame mean.  Deterministic, parallelism-invariant."""

    def feats(batch: pa.Table) -> pa.Table:
        m = synth_media(batch)
        ids = m["media_id"].to_numpy(zero_copy_only=False)
        kinds = m["kind"].to_pylist()
        n_units = np.empty(len(ids), dtype=np.int64)
        feat_milli = np.empty(len(ids), dtype=np.int64)
        for i, (k, p) in enumerate(zip(kinds, m["payload"].to_pylist())):
            if k == "image":
                px = decode_image(p)
                n_units[i] = px.shape[0] * px.shape[1]
                feat_milli[i] = int(np.floor(px[..., 0].mean() * 1000 / 255))
            elif k == "audio":
                s = decode_audio(p).astype(np.float64)
                n_units[i] = s.shape[0]
                feat_milli[i] = int(np.floor(np.sqrt((s * s).mean()) * 1000 / 32768))
            else:
                fr = decode_video(p)
                n_units[i] = fr.shape[0]
                feat_milli[i] = int(np.floor(fr[0].mean() * 1000 / 255))
        return pa.table(
            {
                "media_id": m["media_id"],
                "kind": m["kind"],
                "n_units": pa.array(n_units),
                "feat_milli": pa.array(feat_milli),
            }
        )

    return keys_ds.map_batches(feats, batch_format="pyarrow", batch_size=2048)


# --- perceptual image hash (near-dup across re-encodes) ----------------------


def ahash64(px: np.ndarray) -> int:
    """64-bit average hash: grayscale -> REAL bilinear 8x8 downsample ->
    brighter-than-mean bitmap.  Byte-identical files are not required —
    re-encoded / rescaled copies of the same picture collapse to the same
    (or Hamming-close) hash, which exact md5 dedup can never do."""
    gray = px.astype(np.float64).mean(axis=2, keepdims=True).astype(np.uint8)
    g = _bilinear_resize(gray, 8, 8)[..., 0].astype(np.float64)
    bits = (g > g.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class ImagePhash:
    """Actor stage: ORI1 payload -> (media_id, phash int64)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, kind, p in zip(batch["media_id"].to_pylist(),
                                batch["kind"].to_pylist(),
                                batch["payload"].to_pylist()):
            if kind != "image":
                continue
            ids.append(mid)
            hashes.append(np.int64(np.uint64(ahash64(decode_image(p)))))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "phash": pa.array(hashes, pa.int64())})


def image_phash_groups(keys_ds: ray.data.Dataset,
                       *, concurrency: int | None = None) -> ray.data.Dataset:
    """Rows-only query: synth -> decode -> perceptual hash -> bucketed
    group sizes.  The synthetic corpus renders the SAME gradient+checker
    picture at many resolutions (byte-distinct ORI1 payloads), so the
    perceptual groups are genuinely multi-member where exact dedup finds
    nothing — (phash, n_images, min_media_id) per group."""
    import pandas as pd

    from ..stages.grouping import bucketed_group_apply

    def to_hash(batch: pa.Table) -> pa.Table:
        return ImagePhash()(synth_media(batch))

    hashes = keys_ds.map_batches(to_hash, batch_format="pyarrow",
                                 batch_size=512)

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("phash", as_index=False).agg(
            n_images=("media_id", "size"), min_media_id=("media_id", "min"))
        out["n_images"] = out["n_images"].astype(np.int64)
        return out

    return bucketed_group_apply(hashes, ["phash"], groups)
