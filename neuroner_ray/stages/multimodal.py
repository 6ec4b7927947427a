"""Multimodal column stages — real Ray plumbing, stubbed codecs.

Images/audio/video are opaque ``binary`` columns with typed metadata
(the brief's multimodal requirement). The decode/resize/frame-sample
kernels need codec libraries absent from this container, so the codec step
is stubbed: ``DeterministicFakeCodec`` (default; a seeded, content-hashed
fake that makes the full pipeline testable end-to-end) or
``strict=True`` → ``NotImplementedError`` marking exactly where a real
libjpeg/ffmpeg call goes. Everything Ray-side is real and tested: schemas,
actor-pool signature, per-batch memory sizing (small batches for large
payloads), and output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DeterministicFakeCodec:
    """Stands in for PIL/ffmpeg: output depends only on payload bytes.

    ``decode_image`` pixels are an md5-seeded arithmetic ramp: with
    u = first 8 md5 bytes little-endian (DuckDB ``md5_number_upper``),
    pixel j = (u % 2^32 + j * ((u >> 32) | 1)) % 256 in C order — chosen so
    the whole decode is SQL-mirrorable and the features oracle can check
    the pipeline end-to-end (``doc_oracle.media_image_features_sql``)."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        u = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        start = u & 0xFFFFFFFF
        step = (u >> 32) | 1
        w = width if width > 0 else 16
        ht = height if height > 0 else 16
        j = np.arange(w * ht * 3, dtype=np.int64)
        return ((start + j * step) % 256).astype(np.uint8).reshape(ht, w, 3)

    def decode_audio(self, payload: bytes, duration_ms: int) -> np.ndarray:
        """Fake 1 kHz int16 stream, length = duration_ms samples — same
        md5-arithmetic ramp family as decode_image (SQL-mirrorable)."""
        u = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        start = u & 0xFFFFFFFF
        step = (u >> 32) | 1
        j = np.arange(max(duration_ms, 1), dtype=np.int64)
        return (((start + j * step) % 65536) - 32768).astype(np.int32)

    def sample_frames(self, payload: bytes, duration_ms: int, fps: float) -> list[bytes]:
        n = max(1, int(max(duration_ms, 1000) / 1000 * fps))
        return [
            hashlib.blake2b(payload + bytes([i % 256]), digest_size=16).digest()
            for i in range(min(n, 32))
        ]


class ImageFeatureExtractor:
    """Actor-pool stage: decode + mean-pool features per image.

    ``map_batches(ImageFeatureExtractor, batch_size=64, concurrency=N)`` —
    batch_size deliberately small: payload bytes dominate block memory
    (ray_guide: size batches so batch × concurrency fits worker heaps).
    """

    def __init__(self, strict: bool = False, resize_to: int = 8):
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL/libjpeg — not in this container; "
                "swap DeterministicFakeCodec for a real codec here"
            )
        self.codec = DeterministicFakeCodec()
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, px_sums, n_pxs = [], [], []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = self.codec.decode_image(payload or b"", w, h)
            # images smaller than the pooling grid would make array_split
            # emit empty chunks → NaN features; nearest-neighbor upsample
            # to at least resize_to per axis first (deterministic)
            for axis in (0, 1):
                if img.shape[axis] < self.resize_to:
                    reps = -(-self.resize_to // img.shape[axis])
                    img = np.repeat(img, reps, axis=axis)
            # exact integer pixel sum/count alongside the float features —
            # downstream summaries derived from these stay oracle-exact
            # (integer SQL sum, no float32 quantization in the way)
            px_sums.append(int(img.sum()))
            n_pxs.append(int(img.size))
            # "resize": block-mean downsample to resize_to x resize_to
            ys = np.array_split(img, self.resize_to, axis=0)
            pooled = np.stack(
                [
                    np.concatenate(
                        [b.mean(axis=(0, 1)) for b in np.array_split(row, self.resize_to, axis=1)]
                    )
                    for row in ys
                ]
            ).ravel()
            feats.append(np.round(pooled / 255.0, 6).astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
                "px_sum": pa.array(px_sums, pa.int64()),
                "n_px": pa.array(n_pxs, pa.int64()),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: sample frames at ``fps`` → exploded frame rows."""

    def __init__(self, fps: float = 1.0, strict: bool = False):
        if strict:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg — not in this container"
            )
        self.codec = DeterministicFakeCodec()
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            for i, fb in enumerate(
                self.codec.sample_frames(payload or b"", dur, self.fps)
            ):
                mids.append(mid)
                fidx.append(i)
                frames.append(fb)
        return pa.table(
            {
                "media_id": pa.array(mids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def extract_image_features(media: Dataset, concurrency=(1, 4)) -> Dataset:
    return media.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def sample_video_frames(media: Dataset, fps: float = 1.0, concurrency=(1, 4)) -> Dataset:
    return media.map_batches(
        VideoFrameSampler,
        fn_constructor_args=(fps,),
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )


class AudioWindowEnergy:
    """Actor-pool stage: decode audio → per-window RMS energy rows.

    The fake decode is SQL-mirrorable (``doc_oracle`` convention): with
    u = md5_number_upper(payload), sample j of the 1 kHz stream is
    ((u % 2^32 + j·((u >> 32)|1)) % 65536) − 32768; a real implementation
    swaps ``decode_audio`` for libsndfile/ffmpeg at the ``strict`` site.
    Energy per ``window``-sample window = mean(sample²) rounded to 4
    decimals (integer squares are exact in float64, so the rounding is the
    only float op and matches DuckDB's)."""

    def __init__(self, window: int = 256, strict: bool = False):
        if strict:
            raise NotImplementedError(
                "real audio decode requires libsndfile/ffmpeg — not in "
                "this container"
            )
        self.codec = DeterministicFakeCodec()
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        mids, widx, energy = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            s = self.codec.decode_audio(payload or b"", dur).astype(np.float64)
            for w in range(0, len(s), self.window):
                seg = s[w : w + self.window]
                mids.append(mid)
                widx.append(w // self.window)
                energy.append((seg * seg).mean())
        return pa.table(
            {
                "media_id": pa.array(mids, pa.string()),
                "window_idx": pa.array(widx, pa.int64()),
                "energy": pa.array(
                    round_half_away(energy, 4), pa.float64()
                ),
            }
        )


def audio_window_energy(
    media: Dataset, window: int = 256, concurrency=(1, 4)
) -> Dataset:
    return media.map_batches(
        AudioWindowEnergy,
        fn_constructor_args=(window,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
