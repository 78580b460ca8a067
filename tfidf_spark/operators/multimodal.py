"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched kernels over mapInPandas.

The Spark-side plumbing (schemas, partition sizing, UDF signatures,
batch shapes) is real and tested. Codecs:

- ``StdlibCodec`` (the default): REAL decode on all three modalities
  with zero external deps — a pure-stdlib PNG decoder (zlib inflate +
  all five scanline defilters incl. Paeth, functions/png.py), PCM16 WAV
  via the stdlib ``wave`` module, and an uncompressed-DIB RIFF-AVI
  demuxer whose frame sampler skips unselected frames without reading
  their bytes (functions/avi.py). Compressed video (h264/vp9) raises
  with a routing message — those need external decoders by nature.
- ``DeterministicFakeCodec``: seeded, shape-correct stand-in kept for
  pipeline tests that need payloads cheaper than real encodes.
- ``LibraryCodec``: the plug-in base a real deployment overrides with
  Pillow / torchaudio / pyav.

Scale notes baked into the design:
- binary payloads dominate row size -> ``media_repartition`` targets
  bytes-per-partition, not rows (a 100-row partition of 4K videos is
  already gigabytes).
- decode kernels are mapInPandas iterators: one Python worker handles a
  stream of Arrow batches, never materializing a partition.
- features come back as fixed-width ``array<float>`` so downstream ANN
  (operators/similarity.py) consumes them without reshaping.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, mime string, n_bytes bigint, "
    "width int, height int, duration_ms int, payload binary"
)


class LibraryCodec:
    """Plug-in point for real decoders. Not available in this container."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image decode requires Pillow/opencv — not installed here; "
            "swap in DeterministicFakeCodec for pipeline tests"
        )

    def decode_audio(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError("audio decode requires soundfile/torchaudio")

    def sample_frames(self, payload: bytes, every_ms: int) -> list[np.ndarray]:
        raise NotImplementedError("video frame sampling requires pyav/ffmpeg")


class StdlibCodec(LibraryCodec):
    """Real decode for the formats a pure-stdlib container can handle:
    PNG images (functions/png.py), PCM16 WAV audio, and uncompressed-DIB
    AVI video (functions/avi.py) — the frame sampler walks chunk headers
    and never reads skipped frames' bytes. Compressed video (h264 etc.)
    still raises via LibraryCodec: transcode upstream or plug in pyav."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        from tfidf_spark.functions.png import png_decode

        return png_decode(payload)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        from tfidf_spark.functions.wav import wav_decode

        return wav_decode(payload)

    def sample_frames(self, payload: bytes, every_ms: int) -> list[np.ndarray]:
        from tfidf_spark.functions.avi import avi_sample_frames

        return avi_sample_frames(payload, every_ms)


class DeterministicFakeCodec(LibraryCodec):
    """Seeded, shape-correct stand-in: output depends only on the payload
    bytes, so tests are reproducible under any partitioning."""

    def _rng(self, payload: bytes):
        return np.random.default_rng(np.frombuffer(payload[:16].ljust(16, b"\0"), dtype=np.uint64))

    def decode_image(self, payload: bytes) -> np.ndarray:
        return self._rng(payload).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        return self._rng(payload).standard_normal(1600).astype(np.float32)

    def sample_frames(self, payload: bytes, every_ms: int) -> list[np.ndarray]:
        rng = self._rng(payload)
        return [
            rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(4)
        ]


class PipelineCodec(StdlibCodec):
    """The default pipeline codec: REAL decode on all three modalities —
    PNG images, PCM16 WAV audio, uncompressed-DIB AVI video."""


def media_repartition(df: DataFrame, target_bytes: int = 256 << 20) -> DataFrame:
    """Repartition a media table by PAYLOAD BYTES, not row count."""
    total = df.agg(F.sum("n_bytes")).collect()[0][0] or 0
    nparts = max(1, int(total // target_bytes) + 1)
    return df.repartition(nparts)


def extract_features(
    media: DataFrame,
    codec: LibraryCodec | None = None,
    feature_dim: int = 64,
) -> DataFrame:
    """``(media_id, kind, feature array<float>)`` via a mapInPandas kernel.

    The feature is a seeded random projection of the decoded pixel/sample
    array — a deterministic stand-in for an embedding model's output with
    the same schema/batch shape (the decode underneath is REAL for
    image/audio via PipelineCodec).
    """
    codec = codec or PipelineCodec()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = {}  # per-shape cached projection matrices (seeded)

        def project(arr: np.ndarray) -> np.ndarray:
            flat = arr.astype(np.float64).ravel()
            key = flat.size
            if key not in proj:
                proj[key] = np.random.default_rng(key).standard_normal(
                    (key, feature_dim)
                ) / np.sqrt(key)
            return (flat @ proj[key]).astype(np.float32)

        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload)
                if kind == "image":
                    arr = codec.decode_image(payload)
                elif kind == "audio":
                    arr = codec.decode_audio(payload)
                else:  # video: mean-pool sampled frames
                    frames = codec.sample_frames(payload, every_ms=1000)
                    arr = np.mean([f.astype(np.float64) for f in frames], axis=0)
                feats.append(project(arr).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, "media_id bigint, kind string, feature array<float>")


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W[, C]) array — pure numpy
    index arithmetic (pixel-center sampling), deterministic, no
    interpolation library. The standard pre-embedding normalization step
    (models want fixed input shapes)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return arr[rows[:, None], cols[None, :]]


def resize_images(
    media: DataFrame,
    out_h: int = 16,
    out_w: int = 16,
    codec: LibraryCodec | None = None,
) -> DataFrame:
    """``(media_id, height, width, pixels array<int>)``: decode each
    image payload (REAL PNG decode by default) and resize to a fixed
    shape — the mapInPandas batch form of the brief's "resize" step.
    Pixels return flattened row-major uint8 values; downstream feature
    extraction reshapes to (out_h, out_w, C)."""
    codec = codec or PipelineCodec()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = codec.decode_image(bytes(payload))
                small = resize_nearest(px, out_h, out_w)
                out.append(
                    {
                        "media_id": mid,
                        "height": out_h,
                        "width": out_w,
                        "pixels": small.astype(np.int64).ravel().tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, "media_id bigint, height int, width int, pixels array<bigint>"
    )


def synth_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table matching MEDIA_SCHEMA. Every modality
    carries a REAL byte stream — PNG images, PCM16 WAV audio, and
    uncompressed-DIB AVI video (functions/png.py + functions/avi.py
    encoders) — so the decode path downstream exercises genuine codecs."""
    from tfidf_spark.functions.avi import avi_encode
    from tfidf_spark.functions.png import png_encode
    from tfidf_spark.functions.wav import wav_encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, i])
                kind = kinds[i % 3]
                if kind == "image":
                    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                    payload = png_encode(px)
                elif kind == "audio":
                    payload = wav_encode(
                        rng.standard_normal(1600).astype(np.float32) * 0.3
                    )
                else:
                    frames = [
                        rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                        for _ in range(8)
                    ]
                    payload = avi_encode(frames, fps=2)
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "mime": {"image": "image/png", "audio": "audio/wav",
                                 "video": "video/mp4"}[kind],
                        "n_bytes": len(payload),
                        "width": 8 if kind != "audio" else 0,
                        "height": 8 if kind != "audio" else 0,
                        "duration_ms": 0 if kind == "image" else 4000,
                        "payload": payload,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)
