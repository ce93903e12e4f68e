"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB multimodal corpora:
- media travels as `binary` columns with a metadata struct (mime, width,
  height, duration_ms, sample_rate, ...) — Spark shuffles/stores binary
  natively, and parquet keeps large binaries in their own column chunks so
  metadata-only queries never read the bytes (column pruning).
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` functions: one Python worker call per batch, zero
  per-row overhead; partitioning controls parallelism.
- the actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
  the decode kernels are STUBBED: a deterministic fake keyed on the bytes'
  hash, behind `_HAVE_CODECS` gates. The Spark-side plumbing — schemas,
  batch iteration, UDF signatures, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

try:  # real decoders would be imported here (PIL, soundfile, av, ...)
    import PIL  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False


def _fake_decode(content: bytes, out_dim: int) -> list[float]:
    """Deterministic stand-in for a real decode+embed kernel: features are
    derived from the content digest, so tests are reproducible and the
    pipeline shape (bytes in → float vector out) is exercised for real."""
    h = hashlib.sha256(content).digest()
    return [h[i % 32] / 255.0 for i in range(out_dim)]


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def extract_image_features(df: DataFrame, out_dim: int = 16) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches). With real
    codecs present this would decode pixels and run a feature model; here
    the decode step is the deterministic stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_CODECS:  # pragma: no cover - codecs absent in sandbox
                raise NotImplementedError("real image decode not wired yet")
            feats = [
                _fake_decode(bytes(c), out_dim) if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": feats,
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: 1 video row → N frame rows. The stub
    'frames' are content slices; a real kernel would demux with av/ffmpeg.
    Fan-out via mapInPandas keeps memory bounded per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                raw = bytes(content)
                n = min(max_frames, max(len(raw) // max(every_n, 1), 1))
                for i in range(n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    start = i * every_n
                    out_frames.append(raw[start : start + every_n])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.select("media_id", "content").mapInPandas(kernel, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: bytes in → (smaller) bytes out with updated meta.
    The stub 'resize' truncates bytes proportionally to the area ratio so
    output sizes behave like a real re-encode; a real kernel decodes with
    PIL and re-encodes. Output schema is identical to the input media
    schema, so resize composes with any downstream media op."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_meta = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                if content is None:
                    out_content.append(None)
                    out_meta.append(meta)
                    continue
                if _HAVE_CODECS:  # pragma: no cover - codecs absent in sandbox
                    raise NotImplementedError("real image resize not wired yet")
                raw = bytes(content)
                src_w = (meta or {}).get("width") or width
                src_h = (meta or {}).get("height") or height
                ratio = min(1.0, (width * height) / max(src_w * src_h, 1))
                out_content.append(raw[: max(int(len(raw) * ratio), 1)])
                new_meta = dict(meta or {})
                new_meta.update({"width": width, "height": height})
                out_meta.append(new_meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out_content,
                    "meta": out_meta,
                }
            )

    return df.select("media_id", "content", "meta").mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), True),
        T.StructField("est_duration_ms", T.LongType(), True),
    ]
)


def extract_audio_features(df: DataFrame, out_dim: int = 16) -> DataFrame:
    """Audio decode + feature plumbing (stubbed decode): bytes in →
    fixed-dim feature vector + duration estimated from meta/sample_rate.
    A real kernel decodes PCM with soundfile and computes e.g. mel stats."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, durs = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                if content is None:
                    feats.append(None)
                    durs.append(None)
                    continue
                if _HAVE_CODECS:  # pragma: no cover - codecs absent in sandbox
                    raise NotImplementedError("real audio decode not wired yet")
                raw = bytes(content)
                feats.append(_fake_decode(raw, out_dim))
                sr = (meta or {}).get("sample_rate") or 16_000
                # stub: assume 2-byte mono samples
                durs.append(int(len(raw) / 2 / sr * 1000))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats, "est_duration_ms": durs}
            )

    return df.select("media_id", "content", "meta").mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must not read the binary column (column
    pruning keeps the scan tiny; verify with .explain ReadSchema)."""
    return df.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("c"),
        F.avg(F.col("meta.width")).alias("avg_width"),
    )
