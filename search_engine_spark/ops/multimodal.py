"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
columns; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` transforms so each Python worker sees
whole record batches (the only sane shape for multi-MB blobs — one
Python call per batch, zero per-row overhead, and Spark never tries to
interpret the payload).

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``decode=...`` dispatches to either the real decoder
(``NotImplementedError`` with the dependency named) or a deterministic
fake (md5-driven) that keeps schemas, batch shapes, partitioning, and
tests fully real. Swapping in PIL/torchaudio/ffmpeg touches only the
two ``_real_*`` functions.

Scale notes: blobs dominate partition size — size partitions by
``spark.sql.files.maxPartitionBytes`` (not row count), keep metadata in
separate columns so Catalyst prunes blob bytes for metadata-only
queries, and never ``collect()`` a blob column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def synthetic_media(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (blob bytes derived from md5(media_id))."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                kind = kinds[int(i) % 3]
                blob = _fake_blob(int(i), 256 + (int(i) % 7) * 64)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "content": blob,
                        "width": 32 + (int(i) % 4) * 16 if kind == "image" else None,
                        "height": 32 + (int(i) % 3) * 16 if kind == "image" else None,
                        "sample_rate": 16000 if kind == "audio" else None,
                        "duration_ms": 1000 + (int(i) % 10) * 500
                        if kind in ("audio", "video")
                        else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=num_partitions).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def _fake_blob(media_id: int, size: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < size:
        out += hashlib.md5(f"{media_id}:{counter}".encode()).digest()
        counter += 1
    return bytes(out[:size])


def _fake_features(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic pseudo-features: md5 of the blob -> dim floats in [0,1)."""
    vals = []
    counter = 0
    while len(vals) < dim:
        d = hashlib.md5(blob + counter.to_bytes(4, "big")).digest()
        vals.extend(b / 255.0 for b in d)
        counter += 1
    return [float(v) for v in vals[:dim]]


def _real_decode_image(blob: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "real image decode requires PIL/opencv (not in this container); "
        "run with decode='fake' for the deterministic stub"
    )


def _real_decode_audio(blob: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "real audio decode requires soundfile/torchaudio (not in this container)"
    )


def extract_features(
    media: DataFrame, decode: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """Per-media feature vectors via Arrow-batched ``mapInPandas``.

    ``decode='fake'`` -> deterministic md5 features (tests/CI);
    ``decode='real'`` -> raises NotImplementedError until codec libs
    are provisioned. Blob bytes never cross to the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                for blob, kind in zip(pdf["content"], pdf["kind"]):
                    if kind == "image":
                        _real_decode_image(bytes(blob))
                    else:
                        _real_decode_audio(bytes(blob))
            feats = [_fake_features(bytes(b), dim) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Explode video rows into frame rows every ``every_ms`` ms.

    Frame extraction is the stubbed codec step (fake = md5 slices of the
    blob); the exploded row shape, schema, and partition behavior (rows
    fan out within the same task, no shuffle) are real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video" or r["duration_ms"] is None:
                    continue
                blob = bytes(r["content"])
                n_frames = max(int(r["duration_ms"]) // every_ms, 1)
                for fi in range(n_frames):
                    rows.append(
                        {
                            "media_id": int(r["media_id"]),
                            "frame_idx": fi,
                            "ts_ms": fi * every_ms,
                            "frame": hashlib.md5(
                                blob + fi.to_bytes(4, "big")
                            ).digest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
            )

    return media.select("media_id", "kind", "content", "duration_ms").mapInPandas(
        run, FRAMES_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image blobs (stubbed codec; metadata transform is real)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = out["kind"] == "image"
            out.loc[is_img, "width"] = width
            out.loc[is_img, "height"] = height
            # stub: "resized" payload = md5-extended slice sized to w*h
            out.loc[is_img, "content"] = [
                _fake_blob(int(mid), width * height // 64)
                for mid in out.loc[is_img, "media_id"]
            ]
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — the scan prunes the blob column
    entirely (verify: ReadSchema in .explain omits ``content``)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg("duration_ms").alias("avg_duration_ms"),
        F.avg("width").alias("avg_width"),
    )
