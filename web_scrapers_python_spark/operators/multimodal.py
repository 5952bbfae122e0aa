"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media are opaque ``binary`` columns plus a typed metadata struct; all
per-byte work runs as Arrow-batched ``mapInPandas`` so payloads never
round-trip through Python row objects. The actual codecs (PIL/ffmpeg
et al.) are NOT available in this sandbox, so the decode step is
STUBBED: ``decode_stub=True`` (default) yields a deterministic fake
decode derived from the bytes; ``decode_stub=False`` raises
``NotImplementedError`` at the decode call-site, marking exactly where
a real codec plugs in. The Spark-side plumbing — schema, batch
iteration, partition sizing, output contract — is real and tested.

Scale notes: media rows are wide (MBs); the helpers repartition by a
size budget, not row count, and the feature stage prunes the binary
column out of its output so downstream stages never shuffle payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # 'image' | 'audio' | 'video'
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ])),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha", StringType()),
    StructField("feature", ArrayType(FloatType())),
])


def synthesize_media(df: DataFrame, id_col: str, text_col: str,
                     kind: str = "image") -> DataFrame:
    """Deterministic fake media table from any string column (test/bench
    input shim — payload = utf8 bytes; metadata derived from length)."""
    n = F.length(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            (n * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real codec: sha256-seeded bytes."""
    d = hashlib.sha256(payload).digest()
    return np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media -> (media_id, kind, n_bytes, sha, feature ARRAY<FLOAT>).

    Arrow-batched mapInPandas; the binary payload is consumed inside the
    batch and dropped from the output, so only ~50 bytes/row continue
    downstream. Plug a real decoder in at the marked call-site."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if not decode_stub:
                raise NotImplementedError(
                    "real media codec not available in this environment; "
                    "replace _fake_decode with PIL/torchaudio/ffmpeg here")
            feats = [_fake_decode(bytes(p)).tolist() for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(len).astype("int64"),
                "sha": payloads.map(
                    lambda p: hashlib.sha256(bytes(p)).hexdigest()),
                "feature": feats,
            })

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decode_stub: bool = True) -> DataFrame:
    """Image resize stage (stub codec): passes payload through and
    rewrites metadata. Demonstrates the binary-in/binary-out contract a
    real resize uses (mapInPandas, payload column preserved)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real image resize needs PIL")
            meta = pd.DataFrame({
                "mime": ["application/x-fake"] * len(pdf),
                "width": np.full(len(pdf), width, dtype="int32"),
                "height": np.full(len(pdf), height, dtype="int32"),
                "duration_ms": pdf["meta"].map(
                    lambda m: m["duration_ms"]).astype("int32"),
            })
            out = pdf.copy()
            out["meta"] = meta.to_dict("records")
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 decode_stub: bool = True) -> DataFrame:
    """Video frame sampling (stub): one output row per sampled frame —
    the UDTF-shaped (1 row -> N rows) media op. Frame payloads are
    deterministic slices of the source bytes."""
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [],
                    "frame": []}
            for _, r in pdf.iterrows():
                if not decode_stub:
                    raise NotImplementedError("real frame sampling needs ffmpeg")
                dur = int(r["meta"]["duration_ms"] or 0)
                payload = bytes(r["payload"])
                n_frames = max(1, dur // every_ms)
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(payload[i * step:(i + 1) * step])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema)


def repartition_by_bytes(media: DataFrame, target_mb: int = 128,
                         size_col_bytes: str = "payload") -> DataFrame:
    """Repartition a media table so each partition holds ~target_mb of
    payload — row-count partitioning is wrong for multi-MB rows."""
    stats = media.select(
        F.sum(F.length(size_col_bytes)).alias("total")).collect()[0]
    total = stats["total"] or 0
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return media.repartition(n_parts)
