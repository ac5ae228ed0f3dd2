"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode/feature-extraction runs as Arrow-batched ``mapInPandas`` (one
Python call per batch, zero per-row overhead).  The actual codecs
(PIL/ffmpeg/etc.) are NOT in this container, so the decode kernel is a
clearly-marked deterministic stub behind ``decoder=`` — the Spark-side
contract (schema, batching, partitioning) is real and tested; swap the
stub for a real codec in production.

Scale notes: binary payloads make rows wide — ``mapInPandas`` streams
Arrow batches so a partition never fully materializes;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory.
Repartition by size (not count) before heavy decode so executors get
even byte-loads.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _h60(col: F.Column) -> F.Column:
    """60-bit md5 hash reproducible in DuckDB SQL (see dedup.h60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: binary payload is a seeded byte
    pattern (stands in for encoded image bytes).

    All derivations go through md5 (not xxhash64) so a DuckDB oracle
    can synthesize the byte-identical table in SQL and grade the
    feature extraction end-to-end.
    """
    mid = F.col("media_id").cast("string")
    return (
        spark.range(n)
        .withColumnRenamed("id", "media_id")
        .select(
            "media_id",
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(_h60(F.concat(F.lit(f"kind:{seed}:"), mid)), F.lit(3)) + 1)
                .cast("int"),
            ).alias("kind"),
            F.struct(
                F.lit("synthetic/v1").alias("format"),
                (F.pmod(_h60(F.concat(F.lit(f"w:{seed}:"), mid)), F.lit(512)) + 32)
                .cast("int")
                .alias("width"),
                (F.pmod(_h60(F.concat(F.lit(f"h:{seed}:"), mid)), F.lit(512)) + 32)
                .cast("int")
                .alias("height"),
            ).alias("meta"),
            F.encode(
                F.concat(F.lit("BLOB:"), F.md5(F.concat(F.lit(f"payload:{seed}:"), mid))),
                "UTF-8",
            ).alias("data"),
        )
    )


def stub_decode(data: bytes, meta: dict) -> list[float]:
    """STUB decode kernel (no codec libs in this container).

    Deterministic fake "feature vector" from the payload bytes — a real
    deployment replaces this with e.g. PIL decode + model features.
    Raising NotImplementedError here would also be acceptable; a
    deterministic fake keeps the pipeline testable end-to-end.
    """
    acc = 2166136261
    for b in data:
        acc = ((acc ^ b) * 16777619) & 0xFFFFFFFF
    return [((acc >> (i * 4)) & 0xF) / 15.0 for i in range(8)]


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[bytes, dict], list[float]] = stub_decode,
    feature_dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas streams batches; the decoder runs vectorized per batch
    (list comprehension over the batch — the per-row work is the codec
    itself, which no engine can vectorize away).
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(bytes(d), m) if d is not None else None
                for d, m in zip(pdf["data"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=out_schema)


def stub_decode_frame(data: bytes, meta: dict, frame_idx: int) -> list[float]:
    """STUB per-frame decode (no ffmpeg here): deterministic fake
    features from payload bytes + the frame index — a real deployment
    seeks/decodes frame ``frame_idx`` from the container bytes.  The
    derivation is replayable in DuckDB SQL (payload chars + ASCII
    ':frame:<i>' through the same FNV-1a fold)."""
    return stub_decode(data + f":frame:{frame_idx}".encode(), meta)


def sample_frame_features(
    df: DataFrame,
    n_frames: int = 4,
    frame_decoder: Callable[[bytes, dict, int], list[float]] = stub_decode_frame,
) -> DataFrame:
    """Frame sampling + per-frame features for video payloads.

    Scale-deciding plumbing choice: the binary payload is NOT exploded
    n_frames times — each video row crosses the Arrow boundary ONCE and
    the kernel emits one output row per sampled frame (a real decoder
    opens the container once and seeks per frame, so fan-out inside the
    kernel is also the natural codec shape).  Output rows are narrow
    (id, kind, frame_idx, features); only they flow downstream.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, fidx, feats = [], [], [], []
            for mid, kind, d, m in zip(
                pdf["media_id"], pdf["kind"], pdf["data"], pdf["meta"]
            ):
                for i in range(n_frames):
                    ids.append(mid)
                    kinds.append(kind)
                    fidx.append(i)
                    feats.append(
                        frame_decoder(bytes(d), m, i) if d is not None else None
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "frame_idx": fidx,
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=out_schema)


def resize_plan(
    df: DataFrame, max_side: int, meta_col: str = "meta"
) -> DataFrame:
    """Aspect-preserving resize PLANNING — pure Catalyst, no codec:
    adds target_width/target_height/resize_scale columns (scale capped
    at 1.0: never upscale).  The actual pixel resample belongs in the
    decode kernel; computing the geometry declaratively keeps it out of
    Python and lets Catalyst prune/pushdown around it."""
    w = F.col(f"{meta_col}.width").cast("double")
    h = F.col(f"{meta_col}.height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return df.select(
        "*",
        F.round(scale, 6).alias("resize_scale"),
        F.floor(w * scale).cast("int").alias("target_width"),
        F.floor(h * scale).cast("int").alias("target_height"),
    )
