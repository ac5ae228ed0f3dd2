"""Structured Streaming sessionization.

The reference has no streaming surface at all (grep for
readStream/watermark finds nothing under radarpipeline/ — SURVEY.md
§2.10).  This module adds the streaming twin of
``operators.sessionize.session_stats``: gap-sessions over a transcript
stream via ``F.session_window`` + watermark, emitting per-session
rollups as sessions close.

Boundary semantics note: ``session_window`` merges an event into a
session while ``event.ts < window.end`` (half-open), i.e. a gap of
EXACTLY ``gap_seconds`` starts a new session — the batch operator keeps
it in the same session (rule is strictly ``gap > gap_seconds``).  The
two agree for all non-degenerate gaps; pick one rule per deployment.

Late data: rows older than ``watermark`` past the max seen event time
are dropped by the engine; the batch path has no such cutoff (it sorts
everything), which is the usual batch/streaming tradeoff.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from radarpipeline_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts_from_dir(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source transcript stream (parquet drops into ``path``)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_session_stats(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-session rollup over a stream: session_window groupBy with
    watermarked state cleanup.  Output mode must be 'append' (sessions
    emit once closed) or 'update'."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(entity_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        )
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.sum(F.when(F.col(tool_col).isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_tool_calls"),
        )
        .select(
            entity_col,
            F.col("session_window.start").alias("window_start"),
            "n_turns",
            "session_start",
            "session_end",
            "n_tool_calls",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    table_name: str = "stream_sessions",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Drive the stream with availableNow (process-everything-then-stop)
    into an in-memory sink; returns the result table.  Used by tests and
    as the reference harness for real deployments (swap memory sink for
    a parquet/Iceberg sink + checkpointLocation)."""
    stream = stream_transcripts_from_dir(spark, src_dir)
    q = (
        stream_session_stats(stream, gap_seconds=gap_seconds)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(table_name)
