"""Stateful streaming sessionizer == batch sessionize across batches."""

import os

import pyspark.sql.functions as F

from radarpipeline_spark.operators import sessionize
from radarpipeline_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from radarpipeline_spark.streaming.stateful import stream_sessionize


def test_incremental_state_matches_batch(spark, tiny, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # split each conversation MID-STREAM: first 60% of turns in drop 1,
    # the rest in drop 2 — state must carry session ids across batches.
    lens = tiny.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"))
    t = tiny.join(lens, "conv_id")
    first = t.filter(F.col("turn_idx") <= F.col("mx") * 0.6).drop("mx")
    second = t.filter(F.col("turn_idx") > F.col("mx") * 0.6).drop("mx")
    first.write.mode("append").parquet(src)

    out = str(tmp_path / "out")

    def drain():
        # parquet file sink: supports exactly-once recovery from the
        # checkpoint across restarts (memory sink does not)
        q = (
            stream_sessionize(
                spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src),
                gap_seconds=1800,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    n1 = spark.read.parquet(out).count()
    second.write.mode("append").parquet(src)
    drain()
    streamed = spark.read.parquet(out)
    assert n1 < streamed.count() == tiny.count()

    batch = sessionize(tiny).select("conv_id", "turn_idx", "session_id")
    got = streamed.select("conv_id", "turn_idx", "session_id")
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_session_window_drops_late_data(spark, tmp_path):
    """Watermarked session_window: rows later than the watermark behind
    max event time are dropped once state advances (append mode)."""
    import datetime as dt
    import os

    from radarpipeline_spark.streaming.sessionize_stream import (
        stream_session_stats,
        stream_transcripts_from_dir,
    )

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1)
    mk = lambda i, s: ("c", i, "user", f"t{i}", None, t0 + dt.timedelta(seconds=s))  # noqa: E731
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp_ntz")

    def drain():
        q = (
            stream_session_stats(
                stream_transcripts_from_dir(spark, src),
                gap_seconds=60,
                watermark="10 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: one session at t0, plus an event far in the future that
    # advances the watermark well past t0
    spark.createDataFrame(
        [mk(0, 0), mk(1, 30), mk(2, 7200)], schema
    ).write.mode("append").parquet(src)
    drain()
    # batch 2: a LATE row inside the first session's window (ts=45s) —
    # older than watermark (7200s - 600s) -> must be dropped
    spark.createDataFrame([mk(3, 45)], schema).write.mode("append").parquet(src)
    drain()
    # batch 3: advance event time so every session closes and emits
    spark.createDataFrame([mk(4, 20000)], schema).write.mode("append").parquet(src)
    drain()
    res = spark.read.parquet(out)
    first = res.filter(F.col("session_start") == t0).collect()
    assert len(first) == 1
    assert first[0]["n_turns"] == 2  # the late turn_idx=3 row was dropped
