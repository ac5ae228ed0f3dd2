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
