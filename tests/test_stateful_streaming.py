"""Stateful streaming sessionizer == batch sessionize across batches."""

import os

import pyspark.sql.functions as F
import pytest

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


def test_stream_asof_matches_batch(spark, tiny, aux, tmp_path):
    """Streaming as-of backfill == batch asof_join, with the stream cut
    mid-conversation (state carries the last aux row across batches)
    and a NULL-valued aux row carried atomically."""
    import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    from radarpipeline_spark.operators import asof_join
    from radarpipeline_spark.streaming.stateful import stream_asof_backfill

    t0 = dt.datetime(2030, 1, 1)
    extra_turns = spark.createDataFrame(
        [("conv-nullaux", i, "user", "x", None, t0 + dt.timedelta(seconds=60 * i))
         for i in range(6)],
        tiny.schema,
    )
    extra_aux = spark.createDataFrame(
        [
            ("conv-nullaux", t0 + dt.timedelta(seconds=30), 7.0),
            # NULL value: must be carried atomically, not skipped
            ("conv-nullaux", t0 + dt.timedelta(seconds=150), None),
        ],
        "conv_id string, ts timestamp_ntz, aux_value double",
    )
    turns = tiny.unionByName(extra_turns)
    auxes = aux.unionByName(extra_aux)

    u = turns.select(
        "conv_id", "turn_idx", "ts",
        F.lit(1).alias("side"), F.lit(None).cast("double").alias("aux_value"),
    ).unionByName(
        auxes.select(
            "conv_id", F.lit(-1).alias("turn_idx"), "ts",
            F.lit(0).alias("side"), "aux_value",
        )
    )
    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("ts", TimestampNTZType()),
        StructField("side", IntegerType()),
        StructField("aux_value", DoubleType()),
    ])

    src = str(tmp_path / "src"); ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    # split BOTH sides at a global time cut: the operator's contract is
    # in-order batches per conversation — for both turn AND aux rows
    lo, hi = turns.agg(F.min("ts"), F.max("ts")).collect()[0]
    T = lo + (hi - lo) / 2
    first = u.filter(F.col("ts") <= F.lit(T))
    second = u.filter(F.col("ts") > F.lit(T))
    first.select(*[f.name for f in schema.fields]).write.mode("append").parquet(src)

    def drain():
        q = (
            stream_asof_backfill(spark.readStream.schema(schema).parquet(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    second.select(*[f.name for f in schema.fields]).write.mode("append").parquet(src)
    drain()

    batch = asof_join(turns, auxes).select(
        "conv_id", "turn_idx", "ts", "asof_aux_value"
    )
    streamed = spark.read.parquet(out).select(
        "conv_id", "turn_idx", "ts", "asof_aux_value"
    )
    assert streamed.count() == batch.count() == turns.count()
    key = lambda df: df.select(  # noqa: E731
        F.concat_ws("\x01", *[
            F.coalesce(F.col(c).cast("string"), F.lit(""))
            for c in ["conv_id", "turn_idx", "ts", "asof_aux_value"]
        ]).alias("r")
    )
    assert key(batch).exceptAll(key(streamed)).count() == 0
    assert key(streamed).exceptAll(key(batch)).count() == 0
    # atomic NULL carry: turns after the NULL aux row see NULL, not 7.0
    nz = {r["turn_idx"]: r["asof_aux_value"]
          for r in streamed.filter(F.col("conv_id") == "conv-nullaux").collect()}
    assert nz[0] is None and nz[1] == 7.0 and nz[5] is None


def test_stream_sessionize_unordered_matches_batch(spark, tmp_path):
    """VERDICT r2 #9: out-of-order arrival ACROSS micro-batches (the
    production Kafka reality) must still reproduce the batch
    sessionizer, via the watermarked reorder buffer."""
    import datetime as dt

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    from radarpipeline_spark.streaming.stateful import (
        stream_sessionize_unordered,
    )

    t0 = dt.datetime(2024, 1, 1)
    # two conversations; c1 has a session break at turn 3
    rows = [
        ("c1", 0, 0), ("c1", 1, 30), ("c1", 2, 60),
        ("c1", 3, 4000), ("c1", 4, 4030),
        ("c2", 0, 10), ("c2", 1, 2500),
    ]
    mk = lambda cid, i, s: (  # noqa: E731
        cid, i, "user", f"t{i}", None, t0 + dt.timedelta(seconds=s)
    )
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp_ntz")
    all_rows = [mk(*r) for r in rows]

    def drain():
        q = (
            stream_sessionize_unordered(
                spark.readStream.schema(schema).parquet(src),
                gap_seconds=1800,
                watermark="2 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # batch 1 delivers LATER turns first (c1: 2,3 before 0,1 arrive)
    spark.createDataFrame(
        [all_rows[2], all_rows[3], all_rows[6]], schema
    ).write.mode("append").parquet(src)
    drain()
    # batch 2: the earlier turns — still ahead of the (not yet
    # advanced past them) watermark, so the buffer reorders them in
    spark.createDataFrame(
        [all_rows[0], all_rows[1], all_rows[4], all_rows[5]], schema
    ).write.mode("append").parquet(src)
    drain()
    # batch 3+4: watermark advance + flush (watermark trails one batch)
    for s in (30000, 60000):
        spark.createDataFrame(
            [mk("flush", 0, s)], schema
        ).write.mode("append").parquet(src)
        drain()

    got = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in spark.read.parquet(out)
        .filter(F.col("conv_id") != "flush")
        .collect()
    }
    batch = sessionize(
        spark.createDataFrame(all_rows, schema), gap_seconds=1800
    )
    exp = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in batch.collect()
    }
    assert got == exp and len(got) == 7


def test_stream_asof_unordered_matches_batch(spark, tmp_path):
    """Watermarked as-of twin: aux and turn rows arriving out of order
    across batches (aux AFTER the turns it backfills) must replay to
    the batch asof_join result, including atomic NULL-aux carry."""
    import datetime as dt

    from radarpipeline_spark.operators import asof_join
    from radarpipeline_spark.streaming.stateful import (
        stream_asof_backfill_unordered,
    )

    src, ckpt, out = (str(tmp_path / d) for d in ("src2", "ckpt2", "out2"))
    os.makedirs(src)
    t0 = dt.datetime(2024, 6, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    schema = ("conv_id string, turn_idx int, ts timestamp_ntz, "
              "side int, aux_value double")
    turn = lambda i, s: ("c", i, sec(s), 1, None)  # noqa: E731
    aux = lambda s, v: ("c", -1, sec(s), 0, v)  # noqa: E731

    def drain():
        q = (
            stream_asof_backfill_unordered(
                spark.readStream.schema(schema).parquet(src),
                watermark="2 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # batch 1: the TURNS arrive first
    spark.createDataFrame(
        [turn(0, 0), turn(1, 60), turn(2, 120), turn(3, 200)], schema
    ).write.mode("append").parquet(src)
    drain()
    # batch 2: the aux rows they should have seen (ts 30 and 150 — the
    # 150 one carries NULL and must override 5.0 for turn 3)
    spark.createDataFrame(
        [aux(30, 5.0), aux(150, None)], schema
    ).write.mode("append").parquet(src)
    drain()
    for s in (30000, 60000):
        spark.createDataFrame(
            [("flush", 0, sec(s), 1, None)], schema
        ).write.mode("append").parquet(src)
        drain()

    got = {
        r["turn_idx"]: r["asof_aux_value"]
        for r in spark.read.parquet(out)
        .filter(F.col("conv_id") == "c")
        .collect()
    }
    turns_b = spark.createDataFrame(
        [("c", i, "u", "x", None, sec(s))
         for i, s in [(0, 0), (1, 60), (2, 120), (3, 200)]],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )
    aux_b = spark.createDataFrame(
        [("c", sec(30), 5.0), ("c", sec(150), None)],
        "conv_id string, ts timestamp_ntz, aux_value double",
    )
    exp = {
        r["turn_idx"]: r["asof_aux_value"]
        for r in asof_join(turns_b, aux_b).collect()
    }
    assert got == exp and len(got) == 4
    assert got[0] is None and got[1] == 5.0 and got[3] is None


def test_stream_rolling_matches_batch(spark, tmp_path):
    """Streaming rolling-features twin == batch lag_lead+rolling,
    bit-for-bit, with conversations split mid-stream and state carrying
    the Δ-horizon buffer + positional tail: dense sub-frame gaps,
    session-scale gaps, tool/non-tool mix, timestamp ties (within one
    batch), and a conversation-start NULL latency."""
    import datetime as dt

    from radarpipeline_spark.operators import lag_lead_features, rolling_features
    from radarpipeline_spark.streaming.stateful import stream_rolling_features

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # conv a: dense 20-70s gaps, a tie pair, a 2100s session break
    gaps = [0, 20, 30, 45, 0, 70, 2100, 10, 10, 61, 250, 299, 301, 5]
    acc = 0
    for i, g in enumerate(gaps):
        acc += g
        rows.append(("a", i, "user", f"x{i}",
                     "search" if i % 3 == 0 else None,
                     t0 + dt.timedelta(seconds=acc)))
    # conv b: short, all in one batch half
    for i, g in enumerate([0, 120, 500]):
        rows.append(("b", i, "u", "y", None,
                     t0 + dt.timedelta(seconds=1000 + 120 * i)))
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp_ntz")
    df = spark.createDataFrame(rows, schema)

    src, ckpt, out = (str(tmp_path / d) for d in ("rsrc", "rckpt", "rout"))
    os.makedirs(src)

    def drain():
        q = (
            stream_rolling_features(
                spark.readStream.schema(schema).parquet(src),
                last_k=4, range_seconds=300,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # split conv a at turn 8 (mid-dense-run, so the Δ buffer must carry)
    df.filter("conv_id = 'b' or turn_idx <= 7").write.mode("append").parquet(src)
    drain()
    df.filter("conv_id = 'a' and turn_idx > 7").write.mode("append").parquet(src)
    drain()

    batch = rolling_features(
        lag_lead_features(df), last_k=4, range_seconds=300
    ).select(
        "conv_id", "turn_idx", "inter_turn_latency_s",
        F.col("turns_last_4").alias("turns_last_k"),
        F.col("tool_rate_last_4").alias("tool_rate_last_k"),
        F.col("latency_mean_300s").alias("latency_mean_s"),
        F.col("latency_std_300s").alias("latency_std_s"),
        F.col("latency_min_300s").alias("latency_min_s"),
        F.col("latency_max_300s").alias("latency_max_s"),
    )
    streamed = spark.read.parquet(out).drop("ts")
    cols = sorted(batch.columns)
    key = lambda d: sorted(  # noqa: E731
        tuple(repr(r[c]) for c in cols) for r in d.collect()
    )
    assert streamed.count() == batch.count() == len(rows)
    assert key(streamed) == key(batch)


@pytest.mark.parametrize("dedup_buckets", [3, None])
def test_stream_curate_matches_batch(spark, tmp_path, dedup_buckets):
    """VERDICT r3 #8: streaming curation (stateless filters + stateful
    exact dedup + deterministic sample) == batch curate_documents, with
    the corpus split mid-stream and duplicate contents spanning the
    split (state must drop the batch-2 re-occurrence).

    Parametrized over both dedup kernels: the bucketed array-state one
    (buckets=3 forces many distinct contents per bucket AND multiple
    buckets — the collision paths) and the per-content point-lookup
    one (buckets=None)."""
    from radarpipeline_spark.operators.curation import curate_documents
    from radarpipeline_spark.streaming.curate_stream import (
        stream_curate_documents,
    )

    good = "the quick brown fox jumps over the lazy dog once more today"
    texts = {
        0: good,                       # canonical of dup group A
        3: good,                       # in-batch-1 dup -> dropped
        5: "a completely different engine document about spark plans",
        7: "zz 123 !!",                # fails token/quality filters
        9: "el rapido zorro marron salta sobre el perro dormido hoy si",
    }
    rows = [
        (i, texts.get(i % 12, f"unique document number {i} with plenty "
                              f"of ordinary english words inside"))
        for i in range(40)
    ]
    # i%12 makes contents recur across the id range: ids 0,12,24,36
    # share text 0 etc. -> duplicates within AND across the split
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_tokens=5, min_quality=0.2, dedup=True, sample_pct=90)
    skw = dict(kw, dedup_buckets=dedup_buckets)

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    schema = "doc_id long, text string"

    def drain():
        q = (
            stream_curate_documents(
                spark.readStream.schema(schema).parquet(src), **skw
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # batches split by id order (the parity contract: ids non-
    # decreasing across micro-batches per content)
    docs.filter(F.col("doc_id") < 20).write.mode("append").parquet(src)
    drain()
    n1 = spark.read.parquet(out).count()
    docs.filter(F.col("doc_id") >= 20).write.mode("append").parquet(src)
    drain()

    batch = curate_documents(docs, **kw)
    streamed = spark.read.parquet(out)
    assert n1 > 0 and streamed.count() == batch.count() > 0
    cols = batch.columns
    key = lambda df: sorted(  # noqa: E731
        tuple(repr(r[c]) for c in cols) for r in df.collect()
    )
    assert key(streamed) == key(batch)
    # the cross-split duplicate really exercised state: id 24 (dup of
    # batch-1's id 0) must be absent, id 0 present
    ids = {r["doc_id"] for r in streamed.collect()}
    assert 0 in ids and 24 not in ids and 36 not in ids
