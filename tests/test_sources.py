"""Sources: determinism, schema contract, text byte-equality."""

import pyspark.sql.functions as F

from radarpipeline_spark.sources import (
    TRANSCRIPT_SCHEMA,
    load_table,
    synthesize_transcripts,
    transcripts_from_events,
)

SF = "/root/testdata/sf0.001"


def test_synthesizer_deterministic(spark):
    a = synthesize_transcripts(spark, n_convs=30, seed=11).toPandas()
    b = synthesize_transcripts(spark, n_convs=30, seed=11).toPandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    assert a.equals(b)


def test_synthesizer_schema_and_skew(spark, tiny):
    assert [f.name for f in tiny.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    lens = tiny.groupBy("conv_id").count()
    assert lens.agg(F.max("count")).collect()[0][0] == 500  # skewed conv
    # turn_idx dense & unique per conv
    chk = tiny.groupBy("conv_id").agg(
        F.count("*").alias("n"), (F.max("turn_idx") + 1).alias("m")
    )
    assert chk.filter(F.col("n") != F.col("m")).count() == 0
    # ts strictly increasing within conv
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = tiny.withColumn("p", F.lag("ts").over(w)).filter(
        F.col("p").isNotNull() & (F.col("ts") <= F.col("p"))
    )
    assert bad.count() == 0


def test_transcripts_text_byte_equal(spark):
    """Per-turn text must be byte-equal to the deterministic derivation
    under stable (conv_id, turn_idx) ordering (BASELINE.json:input_hint)."""
    ev = load_table(spark, SF, "events").toPandas()
    t = (
        transcripts_from_events(load_table(spark, SF, "events"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    expected = (
        ev["event_type"] + "#" + ev["event_id"].astype(str) + "#" + ev["props"]
    )
    got = t.sort_values(["conv_id", "turn_idx"], ignore_index=True)["text"]
    assert all(
        g.encode() == e.encode() for g, e in zip(got.to_numpy(), expected.to_numpy())
    )


def test_roundtrip_text_bytes_through_engine(spark, tiny):
    """text survives the full feature pipeline byte-for-byte."""
    from radarpipeline_spark.operators import feature_vector

    src = tiny.orderBy("conv_id", "turn_idx").select("text").toPandas()["text"]
    out = (
        feature_vector(tiny)
        .orderBy("conv_id", "turn_idx")
        .select("text")
        .toPandas()["text"]
    )
    assert all(a.encode() == b.encode() for a, b in zip(src, out))
