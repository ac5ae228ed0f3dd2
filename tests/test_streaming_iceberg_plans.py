"""Streaming sessionization, warehouse fallback, plan-shape pins."""

import pyspark.sql.functions as F

from radarpipeline_spark.operators import feature_vector, session_stats
from radarpipeline_spark.plans import FeaturePlan, plan_shape
from radarpipeline_spark.sources.iceberg import (
    iceberg_available,
    read_conversation,
    read_transcripts,
    write_transcripts,
)
from radarpipeline_spark.streaming.sessionize_stream import run_stream_to_memory


def test_stream_sessions_match_batch(spark, tiny, tmp_path):
    """Streaming session_window rollups == batch session_stats on the
    same data (compared on gap-nondegenerate synthetic input; ids differ
    so compare the (conv, start, end, n_turns) multiset)."""
    src = str(tmp_path / "stream_src")
    tiny.write.mode("overwrite").parquet(src)
    streamed = run_stream_to_memory(spark, src, "t_sessions", gap_seconds=1800)
    batch = session_stats(tiny, gap_seconds=1800)
    key = ["conv_id", "session_start", "session_end", "n_turns", "n_tool_calls"]
    a = streamed.select(key)
    b = batch.select(key)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_warehouse_roundtrip_and_pruning(spark, tiny, tmp_path):
    assert not iceberg_available(spark)  # sandbox: fallback path active
    wh = str(tmp_path / "warehouse")
    write_transcripts(tiny, wh, buckets=8)
    back = read_transcripts(spark, wh)
    assert back.count() == tiny.count()
    assert set(back.columns) == set(tiny.columns)
    # point lookup prunes partitions: physical plan must show a
    # partition filter on bucket
    one = read_conversation(spark, wh, "conv-00000001", buckets=8)
    rows = one.count()
    expected = tiny.filter(F.col("conv_id") == "conv-00000001").count()
    assert rows == expected > 0
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_feature_plan_fused_shape(spark, tiny):
    """Exchange budget is pinned per strategy: BOTH = 2 (one shuffle
    for the conv_id windows, one for the as-of union side).  The
    prefix strategy's probe/anchor fan-out is an inline explode —
    narrow, partitioning-preserving — so its LOCF window reuses the
    conv_id hash partitioning instead of re-shuffling (the old
    two-consumer union cost an extra exchange AND re-derived the
    totals window per branch: 5 base-table scans at r2, 2 now).
    A refactor that adds shuffles or scans beyond these fails here."""
    from tests.conftest import synthesize_transcripts  # noqa: F401

    # cached plans from other tests change how subtrees render
    # (InMemoryRelation substitution) and skew the textual counts
    spark.catalog.clearCache()
    aux = tiny.filter(F.col("turn_idx") % 11 == 0).select(
        "conv_id", "ts", F.lit(1.0).alias("aux_value")
    )
    shape = plan_shape(feature_vector(tiny, aux, rolling_strategy="sliding"))
    assert shape["exchanges"] == 2, shape
    shape_p = plan_shape(feature_vector(tiny, aux, rolling_strategy="prefix"))
    assert shape_p["exchanges"] == 2, shape_p


def test_feature_plan_builder_equals_operators(spark, tiny):
    plan = FeaturePlan(rolling_last_k=10, rolling_range_seconds=300)
    a = plan.apply(tiny)
    b = feature_vector(tiny)
    assert sorted(a.columns) == sorted(b.columns)
    key = lambda df: df.select(  # noqa: E731
        F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in sorted(df.columns)]
        ).alias("r")
    )
    assert key(a).exceptAll(key(b)).count() == 0
