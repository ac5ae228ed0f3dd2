"""Chunked (salted) windows must be bit-identical to the plain plan."""

import pyspark.sql.functions as F

from radarpipeline_spark.operators import feature_vector
from radarpipeline_spark.operators.skew import chunked_feature_vector


def _normalize(df):
    # exceptAll can't compare NaN==NaN for doubles; round-trip through
    # a string key for robust full-row equality.
    return df.select(
        F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(df.columns)]
        ).alias("row")
    )


def test_chunked_equals_plain(spark, tiny):
    plain = feature_vector(tiny)  # no aux: same surface as chunked
    chunked = chunked_feature_vector(tiny, chunk_rows=64)
    assert set(plain.columns) == set(chunked.columns)
    a, b = _normalize(plain), _normalize(chunked)
    assert plain.count() == chunked.count() == tiny.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the sliding strategy must produce the same bits as prefix
    sl = _normalize(chunked_feature_vector(tiny, chunk_rows=64, strategy="sliding"))
    assert a.exceptAll(sl).count() == 0 and sl.exceptAll(a).count() == 0


def test_chunked_tiny_chunks_still_exact(spark, tiny):
    # chunk_rows smaller than the rolling frame (k=10 > 8) still exact:
    # positional halo covers k-1 rows even across partial chunks.
    plain = _normalize(feature_vector(tiny))
    chunked = _normalize(chunked_feature_vector(tiny, chunk_rows=16))
    assert plain.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(plain).count() == 0


def test_chunked_window_boundary_tie_group(spark):
    """ADVICE r3: range frames' CURRENT ROW bound includes ALL ts-peers,
    so a timestamp-tie group spanning a chunk boundary must ship the
    whole leading tie group of the next chunk as the forward halo, not
    just its first row — otherwise latency min/max/mean/std of the tied
    boundary rows diverge from the plain plan."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # chunk_rows=4: turn 3 ends chunk 0; turns 4 AND 5 open chunk 1,
    # all three at the same timestamp (30s)
    secs = [0, 10, 20, 30, 30, 30, 40, 50]
    df = spark.createDataFrame(
        [
            ("c", i, t0 + dt.timedelta(seconds=s),
             "user" if i % 2 == 0 else "assistant",
             "search" if i % 3 == 0 else None,
             f"turn {i}")
            for i, s in enumerate(secs)
        ],
        "conv_id string, turn_idx int, ts timestamp_ntz, role string,"
        " tool string, text string",
    )
    plain = _normalize(feature_vector(df, last_k=3))
    for strat in ("prefix", "sliding"):
        chunked = _normalize(
            chunked_feature_vector(df, chunk_rows=4, last_k=3, strategy=strat)
        )
        assert plain.exceptAll(chunked).count() == 0, strat
        assert chunked.exceptAll(plain).count() == 0, strat


def test_validate_flags_thin_chunks(spark, tiny):
    import pytest

    with pytest.raises(ValueError):
        chunked_feature_vector(tiny, chunk_rows=2, validate=True).count()


def test_skew_routed_equals_plain(spark, tiny):
    from radarpipeline_spark.operators import skew_routed_feature_vector

    plain = _normalize(feature_vector(tiny))
    routed = _normalize(skew_routed_feature_vector(tiny, chunk_rows=64))
    assert plain.exceptAll(routed).count() == 0
    assert routed.exceptAll(plain).count() == 0


def test_chunk_rows_guard(spark, tiny):
    import pytest

    with pytest.raises(ValueError, match="chunk_rows"):
        chunked_feature_vector(tiny, chunk_rows=8, last_k=10)


def test_chunked_asof_equals_plain(spark, tiny, aux):
    from radarpipeline_spark.operators import asof_join
    from radarpipeline_spark.operators.skew import chunked_asof_join

    plain = asof_join(tiny, aux)
    chunked = chunked_asof_join(tiny, aux, chunk_rows=64)
    assert set(plain.columns) == set(chunked.columns)
    a, b = _normalize(plain), _normalize(chunked)
    assert plain.count() == chunked.count() == tiny.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_chunked_asof_boundary_tie(spark):
    """A right row whose ts equals a chunk's first left ts must also be
    seen by a TIED left row at the end of the preceding chunk (ts
    non-decreasing permits ties across the boundary) — the plain as-of
    sorts right rows first at equal ts.  Regression for the routed-to-
    one-chunk-only bug."""
    import datetime as dt

    from radarpipeline_spark.operators import asof_join
    from radarpipeline_spark.operators.skew import chunked_asof_join

    t0 = dt.datetime(2024, 1, 1)
    # chunk_rows=4: turn 3 ends chunk 0, turn 4 starts chunk 1; both at T
    ts = [0, 10, 20, 30, 30, 40, 50, 60]
    left = spark.createDataFrame(
        [("c", i, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(ts)],
        "conv_id string, turn_idx int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("c", t0 + dt.timedelta(seconds=1), 1.0),
            ("c", t0 + dt.timedelta(seconds=30), 2.0),  # exactly at boundary
        ],
        "conv_id string, ts timestamp_ntz, v double",
    )
    plain = {r["turn_idx"]: r["asof_v"] for r in asof_join(left, right).collect()}
    chunked = {
        r["turn_idx"]: r["asof_v"]
        for r in chunked_asof_join(left, right, chunk_rows=4).collect()
    }
    assert plain[3] == 2.0          # tied left row sees the boundary right row
    assert chunked == plain


def test_chunked_asof_multi_value_atomicity(spark):
    import datetime as dt

    from radarpipeline_spark.operators.skew import chunked_asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("c", i, t0 + dt.timedelta(seconds=40 * i)) for i in range(200)],
        "conv_id string, turn_idx int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("c", t0 + dt.timedelta(seconds=10), 1.0, "full"),
            ("c", t0 + dt.timedelta(seconds=3000), 2.0, None),
        ],
        "conv_id string, ts timestamp_ntz, x double, y string",
    )
    rows = {r["turn_idx"]: r for r in chunked_asof_join(left, right, chunk_rows=16).collect()}
    assert rows[0]["asof_x"] is None                    # before any right row
    assert rows[1]["asof_x"] == 1.0 and rows[1]["asof_y"] == "full"
    assert rows[74]["asof_x"] == 1.0                    # ts=2960s: still first row
    assert rows[75]["asof_x"] == 2.0 and rows[75]["asof_y"] is None  # atomic carry
    assert rows[199]["asof_x"] == 2.0 and rows[199]["asof_y"] is None


# --- r6 stretch (VERDICT r5 #9): drawn-cut leakage at scale ---------------


def _tie_dense_asof_input(spark):
    """A 250k-turn input built to stress the chunked+tie-halo path:
    one 200k-turn conversation whose ts advances only every 3rd turn
    (so EVERY chunk boundary of chunk_rows=1024 — 1024 % 3 != 0 —
    splits a timestamp tie across chunks), plus a normal 50k-turn
    conversation.  Right side: one signal per 7th second, unique ts
    per entity.  Fully distributed generation (spark.range)."""
    base = 1_700_000_000
    l1 = spark.range(200_000).select(
        F.lit("giant").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.timestamp_seconds(base + (F.col("id") / 3).cast("long"))
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    l2 = spark.range(50_000).select(
        F.lit("small").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.timestamp_seconds(base + F.col("id") * 2)
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    left = l1.unionByName(l2)
    r1 = spark.range(0, 200_000 // 3, 7).select(
        F.lit("giant").alias("conv_id"),
        F.timestamp_seconds(base + F.col("id"))
        .cast("timestamp_ntz")
        .alias("ts"),
        (F.col("id") * F.lit(1.5)).alias("signal"),
    )
    r2 = spark.range(0, 100_000, 14).select(
        F.lit("small").alias("conv_id"),
        F.timestamp_seconds(base + F.col("id"))
        .cast("timestamp_ntz")
        .alias("ts"),
        (F.col("id") * F.lit(-2.0)).alias("signal"),
    )
    return left, r1.unionByName(r2), base


def _assert_no_asof_leak(spark, left, right, T):
    """north_rule zero-temporal-leakage at the operator level: the
    as-of output for every left row at ts <= T must be unchanged when
    the right side is truncated at T (no backfilled feature may read a
    right row at ts' > ts).  Left side stays FULL both times, so chunk
    spans and tie halos are identical — isolating what the truncation
    can change to exactly the leakage surface."""
    from radarpipeline_spark.operators.skew import chunked_asof_join

    full = chunked_asof_join(left, right, chunk_rows=1024).filter(
        F.col("ts") <= F.lit(T)
    )
    trunc = chunked_asof_join(
        left, right.filter(F.col("ts") <= F.lit(T)), chunk_rows=1024
    ).filter(F.col("ts") <= F.lit(T))
    a, b = _normalize(full), _normalize(trunc)
    n = full.count()
    assert n == trunc.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    return n


def test_chunked_asof_leakage_drawn_cuts_at_scale(spark):
    """Drawn cut points (seconds-quantized, so every T lands exactly ON
    a tied timestamp — the adversarial case where a right row at T is
    shared by left rows in two adjacent chunks via the tie halo)."""
    import datetime as dt

    left, right, base = _tie_dense_asof_input(spark)
    max_sec = 200_000 // 3
    for cut in (0.137, 0.5, 0.874):
        T = dt.datetime.utcfromtimestamp(base + int(max_sec * cut))
        _assert_no_asof_leak(spark, left, right, T)


def test_chunked_asof_leakage_exact_boundary_cut(spark):
    """The sharpest edge: cut T exactly at a chunk-boundary timestamp
    of the giant conversation (turn 102400 = chunk 100's first row,
    whose ts ties with chunk 99's tail rows).  A tie-halo bug that
    leaks the boundary right row to the WRONG side of the cut shows up
    only here.  Also pins chunked == plain at this scale/tie density."""
    import datetime as dt

    from radarpipeline_spark.operators import asof_join
    from radarpipeline_spark.operators.skew import chunked_asof_join

    left, right, base = _tie_dense_asof_input(spark)
    T = dt.datetime.utcfromtimestamp(base + (102_400 // 3))
    _assert_no_asof_leak(spark, left, right, T)
    plain = _normalize(
        asof_join(left, right).filter(F.col("ts") <= F.lit(T))
    )
    chunked = _normalize(
        chunked_asof_join(left, right, chunk_rows=1024).filter(
            F.col("ts") <= F.lit(T)
        )
    )
    assert plain.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(plain).count() == 0
