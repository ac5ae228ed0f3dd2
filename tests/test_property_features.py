"""Hypothesis property tests: adversarial micro-streams vs the pandas
oracle, and the zero-temporal-leakage invariant at a DRAWN cut point.

Gap values are drawn from the adversarial set around every boundary the
engine cares about: 0 (timestamp ties), the 1800s session gap and both
neighbors, the 300s rolling-range edge and both neighbors, sub-second
gaps, and huge gaps.  Each example is a full engine-vs-oracle run, so
example counts are kept small (Spark job per example) — the point is
boundary coverage, not volume.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from radarpipeline_spark.operators import (
    feature_vector,
    lag_lead_features,
    rolling_features,
    sessionize,
)
from radarpipeline_spark.oracle import (
    oracle_lag_lead,
    oracle_rolling,
    oracle_sessionize,
)
from tests.helpers import aligned, assert_allclose_frames

T0 = dt.datetime(2024, 1, 1)
GAPS = [0, 1, 2, 5, 299, 300, 301, 1799, 1800, 1801, 3600, 90000]
ROLES = ["user", "assistant", "tool"]

conv_strategy = st.lists(
    st.tuples(
        st.sampled_from(GAPS),               # gap to previous turn (s)
        st.sampled_from(ROLES),
        st.booleans(),                       # has tool call
    ),
    min_size=1,
    max_size=12,
)
stream_strategy = st.lists(conv_strategy, min_size=1, max_size=3)


def _build(spark, stream):
    rows = []
    for ci, conv in enumerate(stream):
        t = T0
        for ti, (gap, role, has_tool) in enumerate(conv):
            if ti > 0:
                t = t + dt.timedelta(seconds=gap)
            rows.append(
                (f"conv-{ci:03d}", ti, role, f"t{ci}.{ti}",
                 "exec" if has_tool else None, t)
            )
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp_ntz",
    )
    return df, df.toPandas()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=stream_strategy)
def test_property_engine_matches_oracle(spark, stream):
    df, pdf = _build(spark, stream)
    eng = rolling_features(lag_lead_features(sessionize(df)))
    orc = oracle_rolling(oracle_lag_lead(oracle_sessionize(pdf)))
    cols = [
        "session_id", "prev_ts", "next_ts", "inter_turn_latency_s",
        "prev_role", "turns_last_10", "tool_rate_last_10",
        "latency_mean_300s", "latency_std_300s",
        "latency_min_300s", "latency_max_300s",
    ]
    e, o = aligned(eng, orc, cols)
    assert_allclose_frames(e, o)
    # both strategies must agree bit-for-bit on adversarial boundaries
    ep = rolling_features(
        lag_lead_features(sessionize(df)), strategy="prefix"
    )
    e2, _ = aligned(ep, orc, cols)
    assert e.astype(str).equals(e2.astype(str))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=stream_strategy, cut=st.floats(min_value=0.1, max_value=0.95))
def test_property_no_temporal_leakage(spark, stream, cut):
    """Features on input truncated at a drawn time T equal the
    full-input features for every row at ts <= T (next_ts is the one
    declared lead feature and is excluded)."""
    df, _ = _build(spark, stream)
    lo, hi = df.agg(F.min("ts"), F.max("ts")).collect()[0]
    T = lo + (hi - lo) * cut
    full = feature_vector(df).filter(F.col("ts") <= F.lit(T))
    trunc = feature_vector(df.filter(F.col("ts") <= F.lit(T)))
    backward = [c for c in full.columns if c != "next_ts"]
    a, b = full.select(backward), trunc.select(backward)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


MICRO_GAPS_US = [0, 1, 2, 3, 5, 7, 11, 499_999, 500_000, 500_001,
                 999_999, 1_000_001, 299_999_999, 300_000_001]

micro_conv_strategy = st.lists(
    st.sampled_from(MICRO_GAPS_US), min_size=2, max_size=10
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(gaps=st.lists(micro_conv_strategy, min_size=1, max_size=2))
def test_property_submillisecond_exactness(spark, gaps):
    """ADVICE r2 hardening: microsecond-scale latencies put windowed
    means on the 0.5µs rounding lattice — the exact cross-engine
    failure mode the integer-limb machinery exists for.  Engine and
    pandas oracle must agree STRICTLY (string equality, not allclose)
    on mean/std for random sub-ms gap streams."""
    rows = []
    for ci, conv in enumerate(gaps):
        t = T0
        for ti, g_us in enumerate(conv):
            if ti > 0:
                t = t + dt.timedelta(microseconds=g_us)
            rows.append((f"c{ci}", ti, "user", "x", None, t))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp_ntz",
    )
    pdf = df.toPandas()
    cols = ["latency_mean_300s", "latency_std_300s"]
    orc = oracle_rolling(oracle_lag_lead(pdf)).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    for strat in ("sliding", "prefix"):
        eng = (
            rolling_features(lag_lead_features(df), strategy=strat)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        )
        for c in cols:
            assert eng[c].astype(str).tolist() == orc[c].astype(str).tolist(), (
                strat, c,
            )
