"""Lag/lead + rolling aggregates vs the pandas oracle (allclose)."""

from radarpipeline_spark.operators import lag_lead_features, rolling_features
from radarpipeline_spark.oracle import oracle_lag_lead, oracle_rolling
from tests.helpers import aligned, assert_allclose_frames

LL_COLS = ["prev_ts", "next_ts", "inter_turn_latency_s", "prev_role"]
ROLL_COLS = [
    "turns_last_10", "tool_rate_last_10",
    "latency_mean_300s", "latency_std_300s",
    "latency_min_300s", "latency_max_300s",
]


def test_lag_lead_parity(spark, tiny, tiny_pdf):
    e, o = aligned(lag_lead_features(tiny), oracle_lag_lead(tiny_pdf), LL_COLS)
    assert_allclose_frames(e, o)


def test_rolling_parity(spark, tiny, tiny_pdf):
    eng = rolling_features(lag_lead_features(tiny))
    orc = oracle_rolling(oracle_lag_lead(tiny_pdf))
    e, o = aligned(eng, orc, ROLL_COLS)
    assert_allclose_frames(e, o)
