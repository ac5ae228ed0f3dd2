"""Gap-sessionization: hand-computed cases + oracle parity.

Mirrors the reference's golden-output pattern
(reference: tests/test_integration/test_integration.py:30-52) with a
pandas oracle instead of checked-in CSVs.
"""

import datetime as dt

import pyspark.sql.functions as F

from radarpipeline_spark.operators import session_stats, sessionize
from radarpipeline_spark.oracle import oracle_session_stats, oracle_sessionize
from tests.helpers import aligned, assert_allclose_frames


def _mk(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", f"t{i}", None, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
         for (c, i, s) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
    )


def test_hand_computed_boundaries(spark):
    # gaps: 1800s exactly -> SAME session (rule is strictly >); 1801 -> new
    rows = [
        ("a", 0, 0),
        ("a", 1, 1800),      # gap 1800 == threshold: same session
        ("a", 2, 3601),      # gap 1801: new session
        ("b", 0, 50),        # single-turn conversation
    ]
    out = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize(_mk(spark, rows), gap_seconds=1800).collect()
    }
    assert out == {("a", 0): 0, ("a", 1): 0, ("a", 2): 1, ("b", 0): 0}


def test_oracle_parity(spark, tiny, tiny_pdf):
    e, o = aligned(
        sessionize(tiny), oracle_sessionize(tiny_pdf), ["session_id"]
    )
    assert_allclose_frames(e, o)


def test_session_stats_parity(spark, tiny, tiny_pdf):
    eng = session_stats(tiny).toPandas().sort_values(
        ["conv_id", "session_id"], ignore_index=True
    )
    orc = oracle_session_stats(tiny_pdf).sort_values(
        ["conv_id", "session_id"], ignore_index=True
    )
    cols = ["n_turns", "duration_s", "n_tool_calls", "session_start", "session_end"]
    assert_allclose_frames(eng[cols], orc[cols])


def test_skewed_conv_sessionizes(spark, tiny):
    # the 500-turn skew conversation must still get contiguous session ids
    s = sessionize(tiny).filter(F.col("conv_id") == "conv-00000000")
    mx = s.agg(F.max("session_id")).collect()[0][0]
    n = s.count()
    assert n == 500 and mx >= 0
