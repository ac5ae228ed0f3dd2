"""As-of join: oracle parity, impl equivalence, zero temporal leakage."""

import datetime as dt

import pyspark.sql.functions as F

from radarpipeline_spark.operators import asof_join, asof_join_pandas, feature_vector
from radarpipeline_spark.oracle import oracle_asof_backfill
from tests.helpers import aligned, assert_allclose_frames


def test_oracle_parity(spark, tiny, tiny_pdf, aux, aux_pdf):
    e, o = aligned(
        asof_join(tiny, aux), oracle_asof_backfill(tiny_pdf, aux_pdf),
        ["asof_aux_value"],
    )
    assert_allclose_frames(e, o)


def test_catalyst_equals_pandas_impl(spark, tiny, aux):
    a = asof_join(tiny, aux).select("conv_id", "turn_idx", "asof_aux_value")
    b = asof_join_pandas(tiny, aux).select("conv_id", "turn_idx", "asof_aux_value")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_exact_match_included(spark):
    """aux row at exactly the turn's ts must be visible (ts' <= ts)."""
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("c", 0, t0)], "conv_id string, turn_idx int, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [("c", t0, 1.5)], "conv_id string, ts timestamp_ntz, aux_value double"
    )
    assert asof_join(left, right).collect()[0]["asof_aux_value"] == 1.5


def test_future_rows_never_leak(spark):
    """aux strictly after the turn must NOT be carried backward."""
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("c", 0, t0)], "conv_id string, turn_idx int, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [("c", t0 + dt.timedelta(microseconds=1), 9.9)],
        "conv_id string, ts timestamp_ntz, aux_value double",
    )
    assert asof_join(left, right).collect()[0]["asof_aux_value"] is None


def test_truncation_leakage_property(spark, tiny, aux):
    """north_rule leakage gate: features computed on a time-truncated
    input (rows ts <= T) must equal the full-input features for every
    row at ts <= T — any difference proves a read of future data.
    next_ts is the one declared *lead* feature and is excluded."""
    T = tiny.approxQuantile("turn_idx", [0.5], 0.0)[0]  # not used; pick time T below
    tmax = tiny.agg(F.max("ts")).collect()[0][0]
    tmin = tiny.agg(F.min("ts")).collect()[0][0]
    T = tmin + (tmax - tmin) / 2

    full = feature_vector(tiny, aux).filter(F.col("ts") <= F.lit(T))
    trunc = feature_vector(
        tiny.filter(F.col("ts") <= F.lit(T)), aux.filter(F.col("ts") <= F.lit(T))
    )
    backward = [c for c in full.columns if c != "next_ts"]
    a, b = full.select(backward), trunc.select(backward)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pandas_directions_and_tolerance(spark):
    """forward / nearest / tolerance semantics of the merge_asof path."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("c", 0, t0 + dt.timedelta(seconds=100))],
        "conv_id string, turn_idx int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("c", t0 + dt.timedelta(seconds=40), 1.0),   # 60s before
            ("c", t0 + dt.timedelta(seconds=130), 2.0),  # 30s after
        ],
        "conv_id string, ts timestamp_ntz, aux_value double",
    )

    def val(**kw):
        return asof_join_pandas(left, right, **kw).collect()[0]["asof_aux_value"]

    assert val() == 1.0                                   # backward
    assert val(direction="forward") == 2.0
    assert val(direction="nearest") == 2.0                # 30s < 60s
    assert val(tolerance_s=50) is None                    # backward, >50s away
    assert val(direction="forward", tolerance_s=50) == 2.0


def test_multi_column_rowwise_atomicity(spark):
    """merge_asof semantics: the carried right row is atomic — a NULL in
    one of its columns must NOT be backfilled from an older row."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("c", 0, t0 + dt.timedelta(seconds=100))],
        "conv_id string, turn_idx int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("c", t0 + dt.timedelta(seconds=10), 1.0, "full"),
            ("c", t0 + dt.timedelta(seconds=50), 2.0, None),  # latest: y is NULL
        ],
        "conv_id string, ts timestamp_ntz, x double, y string",
    )
    for impl in (asof_join, asof_join_pandas):
        row = impl(left, right).collect()[0]
        assert row["asof_x"] == 2.0, impl.__name__
        assert row["asof_y"] is None, impl.__name__  # NOT "full"


def test_pandas_bucketed_null_keys_match_per_entity(spark):
    """ADVICE r3: pd.merge_asof(by=) never matches NaN keys, so the
    bucketed default used to give NULL-conv_id rows NULL backfills
    while the per-entity path matched them as one entity.  NULL keys
    now route to a dedicated bucket merged WITHOUT by= — bucketed and
    per-entity outputs must agree, including the NULL entity."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    left = spark.createDataFrame(
        [("a", 0, t0 + 10 * sec), (None, 0, t0 + 10 * sec),
         (None, 1, t0 + 30 * sec), ("b", 0, t0 + 5 * sec)],
        "conv_id string, turn_idx int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("a", t0 + 1 * sec, 1.0), (None, t0 + 2 * sec, 7.0),
         (None, t0 + 20 * sec, 8.0)],
        "conv_id string, ts timestamp_ntz, aux_value double",
    )
    key = lambda df: sorted(  # noqa: E731
        ((r["conv_id"], r["turn_idx"], r["asof_aux_value"])
         for r in df.collect()),
        key=repr,
    )
    bucketed = key(asof_join_pandas(left, right, n_buckets=4))
    per_entity = key(asof_join_pandas(left, right, n_buckets=None))
    assert bucketed == per_entity
    got = {(c, t): v for c, t, v in bucketed}
    assert got[(None, 0)] == 7.0 and got[(None, 1)] == 8.0
    assert got[("a", 0)] == 1.0 and got[("b", 0)] is None


def test_pandas_bucketed_nan_float_keys_stay_per_entity(spark):
    """ADVICE r4: the NULL-bucket used to be inferred from DATA
    (lpdf[by].isna().all()) — for a FLOAT `by` column, NaN keys are
    non-NULL (they hash into normal buckets), and a normal bucket whose
    left rows are coincidentally all-NaN flipped by= off and
    cross-matched those rows against OTHER entities' right rows sharing
    the bucket.  use_by now comes from the cogroup KEY, so a NaN-key
    row must never receive a backfill from a different float entity."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    nan = float("nan")
    left = spark.createDataFrame(
        [(nan, 0, t0 + 10 * sec), (7.0, 0, t0 + 10 * sec)],
        "conv_id double, turn_idx int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(7.0, t0 + 1 * sec, 1.0)],
        "conv_id double, ts timestamp_ntz, aux_value double",
    )
    # n_buckets=1 forces the NaN-key left row and entity 7.0's right
    # row into the SAME (all-left-rows-include-NaN-capable) bucket;
    # with data-sniffed use_by a 1-bucket layout where the NaN row is
    # alone on the left would cross-match it against 7.0's right row.
    for n_buckets in (1, 4):
        out = {}
        for r in asof_join_pandas(left, right, n_buckets=n_buckets).collect():
            k = r["conv_id"]
            out["nan" if k is None or math.isnan(k) else k] = (
                r["asof_aux_value"]
            )
        assert len(out) == 2
        assert out[7.0] == 1.0, n_buckets
        # NaN is its own entity: merge_asof(by=) never matches NaN —
        # no cross-entity backfill.  (The key itself round-trips as
        # None: pandas/Arrow conflates NaN with missing in nullable
        # float columns — a pandas-path representation caveat, not a
        # matching bug.)
        assert out["nan"] is None, n_buckets
