"""Rolling window aggregates over conversation turns.

Generalizes the reference's per-day grouped sum (StepCountPerDay,
reference: tests/resources/expected_output/step_count_per_day.csv) to
sliding frames: row-count frames (last-k turns) and time-range frames
(last Δ seconds).  Every feature is a built-in Catalyst expression —
no Python in the hot path — and features sharing a frame share one
Window node (mirrors the reference's FeatureGroup fan-out,
reference: radarpipeline/features/feature_group.py:59-72, but fused
into a single pass).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from radarpipeline_spark.functions.time import ts_us

MICROS = 1_000_000


def deterministic_lat_stats(latency_col: str, time_frame) -> tuple:
    """Windowed mean/std of latency-in-seconds, numerically deterministic
    across engines (Spark / DuckDB / pandas oracle).

    Plain avg()/stddev_samp() over doubles is summation-order-dependent
    (Spark iterates the frame, DuckDB uses segment trees), so a value
    can land one ulp across a rounding boundary and break cross-engine
    bit-equality.  Instead:

    * recover EXACT integer microseconds per row — round(lat*1e6)
      recovers the original integer since |nearest_double(n/1e6)*1e6-n|
      << 0.5 for any realistic gap;
    * take exact integer window sums (long / decimal(38,0) here,
      HUGEINT in the SQL twin) — order-independent by exactness;
    * finish with one fixed IEEE double expression, quantizing to
      integer micros BEFORE the final 1e6 division: halves are exactly
      representable at integer scale and every engine rounds them away
      from zero, whereas round(x, 6) on the post-division double hits
      genuine half-way disagreements (n=2 windows put means on a
      0.5 µs lattice — verified cross-engine failure at sf0.01).

    Returns ``(prep_cols, mean_expr, std_expr)``: project ``prep_cols``
    onto the frame FIRST (sliding frames re-evaluate each aggregate's
    child expression once per (row, frame element), so computing the
    limbs inside the window multiplies their cost by the frame size —
    as physical columns they cost one evaluation per row), then put
    mean/std in the same select as the other window expressions.
    std is sample-std, NULL for fewer than two latencies in the frame.
    """
    lat_us = F.round(F.col(latency_col) * F.lit(1e6), 0).cast("long")
    # Exact Σlat² WITHOUT a wide (decimal) sliding sum: Spark recomputes
    # sliding frames per row, and decimal adds are ~10-30x a long add
    # (measured 12.6s -> 143s on a 2M-turn single-conversation window).
    # Split lat_us = a*2^21 + b (floor division — any consistent split
    # recombines exactly), so lat² = a²*2^42 + 2ab*2^21 + b² with every
    # limb < 2^45: three CHEAP long window sums, recombined per row into
    # one decimal scalar.  Exact while |lat_us| < 2^43 (~100 days) and
    # frames < 2^18 latencies (long-overflow would raise under ANSI,
    # never silently corrupt).
    a = F.floor(lat_us / F.lit(float(1 << 21))).cast("long")
    b = lat_us - a * F.lit(1 << 21)
    prep_cols = [
        lat_us.alias("__lat_us"),
        (a * a).alias("__lat_c2"),
        (F.lit(2) * a * b).alias("__lat_c1"),
        (b * b).alias("__lat_c0"),
    ]
    lu = F.col("__lat_us")
    n_lat = F.count(lu).over(time_frame)
    sum_us = F.sum(lu).over(time_frame)
    s_c2 = F.sum("__lat_c2").over(time_frame)
    s_c1 = F.sum("__lat_c1").over(time_frame)
    s_c0 = F.sum("__lat_c0").over(time_frame)
    mean_s, std_s = finish_lat_stats(n_lat, sum_us, s_c2, s_c1, s_c0)
    return prep_cols, mean_s, std_s


def finish_lat_stats(n_lat, sum_us, s_c2, s_c1, s_c0) -> tuple:
    """Final mean/std expressions from the EXACT frame aggregates
    (count, Σlat, and the three Σlat² limbs) — shared by the sliding
    and prefix-diff strategies so both produce bit-identical floats."""
    sumsq_us = (
        s_c2.cast("decimal(38,0)") * F.lit(1 << 42).cast("decimal(38,0)")
        + s_c1.cast("decimal(38,0)") * F.lit(1 << 21).cast("decimal(38,0)")
        + s_c0.cast("decimal(38,0)")
    )
    var_num = (
        n_lat.cast("decimal(38,0)") * sumsq_us
        - sum_us.cast("decimal(38,0)") * sum_us.cast("decimal(38,0)")
    )
    var_den = (n_lat * (n_lat - F.lit(1))).cast("double")
    mean_s = F.round(sum_us.cast("double") / n_lat.cast("double"), 0) / F.lit(1e6)
    std_s = F.when(
        n_lat >= 2,
        F.round(F.sqrt(var_num.cast("double") / var_den), 0) / F.lit(1e6),
    )
    return mean_s, std_s


def rolling_features(
    df: DataFrame,
    last_k: int = 10,
    range_seconds: int = 300,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    tool_col: str = "tool",
    latency_col: str = "inter_turn_latency_s",
    strategy: str = "sliding",
    deterministic: bool = True,
) -> DataFrame:
    """Add rolling features; requires ``latency_col`` (see lag_lead).

    * ``turns_last_{k}``       — count over rowsBetween(-(k-1), 0)
    * ``tool_rate_last_{k}``   — fraction of tool turns in same frame
    * ``latency_{mean,std,min,max}_{Δ}s`` — stats of inter-turn latency
      over rangeBetween(-Δ·10⁶, 0) on unix_micros(ts) — integer range
      bounds, so engine/oracle frame membership is bit-exact.

    ``strategy``: ``"sliding"`` computes the five exact sums as sliding
    window aggregates (Spark replays the frame per row — cost grows
    with frame row count); ``"prefix"`` computes them as incremental
    running totals diffed via a self-as-of lookup at each frame start
    (cost independent of frame size — the dense-frame scale path; see
    :func:`rolling_features_prefix`).  Bit-identical outputs — pinned
    by tests.

    ``deterministic``: True (default, what bench.py and the oracle
    grade) computes mean/std via exact integer-microsecond sums —
    order-independent, bit-reproducible across engines/retries, at a
    measured ~28% premium on the windowed pass (the r2 "exactness
    tax").  False is the production fast path: plain double
    ``avg``/``stddev_samp`` (sliding) or double running sums (prefix),
    accurate to normal float tolerance but dependent on summation
    order — fine when parity is judged by allclose, not hashes.
    A/B numbers in BASELINE.md.
    """
    if strategy == "prefix":
        return rolling_features_prefix(
            df, last_k, range_seconds, entity_col, order_col, ts_col,
            tool_col, latency_col, deterministic=deterministic,
        )
    row_frame = (
        Window.partitionBy(entity_col)
        .orderBy(order_col)
        .rowsBetween(-(last_k - 1), Window.currentRow)
    )
    time_frame = (
        Window.partitionBy(entity_col)
        .orderBy(ts_us(ts_col))
        .rangeBetween(-range_seconds * MICROS, Window.currentRow)
    )
    is_tool = F.when(F.col(tool_col).isNotNull(), 1.0).otherwise(0.0)
    k, d = last_k, range_seconds
    lat = F.col(latency_col)
    out_cols = df.columns
    if deterministic:
        prep_cols, mean_s, std_s = deterministic_lat_stats(
            latency_col, time_frame
        )
        df = df.select(*df.columns, *prep_cols)  # limbs: once per row
    else:
        mean_s = F.avg(lat).over(time_frame)
        # stddev_samp yields NaN for n=1 frames where the prefix fast
        # path yields NULL — coalesce NaN -> NULL so both strategies
        # stay value-identical (and isNull/isnan filters agree)
        std_s = F.nanvl(
            F.stddev_samp(lat).over(time_frame), F.lit(None).cast("double")
        )
    # ONE select: expressions sharing a window spec land in the same
    # physical Window node (interleaved withColumn Projects would block
    # Spark's CollapseWindow rule and cost one Sort per feature).
    return df.select(
        *out_cols,
        F.count("*").over(row_frame).cast("long").alias(f"turns_last_{k}"),
        F.avg(is_tool).over(row_frame).alias(f"tool_rate_last_{k}"),
        mean_s.alias(f"latency_mean_{d}s"),
        std_s.alias(f"latency_std_{d}s"),
        F.min(lat).over(time_frame).alias(f"latency_min_{d}s"),
        F.max(lat).over(time_frame).alias(f"latency_max_{d}s"),
    )


def rolling_features_prefix(
    df: DataFrame,
    last_k: int = 10,
    range_seconds: int = 300,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    tool_col: str = "tool",
    latency_col: str = "inter_turn_latency_s",
    deterministic: bool = True,
) -> DataFrame:
    """Range-frame sums via growing-prefix totals, differenced per row.

    Sliding frames make Spark replay every frame row per output row
    (O(rows x frame) aggregate updates) — ruinous when many turns fall
    inside the Δ-second window.  Sums are subtractable, so each exact
    aggregate is evaluated as ``cum[..now] - cum[..now-Δ-1]`` over two
    unbounded-preceding range frames that only ever grow — Spark
    updates growing frames incrementally, so each row enters each
    aggregate exactly once (O(n), frame-size-independent; see
    :func:`prefix_lat_stats` for the designs this replaced and why).
    The shared :func:`finish_lat_stats` turns the exact integers into
    the same bit-identical floats as the sliding strategy.

    min/max are not subtractable and stay sliding; the row-frame pair
    (turns/tool-rate, last-k rows) is cheap and stays sliding too.
    No persist, no extra rows, no extra shuffle — every pass
    partitions on ``entity_col`` and the Δ-frames share the sliding
    min/max pass's sort order.
    """
    row_frame = (
        Window.partitionBy(entity_col)
        .orderBy(order_col)
        .rowsBetween(-(last_k - 1), Window.currentRow)
    )
    time_frame = (
        Window.partitionBy(entity_col)
        .orderBy(ts_us(ts_col))
        .rangeBetween(-range_seconds * MICROS, Window.currentRow)
    )
    is_tool = F.when(F.col(tool_col).isNotNull(), 1.0).otherwise(0.0)
    lat = F.col(latency_col)
    k, d = last_k, range_seconds

    out_cols = df.columns
    pass1 = df.select(
        *out_cols,
        F.count("*").over(row_frame).cast("long").alias(f"turns_last_{k}"),
        F.avg(is_tool).over(row_frame).alias(f"tool_rate_last_{k}"),
        F.min(lat).over(time_frame).alias(f"latency_min_{d}s"),
        F.max(lat).over(time_frame).alias(f"latency_max_{d}s"),
    )
    out = prefix_lat_stats(
        pass1, [entity_col], ts_col, latency_col, range_seconds,
        f"latency_mean_{d}s", f"latency_std_{d}s",
        deterministic=deterministic,
    )
    return out.select(
        *out_cols,
        f"turns_last_{k}",
        f"tool_rate_last_{k}",
        f"latency_mean_{d}s",
        f"latency_std_{d}s",
        f"latency_min_{d}s",
        f"latency_max_{d}s",
    )


def prefix_lat_stats(
    df: DataFrame,
    partition_cols: list,
    ts_col: str,
    latency_col: str,
    range_seconds: int,
    out_mean: str,
    out_std: str,
    deterministic: bool = True,
) -> DataFrame:
    """Add ``out_mean``/``out_std`` (latency stats over the trailing
    Δ-second range frame) to ``df`` via the prefix-total + self-as-of
    technique, partitioned by ``partition_cols`` — reusable by the
    chunked/skew path, which partitions on (entity, chunk).  See
    rolling_features_prefix.

    ``deterministic=False`` keeps the same one-pass plan shape but
    runs DOUBLE running sums of lat and lat² instead of the exact
    integer limbs — cheaper per row, float-tolerance accuracy (the
    prefix diff can lose precision when a frame's sum is tiny relative
    to its prefix totals — the usual running-sum cancellation; at
    realistic latency magnitudes the error stays ~1e-9 relative).

    Implementation: each exact aggregate is evaluated over TWO
    unbounded-preceding range frames in one Window node —
    ``cum[..now] - cum[..now-Δ-1]`` — and differenced per row.  Both
    frames only ever GROW, so Spark's window machinery updates them
    incrementally (each row enters each aggregate exactly once: O(n),
    frame-size-independent).  This replaced two earlier fan-out
    designs, each measured slower on the 10.5M-turn scaling input at
    local[8]: a probe/anchor union through a LOCF pass needed a
    persist of the totals (leaked cache blocks, +40% wall), and an
    inline-explode variant (2n wide rows through three chained
    in-stage sorts) hit sort-spill memory pressure at default heap
    (3x wall at bench heap, executor OOM at 1g).  The two-frame diff
    adds zero rows, zero extra sorts, and shares its sort order with
    the sliding min/max pass."""
    w = Window.partitionBy(*partition_cols).orderBy(ts_us(ts_col))
    cur = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    bef = w.rangeBetween(
        Window.unboundedPreceding, -range_seconds * MICROS - 1
    )
    in_cols = df.columns

    def diff(col_expr):
        return F.sum(col_expr).over(cur) - F.coalesce(
            F.sum(col_expr).over(bef), F.lit(0)
        )

    if deterministic:
        lat_us = F.round(F.col(latency_col) * F.lit(1e6), 0).cast("long")
        a = F.floor(lat_us / F.lit(float(1 << 21))).cast("long")
        b = lat_us - a * F.lit(1 << 21)
        n_lat = F.count(lat_us).over(cur) - F.count(lat_us).over(bef)
        mean_s, std_s = finish_lat_stats(
            n_lat,
            F.when(n_lat > 0, diff(lat_us)),
            F.when(n_lat > 0, diff(a * a)),
            F.when(n_lat > 0, diff(F.lit(2) * a * b)),
            F.when(n_lat > 0, diff(b * b)),
        )
    else:
        lat = F.col(latency_col).cast("double")
        n_lat = F.count(lat).over(cur) - F.count(lat).over(bef)
        nd = n_lat.cast("double")
        sum_lat = F.when(n_lat > 0, diff(lat))
        sum_sq = F.when(n_lat > 0, diff(lat * lat))
        mean_s = F.when(n_lat > 0, sum_lat / nd)
        var = (nd * sum_sq - sum_lat * sum_lat) / (nd * (nd - F.lit(1.0)))
        # running-sum cancellation can drive a ~0 variance a hair
        # negative — clamp before sqrt
        std_s = F.when(n_lat >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))
    return df.select(
        *in_cols, mean_s.alias(out_mean), std_s.alias(out_std)
    )


def rolling_features_multi(
    df: DataFrame,
    last_ks=(10,),
    range_windows=(300,),
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    tool_col: str = "tool",
    latency_col: str = "inter_turn_latency_s",
    strategy: str = "sliding",
    deterministic: bool = True,
) -> DataFrame:
    """Multi-horizon rolling features fused into ONE pass.

    Output columns: ``turns_last_{k}``/``tool_rate_last_{k}`` per k in
    ``last_ks`` and ``latency_{mean,std,min,max}_{Δ}s`` per Δ in
    ``range_windows`` — identical values to calling
    :func:`rolling_features` once per horizon (pinned by tests), but
    the plan stays ONE exchange and TWO sorts however many horizons
    are requested: every row frame shares the (entity, order) sort in
    one Window node, every range frame shares the (entity, ts) sort in
    the next (Spark's Window operator holds many frames per node, and
    CollapseWindow merges same-spec chains), and the deterministic
    integer-µs limbs are projected once and reused by every Δ.
    """
    is_tool = F.when(F.col(tool_col).isNotNull(), 1.0).otherwise(0.0)
    lat = F.col(latency_col)
    out_cols = df.columns

    # ---- all row frames: one select, one Window node ----------------
    row_exprs = []
    for k in last_ks:
        rf = (
            Window.partitionBy(entity_col)
            .orderBy(order_col)
            .rowsBetween(-(k - 1), Window.currentRow)
        )
        row_exprs += [
            F.count("*").over(rf).cast("long").alias(f"turns_last_{k}"),
            F.avg(is_tool).over(rf).alias(f"tool_rate_last_{k}"),
        ]
    df = df.select(*out_cols, *row_exprs)
    row_names = [e for k in last_ks
                 for e in (f"turns_last_{k}", f"tool_rate_last_{k}")]

    # ---- all range frames: shared (entity, ts) sort -----------------
    stat_names = []
    if strategy == "prefix":
        for d in range_windows:
            mm = df.select(
                "*",
                F.min(lat).over(_time_frame(entity_col, ts_col, d))
                .alias(f"latency_min_{d}s"),
                F.max(lat).over(_time_frame(entity_col, ts_col, d))
                .alias(f"latency_max_{d}s"),
            )
            df = prefix_lat_stats(
                mm, [entity_col], ts_col, latency_col, d,
                f"latency_mean_{d}s", f"latency_std_{d}s",
                deterministic=deterministic,
            )
            stat_names += [f"latency_{s}_{d}s" for s in
                           ("mean", "std", "min", "max")]
    else:
        prep_cols: list = []
        range_exprs = []
        for d in range_windows:
            tf = _time_frame(entity_col, ts_col, d)
            if deterministic:
                if not prep_cols:
                    prep_cols, _, _ = deterministic_lat_stats(latency_col, tf)
                # rebuild mean/std over THIS frame, reusing the one
                # projected limb set
                lu = F.col("__lat_us")
                mean_s, std_s = finish_lat_stats(
                    F.count(lu).over(tf),
                    F.sum(lu).over(tf),
                    F.sum("__lat_c2").over(tf),
                    F.sum("__lat_c1").over(tf),
                    F.sum("__lat_c0").over(tf),
                )
            else:
                mean_s = F.avg(lat).over(tf)
                # NaN (n=1) -> NULL: keep parity with the prefix path
                std_s = F.nanvl(
                    F.stddev_samp(lat).over(tf), F.lit(None).cast("double")
                )
            range_exprs += [
                mean_s.alias(f"latency_mean_{d}s"),
                std_s.alias(f"latency_std_{d}s"),
                F.min(lat).over(tf).alias(f"latency_min_{d}s"),
                F.max(lat).over(tf).alias(f"latency_max_{d}s"),
            ]
            stat_names += [f"latency_{s}_{d}s" for s in
                           ("mean", "std", "min", "max")]
        keep = df.columns
        if prep_cols:
            df = df.select(*keep, *prep_cols)
        df = df.select(*keep, *range_exprs)
    return df.select(*out_cols, *row_names, *stat_names)


def _time_frame(entity_col: str, ts_col: str, range_seconds: int):
    return (
        Window.partitionBy(entity_col)
        .orderBy(ts_us(ts_col))
        .rangeBetween(-range_seconds * MICROS, Window.currentRow)
    )
