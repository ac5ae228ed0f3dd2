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
    """
    if strategy == "prefix":
        return rolling_features_prefix(
            df, last_k, range_seconds, entity_col, order_col, ts_col,
            tool_col, latency_col,
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
    prep_cols, mean_s, std_s = deterministic_lat_stats(latency_col, time_frame)
    lat = F.col(latency_col)
    out_cols = df.columns
    df = df.select(*df.columns, *prep_cols)  # limbs: once per row
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
) -> DataFrame:
    """Range-frame sums via PREFIX totals + a self-as-of diff.

    Sliding frames make Spark replay every frame row per output row
    (O(rows x frame) aggregate updates) — ruinous when many turns fall
    inside the Δ-second window.  Sums are subtractable, so running
    totals are computed once (incremental range-unbounded frame) and
    diffed against the total just before each row's frame start via a
    self-as-of LOCF pass (see :func:`prefix_lat_stats`).  The shared
    :func:`finish_lat_stats` turns the exact integers into the same
    bit-identical floats as the sliding strategy.

    Measured 2x faster than sliding at ~30 turns/frame (12.1s -> 6.1s
    on 10.5M turns at 8 cores, internally controlled) — a
    growing-frame-diff variant WITHOUT the union (cum[..now] minus
    cum[..now-Δ-1] as two unbounded-lower window frames) was also
    tried and measured no better than sliding: Spark's per-function
    frame machinery costs ~the same per row as the replay at this
    frame size, while the union's single LOCF pass amortizes all five
    diffs into one carry.

    min/max are not subtractable and stay sliding; the row-frame pair
    (turns/tool-rate, last-k rows) is cheap and stays sliding too.
    No persist: probe+anchor twins fan out of the single totals pass
    via one inline explode (a prior two-consumer union needed a persist
    that leaked cached blocks for the session lifetime); no extra
    shuffle — every pass partitions on ``entity_col``.
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
) -> DataFrame:
    """Add ``out_mean``/``out_std`` (the exact deterministic latency
    stats over the trailing Δ-second range frame) to ``df`` via the
    prefix-total + self-as-of technique, partitioned by
    ``partition_cols`` — reusable by the chunked/skew path, which
    partitions on (entity, chunk).  See rolling_features_prefix."""
    lat_us = F.round(F.col(latency_col) * F.lit(1e6), 0).cast("long")
    a = F.floor(lat_us / F.lit(float(1 << 21))).cast("long")
    b = lat_us - a * F.lit(1 << 21)
    cum_frame = (
        Window.partitionBy(*partition_cols)
        .orderBy(ts_us(ts_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_cols = df.columns
    # incremental frames add each row exactly once, so the limb
    # expressions can live inline (no per-frame re-evaluation)
    totals = df.select(
        *in_cols,
        F.count(lat_us).over(cum_frame).alias("__tn"),
        F.sum(lat_us).over(cum_frame).alias("__ts"),
        F.sum(a * a).over(cum_frame).alias("__t2"),
        F.sum(F.lit(2) * a * b).over(cum_frame).alias("__t1"),
        F.sum(b * b).over(cum_frame).alias("__t0"),
        ts_us(ts_col).alias("__us"),
    )

    # Each totals row fans out into its ANCHOR twin (tag 0, carries the
    # running totals at position ts) and its PROBE twin (tag 1, at
    # position ts - Δ - 1, totals NULL) via ONE inline explode — a
    # single derivation of the window pass, so no persist is needed
    # (the previous union of two totals consumers persisted the window
    # output and leaked the cached blocks for the session lifetime).
    cum_t = "struct<n:bigint,s:bigint,c2:bigint,c1:bigint,c0:bigint>"
    cum_struct = F.struct(
        F.col("__tn").alias("n"),
        F.col("__ts").alias("s"),
        F.col("__t2").alias("c2"),
        F.col("__t1").alias("c1"),
        F.col("__t0").alias("c0"),
    )
    u = totals.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    F.col("__us").alias("__pos"),
                    F.lit(0).alias("__tag"),
                    cum_struct.cast(cum_t).alias("__cum"),
                ),
                F.struct(
                    (F.col("__us") - F.lit(range_seconds * MICROS + 1)).alias(
                        "__pos"
                    ),
                    F.lit(1).alias("__tag"),
                    F.lit(None).cast(cum_t).alias("__cum"),
                ),
            )
        ).alias("__e"),
    ).select("*", "__e.*").drop("__e")
    locf = (
        Window.partitionBy(*partition_cols)
        .orderBy("__pos", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", F.last("__cum", ignorenulls=True).over(locf).alias("__bef")
    ).filter(F.col("__tag") == 1)

    bef = lambda f: F.coalesce(F.col("__bef").getField(f), F.lit(0))  # noqa: E731
    n_lat = F.col("__tn") - bef("n")
    sum_us = F.when(n_lat > 0, F.coalesce(F.col("__ts"), F.lit(0)) - bef("s"))
    s_c2 = F.when(n_lat > 0, F.coalesce(F.col("__t2"), F.lit(0)) - bef("c2"))
    s_c1 = F.when(n_lat > 0, F.coalesce(F.col("__t1"), F.lit(0)) - bef("c1"))
    s_c0 = F.when(n_lat > 0, F.coalesce(F.col("__t0"), F.lit(0)) - bef("c0"))
    mean_s, std_s = finish_lat_stats(n_lat, sum_us, s_c2, s_c1, s_c0)
    return filled.select(
        *in_cols, mean_s.alias(out_mean), std_s.alias(out_std)
    )
