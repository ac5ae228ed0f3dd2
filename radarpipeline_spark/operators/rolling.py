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


def rolling_features(
    df: DataFrame,
    last_k: int = 10,
    range_seconds: int = 300,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    tool_col: str = "tool",
    latency_col: str = "inter_turn_latency_s",
) -> DataFrame:
    """Add rolling features; requires ``latency_col`` (see lag_lead).

    * ``turns_last_{k}``       — count over rowsBetween(-(k-1), 0)
    * ``tool_rate_last_{k}``   — fraction of tool turns in same frame
    * ``latency_{mean,std,min,max}_{Δ}s`` — stats of inter-turn latency
      over rangeBetween(-Δ·10⁶, 0) on unix_micros(ts) — integer range
      bounds, so engine/oracle frame membership is bit-exact.
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
    # ONE select: expressions sharing a window spec land in the same
    # physical Window node (interleaved withColumn Projects would block
    # Spark's CollapseWindow rule and cost one Sort per feature).
    return df.select(
        *df.columns,
        F.count("*").over(row_frame).cast("long").alias(f"turns_last_{k}"),
        F.avg(is_tool).over(row_frame).alias(f"tool_rate_last_{k}"),
        F.avg(lat).over(time_frame).alias(f"latency_mean_{d}s"),
        F.stddev_samp(lat).over(time_frame).alias(f"latency_std_{d}s"),
        F.min(lat).over(time_frame).alias(f"latency_min_{d}s"),
        F.max(lat).over(time_frame).alias(f"latency_max_{d}s"),
    )
