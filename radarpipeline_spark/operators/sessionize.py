"""Gap-based sessionization.

The reference's only sessionization-like operator is the battery
status-run segmentation inside a pandas plugin (consecutive-row
timestamp diff summed per day; semantics pinned by
reference: tests/resources/expected_output/phone_battery_charging_duration.csv).
Here it is a first-class Catalyst operator: lag -> gap flag -> running
sum, deterministic and batch-resumable (unlike ``session_window``,
which is kept for the streaming variant in
``radarpipeline_spark.streaming``).

All math is done on microsecond integers (``unix_micros``) so Spark and
any SQL oracle agree bit-exactly; no float timestamps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from radarpipeline_spark.functions.time import ts_us

MICROS = 1_000_000


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Add ``session_id`` (0-based per entity): a new session starts when
    the gap since the previous turn exceeds ``gap_seconds``.

    One shuffle on ``entity_col``; the lag and the running sum share the
    same window spec so Spark evaluates them in a single Window node
    over one sort.
    """
    w = Window.partitionBy(entity_col).orderBy(order_col)
    prev_us = F.lag(ts_us(ts_col)).over(w)
    gap_us = ts_us(ts_col) - prev_us
    new_session = F.when(
        prev_us.isNull() | (gap_us > gap_seconds * MICROS), 1
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", (F.sum(new_session).over(running) - 1).cast("int")
    )


def session_stats(
    df: DataFrame,
    gap_seconds: int = 1800,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-session rollup: turn count, wall-clock duration, tool calls.

    Generalizes the reference's per-(user, day) aggregates (daily step
    sum, charging duration — reference:
    tests/test_integration/test_integration.py:30-51) to gap sessions.
    The groupBy reuses the sessionize shuffle partitioning (same leading
    key), so AQE plans a single exchange.
    """
    s = sessionize(df, gap_seconds, entity_col, order_col, ts_col)
    return s.groupBy(entity_col, "session_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.max(ts_us(ts_col)) - F.min(ts_us(ts_col)))
            / MICROS
        ).alias("duration_s"),
        F.sum(F.when(F.col(tool_col).isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_tool_calls"),
    )
