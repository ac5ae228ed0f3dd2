"""Lag/lead turn features.

Generalizes the reference's consecutive-row timestamp diff (the pandas
``diff()`` inside the battery-duration plugin, semantics pinned by
reference: tests/resources/expected_output/phone_battery_charging_duration.csv)
into declarative window expressions.  Latency is computed on
microsecond integers and divided once, so the result is exact float64.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from radarpipeline_spark.functions.time import ts_us

MICROS = 1_000_000.0


def lag_lead_features(
    df: DataFrame,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
) -> DataFrame:
    """Add ``prev_ts``, ``next_ts``, ``inter_turn_latency_s``, ``prev_role``.

    All four expressions share one window spec -> single sort, single
    Window physical node, one shuffle on the entity key.
    """
    w = Window.partitionBy(entity_col).orderBy(order_col)
    prev_ts = F.lag(ts_col).over(w)
    # ONE select -> one Window node for all four expressions; latency is
    # derived from the already-computed lag, not a second window pass.
    return df.select(
        *df.columns,
        prev_ts.alias("prev_ts"),
        F.lead(ts_col).over(w).alias("next_ts"),
        ((ts_us(ts_col) - ts_us(prev_ts)) / F.lit(MICROS))
        .cast("double")
        .alias("inter_turn_latency_s"),
        F.lag(role_col).over(w).alias("prev_role"),
    )
