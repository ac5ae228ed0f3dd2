"""The reference's two demonstrated analytic features, as Catalyst plans.

Semantics pinned by the reference's golden outputs
(reference: tests/resources/expected_output/step_count_per_day.csv and
phone_battery_charging_duration.csv, asserted sorted-equal in
tests/test_integration/test_integration.py:30-52).
"""

from __future__ import annotations

from typing import Dict

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from radarpipeline_spark.features.api import Feature, FeatureGroup
from radarpipeline_spark.functions.time import ts_us

MICROS = 1_000_000


class StepCountPerDay(Feature):
    """Per (user, day) sum of steps — golden columns
    ``key.userId, date, value.steps`` (A1 in SURVEY.md §2.5).

    Pure hash aggregate: partial map-side combine + final, no window."""

    name = "step_count_per_day"
    description = "daily total step count per user"
    required_input_data = ["android_phone_step_count"]

    def calculate(self, data: Dict[str, DataFrame]) -> DataFrame:
        df = data["android_phone_step_count"]
        return (
            df.groupBy(
                F.col("`key.userId`").alias("key.userId"),
                F.to_date("`value.time`").alias("date"),
            )
            .agg(F.sum("`value.steps`").alias("value.steps"))
            .orderBy("`key.userId`", "date")
        )


class PhoneBatteryChargingDuration(Feature):
    """Total time spent CHARGING per (user, day) — golden columns
    ``key.userId, date, value.status, value.statusTime,
    value.statusTimeInSeconds`` (A2 in SURVEY.md §2.5).

    Interpretation (the plugin source is external; derived from the
    golden output's shape): sort each user's battery samples by time,
    attribute the interval to the *earlier* sample's status, keep
    CHARGING intervals, sum per (user, date of interval start).  The
    golden ``value.statusTimeInSeconds`` column actually stores
    **minutes** (total_seconds/60 — e.g. 141.0035 for 02:21:00.21,
    expected_output/phone_battery_charging_duration.csv:2); reproduced
    faithfully, quirk and all.

    One window (lead over user/time) + one hash aggregate.
    """

    name = "phone_battery_charging_duration"
    description = "daily charging duration per user"
    required_input_data = ["android_phone_battery_level"]

    def calculate(self, data: Dict[str, DataFrame]) -> DataFrame:
        df = data["android_phone_battery_level"]
        w = Window.partitionBy("`key.userId`").orderBy("`value.time`")
        iv = (
            df.select(
                F.col("`key.userId`").alias("uid"),
                F.col("`value.time`").alias("t"),
                F.col("`value.status`").alias("status"),
            )
            .withColumn("next_t", F.lead("t").over(Window.partitionBy("uid").orderBy("t")))
            .filter((F.col("status") == "CHARGING") & F.col("next_t").isNotNull())
            .withColumn("dur_us", ts_us("next_t") - ts_us("t"))
        )
        out = (
            iv.groupBy(
                F.col("uid").alias("key.userId"),
                F.to_date("t").alias("date"),
            )
            .agg(
                F.first(F.lit("CHARGING")).alias("value.status"),
                F.sum("dur_us").alias("__us"),
            )
            .select(
                "`key.userId`",
                "date",
                "`value.status`",
                # golden statusTime is a pandas Timedelta string
                F.concat(
                    F.floor(F.col("__us") / (86400 * MICROS)).cast("string"),
                    F.lit(" days "),
                    F.date_format(
                        F.timestamp_micros(F.pmod(F.col("__us"), F.lit(86400 * MICROS))),
                        "HH:mm:ss.SSSSSS",
                    ),
                ).alias("value.statusTime"),
                (F.col("__us") / MICROS / 60.0).alias("value.statusTimeInSeconds"),
            )
            .orderBy("`key.userId`", "date")
        )
        return out


class RadarDemoFeatures(FeatureGroup):
    """The reference's demo feature group (mock_features equivalent)."""

    name = "radar_demo_features"
    description = "step count + battery charging duration"
    features = [StepCountPerDay, PhoneBatteryChargingDuration]
