"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` holds the
DuckDB-runnable ANSI-SQL twin of each.  The transcript-domain queries
derive the mandated transcripts table
(conv_id, turn_idx, role, text, tool, ts) deterministically from the
``events`` parquet table so both engines see identical input.

Float columns are rounded to 6 decimals on BOTH sides so engine/oracle
value-hashes agree despite windowed-aggregation summation-order ulp
drift (DuckDB uses segment trees for window aggregates; Spark iterates
frames — same math, different association order).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from radarpipeline_spark.operators import (
    asof_join,
    feature_vector,
    lag_lead_features,
    rolling_features,
    session_stats,
    sessionize,
)
from radarpipeline_spark.sources import (
    aux_signals_from_events,
    load_table,
    transcripts_from_events,
)
from radarpipeline_spark.sources.transcripts import AUX_SIGNALS_SQL, TRANSCRIPTS_SQL

_T = f"WITH t AS ({TRANSCRIPTS_SQL}), a AS ({AUX_SIGNALS_SQL})"


def _pin_tz(spark: SparkSession) -> None:
    # NTZ->epoch conversions must agree with DuckDB's naive timestamps.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_tz(spark)
    return transcripts_from_events(load_table(spark, sf_dir, "events"))


def _aux(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_tz(spark)
    return aux_signals_from_events(load_table(spark, sf_dir, "events"))


def _round6(df: DataFrame, *cols: str) -> DataFrame:
    return df.select(
        *[
            F.round(F.col(c), 6).alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


# ---------------------------------------------------------------- queries


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transcripts(spark, sf_dir)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "ts", "session_id"
    )


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = lag_lead_features(_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "ts", "prev_ts", "next_ts",
        "inter_turn_latency_s", "prev_role",
    )
    return _round6(df, "inter_turn_latency_s")


def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = rolling_features(lag_lead_features(_transcripts(spark, sf_dir))).select(
        "conv_id", "turn_idx", "turns_last_10", "tool_rate_last_10",
        "latency_mean_300s", "latency_std_300s",
        "latency_min_300s", "latency_max_300s",
    )
    return _round6(
        df,
        "tool_rate_last_10", "latency_mean_300s", "latency_std_300s",
        "latency_min_300s", "latency_max_300s",
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = session_stats(_transcripts(spark, sf_dir))
    return _round6(df, "duration_s")


def q_asof_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = asof_join(_transcripts(spark, sf_dir), _aux(spark, sf_dir)).select(
        "conv_id", "turn_idx", "ts", "asof_aux_value"
    )
    return _round6(df, "asof_aux_value")


def q_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = feature_vector(_transcripts(spark, sf_dir), _aux(spark, sf_dir))
    return _round6(
        df,
        "inter_turn_latency_s", "tool_rate_last_10",
        "latency_mean_300s", "latency_std_300s",
        "latency_min_300s", "latency_max_300s", "asof_aux_value",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full per-turn feature vector at sf0.001."""
    return q_feature_vector(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": q_transcripts,
        "sessionize": q_sessionize,
        "lag_lead": q_lag_lead,
        "rolling": q_rolling,
        "session_stats": q_session_stats,
        "asof_backfill": q_asof_backfill,
        "feature_vector": q_feature_vector,
    }


# ------------------------------------------------------------- oracle SQL

_SESSION_CTE = """
l AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_us
  FROM t
),
g AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                 THEN 1 ELSE 0 END AS new_s
  FROM l
),
s AS (
  SELECT *, CAST(SUM(new_s) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INTEGER)
      AS session_id
  FROM g
)
"""

_LAG_LEAD_SELECT = """
  SELECT conv_id, turn_idx, ts,
         lag(ts)  OVER w AS prev_ts,
         lead(ts) OVER w AS next_ts,
         round((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0, 6)
             AS inter_turn_latency_s,
         lag(role) OVER w AS prev_role
  FROM t
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
"""

_ROLLING_SELECT = """
  SELECT conv_id, turn_idx,
         count(*) OVER wr AS turns_last_10,
         round(avg(CASE WHEN tool IS NOT NULL THEN 1.0 ELSE 0.0 END) OVER wr, 6)
             AS tool_rate_last_10,
         round(avg(lat)    OVER wt, 6) AS latency_mean_300s,
         round(stddev_samp(lat) OVER wt, 6) AS latency_std_300s,
         round(min(lat)    OVER wt, 6) AS latency_min_300s,
         round(max(lat)    OVER wt, 6) AS latency_max_300s
  FROM ll
  WINDOW
    wr AS (PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
    wt AS (PARTITION BY conv_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
"""

_LL_CTE = """
ll AS (
  SELECT conv_id, turn_idx, ts, tool,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000.0 AS lat
  FROM t
)
"""

_ASOF_CTE = """
u AS (
  SELECT conv_id, turn_idx, ts, CAST(NULL AS DOUBLE) AS aux_value, 1 AS is_left
  FROM t
  UNION ALL
  SELECT conv_id, NULL AS turn_idx, ts, aux_value, 0 AS is_left
  FROM a
),
filled AS (
  SELECT *, last_value(aux_value IGNORE NULLS) OVER (
      PARTITION BY conv_id ORDER BY epoch_us(ts), is_left
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_aux_value
  FROM u
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": TRANSCRIPTS_SQL,
        "sessionize": f"{_T}, {_SESSION_CTE}"
        " SELECT conv_id, turn_idx, ts, session_id FROM s",
        "lag_lead": f"{_T} {_LAG_LEAD_SELECT}",
        "rolling": f"{_T}, {_LL_CTE} {_ROLLING_SELECT}",
        "session_stats": f"{_T}, {_SESSION_CTE}"
        """
        SELECT conv_id, session_id,
               count(*) AS n_turns,
               min(ts) AS session_start,
               max(ts) AS session_end,
               round((max(us) - min(us)) / 1000000.0, 6) AS duration_s,
               sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS n_tool_calls
        FROM s GROUP BY conv_id, session_id
        """,
        "asof_backfill": f"{_T}, {_ASOF_CTE}"
        " SELECT conv_id, turn_idx, ts, round(asof_aux_value, 6) AS asof_aux_value"
        " FROM filled WHERE is_left = 1",
        "feature_vector": f"{_T}, {_SESSION_CTE}, "
        """
        fl AS (
          SELECT s.*,
                 lag(ts)  OVER w AS prev_ts,
                 lead(ts) OVER w AS next_ts,
                 (us - prev_us) / 1000000.0 AS lat,
                 lag(role) OVER w AS prev_role
          FROM s
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ),
        fr AS (
          SELECT *,
                 count(*) OVER wr AS turns_last_10,
                 avg(CASE WHEN tool IS NOT NULL THEN 1.0 ELSE 0.0 END) OVER wr
                     AS tool_rate_last_10,
                 avg(lat)    OVER wt AS latency_mean_300s,
                 stddev_samp(lat) OVER wt AS latency_std_300s,
                 min(lat)    OVER wt AS latency_min_300s,
                 max(lat)    OVER wt AS latency_max_300s
          FROM fl
          WINDOW
            wr AS (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
            wt AS (PARTITION BY conv_id ORDER BY us
                   RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
        ),
        au AS (
          SELECT conv_id, us, aux_value, 0 AS is_left,
                 CAST(NULL AS INTEGER) AS turn_idx
          FROM (SELECT conv_id, epoch_us(ts) AS us, aux_value FROM a)
          UNION ALL
          SELECT conv_id, us, CAST(NULL AS DOUBLE), 1, turn_idx FROM fr
        ),
        af AS (
          SELECT conv_id, turn_idx, is_left,
                 last_value(aux_value IGNORE NULLS) OVER (
                     PARTITION BY conv_id ORDER BY us, is_left
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS asof_aux_value
          FROM au
        )
        SELECT fr.conv_id, fr.turn_idx, fr.role, fr.text, fr.tool, fr.ts,
               fr.session_id, fr.prev_ts, fr.next_ts,
               round(fr.lat, 6) AS inter_turn_latency_s,
               fr.prev_role, fr.turns_last_10,
               round(fr.tool_rate_last_10, 6) AS tool_rate_last_10,
               round(fr.latency_mean_300s, 6) AS latency_mean_300s,
               round(fr.latency_std_300s, 6) AS latency_std_300s,
               round(fr.latency_min_300s, 6) AS latency_min_300s,
               round(fr.latency_max_300s, 6) AS latency_max_300s,
               round(af.asof_aux_value, 6) AS asof_aux_value
        FROM fr JOIN af
          ON fr.conv_id = af.conv_id AND fr.turn_idx = af.turn_idx
         AND af.is_left = 1
        """,
    }
