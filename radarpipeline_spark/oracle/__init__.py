from radarpipeline_spark.oracle.pandas_oracle import (
    oracle_asof_backfill,
    oracle_feature_vector,
    oracle_lag_lead,
    oracle_rolling,
    oracle_session_stats,
    oracle_sessionize,
)

__all__ = [
    "oracle_sessionize",
    "oracle_lag_lead",
    "oracle_rolling",
    "oracle_asof_backfill",
    "oracle_session_stats",
    "oracle_feature_vector",
]
