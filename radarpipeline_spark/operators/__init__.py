from radarpipeline_spark.operators.asof import asof_join, asof_join_pandas
from radarpipeline_spark.operators.features import feature_vector
from radarpipeline_spark.operators.lag_lead import lag_lead_features
from radarpipeline_spark.operators.rolling import rolling_features
from radarpipeline_spark.operators.sessionize import sessionize, session_stats
from radarpipeline_spark.operators.skew import (
    chunked_feature_vector,
    skew_routed_feature_vector,
)

__all__ = [
    "sessionize",
    "session_stats",
    "lag_lead_features",
    "rolling_features",
    "asof_join",
    "asof_join_pandas",
    "feature_vector",
    "chunked_feature_vector",
    "skew_routed_feature_vector",
]
