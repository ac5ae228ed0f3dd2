from radarpipeline_spark.features.api import Feature, FeatureGroup, run_feature_groups
from radarpipeline_spark.features.radar_features import (
    PhoneBatteryChargingDuration,
    RadarDemoFeatures,
    StepCountPerDay,
)

__all__ = [
    "Feature",
    "FeatureGroup",
    "run_feature_groups",
    "StepCountPerDay",
    "PhoneBatteryChargingDuration",
    "RadarDemoFeatures",
]
