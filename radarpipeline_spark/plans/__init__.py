from radarpipeline_spark.plans.builder import FeaturePlan, plan_shape

__all__ = ["FeaturePlan", "plan_shape"]
