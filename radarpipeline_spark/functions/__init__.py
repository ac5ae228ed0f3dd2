from radarpipeline_spark.functions.time import ts_us

__all__ = ["ts_us"]
