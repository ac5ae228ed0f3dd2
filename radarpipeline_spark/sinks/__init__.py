from radarpipeline_spark.sinks.writer import pascal_to_snake, write_feature_csv, write_features

__all__ = ["write_feature_csv", "write_features", "pascal_to_snake"]
