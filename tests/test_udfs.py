"""Vectorized scalar UDFs agree with the Catalyst-native expressions."""

import pyspark.sql.functions as F

from radarpipeline_spark.operators.udfs import (
    alpha_ratio_udf,
    bpe_ish_token_count_udf,
    token_count_udf,
)


def test_udf_paths_match_catalyst(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    both = docs.select(
        "doc_id",
        token_count_udf("text").alias("udf_tokens"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("cat_tokens"),
        alpha_ratio_udf("text").alias("udf_alpha"),
        F.round(
            F.try_divide(
                F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", "")),
                F.length("text"),
            ),
            9,
        ).alias("cat_alpha"),
    )
    bad = both.filter(
        (F.col("udf_tokens") != F.col("cat_tokens"))
        | (F.abs(F.col("udf_alpha") - F.col("cat_alpha")) > 1e-9)
    )
    assert bad.count() == 0
    n = docs.select(bpe_ish_token_count_udf("text").alias("n")).agg(F.sum("n")).collect()[0][0]
    assert n > 0
