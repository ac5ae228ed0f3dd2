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


def test_frame_sampling_and_resize_plan(spark):
    """Frame fan-out happens INSIDE the kernel (payload crosses Arrow
    once, one output row per sampled frame) and resize planning is pure
    Catalyst (aspect-preserving, never upscales)."""
    import pyspark.sql.functions as SF

    from radarpipeline_spark.operators.multimodal import (
        resize_plan,
        sample_frame_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=64, seed=7)
    vids = media.filter(SF.col("kind") == "video")
    nv = vids.count()
    out = sample_frame_features(vids, n_frames=5)
    assert out.count() == nv * 5
    assert out.select("media_id").distinct().count() == nv
    # distinct frames of one video get distinct features (index mixed in)
    one = out.filter(SF.col("media_id") == out.first()["media_id"])
    assert one.select("features").distinct().count() == 5
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert "Generate" not in plan  # no payload-duplicating explode

    rp = resize_plan(media, max_side=256)
    bad_up = rp.filter(SF.col("resize_scale") > 1.0).count()
    assert bad_up == 0
    r = rp.filter(
        (SF.col("meta.width") > 256) | (SF.col("meta.height") > 256)
    )
    assert r.filter(
        (SF.col("target_width") > 256) | (SF.col("target_height") > 256)
    ).count() == 0
    # aspect preserved within floor rounding (engine floors on the
    # UNROUNDED scale; resize_scale is the display-rounded value)
    row = r.first()
    import math

    scale = 256.0 / max(row["meta"]["width"], row["meta"]["height"])
    assert row["target_width"] == math.floor(row["meta"]["width"] * scale)
    assert row["target_height"] == math.floor(row["meta"]["height"] * scale)
