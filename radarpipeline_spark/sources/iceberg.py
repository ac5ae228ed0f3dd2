"""Iceberg table source/sink with a parquet-warehouse fallback.

north_rule targets Iceberg tables of transcripts.  The Iceberg Spark
runtime jar is not bundled in this sandbox (checked /opt/spark/jars),
so this module:

* detects Iceberg availability at runtime (:func:`iceberg_available`);
* when present, exposes the exact session configs + DDL the engine
  uses (:data:`ICEBERG_CONFS`, :func:`create_transcripts_table`) —
  hash-bucketed on ``conv_id`` so entity-local operators read
  co-partitioned files, optionally day-partitioned on ``ts``;
* when absent, falls back to a plain-parquet warehouse with the SAME
  physical layout contract (``bucket=<i>`` directories from the same
  conv_id hash), so plans and tests exercise identical partition
  pruning either way.

The fallback is not a toy: bucket-dir layout + manifest is exactly what
checkpoint.py commits, and the reader prunes buckets via partition
discovery like Iceberg prunes via its manifests.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from radarpipeline_spark.checkpoint import bucket_of

# Session configs for a real Iceberg deployment (spark-submit
# --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver>).
ICEBERG_CONFS = {
    "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.local.type": "hadoop",
    "spark.sql.catalog.local.warehouse": "file:///tmp/iceberg-warehouse",
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
}

TRANSCRIPTS_DDL = """
CREATE TABLE IF NOT EXISTS local.db.transcripts (
  conv_id string,
  turn_idx int,
  role string,
  text string,
  tool string,
  ts timestamp
)
USING iceberg
PARTITIONED BY (bucket({buckets}, conv_id), days(ts))
"""


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def create_transcripts_table(spark: SparkSession, buckets: int = 64) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on classpath; use the parquet warehouse "
            "fallback (write_transcripts/read_transcripts with a path)"
        )
    spark.sql(TRANSCRIPTS_DDL.format(buckets=buckets))


def write_transcripts(
    df: DataFrame,
    target: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write transcripts bucketed by hash(conv_id).

    ``target`` is an Iceberg table name (``local.db.transcripts``) when
    the runtime is present, else a filesystem path for the parquet
    warehouse fallback.
    """
    spark = df.sparkSession
    if iceberg_available(spark) and not os.path.isabs(target):
        df.writeTo(target).using("iceberg").createOrReplace()
        return
    (
        df.withColumn("bucket", bucket_of("conv_id", buckets))
        .repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(target)
    )


def read_transcripts(spark: SparkSession, target: str) -> DataFrame:
    """Read transcripts; bucket column is dropped (physical detail)."""
    if iceberg_available(spark) and not os.path.isabs(target):
        return spark.table(target)
    df = spark.read.parquet(target)
    return df.drop("bucket") if "bucket" in df.columns else df


def read_conversation(spark: SparkSession, target: str, conv_id: str, buckets: int = 64) -> DataFrame:
    """Point lookup demonstrating partition pruning in the fallback:
    the bucket predicate prunes to ONE bucket directory (Iceberg would
    prune via its manifest metadata the same way)."""
    if iceberg_available(spark) and not os.path.isabs(target):
        return spark.table(target).filter(F.col("conv_id") == conv_id)
    df = spark.read.parquet(target)
    b = F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(buckets)).cast("int")
    return df.filter((F.col("bucket") == b) & (F.col("conv_id") == conv_id)).drop(
        "bucket"
    )
