"""Parquet table loading.

The reference walks ``<root>/<user>/<variable>/*.csv.gz`` and builds one
DataFrame per (user, variable) pair (reference:
radarpipeline/io/reader.py:113-158) — N² tiny frames that are then
union-folded back together.  Here a dataset is ONE table scan: Spark
reads the whole directory, Catalyst prunes columns and pushes filters
into the scan, and entity-level partitioning is a property of the data
layout (hash/bucket on the entity key), not of the object graph.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table from a scale-factor directory."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every available table as a temp view (SQL entry point)."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
