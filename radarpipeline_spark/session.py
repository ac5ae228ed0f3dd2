"""SparkSession factory with scale-oriented defaults.

The reference hardcodes ``master("local")`` (a single thread) and sets
executor topology configs that are therefore inert
(reference: radarpipeline/io/reader.py:29-35,81).  Here the master is a
parameter (tests/bench pass ``local[N]``; production passes nothing and
lets ``spark-submit`` own it) and the defaults target multi-executor
clusters: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow on (vectorized pandas UDF transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100TB design point: AQE re-plans shuffles at
# runtime, so a generous initial shuffle-partition count is safe (AQE
# coalesces small partitions; skewJoin splits hot ones).
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    # parquet scans: split files at 128MB so 100TB -> ~800k tasks, the
    # sweet spot for 1000-executor clusters; harmless at test scale.
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def get_spark(
    app_name: str = "radarpipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master=None`` defers to spark-submit / env (``SPARK_GRAFT_CPUS``
    selects local[N] in the sandbox).  ``shuffle_partitions=None``
    defaults to the local core count so local runs don't oversubscribe.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
