import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radarpipeline_spark import get_spark  # noqa: E402
from radarpipeline_spark.sources import synthesize_transcripts  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.sql.warehouse.dir": "/tmp/tests-wh"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny(spark):
    """Synthetic transcripts: 60 convs, one skewed (500 turns), seeded."""
    df = synthesize_transcripts(spark, n_convs=60, seed=7, skew_convs=1, skew_len=500)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def tiny_pdf(tiny):
    return tiny.toPandas()


@pytest.fixture(scope="session")
def aux(spark, tiny):
    """Sparse aux signal derived deterministically from the transcripts:
    every 7th turn emits a signal 1s later; some convs have none."""
    import pyspark.sql.functions as F

    a = (
        tiny.filter((F.col("turn_idx") % 7 == 0) & (F.crc32("conv_id") % 5 != 0))
        .select(
            "conv_id",
            (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
            (F.crc32(F.concat("conv_id", F.col("turn_idx").cast("string"))) % 1000
             / 10.0).alias("aux_value"),
        )
    )
    a.cache().count()
    return a


@pytest.fixture(scope="session")
def aux_pdf(aux):
    return aux.toPandas()
