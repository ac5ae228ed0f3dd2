"""line_dedup scale-shape proofs (VERDICT r6 #2):

1. the A/B baseline in tools/lc_scaling.py (the retired text-shuffling
   design) is semantically identical to the shipped narrow-join design
   — so its shuffle-byte numbers are a valid comparison;
2. over a doc_id-BUCKETED source the shipped design plans ZERO
   text-bearing exchanges (the promise in curation.py's docstring):
   every ShuffleExchange in the physical plan moves only narrow
   (doc, pos, hash / counters) rows, never the document or line text.
"""

import pyspark.sql.functions as F
import pytest

from radarpipeline_spark.operators.curation import line_dedup
from tools.lc_scaling import line_dedup_textshuffle

TEXTS = [
    (0, "alpha beta\ncommon line\ngamma"),
    (1, "common line\ndelta\n\nepsilon"),      # dup of doc0's line + empty
    (2, "zeta\nzeta\ncommon line"),            # intra-doc repeat
    (3, ""),                                   # empty doc
    (4, "common line"),                        # fully duplicated doc
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_textshuffle_baseline_parity(spark, docs):
    a = sorted(map(tuple, line_dedup(docs).collect()))
    b = sorted(map(tuple, line_dedup_textshuffle(docs).collect()))
    assert a == b


def _shuffle_outputs(plan_node, acc):
    name = plan_node.getClass().getSimpleName()
    if name.startswith("ShuffleExchange"):
        out = plan_node.output()
        acc.append([out.apply(i).name() for i in range(out.size())])
    ch = plan_node.children()
    for i in range(ch.size()):
        _shuffle_outputs(ch.apply(i), acc)


TEXT_COLS = {"text", "__txt", "__arr", "line"}


def _text_exchanges(df):
    acc = []
    _shuffle_outputs(df._jdf.queryExecution().executedPlan(), acc)
    return [cols for cols in acc if TEXT_COLS & set(cols)], acc


def test_bucketed_source_zero_text_exchanges(spark, docs):
    """Bucketed-by-doc_id source: the text side of the reassembly join
    reads pre-partitioned, so NO exchange anywhere carries text; the
    unbucketed plan carries text through exactly one (doc-keyed)
    exchange.  AQE + broadcast are disabled so the planned exchanges
    are the real 100TB shapes (per_doc is never broadcastable there)."""
    spark.sql("DROP TABLE IF EXISTS t_line_dedup_bucketed")
    docs.write.bucketBy(4, "doc_id").sortBy("doc_id").mode(
        "overwrite"
    ).format("parquet").saveAsTable("t_line_dedup_bucketed")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = spark.table("t_line_dedup_bucketed")
        out_b = line_dedup(bucketed)
        text_ex_b, all_ex_b = _text_exchanges(out_b)
        assert text_ex_b == [], (
            f"bucketed source still ships text through {text_ex_b}"
        )
        assert len(all_ex_b) >= 2  # the narrow line-hash exchanges remain

        out_u = line_dedup(docs)
        text_ex_u, all_ex_u = _text_exchanges(out_u)
        assert len(text_ex_u) == 1  # exactly the doc-keyed text join side
        assert len(all_ex_u) == len(all_ex_b) + 1

        # value parity: the bucketed plan computes the same answer
        assert sorted(map(tuple, out_b.collect())) == sorted(
            map(tuple, out_u.collect())
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP TABLE IF EXISTS t_line_dedup_bucketed")


def test_bucket_count_must_match_shuffle_partitions(spark, docs):
    """The r7 gotcha, pinned: a table bucketed into FEWER buckets than
    spark.sql.shuffle.partitions does NOT engage — Spark declines the
    bucketed output partitioning (it would cap join parallelism at the
    bucket count) and EnsureRequirements shuffles the text side anyway.
    The 3M-doc probe measured a 64-bucket table under a 256-partition
    session shipping the full 1.46 GB text exchange as if unbucketed."""
    spark.sql("DROP TABLE IF EXISTS t_line_dedup_bucketed_small")
    # session shuffle partitions is 4 (conftest); bucket into 2
    docs.write.bucketBy(2, "doc_id").sortBy("doc_id").mode(
        "overwrite"
    ).format("parquet").saveAsTable("t_line_dedup_bucketed_small")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = line_dedup(spark.table("t_line_dedup_bucketed_small"))
        text_ex, _ = _text_exchanges(out)
        assert len(text_ex) == 1  # bucketing ignored -> text shuffles
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP TABLE IF EXISTS t_line_dedup_bucketed_small")
