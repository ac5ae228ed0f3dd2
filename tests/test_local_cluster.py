"""VERDICT r3 #6: run flagship operators under ``local-cluster[2,2,*]``.

``local[N]`` hides whole classes of bugs: broadcast variables never
serialize, closures never leave the JVM, and executor-side Python
workers share the driver process.  ``local-cluster`` launches REAL
executor JVMs (separate processes, real serialization, real broadcast
transfer) — the closest this sandbox gets to a multi-executor cluster.

The run happens in a SUBPROCESS because the pytest session already owns
a SparkContext (one per JVM).  Inside it: compute feature_vector, an
LSH dedup query, the curation pipeline, and the Arrow-cogroup as-of
join under local-cluster, then recompute under plain local[4] in the
same process and require row-for-row repr equality.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "@@REPO@@")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F


def build_all(spark):
    from radarpipeline_spark.operators import feature_vector
    from radarpipeline_spark.operators.asof import asof_join_pandas
    from radarpipeline_spark.operators.curation import curate_documents
    from radarpipeline_spark.operators.dedup import lsh_candidate_pairs
    from radarpipeline_spark.sources import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=40, seed=11)
    aux = t.filter(F.col("turn_idx") % 5 == 0).select(
        "conv_id",
        (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
        (F.crc32(F.concat("conv_id", F.col("turn_idx").cast("string")))
         % 100 / 10.0).alias("aux_value"),
    )
    docs = t.filter(F.col("turn_idx") < 40).select(
        (F.crc32("text").cast("long")).alias("doc_id"),
        F.concat_ws(
            " ", "role", "text",
            F.lit("the quick brown fox jumps over the lazy dog"),
        ).alias("text"),
    )
    return {
        "feature_vector": feature_vector(t).drop("text"),
        "lsh_pairs": lsh_candidate_pairs(docs, n_hashes=8, bands=4),
        "curation": curate_documents(docs, min_tokens=3, dedup=True),
        "asof_pandas": asof_join_pandas(
            t.select("conv_id", "turn_idx", "ts"), aux
        ),
    }


def snapshot(spark):
    return {
        name: sorted(repr(r) for r in df.collect())
        for name, df in build_all(spark).items()
    }


def session(master):
    return (
        SparkSession.builder.master(master)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )


s = session("local-cluster[2,2,1024]")
s.sparkContext.setLogLevel("ERROR")
assert not s.sparkContext.master.startswith("local["), s.sparkContext.master
cluster = snapshot(s)
s.stop()

s = session("local[4]")
s.sparkContext.setLogLevel("ERROR")
local = snapshot(s)
s.stop()

for name in cluster:
    assert cluster[name] == local[name], (
        name, len(cluster[name]), len(local[name]),
    )
    assert len(cluster[name]) > 0, name
print("LOCAL_CLUSTER_PARITY_OK", {k: len(v) for k, v in cluster.items()})
"""


def test_local_cluster_matches_local():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@@REPO@@", repo)],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "LOCAL_CLUSTER_PARITY_OK" in proc.stdout
