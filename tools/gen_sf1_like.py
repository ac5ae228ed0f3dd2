"""Generate a 10x timing replica of sf0.1 (sf1.0-like) for bench_extra.

TIMING ONLY — never graded, never read by bench.py (which is frozen on
$SPARK_GRAFT_SF_DIR).  The driver's sf1.0 has 1M turns / 50k docs /
20k embeddings — exactly 10x sf0.1 — so a 10-copy union with shifted
keys reproduces the driver measurement scale:

* events: event_id/user_id shifted per copy -> 10x conversations of
  the same per-conversation shape (the transcript queries group by
  conversation, so group count is what matters).
* documents: doc_id shifted, text prefixed with a per-copy token so
  cross-copy rows are not exact/near duplicates (keeps dedup/LSH
  candidate structure per-copy instead of inflating it 10x).
* embeddings: vec_id shifted, first coordinate nudged by a tiny
  per-copy epsilon (avoids 10x exact-duplicate vectors).
* TPC-H-ish tables: keys shifted per copy; date/price columns kept.

Usage: python scratch/gen_sf1_like.py [out_dir]   (default /tmp/sf1replica)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from radarpipeline_spark import get_spark

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1replica"
COPIES = 10

SHIFTS = {
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 1_000_000,
    },
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
}
SMALL = ["region", "nation"]  # dimension tables: copy as-is


def main() -> None:
    spark = get_spark(
        app_name="gen-sf1-like",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for t in SMALL:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")
        print(f"  {t}: copied")
    for t, shifts in SHIFTS.items():
        src = f"{SRC}/{t}.parquet"
        if not os.path.exists(src):
            continue
        base = spark.read.parquet(src)
        parts = []
        for i in range(COPIES):
            df = base
            for col, step in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            if t == "documents" and i > 0:
                df = df.withColumn(
                    "text", F.concat(F.lit(f"rep{i} "), F.col("text"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(5 + len(str(i))))
            if t == "embeddings" and i > 0:
                eps = float(i) * 1e-4
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, idx: F.when(
                            idx == 0, x + F.lit(eps).cast("float")
                        ).otherwise(x),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.coalesce(16).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"  {t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
