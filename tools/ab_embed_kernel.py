"""A/B the grouped-Arrow pair kernel vs the JVM-expression join:
exact output equality at replica scale + adversarial edges + timing."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from radarpipeline_spark import get_spark
from radarpipeline_spark.operators.similarity import embedding_near_dup_pairs

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1replica"


def rows(df):
    return sorted(
        (r.id_a, r.id_b, None if r.cosine is None else repr(r.cosine))
        for r in df.collect()
    )


def main():
    spark = get_spark(
        app_name="ab-embed",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "24g",
                    "spark.local.dir": "/dev/shm/spark-bench"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    embs = m.load_table(spark, SF, "embeddings").repartition(8)
    embs.count()

    # --- replica-scale equality + timing
    kern = embedding_near_dup_pairs(embs, threshold=0.42, n_planes=4, dim=64)
    jvm = embedding_near_dup_pairs(embs, threshold=0.42, n_planes=4, dim=64,
                                   pair_kernel=False)
    for tag, df in (("kernel", kern), ("jvm", jvm)):
        best = 1e9
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {best:.2f}s", flush=True)
    a, b = rows(kern), rows(jvm)
    print(f"replica equality: {a == b} ({len(a)} vs {len(b)})", flush=True)
    if a != b:
        d = set(a) ^ set(b)
        print("  diffs:", list(d)[:6])

    # --- adversarial edges: nulls, dup ids, zero vectors, mixed dims,
    # null elements, tiny corpus
    edge = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.001, 0.0, 0.0]),
            (2, [1.0, 0.002, 0.0, 0.0]),      # duplicate id
            (3, [0.0, 0.0, 0.0, 0.0]),        # zero norm -> NaN cosine
            (4, [0.0, 0.0, 0.0, 0.0]),        # NaN pair with 3
            (5, None),                        # null vector
            (6, [1.0, None, 0.0, 0.0]),       # null element
            (7, [1.0, 0.0]),                  # short vector
            (8, [1.0, 0.0]),                  # pairs with 7 (len 2)
            (None, [1.0, 0.0, 0.0, 0.0]),     # null id
            (9, [-1.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    for planes in (2, 3, 4):
        for slices in (1, 2, 8):
            k = embedding_near_dup_pairs(
                edge, threshold=0.42, n_planes=planes, dim=4,
                pair_slices=slices,
            )
            j = embedding_near_dup_pairs(
                edge, threshold=0.42, n_planes=planes, dim=4,
                pair_kernel=False,
            )
            rk, rj = rows(k), rows(j)
            ok = rk == rj
            print(f"edge planes={planes} slices={slices}: {ok} "
                  f"({len(rk)} vs {len(rj)})", flush=True)
            if not ok:
                print("   kernel:", rk)
                print("   jvm   :", rj)
    spark.stop()


if __name__ == "__main__":
    main()
