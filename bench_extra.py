"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Per-query noop-sink wall times, min-of-N, at any SF dir — the same
methodology as bench.py's sweep but selectable queries/reps so a
single cell can be isolated and re-measured quickly.

Usage::

    python bench_extra.py [--sf DIR] [--reps N] [query ...]

Prints one JSON line {"queries": {...}, "sf": ..., "steal_pct": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _steal_jiffies():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from radarpipeline_spark import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{args.cores}]",
        shuffle_partitions=max(args.cores * 2, 8),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            "spark.local.dir": "/dev/shm/spark-bench",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    m.load_table(spark, args.sf, "events").count()  # session warm-up

    only = set(args.queries)
    out = {}
    s0, t0 = _steal_jiffies()
    for name, fn in m.queries().items():
        if only and name not in only:
            continue
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t1 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t1)
        out[name] = round(best, 3)
        print(f"  {name}: {best:.2f}s", file=sys.stderr, flush=True)
    s1, t1j = _steal_jiffies()
    steal = round(100.0 * (s1 - s0) / max(t1j - t0, 1), 2)
    spark.stop()
    print(json.dumps({
        "queries": out,
        "total": round(sum(out.values()), 3),
        "sf": args.sf.rstrip("/").split("sf")[-1],
        "steal_pct": steal,
    }), flush=True)


if __name__ == "__main__":
    main()
