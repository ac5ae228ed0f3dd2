"""Dump ``explain("formatted")`` for entry queries to plans/<tag>/.

Usage::

    python tools/dump_plans.py <tag> [sf_dir] [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` where suffix is the last
``_``-separated token of the tag (e.g. tag ``r08_before`` ->
``<query>_before.txt``).  Streaming queries (memory-sink results) are
skipped — their per-batch plans are audited by tools/plan_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from radarpipeline_spark import get_spark

STREAMING = {"sessionize_stream", "rolling_stream", "curation_stream"}


def main() -> int:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    suffix = tag.rsplit("_", 1)[-1]
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag.split("_")[0])
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxPlanStringLength", str(16 * 1024 * 1024))
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        if name in STREAMING:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
