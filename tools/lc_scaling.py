"""Executor-JVM scaling + per-stage shuffle-bytes audit for the
allocation-class operators (promoted from scratch/lc_scaling_probe.py —
VERDICT r6 #6: the probe that caught the line_dedup text-shuffle design
flaw becomes a standard per-round tool with a FIXED op list).

Why this tool exists: ``local[N]`` shares one heap and exchanges
in-memory references, so (a) allocation/string-churn ops flatline
8→32 threads intra-JVM while numeric ops hit ~0.99 on the same shuffles,
and (b) shuffle SERIALIZATION cost is invisible.  Real separate executor
JVMs (``local-cluster``) expose both.  Every intra-JVM efficiency number
in BASELINE.md must be paired with its separate-heap recovery number
from this tool.

Fixed op list (the allocation class + the numeric control):

* ``simhash``      — the 0.99-efficiency numeric control
* ``minhash_mix``  — the engine-default numeric shingle fold
* ``pii_stats`` / ``pii_scrub`` — regex extraction (string-allocation
  class; r6: 0.37-0.43 intra-JVM → ~0.69 across JVMs)
* ``line_dedup``   — the narrow-join design (r6 redesign)

line_dedup design A/B extras (VERDICT r6 #2 — attribute the residual
4×8 slowdown; run with ``--ops line_dedup,line_dedup_meta,...``):

* ``line_dedup_text``     — the RETIRED r6 pre-redesign shape,
  reconstructed here only as the A/B baseline: the line STRING rides
  the line-keyed aggregate + join and the reassembly groupBy collects
  line text, so the corpus crosses line-keyed exchanges twice.
* ``line_dedup_meta``     — the shipped design STOPPED before the
  doc-keyed text join (per-doc kept-positions/counters only).  If this
  scales across JVMs and the full op does not, the residual is the
  text join by elimination.
* ``line_dedup_bucketed`` — the full design over a doc_id-BUCKETED
  source table (written once per corpus size): the text-side exchange
  of the doc join disappears (bucketed scan partitioning feeds the
  join directly), the zero-text-exchange path curation.py promises.

Per (op, layout) the tool reports wall seconds, total shuffle WRITE
bytes, and the top stages by shuffle write (via the UI REST API) — the
byte-level evidence BASELINE.md tables cite.

Usage::

    python tools/lc_scaling.py [--docs 3000000] [--ops a,b,c]
                               [--layouts lc1x8,lc4x8]

Layouts: ``lc1x8`` = local-cluster[1,8,12288], ``lc4x8`` =
local-cluster[4,8,12288], ``l8``/``l32`` = local[8]/local[32].
Prints one JSON line per row plus a BASELINE.md-ready markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from bench import _steal_jiffies  # noqa: E402
from tools.bench_corpus import _ensure_corpus  # noqa: E402

LAYOUTS = {
    "lc1x8": ("local-cluster[1,8,12288]", 8),
    "lc4x8": ("local-cluster[4,8,12288]", 32),
    "l8": ("local[8]", 8),
    "l32": ("local[32]", 32),
}

DEFAULT_OPS = ["simhash", "minhash_mix", "pii_stats", "pii_scrub", "line_dedup"]

# MUST equal the session's spark.sql.shuffle.partitions: with fewer
# buckets than shuffle partitions Spark declines the bucketed output
# partitioning (it would cap join parallelism at the bucket count) and
# EnsureRequirements shuffles BOTH join sides anyway — measured: a
# 64-bucket table under a 256-partition session still shipped the text
# through Exchange hashpartitioning(doc_id, 256).
BUCKETS = 256


def _with_lines(df: DataFrame) -> DataFrame:
    """Corpus text is single-line; break every 3 tokens for line ops."""
    return df.select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), r"(\S+) (\S+) (\S+) ", "$1 $2 $3\n"
        ).alias("text"),
    )


def line_dedup_textshuffle(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """The RETIRED r6 pre-redesign line_dedup, kept only as the
    shuffle-bytes A/B baseline: the line STRING is the aggregate and
    join key (corpus text crosses two line-keyed exchanges) and the
    reassembly groupBy collects line text per doc (a third text-bearing
    exchange).  Output semantics match operators/curation.py:line_dedup
    (same first-occurrence rule) — do not use outside this tool."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line"),
    )
    cand = lines.filter(F.col("line") != "")
    first = cand.groupBy("line").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first")
    )
    joined = cand.join(first, "line")
    kept = joined.filter(
        (F.col("__first")[id_col] == F.col(id_col))
        & (F.col("__first")["pos"] == F.col("pos"))
    )
    surv = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("__new_text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = lines.filter(F.col("line") != "").groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines")
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(surv, id_col, "left")
        .select(
            id_col,
            F.coalesce("__new_text", F.lit("")).alias("text"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def line_dedup_positions_only(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """The shipped narrow-join design STOPPED before the doc-keyed text
    join: per-doc kept positions + counters, no text rebuild.  The
    causal probe for the 4×8 residual — everything downstream of the
    scan is (doc, pos, hash) rows."""
    import re as _re

    sep_pat = _re.escape(sep)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_pat, -1)).alias(
            "pos", "line"
        ),
    )
    from radarpipeline_spark.operators.dedup import h60

    cand = F.col("line") != ""
    occ = lines.select(
        id_col,
        "pos",
        cand.alias("__cand"),
        F.when(cand, h60(F.col("line")))
        .otherwise(
            F.xxhash64(F.col(id_col), F.col("pos")).bitwiseOR(
                F.lit(-(2 ** 63))
            )
        )
        .alias("__lh"),
    )
    first = (
        occ.filter(F.col("__cand"))
        .groupBy("__lh")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"))
    )
    joined = occ.join(first, "__lh", "left")
    kept = (
        F.col("__cand")
        & (F.col("__first")[id_col] == F.col(id_col))
        & (F.col("__first")["pos"] == F.col("pos"))
    )
    return joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.when(kept, F.col("pos")))).alias(
            "keep_positions"
        ),
        F.sum(F.col("__cand").cast("long")).alias("n_lines"),
        F.sum(kept.cast("long")).alias("n_kept"),
    )


def build(op: str, spark: SparkSession, df: DataFrame) -> DataFrame:
    if op == "simhash":
        from radarpipeline_spark.operators.dedup import simhash

        return simhash(df)
    if op == "minhash_mix":
        from radarpipeline_spark.operators.dedup import minhash_signatures

        return minhash_signatures(df, n_hashes=16)
    if op == "pii_stats":
        from radarpipeline_spark.operators.pii import pii_stats

        return pii_stats(df)
    if op == "pii_scrub":
        from radarpipeline_spark.operators.pii import pii_scrub

        return pii_scrub(df)
    if op == "line_dedup":
        from radarpipeline_spark.operators.curation import line_dedup

        return line_dedup(_with_lines(df))
    if op == "line_dedup_text":
        return line_dedup_textshuffle(_with_lines(df))
    if op == "line_dedup_meta":
        return line_dedup_positions_only(_with_lines(df))
    if op in ("dedup_incr_bcast", "dedup_incr_shuffle", "incr_index_build"):
        from radarpipeline_spark.operators.incremental import (
            band_signature_index,
            incremental_dedup,
        )

        if op == "incr_index_build":
            # the once-per-snapshot cost, measured separately: build
            # the signature index over the full 3M corpus
            return band_signature_index(df, n_hashes=16, bands=4)
        # 3M-vs-100k cross-snapshot A/B (VERDICT r6 #5): index = the 3M
        # corpus's PERSISTED signature index (the production shape — a
        # snapshot index is built once and read back as a table; an
        # inline rebuild would also double-execute the whole minhash
        # subtree under AQE's exchange-reuse miss, measured 910 s at
        # 1×8 vs ~tens of seconds against the persisted index), delta
        # = the 100k corpus with shifted ids — the two generators are
        # id-deterministic, so delta texts 0..100k reproduce index
        # texts byte-identically (a re-crawl: the exact leg really
        # fires) and the planted near-dup clusters exercise the band
        # leg.  The arms differ only in the delta-side join strategy.
        delta = (
            spark.read.parquet("/tmp/bench_corpus_100000.parquet")
            .select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                "text",
            )
        )
        idx = spark.read.parquet(INCR_INDEX_PATH)
        return incremental_dedup(
            delta,
            idx,
            n_hashes=16,
            bands=4,
            broadcast_new=op.endswith("bcast"),
        )
    if op == "line_dedup_bucketed":
        from radarpipeline_spark.operators.curation import line_dedup

        # read the doc_id-bucketed twin of the corpus (files written by
        # _ensure_bucketed); the text side of the doc join then needs
        # no exchange.  The in-memory catalog does not persist across
        # processes, so re-register the EXTERNAL bucketed table over
        # the existing files (bucket metadata lives in the catalog
        # entry, not the parquet files).  Broadcast is disabled so the
        # join physically exercises the bucketed-SMJ path (at 100 TB
        # per_doc is never broadcastable anyway).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.sql(
            "CREATE TABLE IF NOT EXISTS lc_corpus_bucketed "
            "(doc_id BIGINT, text STRING) USING parquet "
            f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO {BUCKETS} "
            "BUCKETS LOCATION '/tmp/lc_warehouse/lc_corpus_bucketed'"
        )
        return line_dedup(_with_lines(spark.table("lc_corpus_bucketed")))
    raise SystemExit(f"unknown op {op}")


def _session(master: str) -> SparkSession:
    from radarpipeline_spark import get_spark

    return get_spark(
        app_name="lc-scaling",
        master=master,
        shuffle_partitions=256,
        extra_conf={
            "spark.ui.enabled": "true",  # REST API = stage metrics
            "spark.ui.port": "4047",
            "spark.executor.memory": "12g",
            "spark.driver.memory": "8g",
            "spark.local.dir": "/dev/shm/spark-bench",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.sql.warehouse.dir": "/tmp/lc_warehouse",
        },
    )


INCR_INDEX_PATH = "/tmp/lc_incr_index.parquet"


def _ensure_incr_index(corpus_path: str) -> None:
    """Once per corpus: persist the cross-snapshot signature index
    (the thing a production pipeline maintains between crawls)."""
    if os.path.exists(os.path.join(INCR_INDEX_PATH, "_SUCCESS")):
        return
    from radarpipeline_spark.operators.incremental import (
        band_signature_index,
    )

    s = _session("local[32]")
    s.sparkContext.setLogLevel("ERROR")
    band_signature_index(
        s.read.parquet(corpus_path), n_hashes=16, bands=4
    ).write.mode("overwrite").parquet(INCR_INDEX_PATH)
    s.stop()


def _ensure_bucketed(corpus_path: str) -> None:
    """One-time: the corpus saved as a doc_id-bucketed table (the
    zero-text-exchange source layout for line_dedup_bucketed)."""
    marker = os.path.join("/tmp/lc_warehouse", "lc_corpus_bucketed")
    if os.path.exists(marker):
        return
    s = _session("local[32]")
    s.sparkContext.setLogLevel("ERROR")
    (
        # pre-repartition on the bucket key with partitions == buckets:
        # repartition and bucketBy share the Murmur3 hash, so each task
        # holds exactly one bucket's rows -> one file per bucket
        # (unrepartitioned, every write task spills a file per bucket:
        # 5k+ files at 64 buckets)
        s.read.parquet(corpus_path)
        .repartition(BUCKETS, "doc_id")
        .write.bucketBy(BUCKETS, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("lc_corpus_bucketed")
    )
    s.stop()


def stage_metrics(spark: SparkSession) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages"
    ) as r:
        data = json.load(r)
    return [
        {
            "stage": st["stageId"],
            "name": st["name"].split("\n")[0][:40],
            "swMB": round(st["shuffleWriteBytes"] / 1e6, 1),
            "srMB": round(st["shuffleReadBytes"] / 1e6, 1),
            # executor-core-seconds actually burned in the stage — the
            # number that localizes WHERE a layout's wall time went
            "cpuSec": round(st.get("executorRunTime", 0) / 1e3, 1),
        }
        for st in data
        if st["status"] in ("COMPLETE", "ACTIVE")
    ]


def run_once(op: str, layout: str, corpus_path: str) -> dict:
    master, _cores = LAYOUTS[layout]
    s = _session(master)
    s.sparkContext.setLogLevel("ERROR")
    df = s.read.parquet(corpus_path)
    df.count()  # warm the page cache + executor registration
    s0, j0 = _steal_jiffies()
    t0 = time.perf_counter()
    build(op, s, df).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    s1, j1 = _steal_jiffies()
    steal_pct = round(100.0 * (s1 - s0) / max(1, j1 - j0), 2)
    stages = stage_metrics(s)
    # layout sanity: record how many executor JVMs actually served the
    # job (the bug class this guards: a stale LocalSparkCluster worker
    # inflating a 1-worker layout)
    ui = s.sparkContext.uiWebUrl
    appid = s.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{appid}/executors"
    ) as r:
        n_exec = sum(1 for e in json.load(r) if e["id"] != "driver")
    s.stop()
    sw = sum(x["swMB"] for x in stages)
    top = sorted(stages, key=lambda x: -x["swMB"])[:4]
    return {
        "op": op,
        "layout": layout,
        "n_executors": n_exec,
        "sec": round(dt, 1),
        "shuffle_write_MB": round(sw, 1),
        "top_stages": top,
        "steal_pct": steal_pct,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3_000_000)
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument("--layouts", default="lc1x8,lc4x8")
    ap.add_argument(
        "--once",
        nargs=2,
        metavar=("OP", "LAYOUT"),
        help="internal: run one (op, layout) in THIS process and print "
        "one JSON line",
    )
    args = ap.parse_args()
    corpus = f"/tmp/bench_corpus_{args.docs}.parquet"
    if args.once:
        op, layout = args.once
        print(json.dumps(run_once(op, layout, corpus)), flush=True)
        return
    _ensure_corpus(corpus, args.docs)
    ops_ = args.ops.split(",")
    layouts = args.layouts.split(",")
    if "line_dedup_bucketed" in ops_:
        _ensure_bucketed(corpus)
    if {"dedup_incr_bcast", "dedup_incr_shuffle"} & set(ops_):
        _ensure_incr_index(corpus)
    os.makedirs("/dev/shm/spark-bench", exist_ok=True)
    rows = []
    # ONE SUBPROCESS PER MEASUREMENT: sequential local-cluster sessions
    # inside one python process are unreliable in Spark 4 (the driver
    # JVM is reused; stale LocalSparkCluster workers race the next
    # session's Master — observed a lc1x8 request surface 4 workers,
    # and 'Shutdown hooks cannot be modified during shutdown' executor
    # launch failures).  A fresh process per row also equalizes JIT
    # state across rows.  Layouts interleave per op (shared-host rule:
    # co-tenant drift hits both layouts of an op equally).
    import subprocess

    for op in ops_:
        for layout in layouts:
            out = subprocess.run(
                [
                    sys.executable,
                    "-u",
                    os.path.abspath(__file__),
                    "--docs",
                    str(args.docs),
                    "--once",
                    op,
                    layout,
                ],
                capture_output=True,
                text=True,
            )
            line = next(
                (
                    ln
                    for ln in out.stdout.splitlines()
                    if ln.startswith("{")
                ),
                None,
            )
            if line is None:
                print(f"FAILED {op}@{layout}:\n{out.stderr[-2000:]}",
                      flush=True)
                continue
            r = json.loads(line)
            rows.append(r)
            print(line, flush=True)
    # markdown table for BASELINE.md
    print(f"\n| op | docs | " + " | ".join(
        f"{la} sec / shufMB" for la in layouts) + " | eff |")
    print("|---|---|" + "|".join("---" for _ in layouts) + "|---|")
    for op in ops_:
        rs = {r["layout"]: r for r in rows if r["op"] == op}
        cells = " | ".join(
            f"{rs[la]['sec']} / {rs[la]['shuffle_write_MB']}"
            for la in layouts if la in rs
        )
        eff = ""
        if "lc1x8" in rs and "lc4x8" in rs:
            eff = f"{rs['lc1x8']['sec'] / rs['lc4x8']['sec'] / 4:.2f}"
        print(f"| {op} | {args.docs} | {cells} | {eff} |")


if __name__ == "__main__":
    main()
