"""Corpus-scale benchmark for the LLM-data-pipeline operators.

VERDICT r3 #2: every dedup/similarity/curation number so far came from
<= 4k documents; this harness proves the operators at MILLIONS of
documents, with the three adversarial properties real corpora have:

* **heavy-tailed doc lengths** — n_tokens ~ 8 + 600 * u^6 (u uniform
  from a hash): median ~10 tokens, p99 ~430, max 608;
* **a hot-shingle stratum** — every 7th doc opens with the same
  boilerplate phrase, so its shingles reach document frequency n/7
  (the stop-shingle skew the df-cap defense exists for);
* **planted duplicate clusters** — in every 20-id block, ids 0..2 are
  exact copies and id 3 a near-dup (one appended token), so exact
  dedup, LSH, jaccard and clustering all have real work and a known
  answer shape.

Everything is a pure function of doc_id via xxhash64 — fully
distributed Catalyst generation (no driver data, no Python), identical
at any parallelism.

Methodology (BASELINE.md shared-host rules): fresh session per (level,
rep), lo/hi reps interleaved, min-of-reps, clearCache before every rep
(no internal CacheManager persists remain in the dedup path — r4 —
but the guard stays), plan construction INSIDE the timed region
(dedup_clusters legitimately runs label-propagation jobs at build
time), tmpfs spark.local.dir, /proc/stat steal reported.

Usage:
  python tools/bench_corpus.py [--docs 3000000] [--reps 2]
                               [--ops minhash,lsh_pairs,...]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bench import _steal_jiffies, log  # noqa: E402


def _session(cores: int, shuffle_partitions: int | None = None):
    """Corpus-bench session: bigger heap than the query bench (the
    ngram checkpoint holds a 280M-row exploded frame in storage blocks
    — 24g GC-thrashed at 32 threads) and a smaller
    files.maxPartitionBytes: the 3M-doc corpus bin-packs into ~19 scan
    partitions at the 128MB default, capping the scan stage at 19
    tasks and the measured 8->32 efficiency at ~0.45 for scan-bound
    ops — the classic 'size input splits to the cluster' knob.

    256 shuffle partitions at EVERY level: the ngram barrier
    checkpoints a 280M-row frame, and a checkpoint block is one
    shuffle partition — at 64 partitions that is >100MB of
    serialization buffer per block x 32 concurrent tasks, which OOMed
    a 48g heap; at 256 partitions blocks are ~27MB and storage stays
    healthy.  Same rule at cluster scale: size shuffle partitions so
    storage/spill blocks stay tens of MB."""
    from radarpipeline_spark import get_spark

    return get_spark(
        app_name=f"bench-corpus-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions or 256,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/spark-bench",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )

VOCAB = 50_000
BOILER = "terms of service apply to this document and all derived works"


def corpus_df(spark, n_docs: int):
    """Deterministic synthetic corpus (see module docstring)."""
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    slot = F.pmod(F.col("doc_id"), F.lit(20))
    base = F.when(slot < 4, F.col("doc_id") - slot).otherwise(F.col("doc_id"))
    u = F.pmod(F.xxhash64(base), F.lit(10_000)).cast("double") / F.lit(10_000.0)
    n_tok = (F.lit(8) + F.pow(u, F.lit(6.0)) * F.lit(600.0)).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(base, i), F.lit(VOCAB))),
    )
    body = F.array_join(toks, " ")
    text = F.when(slot == 3, F.concat(body, F.lit(" neardupmarker"))).otherwise(body)
    text = F.when(
        F.pmod(F.col("doc_id"), F.lit(7)) == 0,
        F.concat(F.lit(BOILER + " "), text),
    ).otherwise(text)
    return ids.select("doc_id", text.alias("text"))


def _ensure_corpus(path: str, n_docs: int) -> None:
    if os.path.exists(path):
        return
    s = _session(32)
    s.sparkContext.setLogLevel("ERROR")
    corpus_df(s, n_docs).repartition(256).write.mode("overwrite").parquet(path)
    s.stop()


def ops(max_doc_freq: int):
    from radarpipeline_spark.operators.curation import curate_documents
    from radarpipeline_spark.operators.decontam import ngram_decontaminate
    from radarpipeline_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash,
    )
    from radarpipeline_spark.operators.curation import line_dedup
    from radarpipeline_spark.operators.pii import pii_scrub, pii_stats
    from radarpipeline_spark.operators.ranking import bm25_search, tfidf_top_terms
    from radarpipeline_spark.operators.text import repetition_stats

    return {
        "exact_dedup": lambda df: exact_dedup(df),
        "minhash": lambda df: minhash_signatures(df, n_hashes=16),
        # capped: the boilerplate stratum otherwise collapses short docs
        # into giant signature buckets whose self-join is quadratic
        # (uncapped at 100k docs: 2.77M candidate pairs, ~25k real;
        # uncapped at 3M would emit billions) — see lsh_candidate_pairs
        "lsh_pairs": lambda df: lsh_candidate_pairs(
            df, n_hashes=16, bands=4, max_bucket_size=64
        ),
        "ngram_jaccard": lambda df: ngram_jaccard_pairs(
            df, threshold=0.8, max_doc_freq=max_doc_freq
        ),
        "simhash": lambda df: simhash(df),
        "dedup_clusters": lambda df: dedup_clusters(
            df, threshold=0.8, max_doc_freq=max_doc_freq
        ),
        "curation": lambda df: curate_documents(
            df, min_tokens=6, min_quality=0.0, dedup=True, sample_pct=60
        ),
        # ~240M postings; the 50k-term (term, df) side AQE-broadcasts.
        # r6 A/B (VERDICT r5 #2/#3): "tfidf" = the default postings-
        # derived df (dup subtree under AQE — measured FASTEST, 89.7s
        # min-of-2@32) vs "tfidf_tokens" = df from a second tokenizing
        # scan pass (129.4s); the AQE-off ReuseExchange variant
        # (121.6s) is a one-off in BASELINE.md r6
        "tfidf": lambda df: tfidf_top_terms(df, top_n=3, max_df_ratio=0.5),
        "tfidf_tokens": lambda df: tfidf_top_terms(
            df, top_n=3, max_df_ratio=0.5, df_leg="tokens"
        ),
        # boilerplate term ('terms', df ~ n/7) + two organic rare terms
        "bm25": lambda df: bm25_search(
            df, ["terms", "w11", "w777"], top_k=100
        ),
        "repetition": lambda df: repetition_stats(df),
        # every 1000th doc stands in for the eval set (3k bench docs at
        # 3M => ~300k distinct 8-gram hashes broadcast)
        "decontaminate": lambda df: ngram_decontaminate(
            df, df.filter(F.pmod(F.col("doc_id"), F.lit(1000)) == 0), n=8
        ),
        # VERDICT r5 #8: realistic benchmark size — a 100k-doc eval set
        # (every 30th doc at 3M => ~10M distinct 8-gram hashes, ~80MB
        # exploded long column) probes the broadcast ceiling; _shuffle
        # is the no-hint fallback on the IDENTICAL input for the A/B
        "decontaminate_100k": lambda df: ngram_decontaminate(
            df, df.filter(F.pmod(F.col("doc_id"), F.lit(30)) == 0), n=8
        ),
        "decontaminate_100k_shuffle": lambda df: ngram_decontaminate(
            df,
            df.filter(F.pmod(F.col("doc_id"), F.lit(30)) == 0),
            n=8,
            broadcast_bench=False,
        ),
        # VERDICT r5 #5: the PII pair rides the zero-exchange regex
        # scan class in theory — measure it
        "pii_stats": lambda df: pii_stats(df),
        "pii_scrub": lambda df: pii_scrub(df),
        # VERDICT r5 #7: C4-style line dedup.  The synthetic corpus is
        # single-line, so re-line it deterministically into 3-token
        # lines (regex consumes the trailing space, non-overlapping
        # left-to-right): ~80M lines at 3M docs over a 50k^3 line
        # space — a realistic mix of unique lines and hot boilerplate
        # (every 7th doc's leading lines collide corpus-wide)
        "line_dedup": lambda df: line_dedup(
            df.select(
                "doc_id",
                F.regexp_replace(
                    F.col("text"),
                    r"(\S+) (\S+) (\S+) ",
                    "$1 $2 $3\n",
                ).alias("text"),
            )
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ops", type=str, default="")
    ap.add_argument("--levels", type=str, default="8,32")
    args = ap.parse_args()

    path = f"/tmp/bench_corpus_{args.docs}.parquet"
    _ensure_corpus(path, args.docs)
    # df-cap: drop shingles appearing in >0.01% of docs (the boilerplate
    # stratum sits at ~14%, so it is decisively capped; organic shingles
    # in a 50k-vocab trigram space stay far below the cap)
    max_doc_freq = max(args.docs // 10_000, 50)
    selected = ops(max_doc_freq)
    if args.ops:
        keep = args.ops.split(",")
        selected = {k: v for k, v in selected.items() if k in keep}
    levels = [int(x) for x in args.levels.split(",")]

    results: dict = {
        "n_docs": args.docs,
        "max_doc_freq": max_doc_freq,
        "levels": levels,
    }
    best: dict = {(name, lv): float("inf") for name in selected for lv in levels}
    s0, t0 = _steal_jiffies()
    for rep in range(args.reps):
        for lv in levels:  # interleave levels within a rep round
            s = _session(lv, shuffle_partitions=max(64, lv * 2))
            s.sparkContext.setLogLevel("ERROR")
            s.read.parquet(path).count()  # untimed session warm-up
            for name, build in selected.items():
                s.catalog.clearCache()
                t_0 = time.perf_counter()
                df = build(s.read.parquet(path))
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t_0
                best[(name, lv)] = min(best[(name, lv)], dt)
                log(f"  rep{rep} local[{lv}] {name}: {dt:.1f}s")
            s.stop()
    s1, t1 = _steal_jiffies()

    per_op = {}
    for name in selected:
        row = {f"sec_{lv}": round(best[(name, lv)], 2) for lv in levels}
        if len(levels) == 2 and best[(name, levels[1])] < float("inf"):
            ratio = best[(name, levels[0])] / best[(name, levels[1])]
            row["speedup"] = round(ratio, 2)
            row["efficiency"] = round(ratio / (levels[1] / levels[0]), 3)
        per_op[name] = row
    results["ops"] = per_op
    results["host_steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
