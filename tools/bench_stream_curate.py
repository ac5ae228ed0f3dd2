"""Corpus-scale benchmark for the STREAMING curation twin (VERDICT r4
#8): stream_curate_documents is pytest-correct at test scale; this
harness runs it over a ~1M-doc file stream — the same deterministic
corpus as tools/bench_corpus.py, delivered as utime-pinned parquet
slices through maxFilesPerTrigger (the sessionize_stream pattern) —
and records end-to-end throughput plus the stateful exact-dedup
stage's state-store size, next to the batch operator's number on the
identical input.

What to look at:
* docs/s streaming vs batch — the stream pays per-micro-batch
  scheduling + state-store IO; the gap is the streaming tax, not a
  plan defect;
* state rows == distinct surviving contents (one int per content ever
  seen — the minimum any streaming exact-dedup must carry) and state
  bytes/row, the number that decides when a TTL eviction policy is
  needed at 10^12-doc horizons.

Usage:
  python tools/bench_stream_curate.py [--docs 1000000] [--batches 8]
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _steal_jiffies, log  # noqa: E402
from tools.bench_corpus import _ensure_corpus, _session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    corpus_path = f"/tmp/bench_corpus_{args.docs}.parquet"
    _ensure_corpus(corpus_path, args.docs)

    s = _session(args.cores, shuffle_partitions=64)
    s.sparkContext.setLogLevel("ERROR")

    from radarpipeline_spark.operators.curation import curate_documents
    from radarpipeline_spark.streaming.curate_stream import (
        stream_curate_documents,
    )

    kw = dict(min_tokens=6, min_quality=0.0, dedup=True, sample_pct=60)

    # ---- batch reference on the identical input --------------------
    s.catalog.clearCache()
    t0 = time.perf_counter()
    curate_documents(s.read.parquet(corpus_path), **kw).write.format(
        "noop"
    ).mode("overwrite").save()
    batch_sec = time.perf_counter() - t0
    log(f"batch curate: {batch_sec:.1f}s")

    # ---- slice the corpus into batch-sized files, mtime-ordered ----
    root = "/dev/shm/bench_stream_curate"
    shutil.rmtree(root, ignore_errors=True)
    src, ckpt = os.path.join(root, "src"), os.path.join(root, "ckpt")
    schema = s.read.parquet(corpus_path).schema
    (
        s.read.parquet(corpus_path)
        .repartition(args.batches)
        .write.mode("overwrite")
        .parquet(src)
    )
    files = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        os.utime(os.path.join(src, f), (1_000_000_000 + i, 1_000_000_000 + i))

    s0, j0 = _steal_jiffies()
    t0 = time.perf_counter()
    q = (
        stream_curate_documents(
            s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            **kw,
        )
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    stream_sec = time.perf_counter() - t0
    s1, j1 = _steal_jiffies()

    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    state = {}
    for p in progress:
        for op in p.get("stateOperators", []):
            state = {
                "state_rows": op.get("numRowsTotal"),
                "state_bytes": op.get("memoryUsedBytes"),
            }
    out_rows = sum(
        op.get("numRowsUpdated", 0)
        for p in progress
        for op in p.get("stateOperators", [])
    )
    shutil.rmtree(root, ignore_errors=True)
    result = {
        "n_docs": args.docs,
        "cores": args.cores,
        "micro_batches": len(progress),
        "batch_sec": round(batch_sec, 1),
        "stream_sec": round(stream_sec, 1),
        "batch_docs_per_s": int(args.docs / batch_sec),
        "stream_docs_per_s": int(args.docs / stream_sec),
        "streaming_tax": round(stream_sec / batch_sec, 2),
        "state_rows_updated_total": out_rows,
        **state,
        "host_steal_pct": round(100.0 * (s1 - s0) / max(j1 - j0, 1), 2),
    }
    if state.get("state_rows"):
        result["state_bytes_per_row"] = round(
            state["state_bytes"] / state["state_rows"], 1
        )
    s.stop()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
