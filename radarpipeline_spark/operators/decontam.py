"""Benchmark decontamination — flag training documents that share
token n-grams with a held-out evaluation set.

The standard pre-training hygiene pass (n-gram overlap decontamination,
n around 8-13): any document containing an n-gram that also appears in
the benchmark is contaminated and gets dropped or audited.  No
reference counterpart (RADAR-base/radarpipeline has no text
analytics); built in the dedup family's style: shared tokenization
(``dedup.tokens``), shared shingle semantics (including the short-doc
fallback), 61-bit integer gram hashes, and a DuckDB oracle twin
replaying the identical chain.

Physical shape at 100 TB:

* the benchmark side is DISTINCT n-gram hashes — bounded by the eval
  set (thousands of docs), orders of magnitude under the corpus — and
  is explicitly ``broadcast()``: the corpus-side explode joins against
  it map-side, so the only shuffle is the per-doc count aggregate.
  (``broadcast_bench=False`` flips to the shuffle-join fallback for
  benchmark sides past broadcast memory — measured threshold notes in
  BASELINE.md r6.)
* the corpus crosses the plan ONCE: distinct gram hashes per doc are
  built with array ops in the scan stage, explode_outer keeps
  zero-gram docs alive, and a single groupBy(doc) counts both totals
  and benchmark hits — no join back to the corpus to recover
  non-contaminated rows.
* gram hashes default to the NUMERIC mix fold (one md5 per TOKEN +
  ``dedup.mix_shingle_hashes`` — allocation-free per gram); the
  md5-of-gram-STRING path (``gram_hash="md5"``) allocates a concat
  string per gram, the single-JVM ceiling the corpus bench quantified
  for minhash.  Both sides of the join MUST use the same path.
* counts are exact integers; ``overlap_frac`` is round(·, 6) of their
  ratio — ulp-safe cross-engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from radarpipeline_spark.operators.dedup import (
    h60,
    mix_shingle_hashes,
    shingles_of,
    tokens,
)


def _gram_hashes(src: DataFrame, text_col: str, n: int, gram_hash: str):
    """Per-row array of ``n``-gram hashes over ``text_col`` tokens:
    the numeric mix fold (default) or md5-of-gram-string."""
    if gram_hash == "mix":
        return src.select(
            "*", tokens(text_col).alias("__t")
        ).select(
            *src.columns,
            F.transform(F.col("__t"), lambda t: h60(t)).alias("__th"),
        ).select(
            *src.columns, mix_shingle_hashes(F.col("__th"), n).alias("__gs")
        )
    return src.select("*", tokens(text_col).alias("__t")).select(
        *src.columns,
        F.transform(shingles_of(F.col("__t"), n), lambda s: h60(s)).alias(
            "__gs"
        ),
    )


def benchmark_ngram_hashes(
    bench: DataFrame, text_col: str = "text", n: int = 8,
    gram_hash: str = "mix",
) -> DataFrame:
    """DISTINCT gram hashes of the benchmark's token ``n``-grams —
    one column ``__bh``.  Tokenization and shingle semantics are the
    dedup family's (so the same text always produces the same grams
    on both sides of the decontamination join)."""
    return (
        _gram_hashes(bench.select(text_col), text_col, n, gram_hash)
        .select(F.explode_outer("__gs").alias("__bh"))
        .filter(F.col("__bh").isNotNull())
        .distinct()
    )


def ngram_decontaminate(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    gram_hash: str = "mix",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination report against ``bench``.

    Output: (id, n_grams, n_overlap, overlap_frac, contaminated) —
    one row per input document (zero-overlap docs included), where
    ``n_grams`` counts the document's DISTINCT n-gram hashes,
    ``n_overlap`` those also present in the benchmark, and
    ``contaminated`` is ``n_overlap > 0``.

    ``broadcast_bench`` picks the join strategy for the benchmark's
    distinct-gram side.  ``True`` (default) force-broadcasts it — the
    corpus-side explode probes map-side and the only shuffle is the
    per-doc count aggregate; right for eval sets up to a few million
    distinct grams (the r6 A/B at 3M docs / 100k-doc bench side =
    ~9.9M distinct grams ≈ 80MB broadcast still WON — BASELINE.md).
    ``False`` drops the hint so the join shuffles both sides on the
    gram hash — the fallback for benchmark sides past driver/executor
    broadcast memory (hundreds of MB of distinct hashes); it adds a
    corpus-sized exchange of exploded (doc, gram) rows before the
    per-doc aggregate, so prefer broadcasting until memory forbids it.
    """
    bh = benchmark_ngram_hashes(
        bench, text_col=text_col, n=n, gram_hash=gram_hash
    )
    if broadcast_bench:
        bh = F.broadcast(bh)
    doc_grams = _gram_hashes(
        df.select(id_col, text_col), text_col, n, gram_hash
    ).select(
        id_col,
        F.explode_outer(F.array_distinct(F.col("__gs"))).alias("__gh"),
    )
    hits = doc_grams.join(bh, doc_grams["__gh"] == bh["__bh"], "left")
    out = hits.groupBy(id_col).agg(
        F.count("__gh").cast("long").alias("n_grams"),
        F.count("__bh").cast("long").alias("n_overlap"),
    )
    return out.select(
        id_col,
        "n_grams",
        "n_overlap",
        F.round(F.try_divide(F.col("n_overlap"), F.col("n_grams")), 6).alias(
            "overlap_frac"
        ),
        (F.col("n_overlap") > 0).alias("contaminated"),
    )
