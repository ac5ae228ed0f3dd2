"""Composed document-curation pipeline — the standard LLM-training-data
sweep (quality filter → language filter → exact dedup → deterministic
sample) declared as ONE lazy Catalyst plan.

Each stage reuses the already-oracle-graded building blocks
(operators/text.py, dedup.py, sampling.py), so the whole pipeline has a
DuckDB twin by composition and stays hash-gradable end-to-end.

Physical shape at 100 TB:

* the quality / token-count / language filters are pure projections
  evaluated in the scan stage (one pass, whole-stage codegen, no
  shuffle, no UDFs);
* dedup is the ONLY shuffle: a window ``min(id) over content_hash`` —
  survivors are rows equal to their group minimum, no join back;
* sampling is a pure function of (seed, id) — no shuffle, stable under
  repartition/retry — applied LAST so the rate applies to the
  deduplicated survivors.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from radarpipeline_spark.operators.dedup import h60, tokens
from radarpipeline_spark.operators.text import (
    lang_pred_of,
    quality_score_expr,
)


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    min_quality: float | None = None,
    langs: Sequence[str] | None = None,
    dedup: bool = True,
    sample_pct: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Curated corpus slice: input columns + ``n_tokens``,
    ``quality_score`` (rounded to 6dp — the oracle-graded value, so
    threshold comparisons are ulp-safe cross-engine) and ``lang_pred``.

    Stage order is fixed and semantically load-bearing: filters first
    (cheapest, biggest reduction), dedup over the filtered survivors
    (a doc whose duplicates were all quality-rejected still keeps its
    own canonical), sampling last (the advertised rate applies to the
    corpus a training run would actually see).
    """
    # lowered token array materialized ONCE: inlined, the split+lower
    # chain re-evaluates per consumer (token count + each language's
    # stopword filter — ~6x on the scan stage; lower() never changes
    # the token COUNT, so n_tokens = size of the lowered array exactly).
    # Residual: threshold FILTERS pushed below this projection re-inline
    # the chain by alias substitution — row-linear (never per-element),
    # and only for the predicates actually requested; the output
    # projection itself evaluates the array once (pytest-pinned).
    out = df.select(
        "*",
        F.transform(tokens(text_col), lambda x: F.lower(x)).alias("__lt"),
    ).select(
        *df.columns,
        F.size("__lt").cast("long").alias("n_tokens"),
        quality_score_expr(text_col).alias("quality_score"),
        lang_pred_of(F.col("__lt")).alias("lang_pred"),
    )
    if min_tokens is not None:
        out = out.filter(F.col("n_tokens") >= min_tokens)
    if max_tokens is not None:
        out = out.filter(F.col("n_tokens") <= max_tokens)
    if min_quality is not None:
        out = out.filter(F.col("quality_score") >= min_quality)
    if langs is not None:
        out = out.filter(F.col("lang_pred").isin(list(langs)))
    if dedup:
        w = Window.partitionBy(h60(text_col))
        out = out.withColumn("__canon", F.min(id_col).over(w)).filter(
            F.col(id_col) == F.col("__canon")
        ).drop("__canon")
    if sample_pct is not None:
        bucket = F.pmod(
            h60(
                F.concat_ws("#", F.lit(str(seed)), F.col(id_col).cast("string"))
            ),
            F.lit(100),
        )
        out = out.filter(bucket < sample_pct)
    return out


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line-level exact dedup — the C4/CCNet boilerplate
    pass (Raffel et al. 2020 §2.2: "we discarded all but one of any
    three-sentence span occurring more than once", here at line
    granularity): split each document into lines on ``sep``, keep each
    distinct non-empty line ONLY at its globally-first occurrence
    (ordered by (doc_id, line position)), drop every other occurrence
    — including later repeats inside the same document — and reassemble
    the survivors in original order.  No reference counterpart
    (RADAR-base/radarpipeline has no text analytics).

    Output: one row per input document — (id, text, n_lines, n_kept)
    where ``text`` is the surviving lines rejoined with ``sep`` (empty
    string when nothing survives; the row itself is never dropped),
    ``n_lines`` counts the document's non-empty lines and ``n_kept``
    the survivors.  Lines are compared by their 61-bit content hash
    (``dedup.h60`` — the exact-dedup trade: a 2^-60 collision merges
    two distinct lines; the DuckDB twin replays the same hash, so the
    twins agree by construction).

    Physical shape at 100 TB — three exchanges, all AQE-safe:

    1. first-occurrence table: ``groupBy(line_hash).agg(min(struct(
       doc, pos)))`` — an AGGREGATE with map-side combine, never a
       window over the line hash (a boilerplate line's million
       occurrences would land in ONE unsplittable window partition —
       the tfidf document-frequency lesson);
    2. occurrences ⋈ first-occurrence on line hash — AQE skew-splits
       the hot boilerplate keys; empty-line rows carry a NEGATIVE
       per-row sentinel key (h60 is non-negative, so they match
       nothing) instead of a shared null/h60('') key that would put
       every empty line of the corpus in one join partition;
    3. per-document reassembly: ``collect_list`` bounded by document
       size, sorted by position in-task.

    The aggregate side shares the explode subtree with the join's
    probe side; under AQE's exchange-reuse miss the scan+split
    re-executes once more — the dedup-family trade (memory-safe, no
    corpus-sized barrier).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line"),
    )
    cand = F.col("line") != ""
    occ = lines.select(
        id_col,
        "pos",
        "line",
        cand.alias("__cand"),
        F.when(cand, h60(F.col("line")))
        .otherwise(-F.abs(F.xxhash64(F.col(id_col), F.col("pos"))) - 1)
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
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("pos", "line")))
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text"),
            F.sum(F.col("__cand").cast("long")).alias("n_lines"),
            F.sum(kept.cast("long")).alias("n_kept"),
        )
        .select(id_col, "text", "n_lines", "n_kept")
    )
