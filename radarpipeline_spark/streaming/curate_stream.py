"""Streaming document curation — the LLM-training-data sweep as a
continuous pipeline (streaming twin of ``operators.curation``).

Stage map (mirrors the batch operator stage-for-stage):

* quality / token-count / language filters — STATELESS Catalyst
  projections, evaluated per micro-batch exactly as in batch (the same
  expression helpers from ``operators/text.py``, so thresholds agree
  cell-for-cell);
* exact dedup — the only STATEFUL stage: ``applyInPandasWithState``
  keyed by the cross-engine 60-bit content hash; state is one int per
  distinct content ever seen.  The first micro-batch containing a hash
  emits that batch's minimum-id row; every later occurrence drops.
* deterministic sampling — stateless again (membership is a pure
  function of (seed, id)), applied AFTER dedup so the advertised rate
  applies to survivors, as in batch.

Batch-parity contract: the batch operator keeps the GLOBAL minimum id
per content; the stream keeps the first-arrival minimum.  They agree
whenever ids are non-decreasing across micro-batches per content (the
log-append ingestion order) — pinned by pytest with a mid-stream split.

State size: one (hash -> seen) entry per distinct content — the same
cardinality any streaming exact-dedup must carry; at larger horizons,
bound it with a TTL/timeout policy (state eviction trades a re-emitted
duplicate after the TTL for bounded memory).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, StructField, StructType

from radarpipeline_spark.operators.dedup import h60, tokens
from radarpipeline_spark.operators.text import (
    lang_pred_of,
    quality_score_expr,
)

DEDUP_STATE_SCHEMA = StructType([StructField("seen", IntegerType(), True)])


def _first_seen(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    id_col: str,
    out_cols: list,
) -> Iterator[pd.DataFrame]:
    """Emit the min-id row of this content group's FIRST micro-batch;
    drop every subsequent occurrence (state = seen marker)."""
    if state.exists:
        for _ in pdfs:
            pass
        return iter(())
    chunks = [p for p in pdfs if len(p)]
    state.update((1,))
    if not chunks:
        return iter(())
    allp = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    best = allp.sort_values(id_col, kind="mergesort").iloc[:1]
    return iter([best[out_cols]])


def stream_curate_documents(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    min_quality: float | None = None,
    langs=None,
    dedup: bool = True,
    sample_pct: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Curated document stream: input columns + ``n_tokens``,
    ``quality_score``, ``lang_pred`` — same surface and same stage
    order as :func:`radarpipeline_spark.operators.curation.curate_documents`.
    """
    # same pre-materialized lowered-token column as the batch operator
    # (see curate_documents) — stage parity AND the same HOF-reeval fix
    out = stream.select(
        "*",
        F.transform(tokens(text_col), lambda x: F.lower(x)).alias("__lt"),
    ).select(
        *stream.columns,
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
        out_schema = StructType(list(out.schema.fields))
        out_cols = [f.name for f in out_schema.fields]

        def fn(key, pdfs, state):
            return _first_seen(key, pdfs, state, id_col, out_cols)

        out = (
            out.withColumn("__h", h60(text_col))
            .groupBy("__h")
            .applyInPandasWithState(
                fn,
                outputStructType=out_schema,
                stateStructType=DEDUP_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    if sample_pct is not None:
        bucket = F.pmod(
            h60(
                F.concat_ws("#", F.lit(str(seed)), F.col(id_col).cast("string"))
            ),
            F.lit(100),
        )
        out = out.filter(bucket < sample_pct)
    return out
