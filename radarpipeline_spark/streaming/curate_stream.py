"""Streaming document curation — the LLM-training-data sweep as a
continuous pipeline (streaming twin of ``operators.curation``).

Stage map (same stages as the batch operator; the dedup shuffle runs
FIRST — see ``stream_curate_documents`` for why that reorder is both
output-identical and the difference between single-task and
fully-parallel micro-batches):

* exact dedup — the only STATEFUL stage: ``applyInPandasWithState``
  keyed by the cross-engine 60-bit content hash (or a hash bucket of
  thousands of contents — ``dedup_buckets``).  The first micro-batch
  containing a hash emits that batch's minimum-id row; every later
  occurrence drops.
* quality / token-count / language filters — STATELESS Catalyst
  projections over the dedup survivors, running post-shuffle on the
  state partitions (the same expression helpers from
  ``operators/text.py``, so thresholds agree cell-for-cell with
  batch);
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

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from radarpipeline_spark.operators.dedup import h60, tokens
from radarpipeline_spark.operators.text import (
    lang_pred_of,
    quality_score_expr,
)

DEDUP_STATE_SCHEMA = StructType([StructField("seen", IntegerType(), True)])
BUCKET_STATE_SCHEMA = StructType(
    [StructField("seen", ArrayType(LongType(), True), True)]
)


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


def _bucket_first_seen(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    id_col: str,
    out_cols: list,
) -> Iterator[pd.DataFrame]:
    """Bucketed exact-dedup kernel: the group key is a HASH BUCKET
    (thousands of contents), state is the sorted-free array of content
    hashes ever seen in the bucket.  Within the micro-batch the min-id
    row per content is selected vectorized (stable sort + first-keep
    drop_duplicates — the same first-arrival-min contract as the
    per-content kernel); survivors not in the seen set are emitted and
    appended to it.

    Why buckets: keying state on the content hash itself makes one
    group PER DISTINCT CONTENT — at 1M docs that is ~1M single-row
    groups per run, each paying the per-group Python kernel dispatch
    (concat/sort/slice), measured as a 14x streaming tax over batch,
    plus ~365 state-store bytes per content.  Bucketing amortizes the
    dispatch over thousands of rows and stores 8 bytes per content.
    The trade: a bucket's whole seen-array is rewritten on every
    micro-batch that touches it — size ``dedup_buckets`` so the
    per-bucket array stays in the single-digit-MB range at the target
    content cardinality (and at 10^12-content horizons, prefer the
    per-content kernel on a RocksDB point-lookup store, or a TTL)."""
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return iter(())
    allp = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    batch_min = allp.sort_values(id_col, kind="mergesort").drop_duplicates(
        "__h", keep="first"
    )
    if state.exists:
        (seen,) = state.get
        seen_arr = np.asarray(seen, dtype=np.int64)
        fresh = batch_min[~batch_min["__h"].isin(seen_arr)]
    else:
        seen_arr = np.empty(0, dtype=np.int64)
        fresh = batch_min
    state.update(
        (
            np.concatenate(
                [seen_arr, fresh["__h"].to_numpy(dtype=np.int64)]
            ).tolist(),
        )
    )
    if not len(fresh):
        return iter(())
    return iter([fresh[out_cols]])


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
    dedup_buckets: int | None = 4096,
) -> DataFrame:
    """Curated document stream: input columns + ``n_tokens``,
    ``quality_score``, ``lang_pred`` — same surface and same stage
    order as :func:`radarpipeline_spark.operators.curation.curate_documents`.

    ``dedup_buckets`` (default 4096) keys the stateful exact-dedup on
    ``pmod(content_hash, dedup_buckets)`` with an array-of-seen-hashes
    state per bucket — see :func:`_bucket_first_seen` for the measured
    14x group-dispatch pathology this avoids.  ``None`` keys on the
    content hash itself (one state row per content — the right shape
    on a point-lookup state store such as RocksDB at extreme content
    cardinality).  Output is identical either way.

    Stage ORDER differs from the batch operator when ``dedup`` is on:
    the state shuffle runs FIRST (on the raw rows, keyed by content
    hash) and the tokenize/quality/language projections + filters run
    on its survivors.  A micro-batch is typically ONE file — often one
    parquet row group, i.e. ONE scan task no matter what
    ``maxPartitionBytes`` says — so any per-doc compute placed before
    the first exchange runs single-threaded (measured: 8s/62k-doc
    batch, the whole streaming tax).  Riding the shuffle the stateful
    op already pays spreads that compute over the state partitions and
    only over deduped survivors.  Output is IDENTICAL: exact dedup
    keys on the full text, and every filter is a deterministic
    function of that same text, so identical copies pass or fail
    together — first-qualifying-min-id == first-min-id.  The one trade
    is state cardinality: the store now carries every distinct content
    seen, not just filter-qualifying ones (pre-filtering cheap
    guards — e.g. length bounds — before calling this function still
    shrinks state when that matters).  With ``dedup=False`` the
    pipeline is stateless and keeps the batch stage order; parallelism
    is then bounded by source splits — repartition upstream if the
    per-batch file count is small.
    """
    if dedup:
        raw_schema = StructType(list(stream.schema.fields))
        raw_cols = [f.name for f in raw_schema.fields]

        if dedup_buckets is None:

            def fn(key, pdfs, state):
                return _first_seen(key, pdfs, state, id_col, raw_cols)

            out = (
                stream.withColumn("__h", h60(text_col))
                .groupBy("__h")
                .applyInPandasWithState(
                    fn,
                    outputStructType=raw_schema,
                    stateStructType=DEDUP_STATE_SCHEMA,
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.NoTimeout,
                )
            )
        else:

            def fn(key, pdfs, state):
                return _bucket_first_seen(key, pdfs, state, id_col, raw_cols)

            out = (
                stream.withColumn("__h", h60(text_col))
                .withColumn(
                    "__b", F.pmod(F.col("__h"), F.lit(int(dedup_buckets)))
                )
                .groupBy("__b")
                .applyInPandasWithState(
                    fn,
                    outputStructType=raw_schema,
                    stateStructType=BUCKET_STATE_SCHEMA,
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.NoTimeout,
                )
            )
    else:
        out = stream

    # same pre-materialized lowered-token column as the batch operator
    # (see curate_documents) — stage parity AND the same HOF-reeval fix
    base_cols = list(out.columns)
    out = out.select(
        "*",
        F.transform(tokens(text_col), lambda x: F.lower(x)).alias("__lt"),
    ).select(
        *base_cols,
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

    if sample_pct is not None:
        bucket = F.pmod(
            h60(
                F.concat_ws("#", F.lit(str(seed)), F.col(id_col).cast("string"))
            ),
            F.lit(100),
        )
        out = out.filter(bucket < sample_pct)
    return out
