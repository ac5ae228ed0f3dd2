"""Point-in-time (as-of) join — backfilled feature lookups.

Spark has no native ASOF join (SPARK-22947 open), and the reference has
no join operator at all (its plugins merge in pandas on the driver,
reference: radarpipeline/datalib/radar_data.py:52-106).  Two
designed-from-scratch implementations:

* :func:`asof_join` — pure Catalyst: union the two sides, sort within
  the entity partition, carry the latest right-side row forward with
  ``last(..., ignorenulls=True)``.  No Python, whole-stage codegen,
  ONE shuffle on the entity key.  Backward direction, exact matches
  allowed — i.e. ``right.ts <= left.ts``: zero temporal leakage by
  construction (a right row at ts' > ts sorts after the left row and
  can never be carried into it).

* :func:`asof_join_pandas` — cogrouped ``applyInPandas`` running
  ``pd.merge_asof`` per entity partition (Arrow-vectorized, no per-row
  Python).  Use when you need forward/nearest direction or a tolerance,
  which the union trick can't express.

Right-side value columns are packed into ONE struct before the window
so the carried value is row-wise atomic (merge_asof semantics): a right
row with nulls in some columns is carried as-is, not column-wise
backfilled from older rows.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from radarpipeline_spark.functions.time import ts_us
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    value_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the most recent
    right row with ``right[on] <= left[on]`` within the same ``by`` key.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    left_cols = left.columns
    # side=0 sorts right rows before left rows at equal ts -> exact
    # matches are visible to the left row (allow_exact_matches=True).
    rv = F.struct(*[F.col(c) for c in value_cols])
    r_tagged = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__side"), rv.alias("__rv")
    )
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__rv"].dataType).alias("__rv"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(ts_us(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__carried", F.last("__rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col("__carried").getField(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    value_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_s: float | None = None,
    allow_exact_matches: bool = True,
    n_buckets: int | None = 256,
) -> DataFrame:
    """As-of join via cogrouped Arrow batches + ``pd.merge_asof``.

    Both sides are hash-co-partitioned by the cogroup, sorted inside
    the UDF, merged per group.  Supports every merge_asof
    direction/tolerance.  Vectorized, no per-row Python.

    The cogroup key is ``pmod(xxhash64(by), n_buckets)``, NOT ``by``
    itself: cogrouping per entity costs one Python/Arrow round-trip
    per conversation (ruinous for 10^6+ short conversations — measured
    6.5s -> ~2s at sf0.1's 1.5k conversations, and the gap grows with
    entity count).  Each bucket merges ALL its conversations in one
    vectorized ``pd.merge_asof(..., by=by)`` call — identical
    semantics, per-entity matching done C-side by pandas.
    ``n_buckets=None`` restores per-entity grouping.  A single giant
    conversation still lands in one bucket either way — that skew is
    ``chunked_asof_join``'s job.

    NULL ``by`` keys: the per-entity cogroup treats NULL as one
    ordinary entity (Spark groupBy puts all NULL keys in one group and
    merge_asof without ``by=`` matches them), but ``pd.merge_asof(by=)``
    never matches NaN keys — so bucketing routes NULL-key rows to a
    DEDICATED bucket merged WITHOUT ``by=``, preserving the per-entity
    semantics exactly (pytest-pinned).  The kernel learns it is in the
    NULL bucket from the COGROUP KEY (the three-argument applyInPandas
    form), not by inspecting the batch's values: for a float ``by``
    column, NaN keys are non-NULL and hash into normal buckets, and a
    normal bucket whose left rows happen to be all-NaN must still merge
    with ``by=`` (ADVICE r4).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    out_schema = StructType(
        list(left.schema.fields)
        + [
            StructField(f"{prefix}{c}", right.schema[c].dataType, True)
            for c in value_cols
        ]
    )
    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s is not None else None
    left_cols = list(left.columns)
    vcols = list(value_cols)
    # Re-alias every right column to a fresh attribute: when left and
    # right derive from the same scan, shared exprIds make the cogroup
    # analyzer deduplicate the right side's columns away (classic
    # self-join aliasing hazard).  Fresh aliases break the collision.
    right = right.select(
        F.col(by).alias(by),
        F.col(on).alias("__asof_on"),
        *[F.col(c).alias(f"{prefix}{c}") for c in vcols],
    )

    def merge(
        use_by: bool, lpdf: pd.DataFrame, rpdf: pd.DataFrame
    ) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        # merge_asof requires both frames sorted by `on`; by= matching
        # is resolved C-side per entity within the sorted frames
        lpdf = lpdf.sort_values(on, kind="mergesort")
        if rpdf.empty:
            for c in vcols:
                lpdf[f"{prefix}{c}"] = None
            return lpdf[[*left_cols, *[f"{prefix}{c}" for c in vcols]]]
        rpdf = rpdf.rename(columns={"__asof_on": on})
        rcols = ([by] if use_by else []) + [on] + [
            f"{prefix}{c}" for c in vcols
        ]
        rpdf = rpdf[rcols].sort_values(on, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            on=on,
            by=by if use_by else None,
            direction=direction,
            tolerance=tol,
            allow_exact_matches=allow_exact_matches,
        )
        return merged[[*left_cols, *[f"{prefix}{c}" for c in vcols]]]

    if n_buckets is not None:
        # NULL keys get their own bucket (id = n_buckets, outside the
        # pmod range), merged WITHOUT by= — xxhash64(NULL) would
        # otherwise silently route them into a normal bucket where
        # merge_asof(by=) never matches NaN keys.  The kernel decides
        # from the cogroup KEY (three-argument applyInPandas form):
        # key != n_buckets <=> a normal bucket, which always merges
        # with by= — even if its left rows are all NaN (a float NaN is
        # NOT NULL and belongs to a normal bucket; ADVICE r4).
        bucket = F.when(
            F.col(by).isNull(), F.lit(n_buckets).cast("bigint")
        ).otherwise(F.pmod(F.xxhash64(F.col(by)), F.lit(n_buckets)))
        return (
            left.groupBy(bucket.alias("__b"))
            .cogroup(right.groupBy(bucket.alias("__b")))
            .applyInPandas(
                lambda key, l, r: merge(key[0] != n_buckets, l, r),
                schema=out_schema,
            )
        )
    # per-entity grouping: each cogroup is exactly one entity, so the
    # kernel never needs by= (NULL keys form one ordinary group)
    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(False, l, r), schema=out_schema)
    )
