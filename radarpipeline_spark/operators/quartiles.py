"""Exact per-group quantiles that survive pathological group sizes.

Spark's exact ``percentile`` aggregate buffers EVERY value of a group
in one in-memory aggregation buffer (OpenHashMap of counts) — fine at
normal per-conversation turn counts, an executor OOM at the 10^8-turn
conversation design point (the same skew pathology the chunked window
path guards against; reference's per-user pandas passes have the same
failure shape, reference: radarpipeline/features/feature_group.py:59).

:func:`group_quantiles` therefore routes by group size, mirroring the
skew-routing pattern in operators/skew.py:

* groups with ``n <= buffer_threshold`` rows run the plain
  ``percentile`` aggregate — one hash agg, no sort, buffer bounded by
  the threshold;
* larger groups run a RANK-based plan: ``row_number`` over a sorted
  window (Spark's window sort spills via UnsafeExternalSorter, and the
  partition buffer is a spillable ExternalAppendOnlyUnsafeRowArray —
  bounded memory at ANY group size), keep only the two order
  statistics each quantile interpolates between, and finish with a
  tiny per-group agg.

Both paths evaluate the identical interpolation expression
``lo + (d - floor(d)) * (hi - lo)`` with ``d = p*(n-1)`` on the same
values, so outputs are bit-identical — pinned by tests — and the
DuckDB oracle (quantile_cont) needs no per-path variants.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _interp(p: float, n, lo_val, hi_val):
    """lo + (d - floor(d)) * (hi - lo) with d = p*(n-1), as doubles —
    the same expression Spark's Percentile.getPercentile evaluates, so
    both routes (and the sliding/chunked twins) agree bit-for-bit."""
    d = F.lit(p) * (n.cast("double") - F.lit(1.0))
    frac = d - F.floor(d)
    return lo_val.cast("double") + frac * (
        hi_val.cast("double") - lo_val.cast("double")
    )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    out_cols: Sequence[str] | None = None,
    buffer_threshold: int = 1 << 16,
    broadcast_counts: bool = True,
    strategy: str = "routed",
) -> DataFrame:
    """Exact interpolated per-group quantiles of ``value_col``.

    Returns one row per group: ``group_cols + [n] + out_cols`` (default
    ``q_25 .. q_75``).  NULL values are excluded from the quantiles
    (both engines agree on that), but a group whose values are ALL NULL
    is still emitted, with ``n = 0`` and NULL quantiles — matching both
    the plain ``percentile`` groupBy aggregate and the SQL
    ``quantile_cont`` twin (a single-turn conversation has one all-NULL
    latency row and must not vanish from the output).

    ``buffer_threshold`` is the routing cut: the largest group size the
    in-memory ``percentile`` buffer is allowed to hold.  The default
    (65536 values = ~0.5 MB of longs per group buffer) keeps even a
    whole-executor worst case (thousands of concurrent group buffers)
    in normal heap territory; anything bigger takes the spillable
    rank path.

    ``broadcast_counts`` (default True) broadcasts the per-group count
    table into the routing join: counts is one short row per group, so
    at any realistic group cardinality (millions) the broadcast is a
    few MB and the big side never shuffles for the join — the
    alternative is a sort-merge join that sorts the full input twice
    (once per routing branch; measured ~1.3x the whole query).  Set
    False only at extreme group cardinality (10^8+ groups), where the
    counts table itself stops being broadcastable.

    ``strategy``:

    * ``"routed"`` (default) — the size-routed two-branch plan above:
      right when group sizes are mixed and most groups are small (the
      hash-agg ``percentile`` branch never sorts them).
    * ``"sort"`` — ONE spillable plan for every group (VERDICT r4
      #10): a single window sort (``value NULLS LAST``) provides
      ``row_number`` and the non-NULL count from the same WindowExec,
      the order statistics each quantile interpolates between are kept,
      and the finishing aggregate reuses the window's hash
      partitioning — one exchange + one sort total, no counts join, no
      routing branches.  Bit-identical to the routed plan (pinned),
      bounded memory at any group size.  Right when a sort of the
      input is acceptable anyway (the rank branch's cost) — it deletes
      the routing overhead the two-branch plan pays on top.
    """
    gcols = list(group_cols)
    out_cols = list(
        out_cols
        if out_cols is not None
        else [f"q_{str(p).replace('0.', '')}" for p in probs]
    )
    v = F.col(value_col)

    if strategy == "sort":
        ws = Window.partitionBy(*gcols).orderBy(F.col(value_col).asc_nulls_last())
        # count over the same (partition, order) with an unbounded frame
        # shares the sorted WindowExec; NULLS LAST puts the n non-NULL
        # values at ranks 1..n exactly
        whole = ws.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = df.select(
            *gcols,
            v.alias("__v"),
            F.row_number().over(ws).alias("__r"),
            F.count(value_col).over(whole).alias("n"),
        )
        # keep the <= 2*len(probs) order statistics per group, plus one
        # representative row of each all-NULL group (n = 0, NULL
        # quantiles — same contract as both other paths)
        keep = (F.col("n") == 0) & (F.col("__r") == 1)
        for p in probs:
            d = F.lit(p) * (F.col("n").cast("double") - F.lit(1.0))
            keep = (
                keep
                | (F.col("__r") == F.floor(d).cast("long") + 1)
                | (F.col("__r") == F.ceil(d).cast("long") + 1)
            )
        stats = ranked.filter(keep)
        agg_exprs = []
        for p, c in zip(probs, out_cols):
            d = F.lit(p) * (F.col("n").cast("double") - F.lit(1.0))
            lo = F.max(
                F.when(F.col("__r") == F.floor(d).cast("long") + 1, F.col("__v"))
            )
            hi = F.max(
                F.when(F.col("__r") == F.ceil(d).cast("long") + 1, F.col("__v"))
            )
            agg_exprs.append((p, c, lo, hi))
        out = stats.groupBy(*gcols, "n").agg(
            *[lo.alias(f"__lo_{c}") for _, c, lo, _ in agg_exprs],
            *[hi.alias(f"__hi_{c}") for _, c, _, hi in agg_exprs],
        )
        return out.select(
            *gcols,
            "n",
            *[
                _interp(
                    p, F.col("n"), F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
                ).alias(c)
                for p, c, _, _ in agg_exprs
            ],
        )
    if strategy != "routed":
        raise ValueError(f"unknown strategy {strategy!r}")

    # count(value_col) counts non-NULL values only, but the groupBy
    # keys keep EVERY group — all-NULL groups arrive with n = 0.
    counts = df.groupBy(*gcols).agg(F.count(value_col).alias("n"))
    # NULL-SAFE routing join (ADVICE r4): a plain equi-join on the key
    # columns silently drops any group whose key contains NULL from
    # BOTH routing branches — groupBy keeps NULL keys as a group, so
    # the plain-percentile contract (and group_quantiles_approx, a
    # pure groupBy) would diverge.  eqNullSafe per key routes NULL-key
    # groups like any other; keys are re-aliased first so the
    # self-derived join doesn't collide exprIds, and <=> keys still
    # plan as broadcast-hash-join keys.
    counts = counts.select(
        *[F.col(c).alias(f"__g_{c}") for c in gcols], "n"
    )
    if broadcast_counts:
        counts = F.broadcast(counts)
    cond = F.lit(True)
    for c in gcols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__g_{c}"))
    routed = df.join(counts, on=cond).drop(*[f"__g_{c}" for c in gcols])

    small = routed.filter(F.col("n") <= buffer_threshold)
    small_q = small.groupBy(*gcols, "n").agg(
        *[
            F.expr(f"percentile({value_col}, {p!r})").alias(c)
            for p, c in zip(probs, out_cols)
        ]
    )

    big = routed.filter(F.col("n") > buffer_threshold)
    ws = Window.partitionBy(*gcols).orderBy(value_col)
    ranked = big.filter(v.isNotNull()).select(
        *gcols, "n", v.alias("__v"), F.row_number().over(ws).alias("__r")
    )
    # keep only the <= 2*len(probs) order statistics per group that the
    # interpolation touches: rank floor(d)+1 and ceil(d)+1 per p
    keep = F.lit(False)
    for p in probs:
        d = F.lit(p) * (F.col("n").cast("double") - F.lit(1.0))
        keep = (
            keep
            | (F.col("__r") == F.floor(d).cast("long") + 1)
            | (F.col("__r") == F.ceil(d).cast("long") + 1)
        )
    stats = ranked.filter(keep)
    agg_exprs = []
    for p, c in zip(probs, out_cols):
        d = F.lit(p) * (F.col("n").cast("double") - F.lit(1.0))
        lo = F.max(
            F.when(F.col("__r") == F.floor(d).cast("long") + 1, F.col("__v"))
        )
        hi = F.max(
            F.when(F.col("__r") == F.ceil(d).cast("long") + 1, F.col("__v"))
        )
        agg_exprs.append((p, c, lo, hi))
    big_q = stats.groupBy(*gcols, "n").agg(
        *[lo.alias(f"__lo_{c}") for _, c, lo, _ in agg_exprs],
        *[hi.alias(f"__hi_{c}") for _, c, _, hi in agg_exprs],
    )
    big_q = big_q.select(
        *gcols,
        "n",
        *[
            _interp(p, F.col("n"), F.col(f"__lo_{c}"), F.col(f"__hi_{c}")).alias(c)
            for p, c, _, _ in agg_exprs
        ],
    )
    return small_q.unionByName(big_q)


def group_quantiles_approx(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    out_cols: Sequence[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate per-group quantiles via ``approx_percentile``
    (Greenwald-Khanna quantile summaries) — the escape hatch when even
    the exact rank path's one sort per giant group is too expensive
    (VERDICT r3 #10).

    One hash aggregation, NO sort, bounded memory: the per-group sketch
    holds O(accuracy * log n) samples regardless of group size, and
    sketches merge map-side, so a 10^8-row group costs the same buffer
    as a 10^3-row one.

    **Error bound** (Spark's QuantileSummaries contract): the returned
    value is an ACTUAL element of the group whose rank r satisfies
    ``|r - ceil(p * n)| <= n / accuracy`` — a guaranteed RANK error of
    at most n/accuracy (value error depends on the data's local
    density; no interpolation between order statistics is performed,
    which is also why this variant has no cross-engine value-hash
    oracle: DuckDB's approx_quantile uses t-digest, a different
    sketch).  At the default accuracy=10000 the p50 of a 10^8-row
    group lands within rank 1e8/1e4 = 10^4 of the true median —
    relative rank error 0.01%.

    Exactness escape: for groups with n <= accuracy the summary holds
    every value, so the result is the exact order statistic at rank
    ``ceil(p * n)`` (still not the interpolated quantile).

    Output surface matches :func:`group_quantiles`:
    ``group_cols + [n] + out_cols``; all-NULL groups are kept with
    n=0 and NULL quantiles.
    """
    out_cols = list(
        out_cols
        if out_cols is not None
        else [f"q_{str(p).replace('0.', '')}" for p in probs]
    )
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("n"),
        *[
            F.expr(
                f"approx_percentile({value_col}, {p!r}, {accuracy})"
            ).cast("double").alias(c)
            for p, c in zip(probs, out_cols)
        ],
    )
