"""Shuffle-free per-document gram-multiplicity kernels for
``text.repetition_stats`` — see that docstring for the operator
contract.  Split out so the array-combinator plumbing doesn't crowd
the operator module.

Everything here is a SCALAR expression over an already-materialized
sorted gram-hash array column: multiplicity questions about one
document never need a groupBy — sorting the (tiny, per-doc) array and
counting runs answers them in O(len log len) inside the scan stage,
where the explode+double-aggregate alternative pays two corpus-wide
exchanges.  All lambdas reference only attributes (physical columns)
— the interpreted-HOF re-evaluation trap (dedup.shingles_of) is why
callers must materialize the sorted array first.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def top_run_len(sorted_col) -> F.Column:
    """Length of the longest run of equal values in a SORTED array =
    max multiplicity of any element.  Single left fold with a
    (prev, cur, best) accumulator; hashes are non-negative so -1 is a
    safe 'no previous' sentinel."""
    zero = F.lit(0).cast("long")
    return F.aggregate(
        sorted_col,
        F.struct(
            F.lit(-1).cast("long").alias("prev"),
            zero.alias("cur"),
            zero.alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1).cast("long")).alias("cur"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )


def singleton_count(sorted_col, size_col) -> F.Column:
    """Number of elements with multiplicity exactly 1 in a SORTED
    array: positions that differ from BOTH neighbours.  The neighbour
    probes are when()-guarded (when() is lazy) so position 1 / size
    never evaluate an out-of-range element_at (ANSI)."""
    s = sorted_col

    def at(i):
        return F.element_at(s, i.cast("int"))

    return F.size(
        F.filter(
            F.sequence(F.lit(1), size_col),
            lambda i: F.when(i == 1, F.lit(True)).otherwise(at(i) != at(i - 1))
            & F.when(i == size_col, F.lit(True)).otherwise(at(i) != at(i + 1)),
        )
    )
