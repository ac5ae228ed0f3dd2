"""Deterministic hash sampling — the scale-correct sampling primitive.

``df.sample()`` draws from a per-partition RNG: resampling after a
repartition, a retry, or on another engine yields DIFFERENT rows, which
breaks reproducible training-data curation.  Hashing the row KEY
instead makes membership a pure function of (seed, key): stable under
any partitioning, identical in the DuckDB oracle, and trivially
stratifiable.  Cost is one md5 per row, no shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from radarpipeline_spark.operators.dedup import h60


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate_pct: int,
    seed: int = 42,
) -> DataFrame:
    """Keep rows where h60(seed # key) mod 100 < rate_pct — an exact
    ``rate_pct``% expected-rate sample, deterministic per key."""
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    bucket = F.pmod(
        h60(F.concat_ws("#", F.lit(str(seed)), F.col(key_col).cast("string"))),
        F.lit(100),
    )
    return df.filter(bucket < rate_pct)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_pct: dict,
    default_pct: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample boilerplate
    docs, keep all rare-language docs): ``rates_pct`` maps stratum
    value -> percentage; unlisted strata get ``default_pct``."""
    bucket = F.pmod(
        h60(F.concat_ws("#", F.lit(str(seed)), F.col(key_col).cast("string"))),
        F.lit(100),
    )
    rate = F.lit(default_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)
