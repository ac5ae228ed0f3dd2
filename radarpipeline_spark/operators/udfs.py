"""Scalar vectorized (Arrow) UDFs for text-derived features.

The reference's entire feature layer is driver-side Python over whole
materialized frames (reference: radarpipeline/features/feature.py:
25-38).  When per-row Python is genuinely unavoidable here, it runs as
``@pandas_udf`` Series->Series over Arrow batches — never row-at-a-time.

These exist as the escape hatch; the Catalyst-native versions in
operators/text.py are preferred (10-100x less overhead than even
vectorized Python).  test_udfs.py pins both paths to identical results.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType


@pandas_udf(LongType())
def token_count_udf(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized (pandas str ops on the whole
    Arrow batch)."""
    return text.str.strip().str.split(r"\s+", regex=True).str.len().astype("int64")


@pandas_udf(LongType())
def bpe_ish_token_count_udf(text: pd.Series) -> pd.Series:
    """BPE-ish subword count: word chunks + digit runs + punctuation,
    the usual cheap proxy for tokenizer length budgeting."""
    return (
        text.str.count(r"[A-Za-z]{1,4}|[0-9]+|[^\sA-Za-z0-9]")
        .fillna(0)
        .astype("int64")
    )


@pandas_udf(DoubleType())
def alpha_ratio_udf(text: pd.Series) -> pd.Series:
    n = text.str.len().astype("float64")
    a = text.str.count(r"[A-Za-z]").astype("float64")
    return (a / n).where(n > 0)
