"""Declarative feature-plan builder + physical-plan introspection.

The reference runs each feature as an isolated pandas pass over
materialized data (reference: radarpipeline/features/feature_group.py:
59-72 — one loop iteration per feature).  Here a ``FeaturePlan``
declares WHICH features are wanted and emits ONE fused Catalyst plan:
window expressions sharing a (partition, order) spec land in the same
physical Window node, and the whole feature set rides a single
conv_id shuffle.

``plan_shape`` counts the expensive physical nodes (Exchange / Sort /
Window) from ``explain`` output — used by tests to pin the plan shape
so a refactor that silently doubles the shuffles fails CI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from radarpipeline_spark.operators.asof import asof_join
from radarpipeline_spark.operators.lag_lead import lag_lead_features
from radarpipeline_spark.operators.rolling import rolling_features
from radarpipeline_spark.operators.sessionize import sessionize
from radarpipeline_spark.operators.skew import skew_routed_feature_vector


@dataclass
class FeaturePlan:
    """Select-and-fuse feature declaration.

    >>> plan = FeaturePlan(sessionize=True, rolling_last_k=10)
    >>> df = plan.apply(transcripts)
    """

    sessionize: bool = True
    gap_seconds: int = 1800
    lag_lead: bool = True
    rolling_last_k: int | None = 10
    rolling_range_seconds: int | None = 300
    asof_aux: DataFrame | None = None
    skew_chunk_rows: int | None = None  # None = plain windows
    extra_exprs: dict = field(default_factory=dict)  # name -> Column

    def apply(self, transcripts: DataFrame) -> DataFrame:
        df = transcripts
        if self.skew_chunk_rows:
            df = skew_routed_feature_vector(
                df,
                chunk_rows=self.skew_chunk_rows,
                gap_seconds=self.gap_seconds,
                last_k=self.rolling_last_k or 10,
                range_seconds=self.rolling_range_seconds or 300,
            )
        else:
            if self.sessionize:
                df = sessionize(df, gap_seconds=self.gap_seconds)
            if self.lag_lead or self.rolling_last_k:
                df = lag_lead_features(df)
            if self.rolling_last_k:
                ks = self.rolling_last_k
                ds = self.rolling_range_seconds or 300
                if isinstance(ks, (list, tuple)) or isinstance(ds, (list, tuple)):
                    # multi-horizon: every row frame shares one Window
                    # node, every range frame the next — still ONE
                    # exchange and two sorts however many horizons
                    from radarpipeline_spark.operators.rolling import (
                        rolling_features_multi,
                    )

                    df = rolling_features_multi(
                        df,
                        last_ks=ks if isinstance(ks, (list, tuple)) else [ks],
                        range_windows=(
                            ds if isinstance(ds, (list, tuple)) else [ds]
                        ),
                    )
                else:
                    df = rolling_features(df, last_k=ks, range_seconds=ds)
        if self.asof_aux is not None:
            df = asof_join(df, self.asof_aux)
        for name, col in self.extra_exprs.items():
            df = df.withColumn(name, col)
        return df


def plan_shape(df: DataFrame) -> dict[str, int]:
    """Counts of expensive physical operators in the executed plan."""
    text = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "sorts": len(re.findall(r"\bSort\b", text)),
        "windows": len(re.findall(r"\bWindow\b", text)),
        "scans": len(re.findall(r"\bScan\b", text)),
    }
