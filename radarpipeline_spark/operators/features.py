"""The flagship single-pass per-turn feature vector.

Fuses sessionize + lag/lead + rolling aggregates + as-of backfill into
one Catalyst plan.  All window specs partition on ``conv_id``, so the
whole feature set costs ONE shuffle of the transcript table (plus the
small aux side); the reference computes each feature as a separate
driver-side pandas pass (reference:
radarpipeline/features/feature_group.py:59-72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from radarpipeline_spark.operators.asof import asof_join
from radarpipeline_spark.operators.lag_lead import lag_lead_features
from radarpipeline_spark.operators.rolling import rolling_features
from radarpipeline_spark.operators.sessionize import sessionize


def feature_vector(
    transcripts: DataFrame,
    aux: DataFrame | None = None,
    gap_seconds: int = 1800,
    last_k: int = 10,
    range_seconds: int = 300,
    rolling_strategy: str = "sliding",
    deterministic: bool = True,
) -> DataFrame:
    """Full per-turn feature vector at each (conv_id, turn_idx, ts).

    Columns: input columns + session_id, prev_ts, next_ts,
    inter_turn_latency_s, prev_role, turns_last_k, tool_rate_last_k,
    latency_{mean,std,min,max}_Δs, and (if ``aux`` given)
    asof_<value> backfills.

    ``rolling_strategy`` picks the physical plan for the range-frame
    stats; outputs are bit-identical either way (pinned in tests).
    The crossover is FRAME DENSITY (rows per Δ-second frame):

    * ``"sliding"`` (default) replays the frame per row — O(rows x
      frame).  At sparse frames (a few rows) the replay is nearly free
      and it wins everywhere measured (100M turns at ~1 row/frame:
      1.23M turns/s vs prefix 446k at local[32]).
    * ``"prefix"`` (growing-frame diffs) is O(rows) regardless of
      frame size — 3x at ~150 rows/frame (dense-skew bench) and the
      only survivable plan at 10^3+ rows/frame.  Dense conversations
      are exactly the giant ones (10^8 turns implies sub-second gaps),
      which is why the skew router defaults its CHUNKED tail to
      prefix while the short-conversation bulk stays sliding.

    ``deterministic=False`` swaps the exact integer-µs latency stats
    for plain double sums — the production fast path when parity is
    judged allclose rather than by value hash (see rolling_features).
    """
    df = sessionize(transcripts, gap_seconds=gap_seconds)
    df = lag_lead_features(df)
    df = rolling_features(
        df, last_k=last_k, range_seconds=range_seconds,
        strategy=rolling_strategy, deterministic=deterministic,
    )
    if aux is not None:
        df = asof_join(df, aux)
    return df
