"""Custom stateful streaming operator: incremental per-turn session ids.

``session_window`` (sessionize_stream.py) emits per-session AGGREGATES;
this operator emits every turn with its ``session_id`` assigned
incrementally — the streaming twin of ``operators.sessionize`` — using
``applyInPandasWithState``: per-conversation state carries
(last_ts_us, last_session_id) across micro-batches, and each batch's
rows are processed as one Arrow-backed pandas frame (vectorized, no
per-row Python beyond the group loop Spark itself drives).

Ordering contract: rows may arrive unordered WITHIN a micro-batch
(sorted here by turn_idx) but batches must be non-overlapping and
in-order per conversation (log-ordered ingestion, the usual Kafka
keyed-partition guarantee).  Out-of-order ACROSS batches would need
watermarked buffering — that's what the session_window variant is for.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MICROS = 1_000_000

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("ts", TimestampType(), False),
        StructField("session_id", IntegerType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType(), True),
        StructField("last_session", IntegerType(), True),
    ]
)


def _assign(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    last_ts_us, last_session = state.get if state.exists else (None, None)
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx", ignore_index=True)
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        prev = us.shift(1)
        if last_ts_us is not None:
            prev.iloc[0] = last_ts_us
        new_flag = prev.isna() | ((us - prev) > gap_us)
        base = -1 if last_session is None else last_session
        pdf["session_id"] = (base + new_flag.cumsum()).astype("int32")
        last_ts_us = int(us.iloc[-1])
        last_session = int(pdf["session_id"].iloc[-1])
        yield pdf[["conv_id", "turn_idx", "ts", "session_id"]]
    state.update((last_ts_us, last_session))


def stream_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-turn session ids over a transcript stream."""
    gap_us = gap_seconds * MICROS

    def fn(key, pdfs, state):
        return _assign(key, pdfs, state, gap_us)

    return (
        stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
