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
    DoubleType,
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


ASOF_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("ts", TimestampType(), False),
        StructField("asof_aux_value", DoubleType(), True),
    ]
)

# (has_aux, last_aux_us, last_aux_value): the whole LAST aux row is
# carried atomically — has_aux distinguishes "no aux seen yet" from
# "last aux row had a NULL value" (merge_asof semantics, matching the
# batch operator's packed-struct carry)
ASOF_STATE_SCHEMA = StructType(
    [
        StructField("has_aux", IntegerType(), True),
        StructField("last_aux_us", LongType(), True),
        StructField("last_aux_value", DoubleType(), True),
    ]
)


def _carry_asof(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    has_aux, last_us, last_val = (
        state.get if state.exists else (0, None, None)
    )
    for pdf in pdfs:
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        # aux rows sort BEFORE turn rows at equal ts (side 0 < 1) —
        # the batch union trick's tie rule
        pdf = (
            pdf.assign(__us=us)
            .sort_values(["__us", "side"], ignore_index=True)
        )
        is_aux = pdf["side"].to_numpy() == 0
        # positional last-aux carry, atomic w.r.t. NULL values: track
        # the INDEX of the last aux row, not its (possibly-NaN) value
        idx = pd.Series(pd.array(range(len(pdf)), dtype="Int64"))
        last_aux_idx = idx.where(is_aux).ffill()
        carried = pd.Series([None] * len(pdf), dtype="float64")
        mask = last_aux_idx.notna()
        carried[mask.to_numpy()] = (
            pdf["aux_value"].to_numpy()[
                last_aux_idx[mask].astype(int).to_numpy()
            ]
        )
        if has_aux:
            pre = last_aux_idx.isna()
            carried[pre.to_numpy()] = last_val
        turns = pdf.loc[~is_aux].copy()
        turns["asof_aux_value"] = carried[~is_aux]
        if is_aux.any():
            last_aux = pdf.loc[is_aux].iloc[-1]
            has_aux = 1
            last_us = int(last_aux["__us"])
            v = last_aux["aux_value"]
            last_val = None if pd.isna(v) else float(v)
        yield turns[["conv_id", "turn_idx", "ts", "asof_aux_value"]].astype(
            {"turn_idx": "int32"}
        )
    state.update((has_aux, last_us, last_val))


def stream_asof_backfill(union_stream: DataFrame) -> DataFrame:
    """Streaming as-of backfill (the batch ``asof_join`` twin): latest
    aux value at-or-before each turn, carried across micro-batches.

    Input: ONE keyed stream unioning both sides —
    ``(conv_id, turn_idx, ts, side, aux_value)`` with ``side=0`` for
    aux rows (turn_idx ignored) and ``side=1`` for turn rows
    (aux_value ignored).  Unioning is the streaming analogue of the
    batch union trick and avoids a stream-stream join's buffering.

    Same ordering contract as :func:`stream_sessionize`: rows may be
    unordered within a micro-batch, batches are in-order per
    conversation.
    """
    return (
        union_stream.select("conv_id", "turn_idx", "ts", "side", "aux_value")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _carry_asof,
            outputStructType=ASOF_OUTPUT_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
