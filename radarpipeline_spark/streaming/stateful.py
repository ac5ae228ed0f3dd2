"""Custom stateful streaming operator: incremental per-turn session ids.

``session_window`` (sessionize_stream.py) emits per-session AGGREGATES;
this operator emits every turn with its ``session_id`` assigned
incrementally — the streaming twin of ``operators.sessionize`` — using
``applyInPandasWithState``: per-conversation state carries
(last_ts_us, last_session_id) across micro-batches, and each batch's
rows are processed as one Arrow-backed pandas frame (vectorized, no
per-row Python beyond the group loop Spark itself drives).

Ordering contract: the base operators accept rows unordered WITHIN a
micro-batch (sorted here by turn_idx) but need batches non-overlapping
and in-order per conversation (log-ordered ingestion, the usual Kafka
keyed-partition guarantee).  The ``*_unordered`` variants drop that
contract: a per-conversation reorder buffer in state parks rows until
the event-time watermark passes them, then replays them in event order
— out-of-order across batches up to the watermark delay is fine, and
rows later than the watermark are dropped (append-mode semantics).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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


def _sessionize_pdf(pdf, gap_us, last_ts_us, last_session):
    """Assign incremental session ids to ONE sorted-by-turn frame given
    the carried (last_ts_us, last_session); returns (out, carry').

    Pure-numpy kernel: this function runs once per (conversation,
    micro-batch) — at 15k conversations x 3 batches the per-call pandas
    machinery (sort_values / Series.shift / column assignment) was the
    dominant streaming cost, not the arithmetic (guide §4.2: hand whole
    batches to vectorized code, keep per-call overhead minimal)."""
    import numpy as np

    ti = pdf["turn_idx"].to_numpy()
    ts_vals = pdf["ts"].to_numpy()
    conv = pdf["conv_id"].to_numpy()
    if len(ti) > 1 and not (ti[1:] >= ti[:-1]).all():
        order = np.argsort(ti, kind="stable")
        ti, ts_vals, conv = ti[order], ts_vals[order], conv[order]
    us = ts_vals.astype("datetime64[us]").astype("int64")
    prev = np.empty(len(us), dtype="float64")
    prev[:] = np.nan
    if len(us) > 1:
        prev[1:] = us[:-1]
    if last_ts_us is not None and len(us):
        prev[0] = last_ts_us
    new_flag = np.isnan(prev) | ((us - prev) > gap_us)
    base = -1 if last_session is None else last_session
    sess = (base + np.cumsum(new_flag)).astype("int32")
    out = pd.DataFrame(
        {"conv_id": conv, "turn_idx": ti, "ts": ts_vals, "session_id": sess}
    )
    return out, int(us[-1]), int(sess[-1])


def _assign(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    last_ts_us, last_session = state.get if state.exists else (None, None)
    for pdf in pdfs:
        out, last_ts_us, last_session = _sessionize_pdf(
            pdf, gap_us, last_ts_us, last_session
        )
        yield out
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


WM_SESS_STATE_SCHEMA = StructType(
    [
        StructField("buf_turn", ArrayType(IntegerType()), True),
        StructField("buf_us", ArrayType(LongType()), True),
        StructField("last_ts_us", LongType(), True),
        StructField("last_session", IntegerType(), True),
    ]
)


def _assign_watermarked(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    """Reorder-buffer sessionizer: rows park in state until the event-
    time watermark passes them, then emit in event order — so arrival
    order across micro-batches no longer matters.  Rows older than the
    watermark on ARRIVAL are dropped (append-mode watermark contract:
    emitting them after the frontier passed would rewrite history).

    State size is bounded by the watermark delay x event rate per
    conversation (the rows inside the lateness horizon), not by the
    conversation length."""
    if state.exists:
        buf_turn, buf_us, last_ts_us, last_session = state.get
        buf = list(zip(buf_turn or [], buf_us or []))
    else:
        buf, last_ts_us, last_session = [], None, None
    wm_us = state.getCurrentWatermarkMs() * 1000
    for pdf in pdfs:
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, u in zip(pdf["turn_idx"], us):
            # wm==0 -> no watermark has been established yet: buffer
            if wm_us == 0 or u > wm_us:
                buf.append((int(t), int(u)))
    final = sorted((u, t) for t, u in buf if wm_us > 0 and u <= wm_us)
    keep = [(t, u) for t, u in buf if not (wm_us > 0 and u <= wm_us)]
    outs = []
    if final:
        pdf = pd.DataFrame(
            {
                "conv_id": key[0],
                "turn_idx": pd.array([t for _, t in final], dtype="int32"),
                "ts": pd.to_datetime([u for u, _ in final], unit="us"),
            }
        )
        out, last_ts_us, last_session = _sessionize_pdf(
            pdf, gap_us, last_ts_us, last_session
        )
        outs.append(out)
    state.update(
        (
            [t for t, _ in keep],
            [u for _, u in keep],
            last_ts_us,
            last_session,
        )
    )
    # EventTimeTimeout re-invokes this group (with no new rows) once
    # the watermark passes the earliest buffered event — without it, a
    # group that stops receiving data would never flush its buffer
    if keep:
        state.setTimeoutTimestamp(min(u for _, u in keep) // 1000 + 1)
    return iter(outs)


def stream_sessionize_unordered(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """:func:`stream_sessionize` without the in-order-batches contract:
    rows may arrive out of order ACROSS micro-batches up to the
    ``watermark`` delay (the production Kafka reality — repartitioned
    topics, producer retries).  A per-conversation reorder buffer in
    state holds rows until the event-time watermark passes them; output
    rows then match the batch sessionizer exactly.  Rows later than the
    watermark are dropped, as in ``session_window`` append mode."""
    gap_us = gap_seconds * MICROS

    def fn(key, pdfs, state):
        return _assign_watermarked(key, pdfs, state, gap_us)

    import pyspark.sql.functions as F

    return (
        # watermarks require TIMESTAMP (not NTZ); the engine pins the
        # session timezone to UTC, so the cast is an exact relabel
        stream.select(
            "conv_id", "turn_idx", F.col("ts").cast("timestamp").alias("ts")
        )
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=WM_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


def _carry_asof_pdf(pdf, has_aux, last_us, last_val):
    """Backfill ONE frame (both sides, any order) given the carried
    last-aux state; returns (turn rows with asof value, carry')."""
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
    out = turns[["conv_id", "turn_idx", "ts", "asof_aux_value"]].astype(
        {"turn_idx": "int32"}
    )
    return out, has_aux, last_us, last_val


def _carry_asof(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    has_aux, last_us, last_val = (
        state.get if state.exists else (0, None, None)
    )
    for pdf in pdfs:
        out, has_aux, last_us, last_val = _carry_asof_pdf(
            pdf, has_aux, last_us, last_val
        )
        yield out
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


WM_ASOF_STATE_SCHEMA = StructType(
    [
        StructField("buf_turn", ArrayType(IntegerType()), True),
        StructField("buf_us", ArrayType(LongType()), True),
        StructField("buf_side", ArrayType(IntegerType()), True),
        # NULL aux values ride as NaN (pdf round-trip restores NaN ->
        # NULL semantics inside _carry_asof_pdf's pd.isna checks)
        StructField("buf_aux", ArrayType(DoubleType(), True), True),
        StructField("has_aux", IntegerType(), True),
        StructField("last_aux_us", LongType(), True),
        StructField("last_aux_value", DoubleType(), True),
    ]
)


def _carry_asof_watermarked(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Reorder-buffered as-of carry: BOTH sides (turns and aux) park in
    state until the watermark passes them, then replay through the
    ordered carry in event order — see :func:`_assign_watermarked` for
    the emission/late-drop rules."""
    if state.exists:
        bt, bu, bs, ba, has_aux, last_us, last_val = state.get
        buf = [
            (int(u), int(s), int(t), None if a is None or a != a else float(a))
            for t, u, s, a in zip(bt or [], bu or [], bs or [], ba or [])
        ]
    else:
        buf, has_aux, last_us, last_val = [], 0, None, None
    wm_us = state.getCurrentWatermarkMs() * 1000
    for pdf in pdfs:
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, u, s, a in zip(
            pdf["turn_idx"], us, pdf["side"], pdf["aux_value"]
        ):
            if wm_us == 0 or u > wm_us:
                buf.append(
                    (int(u), int(s), int(t), None if pd.isna(a) else float(a))
                )
    final = sorted(
        (r for r in buf if wm_us > 0 and r[0] <= wm_us),
        key=lambda r: (r[0], r[1], r[2]),  # aux values may be None
    )
    keep = [r for r in buf if not (wm_us > 0 and r[0] <= wm_us)]
    outs = []
    if final:
        pdf = pd.DataFrame(
            {
                "conv_id": key[0],
                "turn_idx": pd.array([t for _, _, t, _ in final], dtype="int32"),
                "ts": pd.to_datetime([u for u, _, _, _ in final], unit="us"),
                "side": pd.array([s for _, s, _, _ in final], dtype="int32"),
                "aux_value": pd.array(
                    [a for _, _, _, a in final], dtype="float64"
                ),
            }
        )
        out, has_aux, last_us, last_val = _carry_asof_pdf(
            pdf, has_aux, last_us, last_val
        )
        outs.append(out)
    state.update(
        (
            [t for _, _, t, _ in keep],
            [u for u, _, _, _ in keep],
            [s for _, s, _, _ in keep],
            [a for _, _, _, a in keep],
            has_aux,
            last_us,
            last_val,
        )
    )
    # flush guarantee — see _assign_watermarked
    if keep:
        state.setTimeoutTimestamp(min(u for u, _, _, _ in keep) // 1000 + 1)
    return iter(outs)


def stream_asof_backfill_unordered(
    union_stream: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """:func:`stream_asof_backfill` without the in-order-batches
    contract: both sides may arrive out of order across micro-batches
    up to ``watermark``; a per-conversation reorder buffer replays them
    in event order once the watermark passes.  Late rows drop."""
    import pyspark.sql.functions as F

    return (
        union_stream.select(
            "conv_id",
            "turn_idx",
            F.col("ts").cast("timestamp").alias("ts"),
            "side",
            "aux_value",
        )
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _carry_asof_watermarked,
            outputStructType=ASOF_OUTPUT_SCHEMA,
            stateStructType=WM_ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


ROLLING_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("ts", TimestampType(), False),
        StructField("inter_turn_latency_s", DoubleType(), True),
        StructField("turns_last_k", LongType(), False),
        StructField("tool_rate_last_k", DoubleType(), False),
        StructField("latency_mean_s", DoubleType(), True),
        StructField("latency_std_s", DoubleType(), True),
        StructField("latency_min_s", DoubleType(), True),
        StructField("latency_max_s", DoubleType(), True),
    ]
)

# bounded per-conversation carry: rows still inside the Δ horizon or the
# (k-1)-row positional tail, plus the running turn count
ROLLING_STATE_SCHEMA = StructType(
    [
        StructField("buf_us", ArrayType(LongType()), True),
        StructField("buf_lat_us", ArrayType(LongType(), True), True),
        StructField("buf_tool", ArrayType(IntegerType()), True),
        StructField("n_seen", LongType(), True),
    ]
)


def _rolling_batch(pdf, buf_us, buf_lat, buf_tool, n_seen, k, d_us):
    """Vectorized trailing-window features over (carried buffer ++ new
    batch), numerically identical to the batch operators:

    * exact integer-microsecond sums (the same 2^21 limb split as
      operators/rolling.py, combined exactly via python-int
      (object-dtype) arithmetic at the end — mirroring the engine's
      decimal(38) combine), finished with the engine's own double
      expressions and HALF_UP quantization to integer micros;
    * range frames are [ts-Δ, ts] by VALUE — whole timestamp-tie
      groups ride in every member's frame, reproduced by evaluating at
      each tie group's last member (groupby-transform('last'));
    * row frames are positional (no tie adjustment), count capped by
      the conversation's total ``n_seen``.
    """
    import numpy as np

    # Pure-numpy kernel (guide §4.2): runs once per (conversation,
    # micro-batch), so per-call pandas machinery (sort_values, Series
    # rolling with a Timedelta window, 4x groupby-transform tie fix,
    # per-row python-int loops) dominated wall time at 10k+ small
    # groups — measured 4.5ms/call for a 22-row group, ~8x the numpy
    # path.  The math is unchanged: windows are evaluated directly at
    # each tie group's END index (what the transform("last") fix used
    # to patch in afterwards), and the exact integer frame sums use
    # int64 whenever a proven-safe bound holds, falling back to the
    # original python-int path beyond it (bit-identical either way).
    ti = pdf["turn_idx"].to_numpy()
    ts_vals = pdf["ts"].to_numpy()
    conv = pdf["conv_id"].to_numpy()
    tool_new = pd.notna(pdf["tool"].to_numpy()).astype("int64")
    if len(ti) > 1 and not (ti[1:] >= ti[:-1]).all():
        order = np.argsort(ti, kind="stable")
        ti, ts_vals, conv = ti[order], ts_vals[order], conv[order]
        tool_new = tool_new[order]
    new_us = ts_vals.astype("datetime64[us]").astype("int64")
    m = len(buf_us)
    n = m + len(new_us)
    all_us = np.empty(n, dtype="int64")
    all_us[:m] = buf_us
    all_us[m:] = new_us
    # latency: diff against the previous turn (carried across batches)
    prev = np.empty(len(new_us), dtype="float64")
    prev[:] = np.nan
    if len(new_us):
        prev[1:] = new_us[:-1]
        prev[0] = all_us[m - 1] if m > 0 or n_seen > 0 else np.nan
        if m == 0 and n_seen == 0:
            prev[0] = np.nan
    new_lat = new_us - prev  # nan at conversation start
    lat_all = np.empty(n, dtype="float64")
    lat_all[:m] = [np.nan if v is None else float(v) for v in buf_lat]
    lat_all[m:] = new_lat
    tool_all = np.empty(n, dtype="int64")
    tool_all[:m] = buf_tool
    tool_all[m:] = tool_new
    mask = ~np.isnan(lat_all)
    lat_i = np.where(mask, lat_all, 0.0).astype("int64")
    a = lat_i >> 21
    b = lat_i - (a << 21)
    pad = lambda x: np.concatenate([[0], np.cumsum(x)])  # noqa: E731
    cn, cs = pad(mask.astype("int64")), pad(lat_i)
    c2, c1, c0 = pad(a * a), pad(2 * a * b), pad(b * b)
    ct = pad(tool_all)

    j = np.arange(n)
    start = np.searchsorted(all_us, all_us - d_us, side="left")
    end = np.searchsorted(all_us, all_us, side="right")  # tie-group end
    nf = cn[end] - cn[start]
    s_i = cs[end] - cs[start]
    # exact integer frame sums: int64 throughout when the products
    # provably fit (nf_max*|lat|_max < 2^31 keeps nf*ssq and s^2 under
    # 2^62 — see the limb identity lat^2 = (a<<21+b)^2), else the
    # original python-int (object dtype) combine
    nf_max = int(nf.max(initial=0))
    lat_abs = int(max(lat_i.max(initial=0), -int(lat_i.min(initial=0))))
    if nf_max * lat_abs < (1 << 31):
        ssq_i = (
            ((c2[end] - c2[start]) << 42)
            + ((c1[end] - c1[start]) << 21)
            + (c0[end] - c0[start])
        )
        var_num = (nf * ssq_i - s_i * s_i).astype("float64")
        s_f = s_i.astype("float64")
    else:
        s_o = s_i.astype(object)
        ssq_o = (
            (c2[end] - c2[start]).astype(object) * (1 << 42)
            + (c1[end] - c1[start]).astype(object) * (1 << 21)
            + (c0[end] - c0[start]).astype(object)
        )
        var_num = np.array(
            [float(int(nn) * q - ss * ss) for nn, q, ss in zip(nf, ssq_o, s_o)],
            dtype="float64",
        )
        s_f = np.array([float(x) for x in s_o], dtype="float64")
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = np.where(
            nf > 0,
            np.floor(s_f / np.maximum(nf, 1) + 0.5) / 1e6,
            np.nan,
        )
        var_den = (nf * (nf - 1)).astype("float64")
        std = np.where(
            nf >= 2,
            np.floor(np.sqrt(var_num / np.maximum(var_den, 1)) + 0.5) / 1e6,
            np.nan,
        )
    lat_s = lat_all / 1e6
    # min/max over the same [start, end) value frames via a sparse
    # table (vectorized range-min query; NaNs ride as +/-inf and
    # all-NaN frames fall back to NaN through the nf>0 gate) — replaces
    # pandas Series.rolling(Timedelta) + the tie-group transform pass
    vmin = np.where(mask, lat_s, np.inf)
    vmax = np.where(mask, lat_s, -np.inf)
    if n:
        nlev = max(int(n).bit_length() - 1, 0) + 1
        t_min = np.full((nlev, n), np.inf)
        t_max = np.full((nlev, n), -np.inf)
        t_min[0], t_max[0] = vmin, vmax
        for lev in range(1, nlev):
            h = 1 << (lev - 1)
            w_ = n - (1 << lev) + 1
            if w_ <= 0:
                break
            t_min[lev, :w_] = np.minimum(
                t_min[lev - 1, :w_], t_min[lev - 1, h:h + w_]
            )
            t_max[lev, :w_] = np.maximum(
                t_max[lev - 1, :w_], t_max[lev - 1, h:h + w_]
            )
        ln = end - start  # >= 1: every frame contains its own row
        kk = np.frexp(ln.astype("float64"))[1] - 1  # floor(log2(ln))
        hi = end - (1 << kk)
        mn = np.where(
            nf > 0,
            np.minimum(t_min[kk, start], t_min[kk, hi]),
            np.nan,
        )
        mx = np.where(
            nf > 0,
            np.maximum(t_max[kk, start], t_max[kk, hi]),
            np.nan,
        )
    else:
        mn = mx = np.empty(0, dtype="float64")

    pos = n_seen - m + j  # 0-based position within the conversation
    w = np.minimum(k, pos + 1)
    lo = j + 1 - np.minimum(w, j + 1)
    rate = (ct[j + 1] - ct[lo]) / w.astype("float64")

    sl = slice(m, n)
    out = pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": ti,
            "ts": ts_vals,
            "inter_turn_latency_s": lat_s[sl],
            "turns_last_k": w[sl].astype("int64"),
            "tool_rate_last_k": rate[sl],
            "latency_mean_s": mean[sl],
            "latency_std_s": std[sl],
            "latency_min_s": mn[sl],
            "latency_max_s": mx[sl],
        }
    )

    # retention: Δ horizon ∪ last k-1 rows ∪ the last row (latency)
    keep_from = int(
        min(
            np.searchsorted(all_us, all_us[-1] - d_us, side="left"),
            max(n - (k - 1), 0),
            n - 1,
        )
    )
    return (
        out,
        [int(x) for x in all_us[keep_from:]],
        [None if not mk else int(v) for v, mk in
         zip(lat_i[keep_from:], mask[keep_from:])],
        [int(x) for x in tool_all[keep_from:]],
        int(n_seen + len(new_us)),
    )


def stream_rolling_features(
    stream: DataFrame,
    last_k: int = 10,
    range_seconds: int = 300,
) -> DataFrame:
    """Streaming twin of ``lag_lead_features`` + ``rolling_features``:
    per-turn inter-turn latency, last-k row-frame features, and the
    exact deterministic Δ-second latency stats, carried across
    micro-batches with a BOUNDED per-conversation state (rows inside
    the Δ horizon plus the k-1 positional tail — not the conversation
    history).  Same ordering contract as :func:`stream_sessionize`;
    timestamp-tie groups must not split across batches (a tie member's
    range frame includes later members by value).

    Outputs match the batch operators bit-for-bit (pytest-pinned)."""
    d_us = range_seconds * MICROS

    def fn(key, pdfs, state):
        if state.exists:
            b_us, b_lat, b_tool, n_seen = state.get
            b_us, b_lat, b_tool = list(b_us), list(b_lat), list(b_tool)
        else:
            b_us, b_lat, b_tool, n_seen = [], [], [], 0
        for pdf in pdfs:
            out, b_us, b_lat, b_tool, n_seen = _rolling_batch(
                pdf, b_us, b_lat, b_tool, n_seen, last_k, d_us
            )
            yield out
        state.update((b_us, b_lat, b_tool, n_seen))

    return (
        stream.select("conv_id", "turn_idx", "ts", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ROLLING_OUTPUT_SCHEMA,
            stateStructType=ROLLING_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
