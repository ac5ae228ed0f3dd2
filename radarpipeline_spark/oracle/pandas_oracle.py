"""Single-process pandas reference implementations ("the oracle").

Plays the role the golden CSVs play in the reference
(reference: tests/resources/expected_output/, compared sorted in
tests/test_integration/test_integration.py:30-52): an independent,
trivially-auditable implementation of every feature, against which the
distributed engine must agree `allclose` at each (conv_id, turn_idx, ts).

Everything here is deliberately naive pandas — per-group loops are fine;
clarity over speed.  Timestamps are handled as int64 microseconds to
match the engine's integer-exact semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MICROS = 1_000_000


def _us(s: pd.Series) -> pd.Series:
    return s.astype("datetime64[us]").astype("int64")


def _sorted(t: pd.DataFrame) -> pd.DataFrame:
    return t.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _round_half_up(x: float) -> int:
    """Mirror Spark's ``round(double, 0)`` exactly: HALF_UP (away from
    zero) applied to the double's SHORTEST decimal representation —
    Spark's Round goes through Scala BigDecimal.decimal(d) (==
    java BigDecimal.valueOf == Double.toString shortest form), and
    Python ``repr(float)`` is the same shortest-decimal algorithm."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _lat_stats_exact(vals: np.ndarray) -> tuple[float, float]:
    """Windowed latency mean/std EXACTLY as the engine computes them
    (operators/rolling.py finish_lat_stats): recover integer micros per
    value, take exact integer sums (order-independent), do the one
    IEEE double division both engines share, and quantize to integer
    micros BEFORE dividing by 1e6.  A float-summed ``vals.mean()``
    quantized after the fact can land an ulp below a 0.5 µs half (n=2
    windows with odd total micros) and flip the rounded value — the
    exact cross-engine failure rolling.py documents."""
    import math

    lat_us = [_round_half_up(v * MICROS) for v in vals]
    n, s = len(lat_us), sum(lat_us)
    ssq = sum(v * v for v in lat_us)
    # engine: sum_us.cast(double) / n.cast(double) — round each operand
    # to double FIRST (matches Spark's cast order, not exact-rational /)
    mean = _round_half_up(float(s) / float(n)) / MICROS
    if n < 2:
        return mean, np.nan
    var = float(n * ssq - s * s) / float(n * (n - 1))
    std = _round_half_up(math.sqrt(var)) / MICROS
    return mean, std


def oracle_sessionize(t: pd.DataFrame, gap_seconds: int = 1800) -> pd.DataFrame:
    t = _sorted(t).copy()
    us = _us(t["ts"])
    prev = us.groupby(t["conv_id"]).shift(1)
    new_s = (prev.isna() | ((us - prev) > gap_seconds * MICROS)).astype("int64")
    t["session_id"] = (new_s.groupby(t["conv_id"]).cumsum() - 1).astype("int32")
    return t


def oracle_lag_lead(t: pd.DataFrame) -> pd.DataFrame:
    t = _sorted(t).copy()
    g = t.groupby("conv_id")
    t["prev_ts"] = g["ts"].shift(1)
    t["next_ts"] = g["ts"].shift(-1)
    t["inter_turn_latency_s"] = (_us(t["ts"]) - _us(t["prev_ts"])) / MICROS
    t.loc[t["prev_ts"].isna(), "inter_turn_latency_s"] = np.nan
    t["prev_role"] = g["role"].shift(1)
    return t


def oracle_rolling(
    t: pd.DataFrame, last_k: int = 10, range_seconds: int = 300
) -> pd.DataFrame:
    """Requires inter_turn_latency_s (run oracle_lag_lead first)."""
    t = _sorted(t).copy()
    k, d = last_k, range_seconds
    out_cols = {
        f"turns_last_{k}": [], f"tool_rate_last_{k}": [],
        f"latency_mean_{d}s": [], f"latency_std_{d}s": [],
        f"latency_min_{d}s": [], f"latency_max_{d}s": [],
    }
    for _, grp in t.groupby("conv_id", sort=False):
        us = _us(grp["ts"]).to_numpy()
        tool = grp["tool"].notna().to_numpy().astype(float)
        lat = grp["inter_turn_latency_s"].to_numpy(dtype=float)
        n = len(grp)
        for i in range(n):
            lo = max(0, i - (k - 1))
            out_cols[f"turns_last_{k}"].append(i - lo + 1)
            out_cols[f"tool_rate_last_{k}"].append(tool[lo : i + 1].mean())
            # time frame: rows with us in [us[i]-d*1e6, us[i]] (any order)
            mask = (us >= us[i] - d * MICROS) & (us <= us[i])
            vals = lat[mask]
            vals = vals[~np.isnan(vals)]
            if len(vals) == 0:
                m = s = mn = mx = np.nan
            else:
                # exact integer-micros sums + the engine's own final
                # double expressions — see _lat_stats_exact
                m, s = _lat_stats_exact(vals)
                mn, mx = vals.min(), vals.max()
            out_cols[f"latency_mean_{d}s"].append(m)
            out_cols[f"latency_std_{d}s"].append(s)
            out_cols[f"latency_min_{d}s"].append(mn)
            out_cols[f"latency_max_{d}s"].append(mx)
    for c, v in out_cols.items():
        t[c] = v
    t[f"turns_last_{k}"] = t[f"turns_last_{k}"].astype("int64")
    return t


def oracle_asof_backfill(
    t: pd.DataFrame, aux: pd.DataFrame, prefix: str = "asof_"
) -> pd.DataFrame:
    """Backward as-of with exact matches, per conv_id; naive scan."""
    t = _sorted(t).copy()
    vcols = [c for c in aux.columns if c not in ("conv_id", "ts")]
    aux = aux.sort_values(["conv_id", "ts"], ignore_index=True)
    by_conv = {k: g for k, g in aux.groupby("conv_id", sort=False)}
    for c in vcols:
        vals = []
        for conv, ts in zip(t["conv_id"], t["ts"]):
            g = by_conv.get(conv)
            if g is None:
                vals.append(np.nan)
                continue
            elig = g[g["ts"] <= ts]
            vals.append(elig[c].iloc[-1] if len(elig) else np.nan)
        t[f"{prefix}{c}"] = vals
    return t


def oracle_session_stats(t: pd.DataFrame, gap_seconds: int = 1800) -> pd.DataFrame:
    s = oracle_sessionize(t, gap_seconds)
    us = _us(s["ts"])
    s = s.assign(_us=us, _tool=s["tool"].notna().astype("int64"))
    out = (
        s.groupby(["conv_id", "session_id"], sort=False)
        .agg(
            n_turns=("turn_idx", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            _us_min=("_us", "min"),
            _us_max=("_us", "max"),
            n_tool_calls=("_tool", "sum"),
        )
        .reset_index()
    )
    out["duration_s"] = (out["_us_max"] - out["_us_min"]) / MICROS
    return out.drop(columns=["_us_min", "_us_max"])


def oracle_feature_vector(
    t: pd.DataFrame,
    aux: pd.DataFrame | None = None,
    gap_seconds: int = 1800,
    last_k: int = 10,
    range_seconds: int = 300,
) -> pd.DataFrame:
    out = oracle_sessionize(t, gap_seconds)
    out = oracle_lag_lead(out)
    out = oracle_rolling(out, last_k, range_seconds)
    if aux is not None:
        out = oracle_asof_backfill(out, aux)
    return out
