import numpy as np
import pandas as pd

KEY = ["conv_id", "turn_idx"]


def aligned(spark_df, oracle_pdf, cols):
    """Return (engine, oracle) pandas frames aligned on (conv_id, turn_idx)."""
    e = spark_df.toPandas().sort_values(KEY, ignore_index=True)
    o = oracle_pdf.sort_values(KEY, ignore_index=True)
    assert len(e) == len(o), f"row count {len(e)} != {len(o)}"
    assert (e["conv_id"].to_numpy() == o["conv_id"].to_numpy()).all()
    assert (e["turn_idx"].to_numpy() == o["turn_idx"].to_numpy()).all()
    return e[cols], o[cols]


def assert_allclose_frames(e: pd.DataFrame, o: pd.DataFrame, rtol=1e-9, atol=1e-12):
    for c in e.columns:
        ev, ov = e[c], o[c]
        if pd.api.types.is_float_dtype(ev) or pd.api.types.is_float_dtype(ov):
            ev = ev.astype(float).to_numpy()
            ov = ov.astype(float).to_numpy()
            nan_match = np.isnan(ev) == np.isnan(ov)
            assert nan_match.all(), f"{c}: NaN placement differs"
            m = ~np.isnan(ev)
            assert np.allclose(ev[m], ov[m], rtol=rtol, atol=atol), (
                f"{c}: values differ; max abs diff "
                f"{np.max(np.abs(ev[m] - ov[m]))}"
            )
        elif pd.api.types.is_datetime64_any_dtype(ev):
            ev = pd.Series(ev).astype("datetime64[us]")
            ov = pd.Series(ov).astype("datetime64[us]")
            assert ev.isna().equals(ov.isna()), f"{c}: null placement differs"
            assert (ev.dropna().to_numpy() == ov.dropna().to_numpy()).all(), c
        else:
            ev = ev.where(pd.notna(ev), None)
            ov = ov.where(pd.notna(ov), None)
            assert (ev.to_numpy() == ov.to_numpy()).all() or ev.equals(ov), c
