"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf dir, then compares
row count, column-name set, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified with float
normalization).  Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from radarpipeline_spark import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-strict canonicalization: columns sorted by name, every cell
    stringified (dtype-sensitive: int64 141 -> '141', float64 -> '141.0',
    and a 1-ulp float difference changes the string), rows sorted.

    Round 1 lesson: a lax compare (round6 + rtol) passed queries the
    driver's value hash failed (DuckDB HUGEINT -> float64 dtype drift,
    windowed-sum ulp flips).  Bit-identical-after-stringify is the bar.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    s = df.astype(str)
    s = s.sort_values(list(s.columns), ignore_index=True)
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:>20}: rows={len(spark_pdf)} (no oracle — rows-only)")
            continue
        duck_pdf = con.execute(oracles[name]).fetchdf()
        a, b = canon(spark_pdf), canon(duck_pdf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            neq = (a != b)
            if not neq.to_numpy().any():
                ok_vals = True
            else:
                bad_cols = [c for c in a.columns if neq[c].any()]
                idx = neq.any(axis=1)
                print(
                    f"--- {name} diff cols={bad_cols}"
                    f" nrows={int(idx.sum())} sample:\n"
                    f"{a.loc[idx, bad_cols].head(3)}\nvs\n"
                    f"{b.loc[idx, bad_cols].head(3)}"
                )
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"{name:>20}: {status} rows {len(a)}/{len(b)}"
                f" cols {list(a.columns) if not ok_cols else 'match'}"
                f" vs {list(b.columns) if not ok_cols else ''}"
            )
        else:
            print(f"{name:>20}: OK rows={len(a)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
