"""Feature sinks (SURVEY.md §2.8: W1-W3).

CSV kept for reference-format compatibility (one folder per feature,
snake_case naming, optional gzip — reference:
radarpipeline/io/writer.py:35-52, naming at 37-38); parquet is the
scale path.  ``num_files`` is honored via coalesce — the reference
accepts the parameter but never uses it (reference:
radarpipeline/io/writer.py:22,32 vs 35-52).
"""

from __future__ import annotations

import re
from typing import Dict

from pyspark.sql import DataFrame


def pascal_to_snake(name: str) -> str:
    """PascalCase/camelCase -> snake_case (reference:
    radarpipeline/common/utils.py:123-137, re-derived)."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    return s.lower()


def write_feature_csv(
    df: DataFrame,
    out_dir: str,
    name: str,
    compress: bool = False,
    num_files: int | None = None,
) -> str:
    path = f"{out_dir.rstrip('/')}/{pascal_to_snake(name)}"
    if num_files:
        df = df.coalesce(num_files)
    writer = df.write.mode("overwrite").option("header", True)
    if compress:
        writer = writer.option("compression", "gzip")
    writer.csv(path)
    return path


def write_features(
    features: Dict[str, DataFrame],
    out_dir: str,
    fmt: str = "parquet",
    compress: bool = False,
) -> Dict[str, str]:
    """Write every feature table; parquet by default (splittable,
    columnar, statistics for pruning — the 100TB path)."""
    out: Dict[str, str] = {}
    for name, df in features.items():
        if fmt == "csv":
            out[name] = write_feature_csv(df, out_dir, name, compress)
        else:
            path = f"{out_dir.rstrip('/')}/{pascal_to_snake(name)}"
            df.write.mode("overwrite").parquet(path)
            out[name] = path
    return out


def write_sorted_features(
    df: DataFrame,
    path: str,
    n_files: int = 64,
    order_cols: tuple = ("conv_id", "turn_idx"),
) -> str:
    """Range-partitioned sorted sink (the north_rule's explicit
    range-partitioned shuffle): repartitionByRange on the stable
    ordering key + sortWithinPartitions, so output files are globally
    range-ordered — byte-stable ordering for text-equality audits and
    min/max file statistics that let readers prune by conv_id range.
    """
    (
        df.repartitionByRange(n_files, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
