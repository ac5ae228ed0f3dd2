"""Library facade — the reference's third entry point.

Mirrors ``Reader(data_type, data_path, variables)`` -> ``read_data()``
-> ``get_data()/get_user_data()`` (reference:
radarpipeline/io/reader.py:463-503, accessors at
radarpipeline/datalib/radar_data.py:108-152) with Spark-first
internals: data stays ONE lazy DataFrame per variable; user selection
is a filter (file pruning), never a dict lookup over materialized
frames.
"""

from __future__ import annotations

from functools import reduce
from typing import Dict, List

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from radarpipeline_spark.sources.radar_csv import list_variables, read_radar_dataset


def combine_dataframes(dfs: List[DataFrame]) -> DataFrame:
    """Union-by-name with schema merging (missing columns -> null) —
    the reference's only set operator (reference:
    radarpipeline/common/utils.py:52-69).  Catalyst's CombineUnions
    flattens the left-deep fold into one n-ary union."""
    if not dfs:
        raise ValueError("no dataframes to combine")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


class Reader:
    """Facade over the RADAR-format dataset.

    >>> r = Reader(spark, data_path="/data/radar", variables=["steps"])
    >>> r.read_data()
    >>> df = r.get_data("steps")          # one variable, all users
    >>> df = r.get_user_data("user-1")    # all variables, one user
    """

    def __init__(
        self,
        spark: SparkSession,
        data_path: str,
        data_type: str = "csv",
        variables: List[str] | None = None,
    ) -> None:
        if data_type != "csv":
            raise ValueError(f"unsupported data_type: {data_type}")
        self.spark = spark
        self.data_path = data_path
        self.variables = variables
        self._data: Dict[str, DataFrame] | None = None

    def read_data(self) -> "Reader":
        names = self.variables or list_variables(self.data_path)
        self._data = read_radar_dataset(self.spark, self.data_path, names)
        return self

    def _require(self) -> Dict[str, DataFrame]:
        if self._data is None:
            raise RuntimeError("call read_data() first")
        return self._data

    def get_data(self, variable: str | None = None):
        data = self._require()
        if variable is None:
            return data
        return data[variable]

    def get_user_data(self, user_id: str) -> Dict[str, DataFrame]:
        return {
            v: df.filter(F.col("user_id") == user_id)
            for v, df in self._require().items()
        }

    def get_combined_data_by_variable(
        self, variables: List[str]
    ) -> DataFrame:
        """Schema-merging union across variables (reference:
        radarpipeline/datalib/radar_data.py:52-106)."""
        data = self._require()
        return combine_dataframes([data[v] for v in variables])
