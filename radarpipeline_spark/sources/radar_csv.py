"""RADAR-format dataset source: CSV directory scan + Avro schema-on-read.

Reads the reference's on-disk layout (reference:
radarpipeline/io/reader.py:128-156)::

    <root>/<user_id>/<variable>/*.csv.gz        (+ schema-<variable>.json)

but Spark-first: ONE scan per variable across every user (glob path +
``input_file_name()`` to recover the user id) instead of the reference's
one-DataFrame-per-(user, variable) loop followed by an N-way union
(reference: radarpipeline/datalib/radar_data.py:94-101).  Catalyst sees
a single relation, so user filters prune files and column selection
prunes the CSV parse.

Schema handling re-implements the reference's semantics from scratch:

* Kafka-connect Avro JSON (``schema-<variable>.json``) flattened to
  literal dotted column names ``key.<field>`` / ``value.<field>``
  (reference: radarpipeline/io/reader.py:238-270);
* union types resolved by a widening lattice — drop ``null``, widen
  within integer family (long > int > short > byte) and float family
  (double > float); any cross-family conflict degrades to string
  (reference: radarpipeline/io/reader.py:391-460);
* ``array``/unknown types degrade to string
  (reference: radarpipeline/common/constants.py:25-37);
* missing schema file -> Spark's native inferSchema
  (reference: radarpipeline/io/reader.py:190-196).

Timestamp columns (``value.time``, ``value.timeReceived``,
``value.dateTime``: epoch-seconds doubles) are normalized to full-
resolution TimestampType — the pandas-path semantics; the reference's
Spark path day-truncates via ``to_date``, a known divergence its golden
outputs don't follow (reference: radarpipeline/datalib/
radar_variable_data.py:37-67, SURVEY.md §1.2).
"""

from __future__ import annotations

import glob
import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

TIME_COLUMNS = ("value.time", "value.timeReceived", "value.dateTime")

_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "byte": ByteType(),
    "short": ShortType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "char": StringType(),
    "enum": StringType(),
    # arrays and anything unknown degrade to string, like the reference
    "array": StringType(),
}

_INT_ORDER = [ByteType(), ShortType(), IntegerType(), LongType()]
_FLOAT_ORDER = [FloatType(), DoubleType()]


def superior_type(types: list[DataType]) -> DataType:
    """Widening-lattice union resolution.  Widening happens only WITHIN
    the integer or float family; ANY cross-family mix (including
    int+float) is a potentially-lossy conflict and degrades to string —
    the reference's exact rule (reference:
    radarpipeline/io/reader.py:406-460)."""
    uniq = {t for t in types}
    if len(uniq) == 1:
        return next(iter(uniq))
    if uniq <= set(_INT_ORDER):
        return max(uniq, key=_INT_ORDER.index)
    if uniq <= set(_FLOAT_ORDER):
        return max(uniq, key=_FLOAT_ORDER.index)
    return StringType()


def _avro_type_to_spark(t) -> DataType:
    """Resolve one Avro type node (primitive, record-less dict, union)."""
    if isinstance(t, str):
        return _PRIMITIVES.get(t, StringType())
    if isinstance(t, dict):
        return _PRIMITIVES.get(t.get("type", ""), StringType())
    if isinstance(t, list):  # union
        resolved = [
            _avro_type_to_spark(x) for x in t if x != "null" and x is not None
        ]
        if not resolved:
            return StringType()
        return superior_type(resolved)
    return StringType()


def read_avro_schema(path: str) -> StructType:
    """Flatten a Kafka-connect Avro key/value record schema into a
    StructType with literal dotted names (``key.userId`` etc.)."""
    with open(path) as f:
        schema = json.load(f)
    fields: list[StructField] = []
    for part in schema.get("fields", []):
        part_name = part["name"]  # "key" | "value"
        part_type = part["type"]
        if isinstance(part_type, dict) and part_type.get("type") == "record":
            for sub in part_type.get("fields", []):
                fields.append(
                    StructField(
                        f"{part_name}.{sub['name']}",
                        _avro_type_to_spark(sub["type"]),
                        True,
                    )
                )
        else:
            fields.append(
                StructField(part_name, _avro_type_to_spark(part_type), True)
            )
    return StructType(fields)


def _find_schema_file(root: str, variable: str) -> str | None:
    hits = glob.glob(os.path.join(root, "*", variable, f"schema-{variable}.json"))
    return hits[0] if hits else None


def list_variables(root: str) -> list[str]:
    """All variable names present under any user directory."""
    out = set()
    for user_dir in sorted(glob.glob(os.path.join(root, "*"))):
        if os.path.isdir(user_dir):
            for var_dir in sorted(glob.glob(os.path.join(user_dir, "*"))):
                if os.path.isdir(var_dir) and glob.glob(
                    os.path.join(var_dir, "*.csv*")
                ):
                    out.add(os.path.basename(var_dir))
    return sorted(out)


def read_radar_variable(
    spark: SparkSession,
    root: str,
    variable: str,
    users: list[str] | None = None,
    normalize_time: bool = True,
) -> DataFrame:
    """One distributed DataFrame for a variable across all (or selected)
    users, with a ``user_id`` column recovered from the file path."""
    schema_file = _find_schema_file(root, variable)
    reader = spark.read.option("header", True)
    schema = read_avro_schema(schema_file) if schema_file else None
    matched = [
        p
        for u in (users or ["*"])
        for p in glob.glob(os.path.join(root, u, variable, "*.csv*"))
    ]
    if not matched:
        # empty-input elision: selected users/variable have no files ->
        # empty frame, not a read error (reference skips empty frames,
        # reference: radarpipeline/io/reader.py:154-155)
        from pyspark.sql.types import StringType, StructField, StructType

        base = schema or StructType([StructField("value", StringType(), True)])
        empty = spark.createDataFrame([], base)
        return empty.withColumn("user_id", F.lit(None).cast("string"))
    if schema is not None:
        df = reader.schema(schema).csv(matched)
    else:
        df = reader.option("inferSchema", True).csv(matched)
    # user id = path segment above the variable directory
    df = df.withColumn(
        "user_id", F.element_at(F.split(F.input_file_name(), "/"), -3)
    )
    if normalize_time:
        for c in TIME_COLUMNS:
            if c in df.columns:
                # literal dotted names need backticks or F.col parses a
                # struct access
                df = df.withColumn(c, F.timestamp_seconds(F.col(f"`{c}`")))
    return df


def read_radar_dataset(
    spark: SparkSession,
    root: str,
    variables: list[str] | None = None,
    users: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Variable name -> DataFrame (the reference's RadarData collapsed
    to one relation per variable; variable pruning = reading only the
    requested names, reference: project/project.py:194-215)."""
    names = variables if variables is not None else list_variables(root)
    return {v: read_radar_variable(spark, root, v, users) for v in names}
