"""Transcript table sources.

The engine's input shape (BASELINE.json:input_hint) is a table of
multi-turn conversation transcripts::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp

Two deterministic sources are provided:

* :func:`transcripts_from_events` — derives transcripts from the
  driver-generated ``events`` parquet table with transformations that
  are expressible identically in ANSI SQL, so every downstream operator
  gets a DuckDB oracle (``TRANSCRIPTS_SQL`` is that oracle CTE).
* :func:`synthesize_transcripts` — a pure-function-of-(seed, id)
  generator built on ``spark.range`` for arbitrary-scale benchmarks,
  with heavy-tailed conversation lengths to exercise skew handling.
  (The reference instead git-clones a mock dataset,
  reference: project/project.py:237-254.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# ANSI-SQL twin of transcripts_from_events(); runnable by DuckDB on the
# pre-registered `events` view.  Any change here MUST be mirrored below.
TRANSCRIPTS_SQL = """
SELECT
  'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
  CASE WHEN event_type IN ('click', 'view') THEN 'user'
       WHEN event_type = 'error' THEN 'tool'
       ELSE 'assistant' END AS role,
  event_type || '#' || CAST(event_id AS VARCHAR) || '#'
             || coalesce(props, '') AS text,
  CASE WHEN event_type = 'error' THEN 'exec'
       WHEN event_type = 'purchase' THEN 'search'
       ELSE NULL END AS tool,
  ts
FROM events
"""

# ANSI-SQL twin of aux_signals_from_events() — the sparse right side of
# the as-of join (latest purchase value at-or-before each turn).
AUX_SIGNALS_SQL = """
SELECT
  'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
  ts,
  value AS aux_value
FROM events
WHERE event_type = 'purchase'
"""


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Deterministically reshape the ``events`` table into transcripts.

    conv_id is derived FIRST so the row_number window hash-partitions on
    the same key every downstream window uses — Catalyst's
    EnsureRequirements then reuses this single exchange for the whole
    feature plan instead of re-shuffling per operator.
    """
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return (
        events.withColumn(
            "conv_id",
            F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0")),
        )
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select(
            "conv_id",
            "turn_idx",
            F.when(F.col("event_type").isin("click", "view"), "user")
            .when(F.col("event_type") == "error", "tool")
            .otherwise("assistant")
            .alias("role"),
            # concat (not concat_ws): NULL-propagating like SQL '||',
            # with props explicitly coalesced — keeps the DuckDB twin
            # bit-identical under NULL props/event_type alike
            F.concat(
                F.col("event_type"),
                F.lit("#"),
                F.col("event_id").cast("string"),
                F.lit("#"),
                F.coalesce(F.col("props"), F.lit("")),
            ).alias("text"),
            F.when(F.col("event_type") == "error", "exec")
            .when(F.col("event_type") == "purchase", "search")
            .alias("tool"),
            "ts",
        )
    )


def transcripts_from_radar(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "value.time",
) -> DataFrame:
    """Adapt a RADAR variable frame (``read_radar_variable``) to the
    transcript schema: conversation = participant, turn = one record
    ordered by its sensor timestamp.  Lets the CLI run the feature
    engine directly over the reference's CSV layout
    (reference: radarpipeline/io/reader.py:100-160 produces the same
    per-variable frames this consumes)."""
    w = Window.partitionBy(user_col).orderBy(F.col(f"`{time_col}`"))
    return df.select(
        F.col(user_col).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col(f"`{time_col}`").alias("ts"),
    )


def aux_signals_from_events(events: DataFrame) -> DataFrame:
    """Sparse per-conversation signal (purchase value) for as-of backfill."""
    return events.filter(F.col("event_type") == "purchase").select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0")).alias(
            "conv_id"
        ),
        "ts",
        F.col("value").alias("aux_value"),
    )


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    skew_convs: int = 2,
    skew_len: int = 50_000,
    base_epoch: int = 1_704_067_200,  # 2024-01-01T00:00:00Z
    dense_skew: bool = False,
) -> DataFrame:
    """Seeded synthetic transcripts at arbitrary scale.

    Every column is a pure function of ``(seed, conv, turn)`` so any
    scale factor reproduces byte-identical rows (the determinism
    contract in FIXTURES.md §1).  Conversation lengths are 2-33 turns
    for the bulk plus ``skew_convs`` conversations of ``skew_len`` turns
    (the "one participant with 10^8 rows" case the window chunker must
    survive).  Inter-turn gaps mix seconds-scale with >30min outliers so
    gap-sessionization splits are exercised.

    Executes distributed: range -> per-conv length -> explode(sequence)
    -> cumulative-gap timestamps via one window sum.  No driver loops.
    """
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731
    convs = (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv")
        .withColumn(
            "conv_len",
            F.when(F.col("conv") < F.lit(skew_convs), F.lit(skew_len))
            .otherwise(F.pmod(h(F.col("conv")), F.lit(32)) + 2)
            .cast("int"),
        )
    )
    turns = convs.select(
        "conv",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    )
    # gap: 1-599s normally; every 37th draw is a 35-minute session break.
    # dense_skew=True gives the SKEWED conversations 1-3s gaps instead —
    # a trailing 300s range frame then holds ~100-300 turns, the
    # frame-replay pathology the prefix/chunked rolling paths exist for
    # (default gaps average ~300s, so frames hold ~1 row and sliding
    # replay is accidentally cheap).  Non-skewed rows are unchanged.
    draw = F.pmod(h(F.col("conv"), F.col("turn_idx")), F.lit(10_000))
    normal_gap = F.when(draw % 37 == 0, F.lit(2100)).otherwise(draw % 599 + 1)
    if dense_skew:
        normal_gap = F.when(
            F.col("conv") < F.lit(skew_convs), draw % 3 + 1
        ).otherwise(normal_gap)
    gap_s = F.when(F.col("turn_idx") == 0, F.lit(0)).otherwise(normal_gap)
    w = Window.partitionBy("conv").orderBy("turn_idx")
    role_draw = F.pmod(h(F.col("conv"), F.col("turn_idx"), F.lit(1)), F.lit(6))
    tool_draw = F.pmod(h(F.col("conv"), F.col("turn_idx"), F.lit(2)), F.lit(4))
    return (
        turns.withColumn("gap_s", gap_s)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(base_epoch)
                + F.col("conv") * 7919  # stagger conversation starts
                + F.sum("gap_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
            ),
        )
        .select(
            F.concat(F.lit("conv-"), F.lpad(F.col("conv").cast("string"), 8, "0")).alias(
                "conv_id"
            ),
            F.col("turn_idx").cast("int"),
            F.when(role_draw <= 2, "user")
            .when(role_draw <= 4, "assistant")
            .otherwise("tool")
            .alias("role"),
            F.concat_ws(
                ":",
                F.lit("t"),
                F.col("conv").cast("string"),
                F.col("turn_idx").cast("string"),
                F.hex(h(F.col("conv"), F.col("turn_idx"), F.lit(3))),
            ).alias("text"),
            F.when(role_draw == 5, F.element_at(
                F.array(F.lit("search"), F.lit("exec"), F.lit("read"), F.lit("write")),
                (tool_draw + 1).cast("int"),
            )).alias("tool"),
            "ts",
        )
    )
