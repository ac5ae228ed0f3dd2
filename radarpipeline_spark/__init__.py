"""radarpipeline_spark — a PySpark-native feature-engineering engine.

A from-scratch reimplementation of the *capabilities* of
RADAR-base/radarpipeline (reference at /root/reference), re-expressed
Spark-first: point-in-time / as-of joins, gap-based sessionization,
lag/lead turn features and rolling window aggregates over tables of
multi-turn conversation transcripts
(conv_id:string, turn_idx:int, role:string, text:string, tool:string, ts:timestamp).

Where the reference runs opaque pandas plugins on the driver
(reference: radarpipeline/features/feature_group.py:59-72), this engine
declares every feature as a Catalyst expression over DataFrames so the
optimizer handles pruning, pushdown and whole-stage codegen; Python
appears only inside Arrow-vectorized pandas UDFs (never per-row).
"""

from radarpipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
