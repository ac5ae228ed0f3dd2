"""Timestamp helpers.

The reference carries time as epoch-seconds doubles and converts with
``to_date`` (day-truncating!) on the Spark path vs ``to_datetime``
(full resolution) on the pandas path — a real semantic divergence
(reference: radarpipeline/datalib/radar_variable_data.py:37-67).
This engine is microsecond-exact everywhere: one helper produces
epoch-microsecond BIGINTs for window arithmetic, accepting both
TIMESTAMP and TIMESTAMP_NTZ inputs (parquet files written without
UTC-adjustment read as NTZ under Spark 4).

All engine entry points pin ``spark.sql.session.timeZone=UTC`` so the
NTZ->LTZ cast below is the identity on the epoch axis; differences
(gaps, latencies, range frames) are additionally tz-invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def ts_us(col: Column | str) -> Column:
    """Epoch microseconds as BIGINT from TIMESTAMP or TIMESTAMP_NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
