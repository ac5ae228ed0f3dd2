from radarpipeline_spark.sources.parquet import load_table, register_views
from radarpipeline_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    aux_signals_from_events,
    synthesize_transcripts,
    transcripts_from_events,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "load_table",
    "register_views",
    "transcripts_from_events",
    "aux_signals_from_events",
    "synthesize_transcripts",
]
