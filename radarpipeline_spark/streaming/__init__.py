from radarpipeline_spark.streaming.sessionize_stream import (
    stream_session_stats,
    stream_transcripts_from_dir,
)

__all__ = ["stream_session_stats", "stream_transcripts_from_dir"]
