from beats_spark.streaming.pipeline import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    flows_stream,
    session_flows_stream,
    stream_pipeline,
    stream_transcripts,
)
