from search_engine_spark.streaming.ingest import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    start_index_stream,
)
