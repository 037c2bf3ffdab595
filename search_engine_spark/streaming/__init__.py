from search_engine_spark.streaming.ingest import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    start_index_stream,
)
from search_engine_spark.streaming.dedup import dedup_stream  # noqa: F401
from search_engine_spark.streaming.sessions import (  # noqa: F401
    streaming_sessionize,
)
from search_engine_spark.streaming.trends import (  # noqa: F401
    start_trend_stream,
    term_rates,
)
from search_engine_spark.streaming.percolate import (  # noqa: F401
    alert_rates,
    compile_queries,
    percolate,
    percolate_inverted,
    start_alert_stream,
    start_percolator,
)
