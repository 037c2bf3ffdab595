"""Structured Streaming ingestion: landing dir -> incremental index."""

import os

from search_engine_spark.build import IndexBuilder
from search_engine_spark.engine import TranscriptSearchEngine
from search_engine_spark.fixtures import synthetic_transcripts
from search_engine_spark.streaming import start_index_stream
from search_engine_spark.streaming.ingest import index_batch


def test_streaming_index_ingestion(spark, tmp_path):
    src, idx, ckpt = (str(tmp_path / d) for d in ("landing", "idx", "ckpt"))
    first = synthetic_transcripts(spark, n_convs=6, turns_per_conv=4)  # 24
    first.write.mode("append").parquet(src)

    q = start_index_stream(spark, src, idx, ckpt, block_span=16)
    q.awaitTermination()
    eng = TranscriptSearchEngine(spark, idx, cache=False)
    assert eng.num_docs == 24

    # a later drop is picked up as an append chunk by a fresh trigger
    synthetic_transcripts(spark, n_convs=3, turns_per_conv=4).write.mode(
        "append"
    ).parquet(src)
    q = start_index_stream(spark, src, idx, ckpt, block_span=16)
    q.awaitTermination()
    eng = TranscriptSearchEngine(spark, idx, cache=False)
    assert eng.num_docs == 36
    assert len(eng.ranked_query("test", k=5)) > 0
    assert eng.ranked_query("test here", k=10, pruned=True) == eng.ranked_query(
        "test here", k=10
    )

    # exactly-once: a replayed batch_id is a no-op (foreachBatch may
    # re-deliver after a crash between append and stream commit)
    builder = IndexBuilder(spark, idx, block_span=16)
    assert index_batch(builder, first, 0) is None
    assert TranscriptSearchEngine(spark, idx, cache=False).num_docs == 36
    assert os.path.exists(os.path.join(idx, "_stream_state.json"))
