"""Checkpointed build: chunked commits, idempotent resume, metrics."""

import json
import os
import shutil

from search_engine_spark.build import IndexBuilder
from search_engine_spark.engine import TranscriptSearchEngine
from search_engine_spark.fixtures import synthetic_transcripts
from search_engine_spark.functions import codec


def _index_content(spark, index_dir):
    rows = spark.read.parquet(os.path.join(index_dir, "postings")).collect()
    out = {}
    for r in rows:
        d, t = codec.decode_postings(bytes(r["postings_bin"]))
        out.setdefault(r["term"], []).extend(zip(map(int, d), map(int, t)))
    return {k: sorted(v) for k, v in out.items()}


def test_chunked_build_equals_single_chunk(spark, tmp_path):
    df = synthetic_transcripts(spark, n_convs=12, turns_per_conv=5)
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    IndexBuilder(spark, one).build(df)
    metrics = IndexBuilder(spark, many).build(df, chunk_docs=17)
    assert metrics["n_chunks"] == 4
    assert _index_content(spark, one) == _index_content(spark, many)


def test_resume_skips_committed_chunks_and_rebuilds_missing(spark, tmp_path):
    df = synthetic_transcripts(spark, n_convs=10, turns_per_conv=4)
    idx = str(tmp_path / "idx")
    first = IndexBuilder(spark, idx).build(df, chunk_docs=15)
    baseline = _index_content(spark, idx)
    assert first["n_chunks"] == 3

    # simulate a mid-build failure: chunk 1 never committed
    os.remove(os.path.join(idx, "manifest", "chunk_1.json"))
    shutil.rmtree(os.path.join(idx, "postings", "chunk=1"))

    resumed = IndexBuilder(spark, idx).build(df, chunk_docs=15, resume=True)
    assert resumed["n_chunks"] == 3
    assert _index_content(spark, idx) == baseline
    # committed chunks were not rebuilt: their manifest entries are reused
    assert resumed["chunks"][0]["secs"] == first["chunks"][0]["secs"]
    # engine over resumed index answers queries
    eng = TranscriptSearchEngine(spark, idx, cache=False)
    assert eng.num_docs == 40
    assert len(eng.ranked_query("test", k=5)) > 0


def test_manifest_metrics_recorded(spark, tmp_path):
    df = synthetic_transcripts(spark, n_convs=6, turns_per_conv=3)
    idx = str(tmp_path / "idx")
    metrics = IndexBuilder(spark, idx).build(df, chunk_docs=9)
    for chunk_file in os.listdir(os.path.join(idx, "manifest")):
        with open(os.path.join(idx, "manifest", chunk_file)) as f:
            m = json.load(f)
        assert m["posting_rows"] > 0
        assert m["posting_bytes"] > 0
        assert m["secs"] > 0
    assert metrics["num_docs"] == 18
    assert metrics["docs_per_sec"] > 0
