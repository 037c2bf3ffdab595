"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "build_turns_per_sec": ...}

Covers the north-rule hot paths: full Porter2 index build
(turns/sec), ranked / boolean / phrase / wildcard query latency over
the built index, and the training-data pipeline ops (dedup sweeps,
similarity top-k, text stats) at the same scale factor.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from pyspark.sql import functions as F

    from search_engine_spark import simple
    from search_engine_spark.engine import TranscriptSearchEngine
    from search_engine_spark.fixtures import documents_as_transcripts
    from search_engine_spark.ops import (
        components,
        decontam,
        dedup,
        pii,
        sampling,
        similarity,
        textstats,
    )
    from search_engine_spark.session import get_spark

    spark = get_spark(
        app_name="search-engine-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs.persist().count()
    emb.persist().count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # ---- index build (the north-rule critical path) -----------------------
    index_dir = "/tmp/bench_index"
    shutil.rmtree(index_dir, ignore_errors=True)
    transcripts = documents_as_transcripts(docs)
    n_turns = docs.count()
    metrics = timed(
        "build_index",
        lambda: TranscriptSearchEngine.build(spark, transcripts, index_dir)
        and None,
    )
    del metrics
    eng = TranscriptSearchEngine(spark, index_dir)
    # warm caches + Python UDF workers so query timings measure the
    # steady-state read path, not one-time session costs (doc_stats is
    # deliberately NOT touched — no query path reads it)
    eng.terms.count()
    eng.postings.count()
    eng.kgrams.count()
    eng.ranked_query("warmup")
    eng.boolean_query("warmup")

    # ---- engine read path -------------------------------------------------
    timed("ranked_query", lambda: eng.ranked_query("spark join fast"))
    timed(
        "ranked_wand",
        lambda: eng.ranked_query("spark join fast", pruned=True),
    )
    timed("boolean_query", lambda: eng.boolean_query("spark vector + dup"))
    batch_queries = [
        f"{a} {b}"
        for a in ["spark", "join", "fast", "test"]
        for b in ["query", "vector", "stream", "dup"]
    ]
    timed("ranked_batch16", lambda: eng.ranked_query_batch(batch_queries, k=10))
    timed(
        "ranked_batch16_wand",
        lambda: eng.ranked_query_batch(batch_queries, k=10, pruned=True),
    )
    timed("phrase_query", lambda: eng.boolean_query('"hash join"'))
    timed("wildcard_ranked", lambda: eng.ranked_query("s*m query"))

    # ---- simple-analyzer relational path ---------------------------------
    timed("tf_table_agg", lambda: simple.tf_table(docs).count())
    timed(
        "ranked_topk_simple",
        lambda: simple.ranked_topk(docs, ["spark", "join", "fast"], 10).collect(),
    )

    # ---- training-data ops ------------------------------------------------
    timed("dedup_exact", lambda: dedup.exact_duplicates(docs).where("is_dup").count())
    timed(
        "dedup_minhash",
        lambda: dedup.minhash_near_dup_pairs(docs, threshold=0.7).count(),
    )
    timed(
        "dedup_simhash",
        lambda: dedup.simhash_near_dup_pairs(docs, max_hamming=3).count(),
    )
    timed(
        "dedup_groups",
        lambda: components.dedup_groups(docs, threshold=0.7)
        .where("keep")
        .count(),
    )
    timed(
        "sample_stratified",
        lambda: sampling.stratified_sample(
            docs, {"en": 0.1, "de": 0.5, "es": 0.2, "fr": 1.0}, "lang"
        ).count(),
    )
    timed(
        "pii_redact",
        lambda: pii.redact_pii(docs)
        .agg(F.sum(F.length("redacted")))
        .collect(),
    )
    timed(
        "decontam",
        lambda: decontam.contamination(
            docs.where("doc_id % 97 != 0"), docs.where("doc_id % 97 = 0")
        )
        .where("contaminated")
        .count(),
    )
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    timed("embed_topk", lambda: similarity.cosine_topk(emb, qv, 10).collect())
    timed(
        "text_stats",
        lambda: textstats.quality_scores(docs)
        .join(textstats.language_scores(docs), "doc_id")
        .join(textstats.fingerprints(docs), "doc_id")
        .count(),
    )

    # ---- incremental append (last: it mutates the bench index) ------------
    # 1% of the corpus as one append chunk — with the incremental
    # finalize this must cost O(new docs) + O(dictionary), not O(index)
    delta = documents_as_transcripts(docs.limit(max(n_turns // 100, 1)))
    timed("append_1pct", lambda: eng.append(delta))

    total = round(sum(timings.values()), 3)
    build_tps = round(n_turns / timings["build_index"], 2)
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_turns": n_turns,
                "build_turns_per_sec": build_tps,
            }
        )
    )


if __name__ == "__main__":
    main()
