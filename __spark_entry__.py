"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the full Porter2 inverted-index
engine, ranked retrieval over sf0.001 documents-as-transcripts).
``queries``/``oracle_sql`` expose the operator catalog from
``search_engine_spark.contract`` — each Spark plan paired with a
DuckDB-runnable SQL oracle replicating its exact semantics (md5-derived
hashing + fixed-precision rounding make outputs bit-comparable). The
Porter2 engine, ANN, and multimodal entries get oracles via
materialized deterministic inputs (stemmed-tf dump; inlined
hyperplane / centroid literals; fake-feature dump — each re-derived
by the same pure-Python/numpy helpers the Spark plans use, see
``contract.py``), so all 100 entries carry value-level oracles. The catalog
also covers the curation surface (composed pipeline, PII scan/redact,
benchmark decontamination, dedup groups, deterministic sampling,
context packing, keyword extraction), events analytics (sessionization,
rolling windows, quantiles), and the round-4 query extensions (NEAR/k
proximity, metadata-filtered ranked retrieval, facet counts, PMI
collocations, snippets, standing-query percolation, tombstone-delete
ranked semantics, conversation-level ranked rollup, more-like-this,
role-boosted ranking — tf-idf and BM25 — per-conversation diversified
top-k, fuzzy ranked retrieval, hybrid RRF retrieval, Gopher-style
repetition scores, winnowing fingerprints + overlap pairs, unigram-LM
quality, target-mixture / token-budget sampling, incremental near-dup
gating, conversation-thread assembly, and the corpus report card).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-engine ranked top-10 over sf0.001 transcripts."""
    return contract.REGISTRY["engine_ranked_porter"][0](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
