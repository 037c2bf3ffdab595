"""Index build pipeline (the write path).

Spark-first re-expression of the reference's SPIMI build
(reference ``diskindex.py:130-260``):

* tokenize/normalize/per-doc aggregate: one Arrow-batched pandas UDF
  (``analyze_doc_udf``) — tf entries, vocabulary and doc weights
  (``diskindex.py:302-306``) all map-side, so the build's only shuffle
  is the term partitioning (Spark's sort-based shuffle-with-spill
  subsumes SPIMI block flush/merge, ``diskindex.py:187-260``)
* postings are stored per (term, doc-range block): the block span both
  bounds per-key shuffle payload for hot terms (the salted two-phase
  groupBy — salt = doc range, so blocks stay doc-ordered and delta
  encoding still works) and carries block-max metadata for WAND-style
  top-k pruning
* physical layout: delta + varbyte binary postings (north_rule upgrade
  over the reference's fixed 4-byte encoding, ``diskindex.py:262-279``),
  positions in a separate column so column pruning skips them for
  non-phrase queries
* checkpointed build: the doc space is split into chunks; each chunk
  commits independently with a manifest entry (rows/bytes/secs), and
  ``resume=True`` skips committed chunks — the reference's Spimi restarts
  from zero on failure; the north_rule requires idempotent resume.

Tables are written as Parquet directories (Iceberg-ready layout: add the
Iceberg catalog jars and swap ``storage.write_table``; the jars are not
in this sandbox image).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from search_engine_spark.functions.udfs import (
    analyze_doc_udf,
    analyze_udf,
    encode_positions_udf,
    encode_postings_udf,
    encode_weights_udf,
    kgrams_udf,
)
from search_engine_spark.operators.docids import with_doc_ids

# Docs per posting block — the doc-range salt. This bounds (a) the
# collect_list payload per (term, block) group in the build shuffle and
# (b) the decode/explode unit at query time, so a hot term (a stopword
# present in every doc) fans out across corpus_size/BLOCK_SPAN tasks
# instead of landing on one reducer. 64k docs/block keeps the worst
# group ~hundreds of KB encoded while the per-term metadata stays tiny
# (10^12 turns -> ~15k blocks per hot term).
DEFAULT_BLOCK_SPAN = 1 << 16

# Bump whenever the on-disk table layout changes (readers refuse
# mismatched indexes instead of failing mid-query).
FORMAT_VERSION = 2


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(analyze_udf("text")).alias("tk")
    ).select(
        "doc_id",
        F.col("tk.term").alias("term"),
        F.col("tk.pos").alias("pos"),
        F.col("tk.raw").alias("raw"),
    )


def term_doc_tf(docs: DataFrame) -> DataFrame:
    """The positional tf table: one row per (term, doc) with sorted positions.

    Mirrors the reference's in-memory positional index build
    (``memoryindex.py:22-49``, ``diskindex.py:162-185``).
    """
    return _tokens(docs).groupBy("term", "doc_id").agg(
        F.count("*").cast("int").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def doc_weights(tf: DataFrame) -> DataFrame:
    """L_d = sqrt(sum (1+ln tf)^2) per doc (``diskindex.py:302-306``)."""
    return tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.pow(F.lit(1.0) + F.log("tf"), F.lit(2.0)))).alias("weight"),
        F.sum("tf").cast("long").alias("doc_len"),
        F.count("*").cast("long").alias("n_terms"),
    )


def block_postings(tf_with_weight: DataFrame, block_span: int) -> DataFrame:
    """Compress (term, doc, tf, positions) rows into per-(term, block) rows."""
    blocked = tf_with_weight.withColumn(
        "block_id", F.floor(F.col("doc_id") / F.lit(block_span)).cast("long")
    )
    plist = blocked.groupBy("term", "block_id").agg(
        F.array_sort(
            F.collect_list(F.struct("doc_id", "tf", "positions", "weight"))
        ).alias("pl")
    )
    doc_ids = F.transform("pl", lambda x: x["doc_id"])
    tfs = F.transform("pl", lambda x: x["tf"])
    return plist.select(
        "term",
        "block_id",
        F.size("pl").alias("df_block"),
        F.element_at("pl", 1)["doc_id"].alias("first_doc_id"),
        F.element_at("pl", -1)["doc_id"].alias("last_doc_id"),
        F.array_max(tfs).alias("max_tf"),
        F.aggregate(tfs, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")).alias(
            "sum_tf"
        ),
        # block-max of the doc-normalized partial score (1+ln tf)/L_d —
        # the WAND upper bound for this block under wqt scaling
        F.array_max(
            F.transform("pl", lambda x: (F.lit(1.0) + F.log(x["tf"])) / x["weight"])
        ).alias("max_partial"),
        encode_postings_udf(doc_ids, tfs).alias("postings_bin"),
        # per-posting L_d inline (raw float64): ranked scoring reads it
        # from the block instead of shuffling doc_stats per query
        encode_weights_udf(F.transform("pl", lambda x: x["weight"])).alias(
            "weights_bin"
        ),
        encode_positions_udf(
            tfs, F.flatten(F.transform("pl", lambda x: x["positions"]))
        ).alias("positions_bin"),
    )


class IndexBuilder:
    """Builds the on-disk index: docs, doc_stats, postings, terms, kgrams."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        block_span: int = DEFAULT_BLOCK_SPAN,
        write_partitions: int | None = None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.block_span = block_span
        self.write_partitions = write_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )

    # -- paths ---------------------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.index_dir, *parts)

    # -- public API ------------------------------------------------------------
    def build(
        self,
        transcripts: DataFrame,
        chunk_docs: int | None = None,
        resume: bool = False,
        assign_ids: bool = True,
    ) -> dict:
        """Full (optionally chunked + resumable) index build.

        ``chunk_docs``: docs per committed chunk (default: everything in
        one chunk). Chunks are doc-id ranges, so per-chunk postings blocks
        are disjoint across chunks and no cross-chunk merge is needed —
        the union of chunk outputs IS the index (what the reference's
        k-way block merge achieves, ``diskindex.py:219-260``).
        """
        t0 = time.time()
        phases: dict[str, float] = {}
        if not resume and os.path.exists(self.index_dir):
            shutil.rmtree(self.index_dir)
        os.makedirs(self._p("manifest"), exist_ok=True)

        docs = with_doc_ids(transcripts) if assign_ids else transcripts
        if not resume or not os.path.exists(self._p("docs", "_SUCCESS")):
            docs.write.mode("overwrite").parquet(self._p("docs"))
        docs = self.spark.read.parquet(self._p("docs"))
        docs.persist(StorageLevel.MEMORY_AND_DISK)
        num_docs = docs.count()
        phases["doc_ids"] = time.time() - t0

        chunk_docs = chunk_docs or max(num_docs, 1)
        n_chunks = math.ceil(num_docs / chunk_docs) if num_docs else 1
        chunk_metrics = []
        for chunk in range(n_chunks):
            lo, hi = chunk * chunk_docs, (chunk + 1) * chunk_docs
            manifest_path = self._p("manifest", f"chunk_{chunk}.json")
            if resume and os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    chunk_metrics.append(json.load(f))
                continue
            metrics = self._build_chunk(
                docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), chunk
            )
            with open(manifest_path + ".tmp", "w") as f:
                json.dump(metrics, f)
            os.replace(manifest_path + ".tmp", manifest_path)  # atomic commit
            chunk_metrics.append(metrics)

        t_fin = time.time()
        self._finalize(num_docs)
        phases["finalize"] = time.time() - t_fin
        docs.unpersist()
        wall = time.time() - t0
        totals = {
            "phases": phases,
            "num_docs": num_docs,
            "n_chunks": n_chunks,
            "posting_rows": sum(m["posting_rows"] for m in chunk_metrics),
            "posting_bytes": sum(m["posting_bytes"] for m in chunk_metrics),
            "build_secs": wall,
            "docs_per_sec": num_docs / wall if wall else 0.0,
            "chunks": chunk_metrics,
        }
        with open(self._p("build_metrics.json"), "w") as f:
            json.dump(totals, f, indent=1)
        return totals

    # -- internals -------------------------------------------------------------
    def _build_chunk(self, docs_chunk: DataFrame, chunk: int) -> dict:
        t0 = time.time()
        # Analyze ONCE, aggregated per doc inside the UDF: tf entries,
        # vocabulary words, and the doc weight all come out of a single
        # map-side Arrow pass — the only shuffle left in the chunk build
        # is the term-partitioning one (the actual SPIMI merge,
        # diskindex.py:219-260).
        analyzed = docs_chunk.select(
            "doc_id", analyze_doc_udf("text").alias("a")
        ).select("doc_id", "a.postings", "a.words", "a.weight", "a.doc_len")
        analyzed.persist(StorageLevel.MEMORY_AND_DISK)

        t1 = time.time()
        stats = analyzed.select(
            "doc_id",
            "weight",
            F.col("doc_len").cast("long").alias("doc_len"),
            F.size("postings").cast("long").alias("n_terms"),
        )
        stats.write.mode("overwrite").parquet(self._p("doc_stats", f"chunk={chunk}"))
        t2 = time.time()

        tf_w = analyzed.select(
            "doc_id", "weight", F.explode("postings").alias("p")
        ).select("doc_id", "p.term", "p.tf", "p.positions", "weight")
        postings = block_postings(tf_w, self.block_span)
        (
            postings.repartition(self.write_partitions, "term")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite")
            .parquet(self._p("postings", f"chunk={chunk}"))
        )
        t3 = time.time()

        # unstemmed vocabulary for the k-gram index (reference adds the
        # specials-stripped word BEFORE stemming, memoryindex.py:32-33)
        vocab = analyzed.select(F.explode("words").alias("word")).distinct()
        vocab.write.mode("overwrite").parquet(self._p("vocab_chunks", f"chunk={chunk}"))
        t4 = time.time()
        analyzed.unpersist()

        agg = self.spark.read.parquet(self._p("postings", f"chunk={chunk}")).agg(
            F.count("*").alias("rows"),
            F.coalesce(
                F.sum(F.length("postings_bin") + F.length("positions_bin")), F.lit(0)
            ).alias("bytes"),
            F.coalesce(F.sum("df_block"), F.lit(0)).alias("tf_rows"),
        ).collect()[0]
        return {
            "chunk": chunk,
            "posting_rows": agg["rows"],
            "posting_bytes": int(agg["bytes"]),
            "tf_rows": int(agg["tf_rows"]),
            "secs": time.time() - t0,
            "phases": {
                "tf_and_stats": round(t2 - t1, 2),
                "postings": round(t3 - t2, 2),
                "vocab": round(t4 - t3, 2),
                "metrics_agg": round(time.time() - t4, 2),
            },
        }

    def _finalize(self, num_docs: int) -> None:
        postings = self.spark.read.parquet(self._p("postings"))
        terms = postings.groupBy("term").agg(
            F.sum("df_block").cast("long").alias("df"),
            F.sum("sum_tf").cast("long").alias("cf"),
        )
        terms.repartition(1).sortWithinPartitions("term").write.mode(
            "overwrite"
        ).parquet(self._p("terms"))

        vocab = (
            self.spark.read.parquet(self._p("vocab_chunks"))
            .select("word")
            .distinct()
            .withColumn("grams", kgrams_udf("word"))
            .withColumn("n_grams", F.size("grams"))
        )
        vocab.select(
            F.explode("grams").alias("gram"), "word", "n_grams"
        ).repartition(self.write_partitions, "gram").sortWithinPartitions(
            "gram"
        ).write.mode("overwrite").parquet(self._p("kgrams"))
        vocab.select("word", "n_grams").write.mode("overwrite").parquet(
            self._p("vocab")
        )

        with open(self._p("_meta.json"), "w") as f:
            json.dump(
                {
                    "num_docs": num_docs,
                    "block_span": self.block_span,
                    "format_version": FORMAT_VERSION,
                },
                f,
            )
