"""TranscriptSearchEngine — the read path (query facade).

Query grammar (identical to the reference, ``query.py``):
``+`` separates OR literals; within a literal, whitespace separates AND
conjuncts; ``"quoted words"`` is a positional phrase; ``*`` marks a
wildcard. Ranked retrieval is term-at-a-time tf-idf with
``wqt = ln(1 + N/df)``, ``wdt = 1 + ln(tf)``, length-normalized by
``L_d`` and tie-broken by lower doc_id (``query.py:69-84``,
``diskindex.py:90-99``).

Execution is Spark-first: query terms become a broadcast dimension
joined against the postings table (the reference's query-restricted
index load, ``diskindex.py:59-80``, re-expressed as a broadcast-hash
join + parquet predicate pushdown on ``term``), scoring is one
DataFrame plan ending in ``TakeOrderedAndProject`` (distributed heap
top-k), boolean set algebra is join/union over per-conjunct doc sets.
"""

from __future__ import annotations

import json
import os
import re
import shlex
from collections import Counter
from math import log
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from search_engine_spark.build import IndexBuilder
from search_engine_spark.functions import codec
from search_engine_spark.text.kgrams import kgrams, wildcard_grams
from search_engine_spark.text.normalize import query_normalize, remove_special_characters

JACCARD_THRESHOLD = 0.35  # reference query.py:14
DEFAULT_K = 10  # reference query.py:25


def _block_scorer(k: int | None):
    """Per-block exhaustive scorer for ``applyInPandas``.

    Input rows: one per (query term, this block) with wqt, qidx and the
    encoded postings/weights. Output: (doc_id, score) for the block —
    the block's top-k when ``k`` is set (tie-break doc_id asc, matching
    ``diskindex.py:98-99``), or every scored doc when ``k`` is None
    (the WAND exact-scoring path needs full candidate scores).
    """

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["qidx"].to_numpy(), kind="stable")
        doc_parts, partial_parts, weight_parts = [], [], []
        for i in order:
            d, t = codec.decode_postings(bytes(pdf["postings_bin"].iloc[i]))
            w = np.frombuffer(bytes(pdf["weights_bin"].iloc[i]), dtype="<f8")
            doc_parts.append(d)
            partial_parts.append(pdf["wqt"].iloc[i] * (1.0 + np.log(t)))
            weight_parts.append(w)
        docs = np.concatenate(doc_parts)
        partials = np.concatenate(partial_parts)
        weights = np.concatenate(weight_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        acc = np.zeros(uniq.size)
        np.add.at(acc, inv, partials)  # sequential adds in qidx order
        ld = np.empty(uniq.size)
        ld[inv] = weights  # every occurrence carries the same L_d
        scores = acc / ld
        idx = np.lexsort((uniq, -scores))  # score desc, doc_id asc
        if k is not None:
            idx = idx[:k]
        return pd.DataFrame({"doc_id": uniq[idx], "score": scores[idx]})

    return score


def _block_set_op(n_required: int | None):
    """Per-block boolean doc-set worker: AND of all ``n_required``
    distinct terms (``utils.py:33-51``) or, when None, OR across
    whatever terms are present (``utils.py:54-92``)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs: dict[object, np.ndarray] = {}
        for term, blob in zip(pdf["term"], pdf["postings_bin"]):
            d, _ = codec.decode_postings(bytes(blob))
            arrs[term] = d
        if n_required is None:
            out = np.unique(np.concatenate(list(arrs.values())))
        elif len(arrs) < n_required:
            out = np.empty(0, dtype=np.int64)
        else:
            out = reduce(np.intersect1d, arrs.values())
        return pd.DataFrame({"doc_id": out})

    return run


def _block_phrase(n_slots: int, block_span: int):
    """Per-block positional phrase matcher.

    Reference semantics (``query.py:143-160``): shift slot i's positions
    by -i, docs where every slot shares a shifted position match. Within
    a block, encode each (doc, shifted position) pair as one int64 key
    ``(doc_id - block_base) * 2^33 + shifted + n_slots`` (block-local
    doc offset < block_span <= 2^30, shifted + n >= 0 and < 2^33), then
    the phrase docs are the keys surviving an n-way ``np.intersect1d``.
    Fully vectorized — no per-doc Python loop.
    """

    def run(key, pdf):
        base = int(key[0]) * block_span
        per_slot: dict[int, list[np.ndarray]] = {}
        for slot, pblob, posblob in zip(
            pdf["slot"], pdf["postings_bin"], pdf["positions_bin"]
        ):
            d, t = codec.decode_postings(bytes(pblob))
            flat = codec.decode_positions_flat(bytes(posblob), t)
            comp = (np.repeat(d, t) - base) * np.int64(1 << 33) + (
                flat - int(slot) + n_slots
            )
            per_slot.setdefault(int(slot), []).append(comp)
        if len(per_slot) < n_slots:
            return pd.DataFrame({"doc_id": np.empty(0, dtype=np.int64)})
        arrs = [np.concatenate(v) for v in per_slot.values()]
        common = reduce(np.intersect1d, arrs)
        docs = np.unique(common >> np.int64(33)) + base
        return pd.DataFrame({"doc_id": docs})

    return run


class TranscriptSearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = True):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "_meta.json")) as f:
            meta = json.load(f)
        from search_engine_spark.build import FORMAT_VERSION

        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"index at {index_dir} has format_version "
                f"{meta.get('format_version')}, this engine needs "
                f"{FORMAT_VERSION} — rebuild the index"
            )
        self.num_docs: int = meta["num_docs"]
        self.block_span: int = meta["block_span"]
        p = lambda name: os.path.join(index_dir, name)  # noqa: E731

        def load(name: str):
            """Read an index table, right-sized for caching.

            Partition count scales with on-disk bytes (1 per 32 MB,
            capped at shuffle.partitions): a small index collapses to a
            handful of cached partitions so query stages schedule a
            handful of tasks, while a 100 TB index keeps full
            parallelism. Tasks per stage, not bytes, dominate latency
            at the small end.
            """
            df = spark.read.parquet(p(name))
            if cache:
                limit = int(spark.conf.get("spark.sql.shuffle.partitions"))
                nbytes = sum(
                    os.path.getsize(os.path.join(root, f))
                    for root, _d, files in os.walk(p(name))
                    for f in files
                )
                parts = max(1, min(limit, nbytes // (32 << 20) + 1))
                df = df.coalesce(int(parts))
                df.persist(StorageLevel.MEMORY_AND_DISK)
            return df

        self.postings = load("postings")
        self.terms = load("terms")
        self.doc_stats = load("doc_stats")
        self.kgrams = load("kgrams")
        self.docs = spark.read.parquet(p("docs"))

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        transcripts: DataFrame,
        index_dir: str,
        **builder_kwargs,
    ) -> "TranscriptSearchEngine":
        IndexBuilder(spark, index_dir, **builder_kwargs).build(transcripts)
        return cls(spark, index_dir)

    # ----------------------------------------------------------------- ranked
    def ranked_query_df(self, query: str, k: int = DEFAULT_K) -> DataFrame:
        """Top-k scoring as one DataFrame plan: (doc_id, score)."""
        terms = self._ranked_terms(query)
        return self._score_terms_df(terms, k)

    def ranked_query(
        self, query: str, k: int = DEFAULT_K, pruned: bool = False
    ) -> list[tuple[int, float]]:
        """Top-k ranked retrieval. ``pruned=True`` uses block-max WAND
        pruning — provably rank-identical, decodes fewer posting blocks
        (``tests/test_wand.py`` asserts equality vs exhaustive)."""
        if pruned:
            return self.ranked_query_wand(query, k)
        df = self.ranked_query_df(query, k)
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    # -------------------------------------------------------- block-max WAND
    def ranked_query_wand(self, query: str, k: int = DEFAULT_K) -> list[tuple[int, float]]:
        """Block-max WAND top-k: rank-identical to exhaustive scoring.

        Postings are stored per (term, doc-range block) with
        ``max_partial`` = max over the block of (1+ln tf)/L_d
        (``build.py::_partial_block_encoder``). Since a doc's terms all live in
        the doc's own block range, the per-block score upper bound is

            ub(b) = sum over query terms t present in b of wqt_t * max_partial_{t,b}

        The driver fetches the tiny (term, block, max_partial, df_block)
        metadata — never the posting bytes (Catalyst prunes the binary
        columns from the scan) — then:

        1. exactly scores the most promising blocks (greedy by ub until
           >= 4k candidate postings are covered),
        2. takes the running k-th score L as a threshold,
        3. exactly scores any remaining block with ub >= L (a pruned
           block cannot contain a doc with score > L, nor a score == L
           tie, because ties break on doc_id only among EQUAL scores and
           ub >= score for every doc in the block),
        4. repeats (at most once in practice) until no unscored block's
           ub reaches the current k-th score.

        Each round's exact scoring is the same DataFrame plan as the
        exhaustive path, restricted by a broadcast (term, block_id)
        filter — so correctness reduces to the threshold argument above.
        """
        terms = self._ranked_terms(query)
        if not terms:
            return []
        counts = Counter(terms)
        qdf = self.spark.createDataFrame(
            [(t, m) for t, m in counts.items()], "term string, mult int"
        )
        meta = (
            self.postings.join(F.broadcast(qdf), "term")
            .select("term", "block_id", "max_partial", "df_block")
            .collect()
        )
        if not meta:
            return []
        df_rows = self.terms.join(F.broadcast(qdf), "term").select("term", "df").collect()
        dfs = {r["term"]: r["df"] for r in df_rows}
        wqt = {
            t: float(m * log(1 + self.num_docs / dfs[t]))
            for t, m in counts.items()
            if dfs.get(t)
        }
        # per-block upper bound and posting volume
        blocks: dict[int, dict] = {}
        for r in meta:
            if r["term"] not in wqt:
                continue
            b = blocks.setdefault(r["block_id"], {"ub": 0.0, "n": 0, "pairs": []})
            b["ub"] += wqt[r["term"]] * r["max_partial"]
            b["n"] += r["df_block"]
            b["pairs"].append((r["term"], r["block_id"]))
        if not blocks:
            return []
        order = sorted(blocks, key=lambda b: (-blocks[b]["ub"], b))

        scored: dict[int, float] = {}
        remaining = list(order)
        top: list[tuple[int, float]] = []
        threshold = float("-inf")
        while remaining:
            if len(top) == k:
                # prune strictly-below-threshold blocks; keep ub == L blocks
                # (they could still produce a doc_id-tie-winning equal score)
                remaining = [b for b in remaining if blocks[b]["ub"] >= threshold]
                if not remaining:
                    break
            batch, volume = [], 0
            while remaining and volume < 4 * k:
                b = remaining.pop(0)
                batch.append(b)
                volume += blocks[b]["n"]
            pairs = [p for b in batch for p in blocks[b]["pairs"]]
            for doc_id, score in self._score_blocks(pairs, wqt):
                scored[doc_id] = score
            top = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
            if len(top) == k:
                threshold = top[-1][1]
        return top

    def _score_blocks(
        self, pairs: list[tuple[str, int]], wqt: dict[str, float]
    ) -> list[tuple[int, float]]:
        """Exact scores for docs in the given (term, block_id) cells."""
        qidx = {t: i for i, t in enumerate(wqt)}
        pdf = self.spark.createDataFrame(
            [(t, b, qidx[t], wqt[t]) for t, b in pairs],
            "term string, block_id long, qidx int, wqt double",
        )
        cells = self.postings.join(F.broadcast(pdf), ["term", "block_id"]).select(
            "block_id", "qidx", "wqt", "postings_bin", "weights_bin"
        )
        pdf = (
            cells.groupBy("block_id")
            .applyInPandas(_block_scorer(None), "doc_id long, score double")
            .toPandas()
        )
        return list(zip((int(d) for d in pdf["doc_id"]), (float(s) for s in pdf["score"])))

    def _ranked_terms(self, query: str) -> list[str]:
        """Normalized query term list, wildcards expanded, duplicates kept
        (the reference accumulates per occurrence, ``query.py:73-77``)."""
        out: list[str] = []
        for word in query.split():
            if "*" in word:
                # expanded vocab words are looked up through query_normalize,
                # same as the reference's get_postings (diskindex.py:50)
                out.extend(query_normalize(w) for w in self.wildcard_expand(word.lower()))
            else:
                out.append(query_normalize(word))
        return out

    def _score_terms_df(self, terms: list[str], k: int) -> DataFrame:
        spark = self.spark
        empty = spark.createDataFrame([], "doc_id long, score double")
        if not terms:
            return empty
        counts = Counter(terms)
        # df lookup for wqt — one tiny broadcast-join job (the reference's
        # dictionary point lookups, query.py:80); its result is a handful
        # of floats, so folding them into the scoring plan as literals
        # keeps the main job to two stages (decode+explode, agg+top-k).
        qdf = spark.createDataFrame(
            [(t, m) for t, m in counts.items()], "term string, mult int"
        )
        df_rows = self.terms.join(F.broadcast(qdf), "term").select("term", "df").collect()
        dfs = {r["term"]: r["df"] for r in df_rows}
        weighted = [
            (t, float(m * log(1 + self.num_docs / dfs[t])))
            for t, m in counts.items()
            if dfs.get(t)
        ]
        if not weighted:
            return empty
        wdf = spark.createDataFrame(
            [(t, i, w) for i, (t, w) in enumerate(weighted)],
            "term string, qidx int, wqt double",
        )
        # Blocks partition the doc space, so each doc's score is COMPLETE
        # within its block: one applyInPandas over (term, block) cells
        # scores a whole block in numpy and emits only that block's
        # top-k. The global answer is TakeOrderedAndProject over
        # n_blocks*k tiny rows — no posting-row explosion, no doc_stats
        # join (L_d rides inside the block, weights_bin), and the only
        # shuffle moves the (compressed) query-term blocks themselves.
        # Partials accumulate in query-term order (qidx), the exact
        # float-addition order of the reference's term-at-a-time loop
        # (query.py:78-83).
        cells = self.postings.join(F.broadcast(wdf), "term").select(
            "block_id", "qidx", "wqt", "postings_bin", "weights_bin"
        )
        scored = cells.groupBy("block_id").applyInPandas(
            _block_scorer(k), "doc_id long, score double"
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # ---------------------------------------------------------------- boolean
    def boolean_query(self, query: str) -> list[int]:
        # Arrow toPandas: materializing a large result (a stopword AND
        # can match most of the corpus) as columnar batches is ~10x
        # cheaper than driver-side Row objects from collect()
        df = self.boolean_query_df(query)
        return [int(x) for x in df.toPandas()["doc_id"].to_numpy()]

    def boolean_query_df(self, query: str) -> DataFrame:
        literals = [lit.strip() for lit in query.split("+")]
        literal_dfs = [self._literal_df(lit) for lit in literals]
        literal_dfs = [d for d in literal_dfs if d is not None]
        if not literal_dfs:
            return self.spark.createDataFrame([], "doc_id long")
        return reduce(DataFrame.union, literal_dfs).distinct().orderBy("doc_id")

    def _literal_df(self, literal: str) -> DataFrame | None:
        """Doc set for one AND literal; None when no conjunct survives."""
        try:
            conjuncts = shlex.split(literal)
        except ValueError:
            conjuncts = [literal]
        parts: list[DataFrame] = []
        single_terms: list[str] = []
        for conjunct in conjuncts:
            words = conjunct.split()
            wildcards = [w for w in words if "*" in w]
            if wildcards:
                # reference parity (query.py:103-113): each wildcard term
                # contributes an OR-of-expansions doc set; EMPTY expansions
                # are silently dropped from the AND; non-wildcard words in
                # the same conjunct are ignored. Every expanded vocab word
                # came from the corpus, so its stem has postings — no
                # emptiness re-check needed.
                for w in wildcards:
                    expansion = self.wildcard_expand(w.lower())
                    if not expansion:
                        continue
                    parts.append(
                        self._any_term_df([query_normalize(x) for x in expansion])
                    )
                continue
            terms = [query_normalize(w) for w in words]
            if len(terms) > 1:
                parts.append(self._phrase_df(terms))
            elif terms:
                single_terms.append(terms[0])
        if single_terms:
            # ALL single-term conjuncts resolve in ONE decode pass:
            # docs containing every term via count_distinct == n (Q6 as a
            # single aggregation, not a join chain — one shuffle total).
            parts.insert(0, self._all_terms_df(single_terms))
        if not parts:
            return None
        return reduce(lambda a, b: a.join(b, "doc_id"), parts)

    def _all_terms_df(self, terms: list[str]) -> DataFrame:
        """Docs containing ALL of ``terms``: per-block n-way sorted
        intersect in numpy (``utils.py:33-51`` at block granularity) —
        block results are disjoint, so their union needs no dedup."""
        uniq = sorted(set(terms))
        qdf = self.spark.createDataFrame([(t,) for t in uniq], "term string")
        cells = self.postings.join(F.broadcast(qdf), "term").select(
            "block_id", "term", "postings_bin"
        )
        return cells.groupBy("block_id").applyInPandas(
            _block_set_op(len(uniq)), "doc_id long"
        )

    def _any_term_df(self, terms: list[str]) -> DataFrame:
        """Docs containing ANY of ``terms`` (OR within, used for single
        terms and wildcard expansions): per-block sorted union."""
        qdf = self.spark.createDataFrame([(t,) for t in set(terms)], "term string")
        cells = self.postings.join(F.broadcast(qdf), "term").select(
            "block_id", "term", "postings_bin"
        )
        return cells.groupBy("block_id").applyInPandas(
            _block_set_op(None), "doc_id long"
        )

    def _phrase_df(self, terms: list[str]) -> DataFrame:
        """Docs where ``terms`` occur at consecutive positions
        (reference ``query.py:143-160``: shift term i's positions by -i,
        intersect) — vectorized per block, see ``_block_phrase``."""
        n = len(terms)
        qdf = self.spark.createDataFrame(
            [(t, i) for i, t in enumerate(terms)], "term string, slot int"
        )
        cells = self.postings.join(F.broadcast(qdf), "term").select(
            "block_id", "slot", "postings_bin", "positions_bin"
        )
        return cells.groupBy("block_id").applyInPandas(
            _block_phrase(n, self.block_span), "doc_id long"
        )

    # --------------------------------------------------------------- wildcard
    def wildcard_expand(self, pattern: str) -> list[str]:
        """Vocab words containing every gram of the wildcard pattern
        (reference ``query.py:125-134`` — NO post-filter against the
        pattern, preserved deliberately)."""
        grams = wildcard_grams(pattern)
        if not grams:
            return []
        gdf = self.spark.createDataFrame([(g,) for g in grams], "gram string")
        rows = (
            self.kgrams.join(F.broadcast(gdf), "gram")
            .groupBy("word")
            .agg(F.count_distinct("gram").alias("ng"))
            .where(F.col("ng") == len(grams))
            .select("word")
            .collect()
        )
        return sorted(r["word"] for r in rows)

    # --------------------------------------------------------------- spelling
    def check_spelling(
        self, query: str, vocab: set[str], ranked_flag: bool = False
    ) -> str | None:
        """Spell-correct a query against ``vocab`` (reference ``query.py:35-59``)."""
        if ranked_flag:
            terms = query.split()
        else:
            terms = re.findall(r"\w+", query)
        new_terms = [
            t
            if ("*" in t or remove_special_characters(t) in vocab)
            else self.select_best_spelling(t)
            for t in terms
        ]
        if terms == new_terms:
            return None
        if not all(new_terms):
            return None
        if ranked_flag:
            return " ".join(new_terms)
        for term, new in zip(terms, new_terms):
            if term != new:
                query = query.replace(term, new)
        return query

    def select_best_spelling(self, term: str) -> str | None:
        """Best candidate by (Jaccard > 0.35) -> min edit distance -> max df
        (reference ``query.py:61-67``, ``kgram.py:66-91``)."""
        candidates = self.find_spelling_candidates(term, JACCARD_THRESHOLD)
        if not candidates:
            return None
        # df of each candidate's stemmed form (reference get_doc_frequency
        # normalizes first, diskindex.py:29)
        cdf = self.spark.createDataFrame(
            [(w, query_normalize(w)) for w in candidates], "word string, term string"
        )
        rows = (
            cdf.join(self.terms.select("term", "df"), "term", "left")
            .select("word", F.coalesce("df", F.lit(0)).alias("df"))
            .collect()
        )
        dfs = {r["word"]: r["df"] for r in rows}
        return max(sorted(candidates), key=lambda w: dfs.get(w, 0))

    def find_spelling_candidates(self, qword: str, threshold: float) -> list[str]:
        qgrams = kgrams(qword)
        gdf = self.spark.createDataFrame([(g,) for g in qgrams], "gram string")
        cand = (
            self.kgrams.join(F.broadcast(gdf), "gram")
            .groupBy("word", "n_grams")
            .agg(F.count_distinct("gram").alias("n_common"))
            .withColumn(
                "jaccard",
                F.col("n_common")
                / (F.lit(len(qgrams)) + F.col("n_grams") - F.col("n_common")),
            )
            .where(F.col("jaccard") > threshold)
            .withColumn("dist", F.levenshtein(F.lit(qword), F.col("word")))
        )
        rows = cand.select("word", "dist").collect()
        if not rows:
            return []
        min_dist = min(r["dist"] for r in rows)
        return sorted(r["word"] for r in rows if r["dist"] == min_dist)

    # ------------------------------------------------------------------ misc
    def vocab(self) -> list[str]:
        """All index terms, sorted (reference ``diskindex.py:82-88``)."""
        return [r["term"] for r in self.terms.select("term").orderBy("term").collect()]

    def query(self, query: str, ranked_flag: bool = False):
        """Reference-compatible dispatch (``query.py:29-33``)."""
        if ranked_flag:
            return self.ranked_query(query, DEFAULT_K)
        return self.boolean_query(query)
