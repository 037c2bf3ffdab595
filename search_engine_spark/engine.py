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

import re
import shlex
from math import log
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from search_engine_spark import fsio
from search_engine_spark.build import IndexBuilder  # noqa: F401  (re-export)
from search_engine_spark.functions import codec
from search_engine_spark.text.kgrams import kgrams, wildcard_grams
from search_engine_spark.text.normalize import (
    analyze,
    query_normalize,
    remove_special_characters,
)

JACCARD_THRESHOLD = 0.35  # reference query.py:14
DEFAULT_K = 10  # reference query.py:25


def _block_scorer(k: int | None):
    """Per-block exhaustive scorer for ``applyInPandas``.

    Input rows: one per (query term, this block) with wqt, qidx and the
    encoded postings/weights. Output: (doc_id, score) for the block —
    the block's top-k when ``k`` is set (tie-break doc_id asc, matching
    ``diskindex.py:98-99``), or every scored doc when ``k`` is None.
    Blocks partition the doc space, so a doc's score is COMPLETE within
    its block and the global top-k is a subset of the union of
    per-block top-ks — every top-k consumer (exhaustive DataFrame path,
    WAND scoring rounds) passes ``k`` and ships k rows per block, never
    the block's full doc range.
    """

    def score(
        pdf: pd.DataFrame,
        *,
        allowed: np.ndarray | None = None,
        blocked: np.ndarray | None = None,
    ) -> pd.DataFrame:
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
        if allowed is not None:
            # predicate filtering happens BEFORE top-k truncation — a
            # filtered-out doc must never occupy a top-k slot
            keep = np.isin(docs, allowed)
            docs, partials, weights = docs[keep], partials[keep], weights[keep]
        if blocked is not None and blocked.size:
            # tombstone masking, also pre-top-k: a deleted doc must
            # neither occupy a slot nor inflate the WAND threshold
            keep = ~np.isin(docs, blocked)
            docs, partials, weights = docs[keep], partials[keep], weights[keep]
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


def _block_scorer_keyed(k: int | None):
    """``_block_scorer`` for (query_id, block_id) groups — the batch
    path scores every query's blocks in ONE job; the key's query_id is
    re-attached to the output rows."""
    inner = _block_scorer(k)

    def score(key, pdf):
        out = inner(pdf)
        out.insert(0, "query_id", int(key[0]))
        return out

    return score


def _block_bm25_scorer(k: int | None, k1: float, b: float, avgdl: float):
    """Per-block BM25 scorer for ``applyInPandas``.

    partial = wqt * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
    wqt = idf; doc lengths ride inside the block (``doclens_bin``), so
    scoring needs no doc_stats join. Accumulation in qidx order,
    tie-break doc_id asc — same discipline as the tf-idf scorer.
    """

    def score(
        pdf: pd.DataFrame,
        *,
        allowed: np.ndarray | None = None,
        blocked: np.ndarray | None = None,
    ) -> pd.DataFrame:
        order = np.argsort(pdf["qidx"].to_numpy(), kind="stable")
        doc_parts, partial_parts = [], []
        for i in order:
            d, t = codec.decode_postings(bytes(pdf["postings_bin"].iloc[i]))
            dl = codec.vb_decode(bytes(pdf["doclens_bin"].iloc[i])).astype(
                np.float64
            )
            denom = t + k1 * (1.0 - b + b * dl / avgdl)
            doc_parts.append(d)
            partial_parts.append(pdf["wqt"].iloc[i] * (t * (k1 + 1.0)) / denom)
        docs = np.concatenate(doc_parts)
        partials = np.concatenate(partial_parts)
        if allowed is not None:
            keep = np.isin(docs, allowed)
            docs, partials = docs[keep], partials[keep]
        if blocked is not None and blocked.size:
            keep = ~np.isin(docs, blocked)
            docs, partials = docs[keep], partials[keep]
        uniq, inv = np.unique(docs, return_inverse=True)
        acc = np.zeros(uniq.size)
        np.add.at(acc, inv, partials)
        idx = np.lexsort((uniq, -acc))
        if k is not None:
            idx = idx[:k]
        return pd.DataFrame({"doc_id": uniq[idx], "score": acc[idx]})

    return score


def _block_set_op(n_required: int | None):
    """Per-block boolean doc-set worker: AND of all ``n_required``
    distinct terms (``utils.py:33-51``) or, when None, OR across
    whatever terms are present (``utils.py:54-92``)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # accumulate per term (never overwrite): (term, block_id) rows
        # are unique by construction, but segments concatenate safely
        # if an old/foreign index ever violates that
        arrs: dict[object, list[np.ndarray]] = {}
        for term, blob in zip(pdf["term"], pdf["postings_bin"]):
            d, _ = codec.decode_postings(bytes(blob))
            arrs.setdefault(term, []).append(d)
        merged = [np.concatenate(v) if len(v) > 1 else v[0] for v in arrs.values()]
        if n_required is None:
            out = np.unique(np.concatenate(merged))
        elif len(merged) < n_required:
            out = np.empty(0, dtype=np.int64)
        else:
            out = reduce(np.intersect1d, merged)
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


def _block_colloc_pairs(block_span: int):
    """Per-block adjacent-bigram partial counts from posting positions
    (the decode half of index-backed collocations).

    Same composite-key trick as :func:`_block_phrase`: every decoded
    occurrence becomes ``(doc_id - block_base) * 2^33 + pos``; an
    adjacent pair (term_a at pos, term_b at pos+1, same doc) is then a
    hash-merge of the occurrence table against itself on ``key`` vs
    ``key - 1`` — positions are doc-local and < 2^33, so a doc's last
    position + 1 can never alias into the next doc's key space, and
    blocks partition the doc space, so no pair crosses a block.
    Multi-term positions (dehyphenation sub-terms share one position,
    ``normalize.py`` semantics) contribute their cross product, exactly
    the self-join semantics of the positional-dump oracle. Output is
    pre-aggregated per block: (term_a, term_b, cnt).
    """

    def run(key, pdf):
        base = int(key[0]) * block_span
        keys: list[np.ndarray] = []
        terms: list[np.ndarray] = []
        for term, pblob, posblob in zip(
            pdf["term"], pdf["postings_bin"], pdf["positions_bin"]
        ):
            d, t = codec.decode_postings(bytes(pblob))
            flat = codec.decode_positions_flat(bytes(posblob), t)
            keys.append((np.repeat(d, t) - base) * np.int64(1 << 33) + flat)
            terms.append(np.full(len(flat), str(term), dtype=object))
        empty = pd.DataFrame(
            {
                "term_a": pd.Series([], dtype=object),
                "term_b": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype="int64"),
            }
        )
        if not keys:
            return empty
        k_all = np.concatenate(keys)
        t_all = np.concatenate(terms)
        left = pd.DataFrame({"k": k_all, "term_a": t_all})
        right = pd.DataFrame({"k": k_all - np.int64(1), "term_b": t_all})
        m = left.merge(right, on="k")
        if m.empty:
            return empty
        out = (
            m.groupby(["term_a", "term_b"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out["cnt"] = out["cnt"].astype("int64")
        return out[["term_a", "term_b", "cnt"]]

    return run


def _cogroup_filtered(scorer):
    """Adapter turning a block scorer into a ``cogroup().applyInPandas``
    worker for metadata-filtered retrieval: the left side is the
    block's (query term, postings) cells, the right side is the
    block's ALLOWED doc_ids (the docs-table predicate's survivors,
    co-shuffled by block_id). The scorer masks candidates against the
    allowed set before its per-block top-k — filtering happens before
    truncation, so a filtered-out doc can never displace an allowed
    one. A block with no allowed docs (or, for a stopword-free
    predicate column, no query-term cells) short-circuits to empty."""

    def run(cells: pd.DataFrame, allowed: pd.DataFrame) -> pd.DataFrame:
        if len(cells) == 0 or len(allowed) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.empty(0, dtype=np.int64),
                    "score": np.empty(0, dtype=np.float64),
                }
            )
        return scorer(cells, allowed=allowed["doc_id"].to_numpy())

    return run


def _cogroup_blocked(scorer):
    """Adapter turning a block scorer into a ``cogroup().applyInPandas``
    worker for tombstone masking: the left side is the block's (query
    term, postings) cells, the right side is the block's DELETED
    doc_ids (the tombstone snapshot, co-shuffled by block_id so each
    worker sees exactly the deletions that can touch its docs). The
    scorer drops deleted candidates BEFORE its per-block top-k — a
    deleted doc must neither occupy a top-k slot nor (on the WAND
    scoring rounds) inflate the pruning threshold, which would
    over-prune live results. A block with no tombstones scores
    untouched; a tombstone-only group (no cells) short-circuits."""

    def run(cells: pd.DataFrame, tomb: pd.DataFrame) -> pd.DataFrame:
        if len(cells) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.empty(0, dtype=np.int64),
                    "score": np.empty(0, dtype=np.float64),
                }
            )
        blocked = tomb["doc_id"].to_numpy() if len(tomb) else None
        return scorer(cells, blocked=blocked)

    return run


def _cogroup_blocked_keyed(k: int | None):
    """Tombstone-masked :func:`_block_scorer_keyed` — the batch paths'
    (query_id, block_id)-keyed groups, cogrouped with that pair's
    tombstones (the per-block tombstone set joined to each query id)."""
    inner = _block_scorer(k)

    def run(key, cells: pd.DataFrame, tomb: pd.DataFrame) -> pd.DataFrame:
        if len(cells) == 0:
            return pd.DataFrame(
                {
                    "query_id": np.empty(0, dtype=np.int32),
                    "doc_id": np.empty(0, dtype=np.int64),
                    "score": np.empty(0, dtype=np.float64),
                }
            )
        blocked = tomb["doc_id"].to_numpy() if len(tomb) else None
        out = inner(cells, blocked=blocked)
        out.insert(0, "query_id", int(key[0]))
        return out

    return run


def _cogroup_boosted(k: int | None, scorer_factory=None):
    """Field/metadata-boosted scoring adapter: the right cogroup side
    carries this block's (doc_id, boost) rows for docs whose boost
    multiplier differs from 1.0, plus boost-NULL rows for tombstoned
    docs (one co-shuffled side encodes both, see
    :meth:`TranscriptSearchEngine._boosts_by_block`). The scorer
    (tf-idf by default; any ``_block_*_scorer`` factory, e.g. BM25)
    runs un-truncated (k=None — every doc's base score is complete
    within its block), boosts multiply AFTER the base-score
    normalization (the BM25F-style "field weight on the whole-doc
    score" form), and ONLY THEN the per-block top-k applies — a
    boosted doc must be able to displace an unboosted one and vice
    versa, so truncation before the multiply would be wrong. Docs
    without a boost row keep weight 1.0; at scale the right side is
    O(boosted docs + tombstones) per block, not O(corpus)."""
    inner = (scorer_factory or _block_scorer)(None)

    def run(cells: pd.DataFrame, boosts: pd.DataFrame) -> pd.DataFrame:
        if len(cells) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.empty(0, dtype=np.int64),
                    "score": np.empty(0, dtype=np.float64),
                }
            )
        blocked = None
        if len(boosts):
            dead = boosts.loc[boosts["boost"].isna(), "doc_id"].to_numpy()
            if dead.size:
                blocked = dead
        out = inner(cells, blocked=blocked)
        if len(boosts):
            live = boosts.dropna(subset=["boost"])
            if len(live):
                m = out.merge(
                    live[["doc_id", "boost"]], on="doc_id", how="left"
                )
                out["score"] = (
                    out["score"].to_numpy()
                    * m["boost"].fillna(1.0).to_numpy()
                )
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        if k is not None:
            out = out.head(k)
        return out

    return run


def _cogroup_diverse(k: int, per_group: int):
    """Diversified (per-group-capped) top-k adapter: at most
    ``per_group`` results from any one group (conversation) in the
    final ranking. The right side maps this block's docs to their
    group keys; the merge is INNER, so docs absent from it (tombstoned
    ids are anti-joined out upstream) drop out before ranking.

    Correctness of the per-block cap: order docs by the total order
    (score desc, doc_id asc). If doc d belongs to the global
    diversified top-k, then (a) d is among the global top
    ``per_group`` of its group, hence also among the top ``per_group``
    of its group's docs WITHIN ITS BLOCK (ranking within a subset can
    only improve), so d survives the per-(block, group) cap; and (b)
    for every block-capped survivor e ahead of d, e's group's global
    top-``per_group`` contains a doc ahead of e (pointwise: the
    group's global j-th best beats its block-local j-th best), giving
    an injection from block survivors ahead of d into GLOBAL
    diversified candidates ahead of d — fewer than k of those exist,
    so d is inside the block's top-k too. The global re-cap + top-k
    over the n_blocks*k survivors happens in the DataFrame plan
    (window + limit over tiny rows)."""
    inner = _block_scorer(None)

    def run(cells: pd.DataFrame, groups: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "group_key": np.empty(0, dtype=object),
                "score": np.empty(0, dtype=np.float64),
            }
        )
        if len(cells) == 0 or len(groups) == 0:
            return empty
        out = inner(cells)
        m = out.merge(groups[["doc_id", "group_key"]], on="doc_id", how="inner")
        if not len(m):
            return empty
        m = m.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        m = m[m.groupby("group_key", sort=False).cumcount() < per_group]
        return m.head(k)[["doc_id", "group_key", "score"]]

    return run


def _block_near(term_a: str, term_b: str, max_dist: int, block_span: int):
    """Per-block positional NEAR/k matcher (proximity search).

    Same composite-key trick as :func:`_block_phrase`: each (doc,
    position) pair becomes ``(doc_id - block_base) * 2^33 + pos +
    max_dist`` (the ``+ max_dist`` keeps shifted keys non-negative;
    ``pos + 2*max_dist`` stays < 2^33 for any in-block position). A
    pair of occurrences with ``pos_a - pos_b = delta`` shows up as a
    key collision between ``keys_a`` and ``keys_b + delta``, so the
    NEAR/k docs are the union over ``delta in [-k..k] \\ {0}`` of
    ``intersect1d(keys_a, keys_b + delta)`` — fully vectorized,
    2k sorted intersects per block, no per-doc Python loop.
    ``a NEAR/k a`` needs two DISTINCT positions, which the symmetric
    ``delta in [1..k]`` half-window gives for free.
    """
    same = term_a == term_b
    deltas = (
        list(range(1, max_dist + 1))
        if same
        else [d for d in range(-max_dist, max_dist + 1) if d != 0]
    )

    def run(key, pdf):
        base = int(key[0]) * block_span
        per_term: dict[str, list[np.ndarray]] = {}
        for term, pblob, posblob in zip(
            pdf["term"], pdf["postings_bin"], pdf["positions_bin"]
        ):
            d, t = codec.decode_postings(bytes(pblob))
            flat = codec.decode_positions_flat(bytes(posblob), t)
            comp = (np.repeat(d, t) - base) * np.int64(1 << 33) + (
                flat + max_dist
            )
            per_term.setdefault(str(term), []).append(comp)
        if term_a not in per_term or term_b not in per_term:
            return pd.DataFrame({"doc_id": np.empty(0, dtype=np.int64)})
        ka = np.concatenate(per_term[term_a])
        kb = ka if same else np.concatenate(per_term[term_b])
        hits = [np.intersect1d(ka, kb + np.int64(delta)) for delta in deltas]
        common = np.concatenate(hits) if hits else np.empty(0, dtype=np.int64)
        docs = np.unique(common >> np.int64(33)) + base
        return pd.DataFrame({"doc_id": docs})

    return run


def _cogroup_fg_df():
    """Per-block foreground-df counter for significant-terms: the left
    cogroup side is EVERY posting cell of a block that contains
    foreground docs, the right side is that block's foreground doc ids.
    Emits (term, fg_df_partial) = how many foreground docs of this
    block contain the term; partials sum exactly (integers, and blocks
    partition the doc space). Only posting DECODE happens here — the
    corpus text is never touched."""

    def run(cells: pd.DataFrame, fg: pd.DataFrame) -> pd.DataFrame:
        if len(cells) == 0 or len(fg) == 0:
            return pd.DataFrame(
                {
                    "term": pd.Series(dtype=object),
                    "fg_df": pd.Series(dtype="int64"),
                }
            )
        allowed = np.unique(fg["doc_id"].to_numpy())
        agg: dict[object, int] = {}
        for term, blob in zip(cells["term"], cells["postings_bin"]):
            d, _t = codec.decode_postings(bytes(blob))
            c = int(np.isin(d, allowed, assume_unique=True).sum())
            if c:
                agg[term] = agg.get(term, 0) + c
        return pd.DataFrame(
            {"term": list(agg), "fg_df": np.fromiter(agg.values(), "int64", len(agg))}
        )

    return run


def _cogroup_keywords(n: int, n_docs: float):
    """Per-block keywords worker: left side = every posting cell of the
    block, right side = (term, df) for the block's terms (the slim
    dictionary join, co-shuffled by block). A doc lives entirely inside
    its block, so its top-n terms by ``(1+ln tf)·ln(1+N/df)`` are
    COMPLETE here — no corpus-wide window. Ranking uses the UNROUNDED
    score (ties on term asc), matching ``simple.keywords``."""

    def run(cells: pd.DataFrame, dfs: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "term": pd.Series(dtype=object),
                "tf_idf": np.empty(0, dtype=np.float64),
                "rank": np.empty(0, dtype=np.int32),
            }
        )
        if len(cells) == 0 or len(dfs) == 0:
            return empty
        dmap = dict(zip(dfs["term"], dfs["df"]))
        doc_parts, term_parts, score_parts = [], [], []
        for term, blob in zip(cells["term"], cells["postings_bin"]):
            df_t = dmap.get(term)
            if not df_t:
                continue
            d, t = codec.decode_postings(bytes(blob))
            wqt = log(1.0 + n_docs / float(df_t))
            doc_parts.append(d)
            score_parts.append((1.0 + np.log(t)) * wqt)
            term_parts.append(np.full(d.size, term, dtype=object))
        if not doc_parts:
            return empty
        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        terms = np.concatenate(term_parts).astype(str)
        order = np.lexsort((terms, -scores, docs))
        d_s, s_s, t_s = docs[order], scores[order], terms[order]
        idx = np.arange(d_s.size)
        newdoc = np.r_[True, d_s[1:] != d_s[:-1]]
        start = np.maximum.accumulate(np.where(newdoc, idx, 0))
        rank = (idx - start + 1).astype(np.int32)
        keep = rank <= n
        return pd.DataFrame(
            {
                "doc_id": d_s[keep],
                "term": t_s[keep],
                "tf_idf": s_s[keep],
                "rank": rank[keep],
            }
        )

    return run


def _block_synonym_scorer(k: int | None):
    """Per-block synonym-group scorer (Lucene ``SynonymQuery``): each
    group of stems scores as ONE pseudo-term — ``gtf = sum`` of member
    tfs per doc, weighted by the group's pre-computed ``wqt`` (from the
    group's ANY-member df). Accumulation per doc runs in ascending
    ``gid`` order (a fixed fold, so the float result is reproducible
    cross-engine), normalization by the in-block L_d, tie-break doc_id
    asc — the :func:`_block_scorer` discipline with group-tf blending
    in front. ``allowed``/``blocked`` kwargs keep it pluggable into
    the filter/tombstone cogroup adapters."""

    def score(
        pdf: pd.DataFrame,
        *,
        allowed: np.ndarray | None = None,
        blocked: np.ndarray | None = None,
    ) -> pd.DataFrame:
        per_gid: dict[int, list[tuple[np.ndarray, np.ndarray, np.ndarray]]] = {}
        wqt_by_gid: dict[int, float] = {}
        for gid, wqt, pblob, wblob in zip(
            pdf["gid"], pdf["wqt"], pdf["postings_bin"], pdf["weights_bin"]
        ):
            d, t = codec.decode_postings(bytes(pblob))
            w = np.frombuffer(bytes(wblob), dtype="<f8")
            per_gid.setdefault(int(gid), []).append((d, t, w))
            wqt_by_gid[int(gid)] = float(wqt)
        doc_parts, partial_parts, weight_parts = [], [], []
        for gid in sorted(per_gid):
            parts = per_gid[gid]
            docs_g = np.concatenate([p[0] for p in parts])
            tfs_g = np.concatenate([p[1] for p in parts]).astype(np.float64)
            w_g = np.concatenate([p[2] for p in parts])
            uq, inv = np.unique(docs_g, return_inverse=True)
            gtf = np.zeros(uq.size)
            np.add.at(gtf, inv, tfs_g)  # integer tfs: exact in float64
            ld = np.empty(uq.size)
            ld[inv] = w_g
            doc_parts.append(uq)
            partial_parts.append(wqt_by_gid[gid] * (1.0 + np.log(gtf)))
            weight_parts.append(ld)
        docs = np.concatenate(doc_parts)
        partials = np.concatenate(partial_parts)
        weights = np.concatenate(weight_parts)
        if allowed is not None:
            keep = np.isin(docs, allowed)
            docs, partials, weights = docs[keep], partials[keep], weights[keep]
        if blocked is not None and blocked.size:
            keep = ~np.isin(docs, blocked)
            docs, partials, weights = docs[keep], partials[keep], weights[keep]
        uniq, inv = np.unique(docs, return_inverse=True)
        acc = np.zeros(uniq.size)
        np.add.at(acc, inv, partials)  # gid-ascending addition order
        ld = np.empty(uniq.size)
        ld[inv] = weights
        scores = acc / ld
        idx = np.lexsort((uniq, -scores))
        if k is not None:
            idx = idx[:k]
        return pd.DataFrame({"doc_id": uniq[idx], "score": scores[idx]})

    return score


def _block_group_union():
    """Per-block ANY-member doc counter for synonym groups: emits
    (gid, df_partial) = |union of the group's member doc sets within
    this block|. Blocks partition the doc space, so the integer
    partials sum to the group's exact corpus df."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs: dict[int, list[np.ndarray]] = {}
        for gid, blob in zip(pdf["gid"], pdf["postings_bin"]):
            d, _t = codec.decode_postings(bytes(blob))
            arrs.setdefault(int(gid), []).append(d)
        gids = sorted(arrs)
        return pd.DataFrame(
            {
                "gid": np.array(gids, dtype=np.int32),
                "df": np.array(
                    [
                        int(np.unique(np.concatenate(arrs[g])).size)
                        for g in gids
                    ],
                    dtype=np.int64,
                ),
            }
        )

    return run


def _cogroup_conv_tf():
    """Per-block (conv, term, role, tf) extractor for index-backed
    BM25F: the left cogroup side is the query-pruned posting cells of a
    block, the right side is that block's docs metadata (doc_id →
    conv_id, role). Decodes the cells, maps each posting's doc to its
    conversation and role, and emits block-local integer partials
    (summed exactly downstream). The corpus text is never re-tokenized
    — tfs come from the index."""

    def run(cells: pd.DataFrame, meta: pd.DataFrame) -> pd.DataFrame:
        if len(cells) == 0 or len(meta) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "term": pd.Series(dtype=object),
                    "role": pd.Series(dtype=object),
                    "tf": pd.Series(dtype="int64"),
                }
            )
        m = meta.drop_duplicates("doc_id").set_index("doc_id")
        doc_parts, term_parts, tf_parts = [], [], []
        for term, blob in zip(cells["term"], cells["postings_bin"]):
            d, t = codec.decode_postings(bytes(blob))
            doc_parts.append(d)
            tf_parts.append(t.astype(np.int64))
            term_parts.append(np.full(d.size, term, dtype=object))
        long = pd.DataFrame(
            {
                "doc_id": np.concatenate(doc_parts),
                "term": np.concatenate(term_parts),
                "tf": np.concatenate(tf_parts),
            }
        )
        long = long.join(m[["conv_id", "role"]], on="doc_id", how="inner")
        out = (
            long.groupby(["conv_id", "term", "role"], as_index=False)["tf"]
            .sum()
        )
        return out[["conv_id", "term", "role", "tf"]]

    return run


def _cogroup_trend_tf():
    """Per-block (term, bucket, n_turns, tf_sum) partials for the
    index-backed term-trends view: the left cogroup side is the
    query-pruned posting cells of one block, the right side that
    block's (doc_id, bucket) metadata — the bucket is precomputed
    JVM-side from ``ts`` by exact integer-microsecond arithmetic, so
    only two thin long columns cross into Arrow. Decodes the cells,
    maps each posting's doc to its time bucket, and emits block-local
    integer partials (summed exactly downstream). The corpus text is
    never re-tokenized — tfs come from the index."""

    def run(cells: pd.DataFrame, meta: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "term": pd.Series(dtype=object),
                "bucket": pd.Series(dtype="int64"),
                "n_turns": pd.Series(dtype="int64"),
                "tf_sum": pd.Series(dtype="int64"),
            }
        )
        if len(cells) == 0 or len(meta) == 0:
            return empty
        m = meta.drop_duplicates("doc_id").set_index("doc_id")
        doc_parts, term_parts, tf_parts = [], [], []
        for term, blob in zip(cells["term"], cells["postings_bin"]):
            d, t = codec.decode_postings(bytes(blob))
            doc_parts.append(d)
            tf_parts.append(t.astype(np.int64))
            term_parts.append(np.full(d.size, term, dtype=object))
        long = pd.DataFrame(
            {
                "doc_id": np.concatenate(doc_parts),
                "term": np.concatenate(term_parts),
                "tf": np.concatenate(tf_parts),
            }
        )
        # inner join drops postings whose doc is absent from meta
        # (tombstone-masked upstream) — the mask composes with the
        # block-local pre-aggregation for free
        long = long.join(m[["bucket"]], on="doc_id", how="inner")
        if len(long) == 0:
            return empty
        out = long.groupby(["term", "bucket"], as_index=False).agg(
            n_turns=("tf", "size"), tf_sum=("tf", "sum")
        )
        return out[["term", "bucket", "n_turns", "tf_sum"]]

    return run


class TranscriptSearchEngine:
    #: default byte ceiling above which a table is never persisted —
    #: big enough for every dictionary/kgram table we build locally,
    #: far below any real postings table.
    CACHE_MAX_BYTES = 256 << 20

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache: bool = True,
        cache_max_bytes: int | None = None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.cache = cache
        self.cache_max_bytes = (
            self.CACHE_MAX_BYTES if cache_max_bytes is None else cache_max_bytes
        )
        meta = fsio.read_json_atomic(spark, fsio.join(index_dir, "_meta.json"))
        from search_engine_spark.build import FORMAT_VERSION

        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"index at {index_dir} has format_version "
                f"{meta.get('format_version')}, this engine needs "
                f"{FORMAT_VERSION} — rebuild the index"
            )
        self._apply_meta(meta)
        self._tables: dict[str, DataFrame] = {}

    def _apply_meta(self, meta: dict) -> None:
        self.num_docs: int = meta["num_docs"]
        self.total_tokens: int = meta["total_tokens"]
        self.block_span: int = meta["block_span"]
        self.term_buckets: int = meta["term_buckets"]
        # the dictionary is a versioned snapshot and compaction rotates
        # the data tables under generation-suffixed names — meta carries
        # the current pointers (flipped atomically by the writers)
        self._terms_name: str = meta["terms_table"]
        self._table_names: dict[str, str] = meta.get("tables", {})
        # logical deletes (Lucene live-docs semantics): every query
        # masks these doc ids; scoring statistics stay pre-delete until
        # compaction purges (see IndexBuilder.delete)
        self._tombstones_name: str | None = meta.get("tombstones_table")
        self.num_deleted: int = meta.get("num_deleted", 0)

    def _load(self, name: str) -> DataFrame:
        """Lazily read an index table, size-gated for caching.

        Tables load on FIRST USE, not at engine open: a ranked/boolean
        session never touches kgrams or doc_stats, so it never pays
        their scan or cache memory. Caching is gated on on-disk bytes
        (``cache_max_bytes``): small dictionaries/kgram tables persist
        (coalesced to 1 partition per 32 MB so query stages schedule a
        handful of tasks), while anything larger — above all
        ``postings`` — is returned as the raw Parquet relation so the
        bucket/term predicates keep reaching the scan as
        PartitionFilters/PushedFilters. A persisted-but-cold
        InMemoryRelation would not push those predicates, so caching a
        100 TB postings table would turn the first query into a
        full-index read; the gate keeps the default config at
        O(query terms) I/O, matching the reference's query-restricted
        load (``diskindex.py:59-80``).
        """
        if name in self._tables:
            return self._tables[name]
        path = fsio.join(self.index_dir, self._table_names.get(name, name))
        df = self.spark.read.parquet(path)
        # postings and docs NEVER persist: queries touch O(query terms)
        # of postings via storage pruning and O(k) of docs — caching
        # either would cost an O(index) scan to fill and lose pushdown.
        if self.cache and name not in ("docs", "postings"):
            nbytes = fsio.tree_bytes(self.spark, path)
            if nbytes <= self.cache_max_bytes:
                limit = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
                parts = max(1, min(limit, nbytes // (32 << 20) + 1))
                df = df.coalesce(int(parts))
                # evict any stale cache entry for the same plan: Spark's
                # CacheManager matches by canonicalized plan (i.e. by
                # PATH), so an engine opened after rebuilding an index at
                # the same path would otherwise be served the PREVIOUS
                # index's rows
                df.unpersist(blocking=False)
                df.persist(StorageLevel.MEMORY_AND_DISK)
        self._tables[name] = df
        return df

    @property
    def postings(self) -> DataFrame:
        return self._load("postings")

    @property
    def terms(self) -> DataFrame:
        return self._load(self._terms_name)

    @property
    def doc_stats(self) -> DataFrame:
        return self._load("doc_stats")

    @property
    def kgrams(self) -> DataFrame:
        return self._load("kgrams")

    @property
    def docs(self) -> DataFrame:
        return self._load("docs")

    @property
    def tombstones(self) -> DataFrame | None:
        """(doc_id, block_id) of logically deleted docs, or None when
        the index has no deletes. Small between compactions (it holds
        DELETES, not docs), so the size gate in :meth:`_load` caches it
        like a dictionary table."""
        if self._tombstones_name is None:
            return None
        return self._load(self._tombstones_name)

    @property
    def num_live(self) -> int:
        """Documents visible to queries (num_docs minus tombstones)."""
        return self.num_docs - self.num_deleted

    def _mask_deleted(self, df: DataFrame) -> DataFrame:
        """Drop tombstoned doc ids from a doc-set result (boolean /
        phrase / NEAR outputs — no top-k involved, so post-filtering is
        exact). Broadcast anti-join while the tombstone set is small;
        past the threshold it falls back to a shuffled anti-join (and
        the right fix is to run compact())."""
        tomb = self.tombstones
        if tomb is None:
            return df
        t = tomb.select("doc_id")
        if self.num_deleted <= 5_000_000:
            t = F.broadcast(t)
        return df.join(t, "doc_id", "left_anti")

    # ------------------------------------------------------- pruned scans
    def _postings_for_terms(self, terms) -> DataFrame:
        """Postings scan restricted to ``terms`` — the reference's
        query-restricted index load (``diskindex.py:59-80``) as storage
        pruning: ``bucket.isin`` prunes whole directories (partition
        filter, no footer reads), ``term.isin`` is pushed into the
        Parquet scan where row-group min/max on the term-sorted files
        skips everything else. Query I/O is O(query terms), not
        O(index size) — the point of the reference's B-tree dictionary
        (``diskindex.py:203``)."""
        from search_engine_spark.build import term_bucket

        uniq = sorted(set(terms))
        buckets = sorted({term_bucket(t, self.term_buckets) for t in uniq})
        return self.postings.where(
            F.col("bucket").isin(buckets) & F.col("term").isin(uniq)
        )

    def _term_dfs(self, terms) -> dict[str, int]:
        """Document frequencies from the dictionary (``query.py:80``) —
        an isin-pushed scan of the terms table; only matching row
        groups are read."""
        uniq = sorted(set(terms))
        rows = (
            self.terms.where(F.col("term").isin(uniq))
            .select("term", "df")
            .collect()
        )
        return {r["term"]: r["df"] for r in rows}

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

    def append(self, transcripts: DataFrame) -> dict:
        """Incrementally index new transcripts (one new committed chunk,
        O(new docs) — see :meth:`IndexBuilder.append`), then refresh
        this engine's cached tables and corpus statistics."""
        info = IndexBuilder(
            self.spark,
            self.index_dir,
            block_span=self.block_span,
            term_buckets=self.term_buckets,
        ).append(transcripts)
        self._refresh()
        return info

    def delete(self, doc_ids) -> dict:
        """Tombstone-delete docs (list of ids or a DataFrame with a
        ``doc_id`` column — see :meth:`IndexBuilder.delete`). Logical
        and O(deletes): every subsequent query masks the ids, scoring
        statistics stay pre-delete until :meth:`compact` purges
        (Lucene's live-docs discipline)."""
        info = IndexBuilder(
            self.spark,
            self.index_dir,
            block_span=self.block_span,
            term_buckets=self.term_buckets,
        ).delete(doc_ids)
        self._refresh()
        return info

    def delete_duplicates(self, threshold: float = 0.7, **dedup_kwargs) -> dict:
        """The dedup→delete composition: find near-duplicate turns in
        the indexed corpus (MinHash-LSH pairs → connected components →
        one survivor per cluster, ``ops.components.dedup_groups``) and
        tombstone every non-representative. Fully cluster-side — the
        loser set flows into :meth:`delete` as a DataFrame, so nothing
        corpus-sized touches the driver; a later :meth:`compact` purges
        the losers physically. Returns delete()'s summary."""
        from search_engine_spark.ops import components

        losers = (
            components.dedup_groups(
                self.docs, threshold=threshold, **dedup_kwargs
            )
            .where(~F.col("keep"))
            .select("doc_id")
        )
        return self.delete(losers)

    def compact(self) -> dict:
        """Consolidate chunks / vacuum orphans / dedup dictionaries /
        purge tombstones (:meth:`IndexBuilder.compact`), then refresh
        this engine."""
        info = IndexBuilder(
            self.spark,
            self.index_dir,
            block_span=self.block_span,
            term_buckets=self.term_buckets,
        ).compact()
        self._refresh()
        return info

    def _refresh(self) -> None:
        """Drop cached tables and re-read meta (after append/compact)."""
        for df in self._tables.values():
            try:
                df.unpersist()
            except Exception:
                pass
        self._tables.clear()
        self._apply_meta(
            fsio.read_json_atomic(self.spark, fsio.join(self.index_dir, "_meta.json"))
        )

    # ----------------------------------------------------------------- ranked
    def ranked_query_df(
        self, query: str, k: int = DEFAULT_K, where=None
    ) -> DataFrame:
        """Top-k scoring as one DataFrame plan: (doc_id, score).

        ``where`` (Column or SQL string over the docs table's metadata
        columns — role, tool, ts, conv_id …) restricts the ranking to
        matching docs: "top-k among assistant turns", "top-k in this
        time window". See :meth:`_allowed_by_block` for the execution
        shape."""
        terms = self._ranked_terms(query)
        return self._score_terms_df(terms, k, where=where)

    def ranked_query(
        self,
        query: str,
        k: int = DEFAULT_K,
        pruned: bool = False,
        where=None,
    ) -> list[tuple[int, float]]:
        """Top-k ranked retrieval. ``pruned=True`` uses block-max WAND
        pruning — provably rank-identical, decodes fewer posting blocks
        (``tests/test_wand.py`` asserts equality vs exhaustive).
        ``where`` filters by docs metadata (exhaustive path only: WAND's
        block upper bounds are filter-oblivious, so a selective filter
        would defeat the pruning they exist for)."""
        if pruned:
            if where is not None:
                raise NotImplementedError(
                    "pruned=True with where= is not supported; the "
                    "exhaustive filtered path is the scale-correct plan"
                )
            return self.ranked_query_wand(query, k)
        df = self.ranked_query_df(query, k, where=where)
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    # -------------------------------------------------------- block-max WAND
    def ranked_query_wand(self, query: str, k: int = DEFAULT_K) -> list[tuple[int, float]]:
        """Block-max WAND top-k: rank-identical to exhaustive scoring.

        Postings are stored per (term, doc-range block) with
        ``max_partial`` = max over the block of (1+ln tf)/L_d
        (``build.py::_partial_block_encoder``). Since a doc's terms all
        live in the doc's own block range, the per-block score upper
        bound is

            ub(b) = sum over query terms t present in b of m_t * wqt_t * max_partial_{t,b}

        Block selection is CLUSTER-SIDE: one DataFrame aggregation over
        the term-pruned metadata columns (the binary posting columns
        are never scanned — Catalyst prunes them) computes ub per
        block; the driver collects only

        1. the top ``max(k, 32)`` block ids by ub (a distributed
           TakeOrdered — each block holds >= 1 doc and blocks partition
           the doc space, so these yield >= k exact candidate scores
           and hence the running k-th score L), then
        2. the ids of remaining blocks with ub >= L (WAND's survivors;
           a pruned block cannot contain a doc with score > L, nor a
           score == L tie, because ties break on doc_id only among
           EQUAL scores and ub >= score for every doc in the block).

        At a 10^12-turn corpus a stopword query has ~15M blocks; the
        driver never sees them — only the handful whose upper bound
        survives. Each round's exact scoring is the same plan as the
        exhaustive path restricted to the selected block ids, so
        correctness reduces to the threshold argument above. The ub
        comparison carries a 1e-9 relative slack so float re-association
        between the JVM aggregate and the numpy scorer can only ever
        UNDER-prune (score a few extra blocks), never over-prune.
        """
        occurrences = self._weighted_occurrences(self._ranked_terms(query))
        return self._wand_topk(
            occurrences,
            row_ub=F.col("wqt") * F.col("max_partial"),
            scorer_factory=_block_scorer,
            payload_cols=("postings_bin", "weights_bin"),
            k=k,
        )

    def bm25_query_wand(
        self, query: str, k: int = DEFAULT_K, k1: float = 1.2, b: float = 0.75
    ) -> list[tuple[int, float]]:
        """Block-max WAND BM25, rank-identical to :meth:`bm25_query`.

        The per-cell upper bound uses the cell's block-max metadata:
        BM25's norm is increasing in tf and decreasing in dl, so
        ``idf * f(max_tf, min_dl)`` bounds every posting in the cell.
        """
        occurrences = self._bm25_occurrences(self._ranked_terms(query))
        if not occurrences:
            self._last_wand_stats = {"round1_blocks": 0, "round2_blocks": 0}
            return []
        avgdl = self.total_tokens / self.num_docs
        mt = F.col("max_tf").cast("double")
        row_ub = F.col("wqt") * (
            (mt * F.lit(k1 + 1.0))
            / (
                mt
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("min_dl").cast("double") / F.lit(avgdl)
                )
            )
        )
        return self._wand_topk(
            occurrences,
            row_ub=row_ub,
            scorer_factory=lambda kk: _block_bm25_scorer(kk, k1, b, avgdl),
            payload_cols=("postings_bin", "doclens_bin"),
            k=k,
        )

    def _wand_topk(
        self,
        occurrences: list[tuple[str, int, float]],
        row_ub,
        scorer_factory,
        payload_cols: tuple[str, ...],
        k: int,
    ) -> list[tuple[int, float]]:
        """Shared block-max selection (see :meth:`ranked_query_wand`):
        cluster-side upper bounds, two collect-only-survivors rounds,
        exact scoring of selected blocks with ``scorer_factory(k)`` —
        each selected block ships its top-k rows to the driver (k per
        block, not the block's up-to-``block_span`` docs; the global
        top-k and the round-1 threshold both survive per-block
        truncation because blocks partition the doc space)."""
        if not occurrences:
            self._last_wand_stats = {"round1_blocks": 0, "round2_blocks": 0}
            return []
        scorer = scorer_factory(k)
        # adaptive fallback: when the whole index has no more doc-range
        # blocks than round 1 would select anyway, the upper-bound
        # aggregation job is pure overhead (it cannot prune a thing) —
        # score every block directly, which is exactly the exhaustive
        # plan and therefore trivially rank-identical. The estimate
        # under-counts blocks on appended indexes (append pads to block
        # boundaries), which only ever errs toward this exact fallback.
        n_blocks_est = -(-self.num_docs // self.block_span)
        if n_blocks_est <= max(k, 32):
            scored = self._score_block_ids(occurrences, None, scorer, payload_cols)
            self._last_wand_stats = {
                "round1_blocks": 0,
                "round2_blocks": 0,
                "driver_rows": len(scored),
                "fallback_exhaustive": True,
            }
            return sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
        # total per-term weight for the upper bound (m_t * wqt_t >=
        # per-occurrence accumulation up to float re-association; the
        # slack below absorbs that)
        by_term: dict[str, float] = {}
        for t, _i, w in occurrences:
            by_term[t] = by_term.get(t, 0.0) + w
        wdf = self.spark.createDataFrame(
            list(by_term.items()), "term string, wqt double"
        )
        meta = (
            self._postings_for_terms(by_term)
            .join(F.broadcast(wdf), "term")
            .groupBy("block_id")
            .agg(F.sum(row_ub).alias("ub"))
        )
        meta.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_probe = max(k, 32)
            round1 = [
                r["block_id"]
                for r in meta.orderBy(F.desc("ub"), F.asc("block_id"))
                .limit(n_probe)
                .collect()
            ]
            if not round1:
                self._last_wand_stats = {"round1_blocks": 0, "round2_blocks": 0}
                return []
            scored = self._score_block_ids(occurrences, round1, scorer, payload_cols)
            driver_rows = len(scored)
            top = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
            round2: list[int] = []
            if len(top) == k and len(round1) == n_probe:
                threshold = top[-1][1]
                slack = abs(threshold) * 1e-9
                round2 = [
                    r["block_id"]
                    for r in meta.where(
                        (F.col("ub") >= threshold - slack)
                        & ~F.col("block_id").isin(round1)
                    )
                    .select("block_id")
                    .collect()
                ]
                if round2:
                    extra = self._score_block_ids(
                        occurrences, round2, scorer, payload_cols
                    )
                    driver_rows += len(extra)
                    scored.update(extra)
                    top = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
        finally:
            meta.unpersist()
        self._last_wand_stats = {
            "round1_blocks": len(round1),
            "round2_blocks": len(round2),
            "driver_rows": driver_rows,
        }
        return top

    def _score_block_ids(
        self,
        occurrences: list[tuple[str, int, float]],
        block_ids: list[int] | None,
        scorer=None,
        payload_cols: tuple[str, ...] = ("postings_bin", "weights_bin"),
    ) -> dict[int, float]:
        """Exact scores for the given blocks (all query terms of those
        blocks participate — blocks partition the doc space, so each
        doc's score is complete within its block). The ``scorer``
        decides how many rows per block reach the driver: the WAND
        rounds pass a per-block top-k scorer, so driver traffic is
        O(selected_blocks * k). ``block_ids=None`` scores every block
        (the exhaustive plan)."""
        if scorer is None:
            scorer = _block_scorer(None)
        wdf = self.spark.createDataFrame(
            occurrences, "term string, qidx int, wqt double"
        )
        cells = self._postings_for_terms([t for t, _i, _w in occurrences])
        if block_ids is not None:
            cells = cells.where(
                F.col("block_id").isin([int(b) for b in block_ids])
            )
        cells = cells.join(F.broadcast(wdf), "term").select(
            "block_id", "qidx", "wqt", *payload_cols
        )
        tomb = self.tombstones
        if tomb is not None:
            # tombstones masked INSIDE the scoring rounds: a deleted
            # doc in round 1 would inflate the threshold L and
            # over-prune live docs in round 2
            if block_ids is not None:
                tomb = tomb.where(
                    F.col("block_id").isin([int(b) for b in block_ids])
                )
            scored = (
                cells.groupBy("block_id")
                .cogroup(tomb.groupBy("block_id"))
                .applyInPandas(
                    _cogroup_blocked(scorer), "doc_id long, score double"
                )
            )
        else:
            scored = cells.groupBy("block_id").applyInPandas(
                scorer, "doc_id long, score double"
            )
        pdf = scored.toPandas()
        return {
            int(d): float(s) for d, s in zip(pdf["doc_id"], pdf["score"])
        }

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

    def _weighted_occurrences(
        self, terms: list[str]
    ) -> list[tuple[str, int, float]]:
        """(term, qidx, wqt) with one row PER QUERY-TERM OCCURRENCE —
        the reference accumulates a repeated term once per occurrence
        (``query.py:73-83``), and float addition is not associative, so
        folding ``m * wqt`` would be up to an ulp off for odd
        multiplicities. qidx preserves the reference's term-at-a-time
        addition order."""
        dfs = self._term_dfs(set(terms))
        return [
            (t, i, float(log(1 + self.num_docs / dfs[t])))
            for i, t in enumerate(terms)
            if dfs.get(t)
        ]

    def _allowed_by_block(self, where) -> DataFrame:
        """(doc_id, block_id) for docs matching a metadata predicate.

        The docs scan is column-pruned to doc_id + the predicate's
        columns, and the predicate itself is pushed into the Parquet
        reader (min/max row-group skipping — a ``ts`` range on a
        time-ordered corpus prunes storage the way the bucket/term
        predicates do for postings). block_id = doc_id DIV block_span
        co-shuffles the survivors with the posting blocks they belong
        to, so the cogrouped scorer sees each block's allowed set
        without any per-doc join against posting rows."""
        pred = F.expr(where) if isinstance(where, str) else where
        return self.docs.where(pred).select(
            "doc_id",
            F.expr(f"CAST(doc_id DIV {self.block_span} AS LONG)").alias(
                "block_id"
            ),
        )

    def _scored_blocks(
        self, cells: DataFrame, scorer, where, allowed_df: DataFrame | None = None
    ) -> DataFrame:
        """Per-block scoring, optionally cogrouped with a metadata
        filter (see :func:`_cogroup_filtered`) and/or the tombstone
        snapshot (see :func:`_cogroup_blocked`). With BOTH a filter and
        tombstones, the tombstones are anti-joined out of the (already
        co-shuffled) allowed set — one cogroup either way.

        ``allowed_df`` short-circuits the predicate path with an
        explicit (doc_id, block_id) candidate set — the must-clause
        shape (phrase-constrained ranking): candidates restrict the
        RANKING, never the statistics."""
        out_schema = "doc_id long, score double"
        tomb = self.tombstones
        if where is not None or allowed_df is not None:
            allowed = (
                allowed_df if allowed_df is not None else self._allowed_by_block(where)
            )
            if tomb is not None:
                allowed = allowed.join(
                    F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
                )
            return (
                cells.groupBy("block_id")
                .cogroup(allowed.groupBy("block_id"))
                .applyInPandas(_cogroup_filtered(scorer), out_schema)
            )
        if tomb is not None:
            return (
                cells.groupBy("block_id")
                .cogroup(tomb.groupBy("block_id"))
                .applyInPandas(_cogroup_blocked(scorer), out_schema)
            )
        return cells.groupBy("block_id").applyInPandas(scorer, out_schema)

    def _score_terms_df(
        self, terms: list[str], k: int, where=None
    ) -> DataFrame:
        spark = self.spark
        empty = spark.createDataFrame([], "doc_id long, score double")
        if not terms:
            return empty
        # df lookup for wqt — one tiny pruned-scan job (the reference's
        # dictionary point lookups, query.py:80); its result is a handful
        # of floats, so folding them into the scoring plan as literals
        # keeps the main job to two stages (decode+explode, agg+top-k).
        cells = self._ranked_cells(terms)
        if cells is None:
            return empty
        scored = self._scored_blocks(cells, _block_scorer(k), where)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _ranked_cells(self, terms: list[str]) -> DataFrame | None:
        """The ranked paths' shared (block, query-term) cell plan.

        Blocks partition the doc space, so each doc's score is COMPLETE
        within its block: one applyInPandas over (term, block) cells
        scores a whole block in numpy and emits only that block's
        top-k. The global answer is TakeOrderedAndProject over
        n_blocks*k tiny rows — no posting-row explosion, no doc_stats
        join (L_d rides inside the block, weights_bin), and the only
        shuffle moves the (compressed) query-term blocks themselves.
        Partials accumulate in query-term order (qidx), the exact
        float-addition order of the reference's term-at-a-time loop
        (query.py:78-83). Returns None for an empty/unknown query."""
        occurrences = self._weighted_occurrences(terms)
        if not occurrences:
            return None
        wdf = self.spark.createDataFrame(
            occurrences, "term string, qidx int, wqt double"
        )
        return (
            self._postings_for_terms([t for t, _i, _w in occurrences])
            .join(F.broadcast(wdf), "term")
            .select("block_id", "qidx", "wqt", "postings_bin", "weights_bin")
        )

    def _block_id_col(self) -> Column:
        return F.expr(f"CAST(doc_id DIV {self.block_span} AS LONG)").alias(
            "block_id"
        )

    def _boosts_by_block(self, boost) -> DataFrame:
        """(doc_id, block_id, boost) for docs whose multiplier differs
        from 1.0, plus boost-NULL rows for tombstoned docs — ONE
        co-shuffled right side carrying both the field weights and the
        delete mask (see :func:`_cogroup_boosted`). The docs scan is
        column-pruned to doc_id + the boost expression's inputs, and
        the ``!= 1.0`` filter keeps the exchanged rows O(boosted docs),
        not O(corpus) — a role boost over transcripts ships only the
        boosted roles' ids."""
        b = F.expr(boost) if isinstance(boost, str) else boost
        out = (
            self.docs.select(
                "doc_id",
                self._block_id_col(),
                b.cast("double").alias("boost"),
            )
            .where(F.col("boost") != 1.0)
        )
        tomb = self.tombstones
        if tomb is not None:
            out = out.join(
                F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
            ).unionByName(
                tomb.select(
                    "doc_id",
                    "block_id",
                    F.lit(None).cast("double").alias("boost"),
                )
            )
        return out

    def _groups_by_block(self, group_col: str) -> DataFrame:
        """(doc_id, block_id, group_key) for every LIVE doc — the
        diversified path's right side. Tombstones are anti-joined out
        here, and the scorer's inner merge then masks deleted docs for
        free (a doc with no group row cannot rank)."""
        out = self.docs.select(
            "doc_id",
            self._block_id_col(),
            F.col(group_col).cast("string").alias("group_key"),
        )
        tomb = self.tombstones
        if tomb is not None:
            out = out.join(
                F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
            )
        return out

    def ranked_query_boosted_df(
        self, query: str, boost, k: int = DEFAULT_K
    ) -> DataFrame:
        """Metadata-boosted top-k: final score = tf-idf score × the
        ``boost`` expression evaluated on the doc's metadata row (role,
        tool, recency … — e.g. ``2.0 where role='assistant'``). The
        BM25F-style field weighting for transcripts, executed as a
        cogrouped per-block multiply BEFORE top-k truncation (see
        :func:`_cogroup_boosted` for why truncation must come after).
        ``boost`` is a Column or SQL string over the docs table; docs
        not matched keep weight 1.0."""
        terms = self._ranked_terms(query)
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        cells = self._ranked_cells(terms) if terms else None
        if cells is None:
            return empty
        scored = (
            cells.groupBy("block_id")
            .cogroup(self._boosts_by_block(boost).groupBy("block_id"))
            .applyInPandas(_cogroup_boosted(k), "doc_id long, score double")
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def ranked_query_diverse_df(
        self,
        query: str,
        k: int = DEFAULT_K,
        per_group: int = 2,
        group_col: str = "conv_id",
    ) -> DataFrame:
        """Diversified top-k: at most ``per_group`` results from any
        one group (default: conversation). Search-result diversity
        for transcript corpora — a long conversation that matches the
        query everywhere must not monopolize the page.

        Execution: per-block scoring cogrouped with the block's
        (doc_id, group_key) map applies the SAME cap per (block,
        group) and per-block top-k (provably lossless — proof in
        :func:`_cogroup_diverse`), then a window over the surviving
        n_blocks×k rows re-caps globally and takes the final top-k.
        Output: (doc_id, group_key, score)."""
        from pyspark.sql import Window

        terms = self._ranked_terms(query)
        empty = self.spark.createDataFrame(
            [], "doc_id long, group_key string, score double"
        )
        cells = self._ranked_cells(terms) if terms else None
        if cells is None:
            return empty
        scored = (
            cells.groupBy("block_id")
            .cogroup(self._groups_by_block(group_col).groupBy("block_id"))
            .applyInPandas(
                _cogroup_diverse(k, per_group),
                "doc_id long, group_key string, score double",
            )
        )
        w = Window.partitionBy("group_key").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= per_group)
            .drop("rn")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def bm25_query_boosted_df(
        self,
        query: str,
        boost,
        k: int = DEFAULT_K,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Metadata-boosted BM25 top-k — :meth:`ranked_query_boosted_df`
        with the BM25 block scorer (same cogroup shape, same
        multiply-after-normalize-before-truncate discipline; the boost
        rides the accumulated BM25 score)."""
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        occurrences = self._bm25_occurrences(self._ranked_terms(query))
        if not occurrences:
            return empty
        avgdl = self.total_tokens / self.num_docs
        wdf = self.spark.createDataFrame(
            occurrences, "term string, qidx int, wqt double"
        )
        cells = (
            self._postings_for_terms([t for t, _i, _w in occurrences])
            .join(F.broadcast(wdf), "term")
            .select("block_id", "qidx", "wqt", "postings_bin", "doclens_bin")
        )
        scored = (
            cells.groupBy("block_id")
            .cogroup(self._boosts_by_block(boost).groupBy("block_id"))
            .applyInPandas(
                _cogroup_boosted(
                    k,
                    scorer_factory=lambda kk: _block_bm25_scorer(
                        kk, k1, b, avgdl
                    ),
                ),
                "doc_id long, score double",
            )
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def ranked_query_batch(
        self, queries: list[str], k: int = DEFAULT_K, pruned: bool = False
    ) -> list[list[tuple[int, float]]]:
        """Many ranked queries in ONE Spark job (plus one shared
        dictionary lookup): per-result-set identical to calling
        :meth:`ranked_query` per query. ``pruned=True`` adds per-query
        block-max WAND selection (:meth:`_ranked_batch_wand`) — still a
        constant number of jobs for the whole batch.

        Per-query job scheduling dominates small-query latency (~1 s
        per job locally; similar per-job overhead on a real cluster),
        so interactive latency and batch throughput are different
        regimes. Here every (query, term) occurrence becomes a row of
        one broadcast dimension, the postings scan is pruned to the
        UNION of all query terms, scoring groups by (query_id,
        block_id), and one window takes each query's top-k — total
        cost is one job regardless of batch size.
        """
        per_query = [self._ranked_terms(q) for q in queries]
        all_terms = set().union(*map(set, per_query)) if per_query else set()
        if not all_terms:
            return [[] for _ in queries]
        dfs = self._term_dfs(all_terms)
        rows = [
            (qid, t, i, float(log(1 + self.num_docs / dfs[t])))
            for qid, terms in enumerate(per_query)
            for i, t in enumerate(terms)
            if dfs.get(t)
        ]
        if not rows:
            return [[] for _ in queries]
        # same adaptive fallback as _wand_topk: selection can't prune
        # an index whose block count round 1 would fully select
        if pruned and -(-self.num_docs // self.block_span) > max(k, 32):
            return self._ranked_batch_wand(len(queries), rows, k)
        wdf = self.spark.createDataFrame(
            rows, "query_id int, term string, qidx int, wqt double"
        )
        cells = (
            self._postings_for_terms({r[1] for r in rows})
            .join(F.broadcast(wdf), "term")
            .select(
                "query_id", "block_id", "qidx", "wqt", "postings_bin", "weights_bin"
            )
        )
        tomb = self.tombstones
        if tomb is not None:
            # each block's tombstones apply to EVERY query in the batch
            # (fresh DataFrame, not a wdf projection — deriving it from
            # wdf would make the cogroup an ambiguous self-join)
            qids = self.spark.createDataFrame(
                [(qid,) for qid in sorted({r[0] for r in rows})],
                "query_id int",
            )
            tomb_q = tomb.crossJoin(F.broadcast(qids)).select(
                "query_id", "block_id", "doc_id"
            )
            scored = (
                cells.groupBy("query_id", "block_id")
                .cogroup(tomb_q.groupBy("query_id", "block_id"))
                .applyInPandas(
                    _cogroup_blocked_keyed(k),
                    "query_id int, doc_id long, score double",
                )
            )
        else:
            scored = cells.groupBy("query_id", "block_id").applyInPandas(
                _block_scorer_keyed(k), "query_id int, doc_id long, score double"
            )
        from pyspark.sql.window import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        top = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .orderBy("query_id", "rn")
            .collect()
        )
        out: list[list[tuple[int, float]]] = [[] for _ in queries]
        for r in top:
            out[r["query_id"]].append((r["doc_id"], r["score"]))
        return out

    def _ranked_batch_wand(
        self, n_queries: int, rows: list[tuple[int, str, int, float]], k: int
    ) -> list[list[tuple[int, float]]]:
        """Block-max WAND for a whole query batch — per-query results
        identical to :meth:`ranked_query_wand`, in a CONSTANT number of
        jobs for the batch (ub aggregation, round-1 scoring, round-2
        survivor scan + scoring) instead of 2-3 jobs per query.

        Same two-round threshold argument as :meth:`_wand_topk`, with
        every step keyed by (query_id, block_id): the upper-bound
        aggregation is one cluster-side job over term-pruned metadata
        (binary columns never scanned), round 1 takes each query's top
        ``max(k, 32)`` blocks with one window rank, thresholds come back
        to the driver as k-th scores, and round 2 scores only surviving
        (query, block) pairs (ub >= L_q - slack; the 1e-9 relative slack
        can only UNDER-prune, as in the single-query path).
        """
        spark = self.spark
        n_probe = max(k, 32)
        occ = spark.createDataFrame(
            rows, "query_id int, term string, qidx int, wqt double"
        )
        by_qt: dict[tuple[int, str], float] = {}
        for qid, t, _i, w in rows:
            by_qt[(qid, t)] = by_qt.get((qid, t), 0.0) + w
        wdf = spark.createDataFrame(
            [(q, t, w) for (q, t), w in by_qt.items()],
            "query_id int, term string, wqt double",
        )
        all_terms = {t for _q, t, _i, _w in rows}
        meta = (
            self._postings_for_terms(all_terms)
            .join(F.broadcast(wdf), "term")
            .groupBy("query_id", "block_id")
            .agg(F.sum(F.col("wqt") * F.col("max_partial")).alias("ub"))
        )
        meta.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            from pyspark.sql.window import Window

            w1 = Window.partitionBy("query_id").orderBy(
                F.desc("ub"), F.asc("block_id")
            )
            total_blocks = {
                r["query_id"]: r["n"]
                for r in meta.groupBy("query_id").agg(F.count("*").alias("n")).collect()
            }
            round1 = [
                (r["query_id"], r["block_id"])
                for r in meta.withColumn("rn", F.row_number().over(w1))
                .where(F.col("rn") <= n_probe)
                .select("query_id", "block_id")
                .collect()
            ]
            scored = self._score_batch_pairs(occ, all_terms, round1, k)
            driver_rows = len(scored)
            # running k-th score per query -> round-2 thresholds
            thresholds: list[tuple[int, float]] = []
            per_query_n1: dict[int, int] = {}
            for qid, _b in round1:
                per_query_n1[qid] = per_query_n1.get(qid, 0) + 1
            tops: dict[int, list[tuple[int, float]]] = {}
            for (qid, doc), s in scored.items():
                tops.setdefault(qid, []).append((doc, s))
            for qid, lst in tops.items():
                lst.sort(key=lambda x: (-x[1], x[0]))
                del lst[k:]
                if len(lst) == k and per_query_n1.get(qid, 0) == n_probe:
                    thresholds.append((qid, lst[-1][1]))
            round2: list[tuple[int, int]] = []
            if thresholds:
                tdf = spark.createDataFrame(
                    thresholds, "query_id int, thr double"
                )
                seen = spark.createDataFrame(
                    round1, "query_id int, block_id long"
                )
                round2 = [
                    (r["query_id"], r["block_id"])
                    for r in meta.join(F.broadcast(tdf), "query_id")
                    .where(
                        F.col("ub")
                        >= F.col("thr") - F.abs(F.col("thr")) * F.lit(1e-9)
                    )
                    .join(
                        F.broadcast(seen), ["query_id", "block_id"], "left_anti"
                    )
                    .select("query_id", "block_id")
                    .collect()
                ]
                if round2:
                    extra = self._score_batch_pairs(occ, all_terms, round2, k)
                    driver_rows += len(extra)
                    for (qid, doc), s in extra.items():
                        tops.setdefault(qid, []).append((doc, s))
                    for qid, lst in tops.items():
                        lst.sort(key=lambda x: (-x[1], x[0]))
                        del lst[k:]
        finally:
            meta.unpersist()
        self._last_batch_wand_stats = {
            "total_blocks": total_blocks,
            "round1_pairs": len(round1),
            "round2_pairs": len(round2),
            "driver_rows": driver_rows,
        }
        return [tops.get(qid, []) for qid in range(n_queries)]

    def _score_batch_pairs(
        self,
        occ: DataFrame,
        terms,
        pairs: list[tuple[int, int]],
        k: int | None = None,
    ) -> dict[tuple[int, int], float]:
        """Exact scores for the given (query_id, block_id) pairs — one
        job; blocks partition the doc space so each doc's score is
        complete within its pair, so with ``k`` set each pair ships its
        top-k rows (driver traffic O(pairs * k), not pairs *
        block_span)."""
        if not pairs:
            return {}
        sel = self.spark.createDataFrame(pairs, "query_id int, block_id long")
        cells = (
            self._postings_for_terms(terms)
            .join(F.broadcast(occ), "term")
            .join(F.broadcast(sel), ["query_id", "block_id"], "left_semi")
            .select(
                "query_id", "block_id", "qidx", "wqt", "postings_bin", "weights_bin"
            )
        )
        tomb = self.tombstones
        if tomb is not None:
            # the selected pairs' tombstones, keyed per (query, block):
            # the per-block tombstone set applies to every query that
            # selected the block (same threshold-inflation argument as
            # the single-query rounds)
            tomb_q = F.broadcast(sel).join(tomb, "block_id").select(
                "query_id", "block_id", "doc_id"
            )
            scored = (
                cells.groupBy("query_id", "block_id")
                .cogroup(tomb_q.groupBy("query_id", "block_id"))
                .applyInPandas(
                    _cogroup_blocked_keyed(k),
                    "query_id int, doc_id long, score double",
                )
            )
        else:
            scored = cells.groupBy("query_id", "block_id").applyInPandas(
                _block_scorer_keyed(k), "query_id int, doc_id long, score double"
            )
        pdf = scored.toPandas()
        return {
            (int(q), int(d)): float(s)
            for q, d, s in zip(pdf["query_id"], pdf["doc_id"], pdf["score"])
        }

    # ------------------------------------------------------------------ BM25
    def bm25_query_df(
        self,
        query: str,
        k: int = DEFAULT_K,
        k1: float = 1.2,
        b: float = 0.75,
        where=None,
    ) -> DataFrame:
        """Okapi BM25 top-k as one DataFrame plan: (doc_id, score).

        idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene's non-negative
        variant); length normalization uses the per-posting doc lengths
        stored inside each block, so the plan shape is identical to the
        tf-idf scorer: pruned scan -> per-block numpy scoring ->
        TakeOrderedAndProject. Repeated query terms accumulate per
        occurrence, like ranked_query. ``where`` filters by docs
        metadata (see :meth:`ranked_query_df`).
        """
        spark = self.spark
        empty = spark.createDataFrame([], "doc_id long, score double")
        occurrences = self._bm25_occurrences(self._ranked_terms(query))
        if not occurrences:
            return empty
        avgdl = self.total_tokens / self.num_docs
        wdf = spark.createDataFrame(
            occurrences, "term string, qidx int, wqt double"
        )
        cells = (
            self._postings_for_terms([t for t, _i, _w in occurrences])
            .join(F.broadcast(wdf), "term")
            .select("block_id", "qidx", "wqt", "postings_bin", "doclens_bin")
        )
        scored = self._scored_blocks(
            cells, _block_bm25_scorer(k, k1, b, avgdl), where
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _bm25_occurrences(
        self, terms: list[str]
    ) -> list[tuple[str, int, float]]:
        """(term, qidx, idf) per occurrence — Lucene's non-negative
        idf = ln(1 + (N - df + 0.5)/(df + 0.5))."""
        dfs = self._term_dfs(set(terms))
        return [
            (t, i, float(log(1 + (self.num_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))))
            for i, t in enumerate(terms)
            if dfs.get(t)
        ]

    def bm25_query(
        self,
        query: str,
        k: int = DEFAULT_K,
        k1: float = 1.2,
        b: float = 0.75,
        pruned: bool = False,
        where=None,
    ) -> list[tuple[int, float]]:
        """Top-k BM25. ``pruned=True`` uses block-max WAND selection —
        rank-identical, scores only blocks whose upper bound can reach
        the top-k (``tests/test_wand.py`` asserts equality). ``where``
        filters by docs metadata (exhaustive path only, like
        :meth:`ranked_query`)."""
        if pruned:
            if where is not None:
                raise NotImplementedError(
                    "pruned=True with where= is not supported; the "
                    "exhaustive filtered path is the scale-correct plan"
                )
            return self.bm25_query_wand(query, k, k1, b)
        df = self.bm25_query_df(query, k, k1, b, where=where)
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    # ---------------------------------------------------------------- boolean
    def boolean_query(self, query: str) -> list[int]:
        # Arrow toPandas: materializing a large result (a stopword AND
        # can match most of the corpus) as columnar batches is ~10x
        # cheaper than driver-side Row objects from collect()
        df = self.boolean_query_df(query)
        return [int(x) for x in df.toPandas()["doc_id"].to_numpy()]

    def boolean_query_iter(self, query: str, batch_rows: int = 10_000):
        """Streaming cursor over a boolean result (reference
        ``utils.py:95-102``, the SQLite ``fetchmany`` generator): yields
        doc_ids one at a time via ``toLocalIterator`` — partitions are
        fetched on demand, so a corpus-sized result set never
        materializes on the driver."""
        df = self.boolean_query_df(query)
        for row in df.toLocalIterator(prefetchPartitions=True):
            yield int(row["doc_id"])

    def boolean_query_df(self, query: str) -> DataFrame:
        literals = [lit.strip() for lit in query.split("+")]
        literal_dfs = [self._literal_df(lit) for lit in literals]
        literal_dfs = [d for d in literal_dfs if d is not None]
        if not literal_dfs:
            return self.spark.createDataFrame([], "doc_id long")
        hits = reduce(DataFrame.union, literal_dfs).distinct()
        # doc-set results post-filter exactly (no top-k involved)
        return self._mask_deleted(hits).orderBy("doc_id")

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
        cells = self._postings_for_terms(uniq).select(
            "block_id", "term", "postings_bin"
        )
        return cells.groupBy("block_id").applyInPandas(
            _block_set_op(len(uniq)), "doc_id long"
        )

    def _any_term_df(self, terms: list[str]) -> DataFrame:
        """Docs containing ANY of ``terms`` (OR within, used for single
        terms and wildcard expansions): per-block sorted union."""
        cells = self._postings_for_terms(terms).select(
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
        cells = (
            self._postings_for_terms(terms)
            .join(F.broadcast(qdf), "term")
            .select("block_id", "slot", "postings_bin", "positions_bin")
        )
        return cells.groupBy("block_id").applyInPandas(
            _block_phrase(n, self.block_span), "doc_id long"
        )

    # ------------------------------------------------------------ autocomplete
    def suggest(self, prefix: str, k: int = 10) -> list[str]:
        """Top-k query completions for a prefix, most-frequent first
        (df desc, term asc) — the search-box autocomplete. A prefix
        scan of the term dictionary: ``startswith`` pushes to the
        Parquet reader as a ``StringStartsWith`` filter, and the
        dictionary files are term-sorted, so row-group min/max stats
        skip everything outside the prefix range — O(prefix range),
        not O(vocabulary), same storage-pruning story as term lookups
        (Q3). The prefix is lowercased/specials-stripped but NOT
        stemmed (stemming a partial word would mangle it); completions
        are dictionary TERMS — stems, the same vocabulary the
        reference's showterms exposes."""
        p = remove_special_characters(prefix.lower())
        if not p:
            return []
        rows = (
            self.terms.where(F.col("term").startswith(p))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(k)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    # -------------------------------------------------------------- exclusion
    def boolean_query_not(self, query: str, exclude: str) -> list[int]:
        """Docs matching ``query`` but NOT ``exclude`` (both in the
        reference's boolean grammar) — the AND-NOT the reference's
        grammar lacks, kept as a separate method so its query-string
        parsing stays reference-identical (a ``-`` inside a query word
        is corpus text there, not an operator). Executed as a
        left-anti join of the two doc-set plans: both sides stay
        per-block pruned scans, the anti join is the standard
        distributed set difference, nothing new reaches the driver."""
        inc = self.boolean_query_df(query)
        exc = self.boolean_query_df(exclude)
        df = inc.join(exc, "doc_id", "left_anti").orderBy("doc_id")
        return [int(x) for x in df.toPandas()["doc_id"].to_numpy()]

    # ----------------------------------------------------------------- facets
    def facet_counts(self, query: str, facet_col: str) -> DataFrame:
        """(facet, n_docs): distribution of a boolean query's matches
        over a docs metadata column (role, tool, conv_id, a date bucket
        of ts …) — the facet-sidebar aggregation, served from the same
        per-block doc sets as the boolean query itself. The facet join
        keys on doc_id against the column-pruned docs scan and the
        count is a partial-agg'd groupBy — map-side combinable at any
        corpus size."""
        hits = self.boolean_query_df(query)
        return (
            hits.join(self.docs.select("doc_id", facet_col), "doc_id")
            .groupBy(facet_col)
            .agg(F.count("*").cast("long").alias("n_docs"))
        )

    # ------------------------------------------------- conversation rollup
    def ranked_conversations_df(
        self,
        query: str,
        k: int = DEFAULT_K,
        where=None,
        bm25: bool = False,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Top-k CONVERSATIONS for a ranked query: (conv_id, score,
        n_hits, best_doc) — score = the conversation's best-scoring
        turn (max-aggregation: order-independent, so results are
        deterministic on any cluster), n_hits = matching turns,
        best_doc = the turn behind the score (ties: smaller doc_id).
        ``where`` restricts to docs matching a metadata predicate (same
        machinery as :meth:`ranked_query_df`); ``bm25=True`` scores
        turns with Okapi BM25 instead of tf-idf.

        The transcript data model makes this the natural result unit —
        users search for the conversation, not the turn. Plan: the
        exhaustive per-block scorer WITHOUT per-block truncation (a
        conversation's best turn can rank anywhere doc-level, so
        doc-level top-k would be wrong), tombstones/filter masked as
        usual, then ONE partial-agg'd groupBy on conv_id after a join
        against the column-pruned docs scan (doc_id, conv_id): the
        rollup costs one shuffle over O(matching docs) rows. The
        struct-max (score, -doc_id) folds best-score, tie-break and
        best-turn id into a single agg — no window, no second pass."""
        out_schema = "conv_id string, score double, n_hits long, best_doc long"
        terms = self._ranked_terms(query)
        empty = self.spark.createDataFrame([], out_schema)
        if not terms:
            return empty
        if bm25:
            occurrences = self._bm25_occurrences(terms)
            scorer = _block_bm25_scorer(
                None, k1, b, self.total_tokens / self.num_docs
            )
            payload = "doclens_bin"
        else:
            occurrences = self._weighted_occurrences(terms)
            scorer = _block_scorer(None)
            payload = "weights_bin"
        if not occurrences:
            return empty
        wdf = self.spark.createDataFrame(
            occurrences, "term string, qidx int, wqt double"
        )
        cells = (
            self._postings_for_terms([t for t, _i, _w in occurrences])
            .join(F.broadcast(wdf), "term")
            .select("block_id", "qidx", "wqt", "postings_bin", payload)
        )
        scored = self._scored_blocks(cells, scorer, where)
        keyed = scored.join(self.docs.select("doc_id", "conv_id"), "doc_id")
        best = F.max(F.struct(F.col("score"), (-F.col("doc_id")).alias("neg_id")))
        rolled = (
            keyed.groupBy("conv_id")
            .agg(best.alias("best"), F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select(
                "conv_id",
                F.col("best.score").alias("score"),
                "n_hits",
                (-F.col("best.neg_id")).cast("long").alias("best_doc"),
            )
        )
        return rolled.orderBy(F.desc("score"), F.asc("conv_id")).limit(k)

    def ranked_conversations(
        self, query: str, k: int = DEFAULT_K, **kwargs
    ) -> list[tuple[str, float, int, int]]:
        return [
            (r["conv_id"], r["score"], r["n_hits"], r["best_doc"])
            for r in self.ranked_conversations_df(query, k, **kwargs).collect()
        ]

    # ---------------------------------------------------- more-like-this
    def more_like_this(
        self, doc_id: int, k: int = DEFAULT_K, n_terms: int = 10
    ) -> list[tuple[int, float]]:
        """Similar documents to ``doc_id`` (Lucene's MoreLikeThis):
        the source doc's terms are weighted by the engine's own tf-idf
        ((1+ln tf)·ln(1+N/df) — the :mod:`keywords <ops>` formula), the
        top ``n_terms`` become a ranked query (each term once), and the
        source is excluded from the result.

        Cost shape: one pruned docs point-read (doc_id pushed to the
        range-partitioned scan), the source text analyzed in-process
        (one doc — no job), one pruned dictionary lookup for its
        distinct terms, then the standard exhaustive ranked plan over
        ``n_terms`` terms. The source doc is dropped AFTER scoring
        (fetch k+1, drop, take k) — exact, because exactly one doc is
        excluded. Tombstones mask as usual; a tombstoned source doc is
        still a valid query seed until compaction purges its row."""
        from collections import Counter

        rows = (
            self.docs.where(F.col("doc_id") == int(doc_id))
            .select("text")
            .collect()
        )
        if not rows:
            raise KeyError(f"doc_id {doc_id} not in the index")
        tfs = Counter(t for t, _pos, _raw in analyze(rows[0]["text"]))
        dfs = self._term_dfs(set(tfs))
        weighted = sorted(
            (
                (-(1.0 + log(tf)) * log(1 + self.num_docs / dfs[t]), t)
                for t, tf in tfs.items()
                if dfs.get(t)
            ),
        )[:n_terms]
        terms = [t for _w, t in weighted]
        if not terms:
            return []
        res = [
            (r["doc_id"], r["score"])
            for r in self._score_terms_df(terms, k + 1).collect()
        ]
        return [(d, s) for d, s in res if d != int(doc_id)][:k]

    def prf_query_df(
        self,
        query: str,
        k: int = DEFAULT_K,
        fb_docs: int = 5,
        n_expansion: int = 3,
    ) -> DataFrame:
        """Pseudo-relevance-feedback ranked retrieval ON THE INDEX
        (Rocchio/RM-style two-pass, the scale path of
        :func:`search_engine_spark.simple.prf_ranked`): run the base
        ranked query, take its top ``fb_docs`` results as
        presumed-relevant, pick the ``n_expansion`` terms most
        characteristic of the feedback set (highest feedback df, then
        total feedback tf, then term asc — all-integer keys, so the
        selection is exact), and re-rank with the expanded term set.

        Cost shape — O(query), the corpus is NEVER re-tokenized: one
        standard pruned ranked plan (pass 1), one pruned docs
        point-read of the ``fb_docs`` ids (isin pushdown to the
        range-partitioned scan), the feedback TEXTS analyzed
        in-process (``fb_docs`` rows — no job, the
        :meth:`more_like_this` pattern), then the standard pruned
        ranked plan over ``len(query) + n_expansion`` terms (pass 2).
        """
        from collections import Counter

        base = [
            int(r["doc_id"])
            for r in self.ranked_query_df(query, k=fb_docs).collect()
        ]
        orig = self._ranked_terms(query)
        if not base:
            return self._score_terms_df(orig, k)
        rows = (
            self.docs.where(F.col("doc_id").isin(base))
            .select("text")
            .collect()
        )
        fb_df: Counter = Counter()
        fb_tf: Counter = Counter()
        for r in rows:
            tfs = Counter(t for t, _pos, _raw in analyze(r["text"]))
            for t, c in tfs.items():
                fb_df[t] += 1
                fb_tf[t] += c
        known = set(orig)
        cand = sorted(
            (-df, -fb_tf[t], t)
            for t, df in fb_df.items()
            if t not in known
        )[:n_expansion]
        return self._score_terms_df(orig + [t for _a, _b, t in cand], k)

    def prf_query(
        self,
        query: str,
        k: int = DEFAULT_K,
        fb_docs: int = 5,
        n_expansion: int = 3,
    ) -> list[tuple[int, float]]:
        """List form of :meth:`prf_query_df`."""
        return [
            (int(r["doc_id"]), float(r["score"]))
            for r in self.prf_query_df(query, k, fb_docs, n_expansion).collect()
        ]

    # ------------------------------------------------ index-backed analytics
    def significant_terms_df(
        self, query: str, n: int = 10, min_fg_df: int = 2
    ) -> DataFrame:
        """Significant-terms aggregation ON THE INDEX (the scale path of
        :func:`search_engine_spark.simple.significant_terms`): terms
        unusually frequent in the docs matching ANY query term vs the
        background corpus, scored by JLH ``(fg_rate - bg_rate) *
        (fg_rate / bg_rate)``. Output (term, fg_df, df, score) — top
        ``n`` by unrounded score desc, term asc; query terms excluded,
        ``min_fg_df`` suppresses one-doc noise.

        Cost shape — the corpus is NEVER re-tokenized: the foreground
        doc set comes from the engine's per-block any-term path, fg_df
        from decoding posting cells of ONLY the blocks that contain
        foreground docs (one cogroup, integer partials), bg df from the
        terms dictionary, N / fg_n folded as literals. At 100 TB a
        selective query touches the few posting blocks its foreground
        occupies; the re-analyze-everything plan of the relational twin
        is exactly what this method exists to avoid."""
        qt = sorted({t for t in self._ranked_terms(query) if t})
        schema = "term string, fg_df long, df long, score double"
        empty = self.spark.createDataFrame([], schema)
        dfs = self._term_dfs(qt)
        present = [t for t in qt if dfs.get(t)]
        if not present:
            return empty
        fg = (
            self._mask_deleted(self._any_term_df(present))
            .select("doc_id", self._block_id_col())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            fg_n = fg.count()
            if fg_n == 0:
                return empty
            blocks = fg.select("block_id").distinct()
            cells = self.postings.join(
                F.broadcast(blocks), "block_id", "left_semi"
            ).select("block_id", "term", "postings_bin")
            fg_counts = (
                cells.groupBy("block_id")
                .cogroup(fg.groupBy("block_id"))
                .applyInPandas(_cogroup_fg_df(), "term string, fg_df long")
            )
            fgd = (
                fg_counts.groupBy("term")
                .agg(F.sum("fg_df").cast("long").alias("fg_df"))
                .where(~F.col("term").isin(qt))
                .where(F.col("fg_df") >= int(min_fg_df))
            )
            # background df straight from the dictionary snapshot —
            # stats stay corpus-global (pre-delete, the Lucene
            # deleted-docs discipline the tombstone paths follow)
            fg_rate = F.col("fg_df") / F.lit(float(fg_n))
            bg_rate = F.col("df") / F.lit(float(self.num_docs))
            score = (fg_rate - bg_rate) * (fg_rate / bg_rate)
            rows = (
                fgd.join(self.terms.select("term", "df"), "term")
                .select("term", "fg_df", "df", score.alias("_s"))
                .orderBy(F.desc("_s"), F.asc("term"))
                .limit(int(n))
                .select("term", "fg_df", "df", F.round("_s", 6).alias("score"))
                .collect()
            )
        finally:
            fg.unpersist()
        return self.spark.createDataFrame(rows, schema)

    def keywords_df(self, n: int = 5) -> DataFrame:
        """Per-doc top-``n`` terms by tf-idf ON THE INDEX (the scale
        path of :func:`search_engine_spark.simple.keywords`):
        (doc_id, term, tf_idf, rank), ranked by the unrounded
        ``(1+ln tf)·ln(1+N/df)`` with ties on term asc.

        Cost shape: keywords is inherently a full reorganization of the
        index from term-major to doc-major, so ONE shuffle of the
        compressed posting blocks (groupBy block_id) is the floor — but
        text is never re-tokenized and the blobs move varbyte-compressed.
        The dictionary join runs on a metadata-only projection of the
        postings scan (term + block_id columns — Parquet never reads the
        binary columns for that branch), so only slim rows join against
        ``terms``. Per-doc top-n is complete within a block (blocks
        partition the doc space) — no corpus-wide window."""
        # the slim branch reads the SAME parquet through a fresh relation
        # (new attribute ids — Spark's ambiguous-self-join check rejects
        # cogrouping two projections of one Dataset); column pruning
        # keeps this scan to the term/block_id columns only
        slim = self.spark.read.parquet(
            fsio.join(self.index_dir, self._table_names.get("postings", "postings"))
        ).select("block_id", "term")
        dfs_by_block = slim.join(self.terms.select("term", "df"), "term").select(
            "block_id", "term", "df"
        )
        cells = self.postings.select("block_id", "term", "postings_bin")
        out = (
            cells.groupBy("block_id")
            .cogroup(dfs_by_block.groupBy("block_id"))
            .applyInPandas(
                _cogroup_keywords(int(n), float(self.num_docs)),
                "doc_id long, term string, tf_idf double, rank int",
            )
        )
        return self._mask_deleted(out).select(
            "doc_id", "term", F.round("tf_idf", 6).alias("tf_idf"), "rank"
        )

    def ranked_explain_df(self, query: str, k: int = DEFAULT_K) -> DataFrame:
        """Score explanation for the ranked top-``k`` (Lucene
        ``explain()``; the scale path of
        :func:`search_engine_spark.simple.ranked_explain`): one row per
        (top-k doc, query term) with every factor — tf, df,
        ``wqt = ln(1+N/df)``, ``wdt = 1+ln tf``, the doc's L_d
        (``weight``) and ``contrib = wqt·wdt/L_d`` — so a doc's
        contribs sum to its :meth:`ranked_query_df` score. A REPEATED
        query term accumulates once per occurrence on the ranked path
        (reference ``query.py:73-83`` semantics), so its single explain
        row folds the multiplicity into ``contrib`` (wqt/wdt stay the
        per-occurrence factors; the sum invariant holds to the shared
        6-dp rounding).

        Cost shape: the underlying ranked query runs as usual; the
        explain pass then decodes ONLY the query terms' cells in the
        k result docs' blocks (term + block isin pushdown) and masks to
        the k ids — O(k · |terms|) output, no corpus scan, no
        re-tokenize."""
        from collections import Counter

        mult = Counter(t for t in self._ranked_terms(query) if t)
        qt = sorted(mult)
        dfs = self._term_dfs(qt)
        present = [t for t in qt if dfs.get(t)]
        schema = (
            "doc_id long, term string, tf long, df long, wqt double, "
            "wdt double, weight double, contrib double"
        )
        empty = self.spark.createDataFrame([], schema)
        if not present:
            return empty
        top = [
            int(r["doc_id"]) for r in self.ranked_query_df(query, k).collect()
        ]
        if not top:
            return empty
        blocks = sorted({d // self.block_span for d in top})
        allowed = np.array(sorted(top), dtype=np.int64)
        cells = (
            self._postings_for_terms(present)
            .where(F.col("block_id").isin(blocks))
            .select("term", "postings_bin", "weights_bin")
        )

        def extract(batches):
            for pdf in batches:
                outs: dict[str, list] = {
                    "doc_id": [],
                    "term": [],
                    "tf": [],
                    "weight": [],
                }
                for term, pblob, wblob in zip(
                    pdf["term"], pdf["postings_bin"], pdf["weights_bin"]
                ):
                    d, t = codec.decode_postings(bytes(pblob))
                    w = np.frombuffer(bytes(wblob), dtype="<f8")
                    keep = np.isin(d, allowed, assume_unique=True)
                    if not keep.any():
                        continue
                    outs["doc_id"].append(d[keep])
                    outs["tf"].append(t[keep].astype(np.int64))
                    outs["weight"].append(w[keep])
                    outs["term"].append(
                        np.full(int(keep.sum()), term, dtype=object)
                    )
                if outs["doc_id"]:
                    yield pd.DataFrame(
                        {c: np.concatenate(v) for c, v in outs.items()}
                    )

        ext = cells.mapInPandas(
            extract, "doc_id long, term string, tf long, weight double"
        )
        qdf = self.spark.createDataFrame(
            [(t, int(dfs[t]), int(mult[t])) for t in present],
            "term string, df long, mult long",
        )
        wqt = F.log(F.lit(1.0) + F.lit(float(self.num_docs)) / F.col("df"))
        wdt = F.lit(1.0) + F.log("tf")
        return ext.join(F.broadcast(qdf), "term").select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(wqt, 6).alias("wqt"),
            F.round(wdt, 6).alias("wdt"),
            F.round(F.col("weight"), 6).alias("weight"),
            F.round(
                F.col("mult") * wqt * wdt / F.col("weight"), 6
            ).alias("contrib"),
        )

    def phrase_ranked_df(self, query: str, k: int = DEFAULT_K) -> DataFrame:
        """Exact-phrase-constrained ranked retrieval ON THE INDEX
        (Lucene ``PhraseQuery`` as a scored must-clause; the scale path
        of :func:`search_engine_spark.simple.phrase_ranked`): only docs
        containing the terms at consecutive positions qualify, and
        qualifiers rank by the standard tf-idf formula over the
        phrase's terms. Statistics (N, df, L_d) stay corpus-global —
        the phrase restricts the CANDIDATES, exactly the ``where=`` /
        tombstone discipline (masking happens BEFORE per-block top-k
        truncation, via the same cogroup adapter)."""
        terms = [t for t in (query_normalize(w) for w in query.split()) if t]
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not terms:
            return empty
        # scoring dedupes (the twin's ranked_scores scores each DISTINCT
        # term once — a repeated phrase word must not double its idf
        # contribution); the positional match below keeps the ordered
        # duplicate-preserving list, which phrase semantics require
        cells = self._ranked_cells(sorted(set(terms)))
        if cells is None:
            return empty
        allowed = self._phrase_df(terms).select(
            "doc_id", self._block_id_col()
        )
        scored = self._scored_blocks(
            cells, _block_scorer(k), None, allowed_df=allowed
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def synonym_ranked_df(
        self, groups: list[list[str]], k: int = DEFAULT_K
    ) -> DataFrame:
        """Synonym-expanded ranked retrieval ON THE INDEX (Lucene
        ``SynonymQuery`` blending; the scale path of
        :func:`search_engine_spark.simple.synonym_ranked`): each group
        of synonymous words scores as ONE pseudo-term — group tf = sum
        of member tfs, group df = docs containing ANY member — so a doc
        is not rewarded for matching several spellings of one concept.

        Two pruned jobs, no corpus re-tokenize: (1) group dfs by
        per-block union counts over the members' posting cells (blocks
        partition docs, so the integer partials sum exactly); (2) the
        standard per-block scoring plan with group-tf blending inside
        the scorer (:func:`_block_synonym_scorer`), tombstones
        cogrouped as usual."""
        mapping: list[tuple[str, int]] = []
        for gi, g in enumerate(groups):
            stems = sorted({query_normalize(w) for w in g if query_normalize(w)})
            mapping.extend((t, gi) for t in stems)
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not mapping:
            return empty
        qdf = self.spark.createDataFrame(mapping, "term string, gid int")
        gcells = (
            self._postings_for_terms([t for t, _ in mapping])
            .join(F.broadcast(qdf), "term")
            .select("block_id", "gid", "term", "postings_bin")
        )
        gdf_rows = (
            gcells.groupBy("block_id")
            .applyInPandas(_block_group_union(), "gid int, df long")
            .groupBy("gid")
            .agg(F.sum("df").cast("long").alias("df"))
            .collect()
        )
        gdfs = {int(r["gid"]): int(r["df"]) for r in gdf_rows if r["df"]}
        if not gdfs:
            return empty
        live = [(t, gi) for t, gi in mapping if gi in gdfs]
        wdf = self.spark.createDataFrame(
            [
                (t, gi, float(log(1 + self.num_docs / gdfs[gi])))
                for t, gi in live
            ],
            "term string, gid int, wqt double",
        )
        cells = (
            self._postings_for_terms([t for t, _ in live])
            .join(F.broadcast(wdf), "term")
            .select("block_id", "gid", "wqt", "postings_bin", "weights_bin")
        )
        scored = self._scored_blocks(cells, _block_synonym_scorer(k), None)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def bm25f_conv_df(
        self,
        query: str,
        weights: dict[str, float] | None = None,
        k: int = DEFAULT_K,
        k1: float = 1.5,
        b: float = 0.75,
    ) -> DataFrame:
        """Conversation-level BM25F ON THE INDEX (roles are the fields;
        the scale path of
        :func:`search_engine_spark.simple.bm25f_conv`): per-field
        length-normalized tfs blend BEFORE the single saturation, idf
        over any-field conversation df. Scoring reuses the relational
        twin's fixed-order expression tree
        (:func:`search_engine_spark.simple.bm25f_score_topk`) over
        integer tables, so the float result is identical between the
        two paths by construction.

        Cost shape — no corpus re-tokenize: per-(conv, term, role) tfs
        come from decoding the QUERY-PRUNED posting cells cogrouped
        with a blocks-restricted docs-metadata projection
        (:func:`_cogroup_conv_tf`, the ``_cogroup_boosted`` shape);
        per-(conv, role) field lengths come from ``doc_stats`` (the
        index's own doc_len), one thin join + integer agg."""
        from search_engine_spark.simple import bm25f_score_topk

        weights = weights or {"user": 1.0, "assistant": 2.0, "tool": 0.5}
        roles = sorted(weights)
        words = query.split() if isinstance(query, str) else list(query)
        qstems = sorted({query_normalize(w) for w in words if query_normalize(w)})
        if not qstems:
            # empty / symbol-only query: same guard as the sibling
            # analytics paths (bm25f_score_topk cannot aggregate an
            # empty term list)
            return self.spark.createDataFrame([], "conv_id string, score double")
        cells = self._postings_for_terms(qstems).select(
            "block_id", "term", "postings_bin"
        )
        blocks = cells.select("block_id").distinct()
        # tombstone-masked: a deleted turn's CONTENT must not score its
        # conversation (the masked meta drops its postings in the
        # cogroup's inner join); field lengths below stay pre-delete,
        # the corpus-stats discipline every query path follows
        meta = self._mask_deleted(
            self.docs.select(
                "doc_id", self._block_id_col(), "conv_id", "role"
            )
            .where(F.col("role").isin(roles))
            .join(F.broadcast(blocks), "block_id", "left_semi")
        )
        ctf_long = (
            cells.groupBy("block_id")
            .cogroup(meta.groupBy("block_id"))
            .applyInPandas(
                _cogroup_conv_tf(),
                "conv_id string, term string, role string, tf long",
            )
            .groupBy("conv_id", "term", "role")
            .agg(F.sum("tf").cast("long").alias("tf"))
        )
        clen_long = (
            self.docs.select("doc_id", "conv_id", "role")
            .join(self.doc_stats.select("doc_id", "doc_len"), "doc_id")
            .groupBy("conv_id", "role")
            .agg(F.sum("doc_len").cast("long").alias("flen"))
        )
        return bm25f_score_topk(
            self.spark, ctf_long, clen_long, qstems, roles, weights, k1, b, k
        )

    def regex_vocab_df(self, pattern: str) -> DataFrame:
        """Vocabulary terms matching a regex, with df (Lucene
        ``RegexpQuery`` expansion) — ON THE DICTIONARY snapshot: the
        regex runs |vocab| times over the terms table, never touching
        postings or text. Keep patterns in the Java∩RE2 common subset
        (the :mod:`..ops.pii` discipline) so SQL oracles replicate
        them. Output (word, df)."""
        return self.terms.where(F.col("term").rlike(pattern)).select(
            F.col("term").alias("word"), "df"
        )

    def collocations_df(self, min_count: int = 5, k: int = 20) -> DataFrame:
        """Top-``k`` adjacent-bigram collocations by PMI ON THE INDEX
        (the scale path of
        :func:`search_engine_spark.ops.textstats.collocations`):
        (term_a, term_b, n_pair, pmi) with
        ``pmi = ln(P(ab) / (P(a)·P(b)))``, ``min_count`` suppressing the
        unstable tail, ties on (term_a, term_b) asc — the corpus text is
        never re-tokenized.

        Cost shape: ONE decode pass over the posting blocks
        (``applyInPandas`` per block — blocks partition the doc space
        and positions are doc-local, so every adjacent pair is
        block-local) emitting pre-aggregated (term_a, term_b) partials;
        one pair-keyed shuffle sums them. Unigram counts and the token
        total come FREE from the terms dictionary (``cf`` = Σtf — the
        occurrence count the positional dump would give), so the only
        corpus-sized work is the varbyte decode. Stats are
        corpus-global (tombstoned docs included until compaction — the
        Lucene deleted-docs discipline the other analytics paths
        follow). The pair table persists across its two consumers
        (the n_pairs total and the final top-k) and is unpersisted
        before returning the collected k rows."""
        schema = "term_a string, term_b string, n_pair long, pmi double"
        empty = self.spark.createDataFrame([], schema)
        cells = self.postings.select(
            "block_id", "term", "postings_bin", "positions_bin"
        )
        partials = cells.groupBy("block_id").applyInPandas(
            _block_colloc_pairs(self.block_span),
            "term_a string, term_b string, cnt long",
        )
        pairs = (
            partials.groupBy("term_a", "term_b")
            .agg(F.sum("cnt").cast("long").alias("n_pair"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            total = pairs.select(F.sum("n_pair").alias("t")).first()["t"]
            if not total:
                return empty
            n_pairs = float(total)
            n_tok = float(
                self.terms.select(F.sum("cf").alias("t")).first()["t"] or 0
            )
            uni = self.terms.select("term", "cf")
            pmi = F.log(
                (F.col("n_pair").cast("double") / F.lit(n_pairs))
                / (
                    (F.col("c_a").cast("double") / F.lit(n_tok))
                    * (F.col("c_b").cast("double") / F.lit(n_tok))
                )
            )
            rows = (
                pairs.where(F.col("n_pair") >= int(min_count))
                .join(
                    uni.select(
                        F.col("term").alias("term_a"), F.col("cf").alias("c_a")
                    ),
                    "term_a",
                )
                .join(
                    uni.select(
                        F.col("term").alias("term_b"), F.col("cf").alias("c_b")
                    ),
                    "term_b",
                )
                .select(
                    "term_a", "term_b", "n_pair",
                    F.round(pmi, 6).alias("pmi"),
                )
                # order on the ROUNDED pmi with (term_a, term_b) ties —
                # the textstats twin's ordering, deterministic at the
                # k boundary when unrounded scores differ by < 5e-7
                .orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
                .limit(int(k))
                .collect()
            )
        finally:
            pairs.unpersist()
        return self.spark.createDataFrame(rows, schema)

    def term_trends_df(
        self, terms, bucket_seconds: int = 3600
    ) -> DataFrame:
        """Term-frequency trend over tumbling event-time buckets ON THE
        INDEX (the scale path of
        :func:`search_engine_spark.simple.term_trends`): one row per
        (term, bucket) with ``n_turns`` (live turns containing the
        term) and ``tf_sum`` (total occurrences), ``bucket = floor(
        epoch_seconds / bucket_seconds)`` on exact integer microseconds
        so boundaries match the relational twin bit-for-bit.

        Cost shape — no corpus re-tokenize: tfs come from decoding the
        QUERY-PRUNED posting cells (``_postings_for_terms`` — bucket
        directories + term row groups, I/O O(query terms)); timestamps
        ride a TWO-COLUMN docs-metadata projection (doc_id, bucket —
        the bucket arithmetic runs JVM-side in projection) restricted
        to the matching blocks and tombstone-masked BEFORE the cogroup,
        so deleted turns drop out of the trend while the per-block
        partial aggregation is preserved. The only exchanges are the
        block-keyed cogroup over O(matching docs) thin rows and one
        partial-agg'd (term, bucket) shuffle whose map-side output is
        at most |terms| x |buckets| rows per block."""
        words = terms.split() if isinstance(terms, str) else list(terms)
        qstems = sorted(
            {query_normalize(w) for w in words if query_normalize(w)}
        )
        schema = "term string, bucket long, n_turns long, tf_sum long"
        if not qstems:
            return self.spark.createDataFrame([], schema)
        cells = self._postings_for_terms(qstems).select(
            "block_id", "term", "postings_bin"
        )
        blocks = cells.select("block_id").distinct()
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        b = F.lit(int(bucket_seconds) * 1_000_000)
        meta = self._mask_deleted(
            self.docs.select(
                "doc_id",
                self._block_id_col(),
                ((us - F.pmod(us, b)) / b).cast("long").alias("bucket"),
            ).join(F.broadcast(blocks), "block_id", "left_semi")
        )
        partials = (
            cells.groupBy("block_id")
            .cogroup(meta.groupBy("block_id"))
            .applyInPandas(_cogroup_trend_tf(), schema)
        )
        return partials.groupBy("term", "bucket").agg(
            F.sum("n_turns").cast("long").alias("n_turns"),
            F.sum("tf_sum").cast("long").alias("tf_sum"),
        )

    # --------------------------------------------------------------- snippets
    def search(
        self,
        query: str,
        k: int = DEFAULT_K,
        window: int = 3,
        where=None,
    ) -> list[tuple[int, float, str]]:
        """Top-k ranked retrieval WITH result snippets: (doc_id, score,
        ±window words around the first query-term hit). The reference
        UI ships each hit's whole document (``searchengine.py:85-96``);
        at transcript scale the excerpt must be computed corpus-side.

        Cost on top of :meth:`ranked_query_df`: one isin-pushed docs
        lookup and one analyzer pass over exactly k rows — the Arrow
        UDF re-derives the stemmed positions for those k texts, which
        stay aligned with the raw whitespace split (the analyzer's
        ``pos`` is the whitespace-word counter), so the snippet window
        is a JVM-side ``slice`` of the original words."""
        from search_engine_spark.functions.udfs import analyze_udf

        stems = sorted(set(self._ranked_terms(query)))
        if not stems:
            return []
        topk = self.ranked_query_df(query, k, where=where)
        stem_arr = F.array(*[F.lit(s) for s in stems])
        tks = analyze_udf(F.col("text"))
        qpos = F.transform(
            F.filter(tks, lambda t: F.array_contains(stem_arr, t["term"])),
            lambda t: t["pos"],
        )
        first = F.array_min(qpos)  # 0-based whitespace-word index
        ws = F.split(F.col("text"), r"\s+")
        start = F.greatest(first + 1 - window, F.lit(1))  # slice is 1-based
        rows = (
            topk.join(self.docs.select("doc_id", "text"), "doc_id")
            .select(
                "doc_id",
                "score",
                F.concat_ws(" ", F.slice(ws, start, 2 * window + 1)).alias(
                    "snippet"
                ),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        )
        return [(r["doc_id"], r["score"], r["snippet"]) for r in rows]

    # -------------------------------------------------------------- proximity
    def near_query_df(
        self, word_a: str, word_b: str, max_dist: int = 3
    ) -> DataFrame:
        """Docs where the two words occur within ``max_dist`` positions
        (``a NEAR/k b``) — an extension beyond the reference's grammar
        that its positional index already pays for (the positions are
        stored for phrase match, ``memoryindex.py:22-49``; NEAR is the
        k>1 generalization of the k=1 adjacency the reference exposes).
        Same pruned-scan + per-block shape as :meth:`_phrase_df`; block
        results are disjoint so the union needs no dedup."""
        ta, tb = query_normalize(word_a), query_normalize(word_b)
        cells = self._postings_for_terms([ta, tb]).select(
            "block_id", "term", "postings_bin", "positions_bin"
        )
        hits = cells.groupBy("block_id").applyInPandas(
            _block_near(ta, tb, max_dist, self.block_span), "doc_id long"
        )
        return self._mask_deleted(hits).orderBy("doc_id")

    def near_query(
        self, word_a: str, word_b: str, max_dist: int = 3
    ) -> list[int]:
        df = self.near_query_df(word_a, word_b, max_dist)
        return [int(x) for x in df.toPandas()["doc_id"].to_numpy()]

    # --------------------------------------------------------------- wildcard
    def wildcard_expand(self, pattern: str) -> list[str]:
        """Vocab words containing every gram of the wildcard pattern
        (reference ``query.py:125-134`` — NO post-filter against the
        pattern, preserved deliberately)."""
        grams = wildcard_grams(pattern)
        if not grams:
            return []
        rows = (
            self.kgrams.where(F.col("gram").isin(sorted(grams)))
            .groupBy("word")
            .agg(F.count_distinct("gram").alias("ng"))
            .where(F.col("ng") == len(grams))
            .select("word")
            .collect()
        )
        return sorted(r["word"] for r in rows)

    # ------------------------------------------------------------------ fuzzy
    def fuzzy_expand(self, word: str, max_dist: int = 2) -> list[str]:
        """Vocabulary words within ``max_dist`` edits of ``word``,
        candidate-pruned by the k-gram index: only words sharing at
        least one gram of length >= 2 with ``$word$`` are read (the
        length-1 grams are universal — every word's gram set contains
        ``$`` — so they prune nothing and are excluded). One pruned
        kgram scan + a codegen'd ``levenshtein`` filter; the driver
        receives only the surviving words. Complete for query words of
        >= 2*max_dist characters (``max_dist`` edits destroy at most
        ``2*max_dist`` of ``$word$``'s len+1 bigrams); shorter words
        may miss exotic rewrites — the same candidate trade the
        reference's k-gram spell checker makes (``kgram.py:66-91``)."""
        grams = sorted(g for g in kgrams(word) if len(g) >= 2)
        if not grams:
            return []
        rows = (
            self.kgrams.where(F.col("gram").isin(grams))
            .select("word")
            .distinct()
            .withColumn("dist", F.levenshtein(F.lit(word), F.col("word")))
            .where(F.col("dist") <= max_dist)
            .collect()
        )
        return sorted(r["word"] for r in rows)

    def fuzzy_ranked_query_df(
        self, query: str, k: int = DEFAULT_K, max_dist: int = 2
    ) -> DataFrame:
        """Fuzzy ranked retrieval (Lucene FuzzyQuery shape) over the
        index: each query word expands to the vocabulary words within
        ``max_dist`` edits (:meth:`fuzzy_expand` — k-gram-pruned, so
        candidate I/O is O(query grams), not O(vocabulary)); the
        DISTINCT stems of all expansions are scored as a union, each
        with its own idf, through the standard per-block ranked plan."""
        words = {remove_special_characters(w) for w in query.split()}
        cands: set[str] = set()
        for w in sorted(words):
            if w:
                cands.update(self.fuzzy_expand(w, max_dist))
        stems = sorted({query_normalize(w) for w in cands})
        if not stems:
            return self.spark.createDataFrame([], "doc_id long, score double")
        return self._score_terms_df(stems, k)

    # --------------------------------------------------------------- spelling
    def _terms_present(self, words: set[str]) -> set[str]:
        """Subset of ``words`` that exist in the term dictionary — one
        isin-pushed pruned scan (O(query terms) I/O), replacing the
        driver-side whole-vocabulary set a 10^9-term index cannot hold."""
        if not words:
            return set()
        rows = (
            self.terms.where(F.col("term").isin(sorted(words)))
            .select("term")
            .collect()
        )
        return {r["term"] for r in rows}

    def check_spelling(
        self, query: str, vocab: set[str] | None = None, ranked_flag: bool = False
    ) -> str | None:
        """Spell-correct a query (reference ``query.py:35-59``).

        ``vocab=None`` (the scalable default) resolves membership with a
        pruned dictionary scan; passing an explicit set keeps the
        reference's signature for parity tests."""
        if ranked_flag:
            terms = query.split()
        else:
            terms = re.findall(r"\w+", query)
        if vocab is None:
            vocab = self._terms_present(
                {remove_special_characters(t) for t in terms if "*" not in t}
            )
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
        (reference ``query.py:61-67``, ``kgram.py:66-91``).

        df ties pick the alphabetically-FIRST candidate — a documented,
        deterministic divergence from the reference, which keeps the
        first candidate in k-gram-index insertion order (``query.py:67``,
        an artifact of Python dict ordering that a distributed vocab
        does not reproduce). The golden spelling tests pin this.
        """
        candidates = self.find_spelling_candidates(term, JACCARD_THRESHOLD)
        if not candidates:
            return None
        # df of each candidate's stemmed form (reference get_doc_frequency
        # normalizes first, diskindex.py:29)
        stems = {w: query_normalize(w) for w in candidates}
        dfs_by_stem = self._term_dfs(set(stems.values()))
        return max(sorted(candidates), key=lambda w: dfs_by_stem.get(stems[w], 0))

    def find_spelling_candidates(self, qword: str, threshold: float) -> list[str]:
        qgrams = kgrams(qword)
        cand = (
            self.kgrams.where(F.col("gram").isin(sorted(set(qgrams))))
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
