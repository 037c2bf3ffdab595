"""Index-backed analytics operators vs their relational twins.

The six round-5 engine methods (significant terms, keywords, explain,
phrase-constrained / synonym-group ranking, BM25F) answer from the
INDEX — posting cells, terms dictionary, doc_stats — never from the
corpus text. These tests build the engine over a STEM-INVARIANT corpus
(every word is its own Porter2 stem, no hyphens/apostrophes/case), on
which the full analyzer coincides with :mod:`simple`'s whitespace
tokenizer — so each engine method must produce VALUE-IDENTICAL results
to its relational twin. A monkeypatch guard additionally pins that the
engine paths never call the corpus tokenizer, and plan checks pin that
the lazy paths never scan the ``text`` column.
"""

from __future__ import annotations

import contextlib
import datetime as dt
import io
import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark import simple
from search_engine_spark.engine import TranscriptSearchEngine

#: every word is its own Porter2 stem (checked in test_vocab_invariant)
VOCAB = [
    "join", "fast", "spark", "scan", "hash", "sort", "filter", "quick",
    "row", "disk", "block", "batch", "shard", "split", "group", "term",
    "stream", "node", "task", "plan",
]
QUERY = "join fast"
QUERY_TERMS = ["join", "fast"]
PHRASE = "hash join"
SYN_GROUPS = [["join", "sort"], ["fast", "quick"]]
REGEX = "^s.*"
BIG_K = 500  # superset of every matching doc: set-equality, no tie risk


def _formatted_plan(spark, df) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def analytics_engine(spark, tmp_path_factory):
    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA

    rng = random.Random(7)
    epoch = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(120):
        n = 5 + (i % 9)
        words = [rng.choice(VOCAB) for _ in range(n)]
        if i % 10 == 0:
            words += ["hash", "join"]  # guaranteed phrase hits
        rows.append(
            (
                f"c{i // 4:03d}",
                i % 4,
                ["user", "assistant", "tool"][i % 3],
                " ".join(words),
                "",
                epoch + dt.timedelta(seconds=i),
            )
        )
    transcripts = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    idx = str(tmp_path_factory.mktemp("analytics") / "idx")
    # block_span=16 -> 8 blocks: the per-block workers see real
    # multi-block inputs, not the degenerate one-block case
    IndexBuilder(spark, idx, block_span=16).build(transcripts)
    return TranscriptSearchEngine(spark, idx)


def _rows(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def test_vocab_invariant():
    from search_engine_spark.text.normalize import analyze, query_normalize

    for w in VOCAB:
        assert query_normalize(w) == w
    assert analyze("join fast") == [("join", 0, "join"), ("fast", 1, "fast")]


def test_significant_terms_matches_simple(analytics_engine):
    got = analytics_engine.significant_terms_df(QUERY, n=50)
    want = simple.significant_terms(analytics_engine.docs, QUERY_TERMS, n=50)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 3


def test_keywords_matches_simple(analytics_engine):
    got = analytics_engine.keywords_df(n=3)
    want = simple.keywords(analytics_engine.docs, n=3)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 3 * 120


def test_ranked_explain_matches_simple(analytics_engine):
    got = analytics_engine.ranked_explain_df(QUERY, k=BIG_K)
    want = simple.ranked_explain(analytics_engine.docs, QUERY_TERMS, k=BIG_K)
    assert _rows(got) == _rows(want)


def test_explain_contribs_sum_to_ranked_score(analytics_engine):
    eng = analytics_engine
    scores = dict(eng.ranked_query(QUERY, k=5))
    contribs = (
        eng.ranked_explain_df(QUERY, k=5)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("s"))
        .collect()
    )
    assert len(contribs) == 5
    for r in contribs:
        assert abs(scores[r["doc_id"]] - r["s"]) < 5e-6


def test_explain_contribs_sum_with_repeated_term(analytics_engine):
    """A repeated query term accumulates per occurrence on the ranked
    path; explain folds the multiplicity into contrib, so the sum
    invariant must hold for 'join join fast' too."""
    eng = analytics_engine
    q = "join join fast"
    scores = dict(eng.ranked_query(q, k=5))
    contribs = (
        eng.ranked_explain_df(q, k=5)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("s"))
        .collect()
    )
    assert len(contribs) == 5
    for r in contribs:
        assert abs(scores[r["doc_id"]] - r["s"]) < 5e-6


def test_phrase_ranked_repeated_word_matches_simple(analytics_engine):
    """A phrase with a repeated word must score each DISTINCT term once
    (the twin's semantics) — the repeated word's idf contribution must
    not double."""
    got = analytics_engine.phrase_ranked_df("join join", k=BIG_K)
    want = simple.phrase_ranked(
        analytics_engine.docs, ["join", "join"], k=BIG_K
    )
    g = sorted((r["doc_id"], round(r["score"], 6)) for r in got.collect())
    assert g == _rows(want)
    assert len(g) == 4  # seed-7 corpus has 4 'join join' docs


def test_bm25f_conv_empty_query_returns_empty(analytics_engine):
    assert analytics_engine.bm25f_conv_df("", k=5).count() == 0
    assert (
        simple.bm25f_conv(
            analytics_engine.docs.select("conv_id", "role", "text"), [], k=5
        ).count()
        == 0
    )


def test_phrase_ranked_matches_simple(analytics_engine):
    got = analytics_engine.phrase_ranked_df(PHRASE, k=BIG_K)
    want = simple.phrase_ranked(
        analytics_engine.docs, PHRASE.split(), k=BIG_K
    )
    g = sorted((r["doc_id"], round(r["score"], 6)) for r in got.collect())
    assert g == _rows(want)
    assert len(g) >= 12  # every i % 10 == 0 doc carries the phrase


def test_synonym_ranked_matches_simple(analytics_engine):
    got = analytics_engine.synonym_ranked_df(SYN_GROUPS, k=BIG_K)
    want = simple.synonym_ranked(analytics_engine.docs, SYN_GROUPS, k=BIG_K)
    g = sorted((r["doc_id"], round(r["score"], 6)) for r in got.collect())
    assert g == _rows(want)


def test_bm25f_conv_matches_simple(analytics_engine):
    got = analytics_engine.bm25f_conv_df(QUERY, k=BIG_K)
    want = simple.bm25f_conv(
        analytics_engine.docs.select("conv_id", "role", "text"),
        QUERY_TERMS,
        k=BIG_K,
    )
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 5


def test_collocations_matches_textstats(analytics_engine):
    from search_engine_spark.ops import textstats

    got = analytics_engine.collocations_df(min_count=2, k=50)
    want = textstats.collocations(
        analytics_engine.docs, min_count=2, k=50, text_col="text"
    )
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 50


def test_regex_vocab_matches_simple(analytics_engine):
    got = analytics_engine.regex_vocab_df(REGEX)
    want = simple.regex_vocab(analytics_engine.docs, REGEX)
    assert _rows(got) == _rows(want)
    assert {r[0] for r in _rows(got)} == {
        w for w in VOCAB if w.startswith("s")
    }


def test_term_trends_matches_simple(analytics_engine):
    got = analytics_engine.term_trends_df(QUERY_TERMS, bucket_seconds=30)
    want = simple.term_trends(
        analytics_engine.docs, QUERY_TERMS, bucket_seconds=30
    )
    assert _rows(got) == _rows(want)
    # 120 turns at 1s spacing / 30s buckets -> 4 buckets per term
    assert len(_rows(got)) == 8


def test_engine_analytics_never_retokenize(analytics_engine, monkeypatch):
    """The index-backed paths must not touch the corpus tokenizer —
    poison both tokenizer entry points and run every operator."""
    eng = analytics_engine

    def _boom(*_a, **_k):
        raise AssertionError("engine analytics re-tokenized the corpus")

    from search_engine_spark.ops import textstats

    monkeypatch.setattr(simple, "_tokens", _boom)
    monkeypatch.setattr(simple, "tf_table", _boom)
    monkeypatch.setattr(textstats, "_tokens", _boom)
    monkeypatch.setattr(textstats, "bigram_pairs", _boom)
    assert eng.collocations_df(min_count=2, k=5).count() > 0
    assert eng.significant_terms_df(QUERY, n=5).count() > 0
    assert eng.keywords_df(n=2).count() > 0
    assert eng.ranked_explain_df(QUERY, k=3).count() > 0
    assert eng.phrase_ranked_df(PHRASE, k=3).count() > 0
    assert eng.synonym_ranked_df(SYN_GROUPS, k=3).count() > 0
    assert eng.bm25f_conv_df(QUERY, k=3).count() > 0
    assert eng.regex_vocab_df(REGEX).count() > 0
    assert eng.term_trends_df(QUERY_TERMS, bucket_seconds=30).count() > 0


def test_lazy_plans_never_scan_text(spark, analytics_engine):
    """The lazy engine-analytics plans read postings/terms/doc_stats
    only — the docs table's ``text`` column appears in no scan."""
    eng = analytics_engine
    plans = {
        "keywords": _formatted_plan(spark, eng.keywords_df(n=3)),
        "explain": _formatted_plan(spark, eng.ranked_explain_df(QUERY, k=3)),
        "phrase": _formatted_plan(spark, eng.phrase_ranked_df(PHRASE, k=3)),
        "synonym": _formatted_plan(
            spark, eng.synonym_ranked_df(SYN_GROUPS, k=3)
        ),
        "regex": _formatted_plan(spark, eng.regex_vocab_df(REGEX)),
        "trends": _formatted_plan(
            spark, eng.term_trends_df(QUERY_TERMS, bucket_seconds=30)
        ),
    }
    for name, plan in plans.items():
        assert "text:string" not in plan, name
