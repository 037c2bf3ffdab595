"""Role-boosted and diversified ranked retrieval.

Both paths reuse the per-block scorer; these tests pin (a) exact
equivalence to the plain ranked path when the feature is a no-op,
(b) brute-force equality on a MULTI-BLOCK index where conversations
straddle block boundaries (the per-block cap proof's interesting
case), and (c) tombstone masking.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.engine import TranscriptSearchEngine
from search_engine_spark.fixtures import synthetic_transcripts

QUERY = "test spark data"


@pytest.fixture(scope="module")
def mb_engine(spark, tmp_path_factory):
    """400 turns, block_span=16: conversations are 10 turns, so every
    conversation straddles a block boundary somewhere in the corpus."""
    index_dir = str(tmp_path_factory.mktemp("bd") / "index")
    tr = synthetic_transcripts(spark, n_convs=40, turns_per_conv=10)
    return TranscriptSearchEngine.build(spark, tr, index_dir, block_span=16)


def _full_scores(engine, query):
    rows = engine.ranked_query_df(query, k=100_000).collect()
    return {r.doc_id: r.score for r in rows}


# ------------------------------------------------------------------ boosted
def test_boost_identity_equals_base(golden_engine):
    base = golden_engine.ranked_query_df(QUERY, k=5).collect()
    got = golden_engine.ranked_query_boosted_df(QUERY, F.lit(1.0), k=5).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in base
    ]


def test_boost_reorders_and_scales(golden_engine):
    base = _full_scores(golden_engine, "test document")
    boost = F.when(F.col("role") == "assistant", 100.0).otherwise(1.0)
    got = golden_engine.ranked_query_boosted_df(
        "test document", boost, k=5
    ).collect()
    # golden corpus: assistant turns are doc 1 (conv0/turn1) and doc 4
    # (conv1/turn1) — with a 100x boost they must lead the ranking
    assert {got[0].doc_id, got[1].doc_id} == {1, 4}
    for r in got:
        mult = 100.0 if r.doc_id in (1, 4) else 1.0
        assert r.score == pytest.approx(base[r.doc_id] * mult, rel=1e-12)


def test_boost_brute_force_multiblock(mb_engine):
    """Boosted top-k == brute force (score every doc, multiply, sort)
    on a multi-block index."""
    base = _full_scores(mb_engine, QUERY)
    roles = {
        r.doc_id: r.role for r in mb_engine.docs.select("doc_id", "role").collect()
    }
    mult = {"assistant": 3.0, "tool": 0.25}
    expected = sorted(
        (
            (did, s * mult.get(roles[did], 1.0))
            for did, s in base.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    boost = (
        F.when(F.col("role") == "assistant", 3.0)
        .when(F.col("role") == "tool", 0.25)
        .otherwise(1.0)
    )
    got = mb_engine.ranked_query_boosted_df(QUERY, boost, k=10).collect()
    assert [r.doc_id for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert r.score == pytest.approx(s, rel=1e-12)


# ------------------------------------------------------------------ diverse
def test_diverse_unconstrained_equals_base(golden_engine):
    base = golden_engine.ranked_query_df("test", k=5).collect()
    got = golden_engine.ranked_query_diverse_df(
        "test", k=5, per_group=10
    ).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in base
    ]


def test_diverse_cap_one_per_conv(golden_engine):
    got = golden_engine.ranked_query_diverse_df(
        "test", k=5, per_group=1
    ).collect()
    convs = [r.group_key for r in got]
    assert len(set(convs)) == len(convs)
    assert len(got) <= 2  # golden corpus has exactly 2 conversations


@pytest.mark.parametrize("per_group", [1, 2, 3])
def test_diverse_brute_force_multiblock(mb_engine, per_group):
    """Diversified top-k == brute force (score everything, cap per
    conversation in total order, take k) — conversations straddle
    blocks here, so this exercises the per-block cap proof."""
    base = _full_scores(mb_engine, QUERY)
    ranked = sorted(base.items(), key=lambda t: (-t[1], t[0]))
    seen: dict[int, int] = {}
    expected = []
    for did, s in ranked:
        conv = did // 10
        if seen.get(conv, 0) < per_group:
            seen[conv] = seen.get(conv, 0) + 1
            expected.append((did, f"conv{conv:08d}", s))
        if len(expected) == 10:
            break
    got = mb_engine.ranked_query_diverse_df(
        QUERY, k=10, per_group=per_group
    ).collect()
    assert [(r.doc_id, r.group_key) for r in got] == [
        (d, c) for d, c, _ in expected
    ]
    for r, (_, _, s) in zip(got, expected):
        assert r.score == pytest.approx(s, rel=1e-12)


def test_diverse_and_boost_mask_deletes(spark, tmp_path):
    """Deleting the top doc removes it from both paths' results."""
    index_dir = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_convs=10, turns_per_conv=5)
    eng = TranscriptSearchEngine.build(spark, tr, index_dir, block_span=8)
    top = eng.ranked_query_df(QUERY, k=1).collect()[0].doc_id
    eng.delete([int(top)])
    got_d = eng.ranked_query_diverse_df(QUERY, k=10, per_group=5).collect()
    got_b = eng.ranked_query_boosted_df(QUERY, F.lit(1.0), k=10).collect()
    assert top not in [r.doc_id for r in got_d]
    assert top not in [r.doc_id for r in got_b]


def test_bm25_boost_brute_force_multiblock(mb_engine):
    rows = mb_engine.bm25_query_df(QUERY, k=100_000).collect()
    base = {r.doc_id: r.score for r in rows}
    roles = {
        r.doc_id: r.role for r in mb_engine.docs.select("doc_id", "role").collect()
    }
    mult = {"assistant": 3.0, "tool": 0.25}
    expected = sorted(
        ((did, s * mult.get(roles[did], 1.0)) for did, s in base.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    boost = (
        F.when(F.col("role") == "assistant", 3.0)
        .when(F.col("role") == "tool", 0.25)
        .otherwise(1.0)
    )
    got = mb_engine.bm25_query_boosted_df(QUERY, boost, k=10).collect()
    assert [r.doc_id for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert r.score == pytest.approx(s, rel=1e-12)


def test_bm25_boost_identity_equals_base(golden_engine):
    base = golden_engine.bm25_query_df(QUERY, k=5).collect()
    got = golden_engine.bm25_query_boosted_df(QUERY, F.lit(1.0), k=5).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in base
    ]
