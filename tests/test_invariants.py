"""Cross-table index invariants + boolean algebra identities over a
synthetic corpus (SURVEY §5 test plan item 3) — the structural truths
that must hold for ANY corpus, complementing the golden-value tests.
"""

from math import log, sqrt

import numpy as np
import pytest

from search_engine_spark.engine import TranscriptSearchEngine
from search_engine_spark.fixtures import synthetic_transcripts
from search_engine_spark.functions import codec


@pytest.fixture(scope="module")
def inv_engine(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("inv") / "idx")
    df = synthetic_transcripts(spark, n_convs=30, turns_per_conv=5)  # 150 docs
    return TranscriptSearchEngine.build(spark, df, idx, block_span=32)


@pytest.fixture(scope="module")
def decoded(inv_engine):
    """{term: {doc: tf}}, {term: block rows}, per-doc doclens from blocks."""
    per_term: dict[str, dict[int, int]] = {}
    rows = inv_engine.postings.collect()
    for r in rows:
        d, t = codec.decode_postings(bytes(r["postings_bin"]))
        per_term.setdefault(r["term"], {}).update(
            {int(x): int(y) for x, y in zip(d, t)}
        )
    return per_term, rows


def test_dictionary_consistent_with_postings(inv_engine, decoded):
    per_term, _rows = decoded
    stats = {r["term"]: (r["df"], r["cf"]) for r in inv_engine.terms.collect()}
    assert set(stats) == set(per_term)
    for term, postings in per_term.items():
        df, cf = stats[term]
        assert df == len(postings), term
        assert cf == sum(postings.values()), term


def test_block_metadata_consistent(inv_engine, decoded):
    _per_term, rows = decoded
    span = inv_engine.block_span
    for r in rows:
        d, t = codec.decode_postings(bytes(r["postings_bin"]))
        w = np.frombuffer(bytes(r["weights_bin"]), dtype="<f8")
        dl = codec.vb_decode(bytes(r["doclens_bin"]))
        assert r["df_block"] == len(d) == len(w) == len(dl)
        assert r["first_doc_id"] == d[0] and r["last_doc_id"] == d[-1]
        assert d[0] // span == d[-1] // span == r["block_id"]
        assert r["max_tf"] == int(t.max())
        assert r["min_dl"] == int(dl.min())
        assert r["sum_tf"] == int(t.sum())
        assert r["max_partial"] == pytest.approx(
            float(np.max((1.0 + np.log(t)) / w)), rel=1e-12
        )


def test_doc_stats_consistent_with_postings(inv_engine, decoded):
    per_term, _rows = decoded
    by_doc: dict[int, list[int]] = {}
    for postings in per_term.values():
        for doc, tf in postings.items():
            by_doc.setdefault(doc, []).append(tf)
    stats = {
        int(r["doc_id"]): (float(r["weight"]), int(r["doc_len"]))
        for r in inv_engine.doc_stats.collect()
    }
    assert set(stats) == set(by_doc)
    for doc, tfs in by_doc.items():
        weight, doc_len = stats[doc]
        assert doc_len == sum(tfs)
        assert weight == pytest.approx(
            sqrt(sum((1.0 + log(tf)) ** 2 for tf in tfs)), rel=1e-12
        )
    assert inv_engine.total_tokens == sum(dl for _w, dl in stats.values())
    assert inv_engine.num_docs == len(stats)


def test_boolean_algebra_identities(inv_engine):
    a, b = "test", "here"
    only_a = set(inv_engine.boolean_query(a))
    only_b = set(inv_engine.boolean_query(b))
    a_and_b = set(inv_engine.boolean_query(f"{a} {b}"))
    a_or_b = set(inv_engine.boolean_query(f"{a} + {b}"))
    assert a_and_b == only_a & only_b
    assert a_or_b == only_a | only_b
    phrase = set(inv_engine.boolean_query(f'"{a} {b}"'))
    assert phrase <= a_and_b


def test_ranked_union_semantics_and_bounds(inv_engine):
    """Ranked retrieval is union-semantics (any query term) and every
    scored doc contains at least one query term."""
    terms = ["test", "here"]
    docs_any = set(inv_engine.boolean_query(" + ".join(terms)))
    top = inv_engine.ranked_query(" ".join(terms), k=10_000)
    assert {d for d, _s in top} == docs_any
    assert all(s > 0 for _d, s in top)
