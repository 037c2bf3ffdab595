"""Golden-index build tests: the full positional index of the 5-doc corpus
must match the reference's (``test/test_memoryindex.py:24-47``,
``test/test_diskindex.py:131-166``)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions import codec

# term -> [(doc_id, [positions])], reference test/test_memoryindex.py:24-47
TRUE_INDEX = {
    "a": [(0, [2]), (2, [3])],
    "anoth": [(1, [0])],
    "document": [(0, [4]), (1, [2]), (4, [0])],
    "go": [(2, [2])],
    "goe": [(4, [2])],
    "here": [(1, [4]), (2, [0]), (4, [3])],
    "is": [(0, [1]), (1, [3])],
    "one": [(2, [5])],
    "test": [(0, [3]), (1, [1]), (3, [0, 1, 2, 3, 4]), (4, [1])],
    "third": [(2, [4])],
    "this": [(0, [0])],
    "we": [(2, [1])],
}


@pytest.fixture(scope="module")
def decoded_index(golden_engine):
    rows = golden_engine.postings.collect()
    index = {}
    for r in rows:
        doc_ids, tfs = codec.decode_postings(bytes(r["postings_bin"]))
        positions = codec.decode_positions(bytes(r["positions_bin"]), tfs)
        index.setdefault(r["term"], []).extend(
            (int(d), [int(p) for p in ps]) for d, ps in zip(doc_ids, positions)
        )
    for term in index:
        index[term].sort()
    return index


def test_full_positional_index_matches_reference(decoded_index):
    assert decoded_index == TRUE_INDEX


def test_vocab_set(golden_engine):
    # reference test/test_diskindex.py:149-154
    assert set(golden_engine.vocab()) == set(TRUE_INDEX)


def test_document_frequencies(golden_engine):
    # reference test/test_diskindex.py:156-166: df(test)=4, df(here)=3
    dfs = {
        r["term"]: r["df"] for r in golden_engine.terms.select("term", "df").collect()
    }
    assert dfs["test"] == 4
    assert dfs["here"] == 3
    assert dfs == {t: len(p) for t, p in TRUE_INDEX.items()}


def test_doc_weights(golden_engine):
    # L_d = sqrt(sum (1+ln tf)^2) over each doc's distinct terms
    # (reference diskindex.py:302-306). Doc 3 = "Test test! Test test test."
    # has one term with tf 5.
    weights = {
        r["doc_id"]: r["weight"]
        for r in golden_engine.doc_stats.select("doc_id", "weight").collect()
    }
    assert weights[3] == pytest.approx(math.sqrt((1 + math.log(5)) ** 2), abs=1e-12)
    # doc 0: five distinct terms, tf=1 each -> sqrt(5 * 1)
    assert weights[0] == pytest.approx(math.sqrt(5.0), abs=1e-12)
    assert set(weights) == {0, 1, 2, 3, 4}


def test_block_metadata(golden_engine):
    rows = golden_engine.postings.where(F.col("term") == "test").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["df_block"] == 4
    assert r["first_doc_id"] == 0 and r["last_doc_id"] == 4
    assert r["max_tf"] == 5 and r["sum_tf"] == 8
    # block-max partial: doc 3 has tf 5 and L_d = 1+ln5 -> partial = 1.0
    assert r["max_partial"] == pytest.approx(1.0, abs=1e-12)


def test_num_docs_meta(golden_engine):
    assert golden_engine.num_docs == 5


def test_kgram_table_is_unstemmed(golden_engine):
    # reference builds the k-gram index from UNSTEMMED vocab
    # (memoryindex.py:32-33): 'testing' and 'goes' must be k-gram words
    words = {
        r["word"] for r in golden_engine.kgrams.select("word").distinct().collect()
    }
    assert {"testing", "goes", "another", "document", "here"} <= words
    assert "anoth" not in words and "goe" not in words


def test_postings_invariants(golden_engine):
    # positions ascending, df_block == decoded length, gaps >= 0
    for r in golden_engine.postings.collect():
        doc_ids, tfs = codec.decode_postings(bytes(r["postings_bin"]))
        assert len(doc_ids) == r["df_block"]
        assert list(doc_ids) == sorted(doc_ids)
        positions = codec.decode_positions(bytes(r["positions_bin"]), tfs)
        for tf, ps in zip(tfs, positions):
            assert len(ps) == tf
            assert all(np.diff(ps) >= 0)
