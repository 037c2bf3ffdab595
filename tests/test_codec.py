"""Roundtrip + property tests for the varbyte/delta posting codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.codec import (
    decode_positions,
    decode_postings,
    encode_positions,
    encode_postings,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**62], dtype=np.uint64)
    assert list(vb_decode(vb_encode(vals))) == [int(v) for v in vals]


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_vb_single_byte_values_compact():
    vals = np.arange(128, dtype=np.uint64)
    assert len(vb_encode(vals)) == 128  # one byte each


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_vb_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = vb_decode(vb_encode(arr))
    assert list(out) == vals


def test_postings_roundtrip():
    doc_ids = np.array([0, 3, 4, 1000, 10**12])
    tfs = np.array([5, 1, 2, 9, 1])
    d, t = decode_postings(encode_postings(doc_ids, tfs))
    assert list(d) == list(doc_ids)
    assert list(t) == list(tfs)


def test_postings_empty():
    d, t = decode_postings(encode_postings(np.array([]), np.array([])))
    assert d.size == 0 and t.size == 0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**40), st.integers(1, 1000)),
        max_size=100,
        unique_by=lambda x: x[0],
    )
)
def test_postings_roundtrip_property(pairs):
    pairs.sort()
    doc_ids = np.array([p[0] for p in pairs], dtype=np.int64)
    tfs = np.array([p[1] for p in pairs], dtype=np.int64)
    d, t = decode_postings(encode_postings(doc_ids, tfs))
    assert list(d) == list(doc_ids) and list(t) == list(tfs)


def test_positions_roundtrip():
    # three docs with tfs [3, 1, 2]
    tfs = np.array([3, 1, 2])
    flat = np.array([0, 4, 9, 2, 5, 5])  # doc2 has duplicate positions (hyphen-stem collision)
    out = decode_positions(encode_positions(tfs, flat), tfs)
    assert [list(x) for x in out] == [[0, 4, 9], [2], [5, 5]]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 10**6), min_size=1, max_size=30).map(sorted),
        max_size=30,
    )
)
def test_positions_roundtrip_property(per_doc):
    tfs = np.array([len(p) for p in per_doc], dtype=np.int64)
    flat = np.array([x for p in per_doc for x in p], dtype=np.int64)
    out = decode_positions(encode_positions(tfs, flat), tfs)
    assert [list(x) for x in out] == [list(map(int, p)) for p in per_doc]


def test_compression_beats_fixed_width():
    # zipf-ish gaps: varbyte must beat the reference's fixed 4B layout
    rng = np.random.default_rng(42)
    doc_ids = np.cumsum(rng.integers(1, 50, size=10_000))
    tfs = rng.integers(1, 5, size=10_000)
    blob = encode_postings(doc_ids, tfs)
    fixed = 4 + 8 * 10_000  # reference: 4B df + (4B gap + 4B tf) per doc
    assert len(blob) < fixed / 2.5
