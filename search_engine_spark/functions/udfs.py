"""Arrow-batched pandas UDFs: analysis + posting codec wrappers.

Per the north_rule, everything in the build/query hot path is a
vectorized pandas UDF over Arrow batches — no row-at-a-time Python UDFs.
The decode UDFs return *struct-of-arrays* (one numpy decode per posting
block, then JVM-side ``arrays_zip`` + ``explode``) rather than
array-of-structs, which keeps the per-row Python work to a single
vectorized numpy pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.functions import codec
from search_engine_spark.text.kgrams import kgrams
from search_engine_spark.text.normalize import analyze

# Return types are built with DataType constructors (not DDL strings) so
# importing this module never requires an active SparkContext.
ANALYZE_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("pos", T.IntegerType()),
            T.StructField("raw", T.StringType()),
        ]
    )
)
_DOC_TFS_TYPE = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
    ]
)
_FULL_TYPE = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("positions", T.ArrayType(T.ArrayType(T.IntegerType()))),
    ]
)


@F.pandas_udf(ANALYZE_TYPE)
def analyze_udf(texts: pd.Series) -> pd.Series:
    """Tokenize+normalize (reference ``normalize.py``/``diskindex.py:165-185``)."""
    return texts.map(
        lambda t: [
            {"term": term, "pos": pos, "raw": raw} for term, pos, raw in analyze(t or "")
        ]
    )


ANALYZE_DOC_TYPE = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("positions", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("words", T.ArrayType(T.StringType())),
        T.StructField("weight", T.DoubleType()),
        T.StructField("doc_len", T.IntegerType()),
    ]
)


@F.pandas_udf(ANALYZE_DOC_TYPE)
def analyze_doc_udf(texts: pd.Series) -> pd.DataFrame:
    """Tokenize + normalize + per-doc aggregate, all map-side.

    Emits, per document: aligned (terms, tfs, sorted position lists)
    arrays, the distinct unstemmed vocabulary words, and the reference's
    doc weight L_d = sqrt(sum (1+ln tf)^2) accumulated in
    term-first-occurrence order (``memoryindex.py:22-51``,
    ``diskindex.py:162-186,302-306``).

    Doing the per-doc aggregation inside the Arrow batch means the index
    build shuffles one row per (doc, term) instead of one per token
    occurrence — at transcript scale that deletes the largest shuffle
    (every token) plus the doc-weight aggregation and the tf-weight join
    that a naive groupBy pipeline needs. The struct-of-arrays layout
    (not array-of-structs) keeps the Arrow conversion to a few list
    columns instead of millions of tiny structs.
    """
    from math import log, sqrt

    terms_col, tfs_col, pos_col, words_col, weights, lens = [], [], [], [], [], []
    for t in texts:
        toks = analyze(t or "")
        acc: dict[str, list[int]] = {}
        words: set[str] = set()
        for term, pos, raw in toks:
            acc.setdefault(term, []).append(pos)
            words.add(raw)
        weight = 0.0
        tfs = []
        for positions in acc.values():
            tf = len(positions)
            w = 1.0 + log(tf)
            weight += w * w
            tfs.append(tf)
        terms_col.append(list(acc.keys()))
        tfs_col.append(tfs)
        pos_col.append(list(acc.values()))
        words_col.append(sorted(words))
        weights.append(sqrt(weight))
        lens.append(len(toks))
    return pd.DataFrame(
        {
            "terms": terms_col,
            "tfs": tfs_col,
            "positions": pos_col,
            "words": words_col,
            "weight": weights,
            "doc_len": lens,
        }
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def kgrams_udf(words: pd.Series) -> pd.Series:
    """All 1..3-grams of ``$word$`` (reference ``kgram.py:18-25``)."""
    return words.map(lambda w: sorted(kgrams(w)))


@F.pandas_udf(T.BinaryType())
def encode_postings_udf(doc_ids: pd.Series, tfs: pd.Series) -> pd.Series:
    return pd.Series(
        [
            codec.encode_postings(np.asarray(d, dtype=np.int64), np.asarray(t, dtype=np.int64))
            for d, t in zip(doc_ids, tfs)
        ]
    )


@F.pandas_udf(T.BinaryType())
def encode_weights_udf(weights: pd.Series) -> pd.Series:
    """Pack per-posting doc weights (L_d) as little-endian float64 —
    exact bit preservation so score = acc/L_d matches the reference's
    float64 arithmetic. Stored inline per (term, block) so ranked
    scoring needs NO doc_stats join (at 10^9+ docs that join shuffles
    the whole stats table per query)."""
    return pd.Series(
        [np.asarray(w, dtype="<f8").tobytes() for w in weights]
    )


@F.pandas_udf(T.BinaryType())
def encode_positions_udf(tfs: pd.Series, flat_positions: pd.Series) -> pd.Series:
    return pd.Series(
        [
            codec.encode_positions(
                np.asarray(t, dtype=np.int64), np.asarray(p, dtype=np.int64)
            )
            for t, p in zip(tfs, flat_positions)
        ]
    )


@F.pandas_udf(_DOC_TFS_TYPE)
def decode_doc_tfs_udf(blobs: pd.Series) -> pd.DataFrame:
    """Decode postings_bin -> (doc_ids, tfs); positions column untouched,
    so Catalyst prunes position bytes for non-phrase queries (the
    reference's lazy seek, ``diskindex.py:124-125``). Cells hold numpy
    arrays (no .tolist()) — Arrow zero-copies primitive arrays, which
    matters when a hot term's block decodes to 10^4-10^5 postings."""
    docs, tfs = [], []
    for blob in blobs:
        d, t = codec.decode_postings(bytes(blob))
        docs.append(d)
        tfs.append(t.astype(np.int32))
    return pd.DataFrame({"doc_ids": docs, "tfs": tfs})


_SCORING_TYPE = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ]
)


@F.pandas_udf(_SCORING_TYPE)
def decode_scoring_udf(postings_blobs: pd.Series, weight_blobs: pd.Series) -> pd.DataFrame:
    """Decode postings_bin + weights_bin -> (doc_ids, tfs, L_d per doc):
    everything ranked scoring needs, no doc_stats join."""
    docs, tfs, ws = [], [], []
    for pblob, wblob in zip(postings_blobs, weight_blobs):
        d, t = codec.decode_postings(bytes(pblob))
        docs.append(d)
        tfs.append(t.astype(np.int32))
        ws.append(np.frombuffer(bytes(wblob), dtype="<f8"))
    return pd.DataFrame({"doc_ids": docs, "tfs": tfs, "weights": ws})


@F.pandas_udf(_FULL_TYPE)
def decode_full_udf(postings_blobs: pd.Series, position_blobs: pd.Series) -> pd.DataFrame:
    docs, tfs, poss = [], [], []
    for pblob, posblob in zip(postings_blobs, position_blobs):
        d, t = codec.decode_postings(bytes(pblob))
        p = codec.decode_positions(bytes(posblob), t)
        docs.append(d)
        tfs.append(t.astype(np.int32))
        poss.append([x.astype(np.int32) for x in p])
    return pd.DataFrame({"doc_ids": docs, "tfs": tfs, "positions": poss})
