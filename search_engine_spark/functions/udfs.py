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
    reference's lazy seek, ``diskindex.py:124-125``)."""
    docs, tfs = [], []
    for blob in blobs:
        d, t = codec.decode_postings(bytes(blob))
        docs.append(d.tolist())
        tfs.append(t.tolist())
    return pd.DataFrame({"doc_ids": docs, "tfs": tfs})


@F.pandas_udf(_FULL_TYPE)
def decode_full_udf(postings_blobs: pd.Series, position_blobs: pd.Series) -> pd.DataFrame:
    docs, tfs, poss = [], [], []
    for pblob, posblob in zip(postings_blobs, position_blobs):
        d, t = codec.decode_postings(bytes(pblob))
        p = codec.decode_positions(bytes(posblob), t)
        docs.append(d.tolist())
        tfs.append(t.tolist())
        poss.append([x.tolist() for x in p])
    return pd.DataFrame({"doc_ids": docs, "tfs": tfs, "positions": poss})
