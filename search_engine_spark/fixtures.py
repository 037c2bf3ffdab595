"""Deterministic test/bench fixtures (FIXTURES.md).

The authoritative input is an Iceberg-style table of transcripts
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``; one document = one turn. Generation is seed-fixed
(seed = 42 + doc_rank per turn) and parallelism-invariant, so the same
(n_convs, turns_per_conv) always yields byte-identical text regardless
of partitioning — required for resume tests and rank-identity.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

# The reference's 5 golden docs (test/test_docs/doc{1..5}.json bodies),
# mapped so doc_id 0..4 equals the reference's sorted-filename ids.
GOLDEN_TEXTS = [
    ("conv00000000", 0, "This is a test document."),
    ("conv00000000", 1, "Another testing document is here."),
    ("conv00000000", 2, "Here we go, a third one."),
    ("conv00000001", 0, "Test test! Test test test."),
    ("conv00000001", 1, "Document testing goes here."),
]

_ROLES = ["user", "assistant", "tool"]

# Synthetic vocabulary exercising every normalizer/query path (FIXTURES.md §3):
# zipf-skewed hot terms, hyphens, punctuation/apostrophes, stem families,
# wildcard/spelling bait, and a rare symbol-only token (empty-term edge).
_POOL = [
    "test", "document", "here", "data", "spark", "index", "query", "the", "and",
    "search-engine", "state-of-the-art", "top-k",
    "don't", '"quoted"', "(parens)", "trailing!!!",
    "testing", "tested", "tests", "documents", "documented",
    "running", "runs", "ran", "conspicuous",
    "docu", "this", "third", "wort", "word", "ward",
    "shuffle", "partition", "cluster", "vector", "token", "--",
]
_WEIGHTS = np.array(
    [
        0.40, 0.06, 0.05, 0.05, 0.04, 0.03, 0.03, 0.05, 0.04,
        0.01, 0.01, 0.01,
        0.01, 0.01, 0.01, 0.01,
        0.02, 0.01, 0.01, 0.02, 0.01,
        0.01, 0.01, 0.01, 0.01,
        0.005, 0.01, 0.01, 0.005, 0.005, 0.005,
        0.02, 0.02, 0.02, 0.02, 0.015, 0.005,
    ]
)
_WEIGHTS = _WEIGHTS / _WEIGHTS.sum()


def _turn_text(doc_rank: int) -> str:
    rng = np.random.default_rng(42 + doc_rank)
    n = int(rng.integers(5, 31))
    return " ".join(rng.choice(_POOL, size=n, p=_WEIGHTS))


def golden_transcripts(spark: SparkSession) -> DataFrame:
    """The reference's 5-doc golden corpus as transcript turns."""
    rows = []
    for rank, (conv_id, turn_idx, text) in enumerate(GOLDEN_TEXTS):
        rows.append(
            (
                conv_id,
                turn_idx,
                _ROLES[turn_idx % 3],
                text,
                "bash" if turn_idx % 3 == 2 else "",
                _EPOCH + dt.timedelta(seconds=rank),
            )
        )
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int,
    turns_per_conv: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript generator (seed 42 + doc_rank)."""
    total = n_convs * turns_per_conv

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ranks = pdf["id"].to_numpy()
            convs = ranks // turns_per_conv
            turns = (ranks % turns_per_conv).astype("int32")
            yield pd.DataFrame(
                {
                    "conv_id": [f"conv{c:08d}" for c in convs],
                    "turn_idx": turns,
                    "role": [_ROLES[t % 3] for t in turns],
                    "text": [_turn_text(int(r)) for r in ranks],
                    "tool": ["bash" if t % 3 == 2 else "" for t in turns],
                    "ts": pd.to_datetime(ranks, unit="s", origin=_EPOCH.replace(tzinfo=None)),
                }
            )

    base = spark.range(0, total, numPartitions=num_partitions)
    return base.mapInPandas(gen, TRANSCRIPT_SCHEMA)


def documents_as_multiturn(
    documents: DataFrame, turns_per_conv: int = 7
) -> DataFrame:
    """Adapt ``documents`` to MULTI-TURN transcripts: consecutive docs
    share a conversation (``conv = doc_id DIV turns_per_conv``) and
    cycle roles (``role = _ROLES[doc_id % 3]``) — deterministic pure
    functions of doc_id, so SQL oracles for conversation- or
    role-aware retrieval can reconstruct both without a side table.
    Text and doc order are untouched: an index built from this adapter
    is bit-identical to one built from :func:`documents_as_transcripts`
    (only the docs metadata table differs)."""
    return documents.select(
        F.format_string(
            "conv%08d", F.expr(f"doc_id DIV {turns_per_conv}").cast("long")
        ).alias("conv_id"),
        (F.col("doc_id") % turns_per_conv).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in _ROLES]),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("ts"),
    )


def documents_as_transcripts(documents: DataFrame) -> DataFrame:
    """Adapt the driver-provided ``documents(doc_id, text, ...)`` table to
    the transcript shape (one conversation per source, doc order preserved)."""
    return documents.select(
        F.format_string("conv%08d", F.col("doc_id").cast("long")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("ts"),
    )


#: deterministic tool names for the agent-turns adapter — generic
#: agent-loop verbs, reconstructed in oracles as a doc_id CASE
_TOOLS = ["search", "bash", "read_file", "web_fetch"]


def documents_as_agent_turns(
    documents: DataFrame, turns_per_conv: int = 7
) -> DataFrame:
    """:func:`documents_as_multiturn` with the ``tool`` column FILLED:
    tool-role turns (``doc_id % 3 == 2``) carry ``tool =
    _TOOLS[(doc_id DIV 5) % 4]`` (DIV 5 so consecutive tool turns in a
    conversation — doc_ids 3 apart — sometimes repeat the same tool,
    exercising retry detection), all other turns carry ``''``. Every
    column stays a pure function of ``doc_id`` (oracle-reconstructible
    without a side table), and text/doc order are untouched, so an
    index built from this adapter is bit-identical to the single-turn
    one."""
    tool = F.when(
        F.col("doc_id") % 3 == 2,
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.expr("doc_id DIV 5") % 4).cast("int") + 1,
        ),
    ).otherwise(F.lit(""))
    return documents.select(
        F.format_string(
            "conv%08d", F.expr(f"doc_id DIV {turns_per_conv}").cast("long")
        ).alias("conv_id"),
        (F.col("doc_id") % turns_per_conv).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in _ROLES]),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("role"),
        F.col("text"),
        tool.alias("tool"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("ts"),
    )


def documents_as_noisy_turns(documents: DataFrame) -> DataFrame:
    """Adapt ``documents`` to transcripts with INJECTED structural
    faults — the fixture for transcript-QC operators
    (:func:`search_engine_spark.ops.export.transcript_report`). Every
    fault is a pure function of ``doc_id`` so a SQL oracle reconstructs
    the exact same turns without a side table:

    * ``conv = doc_id DIV 5`` (5 turns per conversation),
    * ``turn_idx = doc_id % 5``, bumped by +10 when ``doc_id % 11 ==
      3`` — the bumped turn sorts to the END of its conversation,
      leaving a hole at its base slot AND a jump to 1x (two index
      gaps; at most one bump per conv since 5 < 11, so indexes stay
      unique and sort order stays well-defined),
    * ``role = _ROLES[(doc_id DIV 2) % 3]`` — adjacent same-role pairs
      (broken user/assistant alternation) roughly every other turn,
    * ``ts = epoch + doc_id sec``, except ``doc_id % 13 == 5`` runs 2 s
      EARLY — plus the bumped turns carry their doc_id-based ts to the
      end of the conv, so time goes backwards in turn order there too,
    * ``text = ''`` when ``doc_id % 17 == 9`` (empty turns).
    """
    bumped = F.when(F.col("doc_id") % 11 == 3, F.lit(10)).otherwise(F.lit(0))
    early = F.when(F.col("doc_id") % 13 == 5, F.lit(2)).otherwise(F.lit(0))
    return documents.select(
        F.format_string(
            "conv%08d", F.expr("doc_id DIV 5").cast("long")
        ).alias("conv_id"),
        ((F.col("doc_id") % 5) + bumped).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in _ROLES]),
            (F.expr("doc_id DIV 2") % 3).cast("int") + 1,
        ).alias("role"),
        F.when(F.col("doc_id") % 17 == 9, F.lit("")).otherwise(F.col("text")).alias("text"),
        F.lit("").alias("tool"),
        (
            F.lit(_EPOCH)
            + F.make_interval(secs=(F.col("doc_id") - early).cast("double"))
        ).alias("ts"),
    )
