"""PII detection and redaction — per-row JVM regex projections.

A large-scale training-data pipeline scrubs personally identifiable
information before anything else ships; these operators are the
Spark-native version: `regexp_extract_all`/`regexp_replace` expressions
that stay inside whole-stage codegen (no Python in the hot path), are
embarrassingly parallel (no shuffle at any scale), and use patterns
written in the Java-regex ∩ RE2 common subset (no lookaround, no
backreferences) so the exact same strings run under DuckDB for the
oracle check.

Detection counts each category independently on the ORIGINAL text;
redaction applies the categories sequentially in `CATEGORIES` order, so
earlier (more specific) patterns consume their text before broader
number patterns see it — e.g. an SSN becomes ``<SSN>`` before the
long-number rule could swallow it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — ordered: redaction applies top-down.
# Patterns deliberately avoid Java-only syntax (possessive quantifiers,
# lookaround) and RE2-only syntax so Spark and DuckDB agree byte-for-byte.
CATEGORIES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # phone requires explicit separators, so it cannot match inside an
    # undelimited long number (which the last rule owns)
    ("phone", r"(?:\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # 13-16 contiguous digits: credit-card / account-number shaped
    ("longnum", r"\b\d{13,16}\b", "<NUMBER>"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast(
        "long"
    )


def pii_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII hit counts: (id, n_<category>..., n_pii, has_pii).

    One codegen'd projection; counts are per-category on the RAW text,
    so categories CAN overlap and ``n_pii`` counts spans, not distinct
    characters — e.g. a 13-digit run in an email local part
    (``1234567890123@x.com``) hits both ``n_email`` and ``n_longnum``
    ('@' is a word boundary). Redaction is the sequential-semantics
    path (earlier categories consume text before later ones see it);
    counting stays independent so each column answers "how many of
    THIS shape appear" and the oracle SQL stays a per-pattern count.
    """
    col = F.col(text_col)
    counts = [
        _count(col, pattern).alias(f"n_{name}")
        for name, pattern, _ in CATEGORIES
    ]
    out = df.select(id_col, *counts)
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in CATEGORIES[1:]),
        F.col(f"n_{CATEGORIES[0][0]}"),
    )
    return out.select(
        id_col,
        *[f"n_{name}" for name, _, _ in CATEGORIES],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted): text with every category replaced by its
    placeholder, applied in `CATEGORIES` order (all occurrences)."""
    col = F.col(text_col)
    for _, pattern, placeholder in CATEGORIES:
        col = F.regexp_replace(col, pattern, placeholder)
    return df.select(id_col, col.alias("redacted"))
