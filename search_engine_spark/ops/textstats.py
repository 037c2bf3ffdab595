"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All JVM-side expressions (codegen'd; SQL-oracle-checkable). Each is a
per-row projection — embarrassingly parallel, no shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.hashing import M31, h31

# Tiny stopword profiles for the n-gram/stopword-ratio language ID
# heuristic (fastText/CLD-style signal, reduced to function-word hits).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "is", "and", "of", "to", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "que"],
}

_WS_TOKENS = r"\s+"
# BPE-ish pre-tokenizer: runs of alphanumerics OR single non-space
# symbols (dialect-portable subset of the GPT-2 pre-tokenizer regex).
BPE_PATTERN = "[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"

POLY_B = 131  # rolling-hash base
POLY_P = M31  # rolling-hash modulus (2^31-1): acc*B + h31 < 2^39, no overflow


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), _WS_TOKENS)


def _lang_score_col(toks: Column, lang: str) -> Column:
    wl = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def pred_lang_col(text_col: str = "text") -> Column:
    """Predicted-language COLUMN EXPRESSION (argmax stopword-profile
    hits, ties alphabetical, 'und' when no profile matched) — usable
    inline in any projection so pipelines don't need a join to gate on
    language. ``language_scores`` builds on the same expressions."""
    toks = _tokens(text_col)
    best = F.struct(F.lit(-1).alias("s"), F.lit("und").alias("l"))
    for lang in sorted(LANG_PROFILES):  # alphabetical; strict > keeps first max
        score = _lang_score_col(toks, lang)
        best = F.when(
            score > best["s"],
            F.struct(score.alias("s"), F.lit(lang).alias("l")),
        ).otherwise(best)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def language_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-language stopword-hit counts + predicted language.

    score_lang = number of token occurrences in that language's profile;
    prediction = argmax, ties broken alphabetically (deterministic).
    """
    toks = _tokens(text_col)
    return df.select(
        id_col,
        *[
            _lang_score_col(toks, lang).alias(f"score_{lang}")
            for lang in sorted(LANG_PROFILES)
        ],
        pred_lang_col(text_col).alias("pred_lang"),
    )


def quality_col(text_col: str = "text") -> Column:
    """Composite quality score (0..1, rounded 6 dp) as a COLUMN
    EXPRESSION — the same value ``quality_scores`` emits, inlinable in
    a projection so pipelines don't need a join to gate on quality."""
    toks = _tokens(text_col)
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    mean_wl = (n_chars - (n_words - 1)) / n_words
    distinct_ratio = F.size(F.array_distinct(toks)) / n_words
    alnum_ratio = (
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", "")) / n_chars
    )
    word_len_ok = (mean_wl >= 2) & (mean_wl <= 12)
    quality = (
        F.when((n_words >= 5) & (n_words <= 10000), 0.25).otherwise(0.0)
        + F.when(word_len_ok, 0.25).otherwise(0.0)
        + F.when(distinct_ratio >= 0.1, 0.25).otherwise(0.0)
        + F.when(alnum_ratio >= 0.6, 0.25).otherwise(0.0)
    )
    return F.round(quality, 6)


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style per-doc quality signals + composite score.

    Columns: n_chars, n_words, mean_word_len, stopword_ratio,
    distinct_ratio (type/token), alnum_ratio, quality (0..1 composite).
    Values are rounded to 6 dp so they are bit-stable across engines.
    """
    toks = _tokens(text_col)
    en = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    mean_wl = (n_chars - (n_words - 1)) / n_words  # chars net of separators
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / n_words
    distinct_ratio = F.size(F.array_distinct(toks)) / n_words
    alnum_ratio = (
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", "")) / n_chars
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        quality_col(text_col).alias("quality"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace and BPE-ish token counts per doc (pre-training budget
    accounting). (id, ws_tokens, bpe_tokens)."""
    return df.select(
        id_col,
        F.size(_tokens(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)).alias(
            "bpe_tokens"
        ),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprints per doc: (id, md5_fp, poly_fp).

    ``md5_fp``  — md5 of whitespace-normalized text (exact-dedup key);
    ``poly_fp`` — order-sensitive polynomial rolling hash over token
    hashes: fold(tokens, 0, acc -> (acc*B + h31(token)) mod (2^31-1)),
    a JVM-side ``aggregate`` fold (no UDF).
    """
    toks = _tokens(text_col)
    normalized = F.concat_ws(" ", toks)
    poly = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(POLY_B) + h31(t)) % F.lit(POLY_P),
    )
    return df.select(
        id_col,
        F.md5(normalized).alias("md5_fp"),
        poly.alias("poly_fp"),
    )
