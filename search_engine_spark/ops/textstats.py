"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All JVM-side expressions (codegen'd; SQL-oracle-checkable). Each is a
per-row projection — embarrassingly parallel, no shuffle at any scale
(exception: the corpus-level collocation miner at the bottom, whose
groupBys are partial-agg'd map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.hashing import M31, h31, h60

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


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition signals.

    The Gopher/MassiveText quality rules (Rae et al. 2021, §A1.1) drop
    documents dominated by repeated content. Per doc:

    * ``top_token_frac``    — occurrences of the most frequent token /
      n_tokens (Gopher: "fraction of tokens in the most common word");
    * ``top_bigram_frac``   — occurrences of the most frequent adjacent
      bigram / (n_tokens - 1) ("fraction of characters in the most
      common 2-gram", token-denominated here);
    * ``adjacent_dup_frac`` — adjacent equal-token pairs / (n_tokens -
      1), the stutter/"word word word" signal;
    * ``repetitive``        — composite flag over the ROUNDED fractions
      (so the flag is bit-stable across engines): top token > 0.3 OR
      top bigram > 0.2 OR adjacent dups > 0.3.

    Pure JVM-side higher-order-function projection — no shuffle, no
    Python, scan-pruned to (id, text) at any scale. The top-count fold
    is O(n·distinct) per row, which is negligible for turn-length texts
    (transcript turns are tens of tokens); for book-length documents
    swap in the explode+groupBy formulation.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    pairs_den = F.greatest(n - 1, F.lit(1))
    top_tok = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda x: F.size(F.filter(toks, lambda y: y == x)),
        )
    )
    adj = F.size(
        F.filter(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: a == b,
            ),
            lambda e: e,
        )
    )
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_bg = F.when(
        n >= 2,
        F.array_max(
            F.transform(
                F.array_distinct(bigrams),
                lambda x: F.size(F.filter(bigrams, lambda y: y == x)),
            )
        ),
    ).otherwise(F.lit(0))
    top_token_frac = F.round(top_tok / n, 6)
    top_bigram_frac = F.round(top_bg / pairs_den, 6)
    adjacent_dup_frac = F.round(adj / pairs_den, 6)
    return df.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        top_token_frac.alias("top_token_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        adjacent_dup_frac.alias("adjacent_dup_frac"),
        (
            (top_token_frac > 0.3)
            | (top_bigram_frac > 0.2)
            | (adjacent_dup_frac > 0.3)
        ).alias("repetitive"),
    )


def winnow_fingerprints(
    df: DataFrame,
    w: int = 4,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm, simplified to min-per-window): (id, fp) rows.

    Token k-gram hashes are scanned with a width-``w`` window; each
    window contributes its MINIMUM hash, and the distinct minima are
    the doc's fingerprint set. Guarantee: two documents sharing a
    token run of length >= w + k - 1 share at least one fingerprint,
    while the expected fingerprint density is only ~2/(w+1) of the
    k-gram count — the robust, sparse local-similarity key used for
    plagiarism/overlap detection (join docs on ``fp`` and count
    collisions; compose with the decontamination reporter for
    eval-overlap sweeps).

    Pure JVM higher-order-function projection + one explode — no
    shuffle, no Python. Texts shorter than k tokens hash the whole
    text (mirroring the shingler's degenerate case); hash sequences
    shorter than ``w`` use one whole-sequence window.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    n_sh = F.greatest(n - (k - 1), F.lit(1))
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: h31(F.concat_ws(" ", F.slice(toks, i, F.least(F.lit(k), n)))),
    )
    nh = F.size(shingle_hashes)
    width = F.least(F.lit(w), nh)
    mins = F.transform(
        F.sequence(F.lit(1), nh - width + 1),
        lambda j: F.array_min(F.slice(shingle_hashes, j, width)),
    )
    return df.select(
        id_col, F.explode(F.array_distinct(mins)).alias("fp")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    w: int = 4,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    — the MOSS overlap report: (id_a, id_b, n_shared), id_a < id_b.

    Self-join of the (sparse) fingerprint table on ``fp``:
    fingerprints are ~2/(w+1) of the k-gram count, so the join input
    is a fraction of the token stream; fingerprints shared by more
    than ``max_bucket`` docs are dropped before the join (ubiquitous
    boilerplate runs — the same degenerate-bucket guard as the LSH
    candidate join)."""
    fps = winnow_fingerprints(df, w, k, text_col, id_col)
    sized = fps.join(
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("bsz")), "fp"
    ).where(F.col("bsz") <= max_bucket)
    a = sized.select("fp", F.col(id_col).alias("id_a"))
    b = sized.select("fp", F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def unigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style language-model quality signal: per-doc mean unigram
    negative log-probability under the corpus's own (add-one-smoothed)
    unigram distribution — (id, n_tokens, mean_neg_logprob, rounded
    6 dp). Low values = stereotypical text, high values = rare-token
    soup; both tails are curation candidates.

    p(t) = (count(t) + 1) / (total + vocab); the per-doc sum folds in
    TOKEN POSITION ORDER (collect to a pos-sorted array, then one
    sequential ``aggregate``), because a plain ``sum()`` aggregates in
    partition-arrival order and float addition is not associative —
    position-ordered folding is what makes the score bit-reproducible
    across partitionings and engines. One explode + broadcast-joined
    vocab probabilities + one groupBy; the vocab table is
    corpus-tiny."""
    toks = _tokens(text_col)
    total_vocab = df.select(
        F.sum(F.size(toks)).alias("total"),
    ).first()
    uni = (
        df.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_vocab = uni.count()
    total = int(total_vocab["total"] or 0)
    denom = float(total + n_vocab)
    lp = -F.log((F.col("c") + F.lit(1)).cast("double") / F.lit(denom))
    probs = uni.select(F.col("t").alias("term"), lp.alias("nlp"))
    exploded = df.select(
        id_col, F.posexplode(toks).alias("pos", "term")
    ).join(F.broadcast(probs), "term")
    per_doc = (
        exploded.groupBy(id_col)
        .agg(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "nlp"))
                    ),
                    lambda s: s["nlp"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(F.col("s") / F.col("n_tokens"), 6).alias("mean_neg_logprob"),
    )


def corpus_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-row corpus report card: the numbers a curation run starts
    from. Columns: n_docs, n_tokens (whitespace), vocab_size,
    n_exact_dup_docs (docs whose whitespace-normalized md5 appears
    more than once), mean_quality, and per-language doc counts
    (n_<lang> over :data:`LANG_PROFILES` + n_und).

    Three partial-agg'd aggregations (per-doc projections -> scalar
    aggs; vocab distinct; dup-group sizes) cross-joined into one row —
    every stage map-side combinable, nothing corpus-sized on the
    driver. ``mean_quality`` averages the 0.25-quantized per-doc
    quality, so the float sum is exact and the mean is bit-stable
    across engines and partitionings.
    """
    toks = _tokens(text_col)
    per_doc = df.select(
        F.size(toks).alias("ntok"),
        quality_col(text_col).alias("q"),
        pred_lang_col(text_col).alias("lang"),
        F.md5(F.concat_ws(" ", toks)).alias("fp"),
    )
    langs = sorted(LANG_PROFILES) + ["und"]
    base = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
        F.round(F.avg("q"), 6).alias("mean_quality"),
        *[
            F.sum((F.col("lang") == lang).cast("long"))
            .cast("long")
            .alias(f"n_{lang}")
            for lang in langs
        ],
    )
    vocab = (
        df.select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t").cast("long").alias("vocab_size"))
    )
    dups = (
        per_doc.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_exact_dup_docs"))
    )
    return base.crossJoin(vocab).crossJoin(dups).select(
        "n_docs",
        "n_tokens",
        "vocab_size",
        "n_exact_dup_docs",
        "mean_quality",
        *[f"n_{lang}" for lang in langs],
    )


def bigram_pairs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(term_a, term_b): every ADJACENT whitespace-token pair, one row
    per occurrence — extracted inside the projection (index arithmetic
    over the split array), so bigram extraction costs zero shuffle; the
    window-function alternative (lead() over doc, pos) would shuffle
    the whole token stream by doc_id first."""
    ws = _tokens(text_col)
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("term_a"),
                F.element_at(ws, i + 1).alias("term_b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<term_a:string,term_b:string>>"))
    return df.select(F.explode(pairs).alias("bg")).select(
        "bg.term_a", "bg.term_b"
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-bigram collocations by PMI: (term_a, term_b,
    n_pair, pmi) — the corpus-analytics staple for multi-word
    expression mining over a training corpus.

    PMI = ln(P(ab) / (P(a)·P(b))) with P(ab) over the adjacent-pair
    total and P(a), P(b) over the token total; ``min_count`` suppresses
    the unstable low-frequency tail, ties break on (term_a, term_b).
    Two partial-agg'd groupBys (pair counts, unigram counts) + one
    shuffle join of pair rows against the vocab-sized unigram table —
    every stage map-side combinable; the totals are two scalar
    aggregates folded in as literals. Rounded to 6 dp (oracle-parity:
    the DuckDB twin computes the identical expression tree, see
    ``contract.py``).
    """
    ws = _tokens(text_col)
    tot = df.select(
        F.sum(F.size(ws)).alias("nt"),
        F.sum(F.greatest(F.size(ws) - 1, F.lit(0))).alias("np"),
    ).first()
    n_tok, n_pairs = float(tot["nt"] or 0), float(tot["np"] or 0)
    if not n_pairs:
        return df.sparkSession.createDataFrame(
            [], "term_a string, term_b string, n_pair long, pmi double"
        )
    uni = (
        df.select(F.explode(ws).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pairs = (
        bigram_pairs(df, text_col)
        .groupBy("term_a", "term_b")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    pmi = F.log(
        (F.col("n_pair").cast("double") / F.lit(n_pairs))
        / (
            (F.col("c_a").cast("double") / F.lit(n_tok))
            * (F.col("c_b").cast("double") / F.lit(n_tok))
        )
    )
    return (
        pairs.join(
            uni.select(F.col("term").alias("term_a"), F.col("c").alias("c_a")),
            "term_a",
        )
        .join(
            uni.select(F.col("term").alias("term_b"), F.col("c").alias("c_b")),
            "term_b",
        )
        .select(
            "term_a", "term_b", "n_pair", F.round(pmi, 6).alias("pmi")
        )
        .orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
        .limit(k)
    )


# ------------------------------------------------- hashed linear classifier
# fastText/CCNet-style quality-classifier INFERENCE: each token hashes
# into one of CLF_BUCKETS feature buckets, each bucket carries a fixed
# weight, and a document's score is the mean bucket weight (bag-of-
# words linear model). The weights here are a deterministic md5-derived
# stand-in for trained parameters (this sandbox trains nothing); the
# deliverable is the evaluation plumbing — per-token feature hashing,
# inline weight lookup, and a score that is bit-reproducible across
# engines and partitionings. Weights are exact sixteenths in
# [-0.5, +0.5], so the per-doc sum of <=10^4 of them is exact in
# float64 (multiples of 1/16 well below 2^52) — addition order cannot
# change it, which is what makes the score order-independent and the
# DuckDB oracle value-identical. Real deployments swap `weight_map`
# for a broadcast map column or a model-file lookup; the plan shape
# (pure projection, zero shuffle, whole-stage codegen) is unchanged.
CLF_BUCKETS = 1024
CLF_LEVELS = 17  # weights in {-8..+8}/16
_CLF_US = "\x1f"


def clf_weight_col(tok: Column, buckets: int = CLF_BUCKETS) -> Column:
    """Weight of one token: bucket = h60('clf' US lower(tok)) % B,
    weight = (h60('w' US bucket) % 17 - 8) / 16."""
    b = h60(F.concat_ws(_CLF_US, F.lit("clf"), F.lower(tok))) % F.lit(buckets)
    wh = h60(F.concat_ws(_CLF_US, F.lit("w"), b.cast("string"))) % F.lit(
        CLF_LEVELS
    )
    return (wh - F.lit(8)).cast("double") / F.lit(16.0)


def hashed_classifier_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = CLF_BUCKETS,
    threshold: float = 0.0,
) -> DataFrame:
    """Per-doc linear-classifier score + keep decision.

    Columns: (id, n_tokens, clf_score = round(mean weight, 6),
    keep = unrounded mean >= threshold). Pure projection — no shuffle,
    no UDF; at 100 TB this is a map-only pass fused into whatever scan
    feeds it."""
    toks = _tokens(text_col)
    n = F.size(toks)
    ssum = F.aggregate(
        F.transform(toks, lambda t: clf_weight_col(t, buckets)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean = F.when(n > 0, ssum / n).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.round(mean, 6).alias("clf_score"),
        (mean >= F.lit(threshold)).alias("keep"),
    )
