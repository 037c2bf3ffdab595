"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All pure JVM-side DataFrame expressions (whole-stage codegen; no Python
in the hot path). Hashing is md5-derived (:mod:`.hashing`) so every
operator has a bit-identical ANSI-SQL oracle.

Scale notes (100 TB / 10^12 docs):

* every groupBy/self-join here shuffles on content-derived keys
  (fingerprint, shingle, band hash, simhash chunk) which are uniformly
  distributed by construction — no key skew from data skew;
* the one genuinely skew-prone key is a *hot shingle* (boilerplate
  n-gram shared by millions of docs) in the candidate-pair self-joins;
  ``max_shingle_df`` drops those before the join (the standard CCNet /
  suffix-array-dedup mitigation) — a shingle shared by that many docs
  contributes no discriminating signal anyway;
* candidate generation is LSH-banded (linear in docs), never the O(n^2)
  cross join; the exact-Jaccard verifier only touches candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.hashing import M31, h31, h60, perm_ab

DEFAULT_SHINGLE_K = 3
DEFAULT_N_HASHES = 16
DEFAULT_BANDS = 8


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), r"\s+")


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """Distinct k-word shingles per document: (id_col, shingle).

    Docs shorter than ``k`` words contribute their whole text as the
    single shingle so they still participate in dedup.
    """
    toks = tokens_col(text_col)
    shingle_arr = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        df.select(id_col, F.explode(F.array_distinct(shingle_arr)).alias("shingle"))
    )


# --------------------------------------------------------------------- exact
def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content fingerprint.

    Returns (id_col, fingerprint, canonical_id, n_copies, is_dup):
    ``canonical_id`` is the smallest doc id with identical text; rows
    with ``is_dup`` true are droppable. One shuffle on the (uniform)
    fingerprint; at 10^12 docs this is a plain hash aggregation.
    """
    f = df.select(id_col, F.md5(F.col(text_col)).alias("fingerprint"))
    groups = f.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies")
    )
    return f.join(groups, "fingerprint").select(
        id_col,
        "fingerprint",
        "canonical_id",
        "n_copies",
        (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
    )


# ------------------------------------------------------------------- minhash
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """MinHash signature per doc: (id_col, h0..h{n-1}).

    sig_i(d) = min over shingles s of (a_i * h31(s) + b_i) mod (2^31-1).
    One explode + one groupBy; the permutations are n aggregate
    expressions over the same exploded rows (not n passes).
    """
    return minhash_signatures_from_shingles(
        shingles(df, text_col, id_col, k), id_col, n_hashes
    )


def minhash_signatures_from_shingles(
    shingle_df: DataFrame, id_col: str = "doc_id", n_hashes: int = DEFAULT_N_HASHES
) -> DataFrame:
    sh = shingle_df.withColumn("h", h31("shingle"))
    aggs = []
    for i in range(n_hashes):
        a, b = perm_ab(i)
        aggs.append(
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(M31)).alias(f"h{i}")
        )
    return sh.groupBy(id_col).agg(*aggs)


def minhash_bands(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """LSH banding: (id_col, band, band_key) — one row per (doc, band).

    ``band_key`` is the md5-hash of the band's signature slice, so the
    bucket join key is small and uniform.
    """
    rows = n_hashes // bands
    if rows * bands != n_hashes:
        raise ValueError("bands must divide n_hashes")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                h60(
                    F.concat_ws(
                        ",", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(id_col, F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def lsh_candidate_pairs(
    bands_df: DataFrame, id_col: str = "doc_id", max_bucket: int = 10_000
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH bucket.

    Buckets larger than ``max_bucket`` are dropped before the self-join
    (a bucket of B docs emits B^2 pairs — a degenerate bucket of 10^6
    boilerplate docs would emit 10^12 rows; such docs are caught by
    exact dedup first).
    """
    sized = bands_df.join(
        bands_df.groupBy("band", "band_key").agg(F.count("*").alias("bsz")),
        ["band", "band_key"],
    ).where(F.col("bsz") <= max_bucket)
    a = sized.select("band", "band_key", F.col(id_col).alias("id_a"))
    b = sized.select("band", "band_key", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    shingle_df: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    (id_a, id_b, n_a, n_b, n_common, jaccard). Joins only the candidate
    pairs' shingle sets (never all-pairs); both joins shuffle on doc id.
    """
    pairs = pairs.localCheckpoint()  # consumed by the common-join AND the left join
    sizes = shingle_df.groupBy(id_col).agg(F.count("*").alias("n"))
    common = (
        pairs.join(
            shingle_df.select(F.col(id_col).alias("id_a"), "shingle"), "id_a"
        )
        .join(
            shingle_df.select(F.col(id_col).alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(common, ["id_a", "id_b"], "left")
        .na.fill({"n_common": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection.

    Candidates from LSH banding, verified with exact shingle Jaccard >=
    ``threshold``. Linear in corpus size (plus candidate volume); the
    scalable path for 10^12-doc dedup.
    """
    # The shingle and band tables each feed multiple joins (self-join
    # sides + the verifier); localCheckpoint materializes them once so
    # the explode/groupBy subtrees don't re-execute per consumer.
    sh = shingles(df, text_col, id_col, k).localCheckpoint()
    sigs = minhash_signatures_from_shingles(sh, id_col, n_hashes)
    bands_df = minhash_bands(sigs, id_col, n_hashes, bands).localCheckpoint()
    cands = lsh_candidate_pairs(bands_df, id_col)
    return jaccard_verify(cands, sh, id_col).where(F.col("jaccard") >= threshold)


def incremental_near_dup_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dups of an INCOMING batch against an EXISTING corpus —
    the append-time dedup gate: (id_new, id_old, jaccard).

    Candidates are (new, old) band-key collisions ONLY: new×new pairs
    are the in-batch :func:`minhash_near_dup_pairs` job's business and
    old×old pairs are assumed already resolved, so per append the join
    touches O(batch bands × colliding corpus bands) rows, never the
    corpus cross product. Signatures are per-doc (independent of the
    rest of the corpus), so banding the sides separately is identical
    to banding the union. Oversized CORPUS buckets (> ``max_bucket``
    docs sharing a band key — boilerplate that exact dedup should have
    caught) are dropped before the join, mirroring
    :func:`lsh_candidate_pairs`.

    In a production pipeline the corpus side's band table and shingle
    sizes are a stored byproduct of the previous run (banding is
    embarrassingly parallel and append-only); here they are recomputed
    from ``corpus_df`` for self-containment.

    Doc ids must be DISJOINT between the two sides (the builder's
    append path guarantees this — ids are never reused): a doc present
    in both would double its shingle rows in the union the verifier
    scans, corrupting its Jaccard denominators.
    """
    sh_new = shingles(new_df, text_col, id_col, k).localCheckpoint()
    sh_old = shingles(corpus_df, text_col, id_col, k).localCheckpoint()
    b_new = minhash_bands(
        minhash_signatures_from_shingles(sh_new, id_col, n_hashes),
        id_col, n_hashes, bands,
    )
    b_old = minhash_bands(
        minhash_signatures_from_shingles(sh_old, id_col, n_hashes),
        id_col, n_hashes, bands,
    )
    osz = b_old.groupBy("band", "band_key").agg(F.count("*").alias("bsz"))
    ob = b_old.join(osz, ["band", "band_key"]).where(
        F.col("bsz") <= max_bucket
    )
    cands = (
        b_new.select("band", "band_key", F.col(id_col).alias("id_a"))
        .join(
            ob.select("band", "band_key", F.col(id_col).alias("id_b")),
            ["band", "band_key"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    verified = jaccard_verify(cands, sh_new.unionByName(sh_old), id_col)
    return verified.where(F.col("jaccard") >= threshold).select(
        F.col("id_a").alias("id_new"),
        F.col("id_b").alias("id_old"),
        "jaccard",
    )


# ------------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.5,
    max_shingle_df: int = 10_000,
) -> DataFrame:
    """*Exact* n-gram-Jaccard near-dup pairs (no LSH approximation).

    Candidate pairs = docs sharing >= 1 (non-hot) shingle, then exact
    Jaccard. Quadratic in per-shingle doc frequency — ``max_shingle_df``
    bounds that; use :func:`minhash_near_dup_pairs` at full scale.
    """
    sh = shingles(df, text_col, id_col, k).localCheckpoint()
    sh_rare = sh.join(
        sh.groupBy("shingle").agg(F.count("*").alias("sdf")), "shingle"
    ).where(F.col("sdf") <= max_shingle_df)
    a = sh_rare.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh_rare.select(F.col(id_col).alias("id_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_verify(cands, sh, id_col).where(F.col("jaccard") >= threshold)


# ------------------------------------------------------------------- simhash
SIMHASH_BITS = 48
SIMHASH_CHUNKS = 4  # pigeonhole banding: hamming<=3 pairs share >=1 chunk


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token-weighted SimHash (``SIMHASH_BITS``-bit) per doc: (id, simhash).

    Classic Charikar sketch: per token occurrence take h60's low bits,
    per bit position sum +/-1, the sign vector packed into an int64.
    One explode + one groupBy with ``SIMHASH_BITS`` sum-aggregates
    (single shuffle, map-side partials).
    """
    tok = df.select(
        id_col, F.explode(tokens_col(text_col)).alias("token")
    ).withColumn("h", h60("token"))
    aggs = [
        F.sum(
            F.shiftright("h", b).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_bit = tok.groupBy(id_col).agg(*aggs)
    packed = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return per_bit.select(id_col, packed.cast("long").alias("simhash"))


def _chunks_for(max_hamming: int) -> int:
    """Smallest usable chunk count guaranteeing pigeonhole recall for
    ``max_hamming``: a pair within Hamming h agrees on >= 1 of c chunks
    only when c >= h + 1, and c must divide SIMHASH_BITS so chunks are
    equal-width. Fewer chunks would silently MISS qualifying pairs."""
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    candidates = [
        c
        for c in range(max(SIMHASH_CHUNKS, max_hamming + 1), SIMHASH_BITS + 1)
        if SIMHASH_BITS % c == 0
    ]
    if not candidates:
        raise ValueError(
            f"max_hamming={max_hamming} needs more than {SIMHASH_BITS} "
            f"chunks of a {SIMHASH_BITS}-bit simhash; use a wider sketch"
        )
    return candidates[0]


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= ``max_hamming``.

    Banding by equal-width chunks (``max_hamming + 1`` of them, rounded
    up to a divisor of ``SIMHASH_BITS``; never fewer than
    ``SIMHASH_CHUNKS``): any pair within Hamming ``chunks - 1`` agrees
    on at least one chunk (pigeonhole), so candidates come from
    equality self-joins on chunk values — linear, no cross join.
    Verified with ``bit_count(xor)``.
    """
    n_chunks = _chunks_for(max_hamming)
    chunk_bits = SIMHASH_BITS // n_chunks
    mask = (1 << chunk_bits) - 1
    # the sketch table feeds both sides of the chunk self-join
    sh = simhash_table(df, text_col, id_col).localCheckpoint()
    chunks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", "ck.chunk", "ck.ckey")
    a = chunks.select(
        "chunk", "ckey", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b = chunks.select(
        "chunk", "ckey", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    return (
        a.join(b, ["chunk", "ckey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------- span dedup
def duplicate_span_occurrences(
    df: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, start) of every w-token window whose exact text occurs
    at more than one (doc, start) position corpus-wide.

    The distributed form of the exact-substring dedup step from Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), at token-window granularity instead of suffix-array byte
    granularity: a window is duplicated if its text appears at >= 2
    positions anywhere in the corpus (cross-doc OR repeated within one
    doc).

    Scale shape (100 TB): the window STRING never leaves the projection
    -- each occurrence is reduced to ``(id, start, xxhash64(window))``
    before the exchange, so both shuffles move ~20-byte rows: one
    groupBy-count on the hash (map-side partial agg; count only, never
    a collect_list, so a boilerplate window shared by millions of docs
    costs one long per partition), then a left-semi join of occurrences
    against the duplicated-hash set (AQE skew-split handles hot
    hashes). A 64-bit hash collision could over-mark a unique window as
    duplicated (P ~ n^2/2^65); the value-level oracle groups by the
    window string, so a green hash-match also certifies no collision
    fired at test scale.
    """
    toks = F.split(F.col(text_col), r"\s+")
    win_t = "array<struct<start:int,h:bigint>>"
    wins = F.when(
        F.size(toks) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(w - 1)),
            lambda i: F.struct(
                i.alias("start"),
                F.xxhash64(F.concat_ws(" ", F.slice(toks, i, w))).alias("h"),
            ),
        ),
    ).otherwise(F.lit(None).cast(win_t))
    occ = (
        df.select(F.col(id_col), F.explode(wins).alias("_w"))
        .select(id_col, F.col("_w.start").alias("start"), F.col("_w.h").alias("h"))
    )
    dup_h = occ.groupBy("h").count().where(F.col("count") > 1).select("h")
    return occ.join(dup_h, "h", "left_semi").select(id_col, "start")


def remove_duplicate_spans(
    df: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per doc: text with every duplicated w-token span blanked out.

    Returns ``(id_col, n_tokens, n_removed, clean_text)`` where
    ``clean_text`` keeps, in order, exactly the tokens not covered by
    any duplicated window from :func:`duplicate_span_occurrences`
    (token p is covered by a window starting at s iff
    ``s <= p <= s+w-1``). Docs shorter than ``w`` tokens pass through
    unchanged; a doc that is wall-to-wall boilerplate comes out with
    ``clean_text = ''`` (filter on ``n_removed < n_tokens`` to drop
    such husks, mirroring the paper's removal-then-refilter pipeline).

    The coverage test is a JVM higher-order-function projection
    (``filter((tok, i) -> !exists(starts, ...))``) -- O(n_tokens *
    n_dup_spans) per doc, with n_dup_spans = 0 for the untouched
    majority; no Python in the plan. The only data moved beyond
    :func:`duplicate_span_occurrences`'s hash shuffles is the per-doc
    sorted ``starts`` array joined back onto the corpus (rows exist
    only for docs that have at least one duplicated span).
    """
    occ = duplicate_span_occurrences(df, w, text_col, id_col)
    starts = occ.groupBy(id_col).agg(
        F.sort_array(F.collect_list("start")).alias("_ds_starts")
    )
    base = df.select(F.col(id_col), F.split(F.col(text_col), r"\s+").alias("_ds_t"))
    j = base.join(starts, id_col, "left").select(
        F.col(id_col),
        F.col("_ds_t"),
        F.coalesce("_ds_starts", F.array().cast("array<int>")).alias("_ds_starts"),
    )
    kept = F.filter(
        F.col("_ds_t"),
        lambda tok, i: ~F.exists(
            F.col("_ds_starts"),
            lambda s: ((i + F.lit(1)) >= s) & ((i + F.lit(1)) <= s + F.lit(w - 1)),
        ),
    )
    n = F.size("_ds_t")
    return j.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        (n - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
