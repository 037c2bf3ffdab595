"""End-to-end training-data curation: the composed pipeline a
pre-training corpus actually goes through, as one DataFrame plan.
(Construction is not fully lazy: the near-dup stage's connected
components is an iterative algorithm whose convergence checks run
jobs; everything else stays declarative, and the survivor cache is a
lazy, recomputable ``persist``.)

    raw docs
      → quality gate        (Gopher/C4-style composite, textstats)
      → language gate       (stopword-profile prediction, textstats)
      → exact dedup         (normalized-text fingerprint, keep min id)
      → near-dup dedup      (MinHash-LSH pairs → connected components
                             → keep the group minimum, components)
      → optional stratified sample (content-hash, sampling)

Each stage is a filter or a bounded-key aggregation/join from the
already-audited operator modules — composing them adds no new shuffle
shapes, and Catalyst pipelines the projections/filters into the scan.
The near-dup stage dominates cost and runs on the *survivors* of the
cheap gates (standard pipeline ordering: shed volume before the
expensive stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from search_engine_spark.ops import components, dedup, sampling, textstats


def gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.75,
    allowed_langs: list[str] | None = None,
) -> DataFrame:
    """Quality + language gate as ONE projection + filter — zero
    joins, zero shuffles. Both signals are per-row expressions
    (``textstats.quality_col`` / ``pred_lang_col``), so computing them
    as separate DataFrames and joining back on ``id_col`` (the r03
    shape) would add two full-corpus shuffles for nothing; fused, the
    whole gate codegens into the scan."""
    out = df.select(
        id_col,
        text_col,
        textstats.pred_lang_col(text_col).alias("pred_lang"),
        textstats.quality_col(text_col).alias("quality"),
    ).where(F.col("quality") >= F.lit(min_quality))
    if allowed_langs is None:
        return out.where(F.col("pred_lang") != F.lit("und"))
    return out.where(F.col("pred_lang").isin(list(allowed_langs)))


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.75,
    allowed_langs: list[str] | None = None,
    near_dup_threshold: float = 0.7,
    minhash_n: int = dedup.DEFAULT_N_HASHES,
    minhash_bands: int = dedup.DEFAULT_BANDS,
    sample_fracs: dict[str, float] | None = None,
) -> DataFrame:
    """Curated corpus: (id_col, pred_lang, quality) for surviving docs.

    ``allowed_langs=None`` keeps every predicted language except
    ``'und'`` (no profile matched). ``sample_fracs`` (lang → rate)
    applies a final deterministic stratified sample on the predicted
    language; ``None`` keeps everything.
    """
    gated = gate(df, text_col, id_col, min_quality, allowed_langs)

    # exact dedup on whitespace-normalized text, keep the smallest id
    fp = F.md5(F.concat_ws(" ", F.split(F.col(text_col), r"\s+")))
    gated = gated.withColumn("_fp", fp)
    canon = gated.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    exact_kept = gated.join(canon, [id_col, "_fp"], "left_semi").drop("_fp")
    # the survivor set feeds the (expensive) near-dup stage twice
    # (pair generation + the final semi-join) — cache it LAZILY with
    # recomputable lineage (persist, not localCheckpoint: checkpointed
    # partitions die with their executor, and eager checkpointing ran
    # Spark jobs at plan-construction time even if the result was
    # never used). First action fills the cache; executor loss just
    # recomputes from the scan.
    exact_kept = exact_kept.persist(StorageLevel.MEMORY_AND_DISK)

    near_kept = components.dedup_keep(
        exact_kept,
        text_col,
        id_col,
        n_hashes=minhash_n,
        bands=minhash_bands,
        threshold=near_dup_threshold,
    )
    out = near_kept.select(id_col, "pred_lang", "quality")
    if sample_fracs is not None:
        out = sampling.stratified_sample(
            out, sample_fracs, "pred_lang", key_col=id_col
        )
    return out
