"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample()`` is partition-dependent (resampling after a repartition
or a cluster resize selects different rows), which breaks reproducible
dataset curation. These operators decide membership from a **content
hash of the row's key** (:mod:`.hashing`'s md5-derived ``h60``), so a
sample is

* stable across partitioning, cluster size, and engine (bit-identical
  DuckDB oracle),
* consistent across tables: the same key always lands in the same
  sample, so sampling docs and their embeddings separately yields
  aligned subsets,
* monotone in rate: the 1% sample is a subset of the 10% sample
  (threshold on the same hash), enabling nested scaling-law subsets.

Per-row projection + filter only — no shuffle, fully pushed into the
scan stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.hashing import h60

# hash buckets for rate resolution: rates are quantized to 1/RESOLUTION
RESOLUTION = 1_000_000


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, RESOLUTION) from the row key (+ optional
    salt, for drawing independent samples from the same keys)."""
    keyed = F.concat_ws("\x1f", F.lit(salt), key)
    return (h60(keyed) % F.lit(RESOLUTION)).alias("sample_bucket")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (see module doc)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = int(round(fraction * RESOLUTION))
    return df.where(
        sample_bucket(F.col(key_col).cast("string"), salt) < F.lit(thresh)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages or
    quality tiers in a training mix). ``fractions`` maps stratum value
    → keep rate; unlisted strata keep ``default_fraction``. Same
    hash-threshold membership as :func:`deterministic_sample`, so the
    draw stays consistent across tables and monotone per stratum."""
    thresh: Column = F.lit(int(round(default_fraction * RESOLUTION)))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        thresh = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(int(round(frac * RESOLUTION))),
        ).otherwise(thresh)
    return df.where(
        sample_bucket(F.col(key_col).cast("string"), salt) < thresh
    )


def domain_mix_rates(
    counts: dict[str, int], targets: dict[str, float]
) -> dict[str, float]:
    """Per-domain keep rates realizing a target mixture.

    Given observed per-domain row counts and target mixture proportions
    (normalized to sum 1), the largest achievable sample with the exact
    target mix downsamples every domain EXCEPT the scarcest-relative-to-
    target one, which is kept whole::

        scale  = min over domains of n_d / p_d   (sample total size)
        rate_d = scale * p_d / n_d               (<= 1; == 1 at argmin)

    Pure driver arithmetic over O(#domains) numbers — the expression is
    written with the exact operation order the SQL oracle replicates
    ((scale * p_d) / n_d), so the IEEE doubles agree bit-for-bit.
    Domains absent from ``targets`` get rate 0 (dropped); domains in
    ``targets`` but absent from the data make the mix unrealizable and
    raise.
    """
    total_p = sum(targets.values())
    if total_p <= 0:
        raise ValueError("targets must have positive mass")
    norm = {d: p / total_p for d, p in targets.items()}
    missing = [d for d, p in norm.items() if p > 0 and not counts.get(d)]
    if missing:
        raise ValueError(f"target domains absent from data: {missing}")
    scale = min(counts[d] / p for d, p in norm.items() if p > 0)
    return {d: (scale * p) / counts[d] for d, p in norm.items() if p > 0}


def domain_mix_sample(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic sample matching a target domain mixture (the
    training-data "source mixing" step: e.g. 60% web / 30% code / 10%
    dialogue regardless of raw corpus skew).

    One tiny aggregation (per-domain counts — O(#domains) rows to the
    driver) solves the keep rates (:func:`domain_mix_rates`); membership
    is then the usual content-hash threshold, so the draw is
    reproducible across partitioning/cluster size and monotone if the
    targets are rescaled. Expected sample sizes hit the target mix to
    within hash-quantization (1/RESOLUTION); the scarcest domain is
    kept in full. The rate thresholds use ``floor(rate * RESOLUTION)``
    — the truncating form both Python and SQL engines compute
    identically (CAST/round would half-even-round in some engines).
    """
    import math

    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    rates = domain_mix_rates(counts, targets)
    thresh: Column = F.lit(0)
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(int(math.floor(rate * RESOLUTION))),
        ).otherwise(thresh)
    return df.where(
        sample_bucket(F.col(key_col).cast("string"), salt) < thresh
    )


def budget_boundary(
    per_bucket: dict[int, int], budget_tokens: int
) -> tuple[int | None, int]:
    """Phase-1 resolution for :func:`token_budget_sample`: scanning
    buckets in id order, return (boundary_bucket, remaining_tokens) —
    the first bucket whose total would overflow the budget and the
    budget left for its internal prefix — or (None, budget) when the
    whole corpus fits. Pure driver arithmetic over O(n_buckets) ints;
    property-tested against a flat brute-force prefix scan."""
    cum = 0
    for b in sorted(per_bucket):
        if cum + per_bucket[b] > budget_tokens:
            return b, budget_tokens - cum
        cum += per_bucket[b]
    return None, budget_tokens


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    n_buckets: int = 4096,
) -> DataFrame:
    """Largest deterministic PREFIX sample whose total whitespace-token
    count fits ``budget_tokens`` — "give me exactly N tokens of this
    corpus" for training-budget planning.

    Docs are totally ordered by (h % n_buckets, h, key) where h is the
    salted content hash — an unbiased, reproducible shuffle order —
    and the sample is the maximal prefix with running token sum <=
    budget (prefix, not knapsack: the first doc that would overflow
    stops the sample, so membership never depends on partitioning).

    A naive running sum is a single-partition window over the corpus;
    instead the prefix is resolved in two phases: (1) one tiny
    aggregation of per-bucket token totals (``n_buckets`` rows to the
    driver, prefix-summed there) finds the BOUNDARY bucket; (2) every
    bucket before it is taken whole with a plain filter, and only the
    boundary bucket's ~corpus/n_buckets rows get the exact
    within-bucket running sum. All-integer arithmetic — bit-identical
    across engines. Size ``n_buckets`` so one bucket fits an executor
    (at 10^12 turns and n_buckets = 2^20, a bucket is ~10^6 rows).
    """
    from pyspark.sql import Window

    keyed = F.concat_ws("\x1f", F.lit(salt), F.col(key_col).cast("string"))
    h = h60(keyed)
    coarse = (h % F.lit(n_buckets)).alias("_tb_bucket")
    ntok = F.size(F.split(F.col(text_col), r"\s+")).alias("_tb_ntok")
    base = df.withColumns({"_tb_bucket": coarse, "_tb_ntok": ntok, "_tb_h": h})
    per_bucket = {
        r["_tb_bucket"]: r["t"]
        for r in base.groupBy("_tb_bucket")
        .agg(F.sum("_tb_ntok").alias("t"))
        .collect()
    }
    boundary, remaining = budget_boundary(per_bucket, budget_tokens)
    drop = ["_tb_bucket", "_tb_ntok", "_tb_h"]
    if boundary is None:  # whole corpus fits
        return base.drop(*drop)
    whole = base.where(F.col("_tb_bucket") < boundary)
    w = (
        Window.partitionBy("_tb_bucket")
        .orderBy(F.asc("_tb_h"), F.asc(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        base.where(F.col("_tb_bucket") == boundary)
        .withColumn("_tb_run", F.sum("_tb_ntok").over(w))
        .where(F.col("_tb_run") <= remaining)
        .drop("_tb_run")
    )
    return whole.unionByName(partial).drop(*drop)


def split_train_holdout(
    df: DataFrame,
    holdout_fraction: float = 0.01,
    key_col: str = "doc_id",
    salt: str = "holdout",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint (train, holdout) split by key hash: reproducible and
    leakage-safe — a key's side never changes as data is re-read,
    re-partitioned, or appended to."""
    thresh = int(round(holdout_fraction * RESOLUTION))
    b = sample_bucket(F.col(key_col).cast("string"), salt)
    return df.where(b >= F.lit(thresh)), df.where(b < F.lit(thresh))
