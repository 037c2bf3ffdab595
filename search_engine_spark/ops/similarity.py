"""Embedding similarity search: brute-force cosine, LSH-ANN, IVF-ANN,
and embedding-cosine near-dup pairs.

The vector math is pure JVM-side array expressions (``zip_with`` +
``aggregate`` — whole-stage codegen, no Python). LSH hyperplanes and
IVF centroids are tiny driver-side numpy artifacts broadcast as
literals / small DataFrames, seeded for determinism.

Scale notes (10^9+ vectors):

* brute-force top-k is one scan + ``TakeOrderedAndProject`` (a
  distributed heap — no global sort); fine as the exact baseline and
  for re-ranking, linear cost;
* LSH/IVF prune the scan to matching buckets — a partition-pruned read
  when the table is written partitioned/bucketed by ``bucket``;
* near-dup pairs use the same bucket-then-verify shape as MinHash-LSH
  (dedup.py) — never an O(n^2) cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SEED = 42


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# --------------------------------------------------------------- brute force
def cosine_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``: (id, cosine).

    One scan; ``orderBy().limit(k)`` compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge, never a full sort). Ties break
    on smaller id for determinism.
    """
    q = _vec_lit(query_vec)
    return (
        embeddings.select(
            id_col, cosine_expr(F.col(vec_col), q).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of bounded ranked lists — hybrid
    retrieval's standard score-free combiner (Cormack et al. 2009):

        rrf(d) = sum over lists L of 1 / (rrf_k + rank_L(d))

    Each input is a TRUNCATED top-N list shaped (id, score); ranks are
    assigned by (score desc, id asc) in a single-partition window,
    which is correct and cheap precisely because the inputs are
    k-bounded retrieval outputs (``ranked_topk``, ``cosine_topk``),
    never corpus-sized — at any corpus scale the fusion input is
    O(lists × N) rows. A doc absent from a list contributes 0 from it.
    Rank-based, so the fusion is FP-exact across engines (the only
    floats are 1/(rrf_k + integer)); contributions add in list order.
    """
    fused: DataFrame | None = None
    for i, r in enumerate(rankings):
        score_col = r.columns[1]  # (id, score) contract
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        rr = r.select(
            F.col(id_col),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.row_number().over(w))
            ).alias(f"c{i}"),
        )
        fused = rr if fused is None else fused.join(rr, id_col, "full_outer")
    total = F.coalesce(F.col("c0"), F.lit(0.0))
    for i in range(1, len(rankings)):
        total = total + F.coalesce(F.col(f"c{i}"), F.lit(0.0))
    return (
        fused.select(id_col, F.round(total, 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """All pairs with cosine >= threshold, by exact O(n^2) comparison.

    The *oracle/baseline* path — use :func:`embedding_near_dup_pairs_lsh`
    for production near-dup sweeps. ``max_rows`` (default 100k ≈ 10^10
    comparisons) refuses inputs where the cross join would silently
    burn a cluster; pass ``None`` to override deliberately.
    """
    if max_rows is not None:
        n = embeddings.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"embedding_near_dup_pairs_exact is the O(n^2) baseline; "
                f"input exceeds max_rows={max_rows}. Use "
                f"embedding_near_dup_pairs_lsh, or pass max_rows=None."
            )
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )


# ----------------------------------------------------------------------- LSH
def random_hyperplanes(dim: int, n_planes: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signature_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-of-dot-product bucket id (int) for random-hyperplane LSH."""
    sig = None
    for i, plane in enumerate(planes):
        bit = F.when(dot_expr(vec_col, _vec_lit(plane)) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def lsh_bucketed(
    embeddings: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = DEFAULT_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, table, bucket): ``n_tables`` independent
    hyperplane sets — multi-table LSH trades ~n_tables x storage for
    recall. Write this partitioned by (table, bucket) and queries prune
    to n_tables partitions.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    parts = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * t)
        parts.append(
            embeddings.select(
                id_col,
                vec_col,
                F.lit(t).alias("table"),
                lsh_signature_col(F.col(vec_col), planes).alias("bucket"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def ann_lsh_topk(
    bucketed: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = DEFAULT_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine over the union of the query's
    buckets across all tables. Recall grows with n_tables; candidates
    ~ n_tables * bucket_size << n.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    conds = []
    for t in range(n_tables):
        planes = random_hyperplanes(len(q), n_planes, seed + 1000 * t)
        bucket = int(sum(1 << i for i, p in enumerate(planes) if float(p @ q) >= 0))
        conds.append((F.col("table") == t) & (F.col("bucket") == bucket))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    cands = bucketed.where(cond).select(id_col, vec_col).distinct()
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def lsh_partitioned_write(bucketed: DataFrame, path: str) -> None:
    """Persist an LSH-bucketed table partitioned by (table, bucket).

    Probes against the written table read only their n_tables matching
    directories (PartitionFilters — no footer reads outside them),
    which is what makes single-query ANN sub-linear at 10^9+ vectors.
    One ``repartition`` on the partition keys keeps it to ~1 file per
    populated (table, bucket) directory instead of tasks x buckets
    fragments.
    """
    (
        bucketed.repartition("table", "bucket")
        .write.mode("overwrite")
        .partitionBy("table", "bucket")
        .parquet(path)
    )


def ann_lsh_topk_from_path(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = DEFAULT_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a table written by :func:`lsh_partitioned_write`:
    the (table, bucket) predicates hit partition directories, so the
    scan touches only the query's n_tables buckets."""
    return ann_lsh_topk(
        spark.read.parquet(path),
        query_vec,
        k,
        n_planes,
        n_tables,
        seed,
        id_col,
        vec_col,
    )


def embedding_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = DEFAULT_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via LSH buckets + exact-cosine verification.

    Same bucket-join-verify shape as MinHash-LSH dedup; linear in n for
    non-degenerate bucket sizes.
    """
    bk = lsh_bucketed(
        embeddings, n_planes, n_tables, seed, id_col, vec_col
    ).localCheckpoint()  # feeds both sides of the bucket self-join
    a = bk.select(
        "table", "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = bk.select(
        "table", "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cands = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
    )
    return cands.select(
        "id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine")
    ).where(F.col("cosine") >= threshold)


# ----------------------------------------------------------------------- IVF
def train_ivf(ids, vecs, n_centroids: int = 16, n_iters: int = 5,
              train_sample: int = 4096) -> np.ndarray:
    """Pure-numpy Lloyd k-means on an md5-ordered sample — the
    deterministic IVF trainer shared by the Spark plan and the SQL
    oracle generator (same inputs → bit-identical centroids in any
    Python process; no engine floats involved).

    The training set is the first ``train_sample`` rows by
    ``md5(str(id))`` — a uniform content-keyed draw, reproducible from
    the raw table by anyone. Init = first ``n_centroids`` sample rows;
    assignment by centroid-normalized dot (row norm is a constant
    positive factor per row, so the argmax is the cosine argmax; ties →
    lower index); empty clusters keep their previous centroid.
    """
    import hashlib

    order = sorted(
        range(len(ids)),
        key=lambda i: hashlib.md5(str(int(ids[i])).encode()).hexdigest(),
    )[:train_sample]
    X = np.array([list(vecs[i]) for i in order], dtype=np.float64)
    if X.shape[0] < n_centroids:
        raise ValueError(
            f"need >= {n_centroids} training vectors, got {X.shape[0]}"
        )
    centroids = X[:n_centroids].copy()
    for _ in range(n_iters):
        cn = np.linalg.norm(centroids, axis=1)
        cn[cn == 0] = 1.0
        assign = np.argmax((X @ centroids.T) / cn, axis=1)
        new = centroids.copy()
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        centroids = new
    return centroids


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = DEFAULT_SEED,  # noqa: ARG001 - kept for API compat; the
    # md5-ordered sample IS the deterministic seed
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
) -> np.ndarray:
    """Deterministic IVF centroids, trained driver-side on a bounded
    sample (the standard IVF recipe at 10^9+ vectors — train on ~10^4-6
    sampled rows, assign the full table with one scan).

    The sample is the top ``train_sample`` rows by ``md5(str(id))``: a
    distributed TakeOrdered (no full collect), stable across
    partitioning and cluster size, and independently recomputable from
    the table content — which is what lets ``ann_ivf_topk`` carry a
    DuckDB oracle (the oracle generator re-derives the same centroids
    with :func:`train_ivf` and inlines them as literals).
    """
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(train_sample)
        .collect()
    )
    return train_ivf(
        [r[0] for r in rows],
        [list(r[1]) for r in rows],
        n_centroids,
        n_iters,
        train_sample,
    )


def centroid_norms(centroids: np.ndarray) -> list[float]:
    """Driver-side centroid L2 norms (zero-safe), used as literals in
    both the Spark assignment expression and the SQL oracle so the two
    engines compare bit-identical scores."""
    return [float(n) if n > 0 else 1.0 for n in np.linalg.norm(centroids, axis=1)]


def _assign_col(vec_col: Column, centroids: np.ndarray) -> Column:
    """Index of the nearest centroid (max cosine; ties -> lower index).

    Scores are ``dot(v, c_i) / |c_i|`` with ``|c_i|`` a driver-computed
    literal: the row norm ``|v|`` is a constant positive factor across
    i, so the argmax equals the cosine argmax — and keeping the only
    engine-side float work to the one fold-ordered dot product makes
    the comparison reproducible in the SQL oracle.
    """
    norms = centroid_norms(centroids)
    best = F.struct(F.lit(float("-inf")).alias("cos"), F.lit(-1).alias("idx"))
    for i, (c, nc) in enumerate(zip(centroids, norms)):
        cos = dot_expr(vec_col, _vec_lit(c)) / F.lit(nc)
        best = F.when(
            cos > best["cos"],
            F.struct(cos.alias("cos"), F.lit(i).alias("idx")),
        ).otherwise(best)
    return best["idx"]


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, cluster) — write partitioned by cluster for
    partition-pruned probes."""
    return embeddings.select(
        id_col, vec_col, _assign_col(F.col(vec_col), centroids).alias("cluster")
    )


def ann_ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k scanning only the ``n_probe`` nearest clusters."""
    cands = assigned.where(
        F.col("cluster").isin(ivf_probes(centroids, query_vec, n_probe))
    )
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def ivf_probes(centroids: np.ndarray, query_vec, n_probe: int) -> list[int]:
    """The ``n_probe`` clusters nearest the query — driver-side numpy,
    shared verbatim by the SQL oracle generator (stable argsort: ties
    break on lower cluster id in every process)."""
    q = np.asarray(query_vec, dtype=np.float64)
    sims = (centroids @ q) / (
        np.linalg.norm(centroids, axis=1) * np.linalg.norm(q) + 1e-12
    )
    return [int(i) for i in np.argsort(-sims, kind="stable")[:n_probe]]


# ------------------------------------------------ int8 scalar quantization
# The 100 TB memory lever for embedding search: float32 vectors
# scalar-quantize to int8 (4x smaller, SIMD-friendly integer dot
# products), the shortlist is ranked on the quantized dot, and only the
# shortlist is re-scored at full precision. Codes are per-vector
# symmetric absmax (the faiss/SQ8 scheme): q_i = round_half_up(x_i /
# absmax * 127). The per-vector scale folds the L2 norm in —
# s = absmax / (l2 * 127) — so the approximate COSINE of two vectors is
# (sum q_a*q_b) * s_a * s_b: qdot*s_a*s_b ≈ dot/(l2_a*l2_b). Folding
# the norm into the scale (instead of normalizing before quantizing)
# keeps the integer codes magnitude-free AND makes ranking angle-based,
# matching cosine_topk. Every step is engine-portable: absmax, l2, the
# x/absmax*127 division, and floor(.+0.5) are identical fixed-order
# IEEE expressions in Spark, DuckDB, and Python; the integer dot is
# exact — so scores (not just ranks) are bit-identical everywhere.
Q_SCALE = 127


def quantize_cols(vec: Column) -> tuple[Column, Column]:
    """array<float> -> (codes: array<int> in [-127,127], scale: double).

    ``qdot(a, b) * s_a * s_b`` approximates ``cosine(a, b)`` because the
    L2 norm is folded into each vector's scale."""
    am = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),
    )
    l2 = F.greatest(norm_expr(vec), F.lit(1e-30))
    q = F.transform(
        vec,
        lambda x: F.floor(
            x.cast("double") / am * F.lit(Q_SCALE) + F.lit(0.5)
        ).cast("int"),
    )
    return q, am / (l2 * F.lit(float(Q_SCALE)))


def py_quantize(vec) -> tuple[list[int], float]:
    """Driver-side twin of :func:`quantize_cols` for query vectors.

    Arithmetic mirrors the Spark expressions operation-for-operation
    (left-fold sum for l2, same division order) so the scale is the
    bit-identical IEEE double."""
    import math

    am = max(max(abs(float(x)) for x in vec), 1e-30)
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    l2 = max(math.sqrt(acc), 1e-30)
    q = [int(math.floor(float(x) / am * Q_SCALE + 0.5)) for x in vec]
    return q, am / (l2 * float(Q_SCALE))


def qdot_expr(qvec: Column, query_q: list[int]) -> Column:
    """Integer dot product (exact, order-independent) as a long."""
    lit_q = F.array(*[F.lit(int(v)) for v in query_q])
    return F.aggregate(
        F.zip_with(qvec, lit_q, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_int8_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by int8-quantized approximate cosine:
    (id, qdot:bigint, qscore:double = qdot * s_vec * s_query ≈ cosine).

    One scan + TakeOrderedAndProject; at 100 TB the (q, scale) table is
    the one you persist (4x smaller than float32), and this is the
    cheap first pass. The ranking key is qscore rounded to 6 dp with an
    id tiebreak: 1e-6 is far below int8 quantization error, and the
    rounding makes the top-k boundary engine-portable (engines whose
    float summation order differs in the last ulp would otherwise flip
    near-tied rows)."""
    qq, sq = py_quantize(query_vec)
    q, s = quantize_cols(F.col(vec_col))
    qdot = qdot_expr(q, qq)
    return (
        embeddings.select(
            id_col,
            qdot.alias("qdot"),
            ((qdot.cast("double") * s) * F.lit(sq)).alias("qscore"),
        )
        .orderBy(F.round(F.col("qscore"), 6).desc(), F.asc(id_col))
        .limit(k)
    )


def ann_int8_rerank_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    shortlist_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize -> integer-dot shortlist (k * shortlist_mult) -> exact
    float cosine rerank of the shortlist only: (id, cosine).

    The rerank joins the k-bounded shortlist back to the source table
    (broadcast: shortlist_mult*k rows), so full-precision arithmetic
    touches O(k) vectors regardless of corpus size. Shortlist
    membership is deterministic (bit-identical quantized scores, id
    tiebreak), which is what makes the result engine-portable; recall
    vs exact search is governed by shortlist_mult (int8 dot misranks
    only near-ties)."""
    short = ann_int8_topk(
        embeddings, query_vec, k * shortlist_mult, id_col, vec_col
    ).select(id_col)
    q = _vec_lit([float(x) for x in query_vec])
    return (
        embeddings.join(F.broadcast(short), id_col)
        .select(id_col, cosine_expr(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ann_recall_at_k(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the int8-quantized ANN path against exhaustive
    float cosine — the "measure, don't guess" evaluation every ANN
    deployment needs before trusting the cheap path: ONE row
    ``(k, n_overlap, recall)`` where ``n_overlap`` counts ids the two
    top-k lists share and ``recall = n_overlap / k``.

    Both arms are k-bounded TakeOrderedAndProject scans over the same
    table (two passes, no materialized intermediate bigger than k
    rows); the overlap join touches 2k rows. n_overlap is an exact
    integer, and recall is one division of the same two numbers on any
    engine, so the result is FP-identical cross-engine.
    """
    exact = cosine_topk(embeddings, query_vec, k, id_col, vec_col).select(id_col)
    approx = ann_int8_topk(embeddings, query_vec, k, id_col, vec_col).select(id_col)
    return (
        exact.join(approx, id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        .select(
            F.lit(int(k)).alias("k"),
            F.col("n_overlap"),
            (F.col("n_overlap") / F.lit(float(k))).alias("recall"),
        )
    )
