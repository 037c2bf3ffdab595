"""Connected components over near-duplicate pairs → dedup groups.

Near-dup detection (:mod:`.dedup`) emits *pairs*; an actual training
pipeline needs *groups* with one surviving representative per group
(transitive closure: if A~B and B~C, all three are one cluster even
when A~C was never emitted). This module resolves components with the
alternating **large-star / small-star** algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14):

* every round is two shuffles on node id (a groupBy-min and a join) —
  no collect of edges to the driver, no per-component state;
* converges in O(log^2 n) rounds on adversarial graphs and 2-4 rounds
  on real dedup graphs (components are near-cliques: LSH emits most of
  the pairwise edges, so the min-id star forms almost immediately);
* each round's output is ``localCheckpoint``-ed: the next iteration
  reads materialized rows instead of re-executing an ever-deeper plan
  (lineage would otherwise grow per round and recompute from scratch).

At 10^12 docs the edge table is bounded by the candidate-pair volume
(LSH-banded, linear in docs), node ids are uniform ints (no key skew),
and the driver holds only per-round convergence counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops import dedup


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve undirected edges into components: (node, component).

    ``component`` is the smallest node id in the node's component.
    Only nodes appearing in ``pairs`` are returned (isolated nodes are
    their own components; callers join this back to the full table,
    see :func:`dedup_groups`).

    Large-star: every node points its larger neighbors at the minimum
    of its neighborhood (including itself). Small-star: every node
    points its smaller-or-equal neighbors at that minimum. Alternating
    the two converges to a star per component (every node → min id).
    """
    # canonical directed edges u > v ("parent" pointers toward smaller)
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # ---- large-star: symmetrize, m(u) = min(N(u) ∪ {u}),
        #      emit (w, m(u)) for strictly larger neighbors w
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("mn"), F.col("u")).alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star on the large-star output: neighbors here are
        #      all <= u; point them (and u) at the minimum
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .union(large.join(mins2, "u").select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # converged when every edge already points at its component min:
        # one more large-star pass would change nothing — detectable as
        # "no node u has two distinct parents and no parent is itself a
        # child", cheaply: the edge sets before/after agree
        if _edge_sets_equal(edges, small):
            edges = small
            break
        edges = small

    # the converged edges point every non-root node at its component
    # min; add the roots themselves so every node of `pairs` is covered
    stars = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = stars.select("component").distinct()
    return stars.union(
        roots.select(F.col("component").alias("node"), "component")
    )


def _edge_sets_equal(a: DataFrame, b: DataFrame) -> bool:
    """Cheap set equality: equal counts and equal order-insensitive
    checksum (sum of a 60-bit hash per edge) — one aggregate per side,
    no sort, no collect of rows."""
    ck = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(
                # 56-bit hash cast decimal(20,0); Spark widens the SUM
                # to decimal(30,0) — immune to overflow at any edge count
                F.conv(F.substring(F.md5(F.concat_ws(",", "u", "v")), 1, 14), 16, 10)
                .cast("decimal(20,0)")
            ),
            F.lit(0).cast("decimal(20,0)"),
        ).alias("s"),
    ).first()
    ra, rb = ck(a), ck(b)
    return (ra["n"], ra["s"]) == (rb["n"], rb["s"])


def dedup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = dedup.DEFAULT_SHINGLE_K,
    n_hashes: int = dedup.DEFAULT_N_HASHES,
    bands: int = dedup.DEFAULT_BANDS,
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end dedup grouping: MinHash-LSH pairs → transitive
    closure → (doc_id, group_id, group_size, keep).

    ``group_id`` is the smallest doc id of the near-dup cluster (docs
    with no near-duplicate form their own singleton group), and
    ``keep`` marks the one representative per group — the rows a
    training pipeline retains. One extra left join + one group-size
    aggregation on top of :func:`connected_components`.
    """
    pairs = dedup.minhash_near_dup_pairs(
        df, text_col, id_col, k, n_hashes, bands, threshold
    ).select("id_a", "id_b")
    return groups_from_pairs(df, pairs, id_col)


def groups_from_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Resolve near-dup ``pairs`` (id_a, id_b) into labeled groups over
    the full universe ``df``: (id, group_id, group_size, keep).

    Shared tail of :func:`dedup_groups` / :func:`embed_dedup_groups` —
    transitive closure, then a left join back to ``df`` so rows with no
    near-duplicate form singleton groups, then one size aggregation."""
    comp = connected_components(pairs.select("id_a", "id_b"))
    labeled = (
        df.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).cast("long").alias("group_id"),
        )
    )
    sizes = labeled.groupBy("group_id").agg(F.count("*").alias("group_size"))
    return labeled.join(sizes, "group_id").select(
        id_col,
        "group_id",
        "group_size",
        (F.col(id_col) == F.col("group_id")).alias("keep"),
    )


def embed_dedup_groups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic dedup grouping: embedding-LSH near-dup pairs (exact
    cosine ≥ ``threshold`` on LSH-bucketed candidates) → transitive
    closure → (id, group_id, group_size, keep).

    The embedding-space twin of :func:`dedup_groups` — paraphrase-level
    duplicates that share no shingles still cluster. Same scale shape:
    bucket-join candidate generation (linear in n for non-degenerate
    buckets), log-round star closure, one representative (smallest id)
    kept per cluster."""
    from search_engine_spark.ops import similarity

    pairs = similarity.embedding_near_dup_pairs_lsh(
        embeddings,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=similarity.DEFAULT_SEED if seed is None else seed,
        id_col=id_col,
        vec_col=vec_col,
    ).select(F.col("id_a"), F.col("id_b"))
    return groups_from_pairs(embeddings, pairs, id_col)


def dedup_keep(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The surviving rows of ``df`` after near-dup group resolution
    (one representative — the smallest doc id — per cluster)."""
    keep_ids = dedup_groups(df, text_col, id_col, **kwargs).where("keep").select(
        id_col
    )
    return df.join(keep_ids, id_col, "left_semi")
