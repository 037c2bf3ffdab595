"""Tests for the training-data pipeline operators (ops package)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import dedup, multimodal, similarity, textstats
from search_engine_spark.ops.hashing import M31, h60, perm_ab, py_h31, py_h60


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    rows = []
    for i in range(30):
        if i == 1:  # near-dup of vec 0
            v = base + rng.standard_normal(8) * 0.01
        else:
            v = rng.standard_normal(8)
        if i == 0:
            v = base
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ------------------------------------------------------------------- hashing
def test_h60_matches_python(spark):
    df = spark.createDataFrame([("abc",), ("",), ("héllo wörld",)], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", h60("s").alias("h")).collect()}
    for s, h in got.items():
        assert h == py_h60(s)
        assert 0 <= h < 2**60


def test_perm_ab_in_range():
    for i in range(64):
        a, b = perm_ab(i)
        assert 0 < a < M31 and 0 <= b < M31


# --------------------------------------------------------------------- dedup
def test_exact_duplicates(docs):
    out = {r["doc_id"]: r for r in dedup.exact_duplicates(docs).collect()}
    assert out[3]["is_dup"] and out[3]["canonical_id"] == 0
    assert out[0]["n_copies"] == 2 and not out[0]["is_dup"]
    assert not out[2]["is_dup"]


def test_shingles_short_doc(docs):
    sh = dedup.shingles(docs).where(F.col("doc_id") == 4).collect()
    assert [r["shingle"] for r in sh] == ["short doc"]


def test_minhash_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_near_dup_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0
    assert all(a == 0 or a == 1 or a == 3 for a, b in pairs)


def test_ngram_jaccard_matches_minhash_on_small(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_near_dup_pairs(docs, threshold=0.5).collect()
    }
    assert approx <= exact  # LSH candidates are verified, so no false positives
    assert exact == approx  # and on this corpus recall is total


def test_simhash_near_dups(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash_table(docs).collect()}
    assert sh[0] == sh[3]  # identical text -> identical sketch
    assert bin(sh[0] ^ sh[1]).count("1") < bin(sh[0] ^ sh[2]).count("1")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=10).collect()
    }
    assert pairs[(0, 3)] == 0


# ---------------------------------------------------------------- similarity
def test_cosine_topk_exact(emb):
    top = similarity.cosine_topk(emb.where("vec_id != 0"), _qv(emb), k=3).collect()
    assert top[0]["vec_id"] == 1 and top[0]["cosine"] > 0.99
    assert top[0]["cosine"] >= top[1]["cosine"] >= top[2]["cosine"]


def _qv(emb):
    return [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]


def test_ann_lsh_finds_nearest(emb):
    bk = similarity.lsh_bucketed(emb, n_planes=4, n_tables=4)
    top = similarity.ann_lsh_topk(
        bk.where("vec_id != 0"), _qv(emb), k=3, n_planes=4, n_tables=4
    ).collect()
    # the planted near-dup shares every hyperplane side with the query,
    # so it is always in the probed buckets
    assert top[0]["vec_id"] == 1


def test_near_dup_pairs_exact_vs_lsh(emb):
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs_exact(emb, 0.95).collect()
    }
    assert (0, 1) in exact
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs_lsh(
            emb, 0.95, n_planes=4, n_tables=6
        ).collect()
    }
    assert lsh <= exact and (0, 1) in lsh


def test_ivf_topk(emb):
    cents = similarity.ivf_centroids(emb, n_centroids=4, n_iters=2)
    assert cents.shape == (4, 8)
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.select("cluster").distinct().count() <= 4
    top = similarity.ann_ivf_topk(
        assigned.where("vec_id != 0"), cents, _qv(emb), k=3, n_probe=4
    ).collect()
    assert top[0]["vec_id"] == 1  # n_probe=all -> exact


# ----------------------------------------------------------------- textstats
def test_language_scores(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat and it is fine"),
            (1, "der hund ist ein guter hund und das ist gut"),
            (2, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in textstats.language_scores(df).collect()}
    assert out == {0: "en", 1: "de", 2: "und"}


def test_quality_scores(spark):
    df = spark.createDataFrame(
        [(0, "a decent length document with varied words here"),
         (1, "x x x x x x x x x x x x x x x x x x x x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.quality_scores(df).collect()}
    assert out[0]["quality"] == 1.0
    assert out[1]["distinct_ratio"] == 0.05
    assert out[1]["quality"] < out[0]["quality"]


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "hello world, it's 2026!")], "doc_id long, text string")
    r = textstats.token_counts(df).first()
    assert r["ws_tokens"] == 4
    # hello | world | , | it | ' | s | 2026 | !
    assert r["bpe_tokens"] == 8


def test_fingerprints_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "c b a"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.fingerprints(df).collect()}
    assert out[0]["poly_fp"] == out[2]["poly_fp"]
    assert out[0]["poly_fp"] != out[1]["poly_fp"]  # order matters
    assert out[0]["md5_fp"] == out[2]["md5_fp"]
    # cross-check the fold against pure Python
    expect = 0
    for t in ["a", "b", "c"]:
        expect = (expect * textstats.POLY_B + py_h31(t)) % textstats.POLY_P
    assert out[0]["poly_fp"] == expect


# ---------------------------------------------------------------- multimodal
def test_multimodal_pipeline(spark):
    media = multimodal.synthetic_media(spark, 30, num_partitions=3)
    media.cache()
    assert media.count() == 30
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 30
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in feats)
    # determinism: same media -> same features
    again = multimodal.extract_features(media).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in again
    }
    frames = multimodal.sample_frames(media, every_ms=500)
    fr = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 2 for r in fr)
    resized = multimodal.resize_images(media, 64, 64)
    imgs = resized.where("kind = 'image'").collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in imgs)
    stats = {r["kind"]: r["n"] for r in multimodal.media_stats(media).collect()}
    assert stats == {"image": 10, "audio": 10, "video": 10}


def test_real_decode_raises(spark):
    media = multimodal.synthetic_media(spark, 3)
    with pytest.raises(Exception):
        multimodal.extract_features(media, decode="real").collect()


# ------------------------------------------------ partitioned ANN storage
def test_lsh_partitioned_write_prunes_probes(spark, emb, tmp_path):
    """Probes against the partitioned LSH table must hit (table, bucket)
    PartitionFilters and read strictly fewer files than a full scan."""
    import contextlib
    import io

    path = str(tmp_path / "lsh")
    bucketed = similarity.lsh_bucketed(emb, n_planes=4, n_tables=2)
    similarity.lsh_partitioned_write(bucketed, path)
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]

    probe = similarity.ann_lsh_topk_from_path(
        spark, path, qv, k=5, n_planes=4, n_tables=2
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]

    full = spark.read.parquet(path)
    files_all = full.select(F.input_file_name()).distinct().count()
    qbuckets = similarity.ann_lsh_topk(
        spark.read.parquet(path), qv, k=5, n_planes=4, n_tables=2
    )
    files_probe = (
        qbuckets.select(F.input_file_name()).distinct().count()
    )
    assert files_probe < files_all

    # result identity vs the in-memory (unpartitioned) path
    mem = similarity.ann_lsh_topk(bucketed, qv, k=5, n_planes=4, n_tables=2)
    assert sorted(probe.collect()) == sorted(mem.collect())


# ------------------------------------------------- simhash chunk derivation
def test_simhash_chunks_derived_from_max_hamming():
    assert dedup._chunks_for(0) == 4
    assert dedup._chunks_for(3) == 4
    assert dedup._chunks_for(5) == 6
    assert dedup._chunks_for(7) == 8
    assert dedup._chunks_for(11) == 12
    with pytest.raises(ValueError):
        dedup._chunks_for(-1)
    with pytest.raises(ValueError):
        dedup._chunks_for(dedup.SIMHASH_BITS)


def test_simhash_high_hamming_recall(docs):
    """max_hamming beyond the default chunk guarantee must still find
    every qualifying pair (regression: 4 chunks only guarantee h<=3)."""
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=8).collect()
    }
    # brute-force oracle over the sketch table
    sk = {r["doc_id"]: r["simhash"] for r in dedup.simhash_table(docs).collect()}
    ids = sorted(sk)
    expected = {
        (a, b): bin(sk[a] ^ sk[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sk[a] ^ sk[b]).count("1") <= 8
    }
    assert got == expected


def test_collocations_pmi(spark):
    """Hand-computed PMI on a 2-doc corpus: only (a,b) clears
    min_count=2; PMI = ln(P(ab) / (P(a)P(b)))."""
    import math

    from search_engine_spark.ops import textstats

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    got = textstats.collocations(df, min_count=2, k=5).collect()
    assert len(got) == 1
    r = got[0]
    # nt=7 tokens, np=5 bigrams, c(a)=3, c(b)=3, n(a,b)=3
    expect = round(math.log((3 / 5.0) / ((3 / 7.0) * (3 / 7.0))), 6)
    assert (r["term_a"], r["term_b"], r["n_pair"]) == ("a", "b", 3)
    assert r["pmi"] == expect


def test_collocations_empty_corpus(spark):
    from search_engine_spark.ops import textstats

    df = spark.createDataFrame([], "doc_id long, text string")
    assert textstats.collocations(df).collect() == []


def test_bigram_pairs_projection_no_shuffle(spark):
    """Bigram extraction must stay a pure projection (no Exchange)."""
    from search_engine_spark.ops import textstats

    df = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    plan = textstats.bigram_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = [(r["term_a"], r["term_b"]) for r in textstats.bigram_pairs(df).collect()]
    assert got == [("x", "y"), ("y", "z")]


def test_sessionize_gap_boundaries(spark):
    """Hand-built stream: gaps of exactly gap and gap+1s; same-ts ties
    break on event_id; sessions number per user independently."""
    import datetime as dt

    from search_engine_spark.ops import sessions

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: 3 events, second exactly 30 min later (same session),
        # third 30 min + 1 s (new session)
        (1, t0, 1),
        (2, t0 + dt.timedelta(minutes=30), 1),
        (3, t0 + dt.timedelta(minutes=60, seconds=1), 1),
        # user 2: duplicate timestamps — order falls back to event_id
        (4, t0, 2),
        (5, t0, 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        r["event_id"]: (r["session_seq"], r["session_start"])
        for r in sessions.sessionize(df, gap_minutes=30).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (2, True),
        4: (1, True), 5: (1, False),
    }

    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_secs"])
        for r in sessions.session_stats(df, 30, value_col=None).collect()
    }
    assert stats == {(1, 1): (2, 1800.0), (1, 2): (1, 0.0), (2, 1): (2, 0.0)}


def test_session_stats_single_shuffle(spark):
    """The rollup groups on the window's partitioning prefix — exactly
    ONE Exchange in the whole plan."""
    import datetime as dt

    from search_engine_spark.ops import sessions

    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1), 1, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    plan = (
        sessions.session_stats(df, 30)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_keywords_ranking(spark):
    """Rarer terms outrank common ones; rank caps at n; ties on term."""
    import math

    from search_engine_spark import simple

    df = spark.createDataFrame(
        [(0, "common rare common"), (1, "common other")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf_idf"])
        for r in simple.keywords(df, n=2).collect()
    }
    # doc 0: common's tf=2 outweighs rare's idf here —
    # (1+ln 2)·ln 2 = 1.1736 > (1+ln 1)·ln 3 = 1.0986
    s_rare = round((1 + math.log(1)) * math.log(1 + 2 / 1), 6)
    s_common = round((1 + math.log(2)) * math.log(1 + 2 / 2), 6)
    assert got[(0, 1)] == ("common", s_common)
    assert got[(0, 2)] == ("rare", s_rare)
    assert got[(1, 1)][0] == "other"
    assert len(got) == 4


def test_rolling_activity_window(spark):
    import datetime as dt

    from search_engine_spark.ops import sessions

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1),
        (2, t0 + dt.timedelta(days=3), 1),
        (3, t0 + dt.timedelta(days=7), 1),  # day-0 event exactly 7d back: inside
        (4, t0 + dt.timedelta(days=10, seconds=1), 1),  # day-3 is 7d1s back: out
        (5, t0, 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        r["event_id"]: r["n_trailing"]
        for r in sessions.rolling_activity(df, days=7).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 1}


def test_value_quantiles_interpolation(spark):
    from search_engine_spark.ops import sessions

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 5)],  # 1,2,3,4
        "event_type string, value double",
    )
    r = sessions.value_quantiles(df, probs=(0.5,)).first()
    assert r["p50"] == 2.5  # linear interpolation between 2 and 3


def test_pack_texts_windows(spark):
    """Budget=5: group g's token stream (3,3,3) cuts at fixed offsets
    0/5/10 -> windows [a,b] (prev-sums 0,3) and [c] (prev-sum 6);
    an over-budget row still gets its own window."""
    from search_engine_spark.ops import packing

    rows = [
        ("g", 0, "a1 a2 a3"),
        ("g", 1, "b1 b2 b3"),
        ("g", 2, "c1 c2 c3"),
        ("h", 0, "x1 x2 x3 x4 x5 x6 x7"),  # 7 > budget
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        (r["group_id"], r["window_idx"]): (r["text"], r["n_tokens"], r["n_rows"])
        for r in packing.pack_texts(df, budget_tokens=5).collect()
    }
    assert got == {
        ("g", 0): ("a1 a2 a3\nb1 b2 b3", 6, 2),
        ("g", 1): ("c1 c2 c3", 3, 1),
        ("h", 0): ("x1 x2 x3 x4 x5 x6 x7", 7, 1),
    }
    plan = (
        packing.pack_texts(df, 5)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # rollup reuses the window's shuffle


def test_write_training_shards(spark, tmp_path):
    """Sharded gzip JSONL export: row count from the write job's own
    Observation, maxRecordsPerFile bounds shard size, round-trip
    preserves content."""
    import glob

    from search_engine_spark.ops import export

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    ).repartition(2)
    out = str(tmp_path / "shards")
    n = export.write_training_shards(
        df, out, max_records_per_file=30, order_col="doc_id"
    )
    assert n == 100
    files = glob.glob(f"{out}/*.json.gz")
    assert len(files) >= 4  # 2 partitions x ceil(50/30) shards
    back = spark.read.json(out)
    assert back.count() == 100
    assert {r["doc_id"] for r in back.collect()} == set(range(100))


# --------------------------------------------------- repetition scores
def test_repetition_scores_hand_computed(spark):
    rows = [
        (0, "a a a b"),          # stutter-heavy
        (1, "w x y z"),          # all distinct
        (2, "solo"),             # single token: pair metrics are 0
        (3, "go stop go stop go stop"),  # repeated bigram, no adjacency
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in textstats.repetition_scores(df).collect()
    }
    r0 = got[0]
    assert r0.n_tokens == 4
    assert r0.top_token_frac == 0.75           # 'a' 3/4
    assert r0.top_bigram_frac == 0.666667      # 'a a' 2/3
    assert r0.adjacent_dup_frac == 0.666667    # (a,a) twice / 3 pairs
    assert r0.repetitive
    r1 = got[1]
    assert r1.top_token_frac == 0.25
    assert r1.adjacent_dup_frac == 0.0
    assert r1.top_bigram_frac == pytest.approx(0.333333)  # all unique, 1/3
    r2 = got[2]
    assert r2.n_tokens == 1
    assert r2.top_token_frac == 1.0
    assert r2.top_bigram_frac == 0.0
    assert r2.adjacent_dup_frac == 0.0
    r3 = got[3]
    assert r3.top_token_frac == 0.5            # 'go' 3/6
    assert r3.top_bigram_frac == 0.6           # 'go stop' 3/5
    assert r3.adjacent_dup_frac == 0.0
    assert r3.repetitive


def test_repetition_scores_no_shuffle(spark, docs):
    plan = textstats.repetition_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection at any scale


# --------------------------------------------------- domain mix sampling
def test_domain_mix_rates_math():
    from search_engine_spark.ops import sampling

    rates = sampling.domain_mix_rates(
        {"a": 100, "b": 50}, {"a": 0.5, "b": 0.5}
    )
    # b is scarcest relative to target -> kept whole; a downsampled to match
    assert rates["b"] == 1.0
    assert rates["a"] == pytest.approx(0.5)
    with pytest.raises(ValueError):
        sampling.domain_mix_rates({"a": 10}, {"a": 0.5, "missing": 0.5})
    with pytest.raises(ValueError):
        sampling.domain_mix_rates({"a": 10}, {"a": 0.0})


def test_domain_mix_sample_scarcest_kept_whole(spark):
    from search_engine_spark.ops import sampling

    rows = [(i, "x", "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = sampling.domain_mix_sample(df, {"big": 0.5, "small": 0.5}, "lang")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 100           # scarcest domain kept in full
    assert abs(counts["big"] - 100) <= 25   # hash-quantized match of the mix
    # untargeted domains are dropped entirely
    out2 = sampling.domain_mix_sample(df, {"small": 1.0}, "lang")
    assert out2.where("lang = 'big'").count() == 0


def test_domain_mix_sample_deterministic_and_nested(spark):
    from search_engine_spark.ops import sampling

    rows = [(i, "x", ["a", "b"][i % 2]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    ids1 = {r.doc_id for r in sampling.domain_mix_sample(df, {"a": 0.7, "b": 0.3}, "lang").collect()}
    ids2 = {r.doc_id for r in sampling.domain_mix_sample(df.repartition(7), {"a": 0.7, "b": 0.3}, "lang").collect()}
    assert ids1 == ids2  # partitioning-invariant membership


# --------------------------------------------------- fuzzy ranked retrieval
def test_fuzzy_expansions_and_ranking(spark):
    from search_engine_spark import simple

    rows = [
        (0, "alpha table merge"),
        (1, "alpha beta gamma"),
        (2, "table table table"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exp = {r.term for r in simple.fuzzy_expansions(df, ["tabel"], 2).collect()}
    assert "table" in exp
    assert "gamma" not in exp
    top = simple.fuzzy_ranked(df, ["tabel"], 2, k=5).collect()
    got = [r.doc_id for r in top]
    assert 0 in got and 2 in got and 1 not in got
    # no expansions at all -> empty result, not an error
    assert simple.fuzzy_ranked(df, ["zzzzzzzzzz"], 1, k=5).count() == 0


# --------------------------------------------------- conversation threads
def test_conversation_threads_assembly(spark):
    import datetime as dt
    import hashlib

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark.ops import export

    ts = dt.datetime(2026, 1, 1)
    rows = [  # c1 turns arrive OUT of order: assembly must sort
        ("c1", 1, "assistant", "world two", "", ts),
        ("c1", 0, "user", "hello", "", ts),
        ("c2", 0, "user", "solo", "", ts),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {r.conv_id: r for r in export.conversation_threads(df).collect()}
    c1 = got["c1"]
    assert c1.thread == "user: hello\nassistant: world two"
    assert c1.n_turns == 2 and c1.n_tokens == 3
    assert c1.thread_md5 == hashlib.md5(c1.thread.encode()).hexdigest()
    assert got["c2"].thread == "user: solo"


# --------------------------------------------------- hybrid RRF fusion
def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double"
    )
    b = spark.createDataFrame([(3, 0.99), (4, 0.5)], "doc_id long, score double")
    rows = similarity.rrf_fuse([a, b], k=10, rrf_k=60).collect()
    got = {r.doc_id: r.rrf for r in rows}
    assert got[3] == round(1 / 63 + 1 / 61, 6)  # rank 3 in a, rank 1 in b
    assert got[1] == round(1 / 61, 6)
    assert got[2] == round(1 / 62, 6)
    assert got[4] == round(1 / 62, 6)
    # full order: doc 3 fused highest; 2 and 4 tie -> doc_id asc
    assert [r.doc_id for r in rows] == [3, 1, 2, 4]


# --------------------------------------------------- incremental dedup gate
def test_incremental_near_dups_cross_batch_only(spark, docs):
    new = docs.where("doc_id >= 3")  # "incoming batch": 3 (dup of 0), 4
    old = docs.where("doc_id < 3")   # "existing corpus": 0, 1, 2
    got = dedup.incremental_near_dup_pairs(new, old, threshold=0.7).collect()
    pairs = {(r.id_new, r.id_old): r.jaccard for r in got}
    assert pairs[(3, 0)] == 1.0  # exact dup caught across the boundary
    for n, o in pairs:  # orientation: only new x old, never within-side
        assert n >= 3 and o < 3


# --------------------------------------------------- token-budget sampling
def test_token_budget_sample_prefix_rule(spark):
    from search_engine_spark.ops import sampling

    rows = [(i, " ".join(["w"] * 10)) for i in range(100)]  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.token_budget_sample(df, 250)
    got = out.collect()
    assert len(got) == 25  # 250 tokens / 10 per doc, exact
    assert set(out.columns) == {"doc_id", "text"}  # helper cols dropped
    # nested: a bigger budget strictly extends the same prefix
    small = {r.doc_id for r in got}
    big = {r.doc_id for r in sampling.token_budget_sample(df, 500).collect()}
    assert small < big and len(big) == 50
    # partitioning-invariant membership
    rep = {r.doc_id for r in sampling.token_budget_sample(df.repartition(7), 250).collect()}
    assert rep == small
    # budget >= corpus -> everything
    assert sampling.token_budget_sample(df, 10_000).count() == 100
    # tiny bucket count still honors the exact boundary
    assert (
        sampling.token_budget_sample(df, 255, n_buckets=2).count() == 25
    )  # 26th doc would overflow (260 > 255)


# --------------------------------------------------- winnowing fingerprints
def test_winnow_guarantee_and_degenerate(spark):
    from search_engine_spark.ops.hashing import py_h31

    rows = [
        (0, "p q r s t u tail0 x y"),
        (1, "lead1 lead2 p q r s t u"),  # shares a 6-token run with doc 0
        (2, "totally different words here now"),
        (3, "x"),  # shorter than the shingle size
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps: dict[int, set] = {}
    for r in textstats.winnow_fingerprints(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    # winnowing guarantee: a shared run of >= w + k - 1 = 6 tokens
    # forces a shared fingerprint
    assert fps[0] & fps[1]
    assert not (fps[0] & fps[2])
    assert fps[3] == {py_h31("x")}  # degenerate: whole text hashed


def test_corpus_report_hand_computed(spark):
    en = "the a is and of to in that it for"
    rows = [(0, en), (1, en), (2, "xyz xyz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = textstats.corpus_report(df).collect()[0]
    assert r.n_docs == 3 and r.n_tokens == 22
    assert r.vocab_size == 11
    assert r.n_exact_dup_docs == 2  # the two identical docs
    assert r.mean_quality == 0.916667  # (1.0 + 1.0 + 0.75) / 3
    assert r.n_en == 2 and r.n_und == 1 and r.n_de == 0


def test_winnow_overlap_pairs(spark):
    rows = [
        (0, "p q r s t u tail0 x y"),
        (1, "lead1 lead2 p q r s t u"),
        (2, "totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in textstats.winnow_overlap_pairs(df, min_shared=1).collect()
    }
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_unigram_logprob_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(0, "a a"), (1, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in textstats.unigram_logprob_scores(df).collect()}
    # total=4 tokens, vocab=2 -> denom=6; p(a)=(3+1)/6, p(b)=(1+1)/6
    nlp_a, nlp_b = -math.log(4 / 6.0), -math.log(2 / 6.0)
    assert got[0].n_tokens == 2
    assert got[0].mean_neg_logprob == round((nlp_a + nlp_a) / 2, 6)
    assert got[1].mean_neg_logprob == round((nlp_a + nlp_b) / 2, 6)
    # rare-token soup scores higher than stereotypical text
    assert got[1].mean_neg_logprob > got[0].mean_neg_logprob


# --------------------------------------------------- curation CLI entry
def test_curate_run_cli(spark, tmp_path):
    import glob
    import sys

    sys.path.insert(0, "/root/repo/tools")
    try:
        import curate_run
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "shards")
    metrics = curate_run.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--min-quality", "0.5",
        ]
    )
    assert metrics["n_input"] == 500
    assert 0 < metrics["n_curated"] <= 500
    assert metrics["n_written"] == metrics["n_curated"]  # no packing
    assert glob.glob(out + "/*.json.gz")
    # packed variant rolls windows instead of raw rows
    out2 = str(tmp_path / "packed")
    m2 = curate_run.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out2,
            "--min-quality", "0.5",
            "--pack-budget", "500",
        ]
    )
    assert 0 < m2["n_written"] < m2["n_curated"]


# ------------------------------------------------------------ span dedup
@pytest.fixture(scope="module")
def span_docs(spark):
    span = "one two three four five six seven eight"  # 8 tokens, shared
    rows = [
        (0, f"alpha {span} beta"),
        (1, f"gamma delta {span}"),
        (2, "unrelated text with no duplicated spans at all here"),
        (3, "tiny doc"),  # shorter than w
        (4, f"{span} {span}"),  # within-doc repeat
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_duplicate_spans_golden(span_docs):
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(span_docs, w=8).collect()
    }
    assert out[0]["clean_text"] == "alpha beta"
    assert out[0]["n_removed"] == 8 and out[0]["n_tokens"] == 10
    assert out[1]["clean_text"] == "gamma delta"
    assert out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == "unrelated text with no duplicated spans at all here"
    assert out[3] ["n_removed"] == 0 and out[3]["clean_text"] == "tiny doc"


def test_remove_duplicate_spans_within_doc_and_husk(span_docs):
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(span_docs, w=8).collect()
    }
    # doc 4 is two copies of the span: every window covering either copy
    # is duplicated, so the doc reduces to an empty husk
    assert out[4]["n_tokens"] == 16
    assert out[4]["n_removed"] == 16
    assert out[4]["clean_text"] == ""


def test_remove_duplicate_spans_matches_bruteforce(spark, span_docs):
    w = 8
    rows = {r["doc_id"]: r["text"] for r in span_docs.collect()}
    # brute force in python
    from collections import Counter
    occ = Counter()
    for t in rows.values():
        toks = t.split(" ")
        for i in range(len(toks) - w + 1):
            occ[" ".join(toks[i : i + w])] += 1
    expect = {}
    for d, t in rows.items():
        toks = t.split(" ")
        covered = set()
        for i in range(len(toks) - w + 1):
            if occ[" ".join(toks[i : i + w])] > 1:
                covered.update(range(i, i + w))
        kept = [tok for p, tok in enumerate(toks) if p not in covered]
        expect[d] = (len(toks), len(toks) - len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in dedup.remove_duplicate_spans(span_docs, w=w).collect()
    }
    assert got == expect


def test_remove_duplicate_spans_plan_is_jvm_only(span_docs):
    plan = dedup.remove_duplicate_spans(span_docs, w=8)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure HOF / hash / join plan


def test_hashed_classifier_scores(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha alpha alpha"), (2, "x")],
        ["doc_id", "text"],
    )
    out = textstats.hashed_classifier_scores(df).orderBy("doc_id").collect()
    assert [r["n_tokens"] for r in out] == [4, 3, 1]
    # the score is the mean of exact sixteenths -> n * score is an
    # integer multiple of 1/16 (exactness claim from the docstring)
    for r in out:
        v = r["clf_score"] * r["n_tokens"] * 16
        assert abs(v - round(v)) < 1e-6
    # a doc of one repeated token scores exactly that token's weight
    single = textstats.hashed_classifier_scores(
        spark.createDataFrame([(9, "alpha")], ["doc_id", "text"])
    ).collect()[0]
    assert out[1]["clf_score"] == single["clf_score"]
    # keep decision consistent with the sign of the score
    for r in out:
        if r["clf_score"] > 0:
            assert r["keep"]
        if r["clf_score"] < 0:
            assert not r["keep"]


def test_hashed_classifier_partition_invariant(spark):
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.lit("tok"), (F.col("id") % 7).cast("string"), F.lit("pad")
        ).alias("text"),
    )
    a = textstats.hashed_classifier_scores(df.coalesce(1)).orderBy("doc_id").collect()
    b = textstats.hashed_classifier_scores(df.repartition(8)).orderBy("doc_id").collect()
    assert a == b


def test_quantize_col_bounds_and_determinism(spark, emb):
    qc, _ = similarity.quantize_cols(F.col("embedding"))
    q = emb.select("vec_id", qc.alias("q")).collect()
    for r in q:
        assert all(-127 <= v <= 127 for v in r["q"])
    # driver-side twin produces the identical quantization
    row = emb.where("vec_id = 0").first()
    spark_q = next(r["q"] for r in q if r["vec_id"] == 0)
    assert similarity.py_quantize(row["embedding"])[0] == list(spark_q)


def test_ann_int8_topk_finds_near_dup(spark, emb):
    qv = emb.where("vec_id = 0").first()["embedding"]
    top = similarity.ann_int8_topk(emb.where("vec_id <> 0"), qv, k=3).collect()
    assert top[0]["vec_id"] == 1  # the planted near-dup wins on quantized cosine
    assert top[0]["qscore"] > top[-1]["qscore"]


def test_ann_int8_rerank_matches_exact_cosine(spark, emb):
    qv = emb.where("vec_id = 0").first()["embedding"]
    corpus = emb.where("vec_id <> 0")
    reranked = similarity.ann_int8_rerank_topk(corpus, qv, k=5).collect()
    exact = similarity.cosine_topk(corpus, qv, k=5).collect()
    # shortlist of 4k kept every true top-5 candidate on this fixture,
    # so the reranked result IS the exact result (ids and scores)
    assert [r["vec_id"] for r in reranked] == [r["vec_id"] for r in exact]
    for a, b in zip(reranked, exact):
        assert a["cosine"] == pytest.approx(b["cosine"], abs=0)


# --------------------------------------------------- SFT training pairs
def test_training_pairs_hand_computed(spark):
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark.ops import export

    ts = dt.datetime(2026, 1, 1)
    rows = [  # out of order on purpose: the window must sort by turn_idx
        ("c1", 2, "assistant", "a two", "", ts),
        ("c1", 0, "user", "u zero", "", ts),
        ("c1", 1, "assistant", "a one", "", ts),
        ("c1", 3, "user", "u three", "", ts),
        ("c1", 4, "assistant", "a four", "", ts),
        # opening assistant turn: no context -> no pair emitted
        ("c2", 0, "assistant", "orphan", "", ts),
        ("c2", 1, "user", "question", "", ts),
        ("c2", 2, "assistant", "answer here", "", ts),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {
        (r.conv_id, r.turn_idx): r
        for r in export.training_pairs(df, context_turns=3).collect()
    }
    # c1 turn 1: one context turn
    assert got[("c1", 1)].prompt == "user: u zero"
    assert got[("c1", 1)].response == "a one"
    # c1 turn 2: two context turns, rendered in turn order
    assert got[("c1", 2)].prompt == "user: u zero\nassistant: a one"
    # c1 turn 4: window truncates to the 3 nearest preceding turns
    assert got[("c1", 4)].prompt == (
        "assistant: a one\nassistant: a two\nuser: u three"
    )
    assert got[("c1", 4)].n_prompt_tokens == 9  # 3 role labels + 6 words
    assert got[("c1", 4)].n_response_tokens == 2
    # c2 turn 0 (assistant with no context) is absent; user turns absent
    assert ("c2", 0) not in got and ("c1", 3) not in got
    # context keeps ALL preceding turns regardless of role
    assert got[("c2", 2)].prompt == "assistant: orphan\nuser: question"
    assert set(got) == {("c1", 1), ("c1", 2), ("c1", 4), ("c2", 2)}


def test_training_pairs_single_shuffle(spark):
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark.ops import export

    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame([("c", 0, "user", "x", "", ts)], TRANSCRIPT_SCHEMA)
    plan = export.training_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the conv_id window partitioning only


# --------------------------------------------------- transcript QC report
def test_transcript_report_hand_computed(spark):
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark.ops import export

    t0 = dt.datetime(2026, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [  # c1 arrives out of order; has every fault type
        ("c1", 3, "assistant", "late", "", at(2)),  # ts goes backwards (3 < 4 slot)
        ("c1", 0, "user", "hi", "", at(0)),
        ("c1", 1, "assistant", "hello", "", at(1)),
        ("c1", 2, "assistant", "again", "", at(5)),  # role repeat with turn 1
        ("c1", 5, "user", "  ", "", at(6)),  # idx gap (3 -> 5) + empty text
        # c2: single clean turn
        ("c2", 0, "user", "solo", "", at(0)),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {r.conv_id: r for r in export.transcript_report(df).collect()}
    c1 = got["c1"]
    assert c1.n_turns == 5 and c1.n_empty == 1
    assert c1.first_role == "user"
    assert c1.n_role_repeats == 2  # (1,2) and (2,3) assistant runs
    assert c1.n_idx_gaps == 1  # 3 -> 5
    assert c1.ts_monotonic is False  # at(5) then at(2)
    c2 = got["c2"]
    assert (c2.n_turns, c2.n_empty, c2.first_role) == (1, 0, "user")
    assert c2.n_role_repeats == 0 and c2.n_idx_gaps == 0
    assert c2.ts_monotonic is True


def test_transcript_report_single_shuffle(spark):
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark.ops import export

    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame([("c", 0, "user", "x", "", ts)], TRANSCRIPT_SCHEMA)
    plan = export.transcript_report(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one conv_id aggregation


def test_noisy_turns_adapter_faults_surface(spark):
    """The QC fixture adapter injects every fault class transcript_report
    counts — and each is a pure doc_id function (oracle-reconstructible)."""
    from search_engine_spark.fixtures import documents_as_noisy_turns
    from search_engine_spark.ops import export

    docs = spark.createDataFrame(
        [(i, f"w{i} text") for i in range(40)], "doc_id long, text string"
    )
    rep = export.transcript_report(documents_as_noisy_turns(docs)).collect()
    assert sum(r.n_empty for r in rep) == 2  # doc_ids 9 and 26 (%17 == 9)
    assert sum(r.n_idx_gaps for r in rep) > 0
    assert sum(r.n_role_repeats for r in rep) > 0
    assert any(not r.ts_monotonic for r in rep)


# --------------------------------------------------- synonym-blended ranking
def test_synonym_ranked_blends_not_double_counts(spark):
    """A doc matching TWO spellings of one concept must not outscore a
    doc with the same total tf of the concept (SynonymQuery semantics:
    group tf = sum, group df = docs matching ANY member)."""
    from search_engine_spark import simple

    rows = [
        (0, "fast fast car"),  # group tf 2 via one member
        (1, "fast quick car"),  # group tf 2 via two members
        (2, "slow car"),
    ]
    import math

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in simple.synonym_ranked(
        df, [["fast", "quick"]], k=10
    ).collect()}
    assert set(got) == {0, 1}
    # identical group tf (2) and group df (2) -> identical NUMERATOR;
    # only the full-vocabulary length norm differs between the docs
    w0 = math.sqrt((1 + math.log(2.0)) ** 2 + 1.0)  # {fast:2, car:1}
    w1 = math.sqrt(3.0)  # {fast:1, quick:1, car:1}
    assert got[0] * w0 == pytest.approx(got[1] * w1, abs=1e-5)
    # naive OR-expansion would score doc 1's two members separately:
    # ln(1+3/2) for fast + ln(1+3/1) for quick > the blended numerator
    blended = math.log(1 + 3 / 2) * (1 + math.log(2.0))
    naive = math.log(1 + 3 / 2) + math.log(1 + 3 / 1)
    assert got[1] == pytest.approx(round(blended / w1, 6), abs=1e-6)
    assert blended < naive


def test_synonym_ranked_hand_computed(spark):
    import math

    from search_engine_spark import simple

    rows = [
        (0, "alpha beta"),
        (1, "alpha alpha gamma"),
        (2, "delta delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in simple.synonym_ranked(
        df, [["alpha", "beta"]], k=10
    ).collect()}
    n = 3.0
    # doc 0: group tf 2 (alpha+beta), df 2; weight = sqrt(2) (two tf-1 terms)
    w0 = math.sqrt(2.0)
    s0 = math.log(1 + n / 2) * (1 + math.log(2.0)) / w0
    # doc 1: group tf 2 (alpha alpha), weight = sqrt((1+ln2)^2 + 1)
    w1 = math.sqrt((1 + math.log(2.0)) ** 2 + 1.0)
    s1 = math.log(1 + n / 2) * (1 + math.log(2.0)) / w1
    assert got[0] == pytest.approx(round(s0, 6), abs=1e-6)
    assert got[1] == pytest.approx(round(s1, 6), abs=1e-6)
    assert 2 not in got


def test_synonym_ranked_overlapping_groups_and_dups(spark):
    from search_engine_spark import simple

    rows = [(0, "alpha beta"), (1, "beta beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # duplicate member inside a group collapses; a term may sit in two
    # groups (contributes to both) without erroring
    out = simple.synonym_ranked(
        df, [["alpha", "alpha", "beta"], ["beta"]], k=10
    ).collect()
    assert {r.doc_id for r in out} == {0, 1}


# --------------------------------------------------- tool-call analytics
def test_tool_stats_hand_computed(spark):
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark.ops import export

    ts = dt.datetime(2026, 1, 1)
    rows = [  # out of order on purpose: retry detection must sort by turn_idx
        ("c1", 3, "tool", "x", "bash", ts),
        ("c1", 0, "user", "q", "", ts),
        ("c1", 1, "tool", "x", "bash", ts),
        ("c1", 2, "tool", "x", "bash", ts),   # retry of turn 1
        ("c1", 5, "tool", "x", "search", ts),  # breaks the bash run
        ("c1", 6, "tool", "x", "bash", ts),    # NOT a retry (search between)
        ("c2", 0, "tool", "x", "bash", ts),    # first call in conv: no retry
        ("c2", 1, "assistant", "a", "", ts),   # non-tool role ignored
        ("c2", 2, "user", "u", "bash", ts),    # tool col but wrong role: ignored
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {r.tool: r for r in export.tool_stats(df).collect()}
    assert set(got) == {"bash", "search"}
    b = got["bash"]
    assert b.n_calls == 5 and b.n_convs == 2
    # retries: c1 turns 2 and 3 follow a bash call; turns 1 (first), 6
    # (search precedes) and c2 turn 0 (first in conv) are not retries
    assert b.n_retries == 2
    assert b.avg_turn_idx == pytest.approx((1 + 2 + 3 + 6 + 0) / 5, abs=1e-9)
    s = got["search"]
    assert (s.n_calls, s.n_convs, s.n_retries) == (1, 1, 0)


def test_tool_stats_filters_before_exchange(spark):
    """The conv window must run over ONLY tool-role turns — the corpus
    never reaches the exchange."""
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark.ops import export

    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame([("c", 0, "tool", "x", "bash", ts)], TRANSCRIPT_SCHEMA)
    plan = export.tool_stats(df)._jdf.queryExecution().executedPlan().toString()
    # filter sits below the first exchange (window partitioning)
    first_exchange = plan.index("Exchange")
    assert "Filter" in plan[first_exchange:]


def test_agent_turns_adapter_tool_column(spark):
    from search_engine_spark.fixtures import _TOOLS, documents_as_agent_turns

    docs = spark.createDataFrame(
        [(i, f"w{i}") for i in range(30)], "doc_id long, text string"
    )
    rows = documents_as_agent_turns(docs).collect()
    for r in rows:
        did = int(r.conv_id[4:]) * 7 + r.turn_idx
        if did % 3 == 2:
            assert r.role == "tool" and r.tool == _TOOLS[(did // 5) % 4]
        else:
            assert r.tool == ""


# --------------------------------------------------- term trends
def test_term_trends_hand_computed(spark):
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark import simple

    t0 = dt.datetime(2026, 1, 1)  # epoch-aligned; bucket = floor(unix/100)
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) // 100

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("c", 0, "user", "err err ok", "", at(0)),      # bucket base
        ("c", 1, "user", "err", "", at(99)),            # bucket base
        ("c", 2, "user", "ok ok", "", at(100)),         # bucket base+1
        ("c", 3, "user", "err ok err err", "", at(250)),  # bucket base+2
        ("c", 4, "user", "nothing here", "", at(251)),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {
        (r.term, r.bucket): (r.n_turns, r.tf_sum)
        for r in simple.term_trends(df, ["err", "ok"], bucket_seconds=100).collect()
    }
    assert got == {
        ("err", base): (2, 3),
        ("ok", base): (1, 1),
        ("ok", base + 1): (1, 2),
        ("err", base + 2): (1, 3),
        ("ok", base + 2): (1, 1),
    }


def test_term_trends_single_shuffle(spark):
    import datetime as dt

    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA
    from search_engine_spark import simple

    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame([("c", 0, "user", "x", "", ts)], TRANSCRIPT_SCHEMA)
    plan = (
        simple.term_trends(df, ["x", "y"], 60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-turn tf is in-projection (HOFs) — only the final agg exchanges,
    # and the corpus-sized token stream is never posexploded
    assert plan.count("Exchange") == 1
    assert "Generate posexplode" not in plan


# --------------------------------------------------- pseudo-relevance feedback
def test_prf_ranked_hand_computed(spark):
    """Feedback docs pull in an expansion term that re-ranks a doc the
    base query can't see at all."""
    from search_engine_spark import simple

    rows = [
        (0, "spark engine tuning"),     # base hit; 'engine' in both fb docs
        (1, "spark engine shuffle"),    # base hit
        (2, "engine engine engine"),    # NO base term: only expansion finds it
        (3, "unrelated words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base_ids = {
        r.doc_id for r in simple.ranked_topk(df, ["spark"], 10).collect()
    }
    assert base_ids == {0, 1}
    prf_ids = {
        r.doc_id
        for r in simple.prf_ranked(
            df, ["spark"], k=10, fb_docs=2, n_expansion=1
        ).collect()
    }
    # expansion candidates in fb docs {0,1}: engine df=2 beats
    # tuning/shuffle df=1 -> expanded query = spark + engine -> doc 2 in
    assert prf_ids == {0, 1, 2}
    assert 3 not in prf_ids


def test_prf_ranked_expansion_tiebreaks_are_integer(spark):
    """fb_df ties fall to total fb tf, then term asc — all integers."""
    from search_engine_spark import simple

    rows = [
        (0, "spark alpha beta beta"),
        (1, "spark alpha beta"),
        (2, "alpha only here"),
        (3, "beta beta beta beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # fb = {0,1}; candidates: alpha df2 tf2, beta df2 tf3 -> beta wins
    out = {
        r.doc_id
        for r in simple.prf_ranked(
            df, ["spark"], k=10, fb_docs=2, n_expansion=1
        ).collect()
    }
    assert 3 in out and 2 not in out


# --------------------------------------------------- ANN recall eval
def test_ann_recall_at_k_perfect_and_degraded(spark):
    import numpy as np

    from search_engine_spark.ops import similarity

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    qv = [float(x) for x in vecs[0]]
    row = similarity.ann_recall_at_k(
        df.where("vec_id <> 0"), qv, k=10
    ).collect()[0]
    assert row.k == 10 and 0 <= row.n_overlap <= 10
    assert row.recall == pytest.approx(row.n_overlap / 10.0, abs=0)
    # int8 quantization of well-spread gaussians should recall most of
    # the true top-10 (sanity: the approx arm is not garbage)
    assert row.n_overlap >= 7


# --------------------------------------------------- BM25F conversations
def test_bm25f_conv_hand_computed(spark):
    import datetime as dt
    import math

    from search_engine_spark import simple
    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA

    ts = dt.datetime(2026, 1, 1)
    rows = [
        # c1: 'fix' said by the assistant (weight 2.0)
        ("c1", 0, "user", "please help", "", ts),
        ("c1", 1, "assistant", "fix applied ok", "", ts),
        # c2: 'fix' only inside a tool dump (weight 0.5)
        ("c2", 0, "user", "please help", "", ts),
        ("c2", 1, "tool", "fix applied ok", "", ts),
        # c3: no match
        ("c3", 0, "user", "nothing here", "", ts),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    w = {"user": 1.0, "assistant": 2.0, "tool": 0.5}
    got = {r.conv_id: r.score for r in simple.bm25f_conv(df, ["fix"], w).collect()}
    assert set(got) == {"c1", "c2"}
    assert got["c1"] > got["c2"]  # assistant field outweighs tool field

    # exact replication: N=3 convs, df=2; field lens and avgs
    n, dfq, k1, b = 3, 2, 1.5, 0.75
    idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
    # avg field lengths over all 3 convs: assistant 3/3, tool 3/3, user (2+2+2)/3
    def score(role_w, fl, avg):
        wtf = role_w * 1 / (1 - b + b * fl / avg)
        return round(idf * wtf / (k1 + wtf), 6)

    assert got["c1"] == pytest.approx(score(2.0, 3, 1.0), abs=1e-6)
    assert got["c2"] == pytest.approx(score(0.5, 3, 1.0), abs=1e-6)


def test_bm25f_conv_no_match_returns_empty(spark):
    """A query matching NO conversation must return an empty frame, not
    crash on the NULL df aggregate (regression: int(None) TypeError)."""
    import datetime as dt

    from search_engine_spark import simple
    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA

    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "please help", "", ts),
        ("c1", 1, "assistant", "fix applied", "", ts),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    out = simple.bm25f_conv(df, ["zzznomatch"], k=10)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["conv_id", "score"]


def test_bm25f_conv_saturates_once_across_fields(spark):
    """BM25F blends fields BEFORE saturation: a conv matching in two
    fields must score less than the sum of two per-field BM25 scores
    (the naive-summation failure mode)."""
    import datetime as dt

    from search_engine_spark import simple
    from search_engine_spark.fixtures import TRANSCRIPT_SCHEMA

    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "fix it", "", ts),
        ("c1", 1, "assistant", "fix done", "", ts),
        ("c2", 0, "user", "other words", "", ts),
        ("c2", 1, "assistant", "fix done", "", ts),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    w = {"user": 1.0, "assistant": 1.0, "tool": 1.0}
    got = {r.conv_id: r.score for r in simple.bm25f_conv(df, ["fix"], w).collect()}
    # two-field conv scores higher than one-field, but sub-additively
    assert got["c1"] > got["c2"]
    assert got["c1"] < 2 * got["c2"]


# --------------------------------------------------- ordered proximity
def test_near_match_ordered(spark):
    from search_engine_spark import simple

    rows = [
        (0, "fix the bad bug"),      # fix ... bug, dist 3, ordered
        (1, "bug was a fix"),        # only reverse order
        (2, "fix bug"),              # adjacent ordered (phrase case)
        (3, "fix a a a a bug"),      # dist 5 > k
        (4, "no terms at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    unordered = {r.doc_id for r in simple.near_match(df, "fix", "bug", 3).collect()}
    ordered = {
        r.doc_id
        for r in simple.near_match(df, "fix", "bug", 3, ordered=True).collect()
    }
    assert unordered == {0, 1, 2}
    assert ordered == {0, 2}  # doc 1 drops: 'bug' precedes 'fix'
    # k=1 ordered is exactly the two-word phrase operator
    phrase = {
        r.doc_id
        for r in simple.near_match(df, "fix", "bug", 1, ordered=True).collect()
    }
    assert phrase == {2}


# --------------------------------------------------- phrase-constrained ranking
def test_phrase_ranked_filters_then_scores(spark):
    from search_engine_spark import simple

    rows = [
        (0, "hash join wins"),          # has the phrase
        (1, "join hash reversed"),      # both terms, wrong order: excluded
        (2, "hash join hash join"),     # phrase twice, higher tf
        (3, "hash only"),
        (4, "nothing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in simple.phrase_ranked(df, ["hash", "join"]).collect()}
    assert set(got) == {0, 2}
    assert got[2] > got[0]
    # score equals the unconstrained ranked score for the same doc
    # (the phrase restricts candidates, not statistics)
    full = {r.doc_id: r.score for r in simple.ranked_topk(df, ["hash", "join"], 10).collect()}
    assert got[0] == full[0] and got[2] == full[2]
    assert 1 in full  # and doc 1 was only removed by the phrase constraint


# --------------------------------------------------- engine-level PRF
def test_engine_prf_query_matches_driver_recomputation(spark, tmp_path):
    """prf_query's expansion equals a brute-force driver recomputation
    (analyze the base top-fb docs, integer-keyed candidate sort), and
    its final ranking equals _score_terms_df over those exact terms."""
    from collections import Counter

    from search_engine_spark.engine import TranscriptSearchEngine
    from search_engine_spark.fixtures import golden_transcripts
    from search_engine_spark.text.normalize import analyze

    eng = TranscriptSearchEngine.build(
        spark, golden_transcripts(spark), str(tmp_path / "idx")
    )
    q, fbn, nexp = "test document", 2, 2
    got = eng.prf_query(q, k=10, fb_docs=fbn, n_expansion=nexp)

    base = [d for d, _ in eng.ranked_query(q, k=fbn)]
    texts = {
        int(r["doc_id"]): r["text"]
        for r in eng.docs.where(F.col("doc_id").isin(base)).collect()
    }
    fb_df, fb_tf = Counter(), Counter()
    for d in base:
        tfs = Counter(t for t, _p, _raw in analyze(texts[d]))
        for t, c in tfs.items():
            fb_df[t] += 1
            fb_tf[t] += c
    orig = eng._ranked_terms(q)
    cand = sorted(
        (-df, -fb_tf[t], t) for t, df in fb_df.items() if t not in set(orig)
    )[:nexp]
    expected_terms = orig + [t for _a, _b, t in cand]
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in eng._score_terms_df(expected_terms, 10).collect()
    ]
    assert got == want
    assert len(cand) > 0  # the fixture does produce expansion terms


def test_engine_prf_no_feedback_falls_back_to_base(spark, tmp_path):
    from search_engine_spark.engine import TranscriptSearchEngine
    from search_engine_spark.fixtures import golden_transcripts

    eng = TranscriptSearchEngine.build(
        spark, golden_transcripts(spark), str(tmp_path / "idx2")
    )
    assert eng.prf_query("zzzmissing", k=5) == []


# --------------------------------------------------- regex term query
def test_regex_vocab(spark):
    from search_engine_spark import simple

    rows = [(0, "stream storm stem"), (1, "storm other sum")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.word: r.df for r in simple.regex_vocab(df, "^s.*m$").collect()}
    # everything s...m qualifies; 'other' fails the anchor
    assert got == {"stream": 1, "storm": 2, "stem": 1, "sum": 1}
    got2 = {r.word for r in simple.regex_vocab(df, "^st[aeiou]+").collect()}
    assert got2 == {"stem", "storm"}  # stream has a consonant after st


# --------------------------------------------------- score explanation
def test_ranked_explain_contribs_sum_to_score(spark):
    import math

    from search_engine_spark import simple

    rows = [
        (0, "spark spark join"),
        (1, "join fast"),
        (2, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "join", "fast"]
    scores = {r.doc_id: r.score for r in simple.ranked_topk(df, terms, 10).collect()}
    ex = simple.ranked_explain(df, terms, k=10).collect()
    by_doc = {}
    for r in ex:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(scores)
    for d, rows_ in by_doc.items():
        # contribs sum to the ranked score (each rounded at 6dp; allow
        # one ulp-of-rounding slack per term)
        assert sum(r.contrib for r in rows_) == pytest.approx(
            scores[d], abs=1e-5
        )
    # spot-check doc 0's 'spark' row factors
    r0 = next(r for r in by_doc[0] if r.term == "spark")
    assert r0.tf == 2 and r0.df == 1
    assert r0.wqt == pytest.approx(round(math.log(1 + 3 / 1), 6), abs=1e-6)
    assert r0.wdt == pytest.approx(round(1 + math.log(2), 6), abs=1e-6)


# --------------------------------------------------- significant terms
def test_significant_terms_hand_computed(spark):
    from search_engine_spark import simple

    rows = [
        (0, "spark tuning gc"),      # fg
        (1, "spark tuning jvm"),     # fg
        (2, "tuning recipes food"),  # bg only: 'tuning' is corpus-common
        (3, "food recipes"),         # bg
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.term: r for r in simple.significant_terms(df, ["spark"], n=10).collect()}
    # 'tuning' is in both fg docs (fg_df 2) but also 3/4 of the corpus;
    # it still scores since fg_rate 1.0 > bg_rate .75. No other term
    # reaches min_fg_df=2; the query term itself is excluded.
    assert set(got) == {"tuning"}
    t = got["tuning"]
    assert (t.fg_df, t.df) == (2, 3)
    fg_rate, bg_rate = 2 / 2, 3 / 4
    assert t.score == pytest.approx(
        round((fg_rate - bg_rate) * (fg_rate / bg_rate), 6), abs=1e-6
    )


def test_significant_terms_ranks_discriminative_terms_first(spark):
    from search_engine_spark import simple

    rows = [
        (0, "spark shuffle skew"),
        (1, "spark shuffle gc"),
        (2, "spark skew shuffle"),
        (3, "cooking gc pasta"),     # gc also appears in background
        (4, "cooking pasta oven"),
        (5, "oven pasta cooking"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simple.significant_terms(df, ["spark"], n=10).collect()
    terms = [r.term for r in out]
    # 'shuffle' (fg 3/3, bg 3/6) and 'skew' (fg 2/3, bg 2/6) are fg-only;
    # both must outrank nothing else (no other term has fg_df >= 2)
    assert set(terms) == {"shuffle", "skew"}
    assert terms[0] == "shuffle"


def test_significant_terms_empty_foreground(spark):
    from search_engine_spark import simple

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    assert simple.significant_terms(df, ["zzz"], n=5).collect() == []
