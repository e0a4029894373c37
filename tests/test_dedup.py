"""Dedup operator properties (beyond the oracle hash-compare)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datahub_spark.operators import dedup as DD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_normalized_duplicates(spark):
    df = _docs(spark, [
        (1, "Hello   World"), (2, "hello world"), (3, "other text")])
    out = {r["keeper"]: r["n_docs"] for r in DD.dedup_exact(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_short_doc_yields_empty_set(spark):
    df = _docs(spark, [(1, "one two")])
    out = df.select(DD.shingles(F.col("text"), 3).alias("sh")).collect()[0]["sh"]
    assert out == []


def test_minhash_identical_docs_collide_in_all_bands(spark):
    df = _docs(spark, [
        (1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")])
    sig = DD.minhash_signature(df, k=12, n=3)
    pairs = DD.lsh_candidates(sig, bands=4, rows_per_band=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_ngram_jaccard_exact_value(spark):
    # doc1: shingles {abc, bcd}; doc2: {abc, bcd, cde} -> J = 2/3
    df = _docs(spark, [(1, "a b c d"), (2, "a b c d e")])
    rows = DD.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard_e4"] == 6667  # round-half-up(2/3 * 1e4)


def test_simhash_near_identical_low_hamming(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    df = _docs(spark, [(1, base), (2, base + " extra"), (3, "completely different words here now")])
    sig = DD.simhash64(df)
    cands = DD.simhash_candidates(sig, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in cands}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_embedding_near_dup_blocked_join(spark):
    rows = [
        (1, [1.0, 0.0], "a"), (2, [0.999, 0.04], "a"),
        (3, [0.0, 1.0], "a"), (4, [1.0, 0.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    pairs = DD.embedding_near_dup(df, threshold=0.9, block_col="label").collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # 1-2 near-dup within block a; 1-4 identical but in different blocks
    assert got == {(1, 2)}


def test_embedding_near_dup_lsh_is_subset_of_exact_with_same_scores(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    v = rng.standard_normal((30, 8))
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    # plant two true near-dup pairs
    v[1] = v[0] + rng.standard_normal(8) * 0.01
    v[1] /= np.linalg.norm(v[1])
    v[11] = v[10] + rng.standard_normal(8) * 0.01
    v[11] /= np.linalg.norm(v[11])
    df = spark.createDataFrame(
        [(i, v[i].astype(float).tolist()) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    thr = 90 * 10**12  # cosine 0.9 at 1e14 scale
    from pyspark.sql import functions as F
    from datahub_spark.operators import similarity as SIM

    l = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    r = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    exact = {
        (x["id_a"], x["id_b"]): x["d"]
        for x in l.crossJoin(r).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", SIM.dot_fixed(F.col("_va"), F.col("_vb")).alias("d"))
        .filter(F.col("d") >= thr).collect()
    }
    got = {
        (x["id_a"], x["id_b"]): x["dot_fp"]
        for x in DD.embedding_near_dup_lsh(df, thr, bands=4, rows_per_band=2, dim=8).collect()
    }
    # LSH blocking only prunes: every emitted pair is a true pair with
    # the exact score, and the planted high-sim pairs are recovered
    assert set(got) <= set(exact)
    for p, d in got.items():
        assert exact[p] == d
    assert (0, 1) in got and (10, 11) in got


def test_connected_components_merges_transitive_chains(spark):
    # chain 1-2-3, pair 10-11, singleton-free by construction
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in DD.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    # a 12-node path needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in DD.connected_components(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_decontaminate_flags_ngram_overlap(spark):
    """Benchmark decontamination: train docs sharing >= min_hits n-grams
    with any benchmark doc are flagged; clean docs pass."""
    train = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely unrelated training text about spark engines here"),
        (3, "the quick brown fox jumps over something else entirely now"),
    ])
    bench = _docs(spark, [
        (100, "eval question: the quick brown fox jumps over the lazy dog"),
    ])
    out = {r["id"]: (r["n_hits"], r["contaminated"]) for r in
           DD.decontaminate(train, bench, n=5, min_hits=1).collect()}
    assert out[1][1] is True        # shares 5-grams with the eval doc
    assert out[2] == (0, False)     # clean
    assert out[3][1] is True        # shares "the quick brown fox jumps"
    # stricter threshold: doc 3 shares only the one 5-gram run
    strict = {r["id"]: r["contaminated"] for r in
              DD.decontaminate(train, bench, n=5, min_hits=4).collect()}
    assert strict[1] is True and strict[3] is False


def test_decontaminate_is_broadcast_not_cartesian(spark):
    train = _docs(spark, [(i, f"doc number {i} with some shared text body")
                          for i in range(20)])
    bench = _docs(spark, [(999, "a benchmark doc with some shared text")])
    plan = DD.decontaminate(train, bench, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # benchmark shingles broadcast


def test_connected_components_adversarial_10k_chain(spark):
    """The adversarial case for label propagation: a 10k-diameter path
    graph (every doc near-dup of the next). Plain propagation needs
    10k rounds; the pointer-jump step bounds it at O(log diameter) —
    max_iterations=20 RAISES on overrun, so passing proves the round
    bound, not just the answer."""
    n = 10_000
    edges = spark.range(n - 1).select(
        F.format_string("n%05d", F.col("id")).alias("id_a"),
        F.format_string("n%05d", F.col("id") + 1).alias("id_b"))
    out = DD.connected_components(edges, max_iterations=20)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("component").alias("ncomp"),
        F.min("component").alias("root")).collect()[0]
    assert agg["n"] == n
    assert agg["ncomp"] == 1
    assert agg["root"] == "n00000"
