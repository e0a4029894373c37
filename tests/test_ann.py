"""ANN operators: exactness of brute force vs numpy, LSH recall subset."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from datahub_spark.operators import similarity as SIM


def _emb(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, v[i].astype(float).tolist()) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    return df, v


def test_bruteforce_matches_numpy(spark):
    df, v = _emb(spark)
    qs = df.filter("vec_id < 3")
    got = SIM.ann_bruteforce(qs, df, k=4).collect()
    # mirror the fixed-point pipeline exactly: float32 storage -> double
    # -> round(x * 1e7) int64 -> exact integer dot products
    vfx = np.round(v.astype(np.float32).astype(np.float64) * 1e7).astype(np.int64)
    sims = vfx @ vfx.T
    for q in range(3):
        order = [i for i in np.lexsort((np.arange(len(v)), -sims[q])) if i != q][:4]
        mine = [r["neighbor_id"] for r in got if r["query_id"] == q]
        assert mine == order, f"query {q}"


def test_lsh_results_are_true_neighbors_from_same_bucket(spark):
    df, v = _emb(spark)
    qs = df.filter("vec_id < 3")
    approx = SIM.ann_lsh(qs, df, k=4, n_planes=4, dim=8)
    exact = SIM.ann_bruteforce(qs, df, k=40)
    # every approx neighbor must appear in the exact ranking with the
    # same score (LSH only prunes candidates, never alters scores)
    ex = {(r["query_id"], r["neighbor_id"]): r["dot_fp"] for r in exact.collect()}
    for r in approx.collect():
        assert ex[(r["query_id"], r["neighbor_id"])] == r["dot_fp"]


def test_dot_fixed_is_exact_and_symmetric(spark):
    df, v = _emb(spark, n=6)
    from pyspark.sql import functions as F

    a = df.alias("a")
    b = df.alias("b")
    pairs = (
        a.crossJoin(b)
        .select(
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
            SIM.dot_fixed(F.col("a.embedding"), F.col("b.embedding")).alias("d"),
        )
        .collect()
    )
    d = {(r["ia"], r["ib"]): r["d"] for r in pairs}
    for i in range(6):
        for j in range(6):
            assert d[(i, j)] == d[(j, i)]
        # self-dot of a unit vector ~ 1e14 within fixed-point quantization
        assert abs(d[(i, i)] - 10**14) < 10**10


def test_ivf_results_are_true_neighbors(spark):
    df, v = _emb(spark)
    qs = df.filter("vec_id < 3")
    approx = SIM.ann_ivf(qs, df, k=4, n_clusters=4, n_probe=2, dim=8)
    exact = SIM.ann_bruteforce(qs, df, k=40)
    ex = {(r["query_id"], r["neighbor_id"]): r["dot_fp"] for r in exact.collect()}
    rows = approx.collect()
    assert len(rows) > 0
    # IVF prunes candidates but never alters scores
    for r in rows:
        assert ex[(r["query_id"], r["neighbor_id"])] == r["dot_fp"]


def test_ivf_recall_reasonable_with_full_probe(spark):
    df, v = _emb(spark, n=30)
    qs = df.filter("vec_id < 3")
    # probing ALL clusters must recover the exact top-k
    approx = SIM.ann_ivf(qs, df, k=3, n_clusters=4, n_probe=4, dim=8)
    exact = SIM.ann_bruteforce(qs, df, k=3)
    a = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in approx.collect()}
    e = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
    assert a == e


def test_quantize_roundtrip_bounds_error_and_preserves_ranking(spark):
    import math
    from datahub_spark.operators import similarity as SIM
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = SIM.quantize_embeddings(emb)
    back = SIM.dequantize_embeddings(q, out_col="vec2")
    rows = back.select("vec_id", "embedding", "vec2", "q_scale").collect()
    assert len(rows) > 0
    for r in rows[:50]:
        s = r["q_scale"]
        for a, b in zip(r["embedding"], r["vec2"]):
            assert abs(a - b) <= s / 2 + 1e-6
    # int8 payload is 4x smaller per element and within range
    qr = q.select(F.explode("q").alias("e")).agg(
        F.min("e").alias("lo"), F.max("e").alias("hi")).collect()[0]
    assert -127 <= qr["lo"] and qr["hi"] <= 127
    # cosine ranking survives: top-5 neighbors of vector 0 overlap >= 4/5
    import numpy as np
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    deq = {r["vec_id"]: np.array(r["vec2"], dtype=float) for r in rows}

    def topk(vecs, qid, k=5):
        qv = vecs[qid]
        scored = sorted(
            ((np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v) + 1e-12), i)
             for i, v in vecs.items() if i != qid), reverse=True)
        return {i for _, i in scored[:k]}
    qid = rows[0]["vec_id"]
    assert len(topk(orig, qid) & topk(deq, qid)) >= 4


def test_quantize_zero_vector_guarded(spark):
    from datahub_spark.operators import similarity as SIM
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
                               "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in SIM.quantize_embeddings(df).collect()}
    assert out[1]["q_scale"] == 0.0 and out[1]["q"] == [0, 0, 0]
    assert out[2]["q"][1] == -127  # max-abs element hits the rail


def test_bucketed_ann_recall_vs_bruteforce(spark):
    """Quality evidence for the approximate paths: recall@5 of LSH and
    IVF against the exact brute-force ranking on the real embeddings
    table. Deterministic (fixed data, seeded planes, exact arithmetic),
    so the floor is a pin, not a flake."""
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 25)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in SIM.ann_bruteforce(q, emb, k=5).collect()}
    lsh1 = {(r["query_id"], r["neighbor_id"])
            for r in SIM.ann_lsh(q, emb, k=5, n_planes=6, dim=64).collect()}
    lsh4 = {(r["query_id"], r["neighbor_id"])
            for r in SIM.ann_lsh(q, emb, k=5, n_planes=6, dim=64,
                                 bands=4).collect()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in SIM.ann_ivf(q, emb, k=5, n_clusters=16, n_probe=4,
                                lloyd_rounds=2, dim=64).collect()}
    mp = {(r["query_id"], r["neighbor_id"])
          for r in SIM.ann_lsh(q, emb, k=5, n_planes=6, dim=64,
                               bands=8, probe_bits=6).collect()}
    r_lsh1 = len(exact & lsh1) / len(exact)
    r_lsh4 = len(exact & lsh4) / len(exact)
    r_mp = len(exact & mp) / len(exact)
    r_ivf = len(exact & ivf) / len(exact)
    # measured on this corpus: pin floors under the observed values so
    # a bucketing regression (wrong plane fold, broken probe) trips;
    # multi-band probing must deliver a real recall lift over one band
    assert r_lsh4 >= 2 * r_lsh1, (r_lsh1, r_lsh4)
    assert r_lsh4 >= 0.2, r_lsh4
    # multi-probe (Hamming-1 query fan-out) is the product recall
    # config: measured 0.904 at bands=8/probe_bits=6 — pin well above
    # the r7 complaint threshold (recall@5 >= 0.6)
    assert r_mp >= 0.8, r_mp
    assert r_ivf >= 0.5, r_ivf


def test_persisted_ivf_index_probe_matches_inline(spark, tmp_path):
    """save_ivf_index + ann_ivf_probe == ann_ivf run inline, and the
    probe's scan reads ONLY the probed clusters' partitions (the
    cl IN (...) predicate lands as a partition filter)."""
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    SIM.save_ivf_index(emb, path, n_clusters=16, lloyd_rounds=2, dim=64)

    probe = SIM.ann_ivf_probe(spark, path, q, k=5, n_probe=4)
    inline = SIM.ann_ivf(q, emb, k=5, n_clusters=16, n_probe=4,
                         lloyd_rounds=2, dim=64)
    got = sorted(map(tuple, probe.collect()))
    want = sorted(map(tuple, inline.collect()))
    assert got == want and len(got) > 0

    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cl" in plan.replace("#", " #") or \
        "cl IN" in plan or "cl#" in plan.split("PartitionFilters")[1][:200]


def test_cluster_embeddings_operator(spark):
    """cluster_embeddings: every vector assigned, affinities finite,
    identical to the members frame SemDeDup consumes."""
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    members, centroids = SIM.cluster_embeddings(emb, n_clusters=8,
                                                lloyd_rounds=1, dim=64)
    rows = members.collect()
    assert len(rows) == emb.count()
    assert centroids.count() == 8
    assert all(0 <= r["cl"] < 8 for r in rows)
    assert all(r["aff"] == r["aff"] for r in rows)  # no NaN
    # cluster sizes cover the corpus
    sizes = {r["cl"]: r["n"] for r in
             members.groupBy("cl").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == len(rows)


def test_quantized_ivf_index_probe_recall(spark, tmp_path):
    """save_ivf_index(quantize=True) stores int8 codes + per-vector
    scale (~8x less index IO per probe); the asymmetric probe must rank
    nearly identically to the full-precision probe on the real
    embeddings — recall@5 floor pinned."""
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 25)
    full_path = str(tmp_path / "ivf_full")
    q8_path = str(tmp_path / "ivf_q8")
    SIM.save_ivf_index(emb, full_path, n_clusters=16, lloyd_rounds=2,
                       dim=64)
    SIM.save_ivf_index(emb, q8_path, n_clusters=16, lloyd_rounds=2,
                       dim=64, quantize=True)
    # schema: codes + scale, no full-precision vectors on disk
    import pyspark.sql.types as T
    inv = spark.read.parquet(f"{q8_path}/inverted")
    assert "cv" not in inv.columns
    assert isinstance(inv.schema["q"].dataType.elementType, T.ByteType)

    exact = {(r["query_id"], r["neighbor_id"])
             for r in SIM.ann_ivf_probe(spark, full_path, q, k=5,
                                        n_probe=4).collect()}
    quant = {(r["query_id"], r["neighbor_id"])
             for r in SIM.ann_ivf_probe(spark, q8_path, q, k=5,
                                        n_probe=4).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall


def test_cluster_balanced_sample(spark):
    """cluster_balanced_sample: per-cluster cap enforced, selection
    deterministic, all three orderings valid, rows preserved intact."""
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    members, _ = SIM.cluster_embeddings(emb, n_clusters=8,
                                        lloyd_rounds=1, dim=64)
    sizes = {r["cl"]: r["n"] for r in
             members.groupBy("cl").agg(F.count("*").alias("n")).collect()}
    cap = 10
    kept = SIM.cluster_balanced_sample(emb, cap, members=members)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # every cluster contributes min(size, cap)
    expected_n = sum(min(n, cap) for n in sizes.values())
    assert len(kept_ids) == expected_n
    by_cl = {r["cid"]: r["cl"] for r in members.collect()}
    per_cl = {}
    for vid in kept_ids:
        per_cl[by_cl[vid]] = per_cl.get(by_cl[vid], 0) + 1
    assert all(v <= cap for v in per_cl.values())
    assert set(per_cl) == {cl for cl, n in sizes.items() if n > 0}
    # deterministic: same inputs -> same selection
    again = {r["vec_id"] for r in SIM.cluster_balanced_sample(
        emb, cap, members=members).select("vec_id").collect()}
    assert again == kept_ids
    # full schema preserved
    assert set(kept.columns) == set(emb.columns)

    # "diverse" keeps the LOWEST-affinity members of each cluster
    div = SIM.cluster_balanced_sample(emb, 3, members=members,
                                      order="diverse")
    div_ids = {r["vec_id"] for r in div.select("vec_id").collect()}
    aff = {(r["cl"], r["cid"]): r["aff"] for r in members.collect()}
    for cl in per_cl:
        in_cl = sorted(((a, cid) for (c, cid), a in aff.items()
                        if c == cl))
        expect = {cid for _, cid in in_cl[:3]}
        got = {cid for (c, cid) in aff if c == cl and cid in div_ids}
        assert got == expect, cl
    # prototypical keeps the HIGHEST-affinity members instead
    proto = SIM.cluster_balanced_sample(emb, 3, members=members,
                                        order="prototypical")
    proto_ids = {r["vec_id"] for r in proto.select("vec_id").collect()}
    for cl in per_cl:
        in_cl = sorted(((-a, cid) for (c, cid), a in aff.items()
                        if c == cl))
        expect = {cid for _, cid in in_cl[:3]}
        got = {cid for (c, cid) in aff if c == cl and cid in proto_ids}
        assert got == expect, cl
    import pytest as _pt
    with _pt.raises(ValueError):
        SIM.cluster_balanced_sample(emb, 3, members=members, order="nope")


# --- product quantization -------------------------------------------------


def _pq_numpy_model(v, m, ksub, rounds):
    """Reference PQ trainer mirroring train_pq bit-for-bit: fixed-point
    vectors, first-k init, exact int64 L2 argmin (lowest code on ties),
    integer-mean updates rounded half away from zero."""
    vfx = np.round(v.astype(np.float32).astype(np.float64) * 1e7).astype(np.int64)
    n, dim = vfx.shape
    dsub = dim // m
    books = np.stack([
        np.array([vfx[c, s * dsub:(s + 1) * dsub] for c in range(ksub)])
        for s in range(m)
    ])

    def assign(bk):
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            Vs = vfx[:, s * dsub:(s + 1) * dsub]
            d = (bk[s] * bk[s]).sum(axis=1)[None, :] - 2 * (Vs @ bk[s].T)
            codes[:, s] = d.argmin(axis=1)
        return codes

    for _ in range(rounds):
        codes = assign(books)
        nxt = books.copy()
        for s in range(m):
            for c in range(ksub):
                mem = vfx[codes[:, s] == c, s * dsub:(s + 1) * dsub]
                if len(mem):
                    tot = mem.sum(axis=0)
                    nxt[s, c] = [
                        (-1 if t < 0 else 1) * ((2 * abs(int(t)) + len(mem))
                                                // (2 * len(mem)))
                        for t in tot]
        books = nxt
    return books, assign(books), vfx


def test_pq_train_encode_match_numpy_model(spark):
    df, v = _emb(spark, n=40, dim=8)
    books = SIM.train_pq(df, m=2, ksub=4, lloyd_rounds=2, dim=8)
    ref_books, ref_codes, _ = _pq_numpy_model(v, m=2, ksub=4, rounds=2)
    assert np.array_equal(np.array(books, dtype=np.int64), ref_books)
    got = {r["vec_id"]: list(r["codes"])
           for r in SIM.encode_pq(df, books).collect()}
    for i in range(40):
        assert got[i] == list(ref_codes[i]), i


def test_pq_adc_matches_numpy_and_recalls(spark):
    df, v = _emb(spark, n=60, dim=8, seed=11)
    books = SIM.train_pq(df, m=4, ksub=8, lloyd_rounds=2, dim=8)
    codes = SIM.encode_pq(df, books)
    qs = df.filter("vec_id < 5")
    got = SIM.ann_pq_adc(qs, codes, books, k=5)
    rows = got.collect()

    # numpy model: ADC score = sum_s <q_s, centroid[code_s]>
    ref_books, ref_codes, vfx = _pq_numpy_model(v, m=4, ksub=8, rounds=2)
    dsub = 2
    for q in range(5):
        lut = np.stack([vfx[q, s * dsub:(s + 1) * dsub] @ ref_books[s].T
                        for s in range(4)])
        scores = np.array([lut[np.arange(4), ref_codes[i]].sum()
                           for i in range(60)])
        order = [i for i in np.lexsort((np.arange(60), -scores)) if i != q][:5]
        mine = [(r["neighbor_id"], r["score_fp"]) for r in rows
                if r["query_id"] == q]
        assert [m_[0] for m_ in mine] == order, q
        for nid, s_fp in mine:
            assert s_fp == scores[nid], (q, nid)

    # quality: ADC top-5 overlaps exact top-5 (codes are 4 bytes vs 32)
    exact = SIM.ann_bruteforce(qs, df, k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    hit = sum((r["query_id"], r["neighbor_id"]) in ex for r in rows)
    assert hit / len(ex) >= 0.5, hit / len(ex)


def test_pq_rejects_bad_shapes(spark):
    df, _ = _emb(spark, n=10, dim=8)
    import pytest
    with pytest.raises(ValueError):
        SIM.train_pq(df, m=3, ksub=4, dim=8)   # 8 % 3 != 0
    with pytest.raises(ValueError):
        SIM.train_pq(df, m=2, ksub=200, dim=8)  # > tinyint
    with pytest.raises(ValueError):
        SIM.train_pq(df, m=2, ksub=16, dim=8)  # corpus < ksub


def test_pq_ivf_index_full_probe_equals_adc(spark, tmp_path):
    """IVF-PQ persisted index, probed with n_probe = n_clusters (no
    candidate pruned), must reproduce ann_pq_adc over the same codes
    bit-for-bit — proves the index stores exactly the encode_pq codes
    and the probe scores exactly the ADC LUT sum."""
    df, v = _emb(spark, n=60, dim=8, seed=13)
    path = str(tmp_path / "ivfpq")
    SIM.save_ivf_index(df, path, n_clusters=4, dim=8, pq_m=4, pq_ksub=8)
    qs = df.filter("vec_id < 5")
    got = SIM.ann_ivf_probe(spark, path, qs, k=5, n_probe=4)

    books = SIM.train_pq(df, m=4, ksub=8, lloyd_rounds=2, dim=8)
    codes = SIM.encode_pq(df, books)
    want = SIM.ann_pq_adc(qs, codes, books, k=5) \
        .withColumnRenamed("score_fp", "dot_fp")
    wrows = want.collect()
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, wrows))
    assert g == w

    # pruned probe still returns true ADC scores (a subset of clusters
    # survives, so compare against the FULL score table, k=all)
    pruned = SIM.ann_ivf_probe(spark, path, qs, k=5, n_probe=2)
    full = SIM.ann_pq_adc(qs, codes, books, k=60).collect()
    allsc = {(r["query_id"], r["neighbor_id"]): r["score_fp"] for r in full}
    for r in pruned.collect():
        assert allsc[(r["query_id"], r["neighbor_id"])] == r["dot_fp"]


def test_two_stage_retrieval_exact_rerank(spark, tmp_path):
    """Coarse PQ shortlist + exact rerank: with a full probe and a
    shortlist covering the corpus, two-stage == brute force exactly;
    at tighter budgets every returned score is still the EXACT dot
    (rerank guarantees score truth regardless of shortlist quality)."""
    df, v = _emb(spark, n=60, dim=8, seed=17)
    path = str(tmp_path / "idx")
    SIM.save_ivf_index(df, path, n_clusters=4, dim=8, pq_m=4, pq_ksub=8)
    qs = df.filter("vec_id < 4")

    full = SIM.ann_two_stage(spark, path, qs, df, k=5,
                             rerank_factor=12, n_probe=4)
    exact = SIM.ann_bruteforce(qs, df, k=5)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, exact.collect()))

    tight = SIM.ann_two_stage(spark, path, qs, df, k=5,
                              rerank_factor=2, n_probe=2)
    truth = {(r["query_id"], r["neighbor_id"]): r["dot_fp"]
             for r in SIM.ann_bruteforce(qs, df, k=60).collect()}
    rows = tight.collect()
    assert rows
    for r in rows:
        assert truth[(r["query_id"], r["neighbor_id"])] == r["dot_fp"]


def test_pq_handles_empty_partitions(spark):
    """More partitions than rows -> empty Arrow batches flow through
    every PQ mapInPandas (assignment, encode, ADC probe)."""
    df, _ = _emb(spark, n=10, dim=8, seed=23)
    sparse = df.repartition(32)
    books = SIM.train_pq(sparse, m=2, ksub=4, lloyd_rounds=1, dim=8)
    codes = SIM.encode_pq(sparse, books).repartition(32)
    assert codes.count() == 10
    got = SIM.ann_pq_adc(df.filter("vec_id < 2"), codes, books, k=3)
    assert got.count() == 6


def test_fused_lloyd_round_matches_lloyd_update_reference(spark):
    """r16 (VERDICT r15 item #4): kmeans_inverted's fused
    assign+partial-sum kernel must produce EXACTLY the centroids the
    two-step reference (assign -> lloyd_update -> collect) produces —
    same assignment GEMM, exact int64 partial sums, same sign-factored
    integer mean. One round over the real sf0.001 embeddings."""
    from tests.conftest import SF_SMALL
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    # fused path: one Lloyd round inside kmeans_inverted
    _, cents = SIM.kmeans_inverted(emb, n_clusters=8, lloyd_rounds=1,
                                   dim=64)
    fused = {r["cl"]: list(r["m"]) for r in cents.collect()}

    # reference path: explicit init -> assign (broadcast matmul via a
    # crossJoin-free exact recompute) -> lloyd_update -> integer means
    c = emb.select(F.col("vec_id").alias("cid"),
                   SIM.fixed_vec(F.col("embedding")).alias("cv"))
    w_init = Window.orderBy("cid")
    cent0 = (c.orderBy("cid").limit(8)
             .withColumn("cl", (F.row_number().over(w_init) - 1)
                         .cast("long"))
             .select("cl", F.col("cv").alias("m")))
    rows = sorted(cent0.collect(), key=lambda r: r["cl"])
    import numpy as np

    M = np.array([r["m"] for r in rows], dtype=np.int64)
    cls = np.array([r["cl"] for r in rows], dtype=np.int64)
    mn = np.sqrt((M * M).sum(axis=1).astype(np.float64))
    rows_c = c.collect()
    V = np.array([r["cv"] for r in rows_c], dtype=np.int64)
    best = ((V @ M.T).astype(np.float64) / mn).argmax(axis=1)
    assigned = spark.createDataFrame(
        [(int(r["cid"]), list(map(int, r["cv"])), int(cls[b]))
         for r, b in zip(rows_c, best)],
        "cid long, cv array<long>, cl long")
    ref = {r["cl"]: list(r["m"])
           for r in SIM.lloyd_update(assigned, dim=64).collect()}
    assert fused == ref
