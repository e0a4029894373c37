"""Contrastive pair mining: planted near-dups become positives, hard
negatives are close-but-not-positive, determinism."""

from __future__ import annotations

import numpy as np

from datahub_spark.operators import mining as MN


def _corpus(spark, n=30, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    # plant near-dup pairs (0,1) and (10,11): same text AND same vector
    v[1] = v[0] + rng.standard_normal(dim) * 0.01
    v[11] = v[10] + rng.standard_normal(dim) * 0.01
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    texts = [f"unique document number {i} about topic {i * 7}" for i in range(n)]
    texts[1] = texts[0]
    texts[11] = texts[10]
    docs = spark.createDataFrame(
        [(i, texts[i]) for i in range(n)], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, v[i].astype(float).tolist()) for i in range(n)],
        "vec_id long, embedding array<float>")
    return docs, emb


def test_mine_contrastive_pairs(spark):
    docs, emb = _corpus(spark)
    out = MN.mine_contrastive_pairs(docs, emb, k_neg=3, dim=8)
    rows = out.collect()
    got = {(r["anchor_id"], r["positive_id"]): list(r["negative_ids"])
           for r in rows}
    # both planted pairs surface, in both directions
    assert {(0, 1), (1, 0), (10, 11), (11, 10)} <= set(got)
    for (a, p), negs in got.items():
        assert a != p
        assert a not in negs and p not in negs   # no self/positive leak
        assert len(negs) <= 3
        assert negs == sorted(negs)
    # deterministic across runs
    again = {(r["anchor_id"], r["positive_id"]): list(r["negative_ids"])
             for r in MN.mine_contrastive_pairs(docs, emb, k_neg=3,
                                                dim=8).collect()}
    assert again == got
