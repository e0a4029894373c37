"""DSIR importance resampling (operators/dsir.py) vs a pure-python
reference model — md5-derived buckets and Gumbel noise make every
number reproducible driver-side."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from datahub_spark.operators import dsir as DS


def _norm(t):
    return " ".join(t.lower().split())


def _bigram_buckets(text, buckets):
    w = _norm(text).split(" ")
    grams = [f"{a} {b}" for a, b in zip(w, w[1:])] if len(w) >= 2 else []
    return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets
            for g in grams]


def _model_weights(raw_texts, target_texts, buckets=64, alpha=1.0):
    tc, rc = {}, {}
    t_total = r_total = 0
    for t in target_texts:
        for b in _bigram_buckets(t, buckets):
            tc[b] = tc.get(b, 0) + 1
            t_total += 1
    for t in raw_texts:
        for b in _bigram_buckets(t, buckets):
            rc[b] = rc.get(b, 0) + 1
            r_total += 1
    t_den, r_den = t_total + alpha * buckets, r_total + alpha * buckets
    out = {}
    for i, t in enumerate(raw_texts):
        w = 0.0
        for b in _bigram_buckets(t, buckets):
            w += (math.log((tc.get(b, 0) + alpha) / t_den)
                  - math.log((rc.get(b, 0) + alpha) / r_den))
        out[i] = w
    return out


RAW = [
    "the cat sat on the mat",
    "stock market prices rose sharply today",
    "the dog sat on the log",
    "equity futures and bond yields moved",
    "a cat and a dog played",
    "interest rates and market indexes",
]
TARGET = [
    "the cat chased the dog",
    "a dog and a cat sat together",
]


def _raw_df(spark):
    return spark.createDataFrame(list(enumerate(RAW)),
                                 "doc_id long, text string")


def test_dsir_weights_match_python_model(spark):
    raw = _raw_df(spark)
    target = spark.createDataFrame(list(enumerate(TARGET)),
                                   "doc_id long, text string")
    got = {r["id"]: r["weight"] for r in
           DS.dsir_weights(raw, target, buckets=64).collect()}
    want = _model_weights(RAW, TARGET, buckets=64)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9)
    # per-ngram (length-normalized) log-ratio: animal docs look more
    # like the target than finance docs (raw sums are length-dependent
    # by design — the paper's bag-of-ngrams likelihood)
    def per_gram(i):
        return got[i] / max(1, len(_bigram_buckets(RAW[i], 64)))

    pg = {i: per_gram(i) for i in got}
    # the doc sharing 3 of its 5 bigrams with the target ranks top;
    # the pure-finance doc ranks bottom
    assert max(pg, key=pg.get) == 4
    assert min(pg, key=pg.get) == 3


def test_dsir_resample_deterministic_topk(spark):
    raw = _raw_df(spark)
    target = spark.createDataFrame(list(enumerate(TARGET)),
                                   "doc_id long, text string")
    weights = DS.dsir_weights(raw, target, buckets=64)
    a = sorted(r["doc_id"] for r in
               DS.dsir_resample(raw, weights, 3, seed=7).collect())
    b = sorted(r["doc_id"] for r in
               DS.dsir_resample(raw, weights, 3, seed=7).collect())
    assert a == b and len(a) == 3
    # matches the python model's gumbel-top-k exactly
    want_w = _model_weights(RAW, TARGET, buckets=64)

    def gumbel(i, seed):
        h = int(hashlib.md5(f"{i}|{seed}".encode()).hexdigest()[:15], 16)
        u = (float(h) + 0.5) / float(1 << 60)
        return -math.log(-math.log(u))

    keys = {i: want_w[i] + gumbel(i, 7) for i in want_w}
    want = sorted(sorted(keys, key=lambda i: (-keys[i], i))[:3])
    assert a == want


def test_dsir_empty_docs_weigh_zero(spark):
    raw = spark.createDataFrame([(1, "single"), (2, "")],
                                "doc_id long, text string")
    target = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = {r["id"]: r["weight"] for r in
           DS.dsir_weights(raw, target, buckets=16).collect()}
    assert got[1] == 0.0 and got[2] == 0.0  # no bigrams -> 0


def test_dsir_trigram_features_and_short_docs(spark):
    """n=3 path (transform-over-sequence) matches the python model and
    survives docs shorter than n (the non-lazy CASE-branch guard)."""
    def tri_buckets(text, buckets):
        w = _norm(text).split(" ")
        grams = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)] \
            if len(w) >= 3 else []
        return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets
                for g in grams]

    texts = ["one two three four", "ab", "", "x y z"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    target = spark.createDataFrame([(0, "one two three")],
                                   "doc_id long, text string")
    got = {r["id"]: r["weight"] for r in
           DS.dsir_weights(df, target, n=3, buckets=32).collect()}
    assert got[1] == 0.0 and got[2] == 0.0  # short docs weigh zero
    assert got[0] > got[3]  # target trigram present in doc 0 only
