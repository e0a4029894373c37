"""Text analysis operators: exact known-value checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datahub_spark.operators import text as TX


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize_and_token_counts(spark):
    df = _docs(spark, [(1, "  Héllo,   WORLD!  x2 ")])
    out = df.select(
        TX.normalize(F.col("text")).alias("n"),
        TX.token_count_whitespace(F.col("text")).alias("ws"),
        TX.token_count_bpe_ish(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert out["n"] == "héllo, world! x2"
    assert out["ws"] == 3
    # bpe-ish: h llo , world ! x 2  (é is non-[a-z] -> own token)
    assert out["bpe"] == 8


def test_lang_id_markers(spark):
    df = _docs(spark, [
        (1, "the cat and the dog is happy"),
        (2, "der Hund ist nicht da und der Mann"),
        (3, "le chat est dans la maison et les chiens"),
        (4, "xyzzy plugh"),
    ])
    out = {r["doc_id"]: r["lang_pred"] for r in TX.lang_id_table(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_features_exact_fixed_point(spark):
    # 10 tokens ("a" = stopword hit), no punctuation, text len 39
    text = "a bb cc dd ee ff gg hh ii jj"
    df = _docs(spark, [(1, text)])
    r = TX.quality_features(df).collect()[0]
    assert r["n_tokens"] == 10
    assert r["stopword_hits"] == 1
    assert r["n_punct"] == 0
    # mean token len = 19 chars / 10 tokens = 1.9 -> 19000
    assert r["mean_token_len_e4"] == 19000
    # score = min(10/50,1)*40 + min(5*1/10,1)*30 + 30 = 8 + 15 + 30 = 53
    assert r["quality_score_centi"] == 5300


def test_quality_score_half_tie_rounds_up(spark):
    # engineered 64.975 tie: 32 tokens, 2 stopword hits, 0 punct.
    # NOTE: the stopwords must be non-adjacent — " a a " counts as ONE
    # occurrence under non-overlapping replace (identically in DuckDB).
    toks = ["a"] + [f"w{i}" for i in range(15)] + ["a"] + [f"w{i}" for i in range(15, 30)]
    df = _docs(spark, [(1, " ".join(toks))])
    r = TX.quality_features(df).collect()[0]
    assert r["stopword_hits"] == 2
    # 25.6 + 150*2/32 (=9.375) + 30 = 64.975 -> half-up 6498
    assert r["quality_score_centi"] == 6498


def test_fingerprint_is_normalization_invariant(spark):
    df = _docs(spark, [(1, "Some  TEXT here"), (2, "some text HERE")])
    fps = [r["fp"] for r in df.select(TX.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_pii_scrub_redacts_all_kinds(spark):
    df = _docs(spark, [(1, "mail a@b.io or visit https://x.y/z or call +1 (555) 123-4567 now")])
    r = TX.pii_scrub(df).collect()[0]
    assert (r["n_email"], r["n_url"], r["n_phone"]) == (1, 1, 1)
    assert r["scrubbed"] == "mail <EMAIL> or visit <URL> or call <PHONE> now"


def test_stratified_sample_deterministic_and_stable_under_growth(spark):
    rows = [(i, f"doc {i}", "hi" if i % 3 == 0 else ("mid" if i % 3 == 1 else "lo"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, q string")
    rates = {"hi": 1.0, "mid": 0.1, "lo": 0.0}
    kept = TX.stratified_sample(df, "q", rates).select("doc_id", "q")
    got = {r["doc_id"]: r["q"] for r in kept.collect()}
    # exact strata behavior at the extremes
    assert sum(1 for q in got.values() if q == "hi") == 1000
    assert sum(1 for q in got.values() if q == "lo") == 0
    # mid keeps ~10% (hash-uniform; generous bounds for n=1000)
    n_mid = sum(1 for q in got.values() if q == "mid")
    assert 50 <= n_mid <= 180
    # deterministic: identical on re-run
    again = {r["doc_id"] for r in kept.collect()}
    assert again == set(got)
    # stable under growth: adding documents never flips existing picks
    bigger = spark.createDataFrame(
        rows + [(i, f"new {i}", "mid") for i in range(3000, 4000)],
        "doc_id long, text string, q string")
    grown = {r["doc_id"] for r in
             TX.stratified_sample(bigger, "q", rates).collect()
             if r["doc_id"] < 3000}
    assert grown == set(got)
    # unknown stratum uses default_rate
    extra = spark.createDataFrame([(9999, "x", "unknown")],
                                  "doc_id long, text string, q string")
    assert TX.stratified_sample(extra, "q", rates,
                                default_rate=1.0).count() == 1
    assert TX.stratified_sample(extra, "q", rates).count() == 0


def test_stratified_sample_md5_method_portable(spark):
    # the engine-portable md5 fixed-point method: same guarantees
    # (extremes exact, deterministic, stable under growth), different
    # hash family — and the 60-bit value must equal what any engine
    # computes from the digest prefix
    rows = [(i, f"doc {i}", "hi" if i % 2 == 0 else "mid")
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, q string")
    rates = {"hi": 1.0, "mid": 0.25}
    kept = TX.stratified_sample(df, "q", rates, seed=7, method="md5")
    got = {r["doc_id"] for r in kept.collect()}
    assert sum(1 for i in got if i % 2 == 0) == 1000
    n_mid = sum(1 for i in got if i % 2 == 1)
    assert 180 <= n_mid <= 330
    # cross-check the keep rule against pure-Python md5 (the portable
    # fixed-point contract the DuckDB oracle relies on)
    import hashlib
    for i in (1, 3, 5, 7, 9, 11, 13, 15):
        h = int(hashlib.md5(f"{i}:7".encode()).hexdigest()[:15], 16)
        assert (i in got) == (h < int(0.25 * (1 << 60)))
    with pytest.raises(ValueError, match="unknown method"):
        TX.stratified_sample(df, "q", rates, method="sha9000")
