"""clean_corpus (operators/pipeline.py): the canonical stage
composition over verified pieces — ordering, column preservation,
stage accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from datahub_spark.operators import pipeline as P


def test_clean_corpus_stages_compose(spark):
    banner = "accept all cookies now ok"
    eval_text = "the secret benchmark question about turtles and rivers"
    rows = [
        # near-identical pair (minhash near-dup): keep min id
        (1, f"{banner}\nquick brown fox jumps over the lazy dog today", "web"),
        (2, f"{banner}\nquick brown fox jumps over the lazy dog tonight", "web"),
        # exact duplicate of 4 (after normalization): keep 4.
        # NOTE deliberately below the min_docs=3 boilerplate threshold:
        # a 2-copy whole-document duplicate at min_docs=2 would be
        # consumed by the boilerplate stage as a cross-doc repeated
        # segment (correctly — which is why real pipelines set the
        # boilerplate threshold above the plain-duplicate multiplicity)
        (4, "Some Decent Content with many useful words appearing here", "web"),
        (5, "some decent content with many useful words appearing here", "web"),
        # contaminated: shares an 8-gram with the benchmark; also
        # carries the banner so it reaches the min_docs=3 threshold
        (6, f"{banner}\nfiller text {eval_text} more filler text", "web"),
        # clean unique survivor
        (7, "another long and reasonably unique document body text", "wiki"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")

    out, counts = P.clean_corpus(
        df,
        boilerplate={"delimiter": "\n", "min_docs": 3},
        near_dup={"k": 12, "n": 3, "bands": 4, "rows_per_band": 3},
        benchmark=bench,
        with_counts=True,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # 1/2 near-dups -> keeper 1; 4/5 exact -> keeper 4; 6 contaminated out
    assert set(got) == {1, 4, 7}
    # the banner was cut before dedup; other columns preserved
    assert "cookies" not in got[1]["text"]
    assert got[1]["source"] == "web"
    assert set(out.columns) == {"doc_id", "text", "source"}
    # stage accounting
    assert counts["boilerplate"] == 6
    assert counts["exact_dedup"] == 5
    assert counts["near_dup"] == 4
    assert counts["decontaminate"] == 3


def test_clean_corpus_paragraph_dedup_and_ppl_stages(spark):
    common = "this exact paragraph appears in several documents verbatim"
    rows = [
        (1, f"unique opening words here\n{common}", "web"),
        (2, f"{common}\nsome fresh tail content follows", "web"),
        (3, "totally original document body with its own words", "web"),
        (4, "zq xv qqj wkp zzv mmx ppq vvk", "web"),  # gibberish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out, counts = P.clean_corpus(
        df,
        paragraph_dedup={"delimiter": "\n", "min_words": 2},
        ppl_keep={"keep": ("head", "middle"),
                  "cutoffs": (4000, 1500)},
        with_counts=True,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 1 (smallest id) keeps the shared paragraph; doc 2 loses it
    assert common in got[1]
    assert got[2] == "some fresh tail content follows"
    # gibberish doc 4: every bigram unique within itself but each w1
    # occurs once -> P(w2|w1)=1; drop instead docs under the cutoffs —
    # with these cutoffs everything familiar survives, and the stage
    # accounting proves the bucket filter ran
    assert counts["paragraph_dedup"] == 4
    assert "ppl_buckets" in counts


def test_clean_corpus_lazy_and_stageless_is_identity(spark):
    df = spark.createDataFrame([(1, "a b c", "s")],
                               "doc_id long, text string, source string")
    out = P.clean_corpus(df)
    assert out is df  # no stages enabled -> the input plan, untouched


def test_clean_corpus_quality_and_budget(spark):
    rows = [(i, "the data value is good and it has the tokens " * 3, "web")
            for i in range(40)] + \
           [(100, "x", "web")]  # one-token junk: fails the floor
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out, counts = P.clean_corpus(
        df, quality_floor_centi=4000,
        budgets={"web": 200}, with_counts=True)
    assert counts["quality_floor"] == 40
    # budget 200 of 40*30=1200 tokens -> ~1/6 keep rate
    assert 0 < counts["token_budget"] < 20
    assert 100 not in {r["doc_id"] for r in out.collect()}


def test_clean_corpus_runs_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out, counts = P.clean_corpus(
        docs,
        span_dedup={"window": 8, "min_docs": 2},
        quality_floor_centi=1000,
        near_dup={},
        with_counts=True)
    assert counts["span_dedup"] > 0
    assert counts["near_dup"] <= counts["exact_dedup"] <= counts["quality_floor"]
    assert out.count() == counts["near_dup"]
    assert set(out.columns) == set(docs.columns)


def test_clean_then_export_end_to_end(spark, tmp_path):
    """The full corpus story: clean (span dedup + quality floor +
    near-dup keeper) then write reproducible training shards — the two
    halves compose on the real documents table."""
    import os
    from datahub_spark.operators import export as EX

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cleaned = P.clean_corpus(
        docs, span_dedup={"window": 8, "min_docs": 2},
        quality_floor_centi=1000, near_dup={})
    out = str(tmp_path / "shards")
    manifest = EX.export_shards(cleaned, out, n_shards=4).collect()
    n_cleaned = cleaned.count()
    assert sum(r["n_docs"] for r in manifest) == n_cleaned > 0
    written = spark.read.parquet(out)
    assert written.select("doc_id").distinct().count() == n_cleaned
    assert os.path.isdir(os.path.join(out, "shard=0"))


def test_clean_corpus_lm_floor_and_semantic_stages(spark):
    """The r7 stages: bigram-LM gibberish floor and SemDeDup over the
    embeddings table, composed with the rest on the real corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out, counts = P.clean_corpus(
        docs,
        lm_floor={"max_novel_e4": 9990, "top_k": 100_000},
        near_dup={},
        embeddings=emb,
        semantic={"threshold_fp": int(0.93 * 10 ** 14)},
        with_counts=True)
    assert counts["lm_floor"] <= docs.count()
    assert counts["semantic"] <= counts["near_dup"]
    assert out.count() == counts["semantic"] > 0
    assert set(out.columns) == set(docs.columns)

    # semantic stage without an embeddings frame is a loud error
    import pytest
    with pytest.raises(ValueError, match="embeddings"):
        P.clean_corpus(docs, semantic={})


def test_clean_corpus_gopher_stage(spark):
    rows = [(1, "web", " ".join(["the"] * 30 + ["and"] * 30)),
            (2, "web", "way too short")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out, counts = P.clean_corpus(docs, gopher=True, with_counts=True)
    assert counts["gopher"] == 1
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_clean_corpus_dsir_stage(spark):
    rows = [(i, "web", t) for i, t in enumerate([
        "the cat sat on the mat today again",
        "stock market prices rose sharply today",
        "a cat and a dog played in the garden",
        "equity futures and bond yields moved fast",
    ])]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = spark.createDataFrame(
        [(0, "a dog and a cat sat together in the garden")],
        "doc_id long, text string")
    out, counts = P.clean_corpus(
        docs, dsir={"target": target, "n_keep": 2, "buckets": 64},
        with_counts=True)
    assert counts["dsir"] == 2
    kept = sorted(r["doc_id"] for r in out.collect())
    assert len(kept) == 2

    import pytest
    with pytest.raises(ValueError, match="target"):
        P.clean_corpus(docs, dsir={"n_keep": 2})


def test_clean_corpus_classifier_stage(spark):
    """r8 stage: the NB quality classifier trains on seed corpora
    inside the compositor and keeps the positive side."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pos = docs.filter(F.col("lang") == "en").limit(150)
    neg = docs.filter(F.col("lang") != "en").limit(150)
    out, counts = P.clean_corpus(
        docs, classifier={"positive": pos, "negative": neg,
                          "vocab_size": 2000},
        with_counts=True)
    total = docs.count()
    assert 0 < counts["classifier"] < total
    assert out.count() == counts["classifier"]
    assert set(out.columns) == set(docs.columns)

    # pre-fitted model path gives the identical survivor set
    from datahub_spark.operators import classify as CL
    model = CL.train_quality_classifier(pos, neg, vocab_size=2000)
    again = P.clean_corpus(docs, classifier={"model": model})
    assert again.count() == counts["classifier"]


def test_prepare_training_data_end_to_end(spark, tmp_path):
    """Corpus in -> cleaned, leakage-safe folds, shards on disk, pack
    manifest — the full prepare path on the real documents table."""
    import os
    from datahub_spark.operators import dedup as DD

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # near-dup pairs from the real LSH path drive the leakage guard
    sig = DD.minhash_signature(docs, k=6, n=3)
    pairs = DD.lsh_candidates(sig, bands=2, rows_per_band=3)
    out = str(tmp_path / "train_data")
    res = P.prepare_training_data(
        docs, out,
        clean={"quality_floor_centi": 1000},
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        dup_pairs=pairs,
        max_tokens=512,
        n_shards=3,
        seed=11,
    )
    # every fold written with 3 shard dirs; folds are disjoint and
    # cover the cleaned corpus
    fold_ids = {}
    for fold in ("train", "val", "test"):
        assert any(e.startswith("shard=")
                   for e in os.listdir(f"{out}/{fold}"))
        man = {r["shard"]: r["n_docs"] for r in res["folds"][fold].collect()}
        back = spark.read.parquet(f"{out}/{fold}")
        assert back.count() == sum(man.values())
        fold_ids[fold] = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert not (fold_ids["train"] & fold_ids["val"])
    assert not (fold_ids["train"] & fold_ids["test"])
    cleaned = P.clean_corpus(docs, quality_floor_centi=1000)
    assert sum(len(v) for v in fold_ids.values()) == cleaned.count()

    # leakage guard: both ends of every dup pair (that survived
    # cleaning) sit in the same fold
    alive = fold_ids["train"] | fold_ids["val"] | fold_ids["test"]
    def fold_of(i):
        return next(f for f, s in fold_ids.items() if i in s)
    leaked = [
        (r["id_a"], r["id_b"]) for r in pairs.collect()
        if r["id_a"] in alive and r["id_b"] in alive
        and fold_of(r["id_a"]) != fold_of(r["id_b"])]
    assert not leaked, leaked

    # pack manifest: covers exactly the train fold's whitespace tokens
    pk = res["packing"]
    assert pk is not None
    assert {r["doc_id"] for r in pk.select("doc_id").distinct().collect()} \
        <= fold_ids["train"]
    covered = pk.agg(F.sum(F.col("doc_to") - F.col("doc_from"))).collect()[0][0]
    from datahub_spark.operators.text import token_count_whitespace
    want = (spark.read.parquet(f"{out}/train")
            .agg(F.sum(token_count_whitespace(F.col("text")))).collect()[0][0])
    assert covered == want


def test_ingest_common_crawl_end_to_end(spark, tmp_path):
    """r15: the crawl mouth compositor — planted WET segments (with
    URL-variant duplicates) flow through read_wet -> canonicalize ->
    URL-level first-copy dedup -> stable ids -> lang, and the result
    composes straight into prepare_training_data."""
    import gzip

    from datahub_spark.operators import pipeline as PL
    from datahub_spark.operators import warc as W

    land = tmp_path / "land"
    land.mkdir()
    # two tracking-variant copies of page 1 (same canonical URL,
    # distinct record ids — the EARLIER (warc_date, record_id) wins),
    # one distinct page, one too-short page, one German page
    recs = [
        ("http://a.com/x?utm_source=tw", "the quick brown fox and the "
         "lazy dog with some words of content here", "r2"),
        ("HTTP://A.com:80/x#frag", "the quick brown fox LATER COPY "
         "that must lose the url dedup", "r1"),
        ("https://b.org/y", "and another page with its own words that "
         "is kept as the only copy", "r9"),
        ("https://c.net/tiny", "x", "r5"),
        ("https://d.de/s", "der und die das ist ein text mit der und "
         "das und die wörter", "r7"),
    ]
    # r1 sorts before r2 but carries a LATER warc_date -> r2 must win
    payload = b"".join(
        gzip.compress(W.wet_record_bytes(
            u, t, rid,
            date=("2024-02-02T00:00:00Z" if rid == "r1"
                  else "2024-01-01T00:00:00Z")))
        for u, t, rid in recs)
    (land / "seg0.warc.wet.gz").write_bytes(payload)

    corpus = PL.ingest_common_crawl(spark, str(land), min_chars=10)
    rows = {r["url"]: r for r in corpus.collect()}
    assert set(rows) == {"http://a.com/x", "https://b.org/y",
                         "https://d.de/s"}  # variants collapsed, tiny dropped
    a = rows["http://a.com/x"]
    assert a["record_id"] == "<urn:uuid:r2>"  # earlier date wins, not min id
    assert "LATER COPY" not in a["text"]
    assert a["n_chars"] == len(a["text"]) and a["doc_id"] is not None
    assert rows["https://d.de/s"]["lang"] == "de"
    assert rows["https://b.org/y"]["lang"] == "en"
    # distinct stable ids, reproducible across a re-read
    ids = sorted(r["doc_id"] for r in rows.values())
    assert len(set(ids)) == 3
    again = sorted(r["doc_id"] for r in
                   PL.ingest_common_crawl(spark, str(land),
                                          min_chars=10).collect())
    assert again == ids

    # and the shape composes straight into the training-artifact tail
    out = str(tmp_path / "out")
    res = PL.prepare_training_data(
        corpus, out, n_shards=2, splits={"train": 1.0})
    total = sum(r["n_docs"] for r in res["folds"]["train"].collect())
    assert total == 3
