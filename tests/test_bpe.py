"""BPE training + encoding (operators/bpe.py) — checked against a pure
python reference implementation of Sennrich-style BPE on the same
corpus, and on the classic low/lower/newest example."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datahub_spark.operators import bpe as B


def _train_model(texts, n_merges, min_pair_count=2):
    """Driver-side reference BPE (dict-of-words), same tie-breaks."""
    vocab = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    vocab = {tuple(list(w) + [B.END]): n for w, n in vocab.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = \
                    pairs.get((syms[i], syms[i + 1]), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), cnt = best
        merges.append({"a": a, "b": b, "merged": a + b, "count": cnt})
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def test_train_bpe_matches_reference_model(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)),
                               "doc_id long, text string")
    got = B.train_bpe(df, n_merges=12)
    want = _train_model(CORPUS, 12)
    assert got == want
    # the classic result: 'est</w>' and 'low' become units early
    merged = [m["merged"] for m in got]
    assert any("est" in m for m in merged)
    assert "low" in merged


def test_train_bpe_early_stop(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # every word is a single char + END; pairs occur once each
    got = B.train_bpe(df, n_merges=10, min_pair_count=2)
    assert got == []


def test_encode_bpe_roundtrip_and_counts(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)),
                               "doc_id long, text string")
    merges = B.train_bpe(df, n_merges=12)
    enc = {r["id"]: r for r in B.encode_bpe(df, merges).collect()}
    for i, text in enumerate(CORPUS):
        toks = enc[i]["tokens"]
        assert enc[i]["n_tokens"] == len(toks)
        # tokens reassemble to the normalized words exactly
        rebuilt = "".join(toks).replace(B.END, " ").strip()
        assert rebuilt == " ".join(text.lower().split())
    # with no merges, tokens are raw characters
    enc0 = B.encode_bpe(df, [], text_col="text").collect()[0]
    assert all(len(t) == 1 or t == B.END for t in enc0["tokens"])


def test_encode_applies_rank_order_not_list_order(spark):
    """Encoding must pick the LOWEST-rank applicable merge each step
    (the BPE contract), not scan the table in arbitrary order."""
    df = spark.createDataFrame([(1, "abc abc")], "doc_id long, text string")
    merges = B.train_bpe(df, n_merges=5)
    enc = B.encode_bpe(df, merges).collect()[0]
    # fully merged into one token after enough merges
    assert enc["tokens"] == ["abc" + B.END, "abc" + B.END]


def test_train_bpe_property_random_corpora(spark):
    """Hypothesis: the distributed trainer equals the pure-python
    reference on arbitrary small corpora (tie-breaks included)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["ab", "abc", "aab", "ba", "bab", "cc"])
    doc = st.lists(word, min_size=1, max_size=5).map(" ".join)

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(doc, min_size=1, max_size=6))
    def inner(texts):
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id long, text string")
        assert B.train_bpe(df, n_merges=4) == _train_model(texts, 4)

    inner()


def test_bpe_vocab_and_id_encoding(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)),
                               "doc_id long, text string")
    merges = B.train_bpe(df, n_merges=8)
    vocab = B.bpe_vocab(df, merges)
    assert vocab["<unk>"] == 0
    # chars before merges, merges in rank order
    ranks = [vocab[m["merged"]] for m in merges]
    assert ranks == sorted(ranks)
    enc = {r["id"]: r for r in B.encode_bpe_ids(df, merges, vocab).collect()}
    toks = {r["id"]: r for r in B.encode_bpe(df, merges).collect()}
    inv = {v: k for k, v in vocab.items()}
    for i in enc:
        assert [inv[t] for t in enc[i]["token_ids"]] == toks[i]["tokens"]
        assert 0 not in enc[i]["token_ids"]  # nothing unknown in-corpus
    # unseen character maps to <unk>
    odd = spark.createDataFrame([(9, "low λ")], "doc_id long, text string")
    out = B.encode_bpe_ids(odd, merges, vocab).collect()[0]
    assert 0 in out["token_ids"]


def test_tokenize_then_export_shards_end_to_end(spark, tmp_path):
    """The full training-prep endpoint: BPE-tokenize the corpus to ids,
    export reproducible shards, read back intact."""
    from datahub_spark.operators import export as EX

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(100)
    merges = B.train_bpe(docs, n_merges=6)
    vocab = B.bpe_vocab(docs, merges)
    ids = B.encode_bpe_ids(docs, merges, vocab) \
        .withColumnRenamed("id", "doc_id")
    out = str(tmp_path / "tok_shards")
    manifest = EX.export_shards(ids, out, n_shards=3,
                                token_count_col="n_tokens").collect()
    assert sum(r["n_docs"] for r in manifest) == 100
    back = spark.read.parquet(out)
    assert back.count() == 100
    row = back.filter(F.col("doc_id") == ids.first()["doc_id"]).first()
    assert len(row["token_ids"]) == row["n_tokens"] > 0
