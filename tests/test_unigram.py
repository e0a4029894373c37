"""Unigram-LM tokenizer (operators/unigram.py): seeding, hard-EM
training, Viterbi encoding — exact known-value checks + invariants."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datahub_spark.operators import unigram as U


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_counts_exact(spark):
    df = _docs(spark, [(1, "ab ab b")])
    vocab = U._word_vocab(df, "text")
    got = {r["piece"]: r["cnt"] for r in
           U._substring_counts(vocab, 2).collect()}
    # "ab" (n=2): substrings a, b, ab each once per occurrence -> 2;
    # "b" (n=1): b -> 1 more
    assert got == {"a": 2, "b": 3, "ab": 2}


def test_viterbi_prefers_frequent_long_pieces():
    logp = {"ab": math.log(0.5), "a": math.log(0.25), "b": math.log(0.25)}
    assert U._viterbi("abab", logp, 2, -50.0) == ["ab", "ab"]
    # unknown char admitted at the unk penalty, never dropped
    assert U._viterbi("axb", logp, 2, -50.0) == ["a", "x", "b"]


def test_train_unigram_learns_frequent_words_as_pieces(spark):
    rows = [(i, "hello world hello") for i in range(20)] + \
           [(100, "held worn")]
    model = U.train_unigram(_docs(spark, rows), vocab_size=40,
                            max_piece_len=5, em_rounds=2)
    pieces = {m["piece"] for m in model}
    # the dominant whole words fit max_piece_len and earn a slot
    assert "hello" in pieces and "world" in pieces
    # every single character survives pruning (encodability guarantee)
    chars = set("helloworldheldworn")
    assert chars <= pieces
    # model is sorted by falling count with deterministic ties
    counts = [m["count"] for m in model]
    assert counts == sorted(counts, reverse=True)
    # log-probs normalize over max(count,1)
    assert all(m["logprob"] < 0 for m in model)


def test_encode_unigram_concatenation_and_counts(spark):
    corpus = _docs(spark, [(i, "banana band ana") for i in range(10)])
    model = U.train_unigram(corpus, vocab_size=30, max_piece_len=3,
                            em_rounds=2)
    out = U.encode_unigram(corpus, model).collect()
    for r in out:
        assert "".join(r["tokens"]) == "bananabandana"
        assert r["n_tokens"] == len(r["tokens"])
    # deterministic: retraining + re-encoding yields identical output
    model2 = U.train_unigram(corpus, vocab_size=30, max_piece_len=3,
                             em_rounds=2)
    assert model == model2


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=8),
                min_size=1, max_size=6))
def test_viterbi_concatenation_invariant(words_):
    # any model over the alphabet reconstructs every word exactly
    logp = {"a": -2.0, "b": -2.0, "c": -2.0, "d": -2.0,
            "ab": -1.5, "cd": -1.5, "abc": -1.0}
    for w in words_:
        segs = U._viterbi(w, logp, 3, -50.0)
        assert "".join(segs) == w


def test_unigram_on_documents_table_composes(spark):
    from datahub_spark.operators import text as TX

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    model = U.train_unigram(docs, vocab_size=300, max_piece_len=4,
                            em_rounds=1)
    assert 0 < len(model) and len({m["piece"] for m in model}) == len(model)
    enc = U.encode_unigram(docs, model)
    n = enc.agg(F.sum("n_tokens")).collect()[0][0]
    assert n > 0
    # n_tokens frame prices token budgets in real unigram tokens
    out = TX.sample_to_token_budget(
        docs, "source", {"web": int(n)}, token_counts=enc,
        default_rate=1.0)
    assert out.count() > 0
    # vocab table: <unk>=0, ids contiguous and deterministic
    vocab = U.unigram_vocab(model)
    assert vocab["<unk>"] == 0
    assert sorted(vocab.values()) == list(range(len(vocab)))
