"""End-to-end corpus cleaning pipeline: the canonical composition of
the verified operators, in the order production training-data pipelines
apply them (C4/Pile/CCNet-style):

  1. boilerplate removal   (cross-doc repeated segments cut)
  1b. paragraph dedup      (global first-copy-wins paragraph removal,
                            the Dolma stage, r8)
  2. exact-substring span removal (cross-doc duplicated spans cut)
  3. quality floor         (drop low-scoring documents)
  3b. Gopher rule set      (Rae et al. 2021 hard filters, r7)
  3c. quality classifier   (trained NB model keeps positive-side docs,
                            the GPT-3/CCNet classifier stage, r8)
  4. bigram-LM floor       (drop gibberish: high novel-bigram ratio /
                            low conditional familiarity, r7)
  4b. CCNet bucket keep    (head/middle/tail perplexity tertiles,
                            keep the named buckets, r8)
  5. exact dedup           (keep one copy per content digest)
  6. near-dup cluster keeper (MinHash+LSH -> connected components ->
                              keep each cluster's min-id representative)
  7. semantic dedup        (SemDeDup over an embedding table, r7)
  8. benchmark decontamination (drop eval-overlapping documents)
  8b. DSIR domain selection (importance-resample toward a target, r7)
  9. token-budget mixing   (per-domain deterministic downsampling)

Every stage is optional and independently tested elsewhere; this module
only owns the composition and the stage accounting. The whole pipeline
stays lazy — one DataFrame in, one out — so Catalyst sees a single
plan; ``with_counts=True`` additionally materializes per-stage
survivor counts (one count() action per enabled stage, for audit runs,
not production).

Requires the corpus id column to be named ``doc_id`` (the quality and
dedup operators' contract, matching the documents table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datahub_spark.operators import dedup as DD
from datahub_spark.operators import text as TX


def _replace_text(cur: DataFrame, rewritten: DataFrame, id_col: str,
                  text_col: str, out_id: str, out_text: str) -> DataFrame:
    """Swap the text column for a rewrite stage's output, preserving
    every other column; documents rewritten to empty are dropped."""
    rw = rewritten.select(F.col(out_id).alias(id_col),
                          F.col(out_text).alias(text_col))
    return (cur.drop(text_col).join(rw, id_col)
            .filter(F.trim(F.col(text_col)) != ""))


def clean_corpus(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", *,
                 boilerplate: dict | None = None,
                 paragraph_dedup: dict | None = None,
                 span_dedup: dict | None = None,
                 quality_floor_centi: int | None = None,
                 gopher: bool = False,
                 classifier: dict | None = None,
                 lm_floor: dict | None = None,
                 ppl_keep: dict | None = None,
                 near_dup: dict | None = None,
                 embeddings: DataFrame | None = None,
                 semantic: dict | None = None,
                 benchmark: DataFrame | None = None,
                 decontaminate_n: int = 8,
                 budgets: dict | None = None,
                 dsir: dict | None = None,
                 strata_col: str = "source",
                 seed: int = 42,
                 with_counts: bool = False):
    """Run the enabled stages in canonical order; returns the cleaned
    DataFrame (same columns as the input), or ``(df, counts)`` with
    ``with_counts=True`` where counts maps stage name -> surviving
    document count after that stage.

    Stage parameters pass through to the underlying operators:
    ``boilerplate={"delimiter": "\\n", "min_docs": 3}`` or
    ``{"window": 20, ...}``; ``span_dedup={"window": 16, "min_docs":
    2}``; ``near_dup={"k": 12, "n": 3, "bands": 4, "rows_per_band":
    3}``; ``budgets={"web": 10_000_000, ...}`` over ``strata_col``;
    ``lm_floor={"max_novel_e4": 9500, "min_familiarity_e4": 0,
    "top_k": 50000}`` (bigram/unigram tables trained on the current
    survivors, top_k-bounded so the lookups broadcast);
    ``semantic={"threshold_fp": int(0.95e14), "n_clusters": 16}`` with
    ``embeddings`` a (vec_id, embedding) frame whose ids are doc ids —
    docs without an embedding pass through untouched."""
    counts: dict[str, int] = {}
    cur = df

    def note(stage: str) -> None:
        if with_counts:
            counts[stage] = cur.count()

    if boilerplate is not None:
        rw = TX.remove_boilerplate(cur, text_col, id_col, **boilerplate)
        cur = _replace_text(cur, rw, id_col, text_col, id_col, "clean_text")
        note("boilerplate")
    if paragraph_dedup is not None:
        # global first-copy-wins paragraph dedup (Dolma order: right
        # after boilerplate, before span-level rewriting)
        rw = TX.paragraph_dedup(cur, text_col, id_col, **paragraph_dedup)
        cur = _replace_text(cur, rw, id_col, text_col, id_col, "clean_text")
        note("paragraph_dedup")
    if span_dedup is not None:
        rw = DD.remove_duplicate_substrings(
            cur, id_col=id_col, text_col=text_col, **span_dedup)
        cur = _replace_text(cur, rw, id_col, text_col, "id", "clean_text")
        note("span_dedup")
    if quality_floor_centi is not None:
        scored = TX.quality_features(cur, text_col) \
            .filter(F.col("quality_score_centi") >= int(quality_floor_centi)) \
            .select(id_col)
        cur = cur.join(scored, id_col)
        note("quality_floor")
    if gopher:
        keep = TX.gopher_rules(cur, text_col, id_col) \
            .filter(F.col("passes_gopher")).select(id_col)
        cur = cur.join(keep, id_col)
        note("gopher")
    if classifier is not None:
        # model-based quality floor (classify.py): pass a fitted
        # ``model`` LLR table, or ``positive``/``negative`` seed frames
        # to train one here
        from datahub_spark.operators import classify as CL
        model = classifier.get("model")
        if model is None:
            model = CL.train_quality_classifier(
                classifier["positive"], classifier["negative"],
                text_col=text_col,
                vocab_size=classifier.get("vocab_size", 50_000),
                alpha=classifier.get("alpha", 1))
        cur = CL.classifier_filter(
            cur, model, text_col=text_col, id_col=id_col,
            prior_e4=classifier.get("prior_e4", 0),
            threshold_e4=classifier.get("threshold_e4", 0))
        note("classifier")
    if lm_floor is not None:
        top_k = lm_floor.get("top_k", 50_000)
        bt = TX.build_bigram_table(cur, text_col, top_k=top_k)
        vocab = TX.build_vocabulary(cur, text_col, top_k=top_k)
        feats = TX.bigram_lm_features(cur, bt, vocab,
                                      text_col=text_col, id_col=id_col)
        keep = feats.filter(
            (F.col("novel_ratio_e4") <= int(lm_floor.get("max_novel_e4", 10_000)))
            & (F.col("cond_familiarity_e4")
               >= int(lm_floor.get("min_familiarity_e4", 0)))
        ).select(F.col("id").alias(id_col))
        cur = cur.join(keep, id_col)
        note("lm_floor")
    if ppl_keep is not None:
        # CCNet head/middle/tail selection (Wenzek et al. 2020): keep
        # the named buckets; per-group cutoffs via ``by`` (CCNet does
        # per-language), or precomputed ``cutoffs`` for reproducibility
        pb = TX.perplexity_buckets(
            cur, text_col=text_col, id_col=id_col,
            by=ppl_keep.get("by"), cutoffs=ppl_keep.get("cutoffs"))
        keep = pb.filter(F.col("bucket").isin(
            list(ppl_keep.get("keep", ("head", "middle"))))) \
            .select(F.col("id").alias(id_col))
        cur = cur.join(keep, id_col)
        note("ppl_buckets")
    # exact dedup always precedes near-dup when either dedup runs:
    # identical copies would otherwise bloat LSH buckets for nothing
    if near_dup is not None:
        keepers = DD.dedup_exact(cur, text_col, id_col) \
            .select(F.col("keeper").alias(id_col))
        cur = cur.join(keepers, id_col)
        note("exact_dedup")
        sig = DD.minhash_signature(
            cur, k=near_dup.get("k", 12), n=near_dup.get("n", 3),
            text_col=text_col, id_col=id_col)
        pairs = DD.lsh_candidates(
            sig, bands=near_dup.get("bands", 4),
            rows_per_band=near_dup.get("rows_per_band", 3), id_col=id_col)
        labels = DD.connected_components(pairs)
        # min-label CC: the component label IS the cluster's min id, so
        # non-representatives are exactly the rows where label != id
        losers = labels.filter(F.col("component") != F.col("id")) \
            .select(F.col("id").alias(id_col))
        cur = cur.join(losers, id_col, "left_anti")
        note("near_dup")
    if semantic is not None:
        if embeddings is None:
            raise ValueError("semantic stage needs an embeddings frame")
        sd = DD.semantic_dedup(
            embeddings,
            threshold_fp=semantic.get("threshold_fp", int(0.95 * 10 ** 14)),
            n_clusters=semantic.get("n_clusters", 16),
            lloyd_rounds=semantic.get("lloyd_rounds", 2),
            dim=semantic.get("dim", 64))
        # anti-join on the pruned ids: docs without an embedding pass
        # through untouched (the embedding table may cover a subset)
        pruned = sd.filter(~F.col("keep")) \
            .select(F.col("vec_id").alias(id_col))
        cur = cur.join(pruned, id_col, "left_anti")
        note("semantic")
    if benchmark is not None:
        flags = DD.decontaminate(cur, benchmark, n=decontaminate_n,
                                 id_col=id_col, text_col=text_col)
        clean_ids = flags.filter(~F.col("contaminated")) \
            .select(F.col("id").alias(id_col))
        cur = cur.join(clean_ids, id_col)
        note("decontaminate")
    if dsir is not None:
        # domain-matched selection (Xie et al. 2023): weight survivors
        # against the target corpus, keep the Gumbel-top-k
        from datahub_spark.operators import dsir as DS
        target = dsir.get("target")
        if target is None:
            raise ValueError("dsir stage needs a target corpus frame")
        w = DS.dsir_weights(cur, target, text_col=text_col, id_col=id_col,
                            n=dsir.get("n", 2),
                            buckets=dsir.get("buckets", 10_000),
                            alpha=dsir.get("alpha", 1.0))
        cur = DS.dsir_resample(cur, w, dsir["n_keep"], id_col=id_col,
                               seed=seed,
                               temperature=dsir.get("temperature", 1.0))
        note("dsir")
    if budgets is not None:
        cur = TX.sample_to_token_budget(
            cur, strata_col, budgets, id_col=id_col, text_col=text_col,
            seed=seed)
        note("token_budget")
    return (cur, counts) if with_counts else cur


def prepare_training_data(df: DataFrame, out_dir: str, *,
                          clean: dict | None = None,
                          splits: dict[str, float] | None = None,
                          dup_pairs: DataFrame | None = None,
                          max_tokens: int | None = None,
                          count_col: str | None = None,
                          n_shards: int = 8,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          seed: int = 42):
    """The whole pipeline, corpus in -> training artifacts out:

      1. clean_corpus (all its stages, pass-through config),
      2. leakage-safe train/val/test fold assignment — when
         ``dup_pairs`` is given (any candidate-pair frame), duplicate
         clusters travel whole via split_by_duplicate_cluster,
      3. per-fold reproducible shard export under
         ``out_dir/<fold>/shard=K/``,
      4. optionally a sequence-packing manifest for the TRAIN fold at
         ``out_dir/pack_manifest`` (``max_tokens`` set; ``count_col``
         carries real tokenizer counts, e.g. bpe.token_counts output
         joined on, else the whitespace proxy).

    Returns ``{"folds": {name: shard-manifest DataFrame}, "packing":
    manifest-DataFrame-or-None, "out_dir": out_dir}``. Every stage is
    the already-tested operator; this function owns only the
    composition, like clean_corpus itself (its model: one lazy plan per
    fold, writes are the only actions)."""
    from datahub_spark.operators import export as EX

    cur = clean_corpus(df, text_col=text_col, id_col=id_col, seed=seed,
                       **(clean or {}))
    fr = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    if dup_pairs is not None:
        folded = TX.split_by_duplicate_cluster(
            cur, dup_pairs, fr, id_col=id_col, seed=seed)
    else:
        folded = TX.assign_splits(cur, fr, id_col=id_col, seed=seed)
    manifests = {}
    for fold in fr:
        part = folded.filter(F.col("split") == fold).drop("split")
        manifests[fold] = EX.export_shards(
            part, f"{out_dir}/{fold}", n_shards,
            id_col=id_col, text_col=text_col, seed=seed,
            token_count_col=count_col)
    packing = None
    if max_tokens is not None:
        train = folded.filter(F.col("split") == "train")
        packing = EX.pack_sequences(train, max_tokens, id_col=id_col,
                                    count_col=count_col, text_col=text_col)
        packing.write.mode("overwrite").parquet(f"{out_dir}/pack_manifest")
        packing = df.sparkSession.read.parquet(f"{out_dir}/pack_manifest")
    return {"folds": manifests, "packing": packing, "out_dir": out_dir}


def ingest_common_crawl(spark, path: str, *, source: str = "wet",
                        glob: str | None = None, lenient: bool = True,
                        statuses=(200,), url_dedup: bool = True,
                        min_chars: int = 1, with_lang: bool = True
                        ) -> DataFrame:
    """The crawl mouth as ONE composition (r15): a WARC/WET landing
    dir in, a documents-table-shaped corpus frame out — so
    clean_corpus / prepare_training_data compose on real Common Crawl
    input exactly as they do on the curated documents table.

      1. read_wet (source='wet') or extract_warc_text
         (source='warc': byte-level HTTP parse + rules HTML
         extraction, 200-only by default) — file-parallel, lenient by
         default (a corrupt record/member costs itself, the crawl
         ingestion posture);
      2. URL canonicalization (text.canonicalize_url — tracking
         params, default ports, fragments, case);
      3. URL-level first-copy dedup: one row per canonical URL,
         deterministic winner = min (warc_date, record_id) — the
         dedup step crawl pipelines run BEFORE content dedup, one
         keyed shuffle;
      4. stable ids: doc_id = xxhash64(record_id) (content-
         independent, reproducible across re-reads), n_chars, and
         optionally the marker-frequency lang prediction.

    Returns (doc_id, record_id, url, lang, n_chars, text). Every
    stage is an already-tested operator; this owns only composition,
    one lazy plan (plus lang's staged projections when enabled)."""
    from datahub_spark.operators import warc as WC

    if source == "wet":
        raw = WC.read_wet(spark, path, glob=glob, lenient=lenient)
    elif source == "warc":
        raw = WC.extract_warc_text(spark, path, glob=glob,
                                   lenient=lenient, statuses=statuses)
    else:
        raise ValueError(
            f"ingest_common_crawl: source must be 'wet' or 'warc', "
            f"got {source!r}")
    cur = (raw.filter(F.col("text").isNotNull())
           .withColumn("url", TX.canonicalize_url(F.col("url"))))
    if min_chars:
        cur = cur.filter(F.length("text") >= int(min_chars))
    if url_dedup:
        keep = F.min_by(
            F.struct("record_id", "warc_date", "text"),
            F.struct("warc_date", "record_id")).alias("_k")
        cur = (cur.groupBy("url").agg(keep)
               .select("url", F.col("_k.record_id").alias("record_id"),
                       F.col("_k.text").alias("text")))
    else:
        cur = cur.select("url", "record_id", "text")
    cur = (cur.withColumn("doc_id", F.xxhash64("record_id"))
           .withColumn("n_chars", F.length("text").cast("long")))
    if with_lang:
        lang = TX.lang_id_table(cur, text_col="text", id_col="doc_id") \
            .withColumnRenamed("lang_pred", "lang")
        cur = cur.join(lang, "doc_id")
    else:
        cur = cur.withColumn("lang", F.lit(None).cast("string"))
    return cur.select("doc_id", "record_id", "url", "lang", "n_chars",
                      "text")
