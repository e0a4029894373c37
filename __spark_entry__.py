"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (pricing-summary aggregate over the
                lineitem entity dataset) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2, pinned
                to the driver's 50-entry grading window. Rotated in
                r15: warc_index promoted (the CDX-style random-access
                index graded end-to-end on UNCOMPRESSED planted WET
                shards — offsets are a SQL window cumsum of exact
                record byte sizes, each record re-read through
                read_record_at from its [offset, next) range slice);
                the slot freed by merging dsir_select into
                sample_select (mode=dsir — the union oracle still
                value-hashes the exact 200-doc selection); plus
                canonicalize_url newly graded inside text_cleaning
                (mode=url, six analytic variant-collapse families).
                Previously rotated in
                r14: warc_ingest promoted (WET round trip + response
                extraction across plain/chunked/gzip codings, planted
                from the documents table so DuckDB knows the truth
                without parsing WARC) and unigram_pieces promoted
                (train_unigram's deterministic integer piece table —
                seed counts, tie-broken selection, char protection,
                prune, and model rank; the float-EM rounds stay
                unit-covered); slots freed by merging semantic_dedup
                into dedup_embedding (mode=semdedup) and
                chunk_documents into text_cleaning (mode=chunk) —
                every retired surface still grades inside its merged
                key. Previously rotated
                in r13 onto the remaining exact-potential operators:
                four new graded keys (audio_dedup, skew_salted,
                curriculum_export, contrastive_mining); four long-green
                keys merged into mode-tagged unions to free the slots
                (ann_two_stage->ann_bucketed method=two_stage,
                sessionize->rollup_time mode=session,
                ppl_buckets->lm_familiarity mode=ppl,
                dedup_clusters->dedup_pairs mode=cluster) — every
                retired surface still grades inside its merged key and
                keeps its unit/parity tests. (r12 rotation:
                gopher_rules, lm_familiarity, nb_classifier,
                token_budget_mix, bloom_novelty in;
                dedup_exact->dedup_pairs, decontaminate->corpus_diff,
                data_splits->sample_select,
                pack_sequences->export_shards,
                domain_stats->corpus_frequency merged.)
oracle_sql()  — DuckDB-equivalent SQL per query: 50 of 50 — every
                entry value-hash verifiable, including both approximate
                ANN variants (int64 fixed-point reformulation), the
                multimodal path (md5-digest features), native ASOF
                JOIN, and a BM25 whose sorted-term float fold is
                bit-reproduced in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datahub_spark.queries import QUERIES

    return QUERIES["query_aggregate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datahub_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from datahub_spark.queries import ORACLES

    return dict(ORACLES)
