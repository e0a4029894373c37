"""Physical-plan regression tests: the SURVEY §4 scale claims, pinned.

These assert the SHAPE of the executed plan (broadcasts, aggregate
strategies, pipeline counts) — the properties that keep operators
scalable — so a refactor that silently degrades a plan fails here, not
in production."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _plan(spark, key: str) -> str:
    from datahub_spark.queries import QUERIES

    return QUERIES[key](spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()


def test_traversal_uses_broadcast_joins(spark):
    plan = _plan(spark, "traverse_edges")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must broadcast at this size


def test_query_aggregate_is_hash_aggregated_with_partials(spark):
    plan = _plan(spark, "query_aggregate")
    assert "SortAggregate" not in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # single-version fast path: no max_by latest aggregation at all
    assert "max_by" not in plan
    # props-map construction must collapse away entirely
    # (collapseProjectAlwaysInline + pre-extraction select): the scan
    # reads exactly the touched columns, no map built per row
    assert "map(p:" not in plan
    assert "l_shipdate" not in plan and "l_tax" not in plan  # pruned
    assert "date_format" not in plan


def _plan_fn(spark, fn_name: str) -> str:
    # retired-from-grading narrow queries (r10 rotation) keep their
    # plan pins through the unregistered query functions
    from datahub_spark import queries as QM

    return getattr(QM, fn_name)(spark, SF_SMALL) \
        ._jdf.queryExecution().executedPlan().toString()


def test_minhash_single_pipeline_hash_aggregated(spark):
    plan = _plan_fn(spark, "q_dedup_minhash")
    # r15 optimization round: the signature aggregate is a DELIBERATE
    # min-over-hex-substring SortAggregate (conv() moved after the agg
    # — 50x fewer conversions; the exploded shingle stream is clustered
    # by doc_id so the partial sort is nearly free; measured 13.7s ->
    # 9.9s at effective sf10). Pin that the conv no longer runs
    # per-shingle: it must appear OUTSIDE the aggregate, i.e. the agg
    # buffers are the raw 15-char hex minimums.
    assert "partial_min(substring" in plan.replace("\n", "")
    assert "min(conv(" not in plan.replace("\n", "")
    # exactly one shingle explode (bucket-grouped pairing, no self-join
    # recompute); the second Generate is the in-bucket pair fan-out
    assert plan.count("Generate explode(CASE WHEN") == 1


def test_ngram_jaccard_single_shingle_pipeline(spark):
    plan = _plan_fn(spark, "q_dedup_ngram_jaccard")
    assert plan.count("Generate explode(CASE WHEN") == 1


def test_changes_since_filter_reaches_scan(spark):
    plan = _plan(spark, "changes_since")
    # recorded derives from the raw ts column, so the recorded>token
    # range predicate must be rewritten onto ts (ingest._ts_bound, a
    # constant-folded same-dtype literal) and PUSHED to the parquet scan
    # (row-group stats skip), not merely evaluated post-scan
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts," in plan, plan[:2000]


def test_entities_latest_uses_max_by_not_window_sort(spark):
    plan = _plan(spark, "entities_latest")
    assert "max_by" in plan
    assert "Window" not in plan  # no global sort-window for latest


def test_ann_topk_broadcasts_query_side(spark):
    # the brute-force tier inside the merged ann key (r9) must
    # broadcast the (gated small) query side, never shuffle the corpus
    plan = _plan(spark, "ann_bucketed")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ann_ivf_quantizer_never_collects_vectors(spark):
    # the Lloyd centroid update must be per-dimension scalar sums
    # (bounded row width), never whole clusters gathered into one row
    plan = _plan(spark, "ann_bucketed")
    assert "array_agg" not in plan and "collect_list" not in plan
    # r15 optimization round: Lloyd rounds execute EAGERLY inside
    # kmeans_inverted (one bounded centroid collect per round — the
    # O(rounds^2) lineage re-execution fix), so the update aggregate no
    # longer appears in the final query plan. Pin the shared update
    # helper's plan directly instead: scalar partial sums, no gathers.
    from pyspark.sql import functions as F

    from datahub_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    assigned = emb.select(
        F.col("vec_id").alias("cid"),
        SIM.fixed_vec(F.col("embedding")).alias("cv"),
        (F.col("vec_id") % 4).alias("cl"))
    uplan = SIM.lloyd_update(assigned, dim=64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "array_agg" not in uplan and "collect_list" not in uplan
    assert "partial_sum" in uplan  # map-side combine in the update agg


def test_dedup_embedding_is_blocked_not_cartesian(spark):
    plan = _plan(spark, "dedup_embedding")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("key", ["text_signals", "corpus_frequency"])
def test_text_ops_have_no_python_and_no_sort_agg(spark, key):
    plan = _plan(spark, key)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortAggregate" not in plan


def test_corpus_select_is_bucketed_not_cartesian(spark):
    # the end-to-end flagship pipeline composes exact dedup + LSH-blocked
    # near-dup + CC + quality floor; none of those may degrade to an
    # all-pairs join or a sort aggregate
    plan = _plan(spark, "corpus_select")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the only SortAggregate allowed is the minhash signature's
    # deliberate min-over-hex-substring (r15; see the minhash pin) —
    # nothing else in the pipeline may sort-aggregate
    assert plan.count("SortAggregate") <= 2  # partial + final


def test_nb_classifier_model_broadcasts_no_cartesian(spark):
    """r12 promotion: scoring joins the bounded e4 model via
    broadcast; the corpus side never cartesians or sort-aggregates."""
    plan = _plan(spark, "nb_classifier")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_budget_mix_filter_is_map_side(spark):
    """r12 promotion: after the narrow per-lang budget aggregate
    (driver-bounded by |langs|), the keep itself is ONE map-side
    hash filter — no join and no shuffle of document rows."""
    plan = _plan(spark, "token_budget_mix")
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_bloom_novelty_probe_has_no_join(spark):
    """r12 promotion: the bitmap ships via sparkContext.broadcast and
    the probe is map-side (codegen positions + one Arrow-batched
    gather) — the plan carries no join of batch against corpus."""
    plan = _plan(spark, "bloom_novelty")
    assert "Join" not in plan, plan


def test_contrastive_mining_is_bucketed_not_cartesian(spark):
    """r13 promotion: positives come from banded minhash equi-joins,
    hard negatives from (band, bucket) hyperplane equi-joins — no
    stage may degrade to an all-pairs join."""
    plan = _plan(spark, "contrastive_mining")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_salted_join_has_no_cartesian_and_hash_aggregates(spark):
    """r13 promotion: the salted join is an equi-join on (key, salt)
    — the build-side replication is an explode, never a nested-loop —
    and both count phases stay hash aggregates."""
    plan = _plan(spark, "skew_salted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortAggregate" not in plan


def test_audio_dedup_candidates_are_banded_equi_joins(spark):
    """r13 promotion: fingerprints band into 16-bit chunks and meet in
    an equi-join; clustering is the pointer-jumping CC — the audio
    corpus never all-pairs."""
    plan = _plan(spark, "audio_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
