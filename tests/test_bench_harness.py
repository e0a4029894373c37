"""Bench harness crash isolation (r10): one flaky leg failure must
never zero a round's perf evidence — BENCH_r09.json was rc 1 with a
JVM OOM stack and NO numbers because the old loop let one leg kill
the whole run before the JSON line was emitted."""

from __future__ import annotations

import bench
from tests.conftest import SF_SMALL


def _good(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def _boom(spark, sf_dir):
    raise MemoryError("synthetic OOM")


def test_run_legs_isolates_a_crashing_leg(spark):
    queries = {"good_a": _good, "boom": _boom, "good_b": _good}
    timings, spreads, errors, clean, n_samples = bench.run_legs(
        spark, SF_SMALL, ["good_a", "boom", "good_b"], queries, runs=1)
    # the failure is recorded, the legs before AND after still measured
    assert set(timings) == {"good_a", "good_b"}
    assert all(v >= 0 for v in timings.values())
    assert list(errors) == ["boom"] and "MemoryError" in errors["boom"]
    assert set(spreads) == {"good_a", "good_b"}
    assert set(clean) == {"good_a", "good_b"}
    assert n_samples == {"good_a": 1, "good_b": 1}


def test_run_legs_force_fail_env(spark, monkeypatch):
    """SPARK_GRAFT_BENCH_FORCE_FAIL lets an operator smoke-drill the
    partial-evidence path end-to-end without a real OOM."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE_FAIL", "good_a")
    timings, _, errors, _, _ = bench.run_legs(
        spark, SF_SMALL, ["good_a", "good_b"],
        {"good_a": _good, "good_b": _good}, runs=1)
    assert "good_a" in errors and "forced failure" in errors["good_a"]
    assert set(timings) == {"good_b"}


def test_run_legs_forced_stall_drill(spark, monkeypatch):
    """Stall-robust reporting (r13, VERDICT r12 'What's wrong' #2):
    SPARK_GRAFT_BENCH_FORCE_STALL inflates every odd-indexed sample
    10x — a synthetic host pause. The drill asserts the full contract:
    (a) stalls counted in the spread, (b) the raw median is
    contaminated while the stall-excluded median stays at real-run
    scale, (c) >= 2 stalls in the first n samples triggers the
    extra-sample extension so the clean median rests on enough real
    measurements."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE_STALL", "stally")
    timings, spreads, errors, clean, n_samples = bench.run_legs(
        spark, SF_SMALL, ["stally", "good_b"],
        {"stally": _good, "good_b": _good}, runs=5, extra_if_stalls=2)
    assert not errors
    mn, mx, stalls = spreads["stally"]
    # 5 initial samples: indexes 1,3 inflated -> 2 stalls -> extended
    # to 7: index 5 also inflated -> >= 3 stalls of 7 total (a real
    # sample on a millisecond-scale query can jitter past 2x min too)
    assert n_samples["stally"] == 7
    assert stalls >= 3
    assert mx > 2 * mn
    # raw median of 7 with 3 stalls sits at the clean ceiling; the
    # stall-excluded median must NOT include any inflated sample
    assert clean["stally"] <= 2 * mn
    # the quiet leg is untouched: no stalls, no extension
    assert n_samples["good_b"] == 5
    assert spreads["good_b"][2] == 0 or clean["good_b"] <= 2 * spreads["good_b"][0]


def test_clear_persisted_between_legs(spark):
    """run_legs clears pinned storage after every leg, so a
    checkpoint-heavy query (pagerank pins its returned rank frame per
    run) cannot stack blocks against later legs."""
    from pyspark.sql import functions as F

    from datahub_spark.operators.graph import _persisted_ids, pagerank

    def _pr(spark, sf_dir):
        edges = spark.range(500).select(
            (F.col("id") % 31).alias("src"), (F.col("id") % 17).alias("dst"))
        return pagerank(edges, rounds=4)

    timings, _, errors, _, _ = bench.run_legs(
        spark, SF_SMALL, ["pr"], {"pr": _pr}, runs=2)
    assert not errors and "pr" in timings
    assert _persisted_ids(spark.sparkContext) == set()
