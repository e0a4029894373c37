#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Headliners (SURVEY.md §6) cover the main plan shapes:
  query_aggregate     scan + wide aggregate (flagship)
  traverse_incoming   graph inverse-traversal join
  changes_latest_only versioned-store window/max_by
  dedup_minhash       shingle explode + LSH band join
  ann_topk            vector scoring + per-query top-k
  text_quality        wide per-row expression plan
Each query is forced with a noop write (full execution, no driver
collect bottleneck); time is wall-clock per query, value = total.
"""
from __future__ import annotations

import json
import os
import sys
import time

HEADLINERS = [
    "query_aggregate",
    "traverse_incoming",
    "changes_latest_only",
    "dedup_minhash",
    "ann_topk",
    "text_quality",
    "parts_per_nation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.removeprefix("sf"))
    except ValueError:
        sf = sf_name

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("datahub-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datahub_spark.queries import QUERIES

    timings: dict[str, float] = {}
    for name in HEADLINERS:
        fn = QUERIES[name]
        # min of 2 runs: run 1 pays one-time JVM/codegen/footer warmup
        # (~9s on the first query of a session), run 2 is steady state —
        # the number comparable to a warmed single-node baseline.
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    store_write = bench_store_write(spark)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "store_write": store_write,
    }))


def bench_store_write(spark) -> dict:
    """Write-path throughput, comparable to the reference's ONLY published
    number (last_bench.txt: BenchmarkDatasetStoreEntities-2, ~45ms per
    1000-entity StoreEntities batch = ~22k entities/sec on 2 vCPUs).
    Same entity shape (dataset_benchmark_test.go:35-46: one Name prop,
    one single + one two-element ref), full transaction semantics
    (staging + atomic rename commit). Two regimes:
      eps_bulk_1m  — one 1M-entity transaction: the engine's intended
                     batch granularity (1000 reference batches in one
                     commit).
      eps_batch_1k — ten sequential 1000-entity transactions: the
                     reference's OLTP loop shape, which pays Spark's
                     fixed per-job cost every batch (reported for
                     honesty, not the design point)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datahub_spark.store import EntityStore

    def persons(n, base=0):
        return spark.range(n).select(
            F.concat(F.lit("people:person"), (F.col("id") + base).cast("string")).alias("id"),
            F.lit(None).cast("long").alias("recorded"),
            (F.col("id") + base).alias("seq"),
            F.lit(False).alias("deleted"),
            F.create_map(F.lit("people:Name"), F.lit("person")).alias("props"),
            F.create_map(
                F.lit("people:worksfor"), F.array(F.lit("companies:company-3")),
                F.lit("people:workedfor"),
                F.array(F.lit("companies:company-2"), F.lit("companies:company-1")),
            ).alias("refs"),
        )

    root = tempfile.mkdtemp(prefix="bench_store_")
    try:
        es = EntityStore(spark, os.path.join(root, "s"))
        big = persons(1_000_000)
        t0 = time.monotonic()
        es.store_entities("people", big, skip_unchanged=False)
        bulk_s = time.monotonic() - t0
        t0 = time.monotonic()
        for i in range(10):
            es.store_entities("oltp", persons(1000, base=i * 1000),
                              skip_unchanged=False)
        batch_s = time.monotonic() - t0
        return {
            "eps_bulk_1m": round(1_000_000 / bulk_s),
            "eps_batch_1k": round(10_000 / batch_s),
            "baseline_ref_eps": 22000,
            "baseline_src": "last_bench.txt BenchmarkDatasetStoreEntities-2 ~45ms/1000 on 2 vCPUs",
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
