"""Training-data export (operators/export.py): deterministic sharding,
reproducible global shuffle, manifest-vs-disk agreement."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datahub_spark.operators import export as EX


def test_assign_shards_deterministic_and_stable_under_growth(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(2000)],
                               "doc_id long, text string")
    a = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(df, 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(df, 8).collect()}
    assert a == b
    # repartitioning the input moves nothing
    c = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(df.repartition(13), 8).collect()}
    assert c == a
    # growing the corpus moves nothing already placed
    grown = spark.createDataFrame(
        [(i, f"d{i}") for i in range(3000)], "doc_id long, text string")
    g = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(grown, 8).collect()}
    assert {k: v for k, v in g.items() if k < 2000} == a
    # hash-uniform balance: 2000 docs over 8 shards, generous bounds
    counts = [0] * 8
    for s, _ in a.values():
        counts[s] += 1
    assert min(counts) > 150 and max(counts) < 350


def test_export_shards_layout_order_and_manifest(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = EX.export_shards(docs, out, n_shards=4).collect()
    assert [r["shard"] for r in manifest] == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in manifest) == docs.count()
    assert all(r["n_tokens"] > 0 for r in manifest)
    # dir-per-shard layout
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) == \
        [f"shard={i}" for i in range(4)]
    # reproducible within-shard order: file order equals the hash order
    shard0 = spark.read.parquet(os.path.join(out, "shard=0"))
    got_ids = [r["doc_id"] for r in shard0.collect()]
    expect = [r["doc_id"] for r in
              EX.assign_shards(docs, 4).filter("shard = 0")
              .orderBy("sort_key", "doc_id").collect()]
    assert got_ids == expect
    # exporting twice is byte-order identical
    out2 = str(tmp_path / "shards2")
    EX.export_shards(docs, out2, n_shards=4).collect()
    again = [r["doc_id"] for r in
             spark.read.parquet(os.path.join(out2, "shard=0")).collect()]
    assert again == got_ids


def test_export_shards_every_doc_exactly_once(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    EX.export_shards(docs, out, n_shards=3)
    written = spark.read.parquet(out)
    assert written.count() == docs.count()
    assert written.select("doc_id").distinct().count() == docs.count()
    # shard dirs partition the id space
    per = written.groupBy("doc_id").agg(
        F.countDistinct("shard").alias("n")).filter("n > 1").count()
    assert per == 0
