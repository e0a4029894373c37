"""Skew utilities: salted join/count equal their plain counterparts;
hot-key detection finds the planted key."""

from __future__ import annotations

from pyspark.sql import functions as F

from datahub_spark.operators import skew as SK


def _skewed(spark):
    # 90% of rows on key 7, the rest spread over 0..6
    return spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 3).alias("payload"))


def test_salted_join_equals_plain_join(spark):
    left = _skewed(spark)
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(8)], "k long, name string")
    plain = left.join(dim, "k").select("row_id", "k", "payload", "name")
    for salt in (1, 4):
        got = SK.salted_join(left, dim, "k", salt=salt,
                             id_col="row_id") \
            .select("row_id", "k", "payload", "name")
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, plain.collect())), salt

    # left join keeps unmatched rows exactly once
    dim_partial = dim.filter("k < 3")
    lj = SK.salted_join(left, dim_partial, "k", salt=4, how="left",
                        id_col="row_id")
    pj = left.join(dim_partial, "k", "left")
    assert sorted(map(tuple, lj.select("row_id", "name").collect())) == \
        sorted(map(tuple, pj.select("row_id", "name").collect()))

    import pytest
    with pytest.raises(ValueError):
        SK.salted_join(left, dim, "k", how="full")
    with pytest.raises(ValueError):
        SK.salted_join(left, dim, "k", salt=0)


def test_salted_count_and_hot_keys(spark):
    df = _skewed(spark)
    got = {r["k"]: r["n"] for r in SK.salted_count(df, "k").collect()}
    want = {r["k"]: r["n"] for r in
            df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert got == want

    hot = SK.hot_keys(df, "k", min_share_e4=500).collect()
    assert hot[0]["k"] == 7 and hot[0]["share_e4"] >= 8900
    # nothing else holds 5%+... except the residual keys at ~1.4% each
    assert all(r["k"] == 7 for r in hot)


def test_salt_is_rerun_and_layout_stable(spark):
    """r9: the default salt derives from row content (xxhash64 over
    all columns), so the same input gets the same salt assignment on
    every run and under ANY partition layout — the property the old
    monotonically_increasing_id default could not give."""
    df = _skewed(spark)
    salted = lambda d: {r["row_id"]: r["_salt"] for r in d.withColumn(
        "_salt", F.pmod(SK._salt_src(d, None, False), F.lit(8)).cast("int"))
        .select("row_id", "_salt").collect()}
    a = salted(df)
    b = salted(df)
    assert a == b
    # repartitioning the input moves no salt assignment
    c = salted(df.repartition(17))
    assert c == a
    # the salted join itself is run-to-run identical row-for-row
    other = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(8)], "k long, name string")
    r1 = sorted(map(tuple, SK.salted_join(df, other, on="k").collect()))
    r2 = sorted(map(tuple, SK.salted_join(df, other, on="k").collect()))
    assert r1 == r2
    # salted_count with the deterministic default still equals plain
    plain = {(r["k"],): r["n"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {(r["k"],): r["n"] for r in SK.salted_count(df, "k").collect()}
    assert got == plain
    # the MID path stays available behind the explicit flag
    got_mid = {(r["k"],): r["n"]
               for r in SK.salted_count(df, "k", use_mid=True).collect()}
    assert got_mid == plain
