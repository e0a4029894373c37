"""Count-min sketch: one-sided error, exactness without collisions,
merge linearity, scale-shape plan pins, and DuckDB parity for the
md5 lane (the promotion-evidence pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datahub_spark.operators import sketch as SK


def _true_counts(spark, docs):
    from datahub_spark.operators.text import words

    return {r["t"]: r["n"] for r in docs.select(
        F.explode(words(F.col("text"))).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()}


@pytest.mark.parametrize("method", ["xxhash", "md5"])
def test_cms_never_undercounts_and_is_exact_when_wide(spark, method):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"),
         (2, "beta beta delta epsilon alpha"),
         (3, "zeta eta theta iota kappa")],
        "doc_id long, text string")
    true = _true_counts(spark, docs)
    cms = SK.count_min_build(docs, depth=4, width=1 << 12, method=method)
    toks = spark.createDataFrame(
        [(t,) for t in list(true) + ["never_seen"]], "token string")
    est = {r["token"]: r["est"] for r in SK.count_min_query(
        cms, toks, depth=4, width=1 << 12, method=method).collect()}
    for t, n in true.items():
        assert est[t] >= n, (t, est[t], n)
    # 10 distinct tokens in a 4096-cell row: collisions are possible
    # but the 4-row min makes a same-pair collision in EVERY row
    # vanishingly unlikely — exact equality expected here
    assert est == {**true, "never_seen": 0}


def test_cms_overestimate_only_under_forced_collisions(spark):
    """width=2: collisions are guaranteed — the estimate must still
    never undercount (the one-sided contract), and total cell mass
    per row equals the exact token mass (conservation)."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3} filler") for i in range(20)],
        "doc_id long, text string")
    true = _true_counts(spark, docs)
    cms = SK.count_min_build(docs, depth=3, width=2)
    per_row = {r["row"]: r["m"] for r in cms.groupBy("row")
               .agg(F.sum("cnt").alias("m")).collect()}
    mass = sum(true.values())
    assert per_row == {0: mass, 1: mass, 2: mass}
    toks = spark.createDataFrame([(t,) for t in true], "token string")
    est = {r["token"]: r["est"] for r in SK.count_min_query(
        cms, toks, depth=3, width=2).collect()}
    assert all(est[t] >= n for t, n in true.items())


def test_cms_merge_equals_build_on_union(spark):
    a = spark.createDataFrame([(1, "x y x"), (2, "y z")],
                              "doc_id long, text string")
    b = spark.createDataFrame([(3, "x q q r s")],
                              "doc_id long, text string")
    kw = dict(depth=4, width=256)
    merged = SK.count_min_merge(SK.count_min_build(a, **kw),
                                SK.count_min_build(b, **kw))
    direct = SK.count_min_build(a.unionByName(b), **kw)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_cms_token_col_lane_and_bad_params(spark):
    grams = spark.createDataFrame([("a b",), ("a b",), ("c d",)],
                                  "g string")
    cms = SK.count_min_build(grams, token_col="g", depth=2, width=64)
    toks = spark.createDataFrame([("a b",), ("c d",)], "token string")
    est = {r["token"]: r["est"] for r in SK.count_min_query(
        cms, toks, depth=2, width=64).collect()}
    assert est == {"a b": 2, "c d": 1}
    with pytest.raises(ValueError, match="depth"):
        SK.count_min_build(grams, token_col="g", depth=0)
    with pytest.raises(ValueError, match="method"):
        SK.count_min_build(grams, token_col="g", method="fnv")


def test_cms_scale_shape(spark):
    """Plan pins for the 100 TB story: the build's only shuffle is the
    (row, cell) HashAggregate (no sort, no join), and the query side
    joins the sketch as a BROADCAST."""
    docs = spark.createDataFrame(
        [(i, "w x y z") for i in range(50)], "doc_id long, text string")
    cms = SK.count_min_build(docs, depth=4, width=1 << 10)
    bplan = cms._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in bplan
    assert "Join" not in bplan and "Sort" not in bplan
    toks = spark.createDataFrame([("w",), ("q",)], "token string")
    q = SK.count_min_query(cms, toks, depth=4, width=1 << 10)
    qplan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in qplan
    assert q.count() == 2


def test_cms_md5_lane_duckdb_parity(spark):
    """In-suite DuckDB parity for the md5 lane (promotion evidence):
    the whole build + min-over-rows query is reproduced in SQL on the
    documents table — cells, counts and estimates hash-identical."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    d, w = 3, 512
    cms = SK.count_min_build(docs, depth=d, width=w, method="md5")
    probe_tokens = ["the", "data", "spark", "never_seen_tok"]
    toks = spark.createDataFrame([(t,) for t in probe_tokens],
                                 "token string")
    got = sorted(map(tuple, SK.count_min_query(
        cms, toks, depth=d, width=w, method="md5")
        .select("token", "est").collect()))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    rows_sql = " UNION ALL ".join(
        f"SELECT t, {r} AS row, "
        f"(('0x' || substr(md5(t || '#cms{r}'), 1, 15))::BIGINT "
        f"% {w})::INT AS cell FROM toks" for r in range(d))
    want = sorted(map(tuple, con.execute(f"""
        WITH toks AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS t
          FROM documents),
        cells AS ({rows_sql}),
        cms AS (SELECT row, cell, CAST(count(*) AS BIGINT) AS cnt
                FROM cells WHERE t != '' GROUP BY row, cell),
        probe(token) AS (VALUES {','.join(f"('{t}')" for t in probe_tokens)}),
        pc AS (SELECT token, r.row,
                      (('0x' || substr(md5(token || '#cms' ||
                        CAST(r.row AS VARCHAR)), 1, 15))::BIGINT
                       % {w})::INT AS cell
               FROM probe, range({d}) r(row))
        SELECT token, CAST(min(coalesce(cms.cnt, 0)) AS BIGINT) AS est
        FROM pc LEFT JOIN cms ON pc.row = cms.row AND pc.cell = cms.cell
        GROUP BY token
    """).fetchall()))
    assert got == want
