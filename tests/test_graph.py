"""PageRank: DuckDB-oracle exactness + structural properties."""

from __future__ import annotations

import duckdb

from datahub_spark.operators import graph as G


def _edges(spark):
    # orders -> customer reference edges from the real tables: a
    # natural "popular customers gather rank" graph
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return orders.selectExpr("o_orderkey AS src", "o_custkey AS dst")


def test_pagerank_matches_duckdb_unroll(spark):
    edges = _edges(spark)
    got = {r["id"]: r["rank_e9"]
           for r in G.pagerank(edges, rounds=3).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW e AS SELECT o_orderkey AS src, o_custkey AS dst "
        "FROM read_parquet('/root/testdata/sf0.001/orders.parquet')")
    want = {r[0]: r[1]
            for r in con.execute(G.pagerank_oracle_sql(3)).fetchall()}
    assert got == want


def test_pagerank_structure(spark):
    # star: both leaves feed the hub; hub has no outgoing edges
    edges = spark.createDataFrame(
        [(1, 3), (2, 3)], "src long, dst long")
    r = {x["id"]: x["rank_e9"] for x in G.pagerank(edges, rounds=2).collect()}
    # sources never receive: rank = base after round 1 (stable)
    assert r[1] == r[2] == 150_000_000
    # hub after round 2: base + 0.85 * 2 * (base div 1)
    assert r[3] == 150_000_000 + (85 * 2 * 150_000_000) // 100
    # a cycle conserves: every node of a 3-cycle has identical rank
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long")
    rc = {x["id"]: x["rank_e9"] for x in G.pagerank(cyc, rounds=4).collect()}
    assert len(set(rc.values())) == 1
