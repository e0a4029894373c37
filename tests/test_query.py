"""Graph traversal + paging semantics (reference: get_related_test.go)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datahub_spark import query as Q
from datahub_spark.namespaces import NamespaceManager
from tests.entity_fixtures import people_log


def test_related_outgoing_single_predicate(spark):
    log = people_log(spark)
    out = Q.related(log, ["p:bob"], "p:home").collect()
    assert [(r["start_id"], r["related"]["id"]) for r in out] == [("p:bob", "c:oslo")]


def test_related_inverse(spark):
    log = people_log(spark)
    out = Q.related(log, ["c:oslo"], "p:home", inverse=True).collect()
    # only bob's latest version survives (alice tombstoned at latest)
    assert sorted(r["related"]["id"] for r in out) == ["p:bob"]


def test_related_star_follows_all_predicates(spark):
    # restrict to people+city: alice is tombstoned in 'people' but has a
    # live partial in 'people.extra', which would (correctly) resolve her
    core = people_log(spark).filter(F.col("dataset").isin("people", "city"))
    out = Q.related(core, ["p:bob"], None).collect()
    assert sorted((r["predicate"], r["related"]["id"]) for r in out) == [
        ("p:home", "c:oslo")]  # alice deleted -> only oslo
    # with as_of=2 (before the tombstone) both targets resolve
    out2 = Q.related(core, ["p:bob"], None, as_of=2).collect()
    assert sorted((r["predicate"], r["related"]["id"]) for r in out2) == [
        ("p:friend", "p:alice"), ("p:home", "c:oslo")]
    # full log: the people.extra partial resolves alice even at latest
    out3 = Q.related(people_log(spark), ["p:bob"], None).collect()
    assert sorted((r["predicate"], r["related"]["id"]) for r in out3) == [
        ("p:friend", "p:alice"), ("p:home", "c:oslo")]


def test_related_dataset_scoping(spark):
    log = people_log(spark)
    none = Q.related(log, ["p:bob"], "p:home", datasets=["city"]).collect()
    assert none == []  # bob's edges live in 'people'; scoping excludes them


def test_related_point_in_time_traversal(spark):
    log = people_log(spark)
    out = Q.related(log, ["c:oslo"], "p:home", inverse=True, as_of=2).collect()
    assert sorted(r["related"]["id"] for r in out) == ["p:alice", "p:bob"]
    assert {r["related"]["props"]["p:age"] for r in out
            if r["related"]["id"] == "p:alice"} == {"31"}


def test_hop_two_levels(spark):
    log = people_log(spark)
    first = Q.related(log, ["p:bob"], "p:friend", as_of=2)
    # friend -> home, origin preserved (needs as_of to see alice alive)
    second = Q.hop(first, log.filter(F.col("recorded") <= 2), "p:home")
    got = [(r["start_id"], r["related"]["id"]) for r in second.collect()]
    assert got == [("p:bob", "c:oslo")]


def test_page_continuation(spark):
    df = spark.createDataFrame([(f"id:{i:03d}",) for i in range(30)], "id string")
    p1 = [r["id"] for r in Q.page(df, 10).collect()]
    p2 = [r["id"] for r in Q.page(df, 10, continuation=p1[-1]).collect()]
    assert p1 == [f"id:{i:03d}" for i in range(10)]
    assert p2 == [f"id:{i:03d}" for i in range(10, 20)]
    assert not set(p1) & set(p2)


def test_namespace_roundtrip():
    ns = NamespaceManager()
    pref = ns.assert_prefix("http://example.com/people/")
    assert ns.expand_curie(f"{pref}:alice") == "http://example.com/people/alice"
    assert ns.compress_uri("http://example.com/people/alice") == f"{pref}:alice"
    # idempotent assert
    assert ns.assert_prefix("http://example.com/people/") == pref
