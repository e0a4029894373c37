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
    # open-world targets (get_related_test.go:1177): the relation exists
    # because BOB's latest version carries it; alice (tombstoned in
    # 'people') resolves to a bare tombstone, not a dropped edge
    core = people_log(spark).filter(F.col("dataset").isin("people", "city"))
    out = {r["related"]["id"]: r["related"] for r in Q.related(core, ["p:bob"], None).collect()}
    assert sorted(out) == ["c:oslo", "p:alice"]
    assert out["p:alice"]["deleted"] is True and out["p:alice"]["props"] is None
    assert out["c:oslo"]["deleted"] is False
    # with as_of=2 (before the tombstone) alice resolves with her state
    out2 = {r["related"]["id"]: r["related"]
            for r in Q.related(core, ["p:bob"], None, as_of=2).collect()}
    assert out2["p:alice"]["deleted"] is False
    assert out2["p:alice"]["props"]["p:age"] == "31"
    # full log: the live people.extra partial resolves alice (single alive
    # partial keeps its origin dataset)
    out3 = {r["related"]["id"]: r["related"]
            for r in Q.related(people_log(spark), ["p:bob"], None).collect()}
    assert out3["p:alice"]["deleted"] is False
    assert out3["p:alice"]["props"]["p:email"] == "a@x"
    assert out3["p:alice"]["dataset"] == "people.extra"


def test_related_ref_to_missing_entity_yields_stub(spark):
    # get_related_test.go:1177: a ref to an entity that was never stored
    # still produces a relation, with a stub carrying only the id
    from datahub_spark.model import ENTITY_SCHEMA
    from tests.entity_fixtures import row

    log = spark.createDataFrame(
        [row("p:eve", 1, 0, False, {}, {"p:likes": ["p:ghost"]})], ENTITY_SCHEMA)
    out = Q.related(log, ["p:eve"], "p:likes").collect()
    assert len(out) == 1
    rel = out[0]["related"]
    assert rel["id"] == "p:ghost" and rel["deleted"] is False and rel["props"] is None


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


def test_dataset_scope_restricts_resolution_to_stub(spark):
    # store_test.go:1561: a target stored only OUTSIDE the scope still
    # yields the relation, but resolves as a bare stub (link only)
    log = people_log(spark)
    out = Q.related(log, ["p:bob"], "p:home", datasets=["people"]).collect()
    assert len(out) == 1
    rel = out[0]["related"]
    assert rel["id"] == "c:oslo" and rel["props"] is None  # city excluded
    # with city in scope the entity resolves fully
    out2 = Q.related(log, ["p:bob"], "p:home", datasets=["people", "city"]).collect()
    assert out2[0]["related"]["props"]["p:name"] == "Oslo"


def test_related_limit_and_continuation(spark):
    from datahub_spark.model import ENTITY_SCHEMA
    from tests.entity_fixtures import row

    # one entity pointing at 7 targets
    log = spark.createDataFrame(
        [row("p:hub", 1, 0, False, {}, {"p:n": [f"t:{i}" for i in range(7)]})],
        ENTITY_SCHEMA)
    p1 = Q.related(log, ["p:hub"], "p:n", limit=3).collect()
    assert [r["related"]["id"] for r in p1] == ["t:0", "t:1", "t:2"]
    cont = f"{p1[-1]['start_id']}|{p1[-1]['predicate']}|{p1[-1]['related']['id']}"
    p2 = Q.related(log, ["p:hub"], "p:n", limit=3, continuation=cont).collect()
    assert [r["related"]["id"] for r in p2] == ["t:3", "t:4", "t:5"]
    p3 = Q.related(log, ["p:hub"], "p:n", limit=3,
                   continuation=f"p:hub|p:n|t:5").collect()
    assert [r["related"]["id"] for r in p3] == ["t:6"]


def test_related_continuation_with_prefix_ids(spark):
    """ADVICE r1 repro: ids where one is a string-prefix of another
    (p:1 vs p:10) broke the concat-string keyset — page 2 re-emitted
    page-1 rows. The struct keyset must page each row exactly once."""
    from datahub_spark.model import ENTITY_SCHEMA
    from tests.entity_fixtures import row

    targets = [f"t:{i}" for i in range(1, 13)]  # t:1..t:12 — t:1 prefixes t:10..12
    log = spark.createDataFrame(
        [row("p:1", 1, 0, False, {}, {"p:n": targets}),
         row("p:10", 1, 1, False, {}, {"p:n": ["t:1", "t:2"]})],
        ENTITY_SCHEMA)
    seen, cont = [], None
    while True:
        page = Q.related(log, ["p:1", "p:10"], "p:n", limit=3, continuation=cont).collect()
        if not page:
            break
        seen.extend((r["start_id"], r["related"]["id"]) for r in page)
        last = page[-1]
        cont = (last["start_id"], last["predicate"], last["related"]["id"])
    assert len(seen) == 14 and len(set(seen)) == 14  # no dup, no drop
    # ordering is tuple-wise: all of p:1's rows precede p:10's
    assert seen[:12] == [("p:1", t) for t in sorted(targets)]
