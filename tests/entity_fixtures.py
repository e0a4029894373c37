"""Shared in-memory entity change-log fixtures for unit tests.

A tiny two-dataset graph with versions, tombstones, and partials —
small enough to reason about by hand, rich enough to exercise the
versioned-store semantics (latest / changes / point-in-time / merge).
"""

from __future__ import annotations

from datahub_spark.model import ENTITY_SCHEMA


def row(id, recorded, seq=0, deleted=False, props=None, refs=None, dataset="people"):
    return (id, recorded, seq, deleted, props or {}, refs or {}, dataset)


def people_log(spark):
    """people: alice v1..v3 (v3 deletes), bob v1; city: oslo v1.
    people.extra: partial for alice (email only), recorded later."""
    rows = [
        row("p:alice", 1, 0, False, {"p:name": "Alice", "p:age": "30"},
            {"p:home": ["c:oslo"]}),
        row("p:alice", 2, 0, False, {"p:name": "Alice", "p:age": "31"},
            {"p:home": ["c:oslo"]}),
        row("p:alice", 3, 0, True, {"p:name": "Alice", "p:age": "31"},
            {"p:home": ["c:oslo"]}),
        row("p:bob", 2, 1, False, {"p:name": "Bob"}, {"p:home": ["c:oslo"],
            "p:friend": ["p:alice"]}),
        row("c:oslo", 1, 0, False, {"p:name": "Oslo"}, {}, dataset="city"),
        row("p:alice", 4, 0, False, {"p:email": "a@x"}, {}, dataset="people.extra"),
    ]
    return spark.createDataFrame(rows, ENTITY_SCHEMA)
