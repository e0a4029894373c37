"""UDA JSON wire format: refs must be REAL JSON arrays on the wire
(streamparser.go list form), and the parser must accept both the list
and the external scalar-CURIE form."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from datahub_spark import uda


def _entities(spark):
    return spark.createDataFrame(
        [
            ("e:1", 10, 0, False, {"p:name": "a"}, {"p:friend": ["e:2", "e:3"]}, "d"),
            ("e:2", 11, 0, False, {"p:name": "b"}, None, "d"),
        ],
        "id string, recorded long, seq long, deleted boolean, "
        "props map<string,string>, refs map<string,array<string>>, dataset string",
    )


def test_wire_refs_are_json_arrays(spark):
    rows = uda.to_uda_json(_entities(spark)).collect()
    objs = {o["id"]: o for o in (json.loads(r["json"]) for r in rows)}
    # a reference UDA consumer must see a list of CURIE strings, not a
    # stringified list
    assert objs["e:1"]["refs"]["p:friend"] == ["e:2", "e:3"]
    assert objs["e:2"]["refs"] == {}


def test_roundtrip_through_own_parser(spark):
    ent = _entities(spark)
    back = uda.from_uda_json(uda.to_uda_json(ent), dataset="d")
    got = {r["id"]: r for r in back.collect()}
    assert got["e:1"]["refs"]["p:friend"] == ["e:2", "e:3"]
    assert got["e:1"]["props"]["p:name"] == "a"
    assert got["e:2"]["recorded"] == 11


def test_parser_accepts_external_scalar_refs(spark):
    # external producers may emit the scalar CURIE form (valid UDA)
    wire = spark.createDataFrame(
        [('{"id":"x:1","recorded":5,"deleted":false,'
          '"props":{"p:k":"v"},"refs":{"p:one":"y:9","p:many":["y:1","y:2"]}}',)],
        "json string",
    )
    got = uda.from_uda_json(wire, dataset="ext").collect()[0]
    assert got["refs"]["p:one"] == ["y:9"]
    assert got["refs"]["p:many"] == ["y:1", "y:2"]
