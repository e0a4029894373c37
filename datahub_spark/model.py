"""Entity data model.

Reference: mimiro-io/datahub stores datasets of entities
``{id, recorded, deleted, props{}, refs{}}`` (internal/server/entity.go;
DOCUMENTATION.md:47-107), identified by URIs compressed to CURIEs.

Spark re-expression: one *entity change-log* DataFrame per store, schema
below, physically parquet partitioned by ``dataset``. Every write is an
append with a monotonic ``(recorded, seq)`` version key — the store is
immutable like the reference's Badger log (internal/server/dataset.go:216).
All read views (latest / changes / point-in-time) are declarative
window/filter plans so Catalyst gets pushdown + pruning.

``props`` values are canonical strings (the reference is schemaless
JSON); ``refs`` values are arrays of CURIEs (the reference allows scalar
or list — normalized to list here).
"""

from __future__ import annotations

from pyspark.sql import types as T

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("recorded", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("refs", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("dataset", T.StringType(), False),
    ]
)

ENTITY_COLUMNS = [f.name for f in ENTITY_SCHEMA.fields]
