"""Structured-Streaming onchange trigger (reference: scheduler.go
onchange jobs re-run when a monitored dataset changes)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datahub_spark import streaming as ST
from datahub_spark.model import ENTITY_SCHEMA
from tests.entity_fixtures import people_log


def test_onchange_stream_drains_and_sees_appends(spark, tmp_path):
    path = str(tmp_path / "log")
    os.makedirs(path)
    people_log(spark).write.mode("append").parquet(path)

    stream = ST.onchange_stream(spark, path, ENTITY_SCHEMA)
    agg = stream.groupBy("dataset").agg(F.count(F.lit(1)).alias("n"))
    got = {r["dataset"]: r["n"] for r in ST.run_available_now(agg).collect()}
    assert got == {"people": 4, "city": 1, "people.extra": 1}

    # append new files -> a fresh drain sees the larger log (the onchange
    # re-run); with a checkpoint this would process only the delta
    people_log(spark).write.mode("append").parquet(path)
    agg2 = ST.onchange_stream(spark, path, ENTITY_SCHEMA).groupBy("dataset").agg(
        F.count(F.lit(1)).alias("n"))
    got2 = {r["dataset"]: r["n"] for r in ST.run_available_now(agg2).collect()}
    assert got2 == {"people": 8, "city": 2, "people.extra": 2}
