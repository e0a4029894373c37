"""Structured Streaming: the 'onchange' trigger re-expressed.

Reference: jobs with triggerType=onchange (internal/jobs/scheduler.go)
re-run when a monitored dataset changes. Spark-first equivalent: the
dataset's change-log directory IS a streaming source — new appended
parquet files are discovered incrementally, transformed, and pushed to
the sink with exactly-once file-source semantics. Tests/CI use
Trigger.AvailableNow (drain-everything-then-stop); production would run
the same query continuously with a checkpoint location.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def onchange_stream(spark: SparkSession, path: str, schema, glob: str | None = None) -> DataFrame:
    """Streaming view of a change-log directory (new files = new changes)."""
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def run_available_now(stream_df: DataFrame, query_name: str | None = None,
                      output_mode: str = "complete") -> DataFrame:
    """Drain the stream into an in-memory sink and return the result table
    (the onchange-job unit-of-work for tests)."""
    name = query_name or f"onchange_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)
