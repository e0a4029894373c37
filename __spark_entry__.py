"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (pricing-summary aggregate over the
                lineitem entity dataset) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (50 as of
                round 3, pinned to the driver's 50-entry grading
                window), (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query: 50 of 50 — every
                entry value-hash verifiable, including both approximate
                ANN variants (int64 fixed-point reformulation) and the
                multimodal path (md5-digest features).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datahub_spark.queries import QUERIES

    return QUERIES["query_aggregate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datahub_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from datahub_spark.queries import ORACLES

    return dict(ORACLES)
