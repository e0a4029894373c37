"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (pricing-summary aggregate over the
                lineitem entity dataset) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2, pinned
                to the driver's 50-entry grading window. Rotated in r9
                onto the r8 operator wave: ten new graded keys
                (asof_join, range_join, rollup_time, sessionize,
                pagerank, bm25_topk, paragraph_dedup, pack_sequences,
                data_splits, domain_stats) plus the A-ES weighted
                sampler folded into sample_select; ten long-green keys
                merged into wider unions (mode-tagged) to free the
                slots — every retired surface still grades inside its
                merged key and keeps its unit/parity tests.
oracle_sql()  — DuckDB-equivalent SQL per query: 50 of 50 — every
                entry value-hash verifiable, including both approximate
                ANN variants (int64 fixed-point reformulation), the
                multimodal path (md5-digest features), native ASOF
                JOIN, and a BM25 whose sorted-term float fold is
                bit-reproduced in SQL.
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
