"""datahub_spark — a PySpark-native entity-graph analytics engine.

Re-expresses the query and data-processing capabilities of
mimiro-io/datahub (reference: /root/reference, Go) on top of the Spark
DataFrame/SQL stack. The reference's semantics (datasets of versioned
entities with props/refs, changes/latest views, graph traversal, jobs,
transforms) are kept; the execution strategy is Spark-first: declarative
plans, Catalyst optimization, broadcast/bucketed joins, no row-at-a-time
Python in hot paths.
"""

from datahub_spark.session import get_spark

__all__ = ["get_spark"]
