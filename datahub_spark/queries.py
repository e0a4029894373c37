"""Query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

Portability rules (so the driver's value-hash compare is exact):
  * every integer output column is BIGINT on both sides
  * every fractional output is CAST(... AS DECIMAL(p,s)) -> VARCHAR with
    identical (p,s), computed from exact decimal arithmetic where sums
    are involved (no float accumulation-order divergence)
  * timestamps surface as int64 epoch-nanos (events.ts is TIMESTAMP_NS)
  * hashes are md5 hex strings (identical in Spark and DuckDB)
  * map/array columns never surface directly — always projected/exploded
    to scalar columns
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datahub_spark import ingest
from datahub_spark import query as Q
from datahub_spark import store as S
from datahub_spark import transforms as TR
from datahub_spark import uda
from datahub_spark.namespaces import NamespaceManager
from datahub_spark.operators import dedup as DD
from datahub_spark.operators import multimodal as MM
from datahub_spark.operators import similarity as SIM
from datahub_spark.operators import text as TX

# fixed continuation token / point-in-time: 2024-01-15T00:00:00Z in epoch-ns
T_MID = 1705276800000000

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _ds(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return ingest.tpch_entities(spark, sf_dir)


# --------------------------------------------------------------------------
# §2.1 core graph store / query
# --------------------------------------------------------------------------

@register(
    "entities_latest",
    """
    WITH v AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS id,
           event_type,
           CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value
    FROM v WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_entities_latest(spark, sf_dir):
    """/entities latest view (dataset.go:891): newest version per entity,
    tombstones excluded."""
    user = _ds(spark, sf_dir)["user"]
    return S.latest(user).select(
        "id",
        F.col("props")["p:event_type"].alias("event_type"),
        F.col("props")["p:value"].alias("value"),
    )


@register(
    "changes_since",
    f"""
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS id,
           epoch_us(ts) AS recorded,
           CAST(event_id AS BIGINT) AS seq,
           (event_type = 'error') AS deleted,
           event_type
    FROM events WHERE epoch_us(ts) > {T_MID}
    """,
)
def q_changes_since(spark, sf_dir):
    """/changes since continuation token (dataset.go:1005): pushed-down
    range filter on recorded."""
    user = _ds(spark, sf_dir)["user"]
    return S.changes(user, since=T_MID).select(
        "id", "recorded", "seq", "deleted",
        F.col("props")["p:event_type"].alias("event_type"),
    )


@register(
    "changes_latest_only",
    f"""
    WITH f AS (SELECT * FROM events WHERE epoch_us(ts) > {T_MID}),
    v AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM f)
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS id,
           epoch_us(ts) AS recorded,
           (event_type = 'error') AS deleted,
           event_type
    FROM v WHERE rn = 1
    """,
)
def q_changes_latest_only(spark, sf_dir):
    """/changes with latestOnly (dataset.go:1100): only the newest change
    per entity among the filtered set (tombstones included — they are
    changes)."""
    user = _ds(spark, sf_dir)["user"]
    return S.changes(user, since=T_MID, latest_only=True).select(
        "id", "recorded", "deleted",
        F.col("props")["p:event_type"].alias("event_type"),
    )


@register(
    "entity_lookup",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id,
           c_name AS name, c_mktsegment AS mktsegment,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS acctbal
    FROM customer WHERE c_custkey = 42
    """,
)
def q_entity_lookup(spark, sf_dir):
    """GetEntity by URI (store.go:666) with cross-dataset partial merge
    (customer + customer.balance)."""
    ds = _ds(spark, sf_dir)
    log = ds["customer"].unionByName(ds["customer.balance"])
    merged = S.merge_partials(log.filter(F.col("id") == "cust:42"))
    return merged.select(
        "id",
        F.col("props")["p:name"].alias("name"),
        F.col("props")["p:mktsegment"].alias("mktsegment"),
        F.col("props")["p:acctbal"].alias("acctbal"),
    )


@register(
    "entity_merge_partials",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id,
           c_name AS name,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS acctbal
    FROM customer
    """,
)
def q_entity_merge_partials(spark, sf_dir):
    """mergePartials across datasets (store.go:634) for every entity."""
    ds = _ds(spark, sf_dir)
    log = ds["customer"].unionByName(ds["customer.balance"])
    return S.merge_partials(log).select(
        "id",
        F.col("props")["p:name"].alias("name"),
        F.col("props")["p:acctbal"].alias("acctbal"),
    )


@register(
    "traverse_outgoing",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS start_id,
           'p:nation' AS predicate,
           'nat:' || CAST(n_nationkey AS VARCHAR) AS related_id,
           n_name AS related_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_traverse_outgoing(spark, sf_dir):
    """Outgoing related-entity traversal (store.go:870): BUILDING-segment
    customers --p:nation--> nations."""
    ds = _ds(spark, sf_dir)
    cust = ds["customer"]
    starts = S.latest(cust).filter(F.col("props")["p:mktsegment"] == "BUILDING").select("id")
    rel = Q.related(cust.unionByName(ds["nation"]), starts, "p:nation")
    return rel.select(
        "start_id", "predicate",
        F.col("related.id").alias("related_id"),
        F.col("related.props")["p:name"].alias("related_name"),
    )


@register(
    "traverse_incoming",
    """
    SELECT 'nat:' || CAST(n_nationkey AS VARCHAR) AS start_id,
           'cust:' || CAST(c_custkey AS VARCHAR) AS related_id,
           'customer' AS related_dataset
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT 'nat:' || CAST(n_nationkey AS VARCHAR) AS start_id,
           'sup:' || CAST(s_suppkey AS VARCHAR) AS related_id,
           'supplier' AS related_dataset
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q_traverse_incoming(spark, sf_dir):
    """Inverse traversal (store.go:913): entities pointing AT each nation
    via p:nation (customers and suppliers)."""
    ds = _ds(spark, sf_dir)
    log = ds["customer"].unionByName(ds["supplier"]).unionByName(ds["nation"])
    starts = S.latest(ds["nation"]).select("id")
    rel = Q.related(log, starts, "p:nation", inverse=True)
    return rel.select(
        "start_id",
        F.col("related.id").alias("related_id"),
        F.col("related.dataset").alias("related_dataset"),
    )


@register(
    "traverse_star",
    """
    SELECT 'sup:' || CAST(s_suppkey AS VARCHAR) AS start_id,
           'p:nation' AS predicate,
           'nat:' || CAST(n_nationkey AS VARCHAR) AS related_id
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q_traverse_star(spark, sf_dir):
    """predicate='*' follows all relations (DOCUMENTATION.md:415)."""
    ds = _ds(spark, sf_dir)
    log = ds["supplier"].unionByName(ds["nation"])
    starts = S.latest(ds["supplier"]).select("id")
    rel = Q.related(log, starts, predicate=None)
    return rel.select("start_id", "predicate", F.col("related.id").alias("related_id"))


@register(
    "traverse_scoped",
    """
    SELECT 'nat:' || CAST(n_nationkey AS VARCHAR) AS start_id,
           'sup:' || CAST(s_suppkey AS VARCHAR) AS related_id
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q_traverse_scoped(spark, sf_dir):
    """Dataset-scoped traversal (DOCUMENTATION.md:417): same inverse hop as
    traverse_incoming but scoped to the supplier dataset only — the scope
    filter prunes the customer partitions entirely."""
    ds = _ds(spark, sf_dir)
    log = ds["customer"].unionByName(ds["supplier"]).unionByName(ds["nation"])
    starts = S.latest(ds["nation"]).select("id")
    rel = Q.related(log, starts, "p:nation", inverse=True, datasets=["supplier"],
                    target=ds["supplier"])
    return rel.select("start_id", F.col("related.id").alias("related_id"))


@register(
    "traverse_two_hop",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS start_id,
           'reg:' || CAST(r_regionkey AS VARCHAR) AS region_id,
           r_name AS region_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_traverse_two_hop(spark, sf_dir):
    """Two-hop traversal (transform Query composition,
    DOCUMENTATION.md:691-706): customer -> nation -> region."""
    ds = _ds(spark, sf_dir)
    cust = ds["customer"]
    starts = S.latest(cust).filter(F.col("props")["p:mktsegment"] == "BUILDING").select("id")
    hop1 = Q.related(cust.unionByName(ds["nation"]), starts, "p:nation")
    hop2 = Q.hop(hop1, ds["nation"].unionByName(ds["region"]), "p:region")
    return hop2.select(
        "start_id",
        F.col("related.id").alias("region_id"),
        F.col("related.props")["p:name"].alias("region_name"),
    )


@register(
    "point_in_time",
    f"""
    WITH v AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE epoch_us(ts) <= {T_MID})
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS id,
           event_type,
           CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value
    FROM v WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_point_in_time(spark, sf_dir):
    """Entity state at a moment (store.go:695): time-travel on the log."""
    user = _ds(spark, sf_dir)["user"]
    return S.point_in_time(user, T_MID).select(
        "id",
        F.col("props")["p:event_type"].alias("event_type"),
        F.col("props")["p:value"].alias("value"),
    )


@register(
    "deleted_tombstones",
    """
    WITH v AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS id, epoch_us(ts) AS recorded
    FROM v WHERE rn = 1 AND event_type = 'error'
    """,
)
def q_deleted_tombstones(spark, sf_dir):
    """Tombstone semantics: entities whose current version is deleted."""
    user = _ds(spark, sf_dir)["user"]
    lat = S.latest(user, include_deleted=True)
    return lat.filter(F.col("deleted")).select("id", "recorded")


@register(
    "namespace_roundtrip",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id,
           'http://example.io/customer/' || CAST(c_custkey AS VARCHAR) AS uri,
           'cust:' || CAST(c_custkey AS VARCHAR) AS roundtrip
    FROM customer
    """,
)
def q_namespace_roundtrip(spark, sf_dir):
    """CURIE <-> URI expansion (store.go:213-326) as column expressions."""
    ns = NamespaceManager()
    cust = S.latest(_ds(spark, sf_dir)["customer"])
    expanded = ns.expand_col(F.col("id"))
    return cust.select(
        "id",
        expanded.alias("uri"),
        ns.compress_col(expanded).alias("roundtrip"),
    )


@register(
    "query_aggregate",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_query_aggregate(spark, sf_dir):
    """The JS-query equivalent (DOCUMENTATION.md:484-533): arbitrary
    aggregate compute over a dataset — here a TPC-H-Q1-style pricing
    summary over the lineitem entity dataset. Exact decimal arithmetic
    keeps results engine-portable. Flagship/bench query."""
    li = S.latest(_ds(spark, sf_dir)["lineitem"])
    qty = F.col("props")["p:quantity"].cast("decimal(18,2)")
    ep = F.col("props")["p:extendedprice"].cast("decimal(18,2)")
    disc = F.col("props")["p:discount"].cast("decimal(18,2)")
    return (
        li.groupBy(
            F.col("props")["p:returnflag"].alias("l_returnflag"),
            F.col("props")["p:linestatus"].alias("l_linestatus"),
        )
        .agg(
            F.sum(qty).cast("decimal(38,2)").cast("string").alias("sum_qty"),
            F.sum(ep).cast("decimal(38,2)").cast("string").alias("sum_base_price"),
            F.sum(ep * (F.lit(1) - disc)).cast("decimal(38,4)").cast("string").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "paged_read",
    """
    SELECT id, name FROM (
      SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id, c_name AS name FROM customer)
    WHERE id > 'cust:120' ORDER BY id LIMIT 20
    """,
)
def q_paged_read(spark, sf_dir):
    """limit+continuation paging (DOCUMENTATION.md:419): key-set
    continuation pushes down as a range predicate."""
    cust = S.latest(_ds(spark, sf_dir)["customer"])
    pg = Q.page(cust, limit=20, continuation="cust:120")
    return pg.select("id", F.col("props")["p:name"].alias("name"))


# --------------------------------------------------------------------------
# §2.2 jobs engine
# --------------------------------------------------------------------------

@register(
    "union_source",
    """
    SELECT 'customer' AS dataset, 'cust:' || CAST(c_custkey AS VARCHAR) AS id, c_name AS name
    FROM customer
    UNION ALL
    SELECT 'supplier' AS dataset, 'sup:' || CAST(s_suppkey AS VARCHAR) AS id, s_name AS name
    FROM supplier
    """,
)
def q_union_source(spark, sf_dir):
    """UnionDatasetSource: datasets consumed as if concatenated."""
    ds = _ds(spark, sf_dir)
    log = ds["customer"].unionByName(ds["supplier"])
    return log.select("dataset", "id", F.col("props")["p:name"].alias("name"))


@register(
    "multi_source_affected",
    """
    SELECT DISTINCT 'cust:' || CAST(c_custkey AS VARCHAR) AS id
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey IN (1, 2)
    """,
)
def q_multi_source_affected(spark, sf_dir):
    """MultiSource dependency tracking (source/multisource.go,
    DOCUMENTATION.md:647-777): regions 1,2 'changed' -> inverse-join via
    nation -> affected customers that must be reprocessed."""
    ds = _ds(spark, sf_dir)
    changed_regions = S.latest(ds["region"]).filter(
        F.col("id").isin("reg:1", "reg:2")
    ).select("id")
    nations = Q.related(
        ds["nation"].unionByName(ds["region"]), changed_regions, "p:region",
        inverse=True, target=ds["nation"],
    ).select(F.col("related.id").alias("id")).distinct()
    custs = Q.related(
        ds["customer"].unionByName(ds["nation"]), nations, "p:nation",
        inverse=True, target=ds["customer"],
    ).select(F.col("related.id").alias("id")).distinct()
    return custs


@register(
    "transform_props",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id,
           c_name AS fullname, 'crm' AS source, FALSE AS has_mktsegment
    FROM customer
    """,
)
def q_transform_props(spark, sf_dir):
    """Transform built-ins RenameProperty / RemoveProperty / SetProperty
    (transform.go) as codegen column ops."""
    cust = S.latest(_ds(spark, sf_dir)["customer"])
    out = TR.rename_property(cust, "p:name", "p:fullname")
    out = TR.remove_property(out, "p:mktsegment")
    out = TR.set_property(out, "p:source", F.lit("crm"))
    return out.select(
        "id",
        F.col("props")["p:fullname"].alias("fullname"),
        F.col("props")["p:source"].alias("source"),
        F.map_contains_key("props", "p:mktsegment").alias("has_mktsegment"),
    )


@register(
    "transform_enrich",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id,
           c_name AS name, n_name AS nation_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_transform_enrich(spark, sf_dir):
    """Query()+SetProperty() enrichment pattern (DOCUMENTATION.md:691-706):
    one broadcast join, no per-row query loop."""
    ds = _ds(spark, sf_dir)
    enriched = TR.enrich_via(
        S.latest(ds["customer"]), "p:nation", "p:name", "p:nation_name",
        via=ds["nation"],
    )
    return enriched.select(
        "id",
        F.col("props")["p:name"].alias("name"),
        F.col("props")["p:nation_name"].alias("nation_name"),
    )


@register(
    "custom_transform",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id, upper(c_name) AS name_upper
    FROM customer
    """,
)
def q_custom_transform(spark, sf_dir):
    """Imperative escape hatch (JS transform_entities / HttpTransform):
    Arrow-batched mapInPandas."""
    cust = S.latest(_ds(spark, sf_dir)["customer"]).select(
        "id", F.col("props")["p:name"].alias("name_upper")
    )

    def upper(pdf):
        pdf = pdf.copy()
        pdf["name_upper"] = pdf["name_upper"].str.upper()
        return pdf

    return TR.python_transform(cust, upper)


@register(
    "fullsync_tombstone",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id, TRUE AS deleted
    FROM customer WHERE c_acctbal <= 0
    """,
)
def q_fullsync_tombstone(spark, sf_dir):
    """CompleteFullSync (dataset.go:159): entities missing from the new
    snapshot become tombstones — one left-anti join."""
    from datahub_spark.jobs import fullsync_tombstones

    ds = _ds(spark, sf_dir)
    merged = S.merge_partials(ds["customer"].unionByName(ds["customer.balance"]))
    new_snapshot = merged.filter(F.col("props")["p:acctbal"].cast("decimal(18,2)") > 0)
    tomb = fullsync_tombstones(merged, new_snapshot)
    return tomb.select("id", "deleted")


@register(
    "virtual_dataset",
    """
    SELECT 'v:' || CAST(i AS VARCHAR) AS id, CAST(i * 2 AS BIGINT) AS value
    FROM range(0, 100) t(i)
    """,
)
def q_virtual_dataset(spark, sf_dir):
    """Virtual dataset (virtualdataset.go): entities generated by a script
    — build_entities(params, since, limit) -> rows."""
    from datahub_spark.jobs import VirtualDatasetSource

    def build_entities(spark, params, since, limit):
        n = (params or {}).get("n", 100)
        return spark.range(n).select(
            F.concat(F.lit("v:"), F.col("id").cast("string")).alias("id"),
            (F.col("id") * 2).cast("long").alias("value"),
        )

    return VirtualDatasetSource(spark, build_entities, {"n": 100}).read()


@register(
    "uda_codec",
    """
    SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS id,
           c_name AS name,
           'nat:' || CAST(c_nationkey AS VARCHAR) AS nation_ref
    FROM customer
    """,
)
def q_uda_codec(spark, sf_dir):
    """UDA JSON wire-format round-trip (streamparser.go): entity ->
    to_uda_json -> from_uda_json -> entity."""
    cust = S.latest(_ds(spark, sf_dir)["customer"])
    wire = uda.to_uda_json(cust)
    back = uda.from_uda_json(wire, dataset="customer")
    return back.select(
        "id",
        F.col("props")["p:name"].alias("name"),
        F.col("refs")["p:nation"][0].alias("nation_ref"),
    )


@register(
    "store_roundtrip",
    """
    SELECT 'customer' AS dataset, 'cust:' || CAST(c_custkey AS VARCHAR) AS id FROM customer
    UNION ALL
    SELECT 'nation' AS dataset, 'nat:' || CAST(n_nationkey AS VARCHAR) AS id FROM nation
    """,
)
def q_store_roundtrip(spark, sf_dir):
    """StoreEntities + ExecuteTransaction + read-back (dataset.go:216,
    store.go:1707): atomic two-dataset write to a scratch store."""
    import tempfile

    ds = _ds(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="datahub-store-")
    es = S.EntityStore(spark, root)
    es.execute_transaction(
        {"customer": ds["customer"].drop("dataset"), "nation": ds["nation"].drop("dataset")}
    )
    log = es.log()
    return log.select("dataset", "id")


@register(
    "compaction_dedup",
    """
    WITH v AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS id,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_after
    FROM v GROUP BY user_id
    """,
)
def q_compaction_dedup(spark, sf_dir):
    """Compaction 'deduplicate' (DOCUMENTATION.md:2349): drop successive
    duplicate versions. Payload reduced to event_type so duplicates exist."""
    user = _ds(spark, sf_dir)["user"]
    reduced = user.select(
        "id", "recorded", "seq",
        F.lit(False).alias("deleted"),
        F.map_from_arrays(
            F.array(F.lit("p:event_type")), F.array(F.col("props")["p:event_type"])
        ).alias("props"),
        F.col("refs"),
        "dataset",
    )
    before = reduced.groupBy("id").agg(F.count(F.lit(1)).alias("n_before"))
    after = S.compact_deduplicate(reduced).groupBy("id").agg(F.count(F.lit(1)).alias("n_after"))
    return before.join(after, "id")


@register(
    "retention_gc",
    f"""
    WITH v AS (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS id, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM v WHERE epoch_us(ts) > {T_MID} OR rn = 1
    GROUP BY user_id
    """,
)
def q_retention_gc(spark, sf_dir):
    """GC/retention (garbagecollector.go analogue): drop history older
    than the horizon but always keep each entity's current version."""
    user = _ds(spark, sf_dir)["user"]
    kept = S.retention_gc(user, T_MID)
    return kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "dataset_stats",
    """
    WITH log AS (
      SELECT 'customer' AS dataset, 'cust:' || CAST(c_custkey AS VARCHAR) AS id FROM customer
      UNION ALL SELECT 'supplier', 'sup:' || CAST(s_suppkey AS VARCHAR) FROM supplier
      UNION ALL SELECT 'user', 'user:' || CAST(user_id AS VARCHAR) FROM events)
    SELECT dataset, CAST(COUNT(*) AS BIGINT) AS n_changes,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS n_entities
    FROM log GROUP BY dataset
    UNION ALL
    SELECT 'all', CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT id) AS BIGINT) FROM log
    """,
)
def q_dataset_stats(spark, sf_dir):
    """/statistics endpoint analogue (statistics.go)."""
    ds = _ds(spark, sf_dir)
    log = ds["customer"].unionByName(ds["supplier"]).unionByName(ds["user"])
    return S.dataset_stats(log)
