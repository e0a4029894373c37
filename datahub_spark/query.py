"""Graph query operators: entity lookup and related-entity traversal.

Reference parity (internal/server/store.go):
  - GetManyRelatedEntities / outgoing hop      store.go:870
  - inverse (incoming) traversal               store.go:913 (ToRelatedFrom)
  - predicate '*' follows all relations        DOCUMENTATION.md:415
  - dataset scoping                            DOCUMENTATION.md:417
  - GetManyRelatedEntitiesAtTime               store.go:999
  - limit + continuation paging                DOCUMENTATION.md:419

Spark re-expression and scale notes:
  * Edges are derived from the refs map. For a fixed predicate we read
    ``refs[predicate]`` directly — no full map explode — then explode the
    (usually length-1) ref array. For '*' we explode the map once.
  * A traversal is then one equi-join between the edge set and the
    latest-entity view of the target side. Start sets are typically
    small → Spark broadcasts them; dimension-sized target sides get
    broadcast too (AQE decides at runtime from actual sizes).
  * Point-in-time traversal = same plan over the time-restricted log
    (range filter pushed to the parquet scan before the window agg).
  * Paging = deterministic (id) ordering + key-set continuation
    (``id > token``), which pushes down as a range predicate instead of
    a global sort+offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datahub_spark.store import latest, point_in_time


def edges(df: DataFrame, predicate: str | None = None, include_deleted: bool = False) -> DataFrame:
    """Flatten the latest entity view into an edge list
    (start_id, predicate, ref_id, dataset). ``predicate=None`` means '*'."""
    return _edges_of_view(latest(df, include_deleted=include_deleted), predicate)


def related(
    df: DataFrame,
    starting_entities: list[str] | DataFrame | None,
    predicate: str | None = None,
    inverse: bool = False,
    datasets: list[str] | None = None,
    target: DataFrame | None = None,
    as_of: int | None = None,
    single_version: bool = False,
    limit: int | None = None,
    continuation: str | None = None,
) -> DataFrame:
    """GetManyRelatedEntities (store.go:870) as a declarative plan.

    Returns rows (start_id, predicate, related) where ``related`` is the
    struct of the related entity's latest (or as-of) version. ``df`` is
    the entity change-log to traverse over; ``target`` optionally narrows
    where related entities are materialized from (defaults to ``df``).

    inverse=False: start --pred--> related   (edge.start_id = start)
    inverse=True : related --pred--> start   (edge.ref_id  = start)
    """
    edge_log = df
    if datasets:
        edge_log = edge_log.filter(F.col("dataset").isin(datasets))
    edge_view = (
        point_in_time(edge_log, as_of, single_version=single_version)
        if as_of is not None
        else latest(edge_log, single_version=single_version)
    )
    edge_src = _edges_of_view(edge_view, predicate)

    anchor = "ref_id" if inverse else "start_id"
    if isinstance(starting_entities, DataFrame):
        start_df = starting_entities.select(F.col(starting_entities.columns[0]).alias(anchor)).distinct()
        edge_src = edge_src.join(F.broadcast(start_df), anchor)
    elif starting_entities is not None:
        # fine for large lists too: Catalyst rewrites In to InSet (hash
        # lookup) past 10 values, so this stays O(1) per row and still
        # pushes to the scan for the outgoing case. (A broadcast semi-join
        # variant measured ~2x slower — join machinery per row.)
        edge_src = edge_src.filter(F.col(anchor).isin(list(starting_entities)))

    tgt_log = target if target is not None else df
    if datasets and target is None:
        # dataset scope also restricts RESOLUTION (store_test.go:1561
        # "Should omit disallowed datasets when resolving found
        # entities"): partials outside the scope contribute nothing; a
        # target only stored outside the scope resolves to a bare stub
        tgt_log = tgt_log.filter(F.col("dataset").isin(datasets))
    # Open-world target resolution (get_related_test.go:1177; store.go:695
    # GetEntityAtPointInTimeWithInternalID): the relation exists iff the
    # ref-holder's latest version carries it — the TARGET's state never
    # gates the edge. Resolution rules: deleted partials contribute
    # nothing; one alive partial keeps its dataset; several merge; all
    # deleted -> bare tombstone; missing -> stub with only the id.
    related_key = "start_id" if inverse else "ref_id"
    if as_of is not None:
        tgt_log = tgt_log.filter(F.col("recorded") <= F.lit(int(as_of)))
    if single_version:
        # snapshot fast path: ids unique, no tombstone interplay — the
        # per-row view IS the resolution
        tgt = latest(tgt_log, include_deleted=True, single_version=True).select(
            F.col("id").alias(related_key),
            F.struct("id", "recorded", "seq", "deleted", "props", "refs", "dataset").alias("_found"),
        )
    else:
        from datahub_spark.store import collect_partials, fold_props, fold_refs

        agg = collect_partials(tgt_log, key=related_key)
        alive = F.filter(F.col("_ps"), lambda p: ~p["deleted"])
        n_alive = F.size(alive)
        one = F.element_at(alive, 1)
        last = F.element_at(alive, -1)
        resolved = (
            F.when(n_alive == 1, F.struct(
                F.col(related_key).alias("id"), one["recorded"].alias("recorded"),
                one["seq"].alias("seq"), F.lit(False).alias("deleted"),
                one["props"].alias("props"), one["refs"].alias("refs"),
                one["dataset"].alias("dataset")))
            .when(n_alive > 1, F.struct(
                F.col(related_key).alias("id"), last["recorded"].alias("recorded"),
                last["seq"].alias("seq"), F.lit(False).alias("deleted"),
                fold_props(alive).alias("props"), fold_refs(alive).alias("refs"),
                F.lit("*merged*").alias("dataset")))
            .otherwise(F.struct(  # exists only as tombstones
                F.col(related_key).alias("id"), F.lit(0).cast("long").alias("recorded"),
                F.lit(0).cast("long").alias("seq"), F.lit(True).alias("deleted"),
                F.lit(None).cast("map<string,string>").alias("props"),
                F.lit(None).cast("map<string,array<string>>").alias("refs"),
                F.lit(None).cast("string").alias("dataset")))
        )
        tgt = agg.select(F.col(related_key), resolved.alias("_found"))
    out = edge_src.join(tgt, related_key, "left")
    stub = F.struct(
        F.col(related_key).alias("id"),
        F.lit(0).cast("long").alias("recorded"),
        F.lit(0).cast("long").alias("seq"),
        F.lit(False).alias("deleted"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.lit(None).cast("map<string,array<string>>").alias("refs"),
        F.lit(None).cast("string").alias("dataset"),
    )
    start_col = F.col("ref_id") if inverse else F.col("start_id")
    res = out.select(
        start_col.alias("start_id"),
        "predicate",
        F.coalesce(F.col("_found"), stub).alias("related"),
    )
    if limit is not None:
        # reference limit semantics (get_related_test.go:56-180): a GLOBAL
        # cap filled in deterministic start/predicate/target order; the
        # continuation token is the last (start_id, predicate, related.id)
        # triple, re-entering as a keyset range predicate — no offset scan.
        # The predicate compares a STRUCT (lexicographic field-by-field,
        # matching the orderBy), never a concatenated string: "p:1|x" >
        # "p:10|x" under string order even though ("p:1","x") < ("p:10","x"),
        # so a concat key re-emits/drops rows for prefix-related ids.
        if continuation:
            # the CANONICAL token is the (start_id, predicate, related_id)
            # TUPLE — round-trip the last row's fields directly. The
            # pipe-joined string form is a convenience strictly for
            # tokens whose fields contain no '|'; with ids that may
            # contain pipes it is ambiguous by construction, so it is
            # rejected rather than mis-split (ADVICE r2).
            parts = continuation.split("|") if isinstance(continuation, str) else list(continuation)
            if len(parts) != 3:
                raise ValueError(
                    "continuation must be the (start_id, predicate, related_id) tuple "
                    "(canonical; required when ids contain '|') or an unambiguous "
                    "'start|predicate|related' string"
                )
            key = F.struct(F.col("start_id"), F.col("predicate"), F.col("related.id"))
            tok = F.struct(*[F.lit(p) for p in parts])
            res = res.filter(key > tok)
        res = res.orderBy("start_id", "predicate", F.col("related.id")).limit(int(limit))
    return res


def _edges_of_view(view: DataFrame, predicate: str | None) -> DataFrame:
    if predicate is None:
        ex = view.select(
            F.col("id").alias("start_id"),
            F.explode_outer("refs").alias("predicate", "_refs"),
            "dataset",
        )
    else:
        ex = view.select(
            F.col("id").alias("start_id"),
            F.lit(predicate).alias("predicate"),
            F.col("refs")[predicate].alias("_refs"),
            "dataset",
        )
    return ex.select("start_id", "predicate", F.explode("_refs").alias("ref_id"), "dataset")


def hop(related_df: DataFrame, df: DataFrame, predicate: str | None, inverse: bool = False,
        datasets: list[str] | None = None, single_version: bool = False) -> DataFrame:
    """Chain another traversal from a previous related() result — the
    transform-code pattern Query(Query(...)) (DOCUMENTATION.md:691-706).
    Keeps the original start_id; related becomes the new hop's entity."""
    starts = related_df.select(F.col("related.id").alias("id"), F.col("start_id").alias("origin_id"))
    nxt = related(df, starts.select("id"), predicate, inverse=inverse, datasets=datasets,
                  single_version=single_version)
    return (
        nxt.join(starts.withColumnRenamed("id", "start_id").distinct(), "start_id")
        .select(F.col("origin_id").alias("start_id"), "predicate", "related")
    )


def page(df: DataFrame, limit: int, continuation: str | None = None, key: str = "id") -> DataFrame:
    """Key-set pagination (limit + continuation, DOCUMENTATION.md:419).
    The continuation token is the last key of the previous page, so the
    filter pushes down instead of a global offset."""
    out = df
    if continuation:
        out = out.filter(F.col(key) > F.lit(continuation))
    return out.orderBy(key).limit(int(limit))
