"""Temporal operators: as-of join and time-bucket rollups.

The as-of join ("latest right row at or before each left row's time")
is the canonical operator Spark's join vocabulary lacks — the
entity-enrichment twin of the store's point-in-time view (store.py
as_of), generalized to any keyed, timestamped frame: enrich events
with the profile/price/config that was current WHEN the event
happened.

Scale design — the union + carry-forward shape, NOT a range join:
a naive formulation (`l JOIN r ON key AND r.ts <= l.ts` + max-per-row)
explodes to |matches| rows per left row before pruning; a per-key
sort-merge with an interval condition is not an equi-join and falls
off Spark's hash paths. Instead both sides union into one stream
tagged by side, ONE keyed shuffle sorts each key's timeline once, and
a running `last(right_value, ignorenulls)` window carries the most
recent right row onto every left row — cost is one shuffle + one
window over |L| + |R| rows, independent of match fan-out. This is the
standard distributed as-of reformulation (kdb/Flink temporal joins use
the same timeline merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datahub_spark.fsio import ensure_recovered, parquet_atomic_overwrite


def _t_numeric(df: DataFrame, col: str):
    """The column as an order-preserving double — timestamp flavors
    (incl. TIMESTAMP_NTZ, which cannot cast to double) go through
    unix_micros (micro-distinct values stay distinct: current epochs
    spend ~31 of the 52 mantissa bits, leaving sub-microsecond
    resolution)."""
    dt = df.schema[col].dataType.simpleString()
    c = F.col(col)
    return (F.unix_micros(c.cast("timestamp")).cast("double") / 1e6
            if dt.startswith("timestamp") else c.cast("double"))


def _chunk_id(df: DataFrame, col: str, width: float):
    """floor(t / width) as a long — the time-chunk id for the skew
    paths; chunk WIDTH is seconds for timestamp columns. Any monotone
    mapping works — parity never depends on where the chunk cuts land
    (pinned with degenerate widths in tests)."""
    return F.floor(_t_numeric(df, col) / float(width)).cast("long")


def _ns_join(a: DataFrame, b: DataFrame, cols: list[str],
             how: str = "inner") -> DataFrame:
    """Null-safe equi-join on ``cols`` keeping a's columns plus b's
    non-key columns. The hot_chunk paths join on the USER's key columns
    — and the flagship hot key is the null/guest user, which plain SQL
    join equality silently drops while the default window plan keeps it
    as a partition. ``eqNullSafe`` (<=>) is still an equi-join key for
    Catalyst (ExtractEquiJoinKeys accepts EqualNullSafe), so the plan
    stays a hash/sort-merge join — null-key parity without losing the
    join strategy."""
    la, lb = a.alias("_nsl"), b.alias("_nsr")
    cond = None
    for c in cols:
        p = F.col(f"_nsl.`{c}`").eqNullSafe(F.col(f"_nsr.`{c}`"))
        cond = p if cond is None else cond & p
    keep = [F.col(f"_nsl.`{c}`").alias(c) for c in a.columns] + [
        F.col(f"_nsr.`{c}`").alias(c) for c in b.columns if c not in cols]
    return la.join(lb, cond, how).select(*keep)


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance: str | None = None,
              hot_chunk: float | None = None) -> DataFrame:
    """For every left row, attach the right row with the same key and
    the greatest ``right_ts`` <= ``left_ts`` (``direction="backward"``,
    inclusive) or the least ``right_ts`` >= ``left_ts`` ("forward").
    Unmatched left rows keep nulls. ``value_cols`` defaults to every
    right column except the keys and timestamp; the matched timestamp
    is returned as ``_asof_ts``.

    ``tolerance`` bounds the staleness of a match as a SQL expression
    appended to the matched timestamp: a backward match survives only
    if ``left_ts <= _asof_ts + tolerance`` (e.g. ``"INTERVAL 1 HOUR"``
    for timestamps, ``"3600"`` for numeric epochs); forward matches
    mirror it.

    Deterministic ties: several right rows on the same (key, ts)
    resolve to the greatest value struct in BOTH directions (the
    timeline orders right rows ascending by value within a timestamp,
    and the carry-forward keeps the last seen). Right rows never
    multiply left rows — the output has exactly one row per left row.

    Skew (``hot_chunk``): the default plan windows over
    ``partitionBy(key)``, so ONE pathological hot key (the null/guest
    user at web scale) serializes its whole |L|+|R| timeline into a
    single sorted task — and AQE cannot split a window partition.
    Passing ``hot_chunk`` (a time width: SECONDS for timestamp
    columns, native units for numerics) switches to the time-chunked
    carry: the timeline windows over ``(key, floor(t/chunk))`` —
    bounded tasks no matter how hot the key — each chunk also computes
    its FINAL carried right value, a bounded per-(key, chunk) summary
    table carries values ACROSS chunks with a second (tiny) window,
    and a (key, chunk)-keyed equi-join folds the boundary carry back
    into rows whose local carry found nothing. All chunk joins are
    NULL-SAFE (<=>, still hash-joinable), so the null key — the
    flagship hot key — matches itself exactly as the window partition
    does. Results are identical to the default plan (pinned in tests,
    incl. null keys); cost is one extra shuffle over the summary + the
    join, worth it only when a key's timeline outgrows a task."""
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    vcols = value_cols if value_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts]
    rv = F.struct(F.col(right_ts).alias("_asof_ts"),
                  *[F.col(c) for c in vcols])
    lrow = F.struct(*[F.col(c) for c in left.columns])

    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        rv.alias("_rv"),
        F.lit(None).cast(
            left.select(lrow.alias("x")).schema["x"].dataType
        ).alias("_lrow"),
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            right.select(rv.alias("x")).schema["x"].dataType
        ).alias("_rv"),
        lrow.alias("_lrow"),
    )
    u = r_side.unionByName(l_side)
    # _rv ascends within a timestamp in BOTH directions: the carry
    # keeps the last row seen, so the greatest value struct wins ties
    order = ([F.col("_t").asc(), F.col("_tag").asc(), F.col("_rv").asc()]
             if direction == "backward" else
             [F.col("_t").desc(), F.col("_tag").asc(), F.col("_rv").asc()])
    if hot_chunk is None:
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = (u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
               .filter(F.col("_tag") == 1))
    else:
        if float(hot_chunk) <= 0:
            raise ValueError("asof_join: hot_chunk must be > 0")
        u = u.withColumn("_ck", _chunk_id(u, "_t", float(hot_chunk)))
        wp = Window.partitionBy(*keys, "_ck").orderBy(*order)
        run = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        local = u.withColumn(
            "_ml", F.last("_rv", ignorenulls=True).over(run))
        # each chunk's FINAL carried value depends on the RIGHT side
        # only (it is the chunk's last right row in traversal order),
        # so the summary is a map-side-partial HashAggregate over
        # r_side alone — NOT a second window over the |L|+|R| union
        # (which would exchange+sort all rows twice: column pruning
        # makes the two branches' exchanges non-identical, defeating
        # ReuseExchange). Traversal-last right row as a struct max:
        # backward = max(t, rv); forward = max(-t, rv) (least t wins,
        # greatest rv on ties — matching the window's tie rule).
        rs = r_side.withColumn("_ck", _chunk_id(r_side, "_t",
                                                float(hot_chunk)))
        tn = _t_numeric(rs, "_t")
        pick = F.struct(
            (tn if direction == "backward" else -tn).alias("a"),
            F.col("_rv").alias("b"))
        rsum = (rs.groupBy(*keys, "_ck")
                .agg(F.max(pick).alias("_m"))
                .select(*keys, "_ck", F.col("_m.b").alias("_cf")))
        # the carry must step over LEFT-only chunks too, so the chunk
        # table is the distinct (key, chunk) universe of BOTH sides —
        # a narrow map-side-partial distinct, no sort — with the
        # rights' finals left-joined on
        universe = u.select(*keys, "_ck").distinct()
        summ = _ns_join(universe, rsum, keys + ["_ck"], "left")
        ck_order = (F.col("_ck").asc() if direction == "backward"
                    else F.col("_ck").desc())
        wc = (Window.partitionBy(*keys).orderBy(ck_order)
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = summ.withColumn(
            "_cin", F.last("_cf", ignorenulls=True).over(wc)) \
            .select(*keys, "_ck", "_cin")
        out = (_ns_join(local, carry, keys + ["_ck"])
               .withColumn("_m", F.coalesce(F.col("_ml"), F.col("_cin")))
               .filter(F.col("_tag") == 1))
    if tolerance is not None:
        in_tol = (F.col("_t") <= F.col("_m._asof_ts") + F.expr(tolerance)
                  if direction == "backward" else
                  F.col("_t") >= F.col("_m._asof_ts") - F.expr(tolerance))
        out = out.withColumn(
            "_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        F.col("_m._asof_ts").alias("_asof_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in vcols],
    )


_TRUNCS = {"year", "quarter", "month", "week", "day",
           "hour", "minute", "second"}


def rollup_time(df: DataFrame, ts_col: str = "ts", every: str = "hour",
                group_cols: list[str] | None = None,
                value_col: str = "value") -> DataFrame:
    """Time-bucketed rollup (the hypertable continuous-aggregate
    shape): one date_trunc bucket column + optional group columns ->
    exact counts and fixed-point value sums per bucket. ONE
    HashAggregate with map-side partials — the bucket column is
    map-side, so at 100 TB this is a single keyed shuffle whose key
    count is bounded by buckets x groups, not rows.

    Money-style doubles sum in cents (exact longs, engine-portable —
    an IEEE double sum is shuffle-order-dependent in its last ulp);
    min/max stay exact on doubles."""
    if every not in _TRUNCS:
        raise ValueError(f"rollup_time: unsupported bucket {every!r}")
    groups = [F.date_trunc(every, F.col(ts_col)).alias("bucket")] + [
        F.col(c) for c in (group_cols or [])]
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    return (df.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("value_cents"),
        F.min(F.col(value_col)).alias("value_min"),
        F.max(F.col(value_col)).alias("value_max"),
    ))


def range_join(points: DataFrame, ranges: DataFrame, point_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               on: list[str] | str | None = None,
               bin_width: float | int = 1) -> DataFrame:
    """Interval-membership join: every (point, range) pair with
    ``lo <= point <= hi`` (and equal join keys, when ``on`` is given) —
    the second join Spark's vocabulary lacks (an inequality condition
    alone degenerates to BroadcastNestedLoop/cartesian). IP-to-block,
    time-window membership, price-tier lookup.

    Scale shape — binning, the same trick range-join-optimizing engines
    apply: both sides map to fixed-width bins (points to ONE bin,
    ranges EXPLODE over every bin they overlap), the join runs as a
    pure equi-join on (keys, bin), and the exact interval predicate
    filters residuals. Each qualifying pair is produced exactly once
    (a point lives in exactly one bin), so no distinct pass. Cost:
    range rows multiply by ~(width/bin_width + 1) — pick ``bin_width``
    near the typical range width so the explode factor stays ~2 and
    bins stay selective. Plan-pinned: no cartesian/nested-loop node.

    Numeric domains only (cast timestamps to epoch first); inclusive
    on both ends, matching the SQL BETWEEN the oracle runs."""
    keys = [on] if isinstance(on, str) else list(on or [])
    w = float(bin_width)
    if w <= 0:
        raise ValueError("range_join: bin_width must be > 0")
    p_bin = F.floor(F.col(point_col).cast("double") / w).cast("long")
    lo_bin = F.floor(F.col(lo_col).cast("double") / w).cast("long")
    hi_bin = F.floor(F.col(hi_col).cast("double") / w).cast("long")
    r = ranges.withColumn(
        "_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    p = points.withColumn("_bin", p_bin)
    joined = p.join(r, keys + ["_bin"]).filter(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col)))
    return joined.drop("_bin")


def sessionize(df: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap: str = "INTERVAL 30 MINUTE",
               session_col: str = "session_id",
               hot_chunk: float | None = None) -> DataFrame:
    """Batch sessionization — the historical twin of
    streaming.sessionize's state-store windows: events of a key belong
    to one session while consecutive gaps stay <= ``gap`` (SQL interval
    for timestamps, or a numeric-literal string for epoch longs). The
    session id is ``<key>#<epoch-or-value of the session's first
    event>`` — deterministic, stable under reprocessing, and identical
    to what the streaming operator would have assigned.

    Plan: ONE keyed shuffle (window by key ordered by ts) computing the
    lag gap and a running sum of session-start flags — no self-join, no
    explode; cost linear in events.

    Skew (``hot_chunk``, same contract as asof_join's): the default
    plan windows over ``partitionBy(key)``, so one pathological hot
    key sorts its whole event history in a single task. With
    ``hot_chunk`` (a time width: SECONDS for timestamps, native units
    for numerics) sessions build LOCALLY per (key, time-chunk) —
    bounded tasks — and a bounded per-(key, chunk) summary merges
    sessions ACROSS chunk boundaries: a chunk's first local session
    adopts the carried session start when its first event is within
    ``gap`` of the previous chunk's last event; the carry itself is a
    second (tiny) window over the summary, with a chunk passing the
    carry through only when it is single-session AND boundary-
    connected. The (key, chunk) merge join is null-safe, so null-key
    events sessionize exactly as the default plan's null window
    partition. Identical output to the default plan (pinned). Honest
    cost note: unlike asof_join's chunked path (whose summary comes
    from the right side alone), the chunk summary here needs the local
    session columns, so the (key, chunk) window pipeline executes
    twice (once per DAG branch — column pruning defeats exchange
    reuse); tasks stay bounded either way, which is the point. Prefer
    the default plan unless a key is genuinely hot."""
    g = F.expr(gap)
    if hot_chunk is None:
        w = Window.partitionBy(key_col).orderBy(ts_col)
        prev = F.lag(F.col(ts_col)).over(w)
        new_session = (prev.isNull()
                       | (F.col(ts_col) > prev + g)).cast("long")
        wsum = (Window.partitionBy(key_col).orderBy(ts_col)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        seq = F.sum(new_session).over(wsum)
        start = F.first(F.col(ts_col)).over(
            Window.partitionBy(key_col, seq).orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return (df.withColumn("_seq", seq)
                .withColumn(session_col,
                            F.concat(F.col(key_col).cast("string"),
                                     F.lit("#"), start.cast("string")))
                .drop("_seq"))
    if float(hot_chunk) <= 0:
        raise ValueError("sessionize: hot_chunk must be > 0")
    d = df.withColumn("_ck", _chunk_id(df, ts_col, float(hot_chunk)))
    wp = Window.partitionBy(key_col, "_ck").orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(wp)
    new_session = (prev.isNull() | (F.col(ts_col) > prev + g)).cast("long")
    run = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = d.withColumn("_seq", F.sum(new_session).over(run))
    start = F.first(F.col(ts_col)).over(
        Window.partitionBy(key_col, "_ck", "_seq").orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = local.withColumn("_start", start)
    # bounded summary: one row per populated (key, chunk)
    summ = local.groupBy(key_col, "_ck").agg(
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
        F.max("_seq").alias("_nsess"),
        F.max("_start").alias("_last_start"),
    )
    wc = Window.partitionBy(key_col).orderBy("_ck")
    connected = (F.lag("_last_ts").over(wc).isNotNull()
                 & (F.col("_first_ts") <= F.lag("_last_ts").over(wc) + g))
    # the carry holds the start of the last session as of each chunk;
    # a single-session connected chunk passes the previous carry on
    breaker = ~(connected & (F.col("_nsess") == 1))
    carried = F.last(
        F.when(breaker, F.col("_last_start")), ignorenulls=True
    ).over(wc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    summ = (summ.withColumn("_conn", connected)
            .withColumn("_carry", carried)
            .withColumn("_base", F.lag("_carry").over(wc))
            .select(key_col, "_ck", "_conn", "_base"))
    out = _ns_join(local, summ, [key_col, "_ck"])
    eff = F.when((F.col("_seq") == 1) & F.col("_conn"), F.col("_base")) \
        .otherwise(F.col("_start"))
    return (out.withColumn(
        session_col,
        F.concat(F.col(key_col).cast("string"), F.lit("#"),
                 eff.cast("string")))
        .drop("_ck", "_seq", "_start", "_conn", "_base"))


def materialize_rollup(new_events: DataFrame, path: str,
                       ts_col: str = "ts", every: str = "hour",
                       group_cols: list[str] | None = None,
                       value_col: str = "value") -> DataFrame:
    """Continuous-aggregate maintenance (the hypertable refresh): fold
    a NEW batch of events into a persisted rollup table without
    re-reading history. Works because every rollup measure is
    decomposable — counts and cent-sums add, mins min, maxes max — so
    the merge is rollup(new) unioned with the stored table and
    re-aggregated PER BUCKET KEY: cost is |stored buckets| +
    |new buckets|, never the raw history. Returns the merged frame
    (also written back to ``path``). First call bootstraps the table.

    At 100 TB of history this is the only viable shape: the raw events
    are touched exactly once, when they arrive; every refresh after
    that works on the bounded bucket table."""
    spark = new_events.sparkSession
    fresh = rollup_time(new_events, ts_col, every, group_cols, value_col)
    groups = ["bucket"] + list(group_cols or [])
    # bootstrap ONLY on true absence: a transient read failure
    # (permissions, corrupted footer) must raise, not silently
    # overwrite the whole persisted history with just this batch —
    # and a swap that crashed mid-window (target absent, _old-*
    # generation beside it) must RESTORE the history first, not
    # bootstrap fresh (ensure_recovered does the restore)
    if ensure_recovered(spark, path):
        both = spark.read.parquet(path).unionByName(fresh)
    else:
        both = fresh
    merged = (both.groupBy(*groups)
              .agg(F.sum("n").cast("long").alias("n"),
                   F.sum("value_cents").cast("long").alias("value_cents"),
                   F.min("value_min").alias("value_min"),
                   F.max("value_max").alias("value_max")))
    # stage-write + rename swap (fsio): the merged plan reads `path`,
    # so the old generation must survive until the stage is complete —
    # and survive a crash at ANY step, which localCheckpoint (executor
    # -pinned) did not guarantee
    parquet_atomic_overwrite(merged, path)
    return spark.read.parquet(path)
