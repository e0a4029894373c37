"""As-of join + time rollups: DuckDB parity (native ASOF JOIN as the
oracle) and deterministic-tie / tolerance / direction semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from datahub_spark.operators import temporal as TP
from tests.oracle import compare


def test_asof_join_duckdb_parity_on_events(spark):
    """Enrich every event with the user's profile score current at the
    event time — Spark's union/carry-forward == DuckDB's native ASOF
    JOIN, over the real events table."""
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    # synthetic profile updates: 4 per user, unique (user_id, ts)
    profiles = (spark.range(200)
                .select((F.col("id") % 50).alias("user_id"),
                        F.timestamp_micros(
                            (F.lit(1704067200000000)
                             + (F.col("id") / 50).cast("long")
                             * 86400000000 * 7
                             + (F.col("id") % 50) * 1000000)
                        ).alias("ts"),
                        (F.col("id") * 37 % 1000).alias("score")))
    got = TP.asof_join(events, profiles, on="user_id",
                       value_cols=["score"]) \
        .select("event_id", "_asof_ts", "score")
    profiles.createOrReplaceTempView("_profiles_tmp")
    prof_rows = ", ".join(
        f"({r['user_id']}, TIMESTAMP '{r['ts']}', {r['score']})"
        for r in profiles.collect())
    sql = f"""
    WITH p(user_id, pts, score) AS (VALUES {prof_rows})
    SELECT e.event_id, p.pts AS _asof_ts, p.score
    FROM events e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.pts
    """
    ok, msg = compare(got, sql, sf)
    assert ok, msg


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 4), (2, 7), (3, 9)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (2, 8, "c")], "k long, ts long, v string")

    # backward: greatest right ts <= left ts, equal ts matches;
    # no right row at all -> nulls; one output row per left row
    out = {(r["k"], r["ts"]): (r["_asof_ts"], r["v"])
           for r in TP.asof_join(left, right, on="k").collect()}
    assert len(out) == 4
    assert out[(1, 10)] == (10, "b")
    assert out[(1, 4)] == (None, None)
    assert out[(2, 7)] == (None, None)
    assert out[(3, 9)] == (None, None)

    # forward: least right ts >= left ts
    fwd = {(r["k"], r["ts"]): (r["_asof_ts"], r["v"])
           for r in TP.asof_join(left, right, on="k",
                                 direction="forward").collect()}
    assert fwd[(1, 4)] == (5, "a")
    assert fwd[(1, 10)] == (10, "b")
    assert fwd[(2, 7)] == (8, "c")
    assert fwd[(3, 9)] == (None, None)

    # tolerance: stale matches null out
    tol = {(r["k"], r["ts"]): r["v"]
           for r in TP.asof_join(left, right, on="k",
                                 tolerance="2").collect()}
    assert tol[(1, 10)] == "b"      # exact-time match survives
    assert tol[(1, 4)] is None

    # deterministic ties: duplicate right (k, ts) resolves to the
    # greatest value struct
    dup = spark.createDataFrame(
        [(1, 5, "x"), (1, 5, "z"), (1, 5, "y")], "k long, ts long, v string")
    got = TP.asof_join(left.filter("ts = 10"), dup, on="k").collect()
    assert got[0]["v"] == "z"

    # right rows never multiply left rows
    assert TP.asof_join(left, dup, on="k").count() == left.count()


def test_rollup_time_duckdb_parity(spark):
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    got = TP.rollup_time(events, "ts", "day", ["event_type"])
    sql = """
    SELECT date_trunc('day', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           MIN(value) AS value_min, MAX(value) AS value_max
    FROM events GROUP BY 1, 2
    """
    ok, msg = compare(got, sql, sf)
    assert ok, msg

    import pytest
    with pytest.raises(ValueError):
        TP.rollup_time(events, "ts", "fortnight")


def test_range_join_duckdb_parity_and_plan(spark):
    """Binned range join == DuckDB's BETWEEN join over the events
    table; the plan contains no cartesian/nested-loop node."""
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    tiers = spark.createDataFrame(
        [("purchase", 0.0, 50.0, "small"),
         ("purchase", 50.0, 150.0, "mid"),
         ("purchase", 150.0, 1e6, "large"),
         ("error", 100.0, 200.0, "bad")],
        "event_type string, lo double, hi double, tier string")
    got = TP.range_join(events, tiers, "value", on="event_type",
                        bin_width=100.0) \
        .select("event_id", "tier")
    tier_rows = ", ".join(
        f"('{r['event_type']}', {r['lo']}, {r['hi']}, '{r['tier']}')"
        for r in tiers.collect())
    sql = f"""
    WITH t(event_type, lo, hi, tier) AS (VALUES {tier_rows})
    SELECT e.event_id, t.tier
    FROM events e JOIN t ON e.event_type = t.event_type
                        AND e.value BETWEEN t.lo AND t.hi
    """
    ok, msg = compare(got, sql, sf)
    assert ok, msg
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan

    # boundary inclusivity + exactly-once per qualifying pair
    pts = spark.createDataFrame([(1, 50.0, "purchase")],
                                "event_id long, value double, event_type string")
    hits = TP.range_join(pts, tiers, "value", on="event_type",
                         bin_width=10.0).collect()
    assert sorted(r["tier"] for r in hits) == ["mid", "small"]

    import pytest
    with pytest.raises(ValueError):
        TP.range_join(pts, tiers, "value", bin_width=0)


def test_sessionize_batch_duckdb_parity(spark):
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    got = TP.sessionize(events, gap="INTERVAL 30 MINUTE") \
        .select("event_id", "session_id")
    sql = """
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS ns
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT event_id, user_id, ts,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS seq
      FROM g
    )
    SELECT event_id,
           CAST(user_id AS VARCHAR) || '#' ||
           CAST(MIN(ts) OVER (PARTITION BY user_id, seq) AS VARCHAR)
           AS session_id
    FROM s
    """
    ok, msg = compare(got, sql, sf)
    assert ok, msg

    # gap semantics on a synthetic long: 3 events, gap 10 -> the third
    # (delta 11) starts a new session
    df = spark.createDataFrame(
        [(1, 0), (1, 10), (1, 21), (2, 5)], "user_id long, ts long")
    out = {(r["user_id"], r["ts"]): r["session_id"]
           for r in TP.sessionize(df, gap="10").collect()}
    assert out[(1, 0)] == out[(1, 10)] == "1#0"
    assert out[(1, 21)] == "1#21"
    assert out[(2, 5)] == "2#5"


def test_materialize_rollup_incremental_equals_batch(spark, tmp_path):
    """Two incremental refreshes == one batch rollup over everything —
    the continuous-aggregate contract; history is never re-read."""
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    a, b = events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1")
    path = str(tmp_path / "rollup")
    TP.materialize_rollup(a, path, every="day", group_cols=["event_type"])
    got = TP.materialize_rollup(b, path, every="day",
                                group_cols=["event_type"])
    want = TP.rollup_time(events, "ts", "day", ["event_type"])
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_asof_join_composite_keys(spark):
    left = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 10)], "k long, sub string, ts long")
    right = spark.createDataFrame(
        [(1, "x", 5, "vx"), (1, "y", 7, "vy"), (1, "y", 11, "late")],
        "k long, sub string, ts long, v string")
    out = {(r["k"], r["sub"]): r["v"]
           for r in TP.asof_join(left, right, on=["k", "sub"]).collect()}
    assert out == {(1, "x"): "vx", (1, "y"): "vy"}


def _skewed_timeline(spark):
    """One hot key holding ~50% of events + 60 cold keys; right side
    has updates for every key including the hot one."""
    ev = spark.range(40_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(1 + F.col("id") % 60).alias("k"),
        (F.col("id") * 13 % 100_000).alias("ts"),
        F.col("id").alias("event_id"))
    prof = spark.range(600).select(
        (F.col("id") % 61).alias("k"),
        (F.col("id") * 977 % 100_000).alias("ts"),
        (F.col("id") * 7 % 1000).alias("score"))
    return ev, prof


def test_asof_join_hot_chunk_equals_plain(spark):
    """The time-chunked carry (skew mitigation) is bit-identical to
    the single-window plan, both directions, with tolerance."""
    ev, prof = _skewed_timeline(spark)
    for direction in ("backward", "forward"):
        for tol in (None, "5000"):
            plain = sorted(map(tuple, TP.asof_join(
                ev, prof, on="k", value_cols=["score"],
                direction=direction, tolerance=tol).collect()))
            chunked = sorted(map(tuple, TP.asof_join(
                ev, prof, on="k", value_cols=["score"],
                direction=direction, tolerance=tol,
                hot_chunk=1000.0).collect()))
            assert chunked == plain, (direction, tol)
    # degenerate chunk widths still agree (everything in one chunk /
    # one row per chunk)
    plain = sorted(map(tuple, TP.asof_join(
        ev, prof, on="k", value_cols=["score"]).collect()))
    for width in (1e9, 1.0):
        got = sorted(map(tuple, TP.asof_join(
            ev, prof, on="k", value_cols=["score"],
            hot_chunk=width).collect()))
        assert got == plain, width
    import pytest
    with pytest.raises(ValueError):
        TP.asof_join(ev, prof, on="k", hot_chunk=0)


def test_asof_join_hot_chunk_timestamps(spark):
    """hot_chunk on real timestamp columns (chunk width in seconds):
    parity against the plain plan on the events table."""
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    profiles = (spark.range(200)
                .select((F.col("id") % 50).alias("user_id"),
                        F.timestamp_micros(
                            (F.lit(1704067200000000)
                             + (F.col("id") / 50).cast("long")
                             * 86400000000 * 7
                             + (F.col("id") % 50) * 1000000)
                        ).alias("ts"),
                        (F.col("id") * 37 % 1000).alias("score")))
    plain = sorted(map(tuple, TP.asof_join(
        events, profiles, on="user_id", value_cols=["score"])
        .select("event_id", "_asof_ts", "score").collect()))
    chunked = sorted(map(tuple, TP.asof_join(
        events, profiles, on="user_id", value_cols=["score"],
        hot_chunk=86400.0 * 3)
        .select("event_id", "_asof_ts", "score").collect()))
    assert chunked == plain


def test_asof_join_forward_tie_greatest(spark):
    """Duplicate right (k, ts) resolves to the GREATEST value struct
    in the forward direction too (r9: forward previously kept the
    smallest, contradicting the documented contract)."""
    left = spark.createDataFrame([(1, 3)], "k long, ts long")
    dup = spark.createDataFrame(
        [(1, 5, "x"), (1, 5, "z"), (1, 5, "y")], "k long, ts long, v string")
    got = TP.asof_join(left, dup, on="k", direction="forward").collect()
    assert got[0]["v"] == "z"
    chunked = TP.asof_join(left, dup, on="k", direction="forward",
                           hot_chunk=2.0).collect()
    assert chunked[0]["v"] == "z"


def test_materialize_rollup_read_errors_raise(spark, tmp_path):
    """A persisted-but-unreadable rollup must RAISE, not silently
    bootstrap-and-overwrite history (r9: the bare-except bootstrap
    would have discarded the whole aggregate)."""
    import pytest
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    path = str(tmp_path / "rollup")
    # path exists but holds garbage, not parquet
    import os
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "w") as f:
        f.write("not parquet at all")
    with pytest.raises(Exception):
        TP.materialize_rollup(events, path, every="day")
    # the garbage is untouched (nothing overwrote the path)
    with open(os.path.join(path, "part-00000.parquet")) as f:
        assert f.read() == "not parquet at all"


def test_atomic_overwrite_failed_write_keeps_old(spark, tmp_path):
    """parquet_atomic_overwrite: a crash DURING the stage write (plan
    raises mid-execution) leaves the previous generation intact and
    readable — the crash-between-steps contract."""
    import pytest
    from datahub_spark.fsio import parquet_atomic_overwrite
    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)
    from pyspark.sql.functions import udf

    @udf("long")
    def boom(x):
        raise RuntimeError("simulated executor crash")

    bad = spark.range(5).select(boom("id").alias("id"))
    with pytest.raises(Exception):
        parquet_atomic_overwrite(bad, path)
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == \
        list(range(10))


def test_sessionize_hot_chunk_equals_plain(spark):
    """r9: the time-chunked sessionization (skew mitigation) assigns
    EXACTLY the ids of the single-window plan — sessions spanning many
    chunks, multi-session chunks, per-key isolation, numeric and
    timestamp gaps all included."""
    # synthetic longs: hot key 0 with long runs + breaks that land on
    # and off chunk boundaries; cold keys interleaved
    rows = []
    t = 0
    for i in range(400):                 # key 0: gaps of 3 with breaks
        t += 3 if i % 37 else 50         # break every 37 events
        rows.append((0, t))
    for k in range(1, 8):                # cold keys
        for i in range(25):
            rows.append((k, k * 1000 + i * (4 if i % 5 else 40)))
    df = spark.createDataFrame(rows, "user_id long, ts long")
    plain = {(r["user_id"], r["ts"]): r["session_id"]
             for r in TP.sessionize(df, gap="10").collect()}
    for width in (7.0, 100.0, 1e9, 1.0):
        chunked = {(r["user_id"], r["ts"]): r["session_id"]
                   for r in TP.sessionize(df, gap="10",
                                          hot_chunk=width).collect()}
        assert chunked == plain, width

    # timestamp columns on the real events table
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    p = sorted(map(tuple, TP.sessionize(
        events, gap="INTERVAL 30 MINUTE")
        .select("event_id", "session_id").collect()))
    c = sorted(map(tuple, TP.sessionize(
        events, gap="INTERVAL 30 MINUTE", hot_chunk=3600.0)
        .select("event_id", "session_id").collect()))
    assert c == p

    import pytest
    with pytest.raises(ValueError):
        TP.sessionize(events, hot_chunk=0)


def test_asof_hot_chunk_summary_is_rights_only(spark):
    """r9: the chunked path's chunk-final summary aggregates the RIGHT
    side only — exactly TWO Window operators in the plan (the |L|+|R|
    local carry + the bounded cross-chunk carry), never a third window
    re-sorting the whole union (the shape that doubled the 200M leg's
    cost: 85.3s -> 36.6s after the rewrite)."""
    ev, prof = _skewed_timeline(spark)
    plan = TP.asof_join(ev, prof, on="k", value_cols=["score"],
                        hot_chunk=1000.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 2, plan


def test_asof_hot_chunk_null_keys_parity(spark):
    """r10 (ADVICE): the flagship hot_chunk use case IS the null/guest
    user — plain equi-joins drop null keys while the default window
    plan keeps them as a partition. The chunked carry joins are
    null-safe; results must be bit-identical to the default plan with
    nulls on BOTH sides, both directions, and the output must keep
    exactly one row per left row."""
    ev = spark.createDataFrame(
        [(None, 10), (None, 25), (None, 40), (1, 10), (1, 40), (2, 15)],
        "k int, ts long").withColumn("eid", F.monotonically_increasing_id())
    prof = spark.createDataFrame(
        [(None, 5, 100), (None, 30, 200), (1, 20, 300), (2, 50, 400)],
        "k int, ts long, score int")
    n_left = ev.count()
    for direction in ("backward", "forward"):
        plain = sorted(map(repr, TP.asof_join(
            ev, prof, on="k", value_cols=["score"],
            direction=direction).collect()))
        for width in (7.0, 1000.0, 1.0):
            chunked = sorted(map(repr, TP.asof_join(
                ev, prof, on="k", value_cols=["score"],
                direction=direction, hot_chunk=width).collect()))
            assert chunked == plain, (direction, width)
            assert len(chunked) == n_left, (direction, width)
    # sanity: the null-key left rows actually MATCH null-key rights
    got = {(r["k"], r["ts"]): r["score"] for r in TP.asof_join(
        ev, prof, on="k", value_cols=["score"], hot_chunk=7.0).collect()}
    assert got[(None, 10)] == 100 and got[(None, 40)] == 200


def test_sessionize_hot_chunk_null_keys_parity(spark):
    """r10 (ADVICE): null-key events sessionize identically under the
    chunked merge (null-safe join) and the default window plan."""
    rows = [(None, t) for t in (0, 5, 30, 33, 90)] + \
           [(7, t) for t in (0, 4, 50)]
    df = spark.createDataFrame(rows, "user_id int, ts long")
    plain = {(r["user_id"], r["ts"]): r["session_id"]
             for r in TP.sessionize(df, gap="10").collect()}
    for width in (7.0, 100.0, 1.0):
        chunked = {(r["user_id"], r["ts"]): r["session_id"]
                   for r in TP.sessionize(df, gap="10",
                                          hot_chunk=width).collect()}
        assert chunked == plain, width
    assert len(plain) == len(rows)


def test_rollup_recovers_crashed_swap_window(spark, tmp_path):
    """r10 (ADVICE): a crash BETWEEN the two swap renames leaves the
    target absent and the whole previous generation as _old-<name>-*.
    Re-running the refresh must restore that history and fold the new
    batch in — never bootstrap from the batch alone."""
    import os
    import shutil

    path = str(tmp_path / "roll")
    b1 = spark.createDataFrame(
        [(f"2024-01-01 0{h}:30:00", 10.0 * (h + 1)) for h in range(3)],
        "ts string, value double").selectExpr(
        "CAST(ts AS TIMESTAMP) ts", "value")
    TP.materialize_rollup(b1, path, every="hour")
    # simulate the crash window: target renamed away, stage lost
    orphan = str(tmp_path / "_old-roll-deadbeef")
    os.rename(path, orphan)
    stale = str(tmp_path / "_stage-roll-cafe")
    shutil.copytree(orphan, stale)  # a dead stage dir, also left over
    b2 = spark.createDataFrame(
        [("2024-01-01 00:45:00", 5.0), ("2024-01-01 03:10:00", 7.0)],
        "ts string, value double").selectExpr(
        "CAST(ts AS TIMESTAMP) ts", "value")
    merged = TP.materialize_rollup(b2, path, every="hour")
    rows = {str(r["bucket"]): (r["n"], r["value_cents"])
            for r in merged.collect()}
    # hour 00 = batch1's 10.00 + batch2's 5.00; hour 03 = batch2 only
    assert rows["2024-01-01 00:00:00"] == (2, 1500)
    assert rows["2024-01-01 01:00:00"] == (1, 2000)
    assert rows["2024-01-01 02:00:00"] == (1, 3000)
    assert rows["2024-01-01 03:00:00"] == (1, 700)
    # orphans cleaned up by the recovery
    leftovers = [p for p in os.listdir(tmp_path)
                 if p.startswith(("_old-roll-", "_stage-roll-"))]
    assert leftovers == [], leftovers


def test_atomic_overwrite_refuses_orphaned_generation(spark, tmp_path):
    """parquet_atomic_overwrite must refuse to bury a recoverable _old
    generation when the target is missing (the caller's plan was built
    against an absent table)."""
    import os

    import pytest

    from datahub_spark.fsio import ensure_recovered, parquet_atomic_overwrite

    path = str(tmp_path / "t")
    spark.range(5).write.parquet(path)
    os.rename(path, str(tmp_path / "_old-t-beef"))
    with pytest.raises(IOError, match="ensure_recovered"):
        parquet_atomic_overwrite(spark.range(3), path)
    assert ensure_recovered(spark, path)
    assert spark.read.parquet(path).count() == 5
    # absent path with no orphans: plain bootstrap, returns False
    assert not ensure_recovered(spark, str(tmp_path / "never"))
