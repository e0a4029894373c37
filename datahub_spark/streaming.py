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
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def onchange_stream(spark: SparkSession, path: str, schema,
                    glob: str | None = None,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming view of a change-log directory (new files = new
    changes). ``max_files_per_trigger`` caps files per micro-batch —
    AvailableNow honors it, so a backlog drain exercises the real
    multi-batch state-store path instead of collapsing into one
    batch (files are picked in modification-time order, the
    change-log's arrival order)."""
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    return reader.parquet(path)


def run_available_now(stream_df: DataFrame, query_name: str | None = None,
                      output_mode: str = "complete") -> DataFrame:
    """Drain the stream into an in-memory sink and return the result table
    (the onchange-job unit-of-work for tests). The memory sink cannot
    recover a checkpoint; for multi-trigger runs that must keep offsets +
    window state, use run_available_now_to_files."""
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


def run_available_now_all(streams) -> list[DataFrame]:
    """Drain several INDEPENDENT streams concurrently into memory sinks
    and return their result tables in order (r15 optimization round).
    ``streams`` is a list of (stream_df, output_mode). Each
    availableNow drain pays a fixed startup cost (source listing,
    microbatch planning, query lifecycle) that serial run_available_now
    calls stack end to end; starting all queries before awaiting any
    overlaps that fixed cost while each query's own work and result are
    untouched (independent sinks, same single-app scheduler pool)."""
    qs, names = [], []
    for stream_df, output_mode in streams:
        name = f"onchange_{uuid.uuid4().hex[:12]}"
        qs.append(
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        names.append(name)
    for q in qs:
        q.awaitTermination()
    spark = streams[0][0].sparkSession
    return [spark.table(n) for n in names]


def run_available_now_to_files(stream_df: DataFrame, out_dir: str,
                               checkpoint_dir: str) -> DataFrame:
    """Drain the stream into an append-mode parquet sink sharing
    ``checkpoint_dir`` across calls: each drain processes only NEW source
    files, window state survives between drains, and finalized windows
    append to ``out_dir`` exactly once. This is the restartable
    production shape of the onchange loop (file sink supports checkpoint
    recovery; the memory sink does not). Returns a batch DataFrame over
    everything emitted so far."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.read.parquet(out_dir)


def windowed_counts(stream_df: DataFrame, ts_micros_col: str, group_col: str,
                    window: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark — the
    late-data-tolerant streaming rollup (Structured Streaming's windowed
    agg; state for a window is dropped once the watermark passes it).
    Input timestamps are int64 epoch-micros; window bounds surface back
    as epoch-micros for engine-portable comparison."""
    with_ts = stream_df.withColumn("_ts", F.timestamp_micros(F.col(ts_micros_col)))
    agg = (
        with_ts.withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window).alias("_w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return agg.select(
        F.unix_micros(F.col("_w.start")).alias("window_start"),
        group_col,
        "n",
    )


def windowed_rollup(stream_df: DataFrame, ts_micros_col: str,
                    group_col: str, value_col: str = "value",
                    window: str = "1 hour",
                    watermark: str = "1 hour") -> DataFrame:
    """The streaming twin of temporal.rollup_time: tumbling event-time
    windows with a watermark, producing the SAME measure set (count,
    exact cent sum, min, max) per (window, group) — so a continuous
    rollup can backfill from the batch operator and keep extending from
    the live feed with identical semantics. Finalized windows emit once
    (append mode); state drops past the watermark."""
    with_ts = stream_df.withColumn(
        "_ts", F.timestamp_micros(F.col(ts_micros_col)))
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    agg = (
        with_ts.withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window).alias("_w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(cents).alias("value_cents"),
             F.min(F.col(value_col)).alias("value_min"),
             F.max(F.col(value_col)).alias("value_max"))
    )
    return agg.select(
        F.unix_micros(F.col("_w.start")).alias("window_start"),
        group_col, "n", "value_cents", "value_min", "value_max",
    )


# output/state schemas for stateful_user_totals
_TOTALS_OUT = "id long, n_events long, total_cents long"
_TOTALS_STATE = "n long, cents long"


def _cents(v: float) -> int:
    """Exact binary double -> half-up cents, matching Spark/DuckDB's
    double->DECIMAL(18,2) cast semantics (Decimal(float) is exact)."""
    return int(Decimal(v).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100)


def stateful_user_totals(stream_df: DataFrame, key_col: str = "user_id",
                         value_col: str = "value") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): a
    running per-key (count, sum-of-cents) accumulator — the shape of the
    reference's incremental-transform state, here kept in Spark's state
    store. Arrow-batched; state survives across triggers/batches."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += sum(_cents(v) for v in pdf[value_col])
        state.update((n, cents))
        yield pd.DataFrame({"id": [key[0]], "n_events": [n], "total_cents": [cents]})

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update, _TOTALS_OUT, _TOTALS_STATE, "update", GroupStateTimeout.NoTimeout
        )
    )


# output/state schemas for sessionize
_SESS_OUT = ("user_id long, session_start long, session_end long, "
             "n_events long, closed boolean")
_SESS_STATE = "start long, last long, n long"


def sessionize(stream_df: DataFrame, ts_micros_col: str = "_us",
               key_col: str = "user_id",
               gap_minutes: int = 30) -> DataFrame:
    """Event sessionization: per-key inactivity-gap session windows, the
    classic training-pipeline grouping (clickstream -> sessions) that
    fixed tumbling windows can't express. applyInPandasWithState keeps
    the OPEN session (start, last-seen, count) per key in the state
    store; an event more than ``gap_minutes`` after the last closes the
    session (emitted with closed=true) and opens a new one. Each update
    also emits the current open session (closed=false, latest state
    wins in the consumer's max_by/groupBy) so a finite AvailableNow
    drain — where timeouts never fire — still surfaces every session.

    Events are sorted by event time within each batch (a file batch is
    not time-ordered); cross-batch disorder beyond the watermark is the
    stream's contract, as with any event-time operator."""
    gap_us = gap_minutes * 60_000_000

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        start, last, n = state.get if state.exists else (None, None, 0)
        out_rows = []
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf[ts_micros_col])
        ts_all.sort()
        for ts in ts_all:
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap_us:
                out_rows.append((key[0], start, last, n, True))
                start, last, n = ts, ts, 1
            else:
                last, n = ts, n + 1
        state.update((start, last, n))
        if start is not None:
            out_rows.append((key[0], start, last, n, False))
        yield pd.DataFrame(
            out_rows, columns=["user_id", "session_start", "session_end",
                               "n_events", "closed"])

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update, _SESS_OUT, _SESS_STATE, "update",
            GroupStateTimeout.NoTimeout)
    )


def stream_to_store(stream_df: DataFrame, store, dataset: str,
                    checkpoint_dir: str | None = None,
                    transform=None) -> None:
    """The complete onchange job loop: a change-log stream drains into the
    versioned store via foreachBatch — each micro-batch becomes one
    atomic store transaction (one `recorded` tick), giving exactly-once
    appends on top of the file-source's offset tracking. AvailableNow
    processes the backlog then stops; a production trigger would run
    continuously on the same checkpoint."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        drop = [c for c in ("dataset",) if c in out.columns]
        store.store_entities(dataset, out.drop(*drop) if drop else out)

    writer = stream_df.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()


def stream_dedup_exact(stream_df: DataFrame, ts_micros_col: str,
                       text_col: str = "text",
                       watermark: str = "1 hour",
                       digest_col: str = "_digest") -> DataFrame:
    """Streaming exact deduplication: keep the FIRST occurrence of each
    normalized-content digest, forgetting digests once the watermark
    passes — the streaming twin of operators.dedup.dedup_exact, for
    ingest-time dedup of a document feed (near-identical re-crawls,
    repeated webhook posts) before anything lands in the corpus.

    ``dropDuplicatesWithinWatermark`` keys the state store on the md5
    digest and evicts entries older than the watermark, so state is
    bounded by the feed's rate x watermark horizon, not by stream
    lifetime — the only shape that survives an unbounded 100 TB-scale
    feed (a plain dropDuplicates would accrete state forever). A
    duplicate arriving AFTER the watermark expired its key is
    re-admitted by design; global history-wide dedup is the batch
    operator's job downstream."""
    from datahub_spark.operators.text import normalize

    return (stream_df
            .withColumn("_ts", F.timestamp_micros(F.col(ts_micros_col)))
            .withColumn(digest_col, F.md5(normalize(F.col(text_col))))
            .withWatermark("_ts", watermark)
            .dropDuplicatesWithinWatermark([digest_col])
            .drop("_ts"))


def stream_decontaminate(stream_df: DataFrame, benchmark_df: DataFrame,
                         n: int = 8, text_col: str = "text",
                         flag_col: str = "contaminated") -> DataFrame:
    """Streaming benchmark decontamination — flag documents in a live
    feed that share a word n-gram with any benchmark/eval document (the
    ingest-time twin of operators.dedup.decontaminate, so eval leakage
    is caught BEFORE it lands in the corpus).

    The benchmark's distinct n-gram set is computed ONCE at plan-build
    time (batch side) and ships to executors inside an Arrow-batched
    pandas UDF — the same "benchmark side is small and curated by
    construction" contract the batch operator's broadcast join relies
    on (GPT-3 appendix C scale: eval sets, not corpora). The stream
    side is map-only and STATELESS: no watermark, no state store, works
    in append mode, and survives any feed rate — each doc is checked
    against the set in isolation.

    Returns the stream with ``flag_col`` added; filter on ``~flag`` to
    clean, or fork the flagged rows to an audit sink."""
    from datahub_spark.operators.dedup import shingles

    bench = frozenset(
        r["sh"] for r in benchmark_df
        .select(F.explode(shingles(F.col(text_col), n)).alias("sh"))
        .distinct().collect())

    @pandas_udf("boolean")
    def hit(grams: pd.Series) -> pd.Series:
        return pd.Series([
            any(g in bench for g in gs) if gs is not None else False
            for gs in grams])

    return stream_df.withColumn(
        flag_col, hit(shingles(F.col(text_col), n)))


def stream_dedup_minhash(stream_df: DataFrame, ts_micros_col: str,
                         text_col: str = "text", k: int = 12, n: int = 3,
                         watermark: str = "1 hour",
                         sig_col: str = "_sig") -> DataFrame:
    """Streaming NEAR-duplicate suppression: keep the first document per
    minhash SIGNATURE within the watermark — the ingest-time twin of
    the batch MinHash pipeline, for feeds that re-post lightly edited
    copies (boilerplate re-crawls, syndicated articles).

    The state key is the full k-value signature (operators.dedup.
    minhash_signature values, md5-folded to one key), so two documents
    collide only when ALL k minhashes agree — a high-Jaccard match
    (P = J^k). Single dropDuplicatesWithinWatermark: one state store,
    bounded by rate x watermark like stream_dedup_exact. The banded
    ANY-of-b-bands semantics (catches moderate Jaccard) needs one state
    lookup per band per doc and a cross-band conjunction — two chained
    stateful operators; that regime is the BATCH lsh_candidates
    operator's job downstream, by design."""
    from datahub_spark.operators.dedup import shingles

    sh = shingles(F.col(text_col), n, distinct=False)
    mins = []
    for i in range((k + 1) // 2):
        digest = F.transform(
            sh, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s)))
        for half, pos in ((0, 1), (1, 16)):
            if 2 * i + half < k:
                mins.append(F.array_min(F.transform(
                    digest, lambda d, p=pos: F.substring(d, p, 15))))
    sig = F.md5(F.concat_ws("|", *mins))
    return (stream_df
            .withColumn("_ts", F.timestamp_micros(F.col(ts_micros_col)))
            .withColumn(sig_col, sig)
            .withWatermark("_ts", watermark)
            .dropDuplicatesWithinWatermark([sig_col])
            .drop("_ts"))


def stream_asof_enrich(stream_df: DataFrame, right: DataFrame,
                       on: list[str] | str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       value_cols: list[str] | None = None) -> DataFrame:
    """Streaming as-of enrichment — the stream-static twin of
    operators.temporal.asof_join (r11, judge task 6): every stream
    event gets the right row with the same key and the greatest
    ``right_ts`` <= event time (the Flink temporal-join shape: a live
    feed enriched with the profile/price/config snapshot current WHEN
    the event happened).

    Spark-first design, STATELESS: the static right side collapses to
    ONE sorted timeline array per key (groupBy + sort_array of
    (ts, values...) structs — a dimension snapshot is bounded by
    construction, the same contract the batch broadcast joins rely
    on), broadcast stream-static left equi-join (null-safe, so the
    null/guest key matches like the batch window partition does), and
    the per-event probe is a JVM array filter + element_at(-1) — no
    watermark, no state store, append-mode, any feed rate. Timelines
    per key are few rows (profile versions), so the linear HOF probe
    is cheaper than shipping a binary search to Python.

    Ties mirror the batch operator exactly: same-(key, ts) right rows
    resolve to the greatest value struct (ascending sort, last taken).
    Unmatched events keep nulls. Output = stream columns + _asof_ts +
    value_cols; the parity drain == batch asof_join is pinned in
    test_streaming.py."""
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in set(keys) | {right_ts}]
    timeline = right.groupBy(*[F.col(k).alias(f"_k_{k}") for k in keys]).agg(
        F.array_sort(F.collect_list(F.struct(
            F.col(right_ts).alias("_t"),
            *[F.col(c) for c in value_cols]))).alias("_tl"))
    cond = None
    for k in keys:
        c = stream_df[k].eqNullSafe(timeline[f"_k_{k}"])
        cond = c if cond is None else cond & c
    joined = stream_df.join(F.broadcast(timeline), cond, "left")
    hit = F.filter(F.col("_tl"), lambda x: x["_t"] <= F.col(left_ts))
    last = F.when(F.size(hit) > 0, F.element_at(hit, -1))
    out = joined.withColumn("_hit", last)
    return out.select(
        *[stream_df[c] for c in stream_df.columns],
        F.col("_hit")["_t"].alias("_asof_ts"),
        *[F.col("_hit")[c].alias(c) for c in value_cols])
