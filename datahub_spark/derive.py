"""Derive a larger scale factor from driver testdata by key-offset
replication.

The driver ships sf0.001/0.01/0.1 only, but the bench bar is "within 2x
of baseline at the same scale factor" with plans that would survive
100x — which sf0.1 cannot resolve: every headliner sits in a 0.4-2s
JVM-fixed-cost noise band. This module replicates a base directory
REPL times into a derived directory (default repo-local .derived/),
preserving the properties the workloads measure:

  * referential integrity — every key/foreign-key column in replica r
    is shifted by r * (max(base key)+1), so joins (customer->orders->
    lineitem, nation dims, events->user versions) have identical
    per-row fan-out at every replica; dims (region, nation) stay fixed,
    as TPC-H itself scales them.
  * near-dup structure scales LINEARLY, not quadratically — documents
    in replica r>0 get a per-replica suffix appended to every
    whitespace token. Word-shingle space is remapped by a bijection:
    within-replica Jaccard/minhash/simhash similarity is preserved
    EXACTLY, while cross-replica docs share no shingles (suffix differs),
    so MinHash/LSH pair counts scale ~REPL x, matching a real corpus
    10x larger rather than one with 10 copies of itself.
  * embedding geometry scales linearly — replica r's vectors get a
    circular dimension shift by r*(dim//REPL). A common coordinate
    permutation preserves all within-replica cosines exactly; cross-
    replica directions decorrelate, so LSH/IVF bucket loads grow ~REPL x.

Everything is deterministic (no wall-clock, no RNG) so repeated builds
are byte-stable and a cached build can be trusted via the marker file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datahub_spark.ingest import TABLES

_MARKER = "_DERIVED.json"
# version 2 (r15 optimization round): tables are written as ~core-count
# part files (was rows//20_000-capped, which left e.g. the x10
# documents table as TWO files — a 2-task scan on a 32-core box that
# every consumer then paid a blanket repartition shuffle to undo; see
# ingest.load_tables). Bumping the version invalidates cached derived
# dirs so the driver regenerates them in the new layout.
_VERSION = 2

# key columns shifted per-replica: table -> [(column, offset_source_table, offset_source_key)]
# offset source is where the key's domain lives (fkeys shift by the
# PARENT table's offset so joins stay aligned).
_SHIFTS: dict[str, list[tuple[str, str, str]]] = {
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [("o_orderkey", "orders", "o_orderkey"),
               ("o_custkey", "customer", "c_custkey")],
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "events": [("event_id", "events", "event_id"),
               ("user_id", "events", "user_id")],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}
# dimension tables replicate once (fixed, like TPC-H nation/region)
_FIXED = {"region", "nation"}


def derived_dir_for(base_dir: str, repl: int, root: str | None = None) -> str:
    base_name = os.path.basename(base_dir.rstrip("/"))
    root = root or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".derived")
    return os.path.abspath(os.path.join(root, f"{base_name}x{repl}"))


def _marker_ok(out_dir: str, base_dir: str, repl: int) -> bool:
    try:
        with open(os.path.join(out_dir, _MARKER)) as fh:
            m = json.load(fh)
        return (m.get("base") == os.path.abspath(base_dir)
                and m.get("repl") == repl
                and m.get("version") == _VERSION
                and all(os.path.exists(os.path.join(out_dir, f"{t}.parquet"))
                        for t in TABLES))
    except (OSError, ValueError):
        return False


def ensure_derived(spark: SparkSession, base_dir: str, repl: int,
                   root: str | None = None) -> str:
    """Build (or reuse a cached) repl-x replication of base_dir.

    Returns the derived directory containing the same
    ``{table}.parquet`` layout the driver testdata uses."""
    out_dir = derived_dir_for(base_dir, repl, root)
    if _marker_ok(out_dir, base_dir, repl):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # events.ts is copied through untouched, so whatever physical
    # encoding the base uses (timestamp[us] today, TIMESTAMP(NANOS)
    # historically — see ingest._ts_micros) round-trips read-compatible.
    base: dict[str, DataFrame] = {
        t: spark.read.parquet(f"{base_dir}/{t}.parquet") for t in TABLES
    }
    # offset = max(key)+1 per key domain, computed once from the base
    offsets: dict[tuple[str, str], int] = {}
    for shifts in _SHIFTS.values():
        for _, src_t, src_k in shifts:
            if (src_t, src_k) not in offsets:
                offsets[(src_t, src_k)] = (
                    base[src_t].agg(F.max(src_k)).first()[0] + 1
                )

    par = spark.sparkContext.defaultParallelism
    for t in TABLES:
        df = base[t]
        if t in _FIXED:
            out = df
        else:
            rep = F.col("__r")
            out = df.crossJoin(
                spark.range(repl).select(F.col("id").alias("__r"))
            )
            for col, src_t, src_k in _SHIFTS[t]:
                out = out.withColumn(
                    col, (F.col(col) + rep * offsets[(src_t, src_k)])
                    .cast(dict(df.dtypes)[col]))
            if t == "documents":
                # bijective shingle remap for r>0: suffix every token
                suffixed = F.regexp_replace(
                    F.col("text"), r"(\S+)",
                    F.concat(F.lit("$1~"), rep.cast("string")))
                out = out.withColumn(
                    "text", F.when(rep == 0, F.col("text")).otherwise(suffixed)
                ).withColumn("n_chars", F.length("text"))
            if t == "embeddings":
                dim = 64  # driver testdata embedding width
                # stride floors at 1 so repl > dim still rotates every
                # replica (repl=100 would otherwise get stride 0 = all
                # replicas identical); replicas repl>dim apart share a
                # rotation — acceptable decorrelation loss at that scale
                shift = (rep * F.lit(max(1, dim // max(repl, 1)))) % dim
                rolled = F.concat(
                    F.slice(F.col("embedding"), shift + 1, dim - shift),
                    F.slice(F.col("embedding"), F.lit(1), shift))
                out = out.withColumn(
                    "embedding",
                    F.when(rep == 0, F.col("embedding")).otherwise(rolled))
            out = out.drop("__r")
        # target one file per core so the scan parallelizes without a
        # downstream repartition (floor: >= 250 rows per file, so dim
        # tables stay single-file); ingest.load_tables skips its spread
        # shuffle when it sees >= par files
        n_files = max(1, min(par, out.count() // 250 or 1))
        (out.repartition(n_files)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{t}.parquet")))

    with open(os.path.join(out_dir, _MARKER), "w") as fh:
        json.dump({"base": os.path.abspath(base_dir), "repl": repl,
                   "version": _VERSION}, fh)
    return out_dir
