"""Crash-safe parquet maintenance writes (stage + atomic rename swap).

Maintenance operators that fold new data into a persisted table
(temporal.materialize_rollup, retrieval.update_text_index) must read a
path and then OVERWRITE the same path. Doing that in one lazy plan is
unsafe (Spark deletes the target before the read finishes) and the
earlier localCheckpoint barrier pinned the merged table in executor
storage — gone with an executor. The robust idiom is the one the store
itself uses for compaction (store.py compact): write the merged table
to a STAGE directory, swap it in with two renames, and only then drop
the old generation. A crash before the first rename leaves the old
table untouched; a crash between the renames leaves the old generation
beside the path, recoverable by re-running the refresh.

Everything goes through the Hadoop FileSystem API so the same code
path serves local file:// paths in tests and HDFS/object-store paths
on a cluster (object stores without atomic rename should front this
with a committer, as they must for any Spark write).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check via the Hadoop FS of the path's scheme — the
    narrow test maintenance bootstraps want, instead of a bare
    ``except Exception`` around a read that would also swallow
    permission errors and corrupted footers."""
    fs, hpath = _fs(spark, path)
    return bool(fs.exists(hpath))


def parquet_atomic_overwrite(df: DataFrame, path: str) -> None:
    """Materialize ``df`` as parquet at ``path``, crash-safely, even
    when ``df``'s plan READS ``path``. Stage-write first (the only step
    that executes the plan — the old table is still intact if it
    fails), then swap directories with renames; on a failed swap the
    old generation is rolled back."""
    spark = df.sparkSession
    fs, target = _fs(spark, path)
    jvm = spark._jvm
    parent = target.getParent()
    stage = jvm.org.apache.hadoop.fs.Path(
        parent, f"_stage-{target.getName()}-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage.toString())
    if not fs.exists(target):
        if not fs.rename(stage, target):
            raise IOError(f"atomic overwrite: rename {stage} -> {target}")
        return
    old = jvm.org.apache.hadoop.fs.Path(
        parent, f"_old-{target.getName()}-{uuid.uuid4().hex}")
    if not fs.rename(target, old):
        raise IOError(f"atomic overwrite: rename {target} -> {old}")
    if not fs.rename(stage, target):
        fs.rename(old, target)  # roll back
        raise IOError(f"atomic overwrite: rename {stage} -> {target}")
    fs.delete(old, True)
