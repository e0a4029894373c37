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
beside the path as ``_old-<name>-*`` — ``ensure_recovered`` restores it
before any bootstrap existence probe, so re-running the refresh heals
the window instead of rebuilding from one batch.

Everything goes through the Hadoop FileSystem API so the same code
path serves local file:// paths in tests and HDFS/object-store paths
on a cluster (object stores without atomic rename should front this
with a committer, as they must for any Spark write).
"""

from __future__ import annotations

import base64
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


def _orphaned_generations(fs, jvm, target):
    """FileStatus list of ``_old-<name>-*`` siblings left by a crash
    between the two swap renames (the window where the target itself is
    absent but the previous generation survives under its temp name)."""
    parent, name = target.getParent(), target.getName()
    if not fs.exists(parent):
        return []
    prefix = f"_old-{name}-"
    return [st for st in fs.listStatus(parent)
            if st.getPath().getName().startswith(prefix)]


def ensure_recovered(spark: SparkSession, path: str) -> bool:
    """``fs_exists`` with crash recovery — what maintenance bootstraps
    must call (ADVICE r9): a crash between ``rename(target, old)`` and
    ``rename(stage, target)`` leaves the target ABSENT while the whole
    previous generation sits beside it as ``_old-<name>-*``. A bare
    existence probe then takes the bootstrap-fresh branch and silently
    rebuilds the table from only the current batch, losing all
    persisted history. This restores the newest orphaned generation
    back to ``path`` (and deletes older orphans + stale ``_stage-*``
    leftovers) before reporting existence. Single-writer contract, like
    every maintenance op here."""
    fs, target = _fs(spark, path)
    jvm = spark._jvm
    if fs.exists(target):
        return True
    olds = _orphaned_generations(fs, jvm, target)
    if not olds:
        return False
    newest = max(olds, key=lambda st: st.getModificationTime())
    if not fs.rename(newest.getPath(), target):
        raise IOError(
            f"recover: rename {newest.getPath()} -> {target} failed")
    prefix = f"_stage-{target.getName()}-"
    for st in fs.listStatus(target.getParent()):
        n = st.getPath().getName()
        if (st.getPath().toString() != newest.getPath().toString()
                and (n.startswith(f"_old-{target.getName()}-")
                     or n.startswith(prefix))):
            fs.delete(st.getPath(), True)
    return True


def strip_scheme(path: str) -> str:
    """The POSIX view of a ``file:``-scheme path (``file:/x``,
    ``file://x``, ``file:///x`` -> ``/x``) for the streamed writers'
    task-side ``open()``. Other schemes pass through unchanged — the
    open() then fails loudly, which is honest: a Python-streamed
    writer needs a task-writable POSIX view (local disk, NFS, or a
    FUSE mount); its METADATA operations (stale-file deletes, the
    stage swap) go through the Hadoop FileSystem API and are correct
    on any scheme."""
    if path.startswith("file:"):
        rest = path[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return path


def begin_staged_export(spark: SparkSession, path: str) -> str:
    """Start a crash-safe streamed export into ``path``: make the
    target, HEAL any crashed previous run, and return a fresh stage
    directory for the tasks to write into. Until
    ``finish_staged_export`` runs, the previous export is untouched —
    a failed job leaves old files live and new files quarantined in
    the stage dir (the r13 verdict's object-store finding: the old
    driver-side glob+os.remove destroyed the previous export BEFORE
    the job ran, and silently matched nothing on non-POSIX paths).

    Heal policy (r14 review catch; marker-hardened r15 after the r14
    ADVICE mixed-generation finding): a crash inside finish's swap
    leaves the previous generation parked in ``_old-export-*`` — NOT
    garbage. The park dir carries up to two atomically-created marker
    files that say exactly how far the swap got:

    * ``_committed`` present — every staged file was renamed in, the
      new generation is complete; the park dir is cleanup debris,
      delete it without touching the target.
    * ``_parked-<base64url(pattern)>`` present (no ``_committed``) —
      the old generation was FULLY parked and staged renames may have
      begun. Heal = delete every target file matching the recorded
      pattern (this removes partial new files even when their NAMES
      are absent from the old generation, e.g. a shard count grown
      4→8), then restore the parked files. The healed target is then
      exactly the last complete generation.
    * neither marker — the crash hit while files were still being
      parked (no staged file was renamed in yet). Heal = restore-only:
      parked files go back over any same-named entry; target files not
      in the park dir are live old-generation files and must survive.

    The caller's re-run then produces the new generation."""
    fs, target = _fs(spark, path)
    jvm = spark._jvm
    fs.mkdirs(target)
    for st in fs.listStatus(target):
        name = st.getPath().getName()
        if name.startswith("_old-export-"):
            odir = st.getPath()
            if fs.exists(jvm.org.apache.hadoop.fs.Path(
                    odir, "_committed")):
                fs.delete(odir, True)
                continue
            pattern = None
            entries = list(fs.listStatus(odir))
            for f in entries:
                n = f.getPath().getName()
                if n.startswith("_parked-"):
                    b64 = n[len("_parked-"):]
                    pattern = base64.urlsafe_b64decode(
                        b64 + "=" * (-len(b64) % 4)).decode()
            if pattern:
                for g in (fs.globStatus(jvm.org.apache.hadoop.fs.Path(
                        target, pattern)) or []):
                    if not g.getPath().getName().startswith("_"):
                        fs.delete(g.getPath(), False)
            for f in entries:
                n = f.getPath().getName()
                if n.startswith("_parked-"):
                    continue
                dst = jvm.org.apache.hadoop.fs.Path(target, n)
                if fs.exists(dst):
                    fs.delete(dst, False)
                if not fs.rename(f.getPath(), dst):
                    raise IOError(
                        f"staged export heal: rename {f.getPath()} "
                        f"-> {dst}")
            fs.delete(odir, True)
    for st in fs.listStatus(target):
        if st.getPath().getName().startswith("_stage-export-"):
            # stage leftovers are from a crashed WRITE (never swapped)
            # or a crashed finish whose old generation was restored
            # above — either way the partial new copy is garbage now
            fs.delete(st.getPath(), True)
    stage = jvm.org.apache.hadoop.fs.Path(
        target, f"_stage-export-{uuid.uuid4().hex}")
    fs.mkdirs(stage)
    return stage.toString()


def finish_staged_export(spark: SparkSession, path: str, stage: str,
                         pattern: str) -> int:
    """Commit a staged streamed export: park the target's stale files
    matching ``pattern`` in an ``_old-export-*`` dir (Hadoop glob —
    correct on HDFS/object stores where a driver-local ``glob.glob``
    silently matches nothing), move every staged file in, then drop
    the parked generation and the stage dir. Returns the number of
    files swapped in. Runs ONLY after the write job succeeded, and a
    crash at ANY point inside this swap is recoverable: every file of
    the previous generation exists in the target or the _old dir
    until the new generation is fully renamed in, and the next
    ``begin_staged_export`` heals back to the last complete
    generation (r14 review catch — the previous delete-then-rename
    order had a window that destroyed both copies). Marker protocol
    (r15, closing the r14 ADVICE mixed-generation window): after the
    old generation is fully parked, an atomically-created
    ``_parked-<base64url(pattern)>`` marker records the swap's file
    pattern; after every staged file is renamed in, a ``_committed``
    marker declares the new generation complete. begin's heal reads
    the markers to pick restore-only / delete-then-restore / discard —
    so a crash between those points can no longer leave new-named
    files (e.g. a grown shard count) mixed into a healed old
    generation."""
    fs, target = _fs(spark, path)
    jvm = spark._jvm
    stale = [st for st in (fs.globStatus(jvm.org.apache.hadoop.fs.Path(
        target, pattern)) or [])
        if not st.getPath().getName().startswith("_")]
    old = jvm.org.apache.hadoop.fs.Path(
        target, f"_old-export-{uuid.uuid4().hex}")
    fs.mkdirs(old)
    for st in stale:
        dst = jvm.org.apache.hadoop.fs.Path(
            old, st.getPath().getName())
        if not fs.rename(st.getPath(), dst):
            raise IOError(
                f"staged export: rename {st.getPath()} -> {dst}")
    b64 = base64.urlsafe_b64encode(pattern.encode()).decode().rstrip("=")
    fs.createNewFile(jvm.org.apache.hadoop.fs.Path(old, f"_parked-{b64}"))
    spath = jvm.org.apache.hadoop.fs.Path(stage)
    n = 0
    if fs.exists(spath):
        for st in fs.listStatus(spath):
            dst = jvm.org.apache.hadoop.fs.Path(
                target, st.getPath().getName())
            if not fs.rename(st.getPath(), dst):
                raise IOError(
                    f"staged export: rename {st.getPath()} -> {dst}")
            n += 1
        fs.delete(spath, True)
    fs.createNewFile(jvm.org.apache.hadoop.fs.Path(old, "_committed"))
    fs.delete(old, True)
    return n


def parquet_atomic_overwrite(df: DataFrame, path: str,
                             partition_by: list[str] | None = None,
                             markers: list[str] | None = None
                             ) -> None:
    """Materialize ``df`` as parquet at ``path``, crash-safely, even
    when ``df``'s plan READS ``path``. Stage-write first (the only step
    that executes the plan — the old table is still intact if it
    fails), then swap directories with renames; on a failed swap the
    old generation is rolled back. If the target is absent but an
    orphaned ``_old-*`` generation exists, a previous swap crashed
    mid-window and the CALLER's plan was built against a missing table
    — refuse loudly instead of burying the recoverable history (run
    ``ensure_recovered`` first, as the maintenance bootstraps do).
    ``partition_by`` keeps a dir-partitioned layout (e.g. the minhash
    index's band partitions) through the rewrite. ``markers`` are
    zero-byte ``_``-prefixed file names created INSIDE the staged dir
    before the swap — metadata that must flip atomically WITH the
    table generation (Spark's scans ignore ``_`` files); the BM25
    compaction's ``_includes-*`` fold records ride here (r15)."""
    spark = df.sparkSession
    fs, target = _fs(spark, path)
    jvm = spark._jvm
    parent = target.getParent()
    if not fs.exists(target) and _orphaned_generations(fs, jvm, target):
        raise IOError(
            f"atomic overwrite: {path} is missing but an _old-* "
            "generation exists (crashed swap) — call ensure_recovered "
            "before rebuilding")
    stage = jvm.org.apache.hadoop.fs.Path(
        parent, f"_stage-{target.getName()}-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage.toString())
    for m in markers or []:
        if not m.startswith("_"):
            raise ValueError(f"atomic overwrite: marker {m!r} must be "
                             "_-prefixed so scans ignore it")
        fs.createNewFile(jvm.org.apache.hadoop.fs.Path(stage, m))
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
