"""Training-data export (operators/export.py): deterministic sharding,
reproducible global shuffle, manifest-vs-disk agreement."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datahub_spark.operators import export as EX


def test_assign_shards_deterministic_and_stable_under_growth(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(2000)],
                               "doc_id long, text string")
    a = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(df, 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(df, 8).collect()}
    assert a == b
    # repartitioning the input moves nothing
    c = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(df.repartition(13), 8).collect()}
    assert c == a
    # growing the corpus moves nothing already placed
    grown = spark.createDataFrame(
        [(i, f"d{i}") for i in range(3000)], "doc_id long, text string")
    g = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in EX.assign_shards(grown, 8).collect()}
    assert {k: v for k, v in g.items() if k < 2000} == a
    # hash-uniform balance: 2000 docs over 8 shards, generous bounds
    counts = [0] * 8
    for s, _ in a.values():
        counts[s] += 1
    assert min(counts) > 150 and max(counts) < 350


def test_export_shards_layout_order_and_manifest(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = EX.export_shards(docs, out, n_shards=4).collect()
    assert [r["shard"] for r in manifest] == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in manifest) == docs.count()
    assert all(r["n_tokens"] > 0 for r in manifest)
    # dir-per-shard layout
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) == \
        [f"shard={i}" for i in range(4)]
    # reproducible within-shard order: file order equals the hash order
    shard0 = spark.read.parquet(os.path.join(out, "shard=0"))
    got_ids = [r["doc_id"] for r in shard0.collect()]
    expect = [r["doc_id"] for r in
              EX.assign_shards(docs, 4).filter("shard = 0")
              .orderBy("sort_key", "doc_id").collect()]
    assert got_ids == expect
    # exporting twice is byte-order identical
    out2 = str(tmp_path / "shards2")
    EX.export_shards(docs, out2, n_shards=4).collect()
    again = [r["doc_id"] for r in
             spark.read.parquet(os.path.join(out2, "shard=0")).collect()]
    assert again == got_ids


def test_export_shards_every_doc_exactly_once(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    EX.export_shards(docs, out, n_shards=3)
    written = spark.read.parquet(out)
    assert written.count() == docs.count()
    assert written.select("doc_id").distinct().count() == docs.count()
    # shard dirs partition the id space
    per = written.groupBy("doc_id").agg(
        F.countDistinct("shard").alias("n")).filter("n > 1").count()
    assert per == 0


def test_pack_sequences_duckdb_parity(spark):
    """Packing manifest equals a single-window SQL formulation (global
    cumsum ORDER BY doc_id) — proving the two-phase distributed cumsum
    is exactly the sequential one."""
    from tests.oracle import compare
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    C = 1000
    got = EX.pack_sequences(docs, C, count_col="n_chars", partitions=7)
    sql = f"""
    WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n
               FROM documents WHERE n_chars > 0),
    g AS (SELECT doc_id, n,
                 COALESCE(SUM(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
          FROM c),
    e AS (SELECT doc_id, n, s,
                 unnest(range(CAST(s // {C} AS BIGINT),
                              CAST((s + n - 1) // {C} + 1 AS BIGINT))) AS seq
          FROM g)
    SELECT doc_id, CAST(seq AS BIGINT) AS seq_id,
           CAST(GREATEST(s, seq*{C}) - s AS BIGINT) AS doc_from,
           CAST(LEAST(s + n, (seq+1)*{C}) - s AS BIGINT) AS doc_to,
           CAST(GREATEST(s, seq*{C}) - seq*{C} AS BIGINT) AS seq_off
    FROM e
    """
    ok, msg = compare(got, sql, sf)
    assert ok, msg


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(i, 1 + (i * 37) % 250) for i in range(200)], "doc_id long, n long")
    C = 128
    out = EX.pack_sequences(docs, C, count_col="n", partitions=5).collect()
    total = sum(1 + (i * 37) % 250 for i in range(200))
    # every sequence except the last is exactly full; pieces tile each
    # sequence contiguously from offset 0; all doc tokens are covered
    per_seq = {}
    per_doc = {}
    for r in out:
        per_seq.setdefault(r["seq_id"], []).append(r)
        per_doc.setdefault(r["doc_id"], []).append(r)
        assert 0 < r["doc_to"] - r["doc_from"] <= C
    last = max(per_seq)
    for sid, pieces in per_seq.items():
        pieces.sort(key=lambda r: r["seq_off"])
        covered = sum(p["doc_to"] - p["doc_from"] for p in pieces)
        assert pieces[0]["seq_off"] == 0
        for a, b in zip(pieces, pieces[1:]):
            assert a["seq_off"] + a["doc_to"] - a["doc_from"] == b["seq_off"]
        assert covered == (C if sid != last else total - last * C), sid
    for did, pieces in per_doc.items():
        pieces.sort(key=lambda r: r["doc_from"])
        assert pieces[0]["doc_from"] == 0
        n = 1 + (did * 37) % 250
        assert pieces[-1]["doc_to"] == n
        for a, b in zip(pieces, pieces[1:]):
            assert a["doc_to"] == b["doc_from"]

    # invariant to the partition count (the range-boundary independence)
    again = sorted(map(tuple, EX.pack_sequences(
        docs, C, count_col="n", partitions=2).collect()))
    assert again == sorted(map(tuple, out))

    # zero-count docs are skipped; bad capacity rejected
    import pytest
    with pytest.raises(ValueError):
        EX.pack_sequences(docs, 0, count_col="n")


def test_export_shards_curriculum_order(spark, tmp_path):
    """order_col switches in-shard order to the score column (easy ->
    hard), preserving hash placement."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}", float((i * 37) % 100)) for i in range(60)],
        "doc_id long, text string, difficulty double")
    path = str(tmp_path / "cur")
    EX.export_shards(docs, path, 3, order_col="difficulty")
    back = spark.read.parquet(path)
    import pyarrow.parquet as pq
    import glob
    for d in sorted(glob.glob(f"{path}/shard=*")):
        rows = pq.read_table(d).to_pandas()
        diffs = list(rows["difficulty"])
        assert diffs == sorted(diffs), d
    # placement unchanged vs the hash export (same shard per doc)
    path2 = str(tmp_path / "hash")
    EX.export_shards(docs, path2, 3)
    a = {r["doc_id"]: r["shard"] for r in back.select(
        "doc_id", F.input_file_name().alias("f")).withColumn(
        "shard", F.regexp_extract("f", r"shard=(\d+)", 1)).collect()}
    b = {r["doc_id"]: r["shard"] for r in spark.read.parquet(path2).select(
        "doc_id", F.input_file_name().alias("f")).withColumn(
        "shard", F.regexp_extract("f", r"shard=(\d+)", 1)).collect()}
    assert a == b


def test_export_shards_descending_and_non_numeric_order(spark, tmp_path):
    """r9: descending curriculum sorts directionally (no value
    negation — works on strings/timestamps) and the helper sort_key
    column is no longer leaked into the written shards."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}", chr(97 + (i * 7) % 26)) for i in range(60)],
        "doc_id long, text string, grade string")
    path = str(tmp_path / "desc")
    EX.export_shards(docs, path, 2, order_col="grade", ascending=False)
    import glob
    import pyarrow.parquet as pq
    for d in sorted(glob.glob(f"{path}/shard=*")):
        t = pq.read_table(d)
        assert "sort_key" not in t.column_names
        grades = list(t.to_pandas()["grade"])
        assert grades == sorted(grades, reverse=True), d
    # hash export drops the helper too
    path2 = str(tmp_path / "hash")
    EX.export_shards(docs, path2, 2)
    for d in glob.glob(f"{path2}/shard=*"):
        assert "sort_key" not in pq.read_table(d).column_names


def test_export_shards_empty_corpus_returns_empty_manifest(spark, tmp_path):
    """r13: a fold that drew no documents exports an honest EMPTY
    manifest (dir exists, zero shards) instead of crashing the whole
    prepare_training_data run on the read-back schema inference."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    from datahub_spark.operators import export as EX

    m = EX.export_shards(empty, str(tmp_path / "out"), n_shards=4)
    assert m.count() == 0
    assert [f.name for f in m.schema.fields] == ["shard", "n_docs", "n_tokens"]


def test_export_jsonl_matches_parquet_placement_and_round_trips(spark, tmp_path):
    """r13: the gzip-JSONL interchange twin places and orders exactly
    like the parquet export (same hash family -> identical manifest),
    round-trips every value through to_json/from_json, and keeps the
    reproducible in-shard hash order on the physical lines."""
    import gzip
    import json as _json

    from datahub_spark.operators import export as EX

    docs = spark.createDataFrame(
        [(i, f"text body {i} " + "tok " * (i % 5)) for i in range(200)],
        "doc_id long, text string")
    jdir = str(tmp_path / "jsonl")
    mj = EX.export_jsonl(docs, jdir, n_shards=4).collect()
    mp = EX.export_shards(docs, str(tmp_path / "pq"), n_shards=4).collect()
    assert [(r["shard"], r["n_docs"], r["n_tokens"]) for r in mj] \
        == [(r["shard"], r["n_docs"], r["n_tokens"]) for r in mp]
    # physical line order inside a shard == the reproducible hash order
    import glob as _g
    files = sorted(_g.glob(f"{jdir}/shard-*.jsonl.gz"))
    assert len(files) == 4
    rows = [_json.loads(l) for l in
            gzip.open(files[0], "rt").read().splitlines()]
    assert rows, "shard 0 empty"
    got_ids = [r["doc_id"] for r in rows]
    want = EX.assign_shards(docs, 4).filter("shard = 0") \
        .orderBy("sort_key", "doc_id").select("doc_id").collect()
    assert got_ids == [r["doc_id"] for r in want]
    # values survive the JSON round trip
    assert all(r["text"].startswith(f"text body {r['doc_id']} ")
               for r in rows)


def test_export_jsonl_overwrites_stale_shards(spark, tmp_path):
    """r13 review finding: a re-export with fewer shards must not fold
    a previous run's stale shard files into the manifest."""
    from datahub_spark.operators import export as EX

    jdir = str(tmp_path / "j")
    big = spark.createDataFrame(
        [(i, f"old {i}") for i in range(100)], "doc_id long, text string")
    EX.export_jsonl(big, jdir, n_shards=8)
    small = spark.createDataFrame(
        [(i, f"new {i}") for i in range(10)], "doc_id long, text string")
    m = EX.export_jsonl(small, jdir, n_shards=2)
    assert m.agg({"n_docs": "sum"}).collect()[0][0] == 10
    import glob as _g
    assert len(_g.glob(f"{jdir}/shard-*.jsonl.gz")) <= 2


def test_export_jsonl_scheme_path_and_staged_overwrite(spark, tmp_path):
    """r14 (r13 verdict 'What's wrong #1'): overwrite goes through the
    Hadoop FileSystem of the path's SCHEME, not a driver-local
    glob.glob — pointed at a file:-prefixed path (a layout the local
    glob cannot see: glob.glob('file:/...') matches nothing), a
    re-export with fewer shards still replaces every stale file. Also
    pins crash-safety: a stage dir left by a failed run is cleaned and
    never folded into the manifest."""
    import glob as _g

    from datahub_spark.operators import export as EX

    jdir_posix = str(tmp_path / "j")
    jdir = "file:" + jdir_posix
    assert _g.glob(f"{jdir}/shard-*.jsonl*") == []  # local glob is blind
    big = spark.createDataFrame(
        [(i, f"old {i}") for i in range(100)], "doc_id long, text string")
    EX.export_jsonl(big, jdir, n_shards=8)
    assert len(_g.glob(f"{jdir_posix}/shard-*.jsonl.gz")) == 8
    # simulate a CRASHED previous run: a stage dir with quarantined
    # files that were never swapped in
    crashed = tmp_path / "j" / "_stage-export-deadbeef"
    crashed.mkdir()
    (crashed / "shard-00099.jsonl.gz").write_bytes(b"garbage")
    small = spark.createDataFrame(
        [(i, f"new {i}") for i in range(10)], "doc_id long, text string")
    m = EX.export_jsonl(small, jdir, n_shards=2)
    assert m.agg({"n_docs": "sum"}).collect()[0][0] == 10
    assert len(_g.glob(f"{jdir_posix}/shard-*.jsonl.gz")) <= 2
    assert _g.glob(f"{jdir_posix}/_stage-export-*") == []


def test_export_jsonl_exact_token_count_col(spark, tmp_path):
    """r14 (ADVICE r13): tokenized frames carry an exact count column;
    the JSONL manifest must honor it exactly like export_shards so the
    'interchange twin' claim holds for tokenized corpora."""
    from datahub_spark.operators import export as EX

    docs = spark.createDataFrame(
        [(i, f"two words", 1000 + i) for i in range(20)],
        "doc_id long, text string, n_tok long")
    mj = EX.export_jsonl(docs, str(tmp_path / "j"), n_shards=2,
                         token_count_col="n_tok").collect()
    mp = EX.export_shards(docs, str(tmp_path / "p"), n_shards=2,
                          token_count_col="n_tok").collect()
    assert [(r["shard"], r["n_docs"], r["n_tokens"]) for r in mj] \
        == [(r["shard"], r["n_docs"], r["n_tokens"]) for r in mp]
    # exact counts, not the whitespace proxy (which would be 2/doc)
    assert sum(r["n_tokens"] for r in mj) == sum(range(1000, 1020))


def test_staged_export_heals_crashed_finish(spark, tmp_path):
    """r14 review catch: a crash INSIDE finish_staged_export's swap
    used to leave the old generation parked in _old-export-* where the
    next begin deleted it as garbage — losing both copies. Now every
    previous-generation file survives in target-or-_old at all times,
    and the next begin restores the last COMPLETE generation
    (overwriting any partial of the interrupted new one) before
    staging fresh."""
    from datahub_spark import fsio

    tdir = tmp_path / "exp"
    tdir.mkdir()
    # the previous complete generation: shards 0..3
    for i in range(4):
        (tdir / f"shard-{i:05d}.jsonl.gz").write_bytes(b"old%d" % i)
    # simulate a finish that crashed mid-swap: all old files parked,
    # one new file already renamed in, the rest still in the stage
    old_dir = tdir / "_old-export-cafe"
    old_dir.mkdir()
    for i in range(4):
        (tdir / f"shard-{i:05d}.jsonl.gz").rename(
            old_dir / f"shard-{i:05d}.jsonl.gz")
    (tdir / "shard-00000.jsonl.gz").write_bytes(b"new0")  # partial new
    stage_dir = tdir / "_stage-export-beef"
    stage_dir.mkdir()
    (stage_dir / "shard-00001.jsonl.gz").write_bytes(b"new1")

    stage = fsio.begin_staged_export(spark, str(tdir))
    # healed: the complete OLD generation is live, partial new gone
    for i in range(4):
        assert (tdir / f"shard-{i:05d}.jsonl.gz").read_bytes() \
            == b"old%d" % i, i
    assert not old_dir.exists()
    assert not stage_dir.exists()
    # and a fresh stage is ready for the caller's re-run
    assert stage.split("/")[-1].startswith("_stage-export-")
    # a normal finish afterwards still swaps atomically
    import os
    new_stage_local = fsio.strip_scheme(stage)
    os.makedirs(new_stage_local, exist_ok=True)
    with open(f"{new_stage_local}/shard-00000.jsonl.gz", "wb") as fh:
        fh.write(b"fresh")
    n = fsio.finish_staged_export(spark, str(tdir), stage,
                                  "shard-*.jsonl*")
    assert n == 1
    assert (tdir / "shard-00000.jsonl.gz").read_bytes() == b"fresh"
    assert not (tdir / "shard-00001.jsonl.gz").exists()  # stale gone
    assert [d for d in os.listdir(tdir) if d.startswith("_")] == []


def test_staged_export_heal_drops_new_named_partials(spark, tmp_path):
    """r15 (r14 ADVICE medium): when the new generation has names the
    old one lacks (shard count grew 4->8) and finish crashes after
    renaming them in but before committing, heal must DELETE those
    extra files — the _parked marker records the pattern, so the
    healed target is exactly the last complete generation, never an
    old+new mix."""
    import base64 as _b64
    import os

    from datahub_spark import fsio

    tdir = tmp_path / "exp"
    tdir.mkdir()
    old_dir = tdir / "_old-export-feed"
    old_dir.mkdir()
    for i in range(4):  # the parked complete old generation
        (old_dir / f"shard-{i:05d}.jsonl.gz").write_bytes(b"old%d" % i)
    b64 = _b64.urlsafe_b64encode(b"shard-*.jsonl*").decode().rstrip("=")
    (old_dir / f"_parked-{b64}").touch()
    for i in range(8):  # the interrupted new generation, fully renamed in
        (tdir / f"shard-{i:05d}.jsonl.gz").write_bytes(b"new%d" % i)
    # no _committed marker: the crash hit before the commit point

    fsio.begin_staged_export(spark, str(tdir))
    shards = sorted(f for f in os.listdir(tdir)
                    if f.startswith("shard-"))
    assert shards == [f"shard-{i:05d}.jsonl.gz" for i in range(4)]
    for i in range(4):
        assert (tdir / f"shard-{i:05d}.jsonl.gz").read_bytes() \
            == b"old%d" % i, i
    assert not old_dir.exists()


def test_staged_export_heal_discards_committed_park(spark, tmp_path):
    """r15: a park dir carrying _committed is cleanup debris from a
    finish that completed its swap — heal must drop it WITHOUT
    touching the live (new) generation."""
    import os

    from datahub_spark import fsio

    tdir = tmp_path / "exp"
    tdir.mkdir()
    for i in range(2):
        (tdir / f"shard-{i:05d}.jsonl.gz").write_bytes(b"new%d" % i)
    old_dir = tdir / "_old-export-dead"
    old_dir.mkdir()
    (old_dir / "shard-00000.jsonl.gz").write_bytes(b"stale")
    (old_dir / "_committed").touch()

    fsio.begin_staged_export(spark, str(tdir))
    assert not old_dir.exists()
    for i in range(2):
        assert (tdir / f"shard-{i:05d}.jsonl.gz").read_bytes() \
            == b"new%d" % i
