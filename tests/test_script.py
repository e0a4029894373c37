"""Script-string transform surface (reference JavascriptTransform,
internal/jobs/transform.go; test model: internal/jobs/transform_test.go —
property ops, Query/FindById, namespace helpers, NewEntity emission)."""

import pytest
from pyspark.sql import functions as F

import datahub_spark.script as SC
from datahub_spark.model import ENTITY_SCHEMA


def _entities(spark, rows):
    return spark.createDataFrame(rows, ENTITY_SCHEMA)


@pytest.fixture
def people(spark):
    return _entities(spark, [
        ("p:1", 1, 0, False, {"p:name": "alice", "p:tmp": "x"},
         {"p:nation": ["n:1"]}, "people"),
        ("p:2", 1, 0, False, {"p:name": "bob"}, {"p:nation": ["n:2"]}, "people"),
    ])


@pytest.fixture
def nations(spark):
    return _entities(spark, [
        ("n:1", 1, 0, False, {"p:name": "NORWAY"}, None, "nation"),
        ("n:2", 1, 0, False, {"p:name": "FRANCE"}, None, "nation"),
    ])


def test_property_ops_match_reference_helpers(spark, people):
    # SetProperty/RenameProperty/RemoveProperty — transform.go:46-129
    code = """
def transform_entities(entities):
    for e in entities:
        SetProperty(e, "p", "upper", ToString(GetProperty(e, "p", "name", "")).upper())
        RenameProperty(e, "p", "name", "p", "fullname")
        RemoveProperty(e, "p", "tmp")
        SetProperty(e, "p", "missing", GetProperty(e, "p", "nope", "dflt"))
    return entities
"""
    out = {r["id"]: r["props"] for r in SC.script_transform(people, code).collect()}
    assert out["p:1"] == {"p:upper": "ALICE", "p:fullname": "alice", "p:missing": "dflt"}
    assert out["p:2"]["p:upper"] == "BOB"
    assert "p:name" not in out["p:1"]


def test_refs_deleted_and_id_ops(spark, people):
    code = """
def transform_entities(entities):
    for e in entities:
        AddReference(e, "p", "seen", [PrefixField("x", "1")])
        SetDeleted(e, GetId(e) == "p:2")
        SetId(e, GetId(e) + ":v2")
    return entities
"""
    rows = {r["id"]: r for r in SC.script_transform(people, code).collect()}
    assert rows["p:1:v2"]["refs"]["p:seen"] == ["x:1"]
    assert rows["p:1:v2"]["deleted"] is False and rows["p:2:v2"]["deleted"] is True


def test_emit_and_drop_change_batch_size(spark, people):
    # returned list IS the batch: drop bob, emit a derived entity per row
    code = """
def transform_entities(entities):
    out = []
    for e in entities:
        if GetProperty(e, "p", "name") == "bob":
            continue
        out.append(e)
        d = NewEntity()
        SetId(d, "derived:" + GetId(e))
        SetProperty(d, "p", "src", GetId(e))
        d["Dataset"] = "derived"
        out.append(d)
    return out
"""
    rows = SC.script_transform(people, code).collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == ["derived:p:1", "p:1"]
    d = [r for r in rows if r["dataset"] == "derived"][0]
    assert d["props"] == {"p:src": "p:1"} and d["recorded"] is None


def test_query_and_findbyid_via_broadcast_lookup(spark, people, nations):
    # the documented enrichment pattern (DOCUMENTATION.md:691-706)
    code = """
def transform_entities(entities):
    for e in entities:
        for (start, pred, nat) in Query([GetId(e)], "p:nation", False):
            SetProperty(e, "p", "nation_name", GetProperty(nat, "p", "name"))
        direct = FindById("n:1")
        SetProperty(e, "p", "via_find", GetProperty(direct, "p", "name"))
    return entities
"""
    out = {r["id"]: r["props"] for r in
           SC.script_transform(people, code, lookup=[people, nations]).collect()}
    assert out["p:1"]["p:nation_name"] == "NORWAY"
    assert out["p:2"]["p:nation_name"] == "FRANCE"
    assert out["p:1"]["p:via_find"] == "NORWAY"


def test_inverse_query(spark, people, nations):
    code = """
def transform_entities(entities):
    for e in entities:
        hits = Query([GetId(e)], "p:nation", True)
        SetProperty(e, "p", "pop", ToString(len(hits)))
        if hits:
            SetProperty(e, "p", "first", GetId(hits[0][2]))
    return entities
"""
    out = {r["id"]: r["props"] for r in
           SC.script_transform(nations, code, lookup=[people, nations]).collect()}
    assert out["n:1"]["p:pop"] == "1" and out["n:1"]["p:first"] == "p:1"


def test_namespace_builtins_deterministic(spark, people):
    # AssertNamespacePrefix: content-addressed, identical on every
    # executor/run (divergence from the reference's sequential counter is
    # documented in script.py)
    code = """
def transform_entities(entities):
    known = GetNamespacePrefix("http://example.io/schema/")
    new = AssertNamespacePrefix("http://other.example/x/")
    for e in entities:
        SetProperty(e, known, "ns1", known)
        SetProperty(e, "p", "ns2", new)
    return entities
"""
    a = {r["id"]: r["props"]["p:ns2"]
         for r in SC.script_transform(people.repartition(2), code).collect()}
    assert len(set(a.values())) == 1  # same derived prefix on all partitions
    assert list(a.values())[0].startswith("ns_")
    b = SC.script_transform(people, code).collect()[0]["props"]["p:ns2"]
    assert b == list(a.values())[0]  # stable across runs


def test_bad_scripts_fail_driver_side(spark, people):
    with pytest.raises(SyntaxError):
        SC.script_transform(people, "def transform_entities(e) return e")
    with pytest.raises(ValueError, match="transform_entities"):
        SC.script_transform(people, "x = 1")


def test_script_transform_in_job_pipeline(spark, tmp_path, people):
    # the reference job-config shape: DatasetSource -> JavascriptTransform
    # -> DatasetSink (pipeline.go + transform.go), via make_script_transform
    from datahub_spark import jobs as J
    from datahub_spark.store import EntityStore, latest

    es = EntityStore(spark, str(tmp_path / "store"))
    es.store_entities("people", people.drop("dataset"))
    code = """
def transform_entities(entities):
    for e in entities:
        SetProperty(e, "p", "greeting", "hi " + ToString(GetProperty(e, "p", "name", "")))
    return entities
"""
    job = J.Job("greet", J.DatasetSource(es, "people"),
                J.DatasetSink(es, "greeted"),
                transform=SC.make_script_transform(code))
    job.run(J.JobState(str(tmp_path / "state.json")))
    out = {r["id"]: r["props"]["p:greeting"]
           for r in latest(es.log(["greeted"])).collect()}
    assert out == {"p:1": "hi alice", "p:2": "hi bob"}


def test_make_script_transform_validates_eagerly(spark):
    with pytest.raises(ValueError, match="transform_entities"):
        SC.make_script_transform("y = 2")


def test_script_virtual_source_pages_with_emit_and_token(spark, tmp_path):
    # BuildEntities/Emit host contract (transform.go:578-600): the script
    # emits a page after `since` and returns the next continuation token
    code = """
def build_entities(params, since, limit):
    n = params["n"]
    emitted = 0
    last = since
    for i in range(since, n):
        if limit is not None and emitted >= limit:
            break
        e = NewEntity()
        SetId(e, PrefixField("v", i))
        SetProperty(e, "p", "i", ToString(i))
        e["Recorded"] = i + 1
        e["Seq"] = 0
        Emit(e)
        emitted += 1
        last = i + 1
    return last
"""
    src = SC.ScriptVirtualSource(spark, code, params={"n": 7}, dataset="virt")
    page1 = src.read(since=0, limit=3).collect()
    assert [r["id"] for r in page1] == ["v:0", "v:1", "v:2"]
    assert src.current_watermark() == 3
    page2 = src.read(since=src.current_watermark()).collect()
    assert [r["id"] for r in page2] == ["v:3", "v:4", "v:5", "v:6"]
    assert all(r["dataset"] == "virt" for r in page2)

    # plugs into the jobs engine as an incremental source: second run
    # starts from the committed token and appends nothing new
    from datahub_spark import jobs as J
    from datahub_spark.store import EntityStore

    es = EntityStore(spark, str(tmp_path / "store"))
    state = J.JobState(str(tmp_path / "state.json"))
    job = J.Job("virt-sync", SC.ScriptVirtualSource(spark, code, params={"n": 7}),
                J.DatasetSink(es, "virt"))
    job.run(state)
    assert es.log(["virt"]).count() == 7
    assert state.token("virt-sync") == 7
    job.run(state)
    assert es.log(["virt"]).count() == 7  # no re-emission

    with pytest.raises(ValueError, match="build_entities"):
        SC.ScriptVirtualSource(spark, "x=1")


def test_get_dataset_changes_and_latest_wins_lookup(spark):
    # multi-version lookup frame: FindById resolves the LATEST version,
    # GetDatasetChanges returns version-ordered rows after `since`
    log = _entities(spark, [
        ("x:1", 1, 0, False, {"p:v": "old"}, None, "dim"),
        ("x:1", 5, 0, False, {"p:v": "new"}, None, "dim"),
        ("x:2", 3, 0, False, {"p:v": "two"}, None, "dim"),
    ])
    probe = _entities(spark, [("q:1", 1, 0, False, None, None, "probe")])
    code = """
def transform_entities(entities):
    for e in entities:
        SetProperty(e, "p", "latest", GetProperty(FindById("x:1"), "p", "v"))
        ch = GetDatasetChanges("dim", since=1)
        SetProperty(e, "p", "n_changes", ToString(len(ch)))
        SetProperty(e, "p", "first_change", GetId(ch[0]))
        SetProperty(e, "p", "limited", ToString(len(GetDatasetChanges("dim", 0, 2))))
    return entities
"""
    (row,) = SC.script_transform(probe, code, lookup=[log]).collect()
    assert row["props"] == {"p:latest": "new", "p:n_changes": "2",
                            "p:first_change": "x:2", "p:limited": "2"}


def test_paged_query_callback_contract(spark, people, nations):
    # transform.go:462-534 PagedQuery(query, pageSize, forEach): pages go
    # to the callback; truthy return continues; fully drained returns []
    code = """
def transform_entities(entities):
    for e in entities:
        pages = []
        r = PagedQuery({"StartURIs": [GetId(e)], "Via": "p:nation",
                        "Inverse": False}, 5,
                       lambda ts: pages.append(ts) or True)
        SetProperty(e, "p", "via_paged", GetProperty(pages[0][0][2], "p", "name"))
        SetProperty(e, "p", "n_pages", ToString(len(pages)))
        SetProperty(e, "p", "cont_len", ToString(len(r)))
    return entities
"""
    out = {r["id"]: r["props"] for r in
           SC.script_transform(people, code, lookup=[people, nations]).collect()}
    assert out["p:1"]["p:via_paged"] == "NORWAY"
    assert out["p:1"]["p:n_pages"] == "1"
    assert out["p:1"]["p:cont_len"] == "0"  # drained


def test_lookup_index_row_cap_raises_with_pointer(spark, people):
    # the guard never materializes the oversized frame driver-side
    big = spark.range(50).select(
        F.concat(F.lit("x:"), F.col("id")).alias("id"),
        F.lit(1).cast("long").alias("recorded"),
        F.col("id").alias("seq"),
        F.lit(False).alias("deleted"),
        F.create_map(F.lit("p:n"), F.col("id").cast("string")).alias("props"),
        F.lit(None).cast("map<string,array<string>>").alias("refs"),
        F.lit("big").alias("dataset"),
    )
    with pytest.raises(ValueError, match="enrich_via"):
        SC.build_lookup_index(big, max_rows=10)
    # under the cap: builds fine
    assert len(SC.build_lookup_index(big, max_rows=100)["by_id"]) == 50


def test_fn_cache_is_content_keyed_and_bounded(spark, people):
    # same (code, ns, index) binding -> same cache key (repeat calls
    # reuse the worker-side compiled env instead of growing the cache)
    code = "def transform_entities(es):\n    return es\n"
    k1 = SC._index_digest(code, {"p": "http://a/"}, None)
    k2 = SC._index_digest(code, {"p": "http://a/"}, None)
    k3 = SC._index_digest(code + " ", {"p": "http://a/"}, None)
    assert k1 == k2 and k1 != k3
    # LRU bound: inserting past the cap evicts the oldest entry
    SC._FN_CACHE.clear()
    for i in range(SC._FN_CACHE_MAX + 4):
        SC._cache_get(f"key{i}", lambda: i)
    assert len(SC._FN_CACHE) == SC._FN_CACHE_MAX
    assert "key0" not in SC._FN_CACHE
    SC._FN_CACHE.clear()
