"""UDA server (datahub_spark.server): serving /entities, /changes and
the fullsync lease out of an EntityStore, e2e against this repo's own
HTTP source/sink — i.e. a peer syncing a dataset OUT of this engine
(reference surface: internal/web/datasethandler.go,
internal/server/dataset.go:81-207)."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from datahub_spark import jobs as J
from datahub_spark import store as S
from datahub_spark.script import SCRIPT_OUTPUT_SCHEMA
from datahub_spark.server import UdaServer


def _entities(spark, rows):
    # nullable schema: recorded=None means "stamp at commit"
    return spark.createDataFrame(rows, SCRIPT_OUTPUT_SCHEMA)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read().decode())


def _post(url: str, payload, headers=None):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json", **(headers or {})})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode() or "{}")
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read().decode() or "{}")


def _split(page):
    """UDA array -> (context, entities, token)."""
    assert page[0]["id"] == "@context"
    assert page[-1]["id"] == "@continuation"
    return page[0], page[1:-1], page[-1]["token"]


@pytest.fixture
def served(spark, tmp_path):
    store = S.EntityStore(spark, str(tmp_path / "store"))
    df = _entities(spark, [
        ("e:1", None, 0, False, {"p:name": "one"}, {"p:link": ["e:2"]}, None),
        ("e:2", None, 1, False, {"p:name": "two"}, None, None),
        ("e:3", None, 2, False, {"p:name": "three"}, None, None),
        ("e:4", None, 3, True, {}, None, None),
        ("e:5", None, 4, False, {"p:name": "five"}, None, None),
    ]).drop("dataset")
    store.store_entities("d", df)
    srv = UdaServer(store, default_limit=1000)
    base = srv.start()
    yield store, base
    srv.stop()


def test_dataset_list(served):
    _, base = served
    assert _get(f"{base}/datasets") == [{"Name": "d"}]


def test_entities_paged_to_exhaustion(served):
    _, base = served
    got, token, pages = [], "", 0
    while True:
        url = f"{base}/datasets/d/entities?limit=2" + (
            f"&from={token}" if token else "")
        _, ents, next_token = _split(_get(url))
        pages += 1
        got.extend(e["id"] for e in ents)
        if next_token == token or not ents:
            break
        token = next_token
    # latest view excludes the e:4 tombstone; key-set pages of 2
    assert got == ["e:1", "e:2", "e:3", "e:5"]
    assert pages == 3  # 2 + 2 + empty drain page


def test_entities_rejects_since(served):
    _, base = served
    code, _ = _req_status(f"{base}/datasets/d/entities?since=5")
    assert code == 400


def test_unknown_dataset_404(served):
    _, base = served
    assert _req_status(f"{base}/datasets/nope/changes")[0] == 404


def _req_status(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as exc:
        return exc.code, None


def test_changes_latest_only_and_watermark(served, spark):
    store, base = served
    # second version for e:2
    store.store_entities("d", _entities(spark, [
        ("e:2", None, 0, False, {"p:name": "two-v2"}, None, None),
    ]).drop("dataset"))
    _, all_changes, _ = _split(_get(f"{base}/datasets/d/changes"))
    assert len(all_changes) == 6  # 5 v1 rows + 1 new version
    _, latest_only, _ = _split(
        _get(f"{base}/datasets/d/changes?latestOnly=true"))
    ids = sorted(e["id"] for e in latest_only)
    assert ids == ["e:1", "e:2", "e:3", "e:4", "e:5"]  # tombstone included
    two = next(e for e in latest_only if e["id"] == "e:2")
    assert two["props"]["p:name"] == "two-v2"
    # bare-int watermark: only the second commit tick comes back
    wm = max(e["recorded"] for e in all_changes if e["id"] != "e:2")
    _, newer, _ = _split(_get(f"{base}/datasets/d/changes?since={wm}"))
    assert [e["id"] for e in newer] == ["e:2"]


def test_changes_pagination_is_stable_mid_tick(served):
    _, base = served
    # all 5 v1 rows share one recorded tick — the triple token must
    # still advance deterministically through them
    got, token = [], ""
    for _ in range(10):
        url = f"{base}/datasets/d/changes?limit=2" + (
            f"&since={token}" if token else "")
        _, ents, next_token = _split(_get(url))
        got.extend(e["id"] for e in ents)
        if next_token == token:
            break
        token = next_token
    assert got == ["e:1", "e:2", "e:3", "e:4", "e:5"]


def test_bad_since_token_is_400(served):
    _, base = served
    assert _req_status(f"{base}/datasets/d/changes?since=%21%21")[0] == 400


def test_http_source_syncs_out_incrementally(served, spark, tmp_path):
    """The advice-item e2e: this repo's own HttpDatasetSource pulls a
    dataset OUT of the served endpoint, incrementally."""
    store, base = served
    mirror = S.EntityStore(spark, str(tmp_path / "mirror"))
    src = J.HttpDatasetSource(
        spark, f"{base}/datasets/d", dataset="d", allow_network=True)

    first = src.read(since=0)
    mirror.store_entities("d", first.drop("dataset"))
    wm = src.current_watermark()
    assert wm > 0
    a = {r["id"]: r["props"] for r in
         S.latest(store.log(["d"])).collect()}
    b = {r["id"]: r["props"] for r in
         S.latest(mirror.log(["d"])).collect()}
    assert a == b

    # upstream advances: new entity + tombstone for e:5
    store.store_entities("d", _entities(spark, [
        ("e:6", None, 0, False, {"p:name": "six"}, None, None),
        ("e:5", None, 1, True, {}, None, None),
    ]).drop("dataset"))

    delta = src.read(since=wm)
    rows = delta.collect()
    assert sorted(r["id"] for r in rows) == ["e:5", "e:6"]  # only the delta
    mirror.store_entities("d", delta.drop("dataset"))
    a = {r["id"]: dict(r["props"]) for r in
         S.latest(store.log(["d"])).collect()}
    b = {r["id"]: dict(r["props"]) for r in
         S.latest(mirror.log(["d"])).collect()}
    assert a == b and "e:5" not in a and "e:6" in a
    assert src.current_watermark() > wm


def test_proxy_dataset_reads_through_served_endpoint(served, spark):
    """proxydataset.go e2e: a local ProxyDataset whose reads delegate —
    over the wire — to the served UDA endpoint; latest/traversal compose
    over the returned frames with nothing landing in a local store."""
    _, base = served
    proxy = J.ProxyDataset(
        spark, f"{base}/datasets/d", name="d", allow_network=True)
    ents = {r["id"]: r for r in proxy.entities().collect()}
    assert set(ents) == {"e:1", "e:2", "e:3", "e:5"}  # tombstone dropped
    assert ents["e:1"]["refs"]["p:link"] == ["e:2"]
    changes = proxy.changes(since=0).collect()
    assert len(changes) == 5  # tombstone included in the change feed


def test_http_sink_posts_into_served_store(served, spark):
    store, base = served
    sink = J.HttpDatasetSink(f"{base}/datasets/d", allow_network=True)
    sink.write(_entities(spark, [
        ("e:9", None, 0, False, {"p:name": "nine"}, None, None),
    ]).drop("dataset"))
    out = {r["id"] for r in S.latest(store.log(["d"])).collect()}
    assert "e:9" in out


def test_namespaces_statistics_transactions(served, spark):
    store, base = served
    # GET /namespaces: prefix -> expansion map
    ns = _get(f"{base}/namespaces")
    assert ns.get("p", "").startswith("http")
    # POST /transactions: atomic multi-dataset commit (txnhandler.go:54)
    code, _ = _post(f"{base}/transactions", {
        "@context": {"namespaces": {}},
        "txnA": [{"id": "t:1", "deleted": False,
                  "props": {"p:name": "alpha"}, "refs": {}}],
        "txnB": [{"id": "t:2", "deleted": False,
                  "props": {}, "refs": {"p:link": "t:1"}}],
    })
    assert code == 200
    assert {r["id"] for r in
            S.latest(store.log(["txnA"])).collect()} == {"t:1"}
    assert S.latest(store.log(["txnB"])).collect()[0]["refs"]["p:link"] == \
        ["t:1"]  # scalar ref normalized to list
    # GET /statistics and /statistics/{ds}
    stats = _get(f"{base}/statistics")
    assert stats["d"]["entities"] == 5
    assert stats["all"]["changes"] >= 7
    only = _get(f"{base}/statistics/txnA")
    assert only["txnA"] == {"changes": 1, "entities": 1}


def test_query_endpoint_entity_lookup(served):
    # queryhandler.go:200-230: entityId -> [@context, merged entity];
    # unknown id -> [@context, {"id": ...}]
    _, base = served
    code, body = _post(f"{base}/query", {"entityId": "e:1"})
    assert code == 200
    assert body[0]["id"] == "@context"
    assert body[1]["id"] == "e:1"
    assert body[1]["props"]["p:name"] == "one"
    assert body[1]["refs"]["p:link"] == ["e:2"]
    code, body = _post(f"{base}/query", {"entityId": "e:404"})
    assert body[1] == {"id": "e:404"}


def test_query_endpoint_related_with_continuation(served):
    # queryhandler.go:249-265: startingEntities/predicate ->
    # [@context, triples(, continuation when limit given)]
    _, base = served
    code, body = _post(f"{base}/query", {
        "startingEntities": ["e:1"], "predicate": "p:link"})
    assert code == 200
    [[start, pred, ent]] = body[1]
    assert (start, pred, ent["id"]) == ("e:1", "p:link", "e:2")
    assert len(body) == 2  # no limit -> no continuation element
    # inverse with limit: continuation pages through
    code, body = _post(f"{base}/query", {
        "startingEntities": ["e:2"], "predicate": "p:link",
        "inverse": True, "limit": 1})
    assert [t[2]["id"] for t in body[1]] == ["e:1"]
    assert body[2] == []  # only one inverse edge: drained


def test_query_endpoint_javascript_query(served):
    # Content-Type application/x-javascript-query (queryhandler.go:144):
    # do_query script streams WriteQueryResult objects back
    _, base = served
    js = """function do_query() {
        var hits = Query(["e:1"], "p:link", false);
        for (h of hits) {
            WriteQueryResult({start: h[0], related: GetId(h[2])});
        }
    }"""
    code, body = _post(
        f"{base}/query", {"query": js},
        headers={"Content-Type": "application/x-javascript-query"})
    assert code == 200
    assert body == [{"start": "e:1", "related": "e:2"}]


def _put(url: str, payload=None):
    req = urllib.request.Request(
        url, data=json.dumps(payload or {}).encode(), method="PUT",
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read().decode() or "{}")
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read().decode() or "{}")


def test_jobs_api_over_http(spark, tmp_path):
    """jobshandler.go / joboperationhandler.go: POST a verbatim
    JobConfiguration over HTTP, operate it, and see its output land in
    the served store — a peer can fully DRIVE this engine's job engine
    through the wire."""
    import base64

    store = S.EntityStore(spark, str(tmp_path / "store"))
    store.store_entities("src", _entities(spark, [
        ("s:1", None, 0, False, {"p:name": "a"}, None, None),
        ("s:2", None, 1, False, {"p:name": "b"}, None, None),
    ]).drop("dataset"))
    state = J.JobState(str(tmp_path / "state.json"))
    sched = J.Scheduler(state)
    srv = UdaServer(store, scheduler=sched)
    base = srv.start()
    try:
        js = """function transform_entities(entities) {
            for (e of entities) {
                SetProperty(e, "p", "upper",
                            GetProperty(e, "p", "name", "").toUpperCase());
            }
            return entities;
        }"""
        cfg = {
            "id": "wire-job",
            "triggers": [{"triggerType": "cron", "jobType": "incremental",
                          "schedule": "@every 1m"}],
            "source": {"Type": "DatasetSource", "Name": "src"},
            "transform": {"Type": "JavascriptTransform",
                          "Code": base64.b64encode(js.encode()).decode()},
            "sink": {"Type": "DatasetSink", "Name": "out"},
        }
        code, body = _post(f"{base}/jobs", cfg)
        assert code == 201 and body == {"id": "wire-job"}
        assert _get(f"{base}/jobs") == [cfg]
        assert _get(f"{base}/jobs/_/schedules") == {"wire-job": "@every 1m"}
        # run it over the wire; output lands in the store
        code, _ = _put(f"{base}/job/wire-job/run")
        assert code == 200
        out = {r["id"]: r["props"]["p:upper"] for r in
               S.latest(store.log(["out"])).collect()}
        assert out == {"s:1": "A", "s:2": "B"}
        # history recorded; status idle; lineage has the edge
        hist = _get(f"{base}/jobs/_/history")["wire-job"]
        assert hist and hist[0]["id"] == "wire-job"
        assert _get(f"{base}/job/wire-job/status") == {"state": "Stopped"}
        # jobsListStatus (jobshandler.go:109): idle -> [], running ->
        # JobStatus rows {jobId, jobTitle, started}
        assert _get(f"{base}/jobs/_/status") == []
        assert srv._runner.raffle.borrow(sched.jobs["wire-job"])
        try:
            (st,) = _get(f"{base}/jobs/_/status")
            assert st["jobId"] == "wire-job" and "started" in st
        finally:
            srv._runner.raffle.give_back(sched.jobs["wire-job"])
        lin = _get(f"{base}/lineage")
        assert any(e.get("from") == "src" or e.get("source") == "src"
                   or "src" in json.dumps(e) for e in lin)
        # pause blocks run; resume + reset re-run from token 0
        _put(f"{base}/job/wire-job/pause")
        assert sched.jobs["wire-job"].paused is True
        _put(f"{base}/job/wire-job/resume")
        _put(f"{base}/job/wire-job/reset")
        assert state.token("wire-job") == 0
        # reset_meta clears MultiSource dependency watermarks
        # (joboperationhandler.go:102 ResetJobMeta analogue)
        state.set_dep_tokens("wire-job", {"dep": 7})
        assert _put(f"{base}/job/wire-job/reset_meta")[0] == 200
        assert state.dep_tokens("wire-job") == {}
        # kill on a non-running job is 200 (best-effort, like KillJob)
        assert _put(f"{base}/job/wire-job/kill")[0] == 200
        # delete unregisters
        req = urllib.request.Request(f"{base}/jobs/wire-job",
                                     method="DELETE")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
        assert _get(f"{base}/jobs") == []
    finally:
        srv.stop()


def test_content_and_compaction_over_http(spark, tmp_path):
    # contenthandler.go:44-48 CRUD; compactionhandler.go:22 dedup trigger
    from datahub_spark.content import ContentService

    store = S.EntityStore(spark, str(tmp_path / "store"))
    # two identical successive versions: compaction drops one
    for _ in range(2):
        store.store_entities("d", _entities(spark, [
            ("e:1", None, 0, False, {"p:name": "same"}, None, None),
        ]).drop("dataset"), skip_unchanged=False)
    srv = UdaServer(store, content=ContentService(str(tmp_path / "content")))
    base = srv.start()
    try:
        code, body = _post(f"{base}/content", {"id": "c1", "data": {"x": 1}})
        assert code == 201
        assert _get(f"{base}/content/c1")["data"] == {"x": 1}
        code, _ = _put(f"{base}/content/c1", {"id": "c1", "data": {"x": 2}})
        assert code == 200
        assert _get(f"{base}/content/c1")["data"] == {"x": 2}
        assert len(_get(f"{base}/content")) == 1
        req = urllib.request.Request(f"{base}/content/c1", method="DELETE")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200

        assert store.log(["d"]).count() == 2
        code, _ = _post(f"{base}/compact",
                        {"dataset": "d", "strategy": "deduplication"})
        assert code == 200
        assert store.log(["d"]).count() == 1  # duplicate version dropped
        code, _ = _post(f"{base}/compact",
                        {"dataset": "d", "strategy": "bogus"})
        assert code == 400
        # engine extra: cleanDeleted purges latest-tombstoned entities
        # in the same rewrite (Cleandeleted over the wire)
        store.store_entities("d", _entities(spark, [
            ("e:1", None, 0, True, {}, None, None),
        ]).drop("dataset"), skip_unchanged=False)
        code, _ = _post(f"{base}/compact",
                        {"dataset": "d", "strategy": "deduplication",
                         "cleanDeleted": True})
        assert code == 200
        assert store.log(["d"]).count() == 0
    finally:
        srv.stop()


def _fs_headers(sync_id, start=False, end=False):
    h = {"universal-data-api-full-sync-id": sync_id}
    if start:
        h["universal-data-api-full-sync-start"] = "true"
    if end:
        h["universal-data-api-full-sync-end"] = "true"
    return h


def _uda_batch(*objs):
    return [{"id": "@context", "namespaces": {}}] + list(objs)


def test_fullsync_lease_protocol(served, spark):
    store, base = served
    url = f"{base}/datasets/d/entities"
    # start a sync carrying e:1 only
    code, _ = _post(url, _uda_batch(
        {"id": "e:1", "deleted": False, "props": {"p:name": "one-v2"},
         "refs": {}}), _fs_headers("sync1", start=True))
    assert code == 200
    # a competing fullsync start conflicts
    code, _ = _post(url, _uda_batch(), _fs_headers("sync2", start=True))
    assert code == 409
    # a plain write during the sync conflicts (datasethandler.go:819)
    code, _ = _post(url, _uda_batch(
        {"id": "e:7", "deleted": False, "props": {}, "refs": {}}))
    assert code == 409
    # an unknown lease id cannot refresh
    code, _ = _post(url, _uda_batch(), _fs_headers("sync2"))
    assert code == 409
    # second batch under the lease, then end
    code, _ = _post(url, _uda_batch(
        {"id": "e:2", "deleted": False, "props": {"p:name": "two"},
         "refs": {}}), _fs_headers("sync1"))
    assert code == 200
    code, _ = _post(url, _uda_batch(), _fs_headers("sync1", end=True))
    assert code == 200
    # fullsync complete: snapshot = {e:1, e:2}; everything else
    # tombstoned (FullSyncSession.complete left-anti diff)
    out = {r["id"] for r in S.latest(store.log(["d"])).collect()}
    assert out == {"e:1", "e:2"}
    # lease is gone: ending again is 410
    code, _ = _post(url, _uda_batch(), _fs_headers("sync1", end=True))
    assert code == 410
    # and plain writes work again
    code, _ = _post(url, _uda_batch(
        {"id": "e:8", "deleted": False, "props": {}, "refs": {}}))
    assert code == 200


# -- streaming request-body parsing (streamparser.go:1-486) ----------------

class _TrackedStream:
    """BytesIO-alike that records how far the wire has been read."""

    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def read(self, n: int) -> bytes:
        chunk = self.data[self.pos:self.pos + n]
        self.pos += len(chunk)
        return chunk


def test_iter_json_array_is_incremental():
    from datahub_spark.server import iter_json_array

    objs = [{"id": f"e:{i}", "props": {"p:n": "x" * 50}} for i in range(2000)]
    data = json.dumps(objs).encode()
    ts = _TrackedStream(data)
    it = iter_json_array(ts, len(data), chunk_bytes=1024)
    got = []
    consumed = 0
    max_outstanding = 0
    for obj in it:
        got.append(obj)
        consumed += len(json.dumps(obj).encode())
        # bytes pulled off the wire but not yet yielded: bounded by a few
        # chunks + one element — NEVER the whole body
        max_outstanding = max(max_outstanding, ts.pos - consumed)
    assert got == objs
    assert ts.pos == len(data)
    assert max_outstanding < 8 * 1024, max_outstanding


def test_iter_json_array_utf8_split_and_edges():
    from datahub_spark.server import iter_json_array

    objs = [{"id": "e:ü", "props": {"p:t": "héllo 🌍 日本語"}}, {"id": "e:2"}]
    data = json.dumps(objs, ensure_ascii=False).encode()
    # chunk size 3 guarantees multi-byte codepoints split across reads
    out = list(iter_json_array(_TrackedStream(data), len(data), chunk_bytes=3))
    assert out == objs
    # empty body -> no elements (UDA tolerates it)
    assert list(iter_json_array(_TrackedStream(b""), 0)) == []
    assert list(iter_json_array(_TrackedStream(b"  [ ]"), 5)) == []
    # malformed: not an array / truncated mid-element
    with pytest.raises(ValueError):
        list(iter_json_array(_TrackedStream(b'{"id": 1}'), 9))
    with pytest.raises(ValueError):
        bad = b'[{"id": "e:1"}, {"id": "e:'
        list(iter_json_array(_TrackedStream(bad), len(bad)))


def test_streamed_post_chunks_single_commit(served, monkeypatch):
    from datahub_spark.server import UdaServer

    store, base = served
    monkeypatch.setattr(UdaServer, "BODY_CHUNK_ROWS", 250)
    n = 1200  # >> chunk rows: body parses as 5 DataFrame chunks
    batch = _uda_batch(*[
        {"id": f"big:{i}", "deleted": False,
         "props": {"p:n": str(i)}, "refs": {}} for i in range(n)])
    code, _ = _post(f"{base}/datasets/big/entities", batch)
    assert code == 200
    log = store.log(["big"])
    assert log.count() == n
    # chunked parse must still be ONE atomic commit
    assert log.select("recorded").distinct().count() == 1


def test_streamed_post_malformed_is_400_and_releases_lease(served):
    store, base = served
    url = f"{base}/datasets/d/entities"
    body = b'[{"id": "@context", "namespaces": {}}, {"id": "e:1", '  # cut off
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type": "application/json",
                 **_fs_headers("syncX", start=True)})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            code = resp.status
    except urllib.error.HTTPError as exc:
        code = exc.code
    assert code == 400
    # the lease started by the failed request must not linger: a fresh
    # fullsync can start immediately
    code, _ = _post(url, _uda_batch(
        {"id": "e:1", "deleted": False, "props": {}, "refs": {}}),
        _fs_headers("syncY", start=True))
    assert code == 200
    code, _ = _post(url, _uda_batch(), _fs_headers("syncY", end=True))
    assert code == 200


# -- JSON-LD content negotiation (datasethandler.go:246-340,492-530) -------

def _get_with_headers(url: str, headers: dict):
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.headers.get("Content-Type"), json.loads(resp.read().decode())


def test_entities_jsonld_negotiation(served):
    _, base = served
    for url, hdrs in [
        (f"{base}/datasets/d/entities?format=jsonld", {}),
        (f"{base}/datasets/d/entities", {"Accept": "application/ld+json"}),
    ]:
        ctype, page = _get_with_headers(url, hdrs)
        assert ctype == "application/ld+json"
        # context: namespace map + the fixed core/rdf prefixes
        ctx = page[0]["@context"]
        assert ctx["core"] == "http://data.mimiro.io/core/uda/"
        assert ctx["rdf"] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        # entities: @id nodes, props verbatim, refs as {"@id": ...} nodes
        ents = {e["@id"]: e for e in page[1:-1]}
        assert set(ents) == {"e:1", "e:2", "e:3", "e:5"}  # e:4 deleted
        assert ents["e:1"]["p:name"] == "one"
        assert ents["e:1"]["p:link"] == [{"@id": "e:2"}]
        assert "id" not in ents["e:1"] and "props" not in ents["e:1"]
        # continuation: the JSON-LD token node, not {"id":"@continuation"}
        cont = page[-1]
        assert cont["rdf:type"] == {"@id": "core:continuation"}
        assert isinstance(cont["core:token"], str) and cont["core:token"]


def test_changes_jsonld_and_plain_unchanged(served):
    _, base = served
    ctype, page = _get_with_headers(
        f"{base}/datasets/d/changes?format=jsonld", {})
    assert ctype == "application/ld+json"
    assert "@context" in page[0]
    assert all("@id" in e for e in page[1:-1])
    assert page[-1]["rdf:type"] == {"@id": "core:continuation"}
    # plain JSON output is byte-for-byte the UDA shape it always was
    ctype, plain = _get_with_headers(f"{base}/datasets/d/changes", {})
    assert ctype == "application/json"
    assert plain[0]["id"] == "@context"
    assert plain[-1]["id"] == "@continuation"


def test_http_request_metrics(spark, tmp_path):
    # loggerfilter.go:64-74: http.count / http.time / http.size per
    # request, tagged method/path/status
    from datahub_spark.metrics import RecordingMetrics

    store = S.EntityStore(spark, str(tmp_path / "mstore"))
    df = _entities(spark, [
        ("e:1", None, 0, False, {"p:name": "one"}, None, None),
    ]).drop("dataset")
    store.store_entities("d", df)
    rec = RecordingMetrics()
    srv = UdaServer(store, metrics=rec)
    base = srv.start()
    try:
        _get(f"{base}/datasets/d/entities")
        code, _ = _post(f"{base}/datasets/nope/entities/extra", [])
        assert code == 404
    finally:
        srv.stop()
    counts = rec.named("http.count")
    assert {(e["tags"]["method"], e["tags"]["path"], e["tags"]["status"])
            for e in counts} == {
        ("GET", "/datasets/d/entities", 200),
        ("POST", "/datasets/nope/entities/extra", 404),
    }
    times = rec.named("http.time")
    assert len(times) == 2 and all(e["value"] > 0 for e in times)
    sizes = rec.named("http.size")
    assert len(sizes) == 2 and all(e["value"] > 0 for e in sizes)


def test_changes_reverse_pages_newest_first(served, spark):
    """?reverse=true walks the change-log newest-first with the same
    continuation protocol (datasethandler.go:551,702-731); /entities
    rejects the parameter (datasethandler.go:286-288)."""
    _, base = served
    ctx, ents, token = _split(_get(f"{base}/datasets/d/changes?reverse=true&limit=3"))
    recs = [e["recorded"] for e in ents]
    assert len(ents) == 3
    assert recs == sorted(recs, reverse=True)

    # the token continues strictly older; drain and compare with the
    # forward walk reversed
    seen = [e["id"] for e in ents]
    for _ in range(100):
        ctx, ents, token2 = _split(_get(
            f"{base}/datasets/d/changes?reverse=true&limit=3&since={token}"))
        if not ents:
            break
        seen += [e["id"] for e in ents]
        token = token2
    fw_ctx, fw_ents, _ = _split(_get(f"{base}/datasets/d/changes?limit=10000"))
    assert seen == [e["id"] for e in reversed(fw_ents)]

    assert _req_status(f"{base}/datasets/d/entities?reverse=true")[0] == 400


def test_dataset_management_over_http(served, spark):
    """Create / get-details / rename / delete lifecycle
    (datasethandler.go:66-75,212-300): proxy and virtual configs are
    validated, renames move the log, deletes drop it."""
    store, base = served

    # create plain + duplicate 400
    assert _post(f"{base}/datasets/fresh", {})[0] == 200
    assert "fresh" in [d["Name"] for d in _get(f"{base}/datasets")]
    assert _post(f"{base}/datasets/fresh", {})[0] == 400

    # proxy config validated (datasethandler.go:269-273)
    assert _post(f"{base}/datasets/px?proxy=true", {})[0] == 400
    assert _post(f"{base}/datasets/px?proxy=true",
                 {"ProxyDatasetConfig": {"remoteUrl": "http://peer/datasets/d"}}
                 )[0] == 200
    # virtual config validated (datasethandler.go:275-279); the served
    # path only runs the sandboxed JS interpreter, so a Python body is
    # refused at create time (ADVICE r7: exec() would be RCE)
    assert _post(f"{base}/datasets/vx",
                 {"VirtualDatasetConfig": {}})[0] == 400
    py_b64 = ("aW1wb3J0IG9zCmRlZiBidWlsZF9lbnRpdGllcyhwYXJhbXMsIHNpbmNlLCBsaW1"
              "pdCk6CiAgICByZXR1cm4gMAo=")
    assert _post(f"{base}/datasets/vx",
                 {"VirtualDatasetConfig": {"Transform": py_b64}})[0] == 400
    js_b64 = ("ZnVuY3Rpb24gYnVpbGRfZW50aXRpZXMocGFyYW1zLCBzaW5jZSwgbGltaXQpIH"
              "sgcmV0dXJuIDA7IH0=")
    assert _post(f"{base}/datasets/vx",
                 {"VirtualDatasetConfig": {"Transform": js_b64}})[0] == 200

    # details: core entity shape with items count (datasethandler.go:212)
    details = _get(f"{base}/datasets/d")
    assert details["id"] == "core:d"
    assert details["props"]["core:items"] == 4  # e:4 is deleted
    assert _req_status(f"{base}/datasets/nope")[0] == 404

    # rename via PATCH (UpdateDatasetConfig.ID), data follows the name
    import urllib.request
    req = urllib.request.Request(
        f"{base}/datasets/d", data=json.dumps({"ID": "d2"}).encode(),
        method="PATCH", headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
    names = [d["Name"] for d in _get(f"{base}/datasets")]
    assert "d2" in names and "d" not in names
    _, ents, _ = _split(_get(f"{base}/datasets/d2/entities"))
    assert {e["id"] for e in ents} == {"e:1", "e:2", "e:3", "e:5"}

    # delete one (unknown -> 400), then delete all
    req = urllib.request.Request(f"{base}/datasets/nope", method="DELETE")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as exc:
        assert exc.code == 400
    req = urllib.request.Request(f"{base}/datasets/px", method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
    req = urllib.request.Request(f"{base}/datasets", method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
    assert _get(f"{base}/datasets") == []


def test_proxy_dataset_read_through_with_auth_provider(served, spark, tmp_path):
    """A dataset created with ?proxy=true forwards /entities and
    /changes to its remoteUrl, authorizing outgoing requests via the
    configured login provider (proxydataset.go:200-300 + the served
    create config) — two servers loopback: B proxies A's secured data."""
    from datahub_spark.providers import ProviderConfig, ProviderStore
    from datahub_spark.security import AccessControl, SecurityManager

    _, base_a0 = served  # unused plain server; build a secured A instead
    sec = SecurityManager(admin_client_secret="a-pw")
    sec.add_client("proxyclient", "proxy-pw")
    sec.set_acls("proxyclient", [AccessControl("/datasets/src*", "read")])
    store_a = S.EntityStore(spark, str(tmp_path / "a"))
    store_a.store_entities("src", _entities(spark, [
        ("e:10", None, 0, False, {"p:name": "ten"}, None, None),
        ("e:11", None, 1, False, {"p:name": "eleven"}, None, None),
    ]).drop("dataset"))
    srv_a = UdaServer(store_a, security=sec)
    base_a = srv_a.start()

    store_b = S.EntityStore(spark, str(tmp_path / "b"))
    providers_b = ProviderStore(security_manager=None)
    providers_b.add(ProviderConfig.from_json({
        "name": "alogin", "type": "bearer",
        "key": {"type": "text", "value": "proxyclient"},
        "secret": {"type": "text", "value": "proxy-pw"},
        "endpoint": {"type": "text", "value": f"{base_a}/security/token"}}))
    srv_b = UdaServer(store_b, providers=providers_b)
    base_b = srv_b.start()
    try:
        code, _ = _post(
            f"{base_b}/datasets/mirror?proxy=true",
            {"ProxyDatasetConfig": {
                "remoteUrl": f"{base_a}/datasets/src",
                "authProviderName": "alogin"}})
        assert code == 200
        _, ents, _ = _split(_get(f"{base_b}/datasets/mirror/entities"))
        assert {e["id"] for e in ents} == {"e:10", "e:11"}
        _, chs, _ = _split(_get(f"{base_b}/datasets/mirror/changes?limit=1"))
        assert len(chs) == 1
    finally:
        srv_a.stop()
        srv_b.stop()


def test_virtual_dataset_served_runs_js_script(served, spark):
    """A dataset created with a VirtualDatasetConfig serves pages by
    running its (base64) JS build_entities on the bundled interpreter —
    the reference's read-only script-backed dataset
    (DOCUMENTATION.md:288-325, virtualdataset.go)."""
    import base64

    js = """
    function build_entities(params, since, limit) {
        var start = since || 0;
        var n = limit < 3 ? limit : 3;
        for (var i = start; i < start + n; i++) {
            var e = NewEntity();
            SetId(e, "v:" + i);
            SetProperty(e, "p", "idx", i);
            Emit(e);
        }
        return start + n;
    }
    """
    cfg = {"VirtualDatasetConfig":
           {"Transform": base64.b64encode(js.encode()).decode()}}
    _, base = served
    assert _post(f"{base}/datasets/gen", cfg)[0] == 200

    _, ents, token = _split(_get(f"{base}/datasets/gen/entities?limit=3"))
    assert [e["id"] for e in ents] == ["v:0", "v:1", "v:2"]
    assert token == 3
    # the continuation token pages the script
    _, ents2, token2 = _split(
        _get(f"{base}/datasets/gen/entities?limit=3&since={token}"))
    assert [e["id"] for e in ents2] == ["v:3", "v:4", "v:5"]
    assert token2 == 6


def test_served_surface_under_concurrent_load(served, spark):
    """ThreadingHTTPServer + Spark driver thread-pool under mixed
    concurrent reads: 6 threads x 8 requests across entities / changes
    / query-index / statistics — every response well-formed, zero 5xx
    (the store's registry locks and the lazily-built query index must
    hold up)."""
    import threading

    _, base = served
    errors: list = []

    def hit(kind, i):
        try:
            if kind == 0:
                page = _get(f"{base}/datasets/d/entities?limit=3")
                assert page[0]["id"] == "@context"
            elif kind == 1:
                page = _get(f"{base}/datasets/d/changes?limit=2")
                assert page[-1]["id"] == "@continuation"
            elif kind == 2:
                code, body = _post(f"{base}/query",
                                   {"entityId": "e:1"})
                assert code == 200
            else:
                _get(f"{base}/statistics")
        except Exception as exc:  # noqa: BLE001
            errors.append((kind, i, exc))

    threads = [threading.Thread(target=hit, args=(n % 4, n))
               for n in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == [], errors[:3]


def test_wal_served_writes_equal_direct_store(spark, tmp_path):
    """r7 verdict item 7: with wal_writes=True, N small POSTs append to
    an fsync-durable spool (no Spark job per request) and one flush
    commits them — the resulting store state equals writing the same
    batches directly. Reads force the flush (read-your-writes), and an
    explicit flush_wal() also works."""
    store = S.EntityStore(spark, str(tmp_path / "walsrv"))
    srv = UdaServer(store, wal_writes=True, wal_flush_entities=10_000)
    base = srv.start()
    try:
        for i in range(5):
            code, _ = _post(f"{base}/datasets/hot/entities", [
                {"id": f"e:{i * 2}", "props": {"p:n": str(i * 2)},
                 "refs": {"p:r": [f"e:{i * 2 + 1}"]}},
                {"id": f"e:{i * 2 + 1}", "props": {"p:n": str(i * 2 + 1)}},
            ])
            assert code == 200
        # durable but not yet committed (below the flush threshold)
        assert not store.has_data("hot")
        recs = srv.flush_wal()
        assert "hot" in recs
        rows = {r["id"]: r for r in store.log(["hot"]).collect()}
        assert set(rows) == {f"e:{i}" for i in range(10)}
        assert rows["e:0"]["props"]["p:n"] == "0"
        assert rows["e:0"]["refs"]["p:r"] == ["e:1"]
        # append order preserved across POSTs
        assert rows["e:0"]["seq"] < rows["e:5"]["seq"] < rows["e:9"]["seq"]

        # equal to a direct store of the same batches
        direct = S.EntityStore(spark, str(tmp_path / "direct"))
        direct.store_entities("hot", _entities(spark, [
            (f"e:{i}", None, i, False, {"p:n": str(i)},
             {"p:r": [f"e:{i + 1}"]} if i % 2 == 0 else {}, None)
            for i in range(10)]).drop("dataset"))
        a = {(r["id"], str(r["props"]), str(r["refs"]), r["deleted"])
             for r in store.log(["hot"]).collect()}
        b = {(r["id"], str(r["props"]), str(r["refs"]), r["deleted"])
             for r in direct.log(["hot"]).collect()}
        assert a == b

        # read-your-writes: a GET flushes pending spool rows
        assert _post(f"{base}/datasets/hot/entities",
                     [{"id": "e:99", "props": {"p:n": "99"}}])[0] == 200
        page = _get(f"{base}/datasets/hot/entities?limit=100")
        _, ents, _ = _split(page)
        assert "e:99" in {e["id"] for e in ents}
    finally:
        srv.stop()


def test_wal_served_writes_autoflush_threshold(spark, tmp_path):
    """Crossing wal_flush_entities commits without an explicit flush."""
    store = S.EntityStore(spark, str(tmp_path / "walsrv2"))
    srv = UdaServer(store, wal_writes=True, wal_flush_entities=6)
    base = srv.start()
    try:
        for i in range(3):  # 3 posts x 2 entities = 6 -> autoflush
            assert _post(f"{base}/datasets/hot/entities", [
                {"id": f"e:{i}a"}, {"id": f"e:{i}b"}])[0] == 200
        assert store.has_data("hot")
        assert store.log(["hot"]).count() == 6
    finally:
        srv.stop()


def test_health_root_and_namespace_query(served):
    """NewStatusHandler (web.go:136-143) + queryNamespacePrefix
    (queryhandler.go:94-109): /health is plain 'UP', / is the service
    info object, /query/namespace maps an expansion URI to its prefix
    (404 when unregistered)."""
    _, base = served
    with urllib.request.urlopen(f"{base}/health", timeout=30) as resp:
        assert resp.status == 200
        assert resp.read() == b"UP"
    info = _get(f"{base}/")
    assert info["name"] == "DataHub" and info["location"].startswith("server:")
    from urllib.parse import quote

    exp = "http://example.io/schema/"
    got = _get(f"{base}/query/namespace?expansion={quote(exp, safe='')}")
    assert got == {"prefix": "p", "expansion": exp}
    assert _req_status(f"{base}/query/namespace?expansion=nope")[0] == 404


def test_openapi_document_served_and_valid(spark, tmp_path):
    """GET /api (r10): a generated OAS3 document covering exactly the
    served routes — the machine-readable analogue of the reference's
    api/datahub.oas3.yml. Structural validity via openapi.validate_oas3,
    coverage vs the reference's full path set, and a live probe of every
    documented GET route: the dispatcher must not answer with its
    route-miss marker ({"message": "not found"}), which would mean the
    document describes a route the server doesn't have."""
    from datahub_spark.content import ContentService
    from datahub_spark.openapi import validate_oas3
    from datahub_spark.providers import ProviderStore
    from datahub_spark.security import SecurityManager

    store = S.EntityStore(spark, str(tmp_path / "store"))
    store.store_entities("d", _entities(spark, [
        ("e:1", None, 0, False, {"p:name": "one"}, None, None),
    ]).drop("dataset"))
    state = J.JobState(str(tmp_path / "state.json"))
    sec = SecurityManager(admin_client_secret="pw")
    srv = UdaServer(store, scheduler=J.Scheduler(state),
                    content=ContentService(str(tmp_path / "content")),
                    security=sec,
                    providers=ProviderStore(security_manager=None))
    base = srv.start()
    try:
        st, tok = _post(f"{base}/security/token", {
            "grant_type": "client_credentials",
            "client_id": "admin", "client_secret": "pw"})
        assert st == 200
        hdr = {"Authorization": f"Bearer {tok['access_token']}"}

        req = urllib.request.Request(f"{base}/api", headers=hdr)
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            doc = json.loads(resp.read().decode())
        validate_oas3(doc)

        # every path of the reference document is served and documented
        reference_paths = {
            "/", "/health", "/query", "/namespaces", "/jobs",
            "/jobs/{jobid}", "/job/{jobid}/status", "/job/{jobid}/pause",
            "/job/{jobid}/resume", "/job/{jobid}/kill", "/job/{jobid}/run",
            "/job/{jobid}/reset", "/datasets", "/datasets/{dataset}",
            "/datasets/{dataset}/entities", "/datasets/{dataset}/changes",
            "/content", "/content/{contentId}", "/provider/logins",
            "/provider/login/{providerName}"}
        missing = reference_paths - set(doc["paths"])
        assert not missing, missing
        assert "/api" in doc["paths"]
        assert "BearerAuth" in doc["components"]["securitySchemes"]

        # live probe: every documented GET route dispatches (a resource
        # 404 like "no such job" is fine; the route-miss marker is not)
        for path, ops in doc["paths"].items():
            if "get" not in ops:
                continue
            url = base + path.replace("{dataset}", "d") \
                             .replace("{jobid}", "nope") \
                             .replace("{contentId}", "nope") \
                             .replace("{clientid}", "nope") \
                             .replace("{providerName}", "nope")
            req = urllib.request.Request(url, headers=hdr)
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    assert resp.status == 200, path
            except urllib.error.HTTPError as exc:
                body = json.loads(exc.read().decode() or "{}")
                assert body.get("message") != "not found", path

        # a slim server documents only its attached modules
        srv2 = UdaServer(store)
        base2 = srv2.start()
        try:
            doc2 = _get(f"{base2}/api")
            validate_oas3(doc2)
            assert "/jobs" not in doc2["paths"]
            assert "/content" not in doc2["paths"]
            assert "/security/token" not in doc2["paths"]
            assert "securitySchemes" not in doc2["components"]
        finally:
            srv2.stop()
    finally:
        srv.stop()


def test_lineage_per_dataset(spark, tmp_path):
    """GET /lineage/{dataset} (lineagehandler.go:14-29): the subset of
    the lineage graph touching the named dataset; 404 when the dataset
    is not registered (the handler checks DsManager.GetDataset)."""
    store = S.EntityStore(spark, str(tmp_path / "store"))
    store.store_entities("src", _entities(spark, [
        ("s:1", None, 0, False, {"p:name": "a"}, None, None),
    ]).drop("dataset"))
    store.store_entities("other", _entities(spark, [
        ("o:1", None, 0, False, {}, None, None),
    ]).drop("dataset"))
    state = J.JobState(str(tmp_path / "state.json"))
    sched = J.Scheduler(state)
    srv = UdaServer(store, scheduler=sched)
    base = srv.start()
    try:
        cfg = {
            "id": "copy-job",
            "triggers": [{"triggerType": "cron", "jobType": "incremental",
                          "schedule": "@every 1m"}],
            "source": {"Type": "DatasetSource", "Name": "src"},
            "sink": {"Type": "DatasetSink", "Name": "out"},
        }
        code, _ = _post(f"{base}/jobs", cfg)
        assert code == 201
        full = _get(f"{base}/lineage")
        sub = _get(f"{base}/lineage/src")
        assert sub == [e for e in full
                       if e["From"] == "src" or e["To"] == "src"]
        assert {"From": "src", "To": "out", "Type": "copy"} in sub
        # a registered dataset no job touches: empty list, not an error
        assert _get(f"{base}/lineage/other") == []
        # unregistered dataset: 404
        try:
            _get(f"{base}/lineage/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as exc:
            assert exc.code == 404
    finally:
        srv.stop()


def test_query_get_and_post_same_protocol(served):
    """GET /query is the same handler as POST /query in the reference
    (queryhandler.go:89-90 registers queryHandler for both verbs) —
    an entityId lookup body must answer identically via either."""
    _, base = served
    payload = {"entityId": "e:1"}
    code_p, via_post = _post(f"{base}/query", payload)
    req = urllib.request.Request(
        f"{base}/query", data=json.dumps(payload).encode(), method="GET",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        code_g, via_get = resp.status, json.loads(resp.read().decode())
    assert code_p == code_g == 200
    assert via_get == via_post
    assert any(e.get("id") == "e:1" for e in via_get
               if isinstance(e, dict))
