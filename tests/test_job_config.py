"""Reference JobConfiguration JSON runs verbatim: parse_job_config /
Scheduler.register_config against job definitions lifted from the
reference's own pipeline tests (internal/jobs/pipeline_test.go,
scheduler.go:79-90 config schema; source registry scheduler.go:613,
sink registry sink.go:45, transform registry transform.go)."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from datahub_spark import jobs as J
from datahub_spark import store as S
from datahub_spark.cron import CronSpec
from datahub_spark.model import ENTITY_SCHEMA
from datahub_spark.store import EntityStore


@pytest.fixture
def products_store(spark, tmp_path):
    es = EntityStore(spark, str(tmp_path / "store"))
    df = spark.createDataFrame([
        ("product:1", 1, 0, False, {"p:name": "hammer"}, None, "x"),
        ("product:2", 1, 0, False, {"p:name": "wrench"}, None, "x"),
    ], ENTITY_SCHEMA).drop("dataset")
    es.store_entities("Products", df)
    return es


# verbatim from pipeline_test.go:89-99
_TXN_JS = """
            function transform_entities(entities) {
                for (e of entities) {
                    var txn = NewTransaction();
                    var newentities = [];
                    newentities.push(e);
                    txn.DatasetEntities["NewProducts"] = newentities;
                    txn.DatasetEntities["ProductAudit"] = newentities;
                    ExecuteTransaction(txn);
                }
                return entities;
            }
            """


def _txn_job_json() -> str:
    # verbatim shape from pipeline_test.go:104-119
    code = base64.b64encode(_TXN_JS.encode()).decode()
    return """
        {
            "id" : "sync-datasetsource-to-datasetsink-with-js",
            "triggers": [{"triggerType": "cron", "jobType": "incremental", "schedule": "@every 2s"}],
            "source" : {
                "Type" : "DatasetSource",
                "Name" : "Products"
            },
            "transform" : {
                "Type" : "JavascriptTransform",
                "Code" : "%s"
            },
            "sink" : {
                "Type" : "DevNullSink"
            }
        }""" % code


def test_reference_txn_job_json_runs_verbatim(spark, products_store, tmp_path):
    state = J.JobState(str(tmp_path / "state.json"))
    sched = J.Scheduler(state)
    job = sched.register_config(products_store, _txn_job_json())
    assert job.job_id == "sync-datasetsource-to-datasetsink-with-js"
    assert "sync-datasetsource-to-datasetsink-with-js" in sched.schedules

    job.run(state)
    # pipeline_test.go:135-140: transaction targets received the entities
    for ds in ("NewProducts", "ProductAudit"):
        got = {r["id"] for r in
               S.latest(products_store.log([ds])).collect()}
        assert got == {"product:1", "product:2"}, ds
    # the DevNullSink wrote nothing anywhere else
    assert sorted(products_store.list_datasets()) == [
        "NewProducts", "ProductAudit", "Products"]


def test_txn_entities_route_even_with_dataset_sink(spark, products_store,
                                                  tmp_path):
    cfg = json.loads(_txn_job_json())
    cfg["sink"] = {"Type": "DatasetSink", "Name": "Copied"}
    state = J.JobState(str(tmp_path / "state.json"))
    job, _ = J.parse_job_config(products_store, cfg)
    job.run(state)
    # returned entities -> sink dataset; txn entities -> their targets
    assert {r["id"] for r in
            S.latest(products_store.log(["Copied"])).collect()} == \
        {"product:1", "product:2"}
    assert {r["id"] for r in
            S.latest(products_store.log(["NewProducts"])).collect()} == \
        {"product:1", "product:2"}


def test_union_source_and_error_handler_config(spark, products_store,
                                               tmp_path):
    products_store.store_entities("Extras", spark.createDataFrame([
        ("extra:1", 1, 0, False, {"p:name": "bolt"}, None, "x"),
    ], ENTITY_SCHEMA).drop("dataset"))
    cfg = {
        "id": "union-job",
        "triggers": [{"triggerType": "cron", "jobType": "incremental",
                      "schedule": "@every 5m",
                      "onError": [{"errorHandler": "reRun",
                                   "maxRetries": 2, "retryDelay": 1}]}],
        "source": {"Type": "UnionDatasetSource",
                   "DatasetSources": [{"Name": "Products"},
                                      {"Name": "Extras"}]},
        "sink": {"Type": "DatasetSink", "Name": "All"},
    }
    state = J.JobState(str(tmp_path / "state.json"))
    job, triggers = J.parse_job_config(products_store, cfg)
    assert job.on_error.kind == "reRun"
    assert job.on_error.max_retries == 2
    assert job.on_error.retry_delay_s == 1.0
    job.run(state)
    assert {r["id"] for r in
            S.latest(products_store.log(["All"])).collect()} == \
        {"product:1", "product:2", "extra:1"}


def test_multi_source_config_with_track_queries(spark, products_store):
    code = base64.b64encode(b"""
function transform_entities(entities) { return entities; }
function track_queries(reg) { reg.hop("address", "home"); }
""").decode()
    cfg = {
        "id": "ms-job",
        "source": {"Type": "MultiSource", "Name": "person",
                   "Dependencies": [
                       {"dataset": "car",
                        "joins": [{"dataset": "person",
                                   "predicate": "owner",
                                   "inverse": False}]}]},
        "transform": {"Type": "JavascriptTransform", "Code": code},
        "sink": {"Type": "DevNullSink"},
    }
    job, _ = J.parse_job_config(products_store, cfg)
    deps = job.source.dependencies
    assert J.Dependency("car", [J.Join("person", "owner", False)]) in deps
    # derived from track_queries in the transform Code
    assert J.Dependency("address", [J.Join("person", "home", True)]) in deps


def test_sample_source_config(spark, products_store, tmp_path):
    cfg = {
        "id": "sample-job",
        "source": {"Type": "SampleSource", "NumberOfEntities": 7},
        "sink": {"Type": "DatasetSink", "Name": "Samples"},
    }
    state = J.JobState(str(tmp_path / "state.json"))
    job, _ = J.parse_job_config(products_store, cfg)
    job.run(state)
    assert S.latest(products_store.log(["Samples"])).count() == 7


def test_http_transform_round_trip(spark, products_store, tmp_path):
    """HttpTransform (transform.go:676): entities POSTed to the service,
    response array is the transformed batch."""

    class Echo(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            objs = json.loads(self.rfile.read(n).decode())
            out = []
            for o in objs:
                if o.get("id") == "@context":
                    continue
                o.setdefault("props", {})["p:via"] = "http"
                out.append(o)
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Echo)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/transform"
        cfg = {
            "id": "http-transform-job",
            "source": {"Type": "DatasetSource", "Name": "Products"},
            "transform": {"Type": "HttpTransform", "Url": url,
                          "SupportContext": True, "TimeOut": 10},
            "sink": {"Type": "DatasetSink", "Name": "Transformed"},
        }
        state = J.JobState(str(tmp_path / "state.json"))
        job, _ = J.parse_job_config(products_store, cfg,
                                    allow_network=True)
        job.run(state)
        out = {r["id"]: r["props"] for r in
               S.latest(products_store.log(["Transformed"])).collect()}
        assert set(out) == {"product:1", "product:2"}
        assert out["product:1"]["p:via"] == "http"
        assert out["product:1"]["p:name"] == "hammer"
    finally:
        httpd.shutdown()
        httpd.server_close()


@pytest.mark.parametrize("descriptor,expect_fields", [
    ("@hourly", "0 * * * *"),
    ("@daily", "0 0 * * *"),
])
def test_cron_named_descriptors_are_grid(descriptor, expect_fields):
    # behavioral check: both match the same minutes over three hours
    import datetime

    a, b = CronSpec.parse(descriptor), CronSpec.parse(expect_fields)
    base = datetime.datetime(2026, 1, 1, 0, 0)
    for m in range(180):
        t = base + datetime.timedelta(minutes=m)
        assert a.matches(t) == b.matches(t), (descriptor, t)


@pytest.mark.parametrize("descriptor,interval_min", [
    ("@every 2s", 1),       # sub-minute clamps to the 1-minute tick
    ("@every 5m", 5),
    ("@every 90m", 90),     # NOT rounded to hourly
    ("@every 2h", 120),
    ("@every 1h30m", 90),
])
def test_cron_every_is_fixed_interval(descriptor, interval_min):
    """robfig @every semantics: fire every N minutes from the LAST
    firing — no grid reset at hour/day boundaries (@every 7m fires
    :56 then :03, not :56 then :00)."""
    import datetime

    spec = CronSpec.parse(descriptor)
    assert spec.interval_minutes == interval_min
    assert spec.spec == descriptor  # listings echo the config form
    base = datetime.datetime(2026, 1, 1, 0, 0)
    # never fired -> due now; then due exactly after the interval
    assert spec.due(base, None)
    fired = base
    nxt = spec.next_after(fired)
    assert nxt == fired + datetime.timedelta(minutes=interval_min)
    for m in range(1, interval_min):
        assert not spec.due(fired + datetime.timedelta(minutes=m), fired)
    assert spec.due(nxt, fired)


def test_cron_every_7m_crosses_hour_boundary():
    import datetime

    spec = CronSpec.parse("@every 7m")
    fired = datetime.datetime(2026, 1, 1, 0, 56)
    assert not spec.due(datetime.datetime(2026, 1, 1, 1, 0), fired)
    assert spec.due(datetime.datetime(2026, 1, 1, 1, 3), fired)
