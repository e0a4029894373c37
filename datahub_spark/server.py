"""Serve the UDA protocol from an EntityStore — the reference's dataset
HTTP surface (internal/web/datasethandler.go; fullsync lease:
internal/server/dataset.go:81-207), so a peer datahub (or this repo's
own jobs.HttpDatasetSource) can sync datasets OUT of this engine.

Endpoints (wire format: JSON array ``[@context, entity...,
{"id":"@continuation","token":...}]``):

  GET  /datasets                                   dataset list
  GET  /datasets/{ds}/entities?from=&limit=        latest view, paged
  GET  /datasets/{ds}/changes?since=&limit=&latestOnly=
                                                   change log, paged
  POST /datasets/{ds}/entities                     store batch; honors the
       fullsync lease headers (universal-data-api-full-sync-start /
       -id / -end, datasethandler.go:778-780) with 409/410 semantics

Execution model / scale: each page is ONE bounded Spark job — key-set
pagination (order-by + strictly-after filter + limit, never a global
offset), serialized to the wire by the uda codec (to_json, JVM-side).
The HTTP pipe itself is the reference's own egress model (single-reader
pull with continuation tokens); bulk 100 TB egress belongs on shared
storage (parquet handoff), which peers on the same platform get for
free — this server exists for protocol interop with peers that speak
only UDA.

Tokens are opaque to clients (the UDA contract): /entities tokens are
base64url of the last id served; /changes tokens are base64url of the
(recorded, seq, id) position triple. ``since`` also accepts a bare
integer (recorded watermark) — the format this repo's own incremental
jobs persist in JobState.
"""

from __future__ import annotations

import base64
import json
import os
import threading
import time
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import functions as F

from datahub_spark import store as S
from datahub_spark import uda
from datahub_spark.namespaces import NamespaceManager
from datahub_spark.script import SCRIPT_OUTPUT_SCHEMA


# one element may legitimately be large (a fat props map), but a parser
# that buffers past this without completing an element is being fed
# something that is not an entity array — fail loudly, don't OOM
_MAX_ELEMENT_BYTES = 64 * 1024 * 1024


def iter_json_array(stream, nbytes: int, chunk_bytes: int = 64 * 1024):
    """Incrementally parse a top-level JSON array from a byte stream,
    yielding one decoded element at a time — the reference's streaming
    request-body parser (internal/server/streamparser.go:1-486)
    re-expressed over ``json.JSONDecoder.raw_decode``: the buffer only
    ever holds the current chunk plus one partial element, so a multi-GB
    ``/entities`` POST parses in flat memory instead of one
    ``json.loads`` of the whole body.

    ``raw_decode`` does the per-element scanning at C speed; an
    incremental UTF-8 decoder handles multi-byte characters split across
    chunk boundaries. Raises ``ValueError`` on malformed input (including
    a single element exceeding _MAX_ELEMENT_BYTES)."""
    import codecs

    utf8 = codecs.getincrementaldecoder("utf-8")()
    dec = json.JSONDecoder()
    buf, pos = "", 0
    remaining = nbytes
    started = done = False

    def refill() -> bool:
        nonlocal buf, pos, remaining
        if remaining <= 0:
            return False
        data = stream.read(min(chunk_bytes, remaining))
        if not data:
            remaining = 0
            return False
        remaining -= len(data)
        buf = buf[pos:] + utf8.decode(data)
        pos = 0
        if len(buf) > _MAX_ELEMENT_BYTES:
            raise ValueError("JSON element exceeds the streaming buffer cap")
        return True

    def skip_ws() -> bool:
        nonlocal pos
        while True:
            while pos < len(buf) and buf[pos] in " \t\r\n":
                pos += 1
            if pos < len(buf):
                return True
            if not refill():
                return False

    if not skip_ws():
        return  # empty body == empty batch (UDA tolerates it)
    if buf[pos] != "[":
        raise ValueError("request body is not a JSON array")
    pos += 1
    while not done:
        if not skip_ws():
            raise ValueError("unterminated JSON array")
        if buf[pos] == "]":
            done = True
            break
        if buf[pos] == ",":
            pos += 1
            continue
        while True:
            try:
                obj, end = dec.raw_decode(buf, pos)
                pos = end
                yield obj
                break
            except ValueError:
                # incomplete element in the buffer — pull more bytes;
                # if the wire is exhausted it really is malformed
                if not refill():
                    raise


def _tok_encode(payload) -> str:
    raw = json.dumps(payload, separators=(",", ":")).encode()
    return base64.urlsafe_b64encode(raw).decode().rstrip("=")


def _tok_decode(token: str):
    pad = "=" * (-len(token) % 4)
    return json.loads(base64.urlsafe_b64decode(token + pad).decode())


def _parse_acls(raw):
    """AccessControl list from a request body value, shared by the
    per-client ACL route and the legacy clientclaims/clientacl
    aliases. Returns None on any malformed shape (non-list value,
    non-dict entries) so callers answer 400 instead of leaking a 500
    from the comprehension."""
    from datahub_spark.security import AccessControl

    if not isinstance(raw, list):
        return None
    out = []
    for a in raw:
        if not isinstance(a, dict):
            return None
        out.append(AccessControl(
            str(a.get("Resource", a.get("resource", ""))),
            str(a.get("Action", a.get("action", "read"))),
            bool(a.get("Deny", a.get("deny", False)))))
    return out


class FullSyncLease:
    """The reference's fullsync lease (dataset.go:81-207):
    StartFullSyncWithLease / RefreshFullSyncLease / ReleaseFullSyncLease
    with a wall-clock expiry. One active sync per dataset; batches with
    a mismatched id conflict (409); refreshing an expired lease is Gone
    (410)."""

    def __init__(self, lease_seconds: float = 3600.0):
        self.lease_seconds = lease_seconds
        self._sessions: dict[str, dict] = {}  # dataset -> {id, session, t}
        self._lock = threading.Lock()

    def start(self, dataset: str, sync_id: str, session) -> None:
        with self._lock:
            cur = self._sessions.get(dataset)
            if cur is not None and not self._expired(cur):
                raise ConflictError("fullsync is ongoing")
            if cur is not None:  # expired: abandon the stale session
                cur["session"].abandon()
            self._sessions[dataset] = {
                "id": sync_id, "session": session, "t": time.monotonic()}

    def refresh(self, dataset: str, sync_id: str):
        with self._lock:
            cur = self._sessions.get(dataset)
            if cur is None:
                raise ConflictError("no fullsync in progress")
            if cur["id"] != sync_id:
                raise ConflictError("fullsync is ongoing")
            if self._expired(cur):
                raise GoneError("fullsync lease expired")
            cur["t"] = time.monotonic()
            return cur["session"]

    def release(self, dataset: str, sync_id: str):
        with self._lock:
            cur = self._sessions.get(dataset)
            if cur is None or cur["id"] != sync_id:
                raise GoneError("no such fullsync lease")
            del self._sessions[dataset]
            return cur["session"]

    def active(self, dataset: str) -> bool:
        with self._lock:
            cur = self._sessions.get(dataset)
            return cur is not None and not self._expired(cur)

    def _expired(self, cur: dict) -> bool:
        return time.monotonic() - cur["t"] > self.lease_seconds


class ConflictError(Exception):
    pass


class GoneError(Exception):
    pass


class UdaServer:
    """Loopback ThreadingHTTPServer over an EntityStore. ``start()``
    returns the base URL; requests run Spark jobs on the server's
    (driver) thread pool — the SparkSession is thread-safe for job
    submission."""

    def __init__(self, store: S.EntityStore,
                 nsmgr: NamespaceManager | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 default_limit: int = 1000,
                 lease_seconds: float = 3600.0,
                 scheduler=None, content=None, security=None,
                 metrics=None, providers=None,
                 wal_writes: bool = False,
                 wal_flush_entities: int = 10_000):
        self.store = store
        # WAL-backed served writes (store.WalIngest): plain POST
        # /entities appends to a per-dataset fsync-durable spool and
        # returns — the LSM answer to Spark's fixed per-commit job cost
        # on high-frequency small writes. Visibility: pending rows are
        # folded into ONE store transaction when (a) the pending count
        # reaches wal_flush_entities, (b) the dataset is read over HTTP
        # (read-your-writes), (c) a fullsync starts, or (d) the server
        # stops. Durability is per-POST either way.
        self.wal_writes = bool(wal_writes)
        self.wal_flush_entities = int(wal_flush_entities)
        self._wals: dict[str, object] = {}
        self._wal_pending: dict[str, int] = {}
        self._wal_lock = threading.Lock()
        self.nsmgr = nsmgr or NamespaceManager()
        self.default_limit = default_limit
        self.leases = FullSyncLease(lease_seconds)
        # optional security.SecurityManager: when set, every endpoint
        # except POST /security/token requires a Bearer token
        # (middlewares/authentication.go + authorization.go); when None
        # the server is loopback/trusted-network only, which stays the
        # default for the in-process analytics mission
        self.security = security
        # optional metrics.Metrics: per-request http.count / http.time /
        # http.size with method/path/status tags (loggerfilter.go:64-74)
        self.metrics = metrics
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._host, self._port = host, port
        self._index: dict | None = None  # /query lookup, built lazily
        # jobs API (jobshandler.go / joboperationhandler.go): attach a
        # jobs.Scheduler to serve /jobs CRUD + /job/{id} operations
        self.scheduler = scheduler
        self._job_configs: dict[str, dict] = {}
        self._runner = None
        # content API (contenthandler.go:44-48): attach a ContentService
        self.content = content
        # login providers for outgoing connections
        # (providerhandler.go:44-48): attach a providers.ProviderStore
        self.providers = providers

    # -- lifecycle --------------------------------------------------------

    def start(self) -> str:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test logs
                pass

            def do_GET(self):
                outer._observed(self, outer._route_get)

            def do_POST(self):
                outer._observed(self, outer._route_post)

            def do_PUT(self):
                outer._observed(self, outer._route_put)

            def do_DELETE(self):
                outer._observed(self, outer._route_delete)

            def do_PATCH(self):
                outer._observed(self, outer._route_patch)

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return f"http://{self._host}:{self._httpd.server_address[1]}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        self.flush_wal()
        with self._wal_lock:
            for w in self._wals.values():
                w.close()
            self._wals.clear()

    # -- WAL-backed served writes ------------------------------------------

    def _wal_for(self, ds: str):
        from datahub_spark.store import WalIngest

        with self._wal_lock:
            w = self._wals.get(ds)
            if w is None:
                w = self._wals[ds] = WalIngest(self.store, ds)
                self._wal_pending[ds] = 0
            return w

    def flush_wal(self, ds: str | None = None) -> dict[str, int]:
        """Fold pending served writes into store transactions (one per
        dataset). Returns {dataset: recorded} for datasets that had
        pending rows."""
        with self._wal_lock:
            names = [ds] if ds is not None else list(self._wals)
            wals = [(n, self._wals[n]) for n in names if n in self._wals]
        out: dict[str, int] = {}
        for name, w in wals:
            recorded = w.flush()
            with self._wal_lock:
                self._wal_pending[name] = 0
            if recorded is not None:
                out[name] = recorded
        if out:
            self.invalidate_query_index()
        return out

    def _ensure_visible(self, ds: str) -> None:
        """Read-your-writes for WAL-backed serving: any HTTP read of a
        dataset first flushes its pending spool (no-op when empty)."""
        if self.wal_writes and ds in self._wals:
            self.flush_wal(ds)

    # -- helpers ----------------------------------------------------------

    def _reply(self, rq, code: int, payload) -> None:
        data = json.dumps(payload).encode()
        rq.send_response(code)
        rq.send_header("Content-Type", "application/json")
        rq.send_header("Content-Length", str(len(data)))
        rq.end_headers()
        rq.wfile.write(data)

    def _error(self, rq, code: int, message: str) -> None:
        self._reply(rq, code, {"message": message})

    def _collect_json(self, df) -> list[str]:
        return [r["json"] for r in uda.to_uda_json(df).collect()]

    # -- GET --------------------------------------------------------------

    def _observed(self, rq, dispatch) -> None:
        """Per-request telemetry (loggerfilter.go:64-74): http.count +
        http.time (ms) + http.size (response bytes), tagged with
        method/path/status. With no Metrics attached, dispatch runs
        untouched."""
        if self.metrics is None:
            return dispatch(rq)
        t0 = time.perf_counter()
        seen = {"status": 0, "size": 0}
        orig_response, orig_header = rq.send_response, rq.send_header

        def send_response(code, *a, **k):
            seen["status"] = code
            return orig_response(code, *a, **k)

        def send_header(name, value, *a, **k):
            if name.lower() == "content-length":
                try:
                    seen["size"] = int(value)
                except (TypeError, ValueError):
                    pass
            return orig_header(name, value, *a, **k)

        rq.send_response, rq.send_header = send_response, send_header
        try:
            return dispatch(rq)
        finally:
            tags = {"method": rq.command,
                    "path": urlparse(rq.path).path,
                    "status": seen["status"]}
            self.metrics.count("http.count", 1, tags)
            self.metrics.timing(
                "http.time", (time.perf_counter() - t0) * 1000, tags)
            self.metrics.gauge("http.size", seen["size"], tags)

    def _authorize(self, rq) -> bool:
        """Bearer-token gate (middlewares/authentication.go:208-215 +
        authorization.go doAclCheck). Writes 401/403 and returns False
        on refusal; True when no SecurityManager is attached."""
        if self.security is None:
            return True
        from datahub_spark.security import AuthError, ForbiddenError

        try:
            self.security.authorize(rq.headers.get("Authorization"),
                                    rq.command, urlparse(rq.path).path)
            return True
        except AuthError as exc:
            self._error(rq, 401, str(exc))
            return False
        except ForbiddenError as exc:
            self._error(rq, 403, str(exc))
            return False

    def _route_get(self, rq) -> None:
        u = urlparse(rq.path)
        parts = [p for p in u.path.split("/") if p]
        if parts == ["health"]:
            # NewStatusHandler (web.go:136): plain "UP", and the auth
            # middleware skips /health (middleware.go:43-44)
            data = b"UP"
            rq.send_response(200)
            rq.send_header("Content-Type", "text/plain")
            rq.send_header("Content-Length", str(len(data)))
            rq.end_headers()
            rq.wfile.write(data)
            return
        if not self._authorize(rq):
            return
        try:
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if not parts:
                # ServiceInfo (web.go:139-143)
                port = self._httpd.server_address[1] if self._httpd else 0
                return self._reply(rq, 200, {
                    "name": "DataHub", "location": f"server:{port}"})
            if parts == ["api"]:
                # machine-readable API description: the reference
                # publishes api/datahub.oas3.yml in-repo; serving the
                # generated equivalent makes it discoverable
                from datahub_spark.openapi import openapi_document

                return self._reply(rq, 200, openapi_document(self))
            if parts == ["query"]:
                # the reference registers the SAME queryHandler for
                # GET and POST (queryhandler.go:89-90) — a GET /query
                # carries the same body/content-type protocol
                return self._post_query(rq)
            if parts == ["query", "namespace"]:
                # queryNamespacePrefix (queryhandler.go:94-109):
                # expansion URI -> its registered prefix, 404 when absent
                expansion = q.get("expansion", "")
                try:
                    prefix = self.nsmgr.get_prefix(expansion)
                except Exception:
                    return self._error(
                        rq, 404, "problem mapping namespace prefix")
                return self._reply(rq, 200, {
                    "prefix": prefix, "expansion": expansion})
            if parts == ["datasets"]:
                names = sorted(self.store.list_datasets())
                return self._reply(rq, 200, [{"Name": n} for n in names])
            if len(parts) == 2 and parts[0] == "datasets":
                # datasethandler.go:212-225 GetDatasetDetails: the
                # dataset's core registry entity (items = entity count)
                ds = unquote(parts[1])
                self._ensure_visible(ds)
                cfg = self.store.dataset_config(ds)
                if cfg is None:
                    return self._error(rq, 404, f"dataset {ds} not found")
                n_items = S.latest(self.store.log([ds])).count() \
                    if self.store.has_data(ds) else 0
                return self._reply(rq, 200, {
                    "id": f"core:{ds}",
                    "props": {"core:name": ds, "core:items": n_items},
                    "refs": {},
                })
            if parts == ["namespaces"]:
                # namespacehandler.go:37 — prefix -> expansion map
                return self._reply(rq, 200, self.nsmgr.context())
            if parts and parts[0] == "statistics" and len(parts) <= 2:
                # statisticshandler.go:14-18 — per-dataset counts.
                # ?cached=true serves the maintenance updater's snapshot
                # (statistics_update.go caches its walk under a store
                # meta key; here it is statistics.json in the store
                # root, refreshed at 02:00 + instance start) — no Spark
                # job, storage-level numbers
                if q.get("cached", "false").lower() in ("1", "true"):
                    snap_path = os.path.join(self.store.root,
                                             "statistics.json")
                    try:
                        with open(snap_path) as f:
                            snap = json.load(f)
                    except FileNotFoundError:
                        return self._error(
                            rq, 404,
                            "no cached statistics snapshot yet — the "
                            "updater writes one at start and on its "
                            "schedule")
                    if len(parts) == 2:
                        ds_snap = snap.get("datasets", {}).get(parts[1])
                        if ds_snap is None:
                            return self._error(
                                rq, 404, f"dataset {parts[1]} not found")
                        return self._reply(rq, 200, {parts[1]: ds_snap})
                    return self._reply(rq, 200, snap)
                log = self.store.log([parts[1]] if len(parts) == 2 else None)
                rows = S.dataset_stats(log).collect()
                return self._reply(rq, 200, {
                    r["dataset"]: {"changes": r["n_changes"],
                                   "entities": r["n_entities"]}
                    for r in rows})
            if parts and parts[0] in ("jobs", "job", "lineage"):
                return self._jobs_get(rq, parts)
            if parts == ["security", "clients"] and self.security is not None:
                # securityhandler.go:80-83
                return self._reply(rq, 200, self.security.list_clients())
            if len(parts) == 4 and parts[:2] == ["security", "clients"] \
                    and parts[3] == "acl" and self.security is not None:
                # securityhandler.go:134-140
                cid = unquote(parts[2])
                return self._reply(rq, 200, [
                    {"Resource": a.resource, "Action": a.action,
                     "Deny": a.deny}
                    for a in self.security.get_acls(cid)])
            if parts == ["provider", "logins"] and self.providers is not None:
                # providerhandler.go:81-94 (secrets masked)
                return self._reply(rq, 200, self.providers.list(mask=True))
            if len(parts) == 2 and parts[0] == "provider" \
                    and self.providers is None:
                return self._error(rq, 503, "no provider store attached")
            if len(parts) == 3 and parts[:2] == ["provider", "login"] \
                    and self.providers is not None:
                # providerhandler.go:104-114
                try:
                    cfg = self.providers.get_config(unquote(parts[2]),
                                                    mask=True)
                except KeyError:
                    return self._error(rq, 404, "no such login provider")
                return self._reply(rq, 200, cfg)
            if parts and parts[0] == "content" and self.content is not None:
                if len(parts) == 1:
                    return self._reply(rq, 200, self.content.list())
                item = self.content.get(parts[1])
                if item is None:
                    return self._error(rq, 404, "no such content")
                return self._reply(rq, 200, item)
            if len(parts) == 3 and parts[0] == "datasets":
                ds, verb = parts[1], parts[2]
                # read-your-writes: commit any pending WAL spool first
                # (also registers a dataset whose first writes are
                # still WAL-only)
                self._ensure_visible(ds)
                if ds not in self.store.list_datasets() \
                        and ds != S.CORE_DATASET:
                    return self._error(rq, 404, f"dataset {ds} not found")
                cfg = self.store.dataset_config(ds) or {}
                if "ProxyDatasetConfig" in cfg and verb in ("entities",
                                                            "changes"):
                    return self._proxy_read(rq, cfg["ProxyDatasetConfig"],
                                            verb, q)
                if "VirtualDatasetConfig" in cfg and verb in ("entities",
                                                              "changes"):
                    return self._virtual_read(
                        rq, ds, cfg["VirtualDatasetConfig"], q)
                if verb == "entities":
                    if "since" in q:
                        # datasethandler.go:283
                        return self._error(
                            rq, 400,
                            "since parameter only supported for changes")
                    return self._get_entities(rq, ds, q)
                if verb == "changes":
                    return self._get_changes(rq, ds, q)
            self._error(rq, 404, "not found")
        except Exception as exc:  # a handler bug must not kill the server
            self._error(rq, 500, str(exc))

    def _context(self, ds: str) -> dict:
        return self.store.dataset_context(ds, self.nsmgr)

    # -- JSON-LD content negotiation (datasethandler.go:246-340) ----------

    @staticmethod
    def _wants_jsonld(rq, q: dict) -> bool:
        """``?format=jsonld`` or ``Accept: application/ld+json`` selects
        JSON-LD output on dataset reads (the reference negotiates on the
        Accept header, datasethandler.go:303-305; the query param is the
        curl-friendly alias)."""
        if q.get("format") == "jsonld":
            return True
        return "application/ld+json" in (rq.headers.get("Accept") or "")

    @staticmethod
    def _jsonld_context(ctx: dict) -> dict:
        # convertContextToJSONLD (datasethandler.go:247-259): the UDA
        # namespace map plus the fixed core/rdf prefixes
        namespaces = dict(ctx.get("namespaces") or {})
        namespaces["core"] = "http://data.mimiro.io/core/uda/"
        namespaces["rdf"] = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        return {"@context": namespaces}

    @staticmethod
    def _jsonld_entity(obj: dict) -> dict:
        """UDA entity object -> JSON-LD node (toJSONLD,
        datasethandler.go:492-530): ``@id`` + prop keys verbatim (CURIEs
        resolve through the @context) + refs as ``{"@id": ...}`` nodes.
        Deliberate deviation: the reference's ref-array branch
        (datasethandler.go:519-524) preallocates AND appends, emitting
        len(refs) empty nodes before the real ones — we emit exactly the
        refs."""
        node: dict = {"@id": obj.get("id")}
        for key, value in (obj.get("props") or {}).items():
            node[key] = value
        for key, value in (obj.get("refs") or {}).items():
            if isinstance(value, list):
                node[key] = [{"@id": r} for r in value]
            else:
                node[key] = {"@id": value}
        return node

    def _get_entities(self, rq, ds: str, q: dict) -> None:
        if q.get("reverse"):
            # datasethandler.go:286-288
            return self._error(
                rq, 400, "reverse parameter only supported for changes")
        limit = int(q.get("limit", self.default_limit))
        from_tok = q.get("from", "")
        view = S.latest(self.store.log([ds]), include_deleted=False)
        if from_tok:
            try:
                last_id = _tok_decode(from_tok)
            except (ValueError, json.JSONDecodeError):
                return self._error(rq, 400, "bad from token")
            view = view.filter(F.col("id") > F.lit(last_id))
        rows = view.orderBy("id").limit(limit)
        objs = self._collect_json(rows)
        # continuation: position after the last served entity; an empty
        # page echoes the request token (no advancement = drained)
        if objs:
            last = json.loads(objs[-1])["id"]
            token = _tok_encode(last)
        else:
            token = from_tok
        self._write_page(rq, ds, objs, token,
                         jsonld=self._wants_jsonld(rq, q))

    def _get_changes(self, rq, ds: str, q: dict) -> None:
        limit = int(q.get("limit", self.default_limit))
        latest_only = q.get("latestOnly", "") == "true"
        # ?reverse=true walks the change-log newest-first
        # (datasethandler.go:551,702-731: the offset iterator is
        # Inverse()d and the token pages further back) — same key-set
        # continuation protocol here, with the comparisons flipped
        reverse = q.get("reverse", "") == "true"
        since = q.get("since", "")
        log = self.store.log([ds])
        if latest_only:
            log = S.latest(log, include_deleted=True)
        pos = None
        if since:
            try:
                pos = int(since)  # bare recorded watermark
            except ValueError:
                try:
                    pos = _tok_decode(since)
                except (ValueError, json.JSONDecodeError):
                    return self._error(rq, 400, "bad since token")
        if pos is not None:
            if isinstance(pos, int):
                log = log.filter(F.col("recorded") < pos if reverse
                                 else F.col("recorded") > pos)
            elif reverse:
                r, s, i = pos
                log = log.filter(
                    (F.col("recorded") < r)
                    | ((F.col("recorded") == r) & (F.col("seq") < s))
                    | ((F.col("recorded") == r) & (F.col("seq") == s)
                       & (F.col("id") < i)))
            else:
                r, s, i = pos
                log = log.filter(
                    (F.col("recorded") > r)
                    | ((F.col("recorded") == r) & (F.col("seq") > s))
                    | ((F.col("recorded") == r) & (F.col("seq") == s)
                       & (F.col("id") > i)))
        order = [F.col("recorded").desc(), F.col("seq").desc(),
                 F.col("id").desc()] if reverse \
            else [F.col("recorded"), F.col("seq"), F.col("id")]
        page_df = log.orderBy(*order).limit(limit)
        # one job yields both the wire rows and the position columns
        wire = uda.to_uda_json(page_df, ["recorded", "seq", "id"]).collect()
        objs = [r["json"] for r in wire]
        if wire:
            last = wire[-1]
            token = _tok_encode([last["recorded"], last["seq"], last["id"]])
        else:
            token = since
        self._write_page(rq, ds, objs, token,
                         jsonld=self._wants_jsonld(rq, q))

    def _write_page(self, rq, ds: str, objs: list[str], token,
                    jsonld: bool = False) -> None:
        if jsonld:
            ctx = self._jsonld_context(self._context(ds))
            ents = [json.dumps(self._jsonld_entity(json.loads(o)))
                    for o in objs]
            # makeJsonLdContinuationToken (datasethandler.go:767-773)
            cont = json.dumps({"rdf:type": {"@id": "core:continuation"},
                               "core:token": token})
            body = "[" + ",".join([json.dumps(ctx)] + ents + [cont]) + "]"
            ctype = "application/ld+json"
        else:
            body = "[" + ",".join(
                [json.dumps(self._context(ds))] + objs
                + [json.dumps({"id": "@continuation", "token": token})]
            ) + "]"
            ctype = "application/json"
        data = body.encode()
        rq.send_response(200)
        rq.send_header("Content-Type", ctype)
        rq.send_header("Content-Length", str(len(data)))
        rq.end_headers()
        rq.wfile.write(data)

    # -- POST (store + fullsync lease + /query) ---------------------------

    def _route_post(self, rq) -> None:
        u = urlparse(rq.path)
        parts = [p for p in u.path.split("/") if p]
        # the token exchange is the one unauthenticated endpoint
        # (clients bootstrap their Bearer token here, manager.go:430)
        if parts == ["security", "token"] and self.security is not None:
            return self._post_token(rq)
        if not self._authorize(rq):
            return
        try:
            if len(parts) == 3 and parts[0] == "datasets" \
                    and parts[2] == "entities":
                return self._post_entities(rq, parts[1])
            if len(parts) == 2 and parts[0] == "datasets":
                return self._dataset_create(rq, unquote(parts[1]), u)
            if parts == ["query"]:
                return self._post_query(rq)
            if parts == ["transactions"]:
                return self._post_transaction(rq)
            if parts == ["jobs"]:
                return self._jobs_add(rq)
            if parts == ["security", "clients"] and self.security is not None:
                # securityhandler.go:118-132 client registration
                n = int(rq.headers.get("Content-Length", "0"))
                info = json.loads(rq.rfile.read(n).decode()) if n else {}
                try:
                    self.security.register_client(info)
                except ValueError as exc:
                    return self._error(rq, 400, str(exc))
                return self._reply(rq, 200, {})
            if len(parts) == 4 and parts[:2] == ["security", "clients"] \
                    and parts[3] == "acl" and self.security is not None:
                # securityhandler.go:151-168 set client ACLs
                n = int(rq.headers.get("Content-Length", "0") or 0)
                acls = _parse_acls(
                    json.loads(rq.rfile.read(n).decode()) if n else [])
                if acls is None:
                    return self._error(rq, 400, "malformed ACL list")
                self.security.set_acls(unquote(parts[2]), acls)
                return self._reply(rq, 200, {})
            if parts in (["security", "clientclaims"],
                         ["security", "clientacl"]) \
                    and self.security is not None:
                return self._post_legacy_client_acl(rq)
            if parts == ["provider", "logins"] and self.providers is not None:
                # providerhandler.go:51-62 create
                from datahub_spark.providers import ProviderConfig
                n = int(rq.headers.get("Content-Length", "0"))
                obj = json.loads(rq.rfile.read(n).decode()) if n else {}
                try:
                    self.providers.add(ProviderConfig.from_json(obj))
                except ValueError as exc:
                    return self._error(rq, 400, str(exc))
                return self._reply(rq, 200, {})
            if len(parts) == 3 and parts[:2] == ["provider", "login"] \
                    and self.providers is not None:
                # providerhandler.go:64-79 update (path name wins)
                from datahub_spark.providers import ProviderConfig
                n = int(rq.headers.get("Content-Length", "0"))
                obj = json.loads(rq.rfile.read(n).decode()) if n else {}
                obj.setdefault("name", unquote(parts[2]))  # path name wins
                try:
                    self.providers.update(unquote(parts[2]),
                                          ProviderConfig.from_json(obj))
                except KeyError:
                    return self._error(rq, 404, "no such login provider")
                except ValueError as exc:
                    return self._error(rq, 400, str(exc))
                return self._reply(rq, 200, {})
            if parts == ["content"] and self.content is not None:
                n = int(rq.headers.get("Content-Length", "0"))
                data = json.loads(rq.rfile.read(n).decode())
                cid = data.get("id")
                if not cid:
                    return self._error(rq, 400, "content needs an id")
                return self._reply(
                    rq, 201, self.content.upsert(cid, data.get("data", {})))
            if parts == ["compact"]:
                # compactionhandler.go:22-45
                n = int(rq.headers.get("Content-Length", "0"))
                r = json.loads(rq.rfile.read(n).decode()) if n else {}
                if not r.get("dataset"):
                    return self._error(rq, 400, "dataset not provided")
                if not r.get("strategy"):
                    return self._error(rq, 400, "strategy not provided")
                if r["strategy"] not in ("deduplication", "deduplicate"):
                    return self._error(
                        rq, 400, "strategy not supported. allowed "
                        "values: deduplication")
                if r["dataset"] not in self.store.list_datasets():
                    return self._error(rq, 404, "no such dataset")
                # engine extras beyond the reference's single strategy:
                # gcHorizon folds retention GC into the rewrite,
                # cleanDeleted purges latest-tombstoned entities
                # (garbagecollector.go Cleandeleted) in the same pass
                gc_h = r.get("gcHorizon")
                self.store.compact(
                    r["dataset"], strategy="deduplicate",
                    gc_horizon=int(gc_h) if gc_h is not None else None,
                    clean_deleted_entities=bool(r.get("cleanDeleted")))
                self.invalidate_query_index()
                return self._reply(rq, 200, {})
            self._error(rq, 404, "not found")
        except Exception as exc:
            self._error(rq, 500, str(exc))

    def _proxy_read(self, rq, proxy_cfg: dict, verb: str, q: dict) -> None:
        """Read-through for proxy datasets (proxydataset.go:200-300 +
        datasethandler.go:600-640): /entities and /changes forward to
        the remote's same endpoint with the query passed through, the
        outgoing Authorization coming from the configured login provider
        (authProviderName -> ProviderStore), and the remote's UDA page —
        context, entities, continuation — relayed verbatim (tokens are
        the remote's, so the client's next call pages the remote)."""
        import urllib.parse
        import urllib.request

        remote = proxy_cfg.get("remoteUrl", "").rstrip("/")
        passthrough = {k: v for k, v in q.items()
                       if k in ("limit", "from", "since", "latestOnly",
                                "reverse")}
        url = f"{remote}/{verb}"
        if passthrough:
            url += "?" + urllib.parse.urlencode(passthrough)
        req = urllib.request.Request(url)
        auth_name = proxy_cfg.get("authProviderName")
        if auth_name and self.providers is not None:
            try:
                self.providers.provider(auth_name).authorize(req)
            except KeyError:
                return self._error(
                    rq, 500, f"unknown auth provider {auth_name!r}")
        timeout = float(proxy_cfg.get("timeoutSeconds") or 30)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                data = resp.read()
        except Exception as exc:
            return self._error(rq, 502, f"proxy fetch failed: {exc}")
        rq.send_response(200)
        rq.send_header("Content-Type", "application/json")
        rq.send_header("Content-Length", str(len(data)))
        rq.end_headers()
        rq.wfile.write(data)

    def _virtual_read(self, rq, ds: str, vcfg: dict, q: dict) -> None:
        """Served virtual dataset (virtualdataset.go; DOCUMENTATION.md:
        288-325): the stored (base64) transform's build_entities(params,
        since, limit) runs on the bundled JS interpreter per request,
        Emit()ed entities become the UDA page, and the script's return
        value is the page's continuation token. ``params`` is an
        optional JSON body on the GET (the reference forwards any
        request JSON as the params argument); ``since`` is forwarded
        verbatim."""
        from datahub_spark.script import ScriptVirtualSource, is_js_code

        code = vcfg.get("Transform") or vcfg.get("transform") or ""
        # Served transforms run ONLY on the sandboxed JS interpreter —
        # the Python exec path in ScriptVirtualSource is for trusted
        # in-process use and must not be reachable from a stored config
        # (the reference confines these to goja, virtualdataset.go).
        if not is_js_code(code):
            return self._error(
                rq, 400, "virtual dataset transform must be javascript")
        n = int(rq.headers.get("Content-Length", "0"))
        try:
            params = json.loads(rq.rfile.read(n).decode()) if n else {}
        except json.JSONDecodeError:
            return self._error(rq, 400, "malformed params body")
        since_raw = q.get("since", "0")
        try:
            since = int(since_raw)
        except ValueError:
            since = since_raw
        limit = int(q.get("limit", self.default_limit))
        try:
            src = ScriptVirtualSource(self.store.spark, code,
                                      params=params, dataset=ds)
            page = src.read(since, limit)
        except Exception as exc:
            return self._error(rq, 500, f"virtual dataset script: {exc}")
        objs = [r["json"] for r in uda.to_uda_json(page).collect()]
        self._write_page(rq, ds, objs, src.last_token,
                         jsonld=self._wants_jsonld(rq, q))

    def _dataset_create(self, rq, ds: str, u) -> None:
        """datasetCreate (datasethandler.go:256-300): 400 on existing
        name; ?proxy=true requires a ProxyDatasetConfig with remoteUrl;
        a VirtualDatasetConfig requires a transform; the config rides in
        the registry entry (CreateDatasetConfig, dsmanager.go:102-106)."""
        if ds in self.store.list_datasets():
            return self._error(rq, 400, "Dataset already exist")
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        n = int(rq.headers.get("Content-Length", "0"))
        try:
            cfg = json.loads(rq.rfile.read(n).decode()) if n else {}
        except json.JSONDecodeError:
            return self._error(rq, 400, "malformed dataset config")
        extra = {}
        if q.get("proxy") == "true":
            pc = cfg.get("ProxyDatasetConfig") or {}
            if not pc.get("remoteUrl"):
                return self._error(
                    rq, 400, "invalid proxy configuration provided")
            extra["ProxyDatasetConfig"] = pc
        elif cfg.get("VirtualDatasetConfig") is not None:
            from datahub_spark.script import is_js_code

            vc = cfg["VirtualDatasetConfig"]
            code = vc.get("Transform") or vc.get("transform")
            if not code:
                return self._error(
                    rq, 400, "invalid virtual dataset configuration provided")
            # reject non-JS at create time too — the served read path
            # only runs the sandboxed JS interpreter
            if not is_js_code(code):
                return self._error(
                    rq, 400, "virtual dataset transform must be javascript")
            extra["VirtualDatasetConfig"] = vc
        self.store.create_dataset(
            ds, public_namespaces=cfg.get("publicNamespaces"),
            config=extra or None)
        return self._reply(rq, 200, {})

    def _post_token(self, rq) -> None:
        from datahub_spark.security import AuthError

        n = int(rq.headers.get("Content-Length", "0"))
        body = rq.rfile.read(n).decode() if n else ""
        ctype = (rq.headers.get("Content-Type") or "").split(";")[0].strip()
        if ctype == "application/x-www-form-urlencoded":
            # the reference token endpoint is OAuth2 form-encoded
            # (securityhandler.go:85-116): grant_type=client_credentials
            # + client_id/client_secret
            form = {k: v[0] for k, v in parse_qs(body).items()}
            if form.get("grant_type") != "client_credentials":
                return self._error(rq, 400, "unsupported grant_type")
            creds = {"client_id": form.get("client_id", ""),
                     "client_secret": form.get("client_secret", "")}
            # node-to-node JWT-bearer assertion (securityhandler.go:
            # 85-116 / nodeprovider.go:87-90): client_assertion_type +
            # client_assertion instead of id/secret
            if form.get("client_assertion_type") == \
                    "urn:ietf:params:oauth:grant-type:jwt-bearer":
                creds = {"client_assertion": form.get(
                    "client_assertion", "")}
        else:
            try:
                creds = json.loads(body) if body else {}
            except json.JSONDecodeError:
                return self._error(rq, 400, "malformed credentials")
        try:
            if creds.get("client_assertion"):
                token = self.security.exchange_client_assertion(
                    creds["client_assertion"])
            else:
                token = self.security.issue_token(
                    creds.get("client_id", ""),
                    creds.get("client_secret", ""))
        except AuthError as exc:
            return self._error(rq, 401, str(exc))
        self._reply(rq, 200, {"access_token": token,
                              "token_type": "Bearer"})

    def _post_legacy_client_acl(self, rq) -> None:
        """POST /security/clientclaims | /security/clientacl — the
        legacy admin-gated aliases of the per-client ACL setter
        (securityhandler.go:61-66; the reference keeps both routes in
        its legacy registration block wired through
        MakeRoleCheckMiddleware("admin")). No ``:clientid`` path param
        on these routes, so the client is named in the body:
        ``{"clientId": str, "acls"|"claims": [AccessControl...]}``
        (case-tolerant). Routes to the same ``set_acls`` as
        POST /security/clients/{clientid}/acl."""
        try:
            claims = self.security.authorize(
                rq.headers.get("Authorization"), rq.command,
                urlparse(rq.path).path)
        except Exception:
            claims = {}
        if "admin" not in (claims.get("roles") or []):
            # jwtMiddleware + MakeRoleCheckMiddleware("admin")
            return self._error(rq, 403, "admin role required")
        n = int(rq.headers.get("Content-Length", "0") or 0)
        try:
            obj = json.loads(rq.rfile.read(n).decode()) if n else {}
        except json.JSONDecodeError:
            return self._error(rq, 400, "malformed body")
        if not isinstance(obj, dict):
            return self._error(rq, 400, "malformed body")
        cid = obj.get("clientId") or obj.get("client_id") \
            or obj.get("ClientId") or obj.get("clientid")
        if not cid:
            return self._error(rq, 400, "missing client id")
        acls = _parse_acls(obj.get("acls") or obj.get("claims")
                           or obj.get("Acls") or obj.get("Claims") or [])
        if acls is None:
            return self._error(rq, 400, "malformed ACL list")
        self.security.set_acls(str(cid), acls)
        return self._reply(rq, 200, {})

    def _route_put(self, rq) -> None:
        if not self._authorize(rq):
            return
        try:
            parts = [p for p in urlparse(rq.path).path.split("/") if p]
            if len(parts) == 3 and parts[0] == "job":
                return self._job_operate(rq, parts[1], parts[2])
            if len(parts) == 2 and parts[0] == "content" \
                    and self.content is not None:
                n = int(rq.headers.get("Content-Length", "0"))
                data = json.loads(rq.rfile.read(n).decode())
                return self._reply(rq, 200, self.content.upsert(
                    parts[1], data.get("data", data)))
            self._error(rq, 404, "not found")
        except Exception as exc:
            self._error(rq, 500, str(exc))

    def _route_patch(self, rq) -> None:
        """PATCH /datasets/{name} = datasetUpdate (datasethandler.go:
        the UpdateDatasetConfig carries the new ID/name)."""
        if not self._authorize(rq):
            return
        try:
            parts = [p for p in urlparse(rq.path).path.split("/") if p]
            if len(parts) == 2 and parts[0] == "datasets":
                ds = unquote(parts[1])
                if self.store.dataset_config(ds) is None:
                    return self._error(rq, 400, "Dataset does not exist")
                n = int(rq.headers.get("Content-Length", "0"))
                try:
                    cfg = json.loads(rq.rfile.read(n).decode()) if n else {}
                except json.JSONDecodeError:
                    return self._error(
                        rq, 400, "Could not parse update dataset payload")
                new_name = cfg.get("ID") or cfg.get("id")
                if not new_name:
                    return self._error(
                        rq, 400, "update dataset request without payload")
                try:
                    self.store.rename_dataset(ds, new_name)
                except (KeyError, ValueError) as exc:
                    return self._error(rq, 400, str(exc))
                self.invalidate_query_index()
                return self._reply(rq, 200, {})
            self._error(rq, 404, "not found")
        except Exception as exc:
            self._error(rq, 500, str(exc))

    def _route_delete(self, rq) -> None:
        if not self._authorize(rq):
            return
        try:
            parts = [p for p in urlparse(rq.path).path.split("/") if p]
            if len(parts) == 2 and parts[0] == "jobs":
                if self.scheduler is None:
                    return self._error(rq, 503, "no job scheduler attached")
                self.scheduler.jobs.pop(parts[1], None)
                self.scheduler.schedules.pop(parts[1], None)
                self._job_configs.pop(parts[1], None)
                return self._reply(rq, 200, {})
            if len(parts) == 2 and parts[0] == "content" \
                    and self.content is not None:
                if not self.content.delete(parts[1]):
                    return self._error(rq, 404, "no such content")
                return self._reply(rq, 200, {})
            if len(parts) == 4 and parts[:2] == ["security", "clients"] \
                    and parts[3] == "acl" and self.security is not None:
                # securityhandler.go:142-149
                self.security.set_acls(unquote(parts[2]), [])
                return self._reply(rq, 200, {})
            if len(parts) == 3 and parts[:2] == ["provider", "login"] \
                    and self.providers is not None:
                # providerhandler.go:116-127
                try:
                    self.providers.delete(unquote(parts[2]))
                except KeyError:
                    return self._error(rq, 404, "no such login provider")
                return self._reply(rq, 200, {})
            if len(parts) == 2 and parts[0] == "datasets":
                # deleteDatasetHandler (datasethandler.go:227-235)
                ds = unquote(parts[1])
                if self.store.dataset_config(ds) is None:
                    return self._error(rq, 400, f"dataset {ds} not found")
                self.store.delete_dataset(ds)
                self.invalidate_query_index()
                return self._reply(rq, 200, {})
            if parts == ["datasets"]:
                # deleteAllDatasets (datasethandler.go:237-244)
                for ds in self.store.list_datasets():
                    self.store.delete_dataset(ds)
                self.invalidate_query_index()
                return self._reply(rq, 200, {})
            self._error(rq, 404, "not found")
        except Exception as exc:
            self._error(rq, 500, str(exc))

    # -- jobs API (jobshandler.go:48-61, joboperationhandler.go:41-47) ----

    def _need_scheduler(self, rq):
        if self.scheduler is None:
            self._error(rq, 503, "no job scheduler attached")
            return None
        return self.scheduler

    def _jobs_add(self, rq) -> None:
        """POST /jobs — a reference JobConfiguration JSON registers (or
        replaces) a job; cron triggers schedule it."""
        sched = self._need_scheduler(rq)
        if sched is None:
            return
        n = int(rq.headers.get("Content-Length", "0"))
        cfg = json.loads(rq.rfile.read(n).decode())
        job = sched.register_config(self.store, cfg)
        self._job_configs[job.job_id] = cfg
        self._reply(rq, 201, {"id": job.job_id})

    def _jobs_get(self, rq, parts: list[str]) -> None:
        sched = self._need_scheduler(rq)
        if sched is None:
            return
        from datahub_spark.jobs import lineage, lineage_for_dataset

        if len(parts) == 2 and parts[0] == "lineage":
            # GET /lineage/{dataset} (lineagehandler.go:14-29): per-
            # dataset view; 404 when the dataset is not registered
            # (the handler checks DsManager.GetDataset before building)
            name = unquote(parts[1])
            if name not in self.store.list_datasets():
                return self._error(rq, 404, "dataset is not found")
            return self._reply(
                rq, 200, lineage_for_dataset(list(sched.jobs.values()), name))
        if parts[0] == "lineage":
            return self._reply(rq, 200, lineage(list(sched.jobs.values())))
        if parts == ["jobs"]:
            return self._reply(rq, 200, list(self._job_configs.values()))
        if parts == ["jobs", "_", "schedules"]:
            return self._reply(rq, 200, {
                jid: spec.spec for jid, spec in sched.schedules.items()})
        if parts == ["jobs", "_", "history"]:
            return self._reply(rq, 200, {
                jid: sched.state.history(jid) for jid in sched.jobs})
        if parts == ["jobs", "_", "status"]:
            # jobsListStatus (jobshandler.go:109-111): JobStatus rows
            # for every currently-running job (scheduler.go:328-348)
            running = self._runner.raffle.running_jobs() \
                if self._runner is not None else {}
            return self._reply(rq, 200, [
                {"jobId": jid,
                 "jobTitle": (self._job_configs.get(jid) or {}).get(
                     "title", jid),
                 "started": datetime.fromtimestamp(
                     st["started"], timezone.utc).isoformat()}
                for jid, st in sorted(running.items())])
        if len(parts) == 2 and parts[0] == "jobs":
            cfg = self._job_configs.get(parts[1])
            if cfg is None:
                return self._error(rq, 404, "no such job")
            return self._reply(rq, 200, cfg)
        if len(parts) == 3 and parts[0] == "job" and parts[2] == "status":
            running = self._runner is not None and \
                parts[1] in self._runner.raffle.running_jobs()
            return self._reply(
                rq, 200, {"state": "Running" if running else "Stopped"})
        self._error(rq, 404, "not found")

    def _job_operate(self, rq, job_id: str, op: str) -> None:
        """PUT /job/{id}/run|pause|resume|reset
        (joboperationhandler.go:41-46). ``run`` executes through the
        raffle-gated runner and waits for completion — deterministic for
        callers; long pipelines belong on cron triggers."""
        from datahub_spark.jobs import JobRunner

        sched = self._need_scheduler(rq)
        if sched is None:
            return
        job = sched.jobs.get(job_id)
        if job is None:
            return self._error(rq, 404, "no such job")
        if op == "pause":
            job.paused = True
        elif op == "resume":
            job.paused = False
        elif op == "reset":
            sched.state.set_token(job_id, 0)
        elif op == "reset_meta":
            # jobsResetMeta (joboperationhandler.go:102): clear the
            # job's tracked-dependency metadata; our analogue is the
            # MultiSource per-dependency watermarks
            sched.state.set_dep_tokens(job_id, {})
        elif op == "kill":
            # jobsKill (joboperationhandler.go:59): best-effort cancel
            # of a running job's Spark actions; 200 either way, like
            # the reference
            if self._runner is not None:
                self._runner.kill(job_id)
        elif op == "run":
            if self._runner is None:
                self._runner = JobRunner(sched.state)
            was_paused, job.paused = job.paused, False
            try:
                if not self._runner.submit(job):
                    return self._error(rq, 409, "job is already running")
                results = self._runner.join()
            finally:
                job.paused = was_paused
            err = next((r.get("error") for r in results
                        if r.get("id") == job_id and r.get("error")), None)
            if err:
                return self._error(rq, 500, err)
            self.invalidate_query_index()
        else:
            return self._error(rq, 404, f"unknown operation {op}")
        self._reply(rq, 200, {"id": job_id, "operation": op})

    def _post_transaction(self, rq) -> None:
        """POST /transactions (txnhandler.go:54; wire format
        streamparser.go:53: ``{"@context": {...}, "<dataset>":
        [entities], ...}``) — one atomic multi-dataset commit via the
        store's staged-rename transaction."""
        n = int(rq.headers.get("Content-Length", "0"))
        payload = json.loads(rq.rfile.read(n).decode()) if n else {}
        if not isinstance(payload, dict):
            return self._error(rq, 400, "transaction body must be an object")
        spark = self.store.spark
        dataset_entities = {}
        for ds, objs in payload.items():
            if ds == "@context":
                continue
            rows = []
            for obj in objs or []:
                refs = {k: (v if isinstance(v, list) else [v])
                        for k, v in (obj.get("refs") or {}).items()}
                props = {k: (None if v is None else str(v))
                         for k, v in (obj.get("props") or {}).items()}
                rows.append((obj.get("id"), obj.get("recorded"),
                             obj.get("seq", 0),
                             bool(obj.get("deleted", False)),
                             props, refs, None))
            if rows:
                dataset_entities[ds] = spark.createDataFrame(
                    rows, SCRIPT_OUTPUT_SCHEMA).drop("dataset")
        if dataset_entities:
            self.store.execute_transaction(dataset_entities)
            self.invalidate_query_index()
        self._reply(rq, 200, {})

    # -- /query (queryhandler.go) -----------------------------------------

    def _query_index(self) -> dict:
        """Broadcast-style lookup index over the store's datasets for the
        graph-query endpoint — the analogue of the reference resolving
        queries against its local Badger store (queryhandler.go's
        GetManyRelatedEntitiesBatch). Bounded by the script-surface row
        cap: interactive graph queries are dimension-scale by
        construction; set-oriented querying over big data belongs in the
        engine's query operators, not an HTTP endpoint."""
        from datahub_spark.script import build_lookup_index

        if self._index is None:
            frames = [self.store.log([d]) for d in
                      sorted(self.store.list_datasets())]
            self._index = build_lookup_index(*frames)
        return self._index

    def invalidate_query_index(self) -> None:
        self._index = None

    def _wire_entity(self, ent: dict | None, eid: str) -> dict:
        if ent is None:
            return {"id": eid}
        return {"id": ent.get("ID"), "recorded": ent.get("Recorded"),
                "deleted": bool(ent.get("IsDeleted", False)),
                "props": ent.get("Properties") or {},
                "refs": ent.get("References") or {}}

    def _post_query(self, rq) -> None:
        """POST /query (queryhandler.go:142-265): three modes —
        Content-Type application/x-javascript-query runs a do_query
        script whose WriteQueryResult objects stream back as a JSON
        array; a body with entityId returns [@context, merged-entity];
        startingEntities/predicate/inverse returns [@context, triples]
        plus a continuation token when a limit was given (resumable via
        Continuations, stateless offset re-run)."""
        n = int(rq.headers.get("Content-Length", "0"))
        body = rq.rfile.read(n).decode() if n else "{}"
        ctype = rq.headers.get("Content-Type", "")
        if "application/x-javascript-query" in ctype:
            from datahub_spark import script as SC

            q = json.loads(body)
            results = SC.run_query_script(
                None, q.get("query", ""),
                namespaces=dict(self.nsmgr.context()),
                index=self._query_index())
            return self._reply(rq, 200, results)

        q = json.loads(body)
        ctx = {"id": "@context", "namespaces": self.nsmgr.context()}
        if q.get("entityId"):
            eid = q["entityId"]
            rows = self.store.get_entity(
                eid, q.get("datasets") or None,
                merge=not q.get("noPartialMerging", False)).collect()
            if not rows:
                return self._reply(rq, 200, [ctx, {"id": eid}])
            r = rows[0]
            ent = {"id": r["id"], "recorded": r["recorded"],
                   "deleted": bool(r["deleted"]),
                   "props": dict(r["props"] or {}),
                   "refs": {k: list(v) for k, v in
                            dict(r["refs"] or {}).items()}}
            return self._reply(rq, 200, [ctx, ent])

        from datahub_spark.script import make_builtins

        limit = int(q.get("limit") or 0)
        offset = 0
        if q.get("continuations"):
            resume = _tok_decode(q["continuations"][0])
            q = resume["q"]
            offset = resume["off"]
            limit = int(q.get("limit") or 0)
        env = make_builtins(dict(self.nsmgr.context()),
                            self._query_index())
        triples = env["Query"](q.get("startingEntities") or [],
                               q.get("predicate"),
                               bool(q.get("inverse", False)),
                               q.get("datasets"))
        include_cont = limit > 0
        page = triples[offset:offset + limit] if limit else triples[:100]
        wire = [[s, p, self._wire_entity(e, s)] for s, p, e in page]
        result = [ctx, wire]
        if include_cont:
            nxt = offset + len(page)
            token = _tok_encode({"q": q, "off": nxt}) \
                if nxt < len(triples) else ""
            result.append([token] if token else [])
        self._reply(rq, 200, result)

    # rows per DataFrame chunk cut from a streamed /entities POST body:
    # bounds the Python-side row list; each chunk ships to the JVM as a
    # LocalRelation before the next is accumulated
    BODY_CHUNK_ROWS = 10_000

    def _iter_entities(self, rq):
        """Streamed body -> iterator of normalized entity dicts
        (@context/@continuation skipped, refs listified, props
        stringified) — shared by the DataFrame and the WAL write
        paths."""
        n = int(rq.headers.get("Content-Length", "0"))
        for obj in iter_json_array(rq.rfile, n):
            oid = obj.get("id") if isinstance(obj, dict) else None
            if oid in ("@context", "@continuation") or oid is None:
                continue
            yield {
                "id": oid,
                "recorded": obj.get("recorded"),
                "seq": obj.get("seq", 0),
                "deleted": bool(obj.get("deleted", False)),
                "props": {k: (None if v is None else str(v))
                          for k, v in (obj.get("props") or {}).items()},
                "refs": {k: (v if isinstance(v, list) else [v])
                         for k, v in (obj.get("refs") or {}).items()},
            }

    def _parse_body(self, rq):
        """Streamed body -> iterator of DataFrame chunks (each at most
        BODY_CHUNK_ROWS rows). The server process never holds the whole
        body, the whole decoded object tree, or the whole row list —
        the reference's streamparser.go contract."""
        spark = self.store.spark
        rows = []
        for e in self._iter_entities(rq):
            rows.append((e["id"], e["recorded"], e["seq"], e["deleted"],
                         e["props"], e["refs"], None))
            if len(rows) >= self.BODY_CHUNK_ROWS:
                # nullable schema: recorded left NULL by the wire is
                # stamped at commit (store_entities), like the
                # script-sink contract
                yield spark.createDataFrame(rows, SCRIPT_OUTPUT_SCHEMA)
                rows = []
        if rows:
            yield spark.createDataFrame(rows, SCRIPT_OUTPUT_SCHEMA)

    def _post_entities(self, rq, ds: str) -> None:
        from datahub_spark.jobs import FullSyncSession

        fs_id = rq.headers.get("universal-data-api-full-sync-id", "")
        fs_start = rq.headers.get(
            "universal-data-api-full-sync-start", "") == "true"
        fs_end = rq.headers.get(
            "universal-data-api-full-sync-end", "") == "true"

        try:
            # mirror processEntities (datasethandler.go:785-860): start a
            # lease on fsStart; while a sync is started, every write must
            # present the lease id (plain writes 409); with no sync
            # started, writes store directly — and fsEnd then fails the
            # release with 410 Gone. The lease check runs BEFORE the body
            # is consumed, so a rejected writer is refused without
            # parsing its (possibly huge) payload.
            session = None
            if fs_start:
                # pending WAL rows must commit BEFORE the fullsync's
                # tombstone diff sees the prior state
                self._ensure_visible(ds)
                session = FullSyncSession(self.store, ds)
                self.leases.start(ds, fs_id, session)
            elif self.leases.active(ds):
                if fs_id == "" and not fs_end:
                    return self._error(rq, 409, "fullsync is ongoing")
                session = self.leases.refresh(ds, fs_id)
            elif self.wal_writes and not fs_end:
                # WAL fast path for plain writes: raw dicts straight to
                # the fsync-durable spool — no DataFrame, no Spark job
                # on the request path (reference OLTP shape,
                # dataset_benchmark_test.go)
                wal = self._wal_for(ds)
                count = 0
                batch: list = []
                try:
                    for e in self._iter_entities(rq):
                        batch.append(e)
                        if len(batch) >= self.BODY_CHUNK_ROWS:
                            wal.append(batch)
                            count += len(batch)
                            batch = []
                except ValueError as exc:
                    # whole-request atomicity is per-flush; a malformed
                    # tail leaves prior chunks spooled but unflushed —
                    # same at-least-once contract as WAL crash replay
                    return self._error(
                        rq, 400, f"malformed entity batch: {exc}")
                if batch:
                    wal.append(batch)
                    count += len(batch)
                with self._wal_lock:
                    self._wal_pending[ds] = \
                        self._wal_pending.get(ds, 0) + count
                    pending = self._wal_pending[ds]
                if pending >= self.wal_flush_entities:
                    self.flush_wal(ds)
                return self._reply(rq, 200, {})
            # streamed chunks: a fullsync session appends each chunk as
            # it parses (its complete() unions them); a plain write
            # unions the chunk plans and commits ONCE — same atomicity
            # as before, flat parse memory
            plain: list = []
            try:
                for chunk in self._parse_body(rq):
                    if session is not None:
                        session.append(chunk.drop("dataset"))
                    else:
                        plain.append(chunk.drop("dataset"))
            except ValueError as exc:
                # malformed body mid-stream: a lease we just started
                # must not survive the failed request
                if fs_start and session is not None:
                    self.leases.release(ds, fs_id).abandon()
                return self._error(rq, 400, f"malformed entity batch: {exc}")
            if plain:
                batch = plain[0]
                for b in plain[1:]:
                    batch = batch.unionByName(b)
                self.store.store_entities(ds, batch)
                self.invalidate_query_index()
            if fs_end:
                session = self.leases.release(ds, fs_id)
                session.complete()
                self.invalidate_query_index()
            self._reply(rq, 200, {})
        except ConflictError as exc:
            self._error(rq, 409, str(exc))
        except GoneError as exc:
            self._error(rq, 410, str(exc))
