"""Script-string transform surface — the reference's JavascriptTransform
(internal/jobs/transform.go:46-123 helper functions, :230-255 host
functions; DOCUMENTATION.md:1138-1812) as a *source-code string* entry
point for the jobs engine.

The reference accepts base64 ES6 defining ``transform_entities(entities)``
and executes it per batch in a goja sandbox with a fixed built-in
vocabulary (GetId/SetProperty/Query/...). This engine accepts BOTH
languages through one entry point (``compile_script``):

- **JavaScript** — the reference's native transform language, so
  existing job configs run verbatim (base64 or raw source). Scripts run
  on a bundled interpreter for the transform dialect
  (datahub_spark.js; no JS engine exists in this container or JVM-side)
  over the same dict entities the Python path uses — host vocabulary
  shared, zero conversion.
- **Python** — the engine-idiomatic language, same entity JSON shape
  (``{ID, Recorded, IsDeleted, Properties, References}``,
  entity.go/DOCUMENTATION.md:47-107) and the same built-in names with
  the same signatures.

Execution model (the 100 TB design):
- The script runs ONCE per Arrow batch inside ``mapInPandas`` — batch
  granularity like the reference's ``transformEntities`` call, but
  parallel across executors with no driver round-trip. Declarative
  transforms (datahub_spark.transforms) remain the hot path; this is the
  escape hatch with a stable user-facing contract.
- ``Query``/``FindById`` run against BROADCAST lookup indexes built from
  dimension-sized datasets declared up front (``lookup=...``). The
  reference executes these against its local Badger store per call;
  distributed executors have no store, and per-row RPCs would be the
  classic scale killer. Joining against a big dataset belongs in
  ``transforms.enrich_via`` (a real shuffle join), and the docstring of
  ``lookup`` says so.
- ``AssertNamespacePrefix`` must return the same prefix on every
  executor with no coordination, so unknown expansions derive a
  content-addressed prefix (``ns_<md5[:8]>``) instead of the reference's
  sequential counter (store.go:289) — deterministic everywhere, stable
  across runs.

Scripts are trusted code, same trust level as a ``python_transform``
callable or the reference's sandbox-with-host-functions.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import uuid as _uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from datahub_spark.model import ENTITY_COLUMNS, ENTITY_SCHEMA
from datahub_spark.namespaces import DEFAULT_NAMESPACES

# script output schema: entity columns, all nullable — NewEntity rows
# carry NULL id-until-SetId and NULL (recorded, seq), which the sink
# stamps at commit time (jobs.py sink-commit stamping)
SCRIPT_OUTPUT_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in ENTITY_SCHEMA.fields]
)


# --------------------------------------------------------------------------
# entity dict <-> row conversion
# --------------------------------------------------------------------------

def _as_dict(v):
    """Arrow hands MapType values to pandas as list-of-(k,v)-tuples; user
    code wants dicts. None -> {}."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return dict(v)
    return {k: val for k, val in v}


def _row_to_entity(row: dict) -> dict:
    refs = _as_dict(row.get("refs"))
    return {
        "ID": row.get("id"),
        "Recorded": row.get("recorded"),
        "Seq": row.get("seq"),
        "IsDeleted": bool(row.get("deleted")) if row.get("deleted") is not None else False,
        "Properties": _as_dict(row.get("props")),
        "References": {k: list(v) if v is not None else [] for k, v in refs.items()},
        "Dataset": row.get("dataset"),
    }


def _entity_to_row(e: dict) -> dict:
    from datahub_spark.js import UNDEFINED, js_to_string

    props = e.get("Properties") or {}
    refs = e.get("References") or {}

    def canon(v):
        # JS-sourced values: undefined -> NULL, numbers JS-stringified
        # (integral floats print bare — goja's int64 behavior)
        if v is None or v is UNDEFINED:
            return None
        return js_to_string(v) if isinstance(v, (bool, int, float)) else str(v)

    def _get(key):
        v = e.get(key)
        return None if v is UNDEFINED else v

    return {
        "id": _get("ID"),
        "recorded": _get("Recorded"),
        "seq": _get("Seq"),
        "deleted": bool(_get("IsDeleted") or False),
        # canonicalize: props values to strings, ref values to lists
        "props": {str(k): canon(v) for k, v in props.items()},
        "refs": {
            str(k): ([canon(x) for x in v] if isinstance(v, (list, tuple))
                     else [canon(v)])
            for k, v in refs.items()
        },
        "dataset": _get("Dataset"),
    }


# --------------------------------------------------------------------------
# built-in vocabulary (transform.go:46-123 JS helpers + :230-255 host fns)
# --------------------------------------------------------------------------

def make_builtins(namespaces: dict[str, str], index: dict | None = None,
                  log_sink: list | None = None,
                  txn_sink: list | None = None,
                  query_result_sink: list | None = None) -> dict:
    """The reference's transform built-ins over dict entities. ``index``
    is the broadcast lookup payload: {"by_id": {id: entity},
    "inverse": {(predicate, target_id): [source_id, ...]}}.

    ``txn_sink``: batch-buffered transaction shim. The reference's
    NewTransaction/ExecuteTransaction (transform.go:359-372,
    store.go:1687-1705) write to OTHER datasets mid-transform against the
    local store; distributed executors have no store, and a per-row write
    RPC is the classic scale killer — so ExecuteTransaction BUFFERS
    (dataset, entity) pairs into txn_sink and script_transform emits them
    with the batch output (the `dataset` column routes them; one sink
    commit per batch keeps the reference's transaction granularity).
    ``query_result_sink``: same shape for WriteQueryResult
    (transform.go:322) — objects buffer and surface as rows."""
    ns = dict(namespaces)
    by_id = (index or {}).get("by_id", {})
    inverse = (index or {}).get("inverse", {})
    changes = (index or {}).get("changes", {})

    def _key(prefix, name):
        return f"{prefix}:{name}"

    def GetId(entity):
        return None if entity is None else entity.get("ID")

    def SetId(entity, eid):
        if entity is not None:
            entity["ID"] = eid

    def GetProperty(entity, prefix, name, default=None):
        if entity is None or entity.get("Properties") is None:
            return default
        v = entity["Properties"].get(_key(prefix, name))
        return default if v is None else v

    def SetProperty(entity, prefix, name, value):
        if entity is None or entity.get("Properties") is None:
            return
        entity["Properties"][_key(prefix, name)] = value

    def RemoveProperty(entity, prefix, name):
        if entity is None or entity.get("Properties") is None:
            return
        entity["Properties"].pop(_key(prefix, name), None)

    def RenameProperty(entity, old_prefix, old_name, new_prefix, new_name):
        # reference composes Get+Set+Remove (transform.go:122-129)
        if entity is None:
            return
        value = GetProperty(entity, old_prefix, old_name)
        SetProperty(entity, new_prefix, new_name, value)
        RemoveProperty(entity, old_prefix, old_name)

    def GetReference(entity, prefix, name, default=None):
        if entity is None or entity.get("References") is None:
            return default
        v = entity["References"].get(_key(prefix, name))
        return default if v is None else v

    def AddReference(entity, prefix, name, value):
        if entity is None or entity.get("References") is None:
            return
        entity["References"][_key(prefix, name)] = value

    def GetDeleted(entity):
        return None if entity is None else entity.get("IsDeleted")

    def SetDeleted(entity, deleted):
        if entity is not None:
            entity["IsDeleted"] = bool(deleted)

    def PrefixField(prefix, field):
        return f"{prefix}:{field}"

    def NewEntity():
        return {"ID": None, "Recorded": None, "Seq": None, "IsDeleted": False,
                "Properties": {}, "References": {}, "Dataset": None}

    def NewEntityFrom(entity, add_type=False, copy_props=False,
                      copy_refs=False):
        """Helper-JS NewEntityFrom (transform.go:138-166): new entity
        carrying the source's ID and IsDeleted; optionally the rdf:type
        reference and/or copies of all props/refs."""
        out = NewEntity()
        if entity is None:
            return out
        out["ID"] = entity.get("ID")
        out["IsDeleted"] = entity.get("IsDeleted", False)
        if add_type:
            try:
                rdf = GetNamespacePrefix(
                    "http://www.w3.org/1999/02/22-rdf-syntax-ns#")
            except KeyError:
                rdf = None
            if rdf is not None:
                t = GetReference(entity, rdf, "type")
                if t is not None:
                    AddReference(out, rdf, "type", t)
        if copy_props:
            out["Properties"].update(entity.get("Properties") or {})
        if copy_refs:
            for k, v in (entity.get("References") or {}).items():
                out["References"][k] = list(v) if isinstance(v, (list, tuple)) else v
        return out

    def NewTransaction():
        """Reference Transaction (store.go:1687): user code fills
        txn["DatasetEntities"][dataset] = [entities] and may call
        txn.AssertDataset(name). AssertDataset records the name for
        parity but needs no action here — this engine's store creates
        datasets on first write (store.store_entities), so assertion is
        implicit."""
        txn = {"DatasetEntities": {}, "_asserted": []}
        txn["AssertDataset"] = txn["_asserted"].append
        return txn

    def ExecuteTransaction(txn):
        """Batch-buffered (see make_builtins docstring): stages every
        (dataset, entity) pair for emission with the batch output. In
        the emitted rows the target dataset carries an ``@txn:`` prefix
        so the jobs engine can route them to their own datasets (the
        reference's Store.ExecuteTransaction semantics) while returned
        entities flow to the job sink — Job.run strips the marker and
        commits per target dataset."""
        if txn_sink is None:
            raise RuntimeError(
                "ExecuteTransaction is only available inside a "
                "script_transform batch (entities staged there commit "
                "with the batch); driver-side code should use "
                "store.execute_transaction")
        for ds, ents in (txn.get("DatasetEntities") or {}).items():
            for e in ents or []:
                txn_sink.append((ds, e))
        return None

    def WriteQueryResult(obj):
        if query_result_sink is None:
            raise RuntimeError(
                "WriteQueryResult is only available under "
                "run_query_script, which collects the written objects")
        query_result_sink.append(obj)
        return None

    def AsEntity(obj):
        # rows are dict entities already; pass through dict-shaped input
        return obj if isinstance(obj, dict) else None

    def ToString(obj):
        if obj is None:
            return None
        return str(obj)

    def Log(msg, *args):
        if log_sink is not None:
            log_sink.append(str(msg))

    def UUID():
        # reference: uuid.NewV4 (nondeterministic there too)
        return str(_uuid.uuid4())

    def Timing(name, *a, **kw):  # statsd no-op (reference uses NoOpClient in tests)
        return None

    def GetNamespacePrefix(expansion):
        for prefix, exp in ns.items():
            if exp == expansion:
                return prefix
        raise KeyError(expansion)

    def AssertNamespacePrefix(expansion):
        # deterministic, coordination-free (see module docstring)
        for prefix, exp in ns.items():
            if exp == expansion:
                return prefix
        prefix = "ns_" + hashlib.md5(expansion.encode()).hexdigest()[:8]
        ns[prefix] = expansion
        return prefix

    def FindById(entity_id):
        """ByID (transform.go): latest entity from the declared lookup
        datasets, or None."""
        return _copy(by_id.get(entity_id))

    def Query(starting_entities, predicate, inverse_flag=False, datasets=None):
        """transform.Query: [start, predicate, relatedEntity] triples.
        Outgoing: follow refs[predicate] of each start (target entity from
        the lookup index; bare {ID} stub if the target isn't indexed —
        the reference returns open-world URIs the same way). Inverse:
        entities whose refs[predicate] contains the start id. A predicate
        of ``"*"`` (or None) traverses EVERY predicate, like the
        reference's Via ``*`` (store.go ToRelatedFrom)."""
        wildcard = predicate in (None, "*")
        out = []
        for start in starting_entities:
            if inverse_flag:
                if wildcard:
                    hits = sorted(
                        (p, src) for (p, tgt), srcs in inverse.items()
                        if tgt == start for src in srcs)
                else:
                    hits = [(predicate, src)
                            for src in inverse.get((predicate, start), [])]
                for p, src in hits:
                    out.append([start, p, _copy(by_id.get(src))])
            else:
                ent = by_id.get(start)
                for p, targets in sorted(
                        (ent or {}).get("References", {}).items()):
                    if not wildcard and p != predicate:
                        continue
                    for target in targets:
                        hit = by_id.get(target)
                        out.append([
                            start, p,
                            _copy(hit) if hit is not None else {
                                "ID": target, "Recorded": None, "Seq": None,
                                "IsDeleted": False, "Properties": {},
                                "References": {}, "Dataset": None,
                            },
                        ])
        return out

    def GetDatasetChanges(dataset, since=0, limit=None):
        """DatasetChanges host fn: the declared lookup dataset's change
        rows with recorded > since, in version order. NOT carried over:
        NewTransaction/ExecuteTransaction/WriteQueryResult — per-row
        store writes from inside a distributed transform are the classic
        scale anti-pattern; this engine's equivalent is returning the
        entities (the sink commits one transaction per batch) or
        driver-side store.execute_transaction."""
        rows = [
            _copy(e) for e in changes.get(dataset, [])
            if (e.get("Recorded") or 0) > since
        ]
        return rows[:limit] if limit is not None else rows

    def PagedQuery(params, page_size=None, callback=None):
        """transform.go:462-534 PagedQuery(query, pageSize, forEach).
        params: StartURIs (reference name; StartingEntities accepted),
        Via (or Predicate; ``"*"`` = any), Inverse, Datasets, and
        Continuations to RESUME an earlier stopped query. Pages of
        ``page_size`` go to the callback; a falsy callback return stops
        iteration and the un-delivered remainder comes back as the
        continuation value (pass it as params.Continuations to resume).
        Fully drained returns [] — which stringifies to "" like the
        reference's nil cursor slice does in JS ("cont:"+r fixtures).
        Called with only params, returns the full triple list (legacy
        two-arg shim shape)."""
        conts = params.get("Continuations")
        if conts:
            pending = list(conts)
        else:
            pending = Query(
                params.get("StartURIs",
                           params.get("StartingEntities", [])),
                params.get("Via", params.get("Predicate")),
                params.get("Inverse", False),
                params.get("Datasets"),
            )
        if callback is None:
            return pending
        size = int(page_size) if page_size else max(len(pending), 1)
        while pending:
            page, pending = pending[:size], pending[size:]
            keep_going = callback(page)
            if not keep_going:  # falsy (false/undefined/None) stops
                return pending
        return []

    return {
        "GetId": GetId, "SetId": SetId,
        "GetProperty": GetProperty, "SetProperty": SetProperty,
        "RemoveProperty": RemoveProperty, "RenameProperty": RenameProperty,
        "GetReference": GetReference, "AddReference": AddReference,
        "GetDeleted": GetDeleted, "SetDeleted": SetDeleted,
        "PrefixField": PrefixField, "NewEntity": NewEntity,
        "NewEntityFrom": NewEntityFrom,
        "NewTransaction": NewTransaction,
        "ExecuteTransaction": ExecuteTransaction,
        "WriteQueryResult": WriteQueryResult,
        "AsEntity": AsEntity, "ToString": ToString, "Log": Log,
        "UUID": UUID, "Timing": Timing,
        "GetNamespacePrefix": GetNamespacePrefix,
        "AssertNamespacePrefix": AssertNamespacePrefix,
        "FindById": FindById, "Query": Query, "PagedQuery": PagedQuery,
        "GetDatasetChanges": GetDatasetChanges,
    }


def _copy(ent):
    if ent is None:
        return None
    out = dict(ent)
    out["Properties"] = dict(ent.get("Properties") or {})
    out["References"] = {k: list(v) for k, v in (ent.get("References") or {}).items()}
    return out


# --------------------------------------------------------------------------
# compilation + execution
# --------------------------------------------------------------------------

def maybe_b64_decode(code: str) -> str:
    """The reference's job configs carry the transform source base64-
    encoded (``{"Type": "JavascriptTransform", "Code": <b64>}``,
    transform.go:parseTransform/NewJavascriptTransform). Decode if the
    string is valid base64 of utf-8 text; raw source passes through
    (source always contains characters outside the base64 alphabet)."""
    stripped = "".join(code.split())
    try:
        return base64.b64decode(stripped, validate=True).decode("utf-8")
    except (binascii.Error, ValueError, UnicodeDecodeError):
        return code


def compile_script(code: str, namespaces: dict[str, str] | None = None,
                   index: dict | None = None, log_sink: list | None = None,
                   txn_sink: list | None = None,
                   query_result_sink: list | None = None,
                   language: str = "auto"):
    """Compile ``code`` with the built-in vocabulary injected and return
    its ``transform_entities`` callable. Raises on syntax errors or a
    missing entry point — validation happens driver-side, before any
    task runs.

    ``language``: "python", "js", or "auto" (sniff). JS sources — the
    reference's native transform language — run on the bundled
    interpreter (datahub_spark.js) against the SAME dict entities and
    the SAME host vocabulary, so reference transforms run verbatim;
    base64-encoded sources (the job-config wire format) are decoded
    first in either language."""
    from datahub_spark import js as _js

    code = maybe_b64_decode(code)
    env: dict = dict(make_builtins(namespaces or DEFAULT_NAMESPACES, index,
                                   log_sink, txn_sink, query_result_sink))
    if language == "auto":
        language = "js" if _js.looks_like_js(code) else "python"
    if language in ("js", "javascript"):
        fns = _js.run_program(code, host=env)
        fn = fns.get("transform_entities")
        if fn is None:
            raise ValueError(
                "script must define transform_entities(entities)")
        return fn
    exec(compile(code, "<transform_entities>", "exec"), env)
    fn = env.get("transform_entities")
    if not callable(fn):
        raise ValueError("script must define transform_entities(entities)")
    return fn


# Hard cap on the lookup index: Query/FindById indexes are collected to
# the driver and broadcast — past this size the job belongs on the
# shuffle-join path (transforms.enrich_via), not in driver memory.
LOOKUP_INDEX_MAX_ROWS = 200_000


def build_lookup_index(*frames: DataFrame,
                       max_rows: int = LOOKUP_INDEX_MAX_ROWS) -> dict:
    """Collect dimension-sized entity frames into the Query/FindById
    index. DIMENSION-SIZED ONLY: this is a driver collect + broadcast,
    the batch analogue of the reference resolving queries against its
    local store. Enriching against a large dataset is a join — use
    transforms.enrich_via, which shuffles properly. Enforced: more than
    ``max_rows`` total rows raises instead of silently OOMing the driver
    (the limit+1 probe never materializes the oversized frame)."""
    by_id: dict = {}
    inverse: dict = {}
    changes: dict = {}
    remaining = max_rows
    for df in frames:
        cols = [c for c in ENTITY_COLUMNS if c in df.columns]
        collected = df.select(*cols).limit(remaining + 1).collect()
        if len(collected) > remaining:
            raise ValueError(
                f"lookup index exceeds {max_rows} rows: Query/FindById "
                "lookups are for dimension-sized datasets only — join "
                "large datasets with transforms.enrich_via (a distributed "
                "shuffle join) instead, or raise max_rows explicitly"
            )
        remaining -= len(collected)
        for row in collected:
            ent = _row_to_entity(row.asDict())
            changes.setdefault(ent["Dataset"], []).append(ent)
            prev = by_id.get(ent["ID"])
            if prev is None or (ent["Recorded"] or 0, ent["Seq"] or 0) >= (
                    (prev["Recorded"] or 0), (prev["Seq"] or 0)):
                by_id[ent["ID"]] = ent
    for ent in by_id.values():
        for pred, targets in ent["References"].items():
            for t in targets:
                inverse.setdefault((pred, t), []).append(ent["ID"])
    for k in inverse:
        inverse[k].sort()  # deterministic result order
    for ds in changes:
        changes[ds].sort(key=lambda e: (e["Recorded"] or 0, e["Seq"] or 0, e["ID"] or ""))
    return {"by_id": by_id, "inverse": inverse, "changes": changes}


# Per-worker-process compiled-script cache: tasks in the same Python
# worker reuse the compiled entry point instead of re-exec'ing the
# source per batch-iterator. Keyed by a CONTENT hash of
# (code, namespaces, index) — repeat script_transform calls with the
# same binding hit the same entry (a uuid-per-call key grew one
# permanently-retained env, broadcast index included, per invocation in
# every long-lived worker) — and bounded LRU so distinct scripts can't
# accumulate without limit either.
_FN_CACHE: "dict[str, object]" = {}
_FN_CACHE_MAX = 16


def _cache_get(key: str, build):
    fn = _FN_CACHE.pop(key, None)
    if fn is None:
        fn = build()
    _FN_CACHE[key] = fn  # (re)insert at LRU tail
    while len(_FN_CACHE) > _FN_CACHE_MAX:
        _FN_CACHE.pop(next(iter(_FN_CACHE)))
    return fn


def _index_digest(code: str, ns: dict, index: dict | None) -> str:
    """Content key for the worker fn-cache. Deterministic over equal
    content; an equal-content index that happens to repr differently
    only costs a recompile (false-sharing is impossible)."""
    h = hashlib.md5()
    h.update(code.encode())
    h.update(repr(sorted(ns.items())).encode())
    if index is not None:
        h.update(repr(sorted(index["by_id"].items())).encode())
        h.update(repr(sorted(index["inverse"].items())).encode())
    return h.hexdigest()


def script_transform(df: DataFrame, code: str, *,
                     lookup: list[DataFrame] | None = None,
                     namespaces: dict[str, str] | None = None) -> DataFrame:
    """Run a user script string over an entity DataFrame, batch-at-a-time
    (JavascriptTransform analogue; see module docstring). The script may
    mutate, drop, or emit entities — the returned list IS the output
    batch. Output schema is the canonical entity schema; recorded/seq
    left None by the script are stamped by the sink at commit time
    (jobs.py sink-commit stamping), matching the reference's StoreEntities
    store-time stamp."""
    compile_script(code, namespaces)  # fail fast, driver-side
    ns = dict(namespaces or DEFAULT_NAMESPACES)
    index = build_lookup_index(*lookup) if lookup else None
    sc = df.sparkSession.sparkContext
    token = _index_digest(code, ns, index)
    bc = sc.broadcast({"ns": ns, "index": index, "code": code, "token": token})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payload = bc.value

        def build():
            sink: list = []
            return (compile_script(payload["code"], payload["ns"],
                                   payload["index"], txn_sink=sink), sink)

        fn, txn_sink = _cache_get(payload["token"], build)
        for pdf in batches:
            ents = [_row_to_entity(r) for r in pdf.to_dict("records")]
            txn_sink.clear()
            out = fn(ents)
            rows = [_entity_to_row(e) for e in (out or [])]
            # transaction-staged entities ride along, marked for routing
            # (see make_builtins ExecuteTransaction)
            for ds, ent in txn_sink:
                row = _entity_to_row(ent)
                row["dataset"] = f"@txn:{ds}"
                rows.append(row)
            txn_sink.clear()
            yield pd.DataFrame(rows, columns=ENTITY_COLUMNS)

    return df.mapInPandas(run, schema=SCRIPT_OUTPUT_SCHEMA)


def make_script_transform(code: str, *, lookup: list[DataFrame] | None = None,
                          namespaces: dict[str, str] | None = None):
    """A jobs-engine Transform (DataFrame -> DataFrame callable) from a
    script string (JavaScript — raw or base64, the reference job-config
    wire format — or Python; see compile_script) — the analogue of a job
    config's ``{"Type": "JavascriptTransform", "Code": ...}`` block.
    Validates the script immediately (driver-side), not at first job
    run. The returned callable carries ``may_stage_transactions`` so
    Job.run only pays the transaction-routing split (an extra plan
    execution) for scripts that can actually call ExecuteTransaction."""
    decoded = maybe_b64_decode(code)
    compile_script(decoded, namespaces)

    def transform(df: DataFrame) -> DataFrame:
        return script_transform(df, decoded, lookup=lookup,
                                namespaces=namespaces)

    transform.may_stage_transactions = "ExecuteTransaction" in decoded
    return transform


def run_query_script(spark: SparkSession, code: str, *,
                     lookup: list[DataFrame] | None = None,
                     index: dict | None = None,
                     namespaces: dict[str, str] | None = None,
                     entry: str = "do_query") -> list:
    """Driver-side script-query runner — the reference's javascript
    query endpoint (transform.go:561 ExecuteQuery; WriteQueryResult
    writes objects to the response stream). The script defines
    ``do_query()`` (any JS/Python body) and calls WriteQueryResult(obj)
    per result; returns the written objects in order. Runs DRIVER-side
    against the broadcast lookup index — built from ``lookup`` frames or
    passed pre-built via ``index`` (query scripts are interactive,
    bounded-output by construction); set-oriented querying over big data
    belongs in datahub_spark.query / queries."""
    from datahub_spark import js as _js

    code = maybe_b64_decode(code)
    results: list = []
    if index is None:
        index = build_lookup_index(*lookup) if lookup else None
    env: dict = dict(make_builtins(namespaces or DEFAULT_NAMESPACES, index,
                                   query_result_sink=results))
    if _js.looks_like_js(code):
        fns = _js.run_program(code, host=env)
        fn = fns.get(entry)
    else:
        exec(compile(code, f"<{entry}>", "exec"), env)
        fn = env.get(entry)
    if not callable(fn):
        raise ValueError(f"script must define {entry}()")
    fn()
    return results


# --------------------------------------------------------------------------
# script-built virtual datasets (BuildEntities + Emit host contract,
# transform.go:578-600)
# --------------------------------------------------------------------------

def is_js_code(code: str) -> bool:
    """True when a (possibly base64-encoded) script body is JavaScript.

    The SERVED virtual-dataset path must only ever run the sandboxed JS
    interpreter — the Python ``exec`` fallback in ScriptVirtualSource is
    for trusted in-process use and would be remote code execution if
    reachable from a stored dataset config (the reference confines
    virtual-dataset transforms to goja, virtualdataset.go)."""
    from datahub_spark import js as _js

    return _js.looks_like_js(maybe_b64_decode(code))


class ScriptVirtualSource:
    """A virtual dataset whose pages are produced by a user script
    defining ``build_entities(params, since, limit)`` that calls
    ``Emit(entity)`` and returns the next continuation token — the
    reference's script-backed proxy dataset contract (transform.go
    BuildEntities / Runtime.Set("Emit", ...)).

    The script runs DRIVER-side per read: this surface exists for
    API-backed incremental feeds (the reference's use), which are
    small-per-page by construction — paging is the scale mechanism, via
    the since/limit/token loop the jobs engine already drives.
    Generating a LARGE dataset belongs in VirtualDatasetSource with a
    distributed (spark.range-based) builder, not a per-entity Emit loop.

    ``watermark_from_read``: the continuation token is the READ's return
    value (not a log watermark), so the jobs engine reads it after the
    sink write — race-free because it derives from the emitted page
    itself.
    """

    watermark_from_read = True

    def __init__(self, spark: SparkSession, code: str, params: dict | None = None,
                 namespaces: dict[str, str] | None = None, dataset: str = "virtual"):
        self.spark = spark
        self.code = code
        self.params = params or {}
        self.dataset = dataset
        from datahub_spark import js as _js

        code = maybe_b64_decode(code)
        env: dict = dict(make_builtins(namespaces or DEFAULT_NAMESPACES))
        self._emitted: list[dict] = []
        env["Emit"] = self._emitted.append
        if _js.looks_like_js(code):
            # the reference's native virtual-dataset language
            # (DOCUMENTATION.md:288-325): the JS build_entities runs
            # VERBATIM on the bundled interpreter with the same host
            # vocabulary (incl. Emit) the transforms get
            fns = _js.run_program(code, host=env)
            fn = fns.get("build_entities")
        else:
            exec(compile(code, "<build_entities>", "exec"), env)
            fn = env.get("build_entities")
        if not callable(fn):
            raise ValueError("script must define build_entities(params, since, limit)")
        self._fn = fn
        self.last_token: object = None

    def read(self, since: int = 0, limit: int | None = None) -> DataFrame:
        self._emitted.clear()
        self.last_token = self._fn(self.params, since, limit)
        rows = [_entity_to_row(e) for e in self._emitted]
        for r in rows:
            if r["dataset"] is None:
                r["dataset"] = self.dataset
        df = self.spark.createDataFrame(
            [tuple(r[c] for c in ENTITY_COLUMNS) for r in rows],
            SCRIPT_OUTPUT_SCHEMA)
        return df

    def current_watermark(self) -> int:
        """Integer continuation for the jobs engine (JobState tokens are
        ints); scripts returning non-numeric tokens keep their own state
        in params."""
        try:
            return int(self.last_token)
        except (TypeError, ValueError):
            return 0
