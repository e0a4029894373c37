"""events.ts physical-encoding compatibility.

The driver's testdata has shipped the events table in two parquet
encodings over time: TIMESTAMP(NANOS) (Spark reads int64 nanos under the
legacy ``nanosAsLong`` flag set in session.get_spark) and timestamp[us]
(Spark reads TIMESTAMP_NTZ). ingest dtype-dispatches at load
(_ts_micros/_ts_bound); BOTH encodings must produce an identical entity
change-log, and the recorded-range rewrite must stay a parquet
PushedFilter in both."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datahub_spark import ingest

T_MID = 1705276800000000  # 2024-01-15T00:00:00Z epoch-us

# (event_id, user_id, ts_us, event_type, value, props) — boundary cases:
# one row exactly AT the token (must be excluded by recorded > T_MID),
# one 1 us after (must be included).
ROWS = [
    (1, 1, 1_700_000_000_000_000, "click", 1.50, '{"k":"a"}'),
    (2, 1, T_MID, "error", 2.00, '{"k":"b"}'),
    (3, 2, T_MID + 1, "view", 3.25, '{"k":"c"}'),
    (4, 2, 1_710_000_000_000_123, "click", 4.00, None),
]


def _write_events(path: str, encoding: str) -> None:
    us = [r[2] for r in ROWS]
    if encoding == "us":
        ts = pa.array(us, pa.timestamp("us"))
        version = "2.4"
    else:
        # legacy layout: TIMESTAMP(NANOS), with sub-microsecond bits that
        # recorded = ts div 1000 must truncate away
        ts = pa.array([u * 1000 + 7 for u in us], pa.timestamp("ns"))
        version = "2.6"  # keeps ns (2.4 would silently coerce to us)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "user_id": pa.array([r[1] for r in ROWS], pa.int64()),
            "ts": ts,
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(table, path, version=version, coerce_timestamps=None)


@pytest.fixture(scope="module")
def both_dirs(tmp_path_factory):
    dirs = {}
    for enc in ("us", "ns"):
        d = tmp_path_factory.mktemp(f"events_{enc}")
        _write_events(str(d / "events.parquet"), enc)
        dirs[enc] = str(d)
    return dirs


def _dtype(spark, d):
    return dict(ingest.load_tables(spark, d)["events"].dtypes)["ts"]


def test_encodings_read_as_expected_dtypes(spark, both_dirs):
    assert _dtype(spark, both_dirs["us"]) == "timestamp_ntz"
    # legacy flag (session.get_spark) turns TIMESTAMP(NANOS) into int64
    assert _dtype(spark, both_dirs["ns"]) == "bigint"


def test_user_entity_identical_across_encodings(spark, both_dirs):
    def log(d):
        df = ingest._user_entity(ingest.load_tables(spark, d)["events"])
        return sorted(
            (r["id"], r["recorded"], r["seq"], r["deleted"],
             r["props"]["p:event_type"], r["props"]["p:value"])
            for r in df.collect()
        )

    a, b = log(both_dirs["us"]), log(both_dirs["ns"])
    assert a == b
    # and recorded really is epoch-us of the source rows
    assert [x[1] for x in a] == sorted(r[2] for r in ROWS)


@pytest.mark.parametrize("enc", ["us", "ns"])
def test_user_log_range_semantics_and_pushdown(spark, both_dirs, enc):
    d = both_dirs[enc]
    df = ingest.user_log(spark, d, since_us=T_MID)
    rows = sorted((r["seq"], r["recorded"]) for r in df.collect())
    # row AT the token excluded, 1 us after included
    assert rows == [(3, T_MID + 1), (4, 1_710_000_000_000_123)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts," in plan, plan[:2000]


def test_until_bound_inclusive(spark, both_dirs):
    for enc in ("us", "ns"):
        df = ingest.user_log(spark, both_dirs[enc], until_us=T_MID)
        assert sorted(r["seq"] for r in df.collect()) == [1, 2]


def test_ingest_plan_caches_are_lru_bounded():
    # a long-lived server must not accumulate plan entries without
    # bound; reads refresh recency, inserts past maxsize evict LRU
    from datahub_spark.ingest import _LRUCache

    c = _LRUCache(maxsize=3)
    for i in range(3):
        c[("app", f"dir{i}")] = i
    assert len(c) == 3
    _ = c[("app", "dir0")]          # refresh dir0
    c[("app", "dir3")] = 3          # evicts dir1 (LRU), not dir0
    assert len(c) == 3
    assert ("app", "dir0") in c and ("app", "dir3") in c
    assert ("app", "dir1") not in c
    # module-level caches are instances of the bounded type
    from datahub_spark import ingest

    for cache in (ingest._TABLE_CACHE, ingest._ENTITY_CACHE,
                  ingest._USER_LOG_CACHE):
        assert isinstance(cache, _LRUCache) and cache.maxsize >= 1
