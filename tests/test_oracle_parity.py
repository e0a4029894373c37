"""The local correctness gate: every queries() entry that declares an
oracle must hash-match DuckDB on sf0.01 (mirrors the driver's t2)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle import compare


def _pairs():
    from datahub_spark.queries import ORACLES, QUERIES

    return [(name, QUERIES[name], ORACLES[name]) for name in sorted(ORACLES)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, name, fn, sql):
    df = fn(spark, SF_ORACLE)
    ok, msg = compare(df, sql, SF_ORACLE)
    assert ok, f"{name}: {msg}"


def _no_oracle():
    from datahub_spark.queries import ORACLES, QUERIES

    return sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", _no_oracle() or ["_none_"])
def test_rows_only_queries_run(spark, name):
    if name == "_none_":
        return
    from datahub_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
