"""Local replica of the driver's DuckDB-oracle comparison: row-count,
schema-insensitive column alignment (sorted by name), order-insensitive
value compare. Used by tests to gate every queries()/oracle_sql() pair
before the driver does."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_result(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: "" if v is None or v != v else str(v))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    sp = canon(spark_df.toPandas())
    du = canon(duck_result(oracle_sql, sf_dir))
    if list(sp.columns) != list(du.columns):
        return False, f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return False, f"row counts differ: spark={len(sp)} duck={len(du)}"
    if not sp.equals(du):
        neq = (sp != du).any(axis=1)
        sample = pd.concat(
            [sp[neq].head(3).add_prefix("spark_"), du[neq].head(3).add_prefix("duck_")], axis=1
        )
        return False, f"values differ on {int(neq.sum())} rows:\n{sample}"
    return True, "ok"
