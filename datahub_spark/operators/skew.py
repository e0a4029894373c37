"""Skew mitigation utilities: salted joins and hot-key detection.

AQE's skew-join split handles most skew at runtime (enabled throughout
this repo), but it only kicks in for sort-merge joins over already-
materialized shuffle blocks, and it cannot fix a hot AGGREGATION key.
These helpers are the explicit tool for the residual cases §4.4 reserves
("salting for hot buckets"): a join where one key holds a double-digit
percentage of the rows, or a two-phase aggregate over a degenerate
group.

Salting is a correctness-preserving rewrite:
  * join: the skewed (probe) side gets a uniform salt in [0, S); the
    build side is REPLICATED S times, once per salt value; the join key
    becomes (key, salt). Every original match survives exactly once —
    row (k, s) on the probe side meets exactly the s-replica of k.
  * aggregation: group on (key, salt) first (partial), then on key
    (final) — the classic two-phase combine for hot groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_src(df: DataFrame, id_col: str | None, use_mid: bool):
    """Deterministic salt source: xxhash64 of ``id_col`` when given,
    else of EVERY column — same input rows get the same salts on every
    run, so salted results are re-run-stable (pinned in test_skew.py).
    ``use_mid=True`` opts into the old monotonically-increasing-id
    spread: perfectly uniform even over identical rows, but tied to
    partition layout and NOT stable across runs — an explicit choice,
    no longer the silent default."""
    if use_mid:
        return F.monotonically_increasing_id()
    if id_col:
        return F.xxhash64(F.col(id_col))
    return F.xxhash64(*[F.col(c) for c in df.columns])


def salted_join(skewed: DataFrame, other: DataFrame,
                on: list[str] | str, salt: int = 8,
                how: str = "inner",
                id_col: str | None = None,
                use_mid: bool = False) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``salt``
    shuffle partitions. The salt on the skewed side is a deterministic
    hash of ``id_col`` (or of the whole row when omitted — re-run
    stable either way; pass ``use_mid=True`` explicitly for the
    partition-layout spread); ``other`` is exploded x``salt`` (size
    its smaller side!). Result equals the plain join exactly — each
    skewed row carries ONE salt value and meets the single matching
    replica.

    ``how`` supports inner/left (the shapes where the skewed side is
    the probe side)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: unsupported how={how!r}")
    if salt < 1:
        raise ValueError("salted_join: salt must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    src = _salt_src(skewed, id_col, use_mid)
    s = skewed.withColumn("_salt", F.pmod(src, F.lit(salt)).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return s.join(o, keys + ["_salt"], how).drop("_salt")


def salted_count(df: DataFrame, on: list[str] | str,
                 salt: int = 16, count_col: str = "n",
                 id_col: str | None = None,
                 use_mid: bool = False) -> DataFrame:
    """Two-phase count for hot group keys: groupBy(key, salt) partials
    then groupBy(key) finals — the hot key's rows spread over ``salt``
    reducers in phase one instead of landing on a single task. Equal to
    a plain count exactly; the salt is the deterministic row hash
    (identical rows share a salt value, which only narrows phase-one
    spread when the hot key's rows are literal duplicates — pass
    ``use_mid=True`` for those)."""
    keys = [on] if isinstance(on, str) else list(on)
    salted = df.withColumn(
        "_salt",
        F.pmod(_salt_src(df, id_col, use_mid), F.lit(int(salt))).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*keys).agg(
        F.sum("_pc").cast("long").alias(count_col))


def hot_keys(df: DataFrame, on: list[str] | str, top: int = 10,
             min_share_e4: int = 500) -> DataFrame:
    """Diagnostic: the keys holding at least ``min_share_e4``/1e4 of
    the rows (default 5%) — the candidates worth salting. Exact
    integer share; one aggregate + a broadcast total."""
    keys = [on] if isinstance(on, str) else list(on)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n")).collect()[0][0] or 1
    return (counts
            .withColumn("share_e4",
                        F.expr(f"(10000 * n) div {int(total)}").cast("long"))
            .filter(F.col("share_e4") >= int(min_share_e4))
            .orderBy(F.col("n").desc(), *[F.col(k) for k in keys])
            .limit(int(top)))
