"""Count-min sketch over token streams — approximate frequencies for
vocabularies too large to materialize (Cormode & Muthukrishnan 2005,
"An improved data stream summary: the count-min sketch and its
applications").

Why it exists beside the exact builders: build_vocabulary /
build_bigram_table keep exact counts by CAPPING the vocabulary (top-k
via TakeOrderedAndProject), which is the right tool when a bounded
model table feeds a broadcast join. At 100 TB the uncapped long tail
(URLs, n-grams, entity mentions) has more distinct keys than executor
memory; the CMS compresses the WHOLE stream into a fixed
``depth x width`` integer table with one-sided error — estimates never
undercount, and overcount by at most eps*N with probability 1-delta
for width = ceil(e/eps), depth = ceil(ln(1/delta)) (the classic
bound; N = total token mass).

Spark shape (scale contract):
  * build — ONE explode over tokens, the ``depth`` cell keys computed
    MAP-SIDE per occurrence (posexplode of a depth-array of hashes),
    then ONE HashAggregate on (row, cell) with map-side partials: the
    shuffle is bounded by depth*width CELLS, never by distinct tokens
    — this is what the exact builders cannot promise uncapped.
  * query — estimates for a token frame via a BROADCAST join against
    the sketch (depth*width rows, bounded by construction) + a
    min-over-depth aggregate.
  * merge — sketches are LINEAR: cell-wise addition merges shard
    sketches exactly (union + re-agg over bounded cell rows), the
    incremental-corpus shape materialize_rollup uses for rollups.

Hash lanes, same convention as the Bloom/minhash operators:
``method='xxhash'`` (production default, JVM xxhash64 per depth-row
seed) and ``method='md5'`` (engine-portable fixed-point — DuckDB
reproduces every cell exactly; in-suite parity pinned in
test_sketch.py, the promotion-evidence pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datahub_spark.operators.text import words

CMS_DEFAULT_DEPTH = 4
CMS_DEFAULT_WIDTH = 1 << 16


def _cell(tok, row: int, width: int, method: str):
    """Map-side cell index of ``tok`` for depth-row ``row``: the
    row index acts as the hash seed, so rows are pairwise-independent
    enough in practice (seeded xxhash64 / md5-prefix fixed point)."""
    if method == "xxhash":
        return F.pmod(F.xxhash64(tok, F.lit(int(row))),
                      F.lit(int(width))).cast("int")
    if method == "md5":
        h = F.conv(F.substring(
            F.md5(F.concat(tok, F.lit(f"#cms{row}"))), 1, 15), 16, 10)
        return F.pmod(h.cast("decimal(38,0)"),
                      F.lit(int(width))).cast("int")
    raise ValueError(f"cms: unknown method {method!r}")


def count_min_build(df: DataFrame, text_col: str = "text",
                    depth: int = CMS_DEFAULT_DEPTH,
                    width: int = CMS_DEFAULT_WIDTH,
                    method: str = "xxhash",
                    token_col: str | None = None) -> DataFrame:
    """Build the sketch: ``(row int, cell int, cnt long)`` with
    exactly the non-zero cells present (absent cell = 0). Pass
    ``token_col`` to sketch an already-tokenized column (one token
    per dataframe row, e.g. an exploded n-gram frame) instead of
    whitespace-normalized words of ``text_col``."""
    d, w = int(depth), int(width)
    if d < 1 or w < 2:
        raise ValueError(f"cms: need depth >= 1 and width >= 2, "
                         f"got ({d}, {w})")
    if token_col is not None:
        toks = df.select(F.col(token_col).alias("_t"))
    else:
        toks = df.select(
            F.explode(words(F.col(text_col))).alias("_t"))
    toks = toks.filter(F.col("_t") != "")
    cells = toks.select(F.posexplode(F.array(
        *[_cell(F.col("_t"), r, w, method) for r in range(d)]
    )).alias("row", "cell"))
    return (cells.groupBy("row", "cell")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def count_min_query(cms: DataFrame, tokens: DataFrame,
                    token_col: str = "token",
                    depth: int = CMS_DEFAULT_DEPTH,
                    width: int = CMS_DEFAULT_WIDTH,
                    method: str = "xxhash") -> DataFrame:
    """Point estimates for every row of ``tokens``: adds ``est``
    (min over the depth cells — never below the true count). The
    sketch side rides a broadcast (bounded depth*width rows); the
    token side stays distributed, so querying a billion-row token
    frame is one map-side join + a keyed min."""
    d, w = int(depth), int(width)
    probes = tokens.select(
        F.col(token_col),
        F.posexplode(F.array(
            *[_cell(F.col(token_col), r, w, method) for r in range(d)]
        )).alias("row", "cell"))
    est = (probes.join(F.broadcast(cms), ["row", "cell"], "left")
           .groupBy(token_col)
           .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                .alias("est")))
    return tokens.join(est, token_col, "left") \
        .withColumn("est", F.coalesce(F.col("est"), F.lit(0).cast("long")))


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of shard sketches (linearity): EXACTLY the sketch
    of the concatenated streams, with the same bounded-cells shuffle
    as one build. All inputs must share (depth, width, method) — the
    caller's contract, as with bloom merge."""
    if not sketches:
        raise ValueError("cms: nothing to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("row", "cell")
            .agg(F.sum("cnt").cast("long").alias("cnt")))
