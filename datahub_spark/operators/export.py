"""Training-data export: deterministic sharding + reproducible global
shuffle.

The last step of a corpus pipeline is writing training shards: N
roughly equal parquet shards whose global read order is a reproducible
pseudo-random permutation of the corpus (training wants decorrelated
order; reproducibility wants it derived from content keys, not RNG
state or partition order). Both properties come from one hash:
``shard = pmod(xxhash64(id, seed), n)`` places a document, and sorting
within the shard by the same family's ``xxhash64(id, seed+1)`` orders
it. Map-side assignment, exactly ONE shuffle (keyed by shard), and a
dir-per-shard layout a training loader can consume shard-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datahub_spark.operators.text import token_count_whitespace


def assign_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                  seed: int = 42) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) and ``sort_key`` columns. Both are
    pure map-side hash expressions: a document's shard and position
    never depend on partitioning, cluster size, or what other documents
    exist — re-running the export on a grown corpus moves nothing that
    was already placed (only the in-shard positions interleave)."""
    if n_shards <= 0:
        raise ValueError("assign_shards: n_shards must be > 0")
    return (df
            .withColumn("shard",
                        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                               F.lit(n_shards)).cast("int"))
            .withColumn("sort_key",
                        F.xxhash64(F.col(id_col), F.lit(seed + 1))))


def export_shards(df: DataFrame, path: str, n_shards: int,
                  id_col: str = "doc_id", text_col: str = "text",
                  seed: int = 42,
                  token_count_col: str | None = None) -> DataFrame:
    """Write the corpus as ``path/shard=K/*.parquet`` in reproducible
    shuffled order and return a manifest DataFrame ``(shard, n_docs,
    n_tokens)`` read back from the written files (the manifest reflects
    what is actually on disk, not the input plan).

    Plan shape: hash-assign (map-side) -> repartition BY the shard
    column (one keyed shuffle; hash-uniform shards stay balanced, so no
    skew handling is needed by construction) -> sortWithinPartitions on
    the in-shard hash key (local sort, no extra exchange) ->
    partitionBy(shard) parquet write. Reading shard 0..N-1 in order and
    each shard top-to-bottom reproduces one fixed global permutation."""
    assigned = assign_shards(df, n_shards, id_col, seed)
    # the local sort leads with the partition column: FileFormatWriter
    # must cluster rows by partition dirs before writing and would
    # otherwise insert its own (unstable) sort on `shard`, scrambling
    # the in-shard hash order this export promises
    (assigned
     .repartition(n_shards, F.col("shard"))
     .sortWithinPartitions("shard", "sort_key", id_col)
     .write.mode("overwrite").partitionBy("shard").parquet(path))
    written = df.sparkSession.read.parquet(path)
    # tokenized frames (e.g. bpe.encode_bpe_ids output) carry an exact
    # count column; text frames fall back to the whitespace proxy
    n_tok = (F.sum(F.col(token_count_col)) if token_count_col
             else F.sum(token_count_whitespace(F.col(text_col))))
    return (written.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 n_tok.cast("long").alias("n_tokens"))
            .orderBy("shard"))
