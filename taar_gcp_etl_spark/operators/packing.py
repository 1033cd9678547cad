"""Sequence packing — assign documents to fixed-length training sequences.

LLM pretraining consumes documents concatenated in a deterministic order and
chunked into fixed-length sequences (e.g. 2048 tokens); the packing map
(doc → sequence id / offset) is what a data loader needs to slice the right
tokens. The core of the computation is a GLOBAL prefix sum of token counts
in document order — the textbook anti-pattern is an unpartitioned ordered
window over doc_id, which funnels 100 TB through a single task.

This module computes the prefix sum with the classic two-phase distributed
scan instead (`distributed_prefix_sum`, also the engine of the
token-budget selector in operators/sampling.py):

1. range-partition the narrow (key, value) projection by the order keys
   (so partition p holds a contiguous key range and all of partition p's
   keys precede partition p+1's),
2. cumulative-sum WITHIN each partition (a partitioned window — parallel),
3. aggregate one total per partition (tiny: #partitions rows), prefix-sum
   those on the driver, and broadcast-join the per-partition base offsets
   back.

Only the narrow projection shuffles; the driver handles #partitions
integers. Every step is Catalyst-planned (no Python row path).

reference analog: none — the reference ships profiles to a serving store
(taar_etl/taar_profile_bigtable.py) rather than packing tokens; this is
part of the LLM-training-data surface layered on top of its ETL shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from taar_gcp_etl_spark.functions import tokens


def distributed_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str | Column],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global prefix sum of `value_col` in `order_cols` order:
    adds `cum_before` = sum of value over all strictly-preceding rows.
    `order_cols` must be a total order (add a unique tiebreak column).

    Two-phase distributed scan (see module docstring) — no global-window
    single-task funnel. The returned plan reads a persisted intermediate
    (the scanned projection is consumed twice: partition totals + the
    final join); the CALLER owns eviction via spark.catalog.clearCache()
    or by materializing the result (same convention as the persisted LSH
    signature relation in operators/dedup.py)."""
    spark = df.sparkSession
    if num_partitions is not None:
        ranged = df.repartitionByRange(num_partitions, *order_cols)
    else:
        ranged = df.repartitionByRange(*order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    # Phase 2: per-partition running sum (parallel — every window has a
    # partition key, never a global orderBy).
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from pyspark import StorageLevel

    local = with_pid.withColumn(
        "_local_cum", F.sum(value_col).over(w)
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # Phase 3: one total per partition → driver-side prefix → broadcast
    # back. Range partitioning guarantees pid order == order_cols order.
    totals = (
        local.groupBy("_pid")
        .agg(F.max("_local_cum").alias("_ptotal"))
        .collect()
    )
    base, offsets = 0, []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], base))
        base += row["_ptotal"]
    offset_df = spark.createDataFrame(offsets, "_pid INT, _base BIGINT")

    return (
        local.join(F.broadcast(offset_df), "_pid")
        .withColumn(
            "cum_before",
            F.col("_base") + F.col("_local_cum") - F.col(value_col),
        )
        .drop("_pid", "_local_cum", "_base")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    shuffle: bool = False,
) -> DataFrame:
    """Concat-then-chunk packing: documents are laid end-to-end in `id_col`
    order and sliced every `seq_len` tokens. Each doc is assigned the
    sequence containing its FIRST token; docs longer than the remaining
    room span into subsequent sequences (`n_seqs_spanned`).

    `shuffle=True` packs in DETERMINISTIC PSEUDO-RANDOM global order
    (xxhash64(id), id) instead of id order: crawl-ordered corpora are
    domain-correlated, so id-order packing fills each training sequence
    with near-neighbor documents — hash order is the distributed,
    reproducible equivalent of a global random permutation (same two-phase
    scan, the range partitioning just keys on the hash; no extra pass,
    and a re-run still reproduces byte-identical shard membership).

    Returns (id_col, n_tokens, tokens_before, seq_id, offset_in_seq,
    n_seqs_spanned) where `tokens_before` is the exact global prefix sum.
    """
    # NULL text contributes 0 tokens: under ANSI-off, size(NULL array) is
    # -1, which would silently shift the prefix sum of every later doc
    counts = docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(tokens(text_col)))
        .alias("n_tokens"),
    )
    # the global packing order: id, or (hash, id) for shuffled packing —
    # the hash tiebreak on id keeps the order total (collisions possible)
    if shuffle:
        counts = counts.withColumn("_ord", F.xxhash64(F.col(id_col)))
        order_cols = ["_ord", id_col]
    else:
        order_cols = [id_col]

    summed = distributed_prefix_sum(
        counts, "n_tokens", order_cols, num_partitions
    )

    tokens_before = F.col("cum_before")
    last_token = tokens_before + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    seq_id = F.floor(tokens_before / seq_len)
    return summed.select(
        id_col,
        "n_tokens",
        tokens_before.alias("tokens_before"),
        seq_id.alias("seq_id"),
        (tokens_before % seq_len).alias("offset_in_seq"),
        (F.floor(last_token / seq_len) - seq_id + 1).alias(
            "n_seqs_spanned"
        ),
    )
