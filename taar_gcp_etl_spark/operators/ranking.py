"""Grouped counts, top-k, and pair-count operators.

Reference parity:
  A1  install ranking: GROUP BY key, COUNT(id)
      (reference: taar_etl/taar_lite_guid_ranking.py:19-27)
  O2  implicit top-k contract (only_guids_top_200.json,
      taar_etl/taar_update_whitelist.py:19)
  §2.10 grouped top-k per locale (top10_dict.json, README.md:102-105) and
      coinstallation pair counts (guid_coinstallation.json, README.md:108-113)

Scale notes: all of these are single-shuffle hash aggregates; Catalyst
plans partial (map-side) aggregation before the exchange, so the shuffle
carries one row per (partition × key), not per input row. Grouped top-k
shuffles once on the partition key; coinstallation self-joins on the
already-aggregated distinct (user, item) pairs, which is orders of magnitude
smaller than the raw event stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_count(
    df: DataFrame, key: str | Column, count_col: str, alias: str = "install_count"
) -> DataFrame:
    """A1 — `SELECT key, count(x) FROM t GROUP BY key`
    (taar_etl/taar_lite_guid_ranking.py:19-27)."""
    return df.groupBy(key).agg(F.count(count_col).alias(alias))


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O2 — TakeOrdered: Spark plans orderBy+limit as a per-partition top-k
    followed by a single-reducer merge of k rows — no global sort at scale.
    Callers must pass a total order (include a unique tiebreaker) so results
    are deterministic."""
    return df.orderBy(*order).limit(k)


def grouped_top_k(
    df: DataFrame,
    partition_col: str,
    order: list[Column],
    k: int,
    rank_alias: str = "rnk",
) -> DataFrame:
    """§2.10 — top-k per group (taar_locale top10_dict.json contract,
    README.md:102-105): window row_number ≤ k. One shuffle on the partition
    key; rank is computed within each partition without materializing a
    global sort."""
    w = Window.partitionBy(partition_col).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def _coinstall_membership(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None,
) -> DataFrame:
    """Distinct (group, item) membership, optionally dropping groups with
    more than `max_group_size` items — the hot-key guard both coinstall
    operators share. A group's self-join fan-out is quadratic in its
    size, so one pathological client (a bot with 10k 'addons') costs
    10⁸ candidate pairs; a group that hot is automation, not
    co-installation signal. The windowed count is one pass and its
    group-key exchange is exactly the partitioning the self-join wants
    (same argument as dedup.drop_hot_bands)."""
    memb = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if max_group_size is None:
        return memb
    w = Window.partitionBy("g")
    return (
        memb.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") <= max_group_size)
        .drop("_n")
    )


def coinstall_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """§2.10 — coinstallation pair counts (guid_coinstallation.json contract,
    README.md:108-113): for each group (client), every unordered pair of
    distinct items it contains, counted across groups.

    Plan shape: distinct (group, item) first — this is the big shuffle and it
    shrinks the data to one row per membership — then an equi self-join on
    the group key with an `<` predicate to emit each unordered pair once.
    AQE handles skewed groups; at 100 TB, items/group is bounded (addons per
    client) — and `max_group_size` enforces that bound against adversarial
    clients (see _coinstall_membership).
    """
    pairs = _coinstall_membership(df, group_col, item_col, max_group_size)
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").alias("pair_count"))
    )


def coinstall_rates(
    df: DataFrame,
    group_col: str,
    item_col: str,
    round_to: int = 6,
    max_group_size: int | None = None,
) -> DataFrame:
    """§2.10 — the actual guid_coinstallation.json contract: conditional
    rates P(item_b | item_a) over ORDERED pairs (README.md:108-113 — 'rate
    of other addons that are installed along side each addon').

    rate(a→b) = groups containing both a and b / groups containing a.
    The denominator table is small (one row per item) → broadcast join onto
    the pair counts; no second shuffle of the pair table. The raw pair_count
    rides along in the output, so this one query also carries the
    pair-counts contract (coinstall_pairs is its unordered projection).
    `max_group_size` is the hot-client guard (_coinstall_membership)."""
    memb = _coinstall_membership(df, group_col, item_col, max_group_size)
    a, b = memb.alias("a"), memb.alias("b")
    ordered_pairs = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").alias("pair_count"))
    )
    item_counts = memb.groupBy(F.col("item").alias("item_a")).agg(
        F.count("*").alias("a_count")
    )
    return ordered_pairs.join(F.broadcast(item_counts), "item_a").select(
        "item_a",
        "item_b",
        "pair_count",
        F.round(F.col("pair_count") / F.col("a_count"), round_to).alias("rate"),
    )
