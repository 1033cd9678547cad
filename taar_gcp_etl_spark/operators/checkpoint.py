"""Tracked eager localCheckpoint with EXPLICIT block release.

Why this exists (guide §5 "unpersist when done", VERDICT r12 #3):
`DataFrame.localCheckpoint(eager=True)` persists the materialized RDD
through the SparkContext (it appears in ``sc.getPersistentRDDs``), but
it does NOT register with the SQL CacheManager, so there is no
DataFrame-level API to free it. Dropping the Python reference only
releases the blocks when the JVM's ContextCleaner processes the weak
reference — which requires an actual JVM GC cycle. On a large heap
(local[32] / 48 GiB here; any long-lived executor in production) full
GCs are rare, so every superseded iteration of an iterative operator
(connected components: up to 3 checkpoints x 30 rounds; pagerank,
BFS, label propagation: one per round) leaks its MEMORY_AND_DISK
blocks into the unified memory manager for the rest of the session.
Across a 135-query suite that storage-state accumulation is exactly
the late-suite inflation the r12 round measured (als_neighbors 9.05 s
in-suite vs 1.42 s fresh-JVM, same HEAD); at 100 TB it is an executor
OOM. The fix is explicit lifecycle management: track which persistent
RDD ids a checkpoint created, and release them the moment the next
generation has materialized.

The tracking is a persistent-RDD-id diff around the checkpoint call —
safe because the driver is single-threaded within an operator (Spark
actions inside the eager checkpoint do not register new persistent
RDDs concurrently)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _persistent_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently registered persistent with the
    SparkContext (includes localCheckpoint RDDs and raw persists; SQL
    CacheManager-backed caches appear once materialized)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    out: set[int] = set()
    while it.hasNext():
        out.add(int(it.next().getKey()))
    return out


def checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, frozenset[int]]:
    """Eager localCheckpoint + the persistent-RDD ids it registered, for
    a later `release_rdds` once the checkpoint is superseded."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=True)
    return out, frozenset(_persistent_ids(spark) - before)


def release_rdds(spark: SparkSession, ids) -> None:
    """Unpersist (non-blocking) the persistent RDDs with the given ids.
    Iterates the live map rather than Map.get so py4j's int boxing can
    never miss an Integer key; ids already released are skipped."""
    if not ids:
        return
    want = {int(i) for i in ids}
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    victims = []
    while it.hasNext():
        e = it.next()
        if int(e.getKey()) in want:
            victims.append(e.getValue())
    for rdd in victims:
        rdd.unpersist(False)
