"""Incremental JOIN-view soak (r9): sync_join_from_cdc's O(touched
keys) maintenance vs a full re-join, at 4M rows per side.

Fixture: two 4M-row bucketed CDC tables (n_buckets=32, shared key
domain). Measured:

- cold sync (the full bucket-aligned join materialization);
- a 1000-key churn batch on the left followed by the INCREMENTAL sync —
  the probes must be bucket-pruned (O(touched buckets)), so its cost
  tracks the churn, not the 4M-row sides;
- a full REBUILD into a fresh store dir (what a non-incremental engine
  pays per refresh);
- exactness: the incrementally-maintained store checksum-equals the
  rebuild.

The honest claim is the RATIO (incremental vs rebuild) plus exactness;
local wall-clock is page-cache bound (r5 lesson) so absolute seconds
are illustrative only.

Usage: python scripts/soak_sync_join.py  (one JSON line, writes
docs/bench_soak_sync_join.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from taar_gcp_etl_spark import txn  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 4_000_000
N_BUCKETS = 32
CHURN = 1_000


def build(spark, side: str, t: str) -> None:
    if txn.latest_manifest(spark, t) is not None:
        return
    shutil.rmtree(t, ignore_errors=True)
    rows = spark.range(N).select(
        F.col("id"),
        F.md5(F.concat(F.lit(side), F.col("id").cast("string"))).alias(
            f"pay_{side}"
        ),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(rows, t, n_buckets=N_BUCKETS)


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-sjoin", cpus="32")
    base = os.path.join(REPO, ".soak", "sync_join")
    left, right = f"{base}-l", f"{base}-r"
    store, rebuild = f"{base}-mv", f"{base}-mv-rebuild"
    # fresh store each run so the soak always measures the same work
    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(rebuild, ignore_errors=True)
    build(spark, "l", left)
    build(spark, "r", right)

    out: dict = {
        "metric": "incremental join-view soak",
        "n_rows_per_side": N,
        "n_buckets": N_BUCKETS,
        "churn_keys": CHURN,
    }
    t0 = time.perf_counter()
    txn.sync_join_from_cdc(spark, left, right, store)
    out["cold_sync_sec"] = round(time.perf_counter() - t0, 2)

    # churn arm 1 — SPREAD (worst case): CHURN keys at stride N/CHURN
    # hash into EVERY bucket, so the store apply must rewrite all 32
    # touched buckets — the write prune buys nothing and the honest
    # cost is a full-store-size rewrite plus merge overhead
    seq = txn.latest_manifest(spark, left)["version"] + 1
    churn_rows = spark.range(CHURN).select(
        (F.col("id") * (N // CHURN)).alias("id"),
        F.md5(F.col("id").cast("string")).alias("pay_l"),
        F.lit(seq).alias("seq"),
        F.when(F.col("id") % 100 == 0, "D").otherwise("U").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(churn_rows, left, n_buckets=None)

    t0 = time.perf_counter()
    txn.sync_join_from_cdc(spark, left, right, store)
    out["incremental_spread_sec"] = round(time.perf_counter() - t0, 2)
    out["incremental_sync_sec"] = out["incremental_spread_sec"]

    # churn arm 2 — BUCKET-LOCALIZED: CHURN keys all hashing into ONE
    # bucket; probes read 1/32 of each side and the store apply
    # rewrites one bucket — the O(touched buckets) regime the layout
    # is designed for (real churn is usually key- or time-correlated)
    seq += 1
    one_bucket = (
        spark.range(N)
        .filter(txn._bucket_of("id", N_BUCKETS) == 5)
        .limit(CHURN)
        .select(
            "id",
            F.md5(F.concat(F.lit("v2"), F.col("id").cast("string")))
            .alias("pay_l"),
            F.lit(seq).alias("seq"),
            F.lit("U").alias("op"),
        )
    )
    txn.apply_cdc_batch_bucketed(one_bucket, left, n_buckets=None)
    t0 = time.perf_counter()
    txn.sync_join_from_cdc(spark, left, right, store)
    out["incremental_one_bucket_sec"] = round(
        time.perf_counter() - t0, 2
    )

    t0 = time.perf_counter()
    txn.sync_join_from_cdc(spark, left, right, rebuild)
    out["full_rebuild_sec"] = round(time.perf_counter() - t0, 2)
    out["speedup_incremental_over_rebuild"] = round(
        out["full_rebuild_sec"] / max(out["incremental_sync_sec"], 1e-9),
        2,
    )

    chk = lambda d: txn.read_join_store(spark, d).agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum(F.xxhash64("id", "pay_l", "pay_r")).alias("c"),
    ).collect()[0]
    a, b = chk(store), chk(rebuild)
    out["rows"] = a.n
    out["store_equals_rebuild"] = (a.n, a.c) == (b.n, b.c)

    # streaming arm: the stream_sync_join wrapper over the same 4M-row
    # sides — measures the commit-stream trigger's end-to-end latency
    # (commit lands -> store synced) for a bucket-localized churn batch,
    # against the batch sync's wall for the same work above. The wrapper
    # adds only two manifest-JSON file-stream listings per trigger, so
    # the delta IS the trigger plumbing.
    from taar_gcp_etl_spark.streaming.jobs import stream_sync_join

    smv = f"{base}-smv"
    ckpt = f"{base}-ckpt"
    shutil.rmtree(smv, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = stream_sync_join(spark, left, right, smv, ckpt)
    try:
        t0 = time.perf_counter()
        q.processAllAvailable()  # cold trigger: full seed
        out["stream_cold_sync_sec"] = round(time.perf_counter() - t0, 2)
        seq += 1
        churn2 = (
            spark.range(N)
            .filter(txn._bucket_of("id", N_BUCKETS) == 7)
            .limit(CHURN)
            .select(
                "id",
                F.md5(F.concat(F.lit("v3"), F.col("id").cast("string")))
                .alias("pay_l"),
                F.lit(seq).alias("seq"),
                F.lit("U").alias("op"),
            )
        )
        txn.apply_cdc_batch_bucketed(churn2, left, n_buckets=None)
        t0 = time.perf_counter()
        q.processAllAvailable()  # commit -> synced, one trigger
        out["stream_incremental_one_bucket_sec"] = round(
            time.perf_counter() - t0, 2
        )
    finally:
        q.stop()
    s = txn.read_join_store(spark, smv).agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("id", "pay_l", "pay_r")).alias("c"),
    ).collect()[0]
    truth = txn.read_cdc_table(spark, left).join(
        txn.read_cdc_table(spark, right)
        .withColumnsRenamed({"seq": "seq_r"}),
        "id",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("id", "pay_l", "pay_r")).alias("c"),
    ).collect()[0]
    out["stream_store_equals_live_join"] = (s.n, s.c) == (truth.n, truth.c)

    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_soak_sync_join.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
