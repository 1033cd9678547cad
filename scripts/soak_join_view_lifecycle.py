"""Join-view STORE LIFECYCLE soak (r10, VERDICT r9 #4): 50 sync cycles
of churn against a sync_join_from_cdc store, with periodic maintenance
(tombstone compaction + vacuum), checking that the store's physical
health stays BOUNDED and its content stays EXACT.

Why this soak exists: every churned key that loses its join row writes
a tombstone into the store, and every sync commits a new version — so
an unmaintained store grows monotonically in (a) data files (each sync
adds per-touched-bucket dirs), (b) tombstone rows, and (c) superseded
snapshots. The maintenance ops existed; what was unverified is that
they apply cleanly to a store whose seq column is the PACKED TWO-VERSION
CURSOR (_mv_seq) and whose epoch guard drives replay skipping:
compaction must retire tombstones without disturbing the cursor,
vacuum must not collect the snapshot the cursor points at, and the next
sync after maintenance must keep maintaining incrementally (no silent
full rebuild, no replay confusion).

Measured per the r10 "done" bar:

- 50 sync cycles (500-key churn each, mixed deletes/updates, rotating
  buckets) with maintenance every 10 cycles;
- store health at every maintenance point: LIVE file count (files the
  latest manifest references) bounded under 3x the post-seed count,
  TOTAL on-disk count plateauing (the excess is keep_last=2 retention
  policy, not growth), tombstones retired to 0 at each compaction;
- final checksum vs a from-scratch rebuild of the view;
- cursor survival: a replayed sync no-ops after every maintenance op.

Also carries the r10 pruned-read row (VERDICT r9 #5): kept-file
fraction + equality for read_cdc_table(filters=) over the date-sliced
left source.

Usage: python scripts/soak_join_view_lifecycle.py
(one JSON line, writes docs/bench_soak_join_view_lifecycle.json)
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
N = 1_000_000
N_BUCKETS = 32
CHURN = 500
CYCLES = 50
MAINT_EVERY = 10


def count_files(d: str) -> int:
    n = 0
    for _, _, files in os.walk(d):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def live_files(spark, d: str) -> int:
    """Files the LATEST manifest actually references — the health
    metric that must stay bounded. Total on-disk count additionally
    holds the history vacuum's keep_last policy retains (a previous
    snapshot chain), which plateaus but is policy, not growth."""
    df = txn.read_txn(spark, d)
    return len(df.inputFiles()) if df is not None else 0


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-jvlc", cpus="32")
    base = os.path.join(REPO, ".soak", "jv_lifecycle")
    left, right = f"{base}-l", f"{base}-r"
    store, rebuild = f"{base}-mv", f"{base}-mv-rebuild"
    for d in (left, right, store, rebuild):
        shutil.rmtree(d, ignore_errors=True)

    # left side carries a day column + zone maps so the pruned-read arm
    # rides the same fixture (date-correlated: day = id // (N/8))
    days = 8
    rows_l = spark.range(N).select(
        F.col("id"),
        (F.col("id") / (N // days)).cast("int").alias("day"),
        F.md5(F.col("id").cast("string")).alias("pay_l"),
        F.lit(1).alias("seq"), F.lit("I").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(
        rows_l, left, n_buckets=N_BUCKETS, stats_cols=["day"],
        target_file_rows=N // N_BUCKETS // days,
    )
    rows_r = spark.range(N).select(
        F.col("id"),
        F.md5(F.concat(F.lit("r"), F.col("id").cast("string"))).alias(
            "pay_r"
        ),
        F.lit(1).alias("seq"), F.lit("I").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(rows_r, right, n_buckets=N_BUCKETS)

    out: dict = {
        "metric": "join-view store lifecycle soak",
        "n_rows_per_side": N,
        "n_buckets": N_BUCKETS,
        "cycles": CYCLES,
        "churn_keys": CHURN,
        "maintenance_every": MAINT_EVERY,
    }
    t0 = time.perf_counter()
    txn.sync_join_from_cdc(spark, left, right, store)
    out["cold_sync_sec"] = round(time.perf_counter() - t0, 2)
    files_seed = live_files(spark, store)
    out["store_live_files_after_seed"] = files_seed

    health: list[dict] = []
    sync_secs: list[float] = []
    maint_secs: list[float] = []
    seq = 2
    for cyc in range(1, CYCLES + 1):
        # churn localized to 2 rotating buckets: D on ~20%, U on the rest
        b = cyc % N_BUCKETS
        batch = (
            spark.range(N)
            .filter(
                (txn._bucket_of("id", N_BUCKETS) == b)
                | (txn._bucket_of("id", N_BUCKETS) == (b + 1) % N_BUCKETS)
            )
            .limit(CHURN)
            .select(
                "id",
                (F.col("id") % days).cast("int").alias("day"),
                F.md5(F.concat(F.lit(f"c{cyc}"), F.col("id").cast("string")))
                .alias("pay_l"),
                F.lit(seq).alias("seq"),
                F.when(F.col("id") % 5 == 0, "D").otherwise("U").alias("op"),
            )
        )
        txn.apply_cdc_batch_bucketed(batch, left, n_buckets=None)
        seq += 1
        t0 = time.perf_counter()
        txn.sync_join_from_cdc(spark, left, right, store)
        sync_secs.append(time.perf_counter() - t0)

        if cyc % MAINT_EVERY == 0:
            man = txn.latest_manifest(spark, store)
            cursor = man["epoch_id"]
            raw = txn.read_cdc_table(spark, store, include_tombstones=True)
            tombs_before = raw.filter(F.col("_deleted")).count()
            live = raw.filter(~F.col("_deleted")).count()
            t0 = time.perf_counter()
            txn.compact_cdc_tombstones(
                spark, store, min_live_seq=cursor + 1, seq_col="_mv_seq"
            )
            txn.vacuum_txn(spark, store, keep_last=2)
            maint_secs.append(time.perf_counter() - t0)
            man2 = txn.latest_manifest(spark, store)
            raw2 = txn.read_cdc_table(spark, store, include_tombstones=True)
            health.append(
                {
                    "cycle": cyc,
                    "live_rows": live,
                    "tombstones_before_compact": tombs_before,
                    "tombstones_after_compact": raw2.filter(
                        F.col("_deleted")
                    ).count(),
                    "store_files_total": count_files(store),
                    "store_files_live": live_files(spark, store),
                    "cursor_preserved": man2["epoch_id"] == cursor,
                    "replay_noop": txn.sync_join_from_cdc(
                        spark, left, right, store
                    )
                    is None,
                }
            )

    out["health"] = health
    out["sync_sec_median"] = round(sorted(sync_secs)[len(sync_secs) // 2], 2)
    out["sync_sec_max"] = round(max(sync_secs), 2)
    out["maint_sec_median"] = round(
        sorted(maint_secs)[len(maint_secs) // 2], 2
    )
    out["store_files_total_final"] = count_files(store)
    out["store_files_live_final"] = live_files(spark, store)
    # live files bounded (compaction re-materializes every bucket, so
    # post-maintenance live count returns to ~n_buckets); the TOTAL
    # on-disk count must PLATEAU (keep_last retention is policy, not
    # growth): the last maintenance window's delta under 20%
    out["live_files_bounded"] = all(
        h["store_files_live"] <= 3 * max(files_seed, 1) for h in health
    )
    totals = [h["store_files_total"] for h in health]
    out["total_files_plateau"] = (
        len(totals) < 2
        or (totals[-1] - totals[-2]) <= max(1, int(0.2 * totals[-2]))
    )
    out["tombstones_bounded"] = all(
        h["tombstones_after_compact"] == 0 for h in health
    )
    out["cursor_always_preserved"] = all(
        h["cursor_preserved"] and h["replay_noop"] for h in health
    )

    # exactness after 50 cycles + 5 maintenance rounds
    t0 = time.perf_counter()
    txn.sync_join_from_cdc(spark, left, right, rebuild)
    out["full_rebuild_sec"] = round(time.perf_counter() - t0, 2)

    def chk(d):
        return (
            txn.read_join_store(spark, d)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("id", "pay_l", "pay_r")).alias("c"),
            )
            .collect()[0]
        )

    a, b = chk(store), chk(rebuild)
    out["rows"] = a.n
    out["store_equals_rebuild"] = (a.n, a.c) == (b.n, b.c)

    # --- pruned-read arm (VERDICT r9 #5): one-day filter over the
    # churned left source through the USER face ---------------------
    filters = [("day", "=", 3)]
    rep = txn.cdc_prune_report(spark, left, filters)
    out["pruned_read_kept_files"] = rep["kept_files"]
    out["pruned_read_total_files"] = rep["total_files"]
    out["pruned_read_kept_fraction"] = round(
        rep["kept_files"] / max(rep["total_files"], 1), 3
    )
    from taar_gcp_etl_spark.layout import _residual

    t0 = time.perf_counter()
    pruned = txn.read_cdc_table(spark, left, filters=filters)
    n_pruned = pruned.count()
    out["pruned_read_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    plain = txn.read_cdc_table(spark, left).filter(_residual(filters))
    n_plain = plain.count()
    out["plain_read_sec"] = round(time.perf_counter() - t0, 2)
    out["pruned_read_exact"] = n_pruned == n_plain

    path = os.path.join(REPO, "docs", "bench_soak_join_view_lifecycle.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
