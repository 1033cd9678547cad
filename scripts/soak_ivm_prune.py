"""IVM recompute-pruning + insert-only fast-path soak at sf1 (r6/r7).

The r6 run of this soak measured the NEGATIVE result that motivated
the prune cost gate: unsorted bucketed rewrites merge every prior day
into the rewritten files, per-file day stats converge to the full
range (kept_fraction 0.44 for a one-day filter), and the per-file
pruned scan LOSES to the plain dir scan (1.8x) — so the gate declined
and pruning never fired under churn.

r7 closes that loop with bucket-local clustering: every rewrite sorts
each bucket by stats_cols and rolls files at target_file_rows, so the
zone maps stay narrow no matter how often rows are re-merged. This
soak now drives the LAYOUT-DESTROYING pattern explicitly — 8 MIXED
churn batches (updates + inserts across rotating days, each re-merging
every bucket) on top of the 8-day seed — then checks the r7 "done"
bar: the one-day filter keeps <25% of files AND the pruned recompute
BEATS the full dir scan (full path timed FIRST so cold-start bias
favors the baseline). Also still measured: the insert-only fast path
(no source read at all) and exact equality of the final store against
a full re-aggregate of the live rows.

Usage: python scripts/soak_ivm_prune.py   (prints one JSON line,
writes docs/bench_soak_ivm_prune.json; needs .soak/sf1 from
scripts/soak.py)
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
SOAK_SF1 = os.path.join(REPO, ".soak", "sf1")
SRC = os.path.join(REPO, ".soak", "ivm_prune_src")
STORE_ON = os.path.join(REPO, ".soak", "ivm_prune_store_on")
STORE_OFF = os.path.join(REPO, ".soak", "ivm_prune_store_off")
MEASURES = {
    "mx": ("max", "l_extendedprice"),
    "mn": ("min", "l_extendedprice"),
    "u": ("approx_distinct", "l_suppkey"),
}
N_DAYS = 8
N_BUCKETS = 32
N_CHURN = 8
DEL_DAY = 3  # a single-weight day: days 0/7 hold 2x rows in this data,
# so deleting from day 7 makes true selectivity ~25% and the kept
# fraction tracks IT, not the prune quality — day 3 is the honest probe
BATCH_ROWS = 1_000
TARGET_FILE_ROWS = 12_000  # ~half a (bucket, day) run at sf1


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-ivm-prune", cpus="32")
    for d in (SRC, STORE_ON, STORE_OFF):
        if os.path.isdir(d):
            shutil.rmtree(d)

    li = (
        spark.read.parquet(os.path.join(SOAK_SF1, "lineitem.parquet"))
        .withColumn("id", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .select("id", "l_orderkey", "l_suppkey", "l_extendedprice")
    )
    max_ok = li.agg(F.max("l_orderkey")).first()[0]
    li = li.withColumn(
        "day",
        F.least(
            F.floor(F.col("l_orderkey") * N_DAYS / (max_ok + 1)),
            F.lit(N_DAYS - 1),
        ).cast("int"),
    ).select("id", "day", "l_suppkey", "l_extendedprice")
    n_rows = li.count()

    # time-correlated seed: one commit per day, zone maps on day,
    # bucket-local clustering rolled at ~half a (bucket, day) run
    t0 = time.perf_counter()
    for day in range(N_DAYS):
        txn.apply_cdc_batch_bucketed(
            li.filter(F.col("day") == day)
            .withColumn("seq", F.lit(1))
            .withColumn("op", F.lit("I")),
            SRC,
            key_col="id",
            n_buckets=N_BUCKETS,
            stats_cols=["day"],
            target_file_rows=TARGET_FILE_ROWS,
        )
    t_seed = round(time.perf_counter() - t0, 3)

    # 8 MIXED churn batches (the r6 layout-destroying pattern): each
    # updates + inserts rows of one rotating day, re-merging every
    # bucket — without clustering this converged per-file stats to the
    # full day range after a handful of batches
    t0 = time.perf_counter()
    for b in range(N_CHURN):
        day = b % N_DAYS
        upd = (
            li.filter(F.col("day") == day)
            .orderBy("id")
            .limit(BATCH_ROWS)
            .withColumn(
                "l_extendedprice", F.col("l_extendedprice") * 1.01
            )
            .withColumn("seq", F.lit(10 + b))
            .withColumn("op", F.lit("U"))
        )
        ins = (
            li.filter(F.col("day") == day)
            .orderBy("id")
            .limit(BATCH_ROWS)
            # real ids reach ~9.0e9 (l_orderkey*10); synthetic insert ids
            # must be DISJOINT from them or "inserts" silently
            # become cross-day updates (measured: the r6 +2e9 ids
            # collided with real day-1 ids)
            .withColumn("id", F.col("id") + 10_000_000_000 * (b + 1))
            .withColumn("seq", F.lit(10 + b))
            .withColumn("op", F.lit("I"))
        )
        txn.apply_cdc_batch_bucketed(
            upd.unionByName(ins), SRC, key_col="id", n_buckets=N_BUCKETS
        )
    t_churn = round(time.perf_counter() - t0, 3)

    for store in (STORE_ON, STORE_OFF):
        txn.sync_aggregate_from_cdc(spark, SRC, store, ["day"], MEASURES)

    # churn batch: delete rows of ONE day only (touched = {DEL_DAY})
    dels = (
        li.filter(F.col("day") == DEL_DAY)
        .orderBy("id")
        .limit(BATCH_ROWS)
        .select("id")
        .withColumn("day", F.lit(None).cast("int"))
        .withColumn("l_suppkey", F.lit(None).cast("bigint"))
        .withColumn("l_extendedprice", F.lit(None).cast("double"))
        .withColumn("seq", F.lit(50))
        .withColumn("op", F.lit("D"))
    )
    txn.apply_cdc_batch_bucketed(
        dels, SRC, key_col="id", n_buckets=N_BUCKETS, stats_cols=["day"]
    )
    sel_rows = txn.read_cdc_table(spark, SRC).filter(
        F.col("day") == DEL_DAY
    ).count()
    rep = txn.cdc_prune_report(
        spark, SRC, [("day", "in", [DEL_DAY])]
    )

    # full path FIRST (it absorbs the cold-start costs: shuffle files,
    # codegen, page cache), pruned second — any bias favors the
    # baseline, so a reported prune win is real
    pruned_calls = []
    real_scan = txn.scan_cdc_pruned
    txn.scan_cdc_pruned = lambda *a, **k: (
        pruned_calls.append(a[2]), real_scan(*a, **k)
    )[1]
    t0 = time.perf_counter()
    txn.sync_aggregate_from_cdc(
        spark, SRC, STORE_OFF, ["day"], MEASURES, prune_recompute=False
    )
    t_sync_full = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    txn.sync_aggregate_from_cdc(spark, SRC, STORE_ON, ["day"], MEASURES)
    t_sync_pruned = round(time.perf_counter() - t0, 3)
    txn.scan_cdc_pruned = real_scan

    # insert-only window: new rows for day 0 → merge, no source read
    ins = (
        li.filter(F.col("day") == 0)
        .orderBy("id")
        .limit(BATCH_ROWS)
        .withColumn("id", F.col("id") + 100_000_000_000)
        .withColumn("seq", F.lit(60))
        .withColumn("op", F.lit("I"))
    )
    txn.apply_cdc_batch_bucketed(
        ins, SRC, key_col="id", n_buckets=N_BUCKETS, stats_cols=["day"]
    )
    t0 = time.perf_counter()
    txn.sync_aggregate_from_cdc(spark, SRC, STORE_ON, ["day"], MEASURES)
    t_sync_insert_only = round(time.perf_counter() - t0, 3)

    # correctness: pruned store == full re-aggregate of live rows
    txn.sync_aggregate_from_cdc(
        spark, SRC, STORE_OFF, ["day"], MEASURES, prune_recompute=False
    )
    live = txn.read_cdc_table(spark, SRC)
    expect = {
        r.day: (r.mx, r.mn, r.u)
        for r in live.groupBy("day")
        .agg(
            F.max("l_extendedprice").alias("mx"),
            F.min("l_extendedprice").alias("mn"),
            F.countDistinct("l_suppkey").alias("u"),
        )
        .collect()
    }
    ok = True
    for store in (STORE_ON, STORE_OFF):
        got = {
            r.day: (r.mx, r.mn, r.u)
            for r in txn.read_aggregate_store(
                spark, store, measures=MEASURES
            ).collect()
        }
        for day, (mx, mn, u) in expect.items():
            g = got.get(day)
            if g is None or g[0] != mx or g[1] != mn:
                ok = False
            # HLL estimate: ±2% at these cardinalities
            elif abs(g[2] - u) > max(2, 0.02 * u):
                ok = False

    out = {
        "metric": "ivm prune soak (sf1, 8-day ingest + 8 mixed churn)",
        "rows": n_rows,
        "n_days": N_DAYS,
        "n_churn": N_CHURN,
        "batch_rows": BATCH_ROWS,
        "target_file_rows": TARGET_FILE_ROWS,
        "seed_sec": t_seed,
        "churn_sec": t_churn,
        "kept_files": rep["kept_files"],
        "total_files": rep["total_files"],
        "kept_fraction": round(rep["kept_files"] / rep["total_files"], 3),
        "kept_rows_fraction": round(
            rep["kept_rows"] / rep["total_rows"], 3
        ),
        "true_selectivity": round(sel_rows / rep["total_rows"], 3),
        "prune_gate_engaged": bool(pruned_calls),
        "sync_delete_pruned_sec": t_sync_pruned,
        "sync_delete_full_sec": t_sync_full,
        "sync_insert_only_sec": t_sync_insert_only,
        "speedup_prune": round(t_sync_full / t_sync_pruned, 2),
        "store_matches_full_reaggregate": ok,
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_soak_ivm_prune.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
