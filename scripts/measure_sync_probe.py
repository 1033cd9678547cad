"""VERDICT r10 #7 measurement — is zone-map pruning INSIDE the
sync_join probe worth building? (measure before building)

The incremental join-view probe reads the touched BUCKETS in full
(read_txn(buckets=...)) then semi-joins the touched keys. A zone-map
composition would additionally skip files inside touched buckets when
the key column carries stats (key-envelope prune — the only
automatically-SOUND variant: churned keys' min/max bound what the
semi-join can keep, with no caller-trust contract; a date-column prune
would need the caller to assert date-correlation of the STORED rows,
which the layer cannot check).

This script measures, on a 4M-row bucketed side with stats_cols=["id"]
(key-clustered files) and a 1000-recent-key churn:

1. the metadata-level saving: rows in the touched buckets vs rows in
   the kept (key-envelope-overlapping) files of those buckets;
2. probe wall: full-bucket read + semi-join vs pruned read + semi-join
   (alternating arms x3, medians — single-shot ordering on this box
   swings 3-5x);
3. a full sync_join_from_cdc cycle wall for the same churn, to place
   the probe saving in context (two sides' probes + join + MERGE into
   the store + CDF reads + commit).

Decision rule: if the probe-side saving is a small fraction of the
sync cycle, the composition is a documented negative result.

Usage: python scripts/measure_sync_probe.py  (one JSON line, writes
docs/bench_sync_probe_measure.json)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
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


def wide_payload(tag, col):
    return F.concat(*[
        F.md5(F.concat(F.lit(f"{tag}{i}"), col.cast("string")))
        for i in range(4)
    ])


def build(spark, t: str, tag: str) -> None:
    shutil.rmtree(t, ignore_errors=True)
    rows = spark.range(N).select(
        F.col("id"),
        wide_payload(tag, F.col("id")).alias(f"p_{tag}"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(
        rows, t, n_buckets=N_BUCKETS,
        stats_cols=["id"], target_file_rows=25_000,
    )


def main() -> None:
    spark = get_spark(app_name="measure-sync-probe", cpus="32")
    left = os.path.join(REPO, ".soak", "msp_left")
    right = os.path.join(REPO, ".soak", "msp_right")
    store = os.path.join(REPO, ".soak", "msp_store")
    build(spark, left, "l")
    build(spark, right, "r")
    shutil.rmtree(store, ignore_errors=True)

    # recent-key churn: ids in the top 1% of the key range — the
    # key-correlated shape the envelope prune exploits
    lo, hi = N - 40_000, N - 40_000 + CHURN
    churn = spark.range(lo, hi).select(
        F.col("id"),
        wide_payload("l2", F.col("id")).alias("p_l"),
        F.lit(2).cast("long").alias("seq"),
        F.lit("I").alias("op"),
    )

    man = txn.latest_manifest(spark, left)
    nb = man["n_buckets"]
    keys = spark.range(lo, hi).select("id")
    touched = [
        r[0] for r in keys.select(
            txn._bucket_of("id", nb).alias("_b")
        ).distinct().collect()
    ]

    # 1. metadata-level rows saving inside the touched buckets
    plan = txn._cdc_prune_plan(
        man, left, [("id", "between", (lo, hi - 1))]
    )
    bucket_rows = N // N_BUCKETS * len(touched)  # uniform keys
    out = {
        "metric": "sync_join probe prune measurement",
        "n_rows_side": N,
        "churn_keys": CHURN,
        "touched_buckets": len(touched),
        "rows_touched_buckets": bucket_rows,
        "kept_rows_metadata": plan["kept_rows"],
        "probe_rows_ratio": round(
            bucket_rows / max(plan["kept_rows"], 1), 1
        ),
    }

    # 2. probe wall, alternating x3 each
    def probe_full() -> float:
        t0 = time.perf_counter()
        txn.read_txn(spark, left, buckets=touched).join(
            F.broadcast(keys), "id", "left_semi"
        ).agg(F.count("*")).collect()
        return time.perf_counter() - t0

    def probe_pruned() -> float:
        t0 = time.perf_counter()
        txn.scan_cdc_pruned(
            spark, left, [("id", "between", (lo, hi - 1))],
            man=man, raw=True,
        ).join(F.broadcast(keys), "id", "left_semi").agg(
            F.count("*")
        ).collect()
        return time.perf_counter() - t0

    probe_full(); probe_pruned()  # warmup pair, discarded
    fulls, pruneds = [], []
    for _ in range(3):
        fulls.append(probe_full())
        pruneds.append(probe_pruned())
    out["probe_full_sec"] = round(statistics.median(fulls), 3)
    out["probe_pruned_sec"] = round(statistics.median(pruneds), 3)

    # 3. one full incremental sync cycle for context
    txn.sync_join_from_cdc(spark, left, right, store)  # cold sync
    txn.apply_cdc_batch_bucketed(churn, left, n_buckets=None)
    t0 = time.perf_counter()
    txn.sync_join_from_cdc(spark, left, right, store)
    out["sync_cycle_sec"] = round(time.perf_counter() - t0, 2)
    out["probe_saving_share_of_cycle"] = round(
        max(out["probe_full_sec"] - out["probe_pruned_sec"], 0)
        * 2  # two sides probe
        / max(out["sync_cycle_sec"], 1e-9),
        4,
    )

    for d in (left, right, store):
        shutil.rmtree(d, ignore_errors=True)
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_sync_probe_measure.json"), "w"
    ) as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
