"""Incremental-view-maintenance soak at sf1: is the CDF-driven sync
actually cheaper than re-aggregating, and by how much?

Builds a bucketed CDC fact table from the 10x lineitem (6M rows keyed
by (l_orderkey, l_linenumber) -> surrogate id), materializes a
per-partkey aggregate store, then applies a small CDC batch (~0.1% of
rows: updates + deletes + inserts) and measures:

1. apply_cdc_batch_bucketed wall-clock (the partition-pruned ingest);
2. sync_aggregate_from_cdc wall-clock (retraction path: sum/count);
3. the full-re-aggregate baseline (groupBy over all live rows +
   store rewrite) — what a view WITHOUT incremental maintenance pays;
4. correctness: the synced store equals the full re-aggregate exactly.

The interesting ratio is (3)/(2): it should grow with table size over
batch size, because the sync reads only changed buckets + the store
while the baseline scans everything. At 100 TB with daily 0.1% churn
that ratio is the difference between a view you refresh hourly and one
you cannot afford to refresh at all.

Usage: python scripts/soak_ivm.py   (prints one JSON line, writes
docs/bench_soak_ivm.json; needs .soak/sf1 from scripts/soak.py)
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
from taar_gcp_etl_spark.operators.merge import _measure_agg  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# scale knob: sf1 (6M rows) by default; pass --sf10 for the 60M-row
# slope point (sync cost must stay FLAT while full refresh grows ~10x)
SCALE = "sf10" if "--sf10" in sys.argv else "sf1"
SOAK_SF1 = os.path.join(REPO, ".soak", SCALE)
SRC = os.path.join(REPO, ".soak", f"ivm_src_{SCALE}")
STORE = os.path.join(REPO, ".soak", f"ivm_store_{SCALE}")
MEASURES = {"revenue": ("sum", "l_extendedprice"), "n": ("count", "*")}
N_BUCKETS = 64
BATCH_ROWS = 6_000


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-ivm", cpus="32")
    for d in (SRC, STORE):
        if os.path.isdir(d):
            shutil.rmtree(d)

    li = (
        spark.read.parquet(os.path.join(SOAK_SF1, "lineitem.parquet"))
        .withColumn(
            "id", F.col("l_orderkey") * 10 + F.col("l_linenumber")
        )
        .withColumn("part_bucket", F.col("l_partkey") % 1024)
        .select("id", "l_partkey", "part_bucket", "l_extendedprice")
    )
    n_rows = li.count()

    # seed the CDC table: one insert batch of the whole fact table
    seed = li.withColumn("seq", F.lit(1)).withColumn("op", F.lit("I"))
    t0 = time.perf_counter()
    txn.apply_cdc_batch_bucketed(
        seed, SRC, key_col="id", n_buckets=N_BUCKETS
    )
    t_seed = round(time.perf_counter() - t0, 3)

    # cold-start the store (full aggregate — this is also baseline #0)
    t0 = time.perf_counter()
    txn.sync_aggregate_from_cdc(
        spark, SRC, STORE, ["l_partkey"], MEASURES
    )
    t_cold = round(time.perf_counter() - t0, 3)

    # a small churn batch: 1/3 updates, 1/3 deletes, 1/3 inserts
    sample = li.orderBy("id").limit(BATCH_ROWS).localCheckpoint(eager=True)
    third = BATCH_ROWS // 3
    upd = (
        sample.limit(third)
        .withColumn("l_extendedprice", F.col("l_extendedprice") * 1.1)
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("U"))
    )
    dels = (
        sample.orderBy(F.desc("id")).limit(third)
        .withColumn("l_partkey", F.lit(None).cast("bigint"))
        .withColumn(
            "l_extendedprice", F.lit(None).cast("double")
        )
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("D"))
    )
    ins = (
        sample.limit(third)
        .withColumn("id", F.col("id") + 2_000_000_000)
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("I"))
    )
    batch = upd.unionByName(dels).unionByName(ins)

    t0 = time.perf_counter()
    txn.apply_cdc_batch_bucketed(
        batch, SRC, key_col="id", n_buckets=N_BUCKETS
    )
    t_apply = round(time.perf_counter() - t0, 3)

    # decompose: the CDF read alone (netting fast path), then the full
    # sync (CDF read + store merge + store commit). The store merge is
    # the floor BOTH strategies pay; the differentiator at scale is the
    # source scan the incremental path avoids.
    t0 = time.perf_counter()
    n_changes = txn.read_changes_bucketed(
        spark, SRC, 1, 2, mode="cdf"
    ).count()
    t_cdf = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    txn.sync_aggregate_from_cdc(
        spark, SRC, STORE, ["l_partkey"], MEASURES
    )
    t_sync = round(time.perf_counter() - t0, 3)

    # narrow store (1024 groups): here the O(store) merge floor is
    # negligible, so the comparison isolates the term that matters at
    # 100 TB — the full-refresh source scan the incremental path avoids
    nstore = os.path.join(REPO, ".soak", f"ivm_store_narrow_{SCALE}")
    if os.path.isdir(nstore):
        shutil.rmtree(nstore)
    txn.sync_aggregate_from_cdc(  # cold start at v1... already v2; rebuild below
        spark, SRC, nstore, ["part_bucket"], MEASURES
    )
    # one more churn batch so the narrow store has an incremental step
    batch2 = (
        sample.limit(third)
        .withColumn("l_extendedprice", F.col("l_extendedprice") * 1.2)
        .withColumn("seq", F.lit(3))
        .withColumn("op", F.lit("U"))
    )
    txn.apply_cdc_batch_bucketed(
        batch2, SRC, key_col="id", n_buckets=N_BUCKETS
    )
    t0 = time.perf_counter()
    txn.sync_aggregate_from_cdc(spark, SRC, nstore, ["part_bucket"], MEASURES)
    t_sync_narrow = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    txn.read_cdc_table(spark, SRC).groupBy("part_bucket").agg(
        *[
            _measure_agg(MEASURES[m]).alias(m)
            for m in sorted(MEASURES)
        ]
    ).write.mode("overwrite").format("noop").save()
    t_full_narrow = round(time.perf_counter() - t0, 3)

    # catch the wide store up to v3 so the correctness check below
    # compares same-version states
    txn.sync_aggregate_from_cdc(spark, SRC, STORE, ["l_partkey"], MEASURES)

    # baseline: what a non-incremental view pays — full scan of live
    # rows, full aggregate, full store rewrite (same txn commit path)
    base_store = os.path.join(REPO, ".soak", f"ivm_base_{SCALE}")
    if os.path.isdir(base_store):
        shutil.rmtree(base_store)
    t0 = time.perf_counter()
    live = txn.read_cdc_table(spark, SRC)
    mnames = sorted(MEASURES)
    full = live.groupBy("l_partkey").agg(
        *[_measure_agg(MEASURES[m]).alias(m) for m in mnames]
    )
    txn.commit_txn(full, base_store)
    t_full = round(time.perf_counter() - t0, 3)

    # correctness: synced store == full re-aggregate, exactly
    got = {
        r.l_partkey: (r.n, round(r.revenue, 4) if r.revenue else r.revenue)
        for r in txn.read_aggregate_store(spark, STORE).collect()
    }
    exp = {
        r.l_partkey: (r.n, round(r.revenue, 4) if r.revenue else r.revenue)
        for r in txn.read_txn(spark, base_store).collect()
    }
    assert got == exp, (
        f"store diverged: {len(got)} vs {len(exp)} groups, "
        f"sample diff {dict(list({k: (got.get(k), exp.get(k)) for k in set(got) ^ set(exp) | {kk for kk in got if got.get(kk) != exp.get(kk)}}.items())[:3])}"
    )

    out = {
        "metric": f"IVM soak at {SCALE} (bucketed CDC source)",
        "rows": n_rows,
        "batch_rows": BATCH_ROWS,
        "groups": len(got),
        "seed_s": t_seed,
        "cold_start_s": t_cold,
        "apply_batch_s": t_apply,
        "cdf_rows": n_changes,
        "cdf_read_s": t_cdf,
        "incremental_sync_s": t_sync,
        "full_refresh_s": t_full,
        "speedup_vs_full": round(t_full / t_sync, 2) if t_sync else None,
        "narrow_groups": 1024,
        "incremental_sync_narrow_s": t_sync_narrow,
        "full_refresh_narrow_s": t_full_narrow,
        "speedup_narrow": (round(t_full_narrow / t_sync_narrow, 2)
                           if t_sync_narrow else None),
        "store_matches_full": True,
    }
    out_name = ("bench_soak_ivm.json" if SCALE == "sf1"
                else f"bench_soak_ivm_{SCALE}.json")
    with open(os.path.join(REPO, "docs", out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
