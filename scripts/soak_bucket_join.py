"""Bucket-aligned join soak (r9, VERDICT r8 #4): fact-fact merge of two
bucketed CDC tables through txn.join_bucketed vs the plain shuffled join
of the same live reads.

Fixture: two 16M-row fact tables sharing key domain and modulus
(n_buckets=32, ~15 MB buckets) — the co-located merge shape the bucket layout exists
for. Measured per arm (min of two runs, noop sink so the whole plan
executes without driver materialization):

- plain:   read_cdc_table both sides + standard inner join with
           autoBroadcastJoinThreshold=-1 (both 16M-row sides exchange
           through the shuffle — what a 100 TB x 100 TB merge pays).
- aligned: txn.join_bucketed — per-bucket pruned reads coalesced to one
           partition each; ZERO shuffle exchange (plan asserted here
           too, not just in the unit test).

Honest-claim note (r5 soak lesson, re-learned here): local wall-clock
is page-cache and ambient bound. A first cut ran the arms in blocks and
measured "plain 10.3 s vs aligned 3.7 s = 2.8x win" — that plain block
had landed in a loaded window; alternated quiet minima show NEAR-PARITY
at 16M rows/side (plain ~3.7 s, aligned ~3.9 s). That parity is itself
the honest local result: on local[32] the exchange is an in-process
memory copy (~free), so the aligned path's avoided shuffle buys nothing
here while its O(n_buckets) plan overhead costs a little. The claim
that scales is STRUCTURAL and asserted on the plan, not the clock: zero
shuffle exchange of either side, so on a real cluster the ~2x-data
network/disk shuffle cost disappears while everything else is the same
work. At 4M rows/side the fixed plan cost still loses ~2x — use the
face for big co-located merges, not small ones.

Usage: python scripts/soak_bucket_join.py  (one JSON line, writes
docs/bench_soak_bucket_join.json)
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
N = 16_000_000
N_BUCKETS = 32


def build(spark, side: str, t: str) -> None:
    if txn.latest_manifest(spark, t) is not None:
        return
    shutil.rmtree(t, ignore_errors=True)
    rows = spark.range(N).select(
        F.col("id"),
        F.md5(F.concat(F.lit(side), F.col("id").cast("string"))).alias(
            f"pay_{side}"
        ),
        (F.col("id") % 1000).cast("double").alias(f"m_{side}"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(rows, t, n_buckets=N_BUCKETS)


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-bjoin", cpus="32")
    base = os.path.join(REPO, ".soak", "bucket_join")
    left, right = f"{base}-l", f"{base}-r"
    build(spark, "l", left)
    build(spark, "r", right)

    def run_noop(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    def plain():
        l = txn.read_cdc_table(spark, left)
        r = txn.read_cdc_table(spark, right)
        ren = {
            c: c + "_r" for c in r.columns if c in l.columns and c != "id"
        }
        return l.join(r.withColumnsRenamed(ren), "id")

    def aligned():
        return txn.join_bucketed(spark, left, right)

    out: dict = {
        "metric": "bucket-aligned join soak",
        "n_rows_per_side": N,
        "n_buckets": N_BUCKETS,
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # correctness first: identical row count and checksum
        agg = lambda df: df.agg(  # noqa: E731
            F.count("*").alias("n"),
            F.sum(F.xxhash64("id", "pay_l", "pay_r")).alias("chk"),
        ).collect()[0]
        a, p = agg(aligned()), agg(plain())
        out["rows"] = a.n
        out["checksum_match"] = (a.n, a.chk) == (p.n, p.chk)

        plan = (
            aligned()._jdf.queryExecution().executedPlan().toString()
        )
        out["aligned_plan_has_shuffle"] = (
            "Exchange hashpartitioning" in plan
            or "Exchange rangepartitioning" in plan
        )
        # ALTERNATE the arms (3 rounds) and keep per-arm minima: a
        # block of consecutive runs hands whichever arm goes second a
        # warmer page cache and charges ambient spikes to one arm only
        # (the first cut of this soak measured plain 10.3 s in a loaded
        # window and called it a 2.8x aligned win; alternated quiet
        # minima show near-parity locally — the honest local claim)
        runs: dict[str, list[float]] = {"plain": [], "aligned": []}
        for _ in range(3):
            for name, mk in (("plain", plain), ("aligned", aligned)):
                runs[name].append(run_noop(mk()))
        times = {k: min(v) for k, v in runs.items()}
        out["sec"] = times
        out["sec_runs"] = runs
        out["speedup_aligned_over_plain"] = round(
            times["plain"] / max(times["aligned"], 1e-9), 2
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_soak_bucket_join.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
