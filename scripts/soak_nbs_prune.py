"""NBS zone-map-prune soak (round 11, VERDICT r10 #4): the date-bounded
snapshot-sync shape at 8M x ~270-byte rows — a STRUCTURED
not_matched_by_source clause condition lets the absent-row
classification scan only the files whose stat envelopes overlap the
clause, instead of the honest O(table) read the string-condition path
pays.

Fixture: 8M-row bucketed CDC table (n_buckets=32), payload-heavy, with
zone maps on a date-like column ``d`` (= id // 1000, so the bucket-
locally clustered rewrite rolls each bucket into d-narrow files — the
time-correlated layout the prune exploits). Source = "today's extract":
every key with d >= CUTOFF (the oldest ~1.5% of rows are absent).

Measurement design (r11, learned the hard way): single-shot arm
comparisons on this box are dominated by a 3-5x first-arm decay
(JVM JIT + page-cache warming) and ~10-20-min ambient noise windows —
the first soak run measured the PRUNED arm 3x SLOWER purely because it
ran first; an alternating 6-arm replication measured steady-state
parity (U 68.1 s vs P 71.3 s on the quiet tail). So: one WARMUP arm
(discarded), then alternating UNPRUNED/PRUNED/UNPRUNED/PRUNED (fresh
fixture each — the merge mutates the table), reporting the full
sequence plus the LAST pair as steady state.

Honest conclusion this artifact encodes: at local page-cache-hot
scale, wall-clock is at PARITY — the absent-row read saving
(kept_fraction ~0.18 = 5.4x less data scanned, reported from the
metadata plan) is invisible when an 8 GB table reads at memory speed
and the merge's shuffles dominate. The prune's claim is the 100 TB
IO/scan-volume claim (5.4x fewer bytes off storage), not a local
speedup; the 2M-row broadcast-regime diagnostic measured 3.5x
wall-clock wins where scan time is a larger share. States are
checksum-equal between arms.

Usage: python scripts/soak_nbs_prune.py  (one JSON line, writes
docs/bench_soak_nbs_prune.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from taar_gcp_etl_spark import txn  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 8_000_000
N_BUCKETS = 32
CUTOFF = 120  # d < 120 -> oldest 120k of 8000 d-values (~1.5%) absent


def wide_payload(tag, col):
    parts = [
        F.md5(F.concat(F.lit(f"{tag}{i}"), col.cast("string")))
        for i in range(8)
    ]
    return F.concat(*parts)


def build(spark, t: str) -> None:
    shutil.rmtree(t, ignore_errors=True)
    rows = spark.range(N).select(
        F.col("id"),
        (F.col("id") / 1000).cast("long").alias("d"),
        wide_payload("base", F.col("id")).alias("payload"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(
        rows, t, n_buckets=N_BUCKETS,
        stats_cols=["d"], target_file_rows=50_000,
    )


def run_arm(spark, t: str, cond) -> float:
    src = (
        spark.range(N)
        .filter((F.col("id") / 1000).cast("long") >= CUTOFF)
        .select(
            "id",
            (F.col("id") / 1000).cast("long").alias("d"),
            wide_payload("sync", F.col("id")).alias("payload"),
        )
    )
    t0 = time.perf_counter()
    with warnings.catch_warnings():
        # a snapshot sync is full-width by nature
        warnings.simplefilter("ignore", RuntimeWarning)
        txn.merge_into(
            spark, t, src,
            when=[
                {"matched": "update"},
                {"not_matched": "insert"},
                {"not_matched_by_source": "delete", "condition": cond},
            ],
        )
    return round(time.perf_counter() - t0, 2)


def checksum(spark, t: str):
    r = (
        txn.read_cdc_table(spark, t)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("id", "d", "payload")).alias("c"),
        )
        .collect()[0]
    )
    return (r.n, r.c)


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-nbsprune", cpus="32")
    out: dict = {
        "metric": "NBS zone-map prune soak",
        "n_rows": N,
        "n_buckets": N_BUCKETS,
        "absent_rows": CUTOFF * 1000,
    }

    t = os.path.join(REPO, ".soak", "nbs_prune")
    build(spark, t)
    man = txn.latest_manifest(spark, t)
    plan = txn._cdc_prune_plan(man, t, [("d", "<", CUTOFF)])
    out["total_files"] = plan["total_files"]
    out["kept_files"] = plan["kept_files"]
    out["kept_fraction"] = round(
        plan["kept_files"] / max(plan["total_files"], 1), 4
    )
    # warmup arm: first-arm JIT/page-cache decay is 3-5x — discard
    out["warmup_sec"] = run_arm(spark, t, f"t_d < {CUTOFF}")
    arms = [
        ("unpruned", f"t_d < {CUTOFF}"),
        ("pruned", [("d", "<", CUTOFF)]),
        ("unpruned", f"t_d < {CUTOFF}"),
        ("pruned", [("d", "<", CUTOFF)]),
    ]
    seq = []
    chks = {}
    for label, cond in arms:
        build(spark, t)
        sec = run_arm(spark, t, cond)
        seq.append({label: sec})
        chks[label] = checksum(spark, t)
    out["sequence"] = seq
    out["unpruned_sec"] = [list(e.values())[0] for e in seq
                           if "unpruned" in e][-1]
    out["pruned_sec"] = [list(e.values())[0] for e in seq
                         if "pruned" in e][-1]
    out["states_equal"] = chks["pruned"] == chks["unpruned"]
    out["rows_after"] = chks["pruned"][0]
    out["wall_ratio_steady"] = round(
        out["unpruned_sec"] / max(out["pruned_sec"], 1e-9), 2
    )
    out["scan_volume_ratio"] = round(
        1 / max(out["kept_fraction"], 1e-9), 1
    )
    shutil.rmtree(t, ignore_errors=True)

    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_soak_nbs_prune.json"), "w"
    ) as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
