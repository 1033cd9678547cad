"""MERGE INTO soak (r9): txn.merge_into's O(source + touched buckets)
classification-and-apply vs the full-table rewrite a flat upsert pays,
at 8M x ~270-byte target rows (~2 GB live).

Fixture: one 8M-row bucketed CDC table (n_buckets=32, 8-way-md5
payload so the table is big enough that rewrite cost is real, not
page-cache noise). Measured:

- a ~1100-row BUCKET-LOCALIZED merge (churn keys AND insert keys all
  hash into bucket 5): probe reads 1/32 of the table, apply rewrites
  one bucket — the regime the face is designed for. Real churn is
  usually key- or time-correlated, so this is the common case.
- a ~1100-row SPREAD merge (keys at stride N/1000 hash everywhere):
  worst case — probe and rewrite touch all 32 buckets; honest cost is
  a full-size rewrite plus classification.
- mixed clauses both times: ~1% of matched rows carry a HASH-derived
  delete flag (matched_delete_condition; hash so the flag rate is
  immune to the arms' key patterns), the rest update, plus ~100
  unmatched inserts guarded by not_matched_condition — the full
  clause classifier, not just upserts.
- a FULL REWRITE baseline: what a non-transactional engine pays to
  apply the same change (read + overwrite the whole live table).
- STRUCTURAL metric per merge: how many of the 32 bucket->dir manifest
  entries were remapped — page-cache-proof evidence that the localized
  merge rewrote 1 bucket and the spread merge rewrote all of them.
- exactness: post-merge live state checksum-equals a hand-derived
  expected relation (v2 shadows v1; is_del rows never survive).

The honest claims are the RATIO (localized merge vs full rewrite) and
the remap counts; absolute seconds are illustrative (local[32], page
cache).

Usage: python scripts/soak_merge_into.py  (one JSON line, writes
docs/bench_soak_merge_into.json)
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
N = 8_000_000
N_BUCKETS = 32
CHURN = 1_000
HOT_BUCKET = 5


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
        wide_payload("base", F.col("id")).alias("payload"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"),
    )
    txn.apply_cdc_batch_bucketed(rows, t, n_buckets=N_BUCKETS)


def src_for(spark, ids, inserts, tag: str):
    """Merge source: updates/deletes over ``ids`` (~1% delete flags)
    plus unmatched ``inserts`` rows guarded live by
    not_matched_condition."""
    return ids.select(
        F.col("id"),
        wide_payload(tag, F.col("id")).alias("payload"),
        # hash-derived ~1% delete flag: pattern-proof (review r9 — the
        # old id%100 test made the stride-keyed spread arm 100%
        # deletes, so the published worst-case measured the wrong mix)
        (F.abs(F.xxhash64("id")) % 100 == 0).alias("is_del"),
    ).unionByName(
        inserts.select(
            "id",
            wide_payload("new" + tag, F.col("id")).alias("payload"),
            F.lit(False).alias("is_del"),
        )
    )


def remapped(man_before: dict, man_after: dict) -> int:
    b0, b1 = man_before["buckets"], man_after["buckets"]
    return sum(1 for k in b1 if b0.get(k) != b1[k])


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-minto", cpus="32")
    t = os.path.join(REPO, ".soak", "merge_into")
    build(spark, t)

    out: dict = {
        "metric": "merge-into soak",
        "n_rows": N,
        "n_buckets": N_BUCKETS,
        "source_rows": CHURN + 100,
    }

    # arm 1 — bucket-localized: churn AND insert keys all in ONE bucket
    one_bucket = (
        spark.range(N)
        .filter(txn._bucket_of("id", N_BUCKETS) == HOT_BUCKET)
        .limit(CHURN)
    )
    ins1 = (
        spark.range(10_000_000, 10_100_000)
        .filter(txn._bucket_of("id", N_BUCKETS) == HOT_BUCKET)
        .limit(100)
    )
    src1 = src_for(spark, one_bucket, ins1, "v1").localCheckpoint(
        eager=True
    )
    man0 = txn.latest_manifest(spark, t)
    t0 = time.perf_counter()
    txn.merge_into(
        spark, t, src1,
        matched_delete_condition="is_del",
        not_matched_condition="NOT is_del",
    )
    out["merge_one_bucket_sec"] = round(time.perf_counter() - t0, 2)
    man1 = txn.latest_manifest(spark, t)
    out["one_bucket_buckets_rewritten"] = remapped(man0, man1)

    # arm 2 — spread (worst case): stride keys hit every bucket
    spread = spark.range(CHURN).select(
        (F.col("id") * (N // CHURN)).alias("id")
    )
    ins2 = spark.range(11_000_000, 11_000_100)
    src2 = src_for(spark, spread, ins2, "v2").localCheckpoint(eager=True)
    t0 = time.perf_counter()
    txn.merge_into(
        spark, t, src2,
        matched_delete_condition="is_del",
        not_matched_condition="NOT is_del",
    )
    out["merge_spread_sec"] = round(time.perf_counter() - t0, 2)
    man2 = txn.latest_manifest(spark, t)
    out["spread_buckets_rewritten"] = remapped(man1, man2)

    # baseline — the flat engine's cost for the SAME logical change:
    # read + rewrite the whole live table
    flat = os.path.join(REPO, ".soak", "merge_into_flat")
    shutil.rmtree(flat, ignore_errors=True)
    live = txn.read_cdc_table(spark, t)
    t0 = time.perf_counter()
    live.write.mode("overwrite").parquet(flat)
    out["full_rewrite_sec"] = round(time.perf_counter() - t0, 2)
    out["speedup_localized_over_rewrite"] = round(
        out["full_rewrite_sec"] / max(out["merge_one_bucket_sec"], 1e-9), 2
    )

    # exactness: live state == hand-derived expectation of both merges,
    # derived with plain relational algebra: v2 rows shadow v1 (the
    # later merge outranks), is_del rows never survive (matched ones
    # delete, unmatched ones are filtered by not_matched_condition)
    v1_only = src1.join(src2, "id", "left_anti")
    latest = src2.unionByName(v1_only)
    base = spark.range(N).select(
        "id", wide_payload("base", F.col("id")).alias("payload")
    )
    untouched = base.join(latest, "id", "left_anti")
    survivors = latest.filter(~F.col("is_del")).select("id", "payload")
    expected = untouched.unionByName(survivors)
    chk = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum(F.xxhash64("id", "payload")).alias("c"),
    ).collect()[0]
    a = chk(txn.read_cdc_table(spark, t).select("id", "payload"))
    b = chk(expected)
    out["rows"] = a.n
    out["live_equals_expected"] = (a.n, a.c) == (b.n, b.c)

    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_soak_merge_into.json"), "w"
    ) as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
