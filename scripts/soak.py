"""sf1.0 soak of the heavy graph/ML/dedup tail (VERDICT r3 next-1).

Builds a 10x-scaled dataset from sf0.1 (disjoint-copy union — the
testdata dir is read-only, so scaling is derived, never regenerated),
runs the heaviest registry queries at both scales, and records each
query's wall-clock ratio against its family's predicted complexity
bound. A ratio blowing past its bound is a superlinear curve — exactly
the failure the 100 TB design claims rule out.

Scaling rules (copy k = 0..9, disjoint key ranges):
- lineitem/orders: orderkey/partkey/custkey offset per copy — the
  co-purchase graph grows 10x in BOTH nodes and edges (components stay
  copy-local, like a real corpus).
- customer: custkey offset; c_name regenerated from the new key
  (TPC-H's own convention) so cross-copy rows are not exact-name dups.
- documents: doc_id offset; every 3rd token gets a copy-specific
  suffix — a changed token kills every 3-shingle containing it, so
  cross-copy Jaccard collapses to ~0 while intra-copy dup structure is
  preserved exactly (dup DENSITY constant, corpus 10x — the honest
  scale axis for dedup; the first r4 run used every 5th token, which
  left cross-copy J≈0.25-0.4 — near-threshold pairs that r=1 LSH
  banding candidates at rate ~bJ, measuring fixture dup inflation
  instead of engine scaling).
- embeddings: vec_id offset; coordinates circularly rotated by k — an
  exact isometry, so intra-copy cosine structure is untouched while
  cross-copy vectors decorrelate.
- events: event_id/user_id offset; per-user activity unchanged.

Usage: python scripts/soak.py [--rebuild]   (writes .soak/sf1/, then
prints one JSON line and writes docs/bench_soak_sf1.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from taar_gcp_etl_spark.queries import SPARK_QUERIES  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SOAK_DIR = os.path.join(REPO, ".soak", "sf1")
COPIES = 10
OFF = 100_000_000  # disjoint key range per copy

# query -> (predicted max wall-clock ratio at 10x data, rationale)
SOAK_QUERIES: dict[str, tuple[float, str]] = {
    "minhash_signatures": (15.0, "map-only signature hashing: O(corpus)"),
    "lsh_near_dup": (15.0, "band join tracks dup density: O(corpus + pairs)"),
    "dedup_clusters": (15.0, "CC over near-dup graph: O(E) per round"),
    "simhash_hamming": (15.0, "banded popcount join: O(corpus + pairs)"),
    "pagerank": (15.0, "O(E) shuffle per iteration, fixed iters"),
    "cc_clusters": (18.0, "O(E) per round; +1 round possible at 10x"),
    "bfs_hops": (18.0, "frontier loop, O(E) per hop, fixed depth"),
    "graph_stats": (35.0, "triangle enumeration O(E^1.5) = 10^1.5 ~ 32"),
    "heavy_hitters": (15.0, "pigeonhole candidates + bounded recount: O(n)"),
    "cosine_topk": (15.0, "fixed query set x corpus: O(corpus)"),
    "ann_bucketed": (15.0, "bucket equi-join, bucket count fixed: O(corpus)"),
    # both were measured superlinear in the first r4 soak run and FIXED:
    # semantic_dedup 19.0x with fixed k=8 -> 3.5x with k = n/250 (clamped);
    # fuzzy_join 33.8x with fixed categorical blocks -> 6.1x with the
    # exact pigeonhole segment join + corpus-affix trimming (and its TRUE
    # output grows ~36x at 10x here — cross-copy near-name collisions —
    # so 6x wall-clock is sublinear per output pair).
    "semantic_dedup": (12.0, "within-cluster pairing, k scales with n"),
    "fuzzy_join": (15.0, "segment join: content-derived keys, O(n + pairs)"),
}


def build_scaled(spark) -> None:
    ks = spark.range(COPIES).select(F.col("id").alias("_k"))
    os.makedirs(SOAK_DIR, exist_ok=True)

    def write(name: str, df) -> None:
        out = os.path.join(SOAK_DIR, f"{name}.parquet")
        df.write.mode("overwrite").parquet(out)
        print(f"  built {name}: {spark.read.parquet(out).count()} rows",
              file=sys.stderr)

    def t(name: str):
        return spark.read.parquet(f"{BASE_SF}/{name}.parquet").crossJoin(ks)

    off = F.col("_k") * OFF
    write(
        "lineitem",
        t("lineitem")
        .withColumn("l_orderkey", F.col("l_orderkey") + off)
        .withColumn("l_partkey", F.col("l_partkey") + off)
        .drop("_k"),
    )
    write(
        "orders",
        t("orders")
        .withColumn("o_orderkey", F.col("o_orderkey") + off)
        .withColumn("o_custkey", F.col("o_custkey") + off)
        .drop("_k"),
    )
    write(
        "customer",
        t("customer")
        .withColumn("c_custkey", F.col("c_custkey") + off)
        .withColumn(
            "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
        )
        .drop("_k"),
    )
    write(
        "documents",
        t("documents")
        .withColumn("doc_id", F.col("doc_id") + off)
        .withColumn(
            "text",
            F.array_join(
                F.expr(
                    "transform(split(text, ' '), (tok, i) -> "
                    "if((i + _k) % 3 = 0 and _k > 0, "
                    "concat(tok, 'q', cast(_k as string)), tok))"
                ),
                " ",
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .drop("_k"),
    )
    write(
        "embeddings",
        t("embeddings")
        .withColumn("vec_id", F.col("vec_id") + off)
        .withColumn(
            "embedding",
            F.expr(
                "concat(slice(embedding, cast(_k as int) + 1, "
                "size(embedding) - cast(_k as int)), "
                "slice(embedding, 1, cast(_k as int)))"
            ),
        )
        .drop("_k"),
    )
    write(
        "events",
        t("events")
        .withColumn("event_id", F.col("event_id") + off)
        .withColumn("user_id", F.col("user_id") + off)
        .drop("_k"),
    )


def time_query(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        SPARK_QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak", cpus="32")
    rebuild = "--rebuild" in sys.argv
    if rebuild and os.path.isdir(SOAK_DIR):
        shutil.rmtree(SOAK_DIR)
    if not os.path.isdir(os.path.join(SOAK_DIR, "lineitem.parquet")):
        print("building 10x dataset...", file=sys.stderr)
        build_scaled(spark)

    # warmup (same rationale as bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{BASE_SF}/lineitem.parquet").count()

    results = {}
    for name, (bound, why) in SOAK_QUERIES.items():
        base = time_query(spark, name, BASE_SF)
        soak = time_query(spark, name, SOAK_DIR)
        ratio = round(soak / base, 2) if base > 0 else None
        results[name] = {
            "base_s": base,
            "soak_s": soak,
            "ratio": ratio,
            "bound": bound,
            "ok": ratio is not None and ratio <= bound,
            "model": why,
        }
        print(
            f"  {name}: {base:.2f}s -> {soak:.2f}s  ratio {ratio}"
            f" (bound {bound}) {'OK' if results[name]['ok'] else 'SUPERLINEAR'}",
            file=sys.stderr,
        )

    payload = {
        "metric": "sf1.0 soak scaling ratios (10x data vs sf0.1)",
        "copies": COPIES,
        "queries": results,
        "n_superlinear": sum(1 for r in results.values() if not r["ok"]),
    }
    with open(os.path.join(REPO, "docs", "bench_soak_sf1.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
