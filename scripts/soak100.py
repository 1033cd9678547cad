"""100x soak: a second 10x scaling step (.soak/sf1 -> .soak/sf10) giving
a three-point scaling curve sf0.1 -> sf1 -> sf10 (60M lineitem / 500k
documents / 200k embeddings / 10M events / 1.5M customers).

Same disjoint-copy discipline as scripts/soak.py with round-2-specific
transforms so no cross-round collisions occur:

- keys: offset by k2 * 1e9 (round 1 stayed under 1e9);
- embeddings: copy-specific MULTIPLICATIVE coordinate permutation
  j -> (3^k2 * j) mod 64 — an exact isometry (intra-copy cosine
  structure untouched), and rotation∘permutation compositions are
  pairwise distinct across all 100 (k1, k2) combos, so no two copies
  of one original vector ever coincide (round-2 rotations would have
  collided additively: shift k1a+k2a = k1b+k2b);
- documents: every 2nd token (offset-staggered vs round 1's every
  3rd) gets an 'r{k2}' suffix — cross-copy Jaccard ~0 in both rounds;
- customer names regenerated from the offset key (as in round 1).

Measures the heavy dedup/similarity/graph tail at sf1 vs sf10 and
records ratios against the same complexity bounds; single run per
query at sf10 (minutes-long graph queries), best-of-2 at sf1.
Artifact: docs/bench_soak_sf10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from taar_gcp_etl_spark.queries import SPARK_QUERIES  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.path.join(REPO, ".soak", "sf1")
OUT = os.path.join(REPO, ".soak", "sf10")
COPIES = 10
OFF = 1_000_000_000

SOAK_QUERIES: dict[str, tuple[float, str, int]] = {
    # name -> (bound, model, runs at sf10)
    "minhash_signatures": (15.0, "map-only hashing, O(n)", 1),
    # lsh runs best-of-2 at BOTH scales: its first run materializes the
    # persisted signature relation (minhash's cost, measured separately
    # above); asymmetric run counts were charging sf10's lsh for 38 s of
    # hashing that sf1's best-of-2 had already cached away — the r4
    # "26x" was that bias, not the band join (measured candidates:
    # 4.2k -> 35k distinct for 10x docs, max band size 9).
    "lsh_near_dup": (15.0, "band join, O(n + pairs)", 2),
    "dedup_clusters": (15.0, "CC over near-dup graph", 1),
    "simhash_hamming": (15.0, "banded popcount join", 1),
    "heavy_hitters": (15.0, "O(n) candidates + recount", 2),
    "cosine_topk": (15.0, "fixed queries x corpus", 2),
    "ann_bucketed": (15.0, "bucket equi-join", 2),
    "semantic_dedup": (12.0, "k scales with n", 1),
    # fuzzy_join is EXCLUDED at sf10: the fixture is degenerate there —
    # 1.5M dense numeric ID-strings have superquadratic TRUE pair growth
    # at edit distance 2 (~40M+ real pairs; the r4 attempt filled 79 GB
    # of shuffle on the candidate dedup). The sf1 point (8.8x wall-clock
    # for 10x rows with 36x true output) already demonstrates
    # linear-per-output scaling; a real name corpus does not have 3% of
    # all pairs within distance 2.
    "pagerank": (15.0, "O(E)/iteration", 1),
    "cc_clusters": (18.0, "O(E)/round", 1),
    "graph_stats": (35.0, "triangles O(E^1.5)", 1),
    "bfs_hops": (18.0, "O(E)/hop", 1),
}


def build(spark) -> None:
    ks = spark.range(COPIES).select(F.col("id").alias("_k"))
    os.makedirs(OUT, exist_ok=True)
    off = F.col("_k") * OFF

    def write(name, df):
        p = os.path.join(OUT, f"{name}.parquet")
        df.write.mode("overwrite").parquet(p)
        print(f"  built {name}", file=sys.stderr)

    def t(name):
        return spark.read.parquet(f"{BASE}/{name}.parquet").crossJoin(ks)

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
            "c_name", F.format_string("Customer#%012d", F.col("c_custkey"))
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
                    "if((i + 2 * _k) % 2 = 0 and _k > 0, "
                    "concat(tok, 'r', cast(_k as string)), tok))"
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
                "transform(sequence(0, 63), j -> "
                "embedding[cast(pmod(cast(pow(3, _k) as bigint) * j, 64) "
                "as int)])"
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


def time_query(spark, name, sf_dir, runs):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        SPARK_QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak100", cpus="32")
    if not os.path.isdir(os.path.join(OUT, "lineitem.parquet")):
        print("building 100x dataset...", file=sys.stderr)
        build(spark)
    spark.range(1000).selectExpr("sum(id)").collect()

    results = {}
    for name, (bound, why, runs) in SOAK_QUERIES.items():
        base = time_query(spark, name, BASE, 2)
        soak = time_query(spark, name, OUT, runs)
        ratio = round(soak / base, 2) if base > 0 else None
        results[name] = {
            "sf1_s": base,
            "sf10_s": soak,
            "ratio": ratio,
            "bound": bound,
            "ok": ratio is not None and ratio <= bound,
            "model": why,
        }
        print(
            f"  {name}: {base:.2f}s -> {soak:.2f}s  ratio {ratio} "
            f"(bound {bound}) "
            f"{'OK' if results[name]['ok'] else 'SUPERLINEAR'}",
            file=sys.stderr,
        )

    payload = {
        "metric": "sf10 soak scaling ratios (100x sf0.1 data, vs sf1)",
        "queries": results,
        "n_superlinear": sum(1 for r in results.values() if not r["ok"]),
    }
    with open(os.path.join(REPO, "docs", "bench_soak_sf10.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
