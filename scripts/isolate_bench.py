"""Isolated per-query quiet baselines (round 11, VERDICT r10 #1).

The warm-suite total drifted ~10%/round on untouched code (r9→r10:
119.5 → 135-145 s quiet), and the trend gate's medians drift with it.
This collector measures each query in a FRESH JVM — no suite-position
effects (codegen-cache growth, heap aging, GC pressure from 133 prior
queries), no cross-query page-cache interplay — N warm repetitions,
median committed to docs/bench_isolated.json as the query's
position-independent budget.

Each per-query subprocess also times the CPU contention sentinel (the
same fixed plan bench.py uses) for AFTER-THE-FACT quietness review
only — the gate deliberately does NOT sentinel-rescale isolated
budgets (bench.find_regressions documents why: fresh-JVM sentinel
samples ranged 0.17-0.58 s across JVMs whose queries converged
identically, and a fresh JVM's sentinel runs systematically ~1.4x
above a suite-aged JVM's, so a sentinel ratio would inject exactly the
noise the budget exists to remove). Budgets are same-box absolute
numbers.

Usage:
    python scripts/isolate_bench.py                   # default subset
    python scripts/isolate_bench.py q1 q2 ...         # explicit names
    python scripts/isolate_bench.py --all             # whole registry
    python scripts/isolate_bench.py --one NAME --reps 5   # (internal)

Run on a QUIET host only — the artifact is a committed reference, not a
per-round measurement; the per-JVM sentinel readings let a reviewer
check that claim after the fact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the r10 gate-flagged queries + the graph family + the suite's most
# expensive queries + two cheap stable controls
DEFAULT_SET = [
    "bfs_hops", "fuzzy_join", "graph_stats", "lm_score",
    "pagerank", "cc_clusters", "communities", "dedup_clusters",
    "basket_rules", "tpch_q5", "tpch_q1", "semantic_dedup",
    "fuzzy_join_adaptive", "leak_safe_split",
    "tpch_q3", "serving_pack",
]


def run_one(name: str, reps: int) -> None:
    """Subprocess body: fresh JVM, bench-identical warmups, one cold run
    then `reps` timed warm runs of the single query; JSON on stdout."""
    from taar_gcp_etl_spark.queries import SPARK_QUERIES
    from taar_gcp_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"isolate-{name}", cpus=cpus)
    # the same warmups bench.py charges to startup, so the isolated cold
    # number is comparable to the suite's cold column
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from taar_gcp_etl_spark.io import read_table

    read_table(spark, sf_dir, "events").count()
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        tiny = spark.range(16).selectExpr(
            "array(cast(id as double), cast(id % 3 as double)) as arr"
        ).select(array_to_vector("arr").alias("features"))
        KMeans(k=2, seed=1, maxIter=1).fit(tiny)
    except Exception:
        pass

    def sentinel() -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(200_000_000).selectExpr("sum(id * 7)").collect()
            runs.append(time.perf_counter() - t0)
        return round(sorted(runs)[1], 3)

    sentinel()  # codegen warm-up, untimed (same as bench.py)
    s = sentinel()
    fn = SPARK_QUERIES[name]

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    cold = once()
    warm = [once() for _ in range(reps)]
    # a fresh JVM is still JIT-converging through the first timed reps
    # (measured: tpch_q1 3.0 -> 2.0 -> 1.56 -> 1.15 -> 1.13; bfs_hops
    # bimodal 9 s -> 5.3 s) — the steady-state budget is the median of
    # the LAST three reps, with the full run list kept for review
    tail = warm[-3:] if len(warm) >= 3 else warm
    print(json.dumps({
        "name": name, "cold": cold, "warm_runs": warm,
        "warm_median": sorted(tail)[len(tail) // 2],
        "sentinel": s,
    }))
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if "--one" in args:
        i = args.index("--one")
        reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 5
        run_one(args[i + 1], reps)
        return
    reps = 5
    if "--reps" in args:
        j = args.index("--reps")
        reps = int(args[j + 1])
        del args[j:j + 2]
    if "--all" in args:
        from taar_gcp_etl_spark.queries import SPARK_QUERIES

        names = list(SPARK_QUERIES)
    elif "--missing" in args:
        # registry queries with no committed budget yet (VERDICT r11
        # #3: extend coverage toward the full registry); an optional
        # trailing integer caps the chunk size so a long sweep can be
        # interleaved with other work.
        from taar_gcp_etl_spark.queries import SPARK_QUERIES

        sf_dir_ = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        sf_ = (
            float(sf_dir_.rstrip("/").rsplit("sf", 1)[-1])
            if "sf" in sf_dir_ else -1.0
        )
        try:
            with open(
                os.path.join(REPO, "docs", "bench_isolated.json")
            ) as f:
                have = set(json.load(f).get(str(sf_), {}))
        except (OSError, ValueError):
            have = set()
        names = [n for n in SPARK_QUERIES if n not in have]
        rest = [a for a in args if a != "--missing"]
        if rest and rest[0].isdigit():
            names = names[: int(rest[0])]
    elif args:
        names = args
    else:
        names = DEFAULT_SET
    out: dict[str, dict] = {}
    for n in names:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", n,
             "--reps", str(reps)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            out[n] = json.loads(line)
        except ValueError:
            out[n] = {"name": n, "error": p.stderr[-500:]}
        print(f"{n}: {out[n].get('warm_median', 'ERR')} "
              f"(wall {round(time.time() - t0, 1)}s)", file=sys.stderr)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = (
        float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        if "sf" in sf_dir else -1.0
    )
    path = os.path.join(REPO, "docs", "bench_isolated.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    key = str(sf)
    doc.setdefault(key, {})
    sents = [e["sentinel"] for e in out.values() if "sentinel" in e]
    doc[key].update({
        n: e for n, e in out.items() if "warm_median" in e
    })
    doc[key + "_meta"] = {
        "ts": int(time.time()),
        "reps": reps,
        "sentinel_median": sorted(sents)[len(sents) // 2] if sents else None,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({"wrote": path, "n": len(out), "sf": sf}))


if __name__ == "__main__":
    main()
