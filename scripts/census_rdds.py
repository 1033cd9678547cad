"""Persisted-RDD / heap census across the suite (VERDICT r12 #3).

The r12 logs show a late-suite inflation: als_neighbors measured 9.05 s
in-suite vs 1.42 s fresh-JVM on the same HEAD. Hypothesis: storage-state
accumulation across 135 queries in one JVM — localCheckpoint and persist
blocks are only released by the ContextCleaner when the JVM's GC
collects their weak references, which a 48 GiB heap may not do for the
whole suite, so dead blocks pile up in the unified memory manager and
every later query pays eviction churn / GC pressure.

This script runs the registry in ONE JVM (bench order, noop sink, no
timing rigor) and records after every query:
  - n_rdds / mem / disk from SparkContext.getRDDStorageInfo (live
    persisted RDD blocks, including localCheckpoint RDDs),
  - JVM heap used (Runtime total-free),
  - wall seconds for the single (cold) execution.
Output: docs/census_rdds_<tag>.json — the before/after evidence for the
checkpoint-hygiene fix.

Usage: python scripts/census_rdds.py <tag> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def storage_snapshot(spark) -> dict:
    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    rt = sc._jvm.java.lang.Runtime.getRuntime()
    heap = rt.totalMemory() - rt.freeMemory()
    return {
        "n_rdds": len(infos),
        "mem_mb": round(mem / 1e6, 1),
        "disk_mb": round(disk / 1e6, 1),
        "heap_mb": round(heap / 1e6, 1),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "now"
    from taar_gcp_etl_spark.queries import SPARK_QUERIES
    from taar_gcp_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or list(SPARK_QUERIES)
    spark = get_spark(app_name=f"census-{tag}")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = []
    for name in names:
        t0 = time.perf_counter()
        err = None
        try:
            SPARK_QUERIES[name](spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as exc:  # noqa: BLE001 — census must finish
            err = str(exc)[:200]
        snap = storage_snapshot(spark)
        snap["query"] = name
        snap["sec"] = round(time.perf_counter() - t0, 3)
        if err:
            snap["err"] = err
        out.append(snap)
        print(json.dumps(snap), file=sys.stderr)
    # leaked-RDD detail at suite end: name/size of everything still held
    end = [
        {
            "id": i.id(),
            "name": str(i.name())[:120],
            "mem_mb": round(i.memSize() / 1e6, 2),
            "disk_mb": round(i.diskSize() / 1e6, 2),
            "parts": i.numCachedPartitions(),
        }
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]
    path = os.path.join(REPO, "docs", f"census_rdds_{tag}.json")
    with open(path, "w") as f:
        json.dump(
            {"ts": int(time.time()), "sf_dir": sf_dir, "per_query": out,
             "end_state": sorted(
                 end, key=lambda e: -(e["mem_mb"] + e["disk_mb"])
             )},
            f, indent=1,
        )
    print(json.dumps({
        "wrote": path,
        "end_n_rdds": len(end),
        "end_mem_mb": round(sum(e["mem_mb"] for e in end), 1),
        "end_disk_mb": round(sum(e["disk_mb"] for e in end), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
