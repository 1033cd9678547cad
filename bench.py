"""Benchmark harness — runs the query registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully through the `noop` sink (whole plan runs, no
output materialization, no driver collect) — the honest cost of the plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from taar_gcp_etl_spark.queries import SPARK_QUERIES  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="taar-spark-bench", cpus=cpus)

    # JVM/codegen/scan warmup so q1 isn't charged for startup: one trivial
    # plan + one real parquet scan (initializes the vectorized reader and
    # filesystem client).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from taar_gcp_etl_spark.io import read_table

    read_table(spark, sf_dir, "events").count()
    # MLlib class-loading costs ~4 s on first use (measured; docs/NEXT.md)
    # — a steady-state cluster pays it once per executor lifetime, not per
    # query, so charge it to warmup rather than whichever ML query runs
    # first (donor_clusters in registry order).
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        tiny = spark.range(16).selectExpr(
            "array(cast(id as double), cast(id % 3 as double)) as arr"
        ).select(array_to_vector("arr").alias("features"))
        KMeans(k=2, seed=1, maxIter=1).fit(tiny)
    except Exception:
        pass  # MLlib unavailable → ML queries will surface it themselves

    timings: dict[str, float] = {}
    for name, fn in SPARK_QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "taar_gcp_etl_spark query suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
