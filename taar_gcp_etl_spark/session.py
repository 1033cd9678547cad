"""SparkSession factory.

Engine-wide physical decisions (SURVEY.md §4):
  - AQE on (runtime shuffle coalescing, skew-join splitting) — subsumes the
    reference's hand-tuned Dataflow worker counts
    (reference: taar_etl/taar_profile_bigtable.py:361-374).
  - UTC session timezone — the reference compares naive-UTC datetimes
    (reference: taar_etl/taar_amowhitelist.py:89-91); also required for
    DuckDB-oracle timestamp parity.
  - ANSI off — BigQuery SAFE_CAST semantics (NULL on bad cast, NULL on
    out-of-range element_at) (reference: taar_etl/taar_profile_bigtable.py:78).
  - shuffle partitions sized to cores for local mode; on a real cluster this
    would be set to ~2-3× total executor cores or left to AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "taar_gcp_etl_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
        # local mode: driver == all executors, so the default 1g heap is
        # the whole cluster's memory — size it to the machine (128 GiB
        # box; JVM heap is lazily committed). Must be set before the JVM
        # launches, hence here and not per-query.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
