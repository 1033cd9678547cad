"""Sources and sinks.

Maps the reference's storage surface (SURVEY.md §2.1) onto Spark-native I/O:
  - fixture/table loading → columnar parquet scans (S5: BigQuery SQL scan,
    reference taar_etl/taar_profile_bigtable.py:56-68)
  - JSON.bz2 dual-write artifact sink (S11, taar_etl/taar_utils.py:32-63):
    `latest` + dated snapshot, bzip2-compressed
  - keyed serving table (S9 KV upsert sink,
    taar_etl/taar_profile_bigtable.py:166-191): sha256 row key, key-prefix
    partitioning to emulate BigTable row-key locality
  - Avro source/sink (S7/S8, taar_etl/taar_profile_bigtable.py:112-132,181-184)
    gated behind availability of spark-avro on the classpath.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scans are columnar and prunable —
    Catalyst pushes projections and predicates into the scan, which at 100 TB
    is the difference between reading ten columns and reading all of them.

    The `events` fixture stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as raw nanos (legacy long) and truncate to
    microseconds with integer division — the same truncation DuckDB applies,
    so oracle comparisons stay exact. (Plain `/ 1000` would route through
    double and lose precision above 2^53.)
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Fan a DataFrame out to the session's full parallelism when the scan
    produced fewer splits (small local files arrive as one split, which
    serializes CPU-heavy per-row operators like hashing onto one core).
    At cluster scale input splits >> cores and this is a no-op — the
    repartition only fires when the scan under-splits.

    Split estimate = input file count from the read relation — cheap plan
    metadata, unlike df.rdd.getNumPartitions() which builds the whole RDD
    plan on every call. Files larger than maxPartitionBytes produce MORE
    splits than files, so this under-counts only in the direction that adds
    a harmless repartition of an already-parallel scan — and only when the
    file count is below core count, i.e. small inputs where the extra
    exchange is noise.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file-backed plan: leave as-is
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load the fixture star schema (TESTDATA.md) as DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_json_artifact(
    df: DataFrame,
    base_path: str,
    name: str,
    date: dt.date | None = None,
    key_col: str | None = None,
) -> None:
    """Dual-write JSON artifact sink (S11, taar_etl/taar_utils.py:32-63).

    Writes the artifact twice: `{base}/latest/{name}.json` and
    `{base}/snapshot={YYYYMMDD}/{name}.json`, bzip2-compressed. When
    ``key_col`` is given the artifact is the reference's map shape
    ({key: record}); this is the ONE driver-side collection in the engine and
    is bounded by catalog scale (SURVEY.md §7 hard part 1) — everything else
    streams through `df.write`.
    """
    date = date or dt.date.today()
    stamp = date.strftime("%Y%m%d")
    if key_col is None:
        for sub in ("latest", f"snapshot={stamp}"):
            (
                df.coalesce(1)
                .write.mode("overwrite")
                .option("compression", "bzip2")
                .json(f"{base_path}/{sub}/{name}")
            )
        return
    # Map-shaped artifact {key: record}: JSON objects don't round-trip
    # through df.write.json naturally; convert rows→map at the boundary
    # (bounded: AMO-catalog scale, ~100k rows max).
    import bz2

    rows = df.toJSON().collect()
    obj = {}
    for r in rows:
        rec = json.loads(r)
        obj[rec[key_col]] = rec
    payload = bz2.compress(json.dumps(obj, sort_keys=True).encode("utf-8"))
    import os

    for sub in ("latest", f"snapshot={stamp}"):
        d = f"{base_path}/{sub}"
        os.makedirs(d, exist_ok=True)
        with open(f"{d}/{name}.json.bz2", "wb") as fh:
            fh.write(payload)


def read_json_artifact(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON(.bz2) source (S12, taar_etl/taar_utils.py:66-76) — bzip2 is
    transparent to Spark's text reader; explicit schema avoids an extra
    inference pass over the data."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_serving_table(df: DataFrame, path: str, key_col: str = "key") -> None:
    """Keyed serving table (S9, taar_etl/taar_profile_bigtable.py:295-329).

    Partitions by the first 2 hex chars of the sha256 key — 256 balanced
    buckets emulating BigTable row-key locality, so a point lookup or a
    delete-by-key touches one partition directory instead of a full scan.
    zlib cell compression in the reference is a storage codec → Parquet
    compression here.
    """
    (
        df.withColumn("key_prefix", F.substring(F.col(key_col), 1, 2))
        .repartition("key_prefix")
        # sort must LEAD with the partition column: the file writer requires
        # task data ordered by partition cols and re-sorts (non-stably,
        # destroying any other order) unless the existing ordering already
        # satisfies that — (key_prefix, key) does, (key) alone does not
        .sortWithinPartitions("key_prefix", key_col)
        .write.mode("overwrite")
        .partitionBy("key_prefix")
        .parquet(path)
    )


def avro_supported(spark: SparkSession) -> bool:
    """spark-avro is an external module; probe once instead of failing
    mid-job. A load of a nonexistent path distinguishes 'source missing'
    (FAILED_TO_FIND_DATA_SOURCE) from 'source present, path absent'."""
    try:
        spark.read.format("avro").load("/nonexistent/__avro_probe__")
        return True
    except Exception as exc:  # noqa: BLE001
        # Spark 3 raises 'Failed to find data source'; Spark 4 raises error
        # class DATA_SOURCE_NOT_FOUND ('Failed to find the data source').
        error_class = None
        for attr in ("getCondition", "getErrorClass"):
            try:
                error_class = getattr(exc, attr)()
                break
            except Exception:  # noqa: BLE001
                continue
        if error_class is not None and "DATA_SOURCE_NOT_FOUND" in str(error_class):
            return False
        msg = str(exc)
        return (
            "Failed to find data source" not in msg
            and "DATA_SOURCE_NOT_FOUND" not in msg
            and "Failed to find the data source" not in msg
        )


def write_avro(df: DataFrame, path: str) -> None:
    """Table→Avro export (S7, taar_etl/taar_profile_bigtable.py:112-132).

    Prefers the spark-avro connector (``org.apache.spark:spark-avro_2.13:
    <spark-version>`` — add via spark.jars.packages) when present; otherwise
    falls back to the in-repo OCF codec (avro_ocf): each partition
    serializes its rows to one container file inside ``path``, one file per
    partition, deflate codec, interop-tested against the Avro Java library.

    Fallback caveat: partition files are written with plain ``open()`` from
    executor tasks into a driver-created directory, so the fallback requires
    a filesystem shared between driver and executors (local mode, NFS). On
    a cluster with object storage, use the spark-avro connector — that is
    why ``avro_supported`` is checked first."""
    if avro_supported(df.sparkSession):
        df.write.format("avro").mode("overwrite").save(path)
        return
    _write_avro_fallback(df, path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (S8, taar_etl/taar_profile_bigtable.py:181-184). Connector
    when present; else binaryFile source + Arrow-batched OCF decode (the
    schema comes from the first file's header — one small driver-side head
    read, the row decode is executor-side)."""
    if avro_supported(spark):
        return spark.read.format("avro").load(path)
    return _read_avro_fallback(spark, path)


def _write_avro_fallback(df: DataFrame, path: str) -> None:
    import glob
    import os

    from taar_gcp_etl_spark.avro_ocf import avro_schema_for, encode_ocf

    avro_schema = avro_schema_for(df.schema)
    colnames = df.columns
    os.makedirs(path, exist_ok=True)
    # mode("overwrite") semantics: clear previous output so a re-run
    # replaces rather than accumulates (the connector path does the same)
    for stale in glob.glob(os.path.join(path, "*.avro")):
        os.remove(stale)

    def write_partition(batches):
        import os

        import pyarrow as pa
        from pyspark import TaskContext

        # Arrow batches, NOT pandas: pandas coerces int64-with-nulls to
        # float64, silently rounding longs past 2^53; to_pylist() keeps
        # exact ints / None / datetime values.
        rows: list[dict] = []
        for batch in batches:
            rows.extend(batch.to_pylist())
        if rows:
            # deterministic per-partition name: a retried or speculative
            # task overwrites its own file instead of adding a duplicate
            pid = TaskContext.get().partitionId()
            fname = f"part-{pid:05d}.avro"
            content = encode_ocf(rows, avro_schema, sync_seed=fname.encode())
            with open(os.path.join(path, fname), "wb") as fh:
                fh.write(content)
            yield pa.RecordBatch.from_pydict(
                {"path": [fname], "n": [len(rows)]}
            )

    # the collected result is one tiny row per partition (bounded), not data
    df.select(*colnames).mapInArrow(
        write_partition, schema="path string, n long"
    ).collect()


def _read_avro_fallback(spark: SparkSession, path: str) -> DataFrame:
    from taar_gcp_etl_spark.avro_ocf import (
        decode_ocf,
        decode_ocf_header,
        spark_schema_for,
    )

    # Schema sniff through the binaryFile source (works on any
    # Hadoop-visible path, not just the driver's local filesystem) and a
    # header-only parse — no row decode on the driver. binaryFile does
    # materialize the first file's bytes; only the header is parsed.
    head_rows = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
        .limit(1)
        .collect()
    )
    if not head_rows:
        raise FileNotFoundError(f"no .avro files under {path}")
    file_schema = decode_ocf_header(bytes(head_rows[0]["content"]))
    spark_schema = spark_schema_for(file_schema)
    names = [f.name for f in spark_schema.fields]

    def decode(batches):
        # Arrow arrays per column, NOT a pandas DataFrame: pandas coerces
        # int64-with-nulls to float64, silently rounding longs past 2^53 on
        # read-back (the write path avoids pandas for the same reason —
        # this keeps the fallback roundtrip symmetric and exact).
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        for batch in batches:
            rows: list[dict] = []
            for content in batch.column(0):
                _, decoded = decode_ocf(content.as_py())
                rows.extend(decoded)
            if rows:
                cols = [
                    pa.array(
                        [r.get(name) for r in rows],
                        type=arrow_schema.field(i).type,
                    )
                    for i, name in enumerate(names)
                ]
                yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
        .mapInArrow(decode, schema=spark_schema)
    )


def write_columnar(
    df: DataFrame, path: str, fmt: str = "parquet", **options: str
) -> None:
    """Format-dispatched columnar write — parquet (default), ORC, CSV,
    JSON(-lines). ORC and CSV/JSON ship in every Spark distribution (no
    jar probe needed, unlike Avro); ORC carries the same predicate
    pushdown + column pruning contract as parquet, CSV/JSON are the
    interchange formats (schema-on-read, no pushdown — fine for edges of
    the pipeline, wrong for the 100 TB interior, which is why parquet
    stays the default everywhere else in this engine)."""
    if fmt not in ("parquet", "orc", "csv", "json"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_columnar(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """Format-dispatched read twin of write_columnar. For CSV/JSON pass
    an explicit ``schema`` in anything but exploratory code: schema
    inference costs an extra full pass over the data and quietly
    widens types (everything-nullable, ints→bigints) — at scale the
    inference pass alone can dominate the job."""
    if fmt not in ("parquet", "orc", "csv", "json"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        r = r.option("inferSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
