"""I/O surface tests: CTAS/drop (S6/S13), Avro (S7/S8, gated), url decode
parity (F12), serving-table layout, JSON artifact round-trip (S11/S12)."""

from __future__ import annotations

import urllib.parse

import pytest
from pyspark.sql import functions as F

from taar_gcp_etl_spark.io import (
    avro_supported,
    read_avro,
    read_json_artifact,
    read_table,
    write_avro,
    write_json_artifact,
    write_serving_table,
)
from taar_gcp_etl_spark.operators.serving import pack_serving_rows
from tests.conftest import SF_SMOKE


def test_ctas_and_drop(spark, tmp_path):
    """S6 — CREATE TABLE AS (staging materialization,
    taar_etl/taar_profile_bigtable.py:70-96) and S13 — DROP TABLE IF EXISTS
    (:98-110), via the session catalog."""
    read_table(spark, SF_SMOKE, "region").createOrReplaceTempView("region_src")
    # the v1 session catalog has no REPLACE TABLE — the reference's
    # CREATE OR REPLACE maps to drop-if-exists + CTAS
    spark.sql("DROP TABLE IF EXISTS tmp_profiles_test")
    spark.sql(
        "CREATE TABLE tmp_profiles_test USING parquet AS "
        "SELECT r_regionkey, r_name FROM region_src"
    )
    assert spark.table("tmp_profiles_test").count() == 5
    spark.sql("DROP TABLE IF EXISTS tmp_profiles_test")
    assert not spark.catalog.tableExists("tmp_profiles_test")
    spark.sql("DROP TABLE IF EXISTS tmp_profiles_test")  # not_found_ok parity


def test_avro_roundtrip(spark, tmp_path):
    """S7/S8 — Avro export + scan. Runs on EITHER path: the spark-avro
    connector when present, else the in-repo OCF fallback codec (avro_ocf)
    — distributed write (one container file per partition via mapInPandas)
    and binaryFile-source read."""
    df = read_table(spark, SF_SMOKE, "region")
    write_avro(df, str(tmp_path / "r.avro"))
    back = read_avro(spark, str(tmp_path / "r.avro"))
    assert back.schema == df.schema
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in df.collect()
    )


def test_avro_roundtrip_all_scalar_types(spark, tmp_path):
    """The fallback codec must cover the engine's scalar surface: strings,
    longs, ints, doubles, booleans, binary, timestamps, and nulls in every
    column."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("raw", T.BinaryType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rows = [
        ("é中", -(2**40), 7, -0.5, True, b"\x00\x01", dt.datetime(2024, 1, 15, 12, 30, 0, 123456)),
        (None, None, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema).repartition(2)
    write_avro(df, str(tmp_path / "t.avro"))
    back = read_avro(spark, str(tmp_path / "t.avro"))
    assert back.schema == schema
    got = sorted(
        [tuple(r) for r in back.collect()], key=lambda t: (t[0] is None, t)
    )
    want = sorted(rows, key=lambda t: (t[0] is None, t))
    assert got == want


def test_avro_roundtrip_exact_longs_with_nulls(spark, tmp_path):
    """Regression: nullable long columns must roundtrip EXACTLY. A pandas
    DataFrame built from list-of-dicts coerces int64-with-null to float64,
    rounding values past 2^53 ((1<<60)+1 -> 1.152921504606847e+18); the
    read fallback therefore builds pyarrow arrays per column instead."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("n", T.LongType())])
    vals = [((1 << 60) + 1,), ((1 << 62) + 7,), (None,), (-(1 << 60) - 3,)]
    df = spark.createDataFrame(vals, schema).repartition(2)
    write_avro(df, str(tmp_path / "big.avro"))
    back = read_avro(spark, str(tmp_path / "big.avro"))
    assert back.schema == schema
    got = sorted((r.n for r in back.collect()), key=lambda v: (v is None, v))
    want = sorted((v[0] for v in vals), key=lambda v: (v is None, v))
    assert got == want


def test_avro_fallback_interops_with_java_avro(spark, tmp_path):
    """Files written by the fallback codec must be readable by the REAL
    Avro Java library (on the classpath) — the OCF format contract, not
    just a self-roundtrip."""
    import glob

    if avro_supported(spark):
        pytest.skip("connector present — fallback not exercised")
    df = read_table(spark, SF_SMOKE, "region")
    path = str(tmp_path / "interop.avro")
    write_avro(df, path)
    jvm = spark._jvm
    names = []
    for fname in glob.glob(path + "/*.avro"):
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(fname),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        while reader.hasNext():
            rec = reader.next()
            names.append(str(rec.get("r_name")))
        reader.close()
    assert sorted(names) == sorted(r.r_name for r in df.collect())


def test_url_decode_parity(spark):
    """F12 — url path split + percent-decode
    (taar_etl/taar_amodump.py:199-200): F.url_decode must match
    urllib.parse.unquote for the guid-in-URL extraction."""
    urls = [
        "https://amo/api/addon/uBlock0%40raymondhill.net/versions",
        "https://amo/api/addon/%7Bd10d0bf8-f5b5-c8b4-a8b2-2b9879e08c5d%7D/versions",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select(
        F.url_decode(
            F.regexp_extract("url", r"addon/([^/]+)/versions", 1)
        ).alias("guid")
    ).collect()
    want = [
        urllib.parse.unquote(u.split("addon/")[1].split("/versions")[0])
        for u in urls
    ]
    assert [r.guid for r in out] == want
    assert want[0] == "uBlock0@raymondhill.net"


def test_serving_table_layout(spark, tmp_path):
    """S9 — serving table must be key-prefix partitioned (256-way locality,
    taar_etl/taar_profile_bigtable.py:308 row-key design)."""
    ev = read_table(spark, SF_SMOKE, "events").limit(200)
    packed = pack_serving_rows(ev, "event_id", ["user_id", "event_type"])
    path = str(tmp_path / "serving")
    write_serving_table(packed, path)
    back = spark.read.parquet(path)
    assert "key_prefix" in back.columns
    prefixes = {r.key_prefix for r in back.select("key_prefix").distinct().collect()}
    assert all(len(p) == 2 for p in prefixes)
    # partition pruning: a point lookup by prefix reads one directory
    one = back.filter(F.col("key_prefix") == sorted(prefixes)[0])
    assert one.count() >= 1


def test_json_artifact_row_roundtrip(spark, tmp_path):
    """S11/S12 — row-shaped artifact dual-write + read-back with schema."""
    df = read_table(spark, SF_SMOKE, "region")
    write_json_artifact(df, str(tmp_path), "regions")
    back = read_json_artifact(
        spark, str(tmp_path / "latest" / "regions"), schema=df.schema
    )
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in df.collect()
    )


class TestColumnarFormats:
    def test_orc_roundtrip_with_pushdown(self, spark, tmp_path):
        """ORC ships in-distribution and honors the same scan contract
        as parquet: roundtrip is exact and a filter reaches the ORC scan
        as a pushed predicate."""
        from taar_gcp_etl_spark.io import read_columnar, write_columnar

        df = spark.createDataFrame(
            [(i, f"n{i}", i * 1.5) for i in range(100)],
            "id long, name string, score double",
        )
        p = str(tmp_path / "t.orc")
        write_columnar(df, p, "orc")
        back = read_columnar(spark, p, "orc")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )
        plan = (
            back.filter(F.col("id") > 90)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)" in plan

    def test_csv_and_json_roundtrip_with_schema(self, spark, tmp_path):
        from taar_gcp_etl_spark.io import read_columnar, write_columnar

        df = spark.createDataFrame(
            [(1, "a"), (2, "b,c"), (3, None)], "id long, txt string"
        )
        for fmt in ("csv", "json"):
            p = str(tmp_path / f"t.{fmt}")
            write_columnar(df, p, fmt)
            back = read_columnar(
                spark, p, fmt, schema="id long, txt string"
            )
            assert sorted(
                map(tuple, back.collect())
            ) == sorted(map(tuple, df.collect()))

    def test_unknown_format_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from taar_gcp_etl_spark.io import write_columnar

        df = spark.range(1)
        with _pytest.raises(ValueError, match="unsupported"):
            write_columnar(df, str(tmp_path / "x"), "xml")
