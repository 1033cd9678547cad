"""amodump — AMO catalog ingestion: schema-coerce raw JSON records, enrich
with per-guid first_create_date, filter to enriched rows, emit the catalog
artifact.

Reference: taar_etl/taar_amodump.py — threaded REST fan-out (:102-124) →
addon_map (:211-226) → versions enrichment merge (:192-209) → P9 filter
(:95-99) → GCS artifact (:305-307).

Spark-first shape (SURVEY.md §3.2): the HTTP fan-out is an ingestion source
(sources/rest.py — partition-parallel mapInPandas replaces the 100-thread
pool); this module owns everything after bytes arrive: `from_json` marshal
(P12), J2 left-join enrichment, P9 filter, artifact sink.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taar_gcp_etl_spark.io import write_json_artifact
from taar_gcp_etl_spark.operators.filters import has_first_create_date, marshal
from taar_gcp_etl_spark.operators.joins import enrich_left_join
from taar_gcp_etl_spark.schemas import AMO_ADDON

ARTIFACT = "extended_addons_database"


def parse_catalog(raw: DataFrame) -> DataFrame:
    """P12 — marshal raw JSON (one string column `raw`) against the declared
    AMO schema: unknown keys dropped, missing keys null, scalars coerced
    (taar_etl/taar_amodump.py:255-291)."""
    return marshal(raw, AMO_ADDON).filter(F.col("guid").isNotNull())


def enrich_first_create_date(
    catalog: DataFrame, first_dates: DataFrame
) -> DataFrame:
    """J2 — merge per-guid first_create_date (from the versions endpoint,
    taar_etl/taar_amodump.py:192-209). The enrichment is catalog-sized or
    smaller → broadcast. Where the catalog row already carries a date the
    fetched one wins (the reference overwrites, :204-205)."""
    fd = first_dates.select(
        "guid", F.col("first_create_date").alias("_fetched_date")
    )
    return (
        enrich_left_join(catalog, fd, "guid", broadcast_enrichment=True)
        .withColumn(
            "first_create_date",
            F.coalesce(F.col("_fetched_date"), F.col("first_create_date")),
        )
        .drop("_fetched_date")
    )


def run(
    raw: DataFrame,
    first_dates: DataFrame,
    out_base: str,
    date: dt.date | None = None,
) -> DataFrame:
    """parse → enrich → P9 filter (keep only rows whose version fetch
    succeeded, taar_etl/taar_amodump.py:95-99) → map-shaped artifact."""
    catalog = enrich_first_create_date(parse_catalog(raw), first_dates)
    catalog = catalog.filter(has_first_create_date())
    write_json_artifact(catalog, out_base, ARTIFACT, date=date, key_col="guid")
    return catalog
