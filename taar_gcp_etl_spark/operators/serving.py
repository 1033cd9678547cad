"""Serving-table family: sha256 key pack + KV upsert/delete semantics.

Reference: the BigTable load stage (S9, taar_etl/taar_profile_bigtable.py:
295-329) builds row key = sha256(client_id) hex, one cell whose value is the
zlib-compressed JSON of the whole profile row. The engine's serving table is
a keyed columnar table: `key` (sha256 hex) + either typed columns (preferred:
predicate pushdown still works) or a packed JSON `payload` for byte-parity
with the reference contract. zlib is a storage codec → parquet compression.

The GDPR opt-out delete (S10, :193-223) is an anti-join rewrite — see
joins.anti_join_delete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taar_gcp_etl_spark.functions import sha256_key


def pack_serving_rows(
    df: DataFrame, id_col: str, payload_cols: list[str] | None = None
) -> DataFrame:
    """F1 + S9 — key = sha256(id), payload = compact JSON of the row
    (taar_etl/taar_profile_bigtable.py:304-327). `to_json(struct(...))`
    is whole-stage-codegen'd; no Python serialization."""
    cols = payload_cols or [c for c in df.columns if c != id_col]
    return df.select(
        sha256_key(F.col(id_col).cast("string")).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("payload"),
    )


def distinct_optout_keys(
    deletions: DataFrame, id_col: str, date_col: str, end_date, lookback_days: int
) -> DataFrame:
    """A2 + F1 — `SELECT DISTINCT client_id FROM deletion_request WHERE date
    BETWEEN end-N AND end` hashed to serving keys
    (taar_etl/taar_profile_bigtable.py:197-202,332-339)."""
    return (
        deletions.filter(
            F.col(date_col).between(
                F.date_sub(F.lit(end_date), lookback_days), F.lit(end_date)
            )
        )
        .select(sha256_key(F.col(id_col).cast("string")).alias("key"))
        .distinct()
    )
