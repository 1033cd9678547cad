"""Scalar column functions (SURVEY.md §2.7, F1-F21)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_key(col: Column | str) -> Column:
    """F1 — sha256 hex digest of a UTF-8 string, bit-identical to
    hashlib.sha256(x.encode('utf8')).hexdigest()
    (reference: taar_etl/taar_utils.py:110-116,
    taar_etl/taar_profile_bigtable.py:304-307)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def try_long(col: Column | str) -> Column:
    """F2 — BigQuery SAFE_CAST(x AS int64): NULL on failure, never raises
    (reference: taar_etl/taar_profile_bigtable.py:78)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("long")


def coalesce_default(col: Column | str, default) -> Column:
    """F11 — the reference's pervasive `x or default` null-coalescing
    (reference: taar_etl/taar_profile_bigtable.py:236,244-246,272-290)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def hex_to_long(col: Column, digits: int = 15) -> Column:
    """Parse the first ``digits`` hex chars of a digest string into a
    non-negative bigint. 15 hex digits = 60 bits, safely inside int64.
    Used by the MinHash/SimHash family so the same expression is
    reproducible in the DuckDB oracle (('0x' || h)::bigint)."""
    return F.conv(F.substring(col, 1, digits), 16, 10).cast("long")


def stable_hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit hash of a string via md5 — engine-portable
    (identical in Spark and any oracle with md5), unlike xxhash64 whose
    seeding differs across engines. Slow path vs xxhash64; used only where
    cross-engine reproducibility matters (dedup sketches)."""
    return hex_to_long(F.md5(F.concat(F.lit(f"s{seed}:"), col)))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text — the shared primitive for
    the text-analysis and dedup operator families. Pure Column expression
    (codegen'd); no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")
