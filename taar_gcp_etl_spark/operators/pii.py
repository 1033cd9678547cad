"""PII detection / redaction over text columns.

A large-scale training-data pipeline scrubs personally identifiable
information before anything else sees the corpus (the reference ETL has the
same concern at the profile level: it ships a GDPR opt-out delete job,
`taar_etl/taar_profile_bigtable.py:430-476` — deletion of user-keyed rows on
request; redaction is the document-corpus twin of that contract).

Patterns are deliberately restricted to a regex dialect that behaves
identically under Java regex (Spark) and RE2 (DuckDB/Go): character
classes, bounded repetition, `\\b`, `\\d` — no backreferences, no
lookaround. That keeps every count and replacement oracle-checkable
across engines.

Scale: pure per-row Column maps (regexp_count / regexp_replace) — zero
shuffle, whole-stage codegen, linear in bytes. At 100 TB this runs at scan
speed; there is nothing to partition or broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared with the DuckDB oracle (queries.ORACLE_SQL) — single source of
# truth so both engines detect/redact the exact same spans.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"

# Replacement order matters and is part of the contract: emails first (an
# email may embed digits-and-dots the IP pattern would mangle), then IPs,
# then phones. Both engines apply the same sequence.
_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def redact(text: Column | str) -> Column:
    """The redacted text alone (composable into other projections)."""
    out = F.col(text) if isinstance(text, str) else text
    for pattern, token in _RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts + redacted text.

    Output: (id, n_emails, n_ips, n_phones, redacted) — counts as INT,
    redaction applied in rule order. Counts are of the PRE-redaction text
    (a span consumed by an earlier rule is still counted by its own rule,
    never double-counted by later ones since counting happens first).
    """
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        redact(t).alias("redacted"),
    )
