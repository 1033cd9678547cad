"""Local replica of the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB row-for-row (order-insensitive,
column-name-sorted) on the smoke fixtures.

This is stricter than eyeballing and cheaper than the driver round-trip; it
runs at sf0.001 by default so the full suite stays fast. The driver repeats
it at sf0.01 (first 50 registry entries); export
SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 to replicate that gate locally
over the ENTIRE registry.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE

QUERY_NAMES = sorted(entrymod.queries().keys())


def normalize(rows, colnames):
    """Sort columns by name, normalize cell values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # round-trip through repr at 12 significant digits: tolerant of
            # last-ulp differences, strict beyond that
            return f"{v:.12g}"
        if isinstance(v, int):
            return str(v)
        if v is None:
            return "\x00NULL"
        return str(v)

    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["event_type", "install_count"]


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only contract
        return

    res = duck.sql(oracle)
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
