"""Plan-inspection helpers (SURVEY.md §4).

The engine's optimizer posture is "declare the plan, let Catalyst pick the
physical strategy" — these helpers make that checkable: tests assert that
filters reached the parquet scan, projections pruned columns, dimension
joins went broadcast, and aggregates have a map-side partial phase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def plan_fingerprint(df: DataFrame) -> str:
    """Stable 12-hex digest of the physical plan SHAPE (round 11).

    Expression ids (``#123``), plan/subquery ids, paths and size/row
    statistics are stripped so the fingerprint survives re-planning of
    an identical query, while operator changes (a join strategy flip,
    a lost pushdown, a new Exchange) change it. The bench trend ledger
    records one per query; the quarantine gate refuses to demote a
    regression flag whose plan changed since the previous round — a
    code change that moves a plan is exactly the flag a mass-demotion
    must not launder (VERDICT r10 #3).
    """
    import hashlib
    import re

    plan = formatted_plan(df)
    norm = re.sub(r"#\d+L?", "#", plan)
    norm = re.sub(r"\b(plan_id|id)=\d+", r"\1=", norm)
    norm = re.sub(r"(?i)\b(sizeInBytes|rowCount)=\S+", r"\1=", norm)
    norm = re.sub(r"(Location|InMemoryFileIndex|file:)[^\n,\]]*", r"\1", norm)
    norm = re.sub(r"\s+", " ", norm)
    return hashlib.sha256(norm.encode()).hexdigest()[:12]


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mentions `fragment`."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line
        for line in plan.splitlines()
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in every scan's ReadSchema — the pruning check."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            inside = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(
                part.split(":")[0].strip()
                for part in inside.split(",")
                if ":" in part
            )
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operator names in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        for s in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        ):
            if s in line:
                out.append(s)
    return out


def has_partial_aggregate(df: DataFrame) -> bool:
    """True if the plan contains a map-side partial aggregation phase."""
    plan = formatted_plan(df)
    return "partial" in plan.lower() and "HashAggregate" in plan
