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
