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


def _sort_unordered_lists(line: str) -> str:
    """Sort top-level comma-separated items inside the bracketed list of
    attribute-list plan lines (``Keys [n]: [...]``, ``Input [n]: [...]``,
    ``Results``/``Output``/``Functions``/``Aggregate Attributes``) and
    inside ``hashpartitioning(...)`` arguments.

    Catalyst emits these lists in ExpressionSet iteration order, which
    is hash-based and NOT stable across sessions (or even across two
    plannings in one session) when the keys were rewritten — observed
    live on validate_batch, whose grouping-set float keys gain
    ``knownfloatingpointnormalized(normalizenanandzero(...))`` wrappers
    and then reorder run-to-run (r11 ledger: its fingerprint churned in
    every consecutive identical-code entry pair). The ELEMENTS are the
    plan truth; their order here is planner-internal, so the
    fingerprint sorts them. A genuine plan change still lands: it adds,
    removes, or rewrites elements rather than permuting them."""
    import re

    def _sorted_inner(inner: str) -> str:
        parts, depth, cur = [], 0, []
        for ch in inner:
            if ch in "([<{":
                depth += 1
            elif ch in ")]>}":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur).strip())
        return ", ".join(sorted(parts))

    m = re.match(
        r"^(\s*(?:Keys|Input|Results|Output|Functions|Aggregate Attributes)"
        r"(?: \[\d+\])?\s*:\s*\[)(.*)(\]\s*)$",
        line,
    )
    if m:
        return m.group(1) + _sorted_inner(m.group(2)) + m.group(3)
    m = re.match(r"^(.*?\bhashpartitioning\()(.*?)(\).*)$", line)
    if m:
        return m.group(1) + _sorted_inner(m.group(2)) + m.group(3)
    return line


def normalize_plan(plan: str) -> str:
    """Normalized form of a formatted physical plan — the input to
    plan_fingerprint, exposed so tests can replay RAW plan text captured
    from other sessions (the cross-session stability fixtures).

    Stripped because they vary between identical-code plannings:
    - expression ids (``#123``), plan/subquery ids, size/row statistics,
      file paths (round 11);
    - RDD lineage ids and JVM call sites on ExistingRDD scans
      (``MapPartitionsRDD[272] at localCheckpoint at
      NativeMethodAccessorImpl.java:0`` — the id is a session counter
      and the call site flips between the named accessor and
      ``<unknown>`` with JIT state; round 12);
    - JVM lambda identities (``$$Lambda$5909/0x7fb8...@4ecf2761`` in
      MLlib DeserializeToObject arguments — class+object identity is
      per-JVM; round 12);
    - lambda variable counters (``lambda x_2#`` → ``lambda x_#`` — the
      suffix is a session-global counter shared across queries, so a
      query's OWN plan churns when other queries planned first;
      round 12);
    - ExpressionSet-ordered attribute lists (see _sort_unordered_lists;
      round 12)."""
    import re

    norm = re.sub(r"#\d+L?", "#", plan)
    norm = re.sub(r"\b(plan_id|id)=\d+", r"\1=", norm)
    norm = re.sub(r"(?i)\b(sizeInBytes|rowCount)=\S+", r"\1=", norm)
    norm = re.sub(r"(Location|InMemoryFileIndex|file:)[^\n,\]]*", r"\1", norm)
    norm = re.sub(r"\bMapPartitionsRDD\[\d+\]", "MapPartitionsRDD[]", norm)
    norm = re.sub(
        r"( at \w+) at [\w.<>$/]+:\d+", r"\1 at <site>", norm
    )
    norm = re.sub(
        r"\$\$Lambda(\$\d+/0x[0-9a-fA-F]+)?@[0-9a-fA-F]+", "$$Lambda", norm
    )
    norm = re.sub(r"\blambda (\w+?)_\d+#", r"lambda \1_#", norm)
    norm = "\n".join(_sort_unordered_lists(ln) for ln in norm.splitlines())
    norm = re.sub(r"\s+", " ", norm)
    return norm


def plan_fingerprint(df: DataFrame) -> str:
    """Stable 12-hex digest of the physical plan SHAPE (round 11,
    normalization hardened round 12 — see normalize_plan).

    Expression ids, plan/subquery ids, paths, statistics, RDD lineage
    ids, JVM lambda identities, lambda-variable counters and
    ExpressionSet list order are stripped so the fingerprint survives
    re-planning of an identical query ACROSS sessions, while operator
    changes (a join strategy flip, a lost pushdown, a new Exchange)
    change it. The bench trend ledger records one per query; the
    quarantine gate refuses to demote a regression flag whose plan
    changed since the previous round — a code change that moves a plan
    is exactly the flag a mass-demotion must not launder (VERDICT r10
    #3) — provided the fingerprint was STABLE across prior ledger
    entries (VERDICT r11 #1b, bench.stable_plan_changed)."""
    import hashlib

    return hashlib.sha256(
        normalize_plan(formatted_plan(df)).encode()
    ).hexdigest()[:12]


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
