"""Physical-plan introspection helpers.

The project's scale contract (SURVEY.md §4, BASELINE.json north star) is
verified by reading plans, not guessing: filters must reach the scan
(``PushedFilters``), projections must prune (``ReadSchema``), small dims
must broadcast, and hot expressions must stay inside WholeStageCodegen.
These helpers make those assertions testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (PySpark's .explain only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # type: ignore[attr-defined]


def has_pushed_filters(df: DataFrame) -> bool:
    """True if at least one scan in the plan carries pushed filters."""
    s = plan_string(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def scan_read_schema(df: DataFrame) -> list[str]:
    """The ReadSchema fragments of every file scan — check column pruning."""
    return [line.strip() for line in plan_string(df).splitlines() if "ReadSchema" in line]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the scale cost
    driver. Lower is better; bucketing/broadcasting exist to remove these.
    Counted on the simple plan (formatted mode prints each node twice)."""
    s = plan_string(df, "simple")
    return sum(
        1
        for line in s.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "Reused" not in line
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen stages (the ``*(n)`` markers in the simple
    plan). Zero on an un-finalized AQE plan is normal — check after an
    action or on subtrees."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", plan_string(df, "simple"))))


def node_count(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node name in the simple plan."""
    return plan_string(df, "simple").count(node)
