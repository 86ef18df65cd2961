"""Plan inspection helpers.

The reference delegates all optimization to DuckDB (SURVEY §4); our
engine delegates to Catalyst — these helpers make the resulting
physical plans *assertable* so scale regressions (lost pushdown, a
dim join falling off broadcast, a global sort sneaking in) fail tests
instead of surfacing as 100 TB incidents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, plan
    pushed = plan.split("PushedFilters")[1]
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed:\n{plan}"


def assert_broadcast(df: DataFrame, min_count: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins:\n{plan}"
