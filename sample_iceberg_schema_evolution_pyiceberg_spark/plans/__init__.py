"""Physical-plan introspection helpers: the 100 TB design gate.

Used by tests to assert that plans have the shape that survives scale:
filters pushed to the parquet scan, projections pruned in ReadSchema,
small dims broadcast, aggregates partial'd map-side, whole-stage
codegen covering the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if ``fragment`` appears in the scan's PushedFilters list."""
    plan = formatted_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (projection
    pruning check)."""
    import re  # noqa: PLC0415

    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            cols.extend(re.findall(r"(\w+):", line.split("struct<", 1)[-1]))
    return cols


def has_operator(df: DataFrame, name: str) -> bool:
    """e.g. has_operator(df, 'BroadcastHashJoin'),
    has_operator(df, 'TakeOrderedAndProject')."""
    return name in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages in the (final) plan — AQE
    prints them as '*(n)' markers."""
    import re  # noqa: PLC0415

    plan = physical_plan(df).split("== Initial Plan ==")[0]
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
