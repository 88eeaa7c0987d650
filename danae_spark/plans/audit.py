"""Physical-plan audit utilities.

Inspects a DataFrame's executed/physical plan string to assert the plan
properties that matter at 100 TB: parquet filter pushdown, column-pruned
read schemas, broadcast vs shuffle joins, and whole-stage codegen
coverage. Used by tests to LOCK IN plan quality — a regression that
turns a broadcast join into a sort-merge join or drops a pushed filter
fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def scans(df: DataFrame) -> list[dict]:
    """Parquet scan nodes with their pushed filters and read schemas."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"\(\d+\) Scan parquet ?(.*?)\n(.*?)(?=\n\(\d+\)|\Z)", plan, re.S):
        body = m.group(2)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", body)
        schema = re.search(r"ReadSchema: struct<(.*?)>", body, re.S)
        out.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_columns": [
                    c.split(":")[0].strip()
                    for c in (schema.group(1).split(",") if schema else [])
                    if ":" in c
                ],
            }
        )
    return out


def join_strategies(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"codegen id : (\d+)", physical_plan(df))))


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    found = [s["pushed_filters"] for s in scans(df)]
    assert any(fragment in f for f in found), (
        f"no parquet scan pushes filter containing {fragment!r}; pushed: {found}"
    )


def assert_read_columns_at_most(df: DataFrame, table_cols: set[str], allowed: set[str]) -> None:
    """Column pruning: no scan of `table_cols`-shaped table reads columns
    outside `allowed`."""
    for s in scans(df):
        cols = set(s["read_columns"])
        if cols and cols <= table_cols:
            assert cols <= allowed, f"scan reads unpruned columns: {cols - allowed}"


def assert_no_cartesian(df: DataFrame) -> None:
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies, strategies
