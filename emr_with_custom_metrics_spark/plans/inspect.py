"""Physical-plan inspection helpers — the engine's self-check surface.

At 100 TB the difference between a good and a bad plan is the job; these
helpers let tests and the bench assert plan PROPERTIES (filters pushed to
the scan, columns pruned, broadcast chosen, codegen coverage) instead of
eyeballing ``explain`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (ReadSchema) — pruning check."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the initial physical plan (AQE may remove some at
    runtime; this is the upper bound the logical shape commits to). Counts
    numbered plan NODES — the formatted output also repeats each node in a
    detail section, which must not double-count."""
    return len(set(re.findall(r"\((\d+)\) Exchange", formatted_plan(df))))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame, execute: bool = False) -> int:
    """Distinct whole-stage-codegen stages. Under AQE the codegen wrapping
    only exists in the FINAL adaptive plan, so pass ``execute=True`` (runs
    the query once) to observe it; without execution this returns 0 for
    adaptive plans — a property of AQE, not of the query."""
    if execute:
        # collect() drives THIS DataFrame's QueryExecution to its final
        # adaptive plan (count()/write() would spawn a different QE)
        df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # final adaptive plans star codegen'd operators as `*(stageId)`
    return len(set(re.findall(r"\*\((\d+)\)", s)))
