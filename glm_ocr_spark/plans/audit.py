"""Physical-plan audit helpers.

The optimizer work here is *verification*, not custom rules (SURVEY.md §4:
no custom Catalyst rules are needed; the planner work we do by hand is stage
ordering, salting and checkpoint anti-joins). These helpers make plan
properties assertable in tests and inspectable in notebooks:

  - assert_no_exchange: the extraction hot path must stay a narrow map
    (north rule: only extracted spans cross the wire);
  - pushed_filters: predicate pushdown reached the parquet scan;
  - has_broadcast_join: small dims actually broadcast;
  - wholestage_codegen_spans: relational stages stay inside codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_exchange(df: DataFrame, context: str = "") -> None:
    plan = _executed_plan(df)
    if "Exchange" in plan:
        raise AssertionError(
            f"unexpected shuffle in plan{' for ' + context if context else ''}:"
            f"\n{plan}"
        )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    plan = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _executed_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (the ``*(n)`` markers) in the final
    executed plan. Executes the query: with AQE the final plan only
    materializes after a run, so this helper is for audits/tests on small
    inputs, not production paths."""
    df.collect()  # executes *this* plan so AQE finalizes it
    plan = _executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    if ids:
        return len(ids)
    return len(re.findall(r"WholeStageCodegen", plan))
