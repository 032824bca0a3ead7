"""Physical-plan audits: the 100 TB design checks, as code.

The reference has no optimizer to audit (SURVEY §4.1 — its plan is fixed);
on Spark the plan IS the performance contract, so these helpers turn the
scale checklist into assertions usable from tests and notebooks:

- did the filter/projection reach the parquet scan (pushdown/pruning)?
- is the dimension side of a join broadcast (no fact-table shuffle)?
- how many exchanges (shuffles) does the plan pay?
- did a pairwise operator degenerate into a cartesian product?

All helpers parse ``df.explain``'s formatted output — stable across Spark
4.x — and none of them execute the plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (does not execute the query)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """One-line-per-operator physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges are
    counted separately by broadcast_join_count)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning",
                          simple_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    """Number of BroadcastHashJoin operators in the plan."""
    return simple_plan(df).count("BroadcastHashJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    """Number of SortMergeJoin operators (shuffled joins) in the plan."""
    return simple_plan(df).count("SortMergeJoin")


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains a cartesian/nested-loop product."""
    plan = simple_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def whole_stage_codegen_count(df: DataFrame, execute: bool = True) -> int:
    """Distinct whole-stage-codegen regions. Under AQE codegen annotations
    only exist on the FINAL plan, so by default this runs the query once
    (small inputs only) and inspects the finalized plan."""
    if execute:
        # collect() runs df's OWN QueryExecution, finalizing its
        # AdaptiveSparkPlan in place (count() would plan a new query)
        df.collect()
    ids = set(re.findall(r"\[codegen id : (\d+)\]", physical_plan(df)))
    return len(ids)


def scan_read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def scans_with_pushed_filters(df: DataFrame) -> int:
    """How many scans carry at least one pushed-down filter."""
    plan = physical_plan(df)
    return sum(
        1
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.group(1).strip()
    )


def depth(s: str) -> int:
    """Tree depth of a plan line (indentation of the printed operator)."""
    return len(s) - len(s.lstrip(" :+-"))


def broadcast_subtrees(df: DataFrame) -> list[list[str]]:
    """The plan lines under each BroadcastExchange (indentation-scoped)."""
    lines = simple_plan(df).splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        sub = []
        for nxt in lines[i + 1 :]:
            if depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append(sub)
    return out


def fact_is_stationary(df: DataFrame, fact: str = "lineitem") -> bool:
    """True if no BroadcastExchange subtree streams RAW fact rows — i.e.
    the unaggregated fact is always the streamed/probe side of its joins.
    The core 100 TB join invariant: a plan that broadcasts the fact only
    works while the fact fits in memory, so it must never be the build
    side even when the local test-scale statistics would allow it.

    A fact scan BELOW an aggregation inside the broadcast subtree is
    allowed: that broadcasts a keyed rollup of the fact (e.g. a
    per-order max or a 1-row global extremum), whose size AQE measures
    at runtime — when the rollup outgrows the threshold the same plan
    degrades to a shuffled join, so the shape is size-driven, not a
    memory cliff."""
    for sub in broadcast_subtrees(df):
        for i, line in enumerate(sub):
            if fact not in line:
                continue
            d = depth(line)
            guarded = any(
                "Aggregate" in anc and depth(anc) < d for anc in sub[:i]
            )
            if not guarded:
                return False
    return True
