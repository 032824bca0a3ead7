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


def _simple_name(node) -> str:
    return node.getClass().getSimpleName()


def _node_children(node) -> list:
    """Physical children, unwrapping AQE query stages and reused
    exchanges (both print as leaves but wrap a real subtree)."""
    name = _simple_name(node)
    if name.endswith("QueryStageExec"):
        return [node.plan()]
    if name == "ReusedExchangeExec":
        return [node.child()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _walk(node):
    """Breadth-first traversal of the executed JVM plan tree."""
    from collections import deque

    q = deque([node])
    while q:
        n = q.popleft()
        yield n
        q.extend(_node_children(n))


def _metric_rows(node) -> int | None:
    # Limit-class operators are a STATIC bound — their output can never
    # exceed limit(), and their runtime metrics are unreliable
    # (TakeOrderedAndProject only populates shuffle metrics on some
    # plans, and a BFS that falls through it reads the pre-limit child).
    if _simple_name(node) in (
        "TakeOrderedAndProjectExec",
        "GlobalLimitExec",
        "LocalLimitExec",
        "CollectLimitExec",
    ):
        return int(node.limit())
    # numOutputRows where the operator defines it; shuffle exchanges
    # instead expose their row flow as records written/read (a limit(5)
    # that AQE plans as LocalLimit -> single-partition exchange has its
    # true row count ONLY on the exchange metrics).
    metrics = node.metrics()
    for key in ("numOutputRows", "shuffleRecordsWritten", "recordsRead"):
        opt = metrics.get(key)
        if opt.isDefined():
            return int(opt.get().value())
    return None


def _subtree_output_rows(node) -> int | None:
    """Runtime output rows of a subtree: the TOPMOST node carrying a
    numOutputRows SQLMetric (BFS order guarantees topmost-first)."""
    for n in _walk(node):
        rows = _metric_rows(n)
        if rows is not None:
            return rows
    return None


def _executed_tree(df: DataFrame):
    plan = df._jdf.queryExecution().executedPlan()
    if _simple_name(plan) == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    return plan


def nlj_build_rows(df: DataFrame, execute: bool = True) -> list[int]:
    """Runtime row count of the BUILD side of every nested-loop join (and
    the smaller side of every cartesian product) in the executed plan.

    This is the structural teeth behind the CARTESIAN_OK allowlist
    (VERDICT r6 #2): an allowlisted query's NLJ is only acceptable while
    its build side stays provably tiny (a 1-row aggregate, a <=5-row
    query set, a k-row centroid list). Reading the executed plan's own
    SQLMetrics turns that from a comment into a measured bound — a
    refactor that lets an unbounded frame reach an NLJ build side now
    fails the audit instead of silently OOMing at scale. -1 means the
    build side carried no measurable metric (treated as a failure by
    callers)."""
    if execute:
        df.collect()
    out: list[int] = []
    for n in _walk(_executed_tree(df)):
        name = _simple_name(n)
        if name == "BroadcastNestedLoopJoinExec":
            ch = _node_children(n)
            build = ch[0] if "BuildLeft" in n.buildSide().toString() else ch[1]
            rows = _subtree_output_rows(build)
            out.append(-1 if rows is None else rows)
        elif name == "CartesianProductExec":
            sides = [_subtree_output_rows(c) for c in _node_children(n)]
            known = [s for s in sides if s is not None]
            out.append(min(known) if known else -1)
    return out


def join_output_rows(df: DataFrame, execute: bool = True) -> dict[str, list[int]]:
    """Runtime numOutputRows of every JOIN node in the executed plan,
    keyed by the join's physical class name (BroadcastHashJoinExec,
    BroadcastNestedLoopJoinExec, SortMergeJoinExec, ...). This is how a
    cost GAUGE's claimed work integers get cross-checked against what
    the executed plan actually did (VERDICT r11 #6): the gauge says the
    two-level assignment scores |V| x K2 + stage2 candidates; those two
    numbers must literally appear as the stage-1 NLJ's and the stage-2
    hash join's output-row metrics. -1 = the node carried no
    numOutputRows metric."""
    if execute:
        df.collect()
    out: dict[str, list[int]] = {}
    for n in _walk(_executed_tree(df)):
        name = _simple_name(n)
        if "Join" not in name and name != "CartesianProductExec":
            continue
        rows = _metric_rows(n)
        out.setdefault(name, []).append(-1 if rows is None else rows)
    return out


def has_partitionless_window(df: DataFrame) -> bool:
    """Plan-only probe (no execution): does the tree contain a Window
    with an empty partitionBy? Used to pre-filter which queries the
    runtime window audit must actually execute."""
    for n in _walk(_executed_tree(df)):
        if _simple_name(n) in ("WindowExec", "WindowInPandasExec"):
            if n.partitionSpec().size() == 0:
                return True
    return False


def partitionless_window_input_rows(
    df: DataFrame, execute: bool = True
) -> list[int]:
    """Runtime input row count of every Window operator that has an EMPTY
    partitionBy (single-partition execution). Such windows are only
    acceptable above a LIMIT/aggregate producing a bounded frame
    (VERDICT r6 #8); this measures the actual frame size so the
    `WindowExec: No Partition Defined` warning can never silently attach
    to an unbounded input. -1 = no measurable child metric."""
    if execute:
        df.collect()
    out: list[int] = []
    for n in _walk(_executed_tree(df)):
        if _simple_name(n) not in ("WindowExec", "WindowInPandasExec"):
            continue
        if n.partitionSpec().size() != 0:
            continue
        rows = _subtree_output_rows(_node_children(n)[0])
        out.append(-1 if rows is None else rows)
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
