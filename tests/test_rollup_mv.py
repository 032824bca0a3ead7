"""Invariants of the incremental materialized-view lifecycle
(rollup_incremental_view): base+delta merge equals from-scratch state,
and the served view's merge-on-read aggregation plans NO Exchange off
the bucketed state table.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_spark.operators.analytics import (
    rollup_state,
    rollup_state_write,
    rollup_view_read,
)
from mapreduce_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_incremental_merge_equals_from_scratch(spark):
    """Writing base state then appending a delta's partials must serve a
    view identical to the rollup computed from scratch in one pass —
    the associativity contract, checked through the real disk path."""
    li = load_table(spark, SF_DIR, "lineitem")
    rollup_state_write(li.filter(F.col("l_orderkey") % 2 == 0), "mv_t1")
    rollup_state_write(
        li.filter(F.col("l_orderkey") % 2 == 1), "mv_t1", mode="append"
    )
    incremental = rollup_view_read(spark, "mv_t1")

    rollup_state_write(li, "mv_t2")  # one-shot, no delta
    oneshot = rollup_view_read(spark, "mv_t2")
    assert _canon(incremental) == _canon(oneshot)

    # The state itself matches a fresh in-memory partial aggregation.
    st = (
        spark.table("mv_t1")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("s_qty").alias("s_qty"),
            F.sum("s_price").alias("s_price"),
        )
    )
    assert _canon(st) == _canon(rollup_state(li))


def test_view_read_plans_no_exchange(spark):
    """The point of bucketing the state on the group keys: the served
    view's final aggregation must read the bucketed table with ZERO
    Exchange — a delta merge costs |keys| rows of local work, never a
    shuffle of the state."""
    li = load_table(spark, SF_DIR, "lineitem")
    rollup_state_write(li, "mv_t3")
    view = rollup_view_read(spark, "mv_t3")
    plan = view._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert view.count() > 0


def test_stream_view_equals_batch_view(spark):
    """The streaming fold (per-micro-batch partial appends) must serve
    the identical view as the batch lifecycle query — associativity
    makes batch boundaries invisible, and both share one oracle."""
    from mapreduce_spark.registry import get_queries

    qs = get_queries()
    batch = qs["rollup_incremental_view"](spark, SF_DIR)
    stream = qs["stream_rollup_view"](spark, SF_DIR)
    assert _canon(batch) == _canon(stream)
