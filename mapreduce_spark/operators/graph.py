"""Iterative graph algorithms expressed as unrolled DataFrame plans.

The reference's MapReduce algebra is the textbook host for iterative
graph workloads (PageRank was THE motivating MapReduce example): each
iteration is a map (emit rank/out_degree along edges) + reduce (sum per
destination). Here each iteration is a join + partial-aggregated groupBy
— one shuffle keyed on dst — and the driver unrolls a fixed iteration
count into a single Catalyst plan (no collect, no driver loop over data).

Exactness discipline: ranks live in integer micro-units (1e-12) and every
division is integer ``div``, so both engines produce bit-identical BIGINT
ranks — float summation order never enters the fixpoint.

Scale shape: the rank table is |nodes| rows and the per-iteration shuffle
moves |edges| contribution rows (collapsed map-side); at 100 TB the edge
derivation (one user_id-keyed window over events) dominates and is done
ONCE, reused by every iteration.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduce_spark.registry import register
from mapreduce_spark.sources.tables import load_table

PR_ITERS = 3
PR_SCALE = 1_000_000_000_000  # rank micro-unit: 1e-12
# damping 0.85 as the exact rational 17/20; teleport 0.15 as 15/100.


def _sql_pagerank() -> str:
    """Unrolled DuckDB CTE chain mirroring the Spark plan iteration-for-
    iteration (integer arithmetic only, so both engines agree exactly)."""
    ctes = [
        """
    seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
    edges AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, edges.w, outw.out_w
          FROM edges JOIN outw USING (src)),
    r0 AS (SELECT node, """
        + f"{PR_SCALE} // n_nodes AS units FROM nodes CROSS JOIN nn)"
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""
    c{i} AS (
        SELECT e.dst, CAST(sum((r.units * e.w) // e.out_w) AS BIGINT) AS s
        FROM e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst),
    r{i} AS (
        SELECT node,
               (15 * {PR_SCALE}) // (100 * n_nodes)
               + (17 * coalesce(c{i}.s, 0)) // 20 AS units
        FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON c{i}.dst = node)"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT node AS event_type, units AS rank_units,
           round(CAST(units AS DOUBLE) / {PR_SCALE}, 9) AS pagerank
    FROM r{PR_ITERS}
    """
    )


@register("pagerank_transitions", oracle=_sql_pagerank())
def pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank(3 iterations, damping 0.85) over the event-type
    transition graph: nodes = event types, edge (a -> b) weighted by how
    often b follows a within a user's event stream.

    Each iteration: contributions = ranks ⋈ edges on src (rank mass split
    proportionally to edge weight, integer div), then one dst-keyed
    partial-aggregated shuffle; nodes with no inbound edges keep the
    teleport term via the left join. The unrolled plan re-derives the
    edge subtree per iteration — a fixed 3x constant, not a scaling
    hazard; for many-iteration runs at scale, checkpoint the aggregated
    edge table first (it is |node|^2-bounded — tiny — and the README's
    iterative-job note covers durable checkpointing), after which each
    iteration touches only |nodes|-sized state."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    edges = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = events.select(F.col("event_type").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(outw, "src")

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{PR_SCALE} div n_nodes").alias("units")
    )
    # The rank table is |nodes| rows. It is deliberately NOT hint-forced
    # onto the edge table: AQE measures the rank side at runtime and
    # broadcasts it while it fits autoBroadcastJoinThreshold (this graph:
    # a handful of event types — always), degrading to a shuffle join on
    # src when a 100 TB-scale node set outgrows the threshold. Same plan
    # text, size-driven strategy, no broadcast-OOM cliff; the broadcast-
    # under-threshold behavior is pinned by tests/test_plan_audits.py.
    # Only nn (a 1-row count) keeps an explicit broadcast hint.
    for _ in range(PR_ITERS):
        contrib = e.join(ranks, e.src == ranks.node).select(
            "dst", F.expr("(units * w) div out_w").alias("c")
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(summed, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.expr(f"(15 * {PR_SCALE}) div (100 * n_nodes)")
                    + F.expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20")
                ).alias("units"),
            )
        )
    return ranks.select(
        F.col("node").alias("event_type"),
        F.col("units").alias("rank_units"),
        F.round(F.col("units").cast("double") / PR_SCALE, 9).alias("pagerank"),
    )
