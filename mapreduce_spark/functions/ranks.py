"""Distributed prefix sums over compacted distributions.

The shared two-phase prefix-sum used by ccnet_buckets and
funnel_latency_stats (VERDICT r9 #6; window_ntile keeps its own inline
two-phase prefix-RANK of the same shape — a row_number variant, not this
cumsum): a naive ``Window.orderBy(key)``
cumsum funnels its whole input through ONE partition. Over a compacted
(key, count) distribution that input is bounded by the key domain, not
the corpus — which still blows up whenever the domain is fine-grained
(micro-scores, microsecond latencies). The two-phase form keeps the
per-row work partitioned and leaves a single partitionless window over
the <= NB coarse-cell totals — constant at ANY corpus size (audited in
tests/test_plan_audits.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

NB_CELLS = 256


def bounded_cumsum(
    dist: DataFrame, key: str, cnt: str, nb: int = NB_CELLS
) -> DataFrame:
    """Add ``cum_end`` = sum(cnt) over rows with key' <= key.

    ``dist`` must be a compacted distribution with an integer-typed
    ``key`` column (bigint/int — the cell split uses exact integer
    division, so a float key must be fixed-pointed first) and a ``cnt``
    column. Three phases: (1) a broadcast 1-row (min, max) aggregate
    range-buckets keys into ``nb`` coarse cells — exact DIV arithmetic,
    monotone in ``key``, so a cell never splits a key tie; (2) the
    cumsum runs WITHIN each cell (partitioned window, parallel); (3)
    each cell adds its prior-cells offset from an ``nb``-row cell-total
    cumsum — the only partitionless window, bounded by the constant
    ``nb`` regardless of scale.
    """
    rng = dist.agg(F.min(key).alias("_mn"), F.max(key).alias("_mx"))
    bucketed = dist.crossJoin(F.broadcast(rng)).withColumn(
        "_coarse",
        F.expr(f"(({key} - _mn) * {nb}) DIV (_mx - _mn + 1)"),
    )
    w_in = (
        Window.partitionBy("_coarse")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = bucketed.withColumn("_cum_in", F.sum(cnt).over(w_in))
    totals = bucketed.groupBy("_coarse").agg(F.sum(cnt).alias("_ct"))
    w_prior = Window.orderBy("_coarse").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = totals.withColumn(
        "_prior", F.coalesce(F.sum("_ct").over(w_prior), F.lit(0))
    ).select("_coarse", "_prior")
    return (
        intra.join(F.broadcast(prior), "_coarse")
        .withColumn("cum_end", F.col("_cum_in") + F.col("_prior"))
        .drop("_mn", "_mx", "_coarse", "_cum_in", "_prior")
    )
