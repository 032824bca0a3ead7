"""Large-star/small-star connected components (Kiveris et al. 2014).

Pins: exact components on planted graphs (chain, forest + isolate),
agreement with dedup_cluster's converged min-label labels on testdata,
and the algorithm's POINT — logarithmic round count on a long chain,
where min-label propagation needs diameter rounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _labels(spark, edge_pairs, node_ids):
    from mapreduce_spark.operators.graph import cc_star

    edges = spark.createDataFrame(edge_pairs or [(0, 0)], "a bigint, b bigint")
    if not edge_pairs:
        edges = edges.filter(F.lit(False))
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id bigint")
    labels, rounds = cc_star(edges, nodes)
    return {r.id: r.component for r in labels.collect()}, rounds


def test_cc_star_chain_converges_logarithmically(spark):
    n = 64
    got, rounds = _labels(spark, [(i, i + 1) for i in range(n - 1)], range(n))
    assert got == {i: 0 for i in range(n)}
    # min-label needs 63 rounds on this chain; star contraction is O(log n)
    assert rounds <= 7, rounds


def test_cc_star_forest_and_isolate(spark):
    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21)]
    ids = [1, 2, 3, 10, 11, 12, 20, 21, 99]
    got, _ = _labels(spark, edges, ids)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 99: 99}


def test_cc_star_empty_edges_all_singletons(spark):
    got, rounds = _labels(spark, [], [5, 6, 7])
    assert got == {5: 5, 6: 6, 7: 7}
    assert rounds <= 1


def test_cc_star_components_matches_dedup_cluster(spark, sf_dir):
    from mapreduce_spark.registry import get_queries

    qs = get_queries()
    star = {
        (r.doc_id, r.cluster_id, r.is_keeper)
        for r in qs["cc_star_components"](spark, sf_dir).collect()
    }
    minlabel = {
        (r.doc_id, r.cluster_id, r.is_keeper)
        for r in qs["dedup_cluster"](spark, sf_dir).collect()
    }
    assert star == minlabel
