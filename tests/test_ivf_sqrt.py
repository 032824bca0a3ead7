"""Sqrt-law IVF coarse quantizer (VERDICT r10 #2): the routed graph
tier's K ~ sqrt(|V|) geometry applied to the IVF/IVFADC routing stage.

The old convention seeded K = |V|/SCALED_IVF_CENT_MOD centroids, so every
query scored a centroid set growing LINEARLY with the corpus (1e7-4e7
exact cosines/query at 1e9 vectors) before any list was probed. The
production family now seeds K = |{vec_id % ivf_cent_mod(|V|) ==
IVF_CENT_REM}| ~ sqrt(|V|) centroids (ivf_centroids_sqrt), keeping nprobe
constant, so routing cost AND expected probed-list volume both follow the
sqrt law. These tests pin that via the executed plan's own SQLMetrics
(tests/test_graph_beam.py::test_routed_entry_cost_sublinear's template):
the centroid crossJoin's broadcast build side IS the centroid table, so
its reported row count is the per-query/per-vector centroid-scoring cost.
"""

from __future__ import annotations

import math

import numpy as np

from mapreduce_spark.operators.similarity import (
    IVF_CENT_REM,
    SCALED_IVF_NPROBE,
    TOP_K,
    ann_ivf_topk,
    ivf_cent_mod,
    ivf_centroids_sqrt,
)
from mapreduce_spark.plans import audit


def _corpus(spark, n, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (vid, [float(x) for x in rng.normal(size=dim)]) for vid in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_ivf_cent_mod_law():
    """cent_mod = ceil(sqrt(n)) floored at IVF_CENT_REM + 1 (non-empty
    seed set), matching DuckDB's GREATEST(rem+1, ceil(sqrt(count(*))))
    bit-for-bit on the integer range the corpus lives in."""
    assert ivf_cent_mod(1) == IVF_CENT_REM + 1
    assert ivf_cent_mod(64) == IVF_CENT_REM + 1
    for n in (100, 500, 2000, 10**6, 10**9):
        assert ivf_cent_mod(n) == max(
            IVF_CENT_REM + 1, math.ceil(math.sqrt(n))
        )


def test_ivf_routing_cost_sublinear(spark):
    """The centroid-NLJ build side of the production IVF plan is pinned
    ~sqrt(|V|) at two corpus sizes — 16x the corpus must grow the
    centroid-scoring cost ~4x, not 16x (the fixed-modulus law). Every
    NLJ build side in the plan (Lloyd seeding + assignment + probe) must
    stay at or under the seed count K0, never the corpus."""
    costs = {}
    for n in (256, 4096):
        emb = _corpus(spark, n)
        cent = ivf_centroids_sqrt(emb)
        cm = ivf_cent_mod(n)
        k0 = sum(1 for v in range(n) if v % cm == IVF_CENT_REM)
        assert cent.count() <= k0  # Lloyd can only merge seeds, not add
        topk = ann_ivf_topk(emb, cent, SCALED_IVF_NPROBE, k=TOP_K)
        build_rows = audit.nlj_build_rows(topk)
        assert build_rows and all(0 < r <= k0 for r in build_rows), (
            build_rows,
            k0,
        )
        costs[n] = k0
    growth = costs[4096] / costs[256]
    assert 2.0 <= growth <= 6.0, costs


def test_sqrt_centroids_match_fixed_modulus_refinement(spark):
    """ivf_centroids_sqrt is refined_centroids at the computed modulus —
    same Lloyd step, only the seed geometry changes."""
    from mapreduce_spark.operators.similarity import refined_centroids

    emb = _corpus(spark, 300)
    cm = ivf_cent_mod(300)
    a = {
        (r["cid"], tuple(round(x, 9) for x in r["ce"]))
        for r in ivf_centroids_sqrt(emb).collect()
    }
    b = {
        (r["cid"], tuple(round(x, 9) for x in r["ce"]))
        for r in refined_centroids(emb, cm, IVF_CENT_REM).collect()
    }
    assert a == b
