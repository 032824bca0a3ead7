"""OPQ dimension allocation must EARN the permutation.

Planted anisotropic corpus: 8 leading dimensions carry ~unit variance,
the remaining 56 carry ~0.05 — the axis-aligned skew real embedding
matrices show after PCA whitening is skipped. Contiguous PQ grouping
puts ALL the signal into sub-space 0 (whose 50-entry book can't cover
an 8-D Gaussian) and noise into the rest; variance-ranked round-robin
allocation gives every sub-space one strong dimension, so total
quantization MSE must drop materially. On isotropic data the
allocation is a permutation-invariance no-op.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from mapreduce_spark.operators.similarity import (
    EMB_DIM,
    PQ_PACK,
    _opq_alloc,
    _opq_ex_frame,
    _pq_ex_frame,
    _pq_pairs_trained_frame,
)

N_VECS = 300


@pytest.fixture(scope="module", name="aniso")
def aniso_fixture(spark):
    rng = np.random.RandomState(23)
    scale = np.array([1.0] * 8 + [0.05] * (EMB_DIM - 8))
    rows = [
        (int(i), [float(x) for x in rng.randn(EMB_DIM) * scale])
        for i in range(N_VECS)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _mean_mse(pairs) -> float:
    best = pairs.groupBy("vec_id", "sub_idx").agg(
        F.min(F.col("d2") * PQ_PACK + F.col("seed_id")).alias("packed")
    )
    row = best.agg(
        (
            F.sum(F.expr(f"packed div {PQ_PACK}")).cast("double")
            / (F.count(F.lit(1)) * (EMB_DIM // 8) * 100_000_000)
        ).alias("m")
    ).collect()[0]
    return float(row["m"])


def test_opq_allocation_cuts_mse_on_anisotropic_corpus(aniso):
    naive = _mean_mse(_pq_pairs_trained_frame(_pq_ex_frame(aniso)))
    opq = _mean_mse(_pq_pairs_trained_frame(_opq_ex_frame(aniso)))
    assert opq < naive * 0.8, (
        f"OPQ allocation should cut MSE >=20% on planted anisotropy: "
        f"opq {opq:.6f} vs naive {naive:.6f}"
    )


def test_opq_allocation_deals_every_variance_tier(aniso):
    """Structural check: the 8 high-variance dims (ranks 0-7) land in 8
    DIFFERENT sub-spaces under round-robin dealing."""
    ex0 = aniso.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * 10_000).cast("bigint").alias("xq"),
    )
    alloc = {r["pos"]: r["r"] for r in _opq_alloc(ex0).collect()}
    assert len(alloc) == EMB_DIM
    # the planted strong dims are positions 0..7; their ranks must be
    # the top 8, hence hit all 8 sub-spaces exactly once
    strong_subs = sorted(alloc[p] % 8 for p in range(8))
    assert sorted(alloc[p] for p in range(8)) == list(range(8))
    assert strong_subs == list(range(8))


def test_opq_is_isotropic_noop_on_mse_scale(spark):
    """On an isotropic corpus the allocation permutes comparably-scaled
    dims — MSE must stay within 15% of contiguous grouping (no silent
    regression from permuting)."""
    rng = np.random.RandomState(29)
    rows = [
        (int(i), [float(x) for x in rng.randn(EMB_DIM)])
        for i in range(N_VECS)
    ]
    iso = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    naive = _mean_mse(_pq_pairs_trained_frame(_pq_ex_frame(iso)))
    opq = _mean_mse(_pq_pairs_trained_frame(_opq_ex_frame(iso)))
    assert abs(opq - naive) <= naive * 0.15, (opq, naive)
