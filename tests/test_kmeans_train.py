"""kmeans_train_iters / kmeans_train_scaled: the checkpointed Lloyd
training loop's convergence laws.

Spherical k-means (assign by cosine, update by the mean — the mean
direction maximizes summed cosine) is monotone in the objective up to
the 1e-6 centroid quantization, and on a cleanly separated corpus it
must actually converge: n_changed -> 0 and stay there.
"""

from __future__ import annotations

import pytest

from mapreduce_spark.operators.similarity import (
    KMEANS_ROUNDS,
    _kmeans_train_frame,
)


def _planted_embeddings(spark, tmp_path, flip=0):
    """20 vectors in two clean clusters around e0 and e1 (dim 4), with
    deterministic small per-vector perturbations; vec_ids 0-9 are
    cluster A, 10-19 cluster B, so the %10==7 seeds (7, 17) start one
    per cluster. ``flip`` swaps the first `flip` vectors of A toward B's
    axis so the seed assignment begins wrong and must migrate."""
    rows = []
    for i in range(20):
        base = [1.0, 0.0, 0.0, 0.0] if i < 10 else [0.0, 1.0, 0.0, 0.0]
        if i < flip:
            base = [0.1, 1.0, 0.0, 0.0]
        eps = [(i * 7 + d * 3) % 5 / 100.0 for d in range(4)]
        rows.append((i, [float(b + e) for b, e in zip(base, eps)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_kmeans_converges_on_planted_two_cluster_corpus(spark, tmp_path):
    sf = _planted_embeddings(spark, tmp_path)
    card = _kmeans_train_frame(spark, sf, cent_mod=10, rounds=4).collect()
    assert [r.round for r in card] == [1, 2, 3, 4]
    # two clean clusters, one seed in each: both survive every round
    assert all(r.n_clusters == 2 for r in card)
    # full convergence: reassignments hit zero and stay there
    assert card[-1].n_changed == 0
    zeroed = False
    for r in card:
        if zeroed:
            assert r.n_changed == 0
        if r.n_changed == 0:
            zeroed = True
    assert zeroed


def test_kmeans_objective_monotone_nondecreasing(spark, tmp_path):
    """mean_cosine is the spherical-k-means objective; each full round
    (assign-argmax then mean-update) cannot decrease it beyond the 1e-6
    centroid quantization."""
    sf = _planted_embeddings(spark, tmp_path, flip=3)
    card = _kmeans_train_frame(spark, sf, cent_mod=10, rounds=5).collect()
    for a, b in zip(card, card[1:]):
        assert b.mean_cosine >= a.mean_cosine - 2e-6
    assert card[-1].mean_cosine > card[0].mean_cosine - 2e-6


def test_kmeans_testdata_card_is_sane(spark):
    """On the real sf0.001 table: K seeds exist, the card has the full
    round count, clusters never exceed the seed count, and reassignment
    churn is non-increasing from round 2 (round 1 measures against the
    raw seed assignment)."""
    card = _kmeans_train_frame(
        spark, "/root/testdata/sf0.001", cent_mod=100, rounds=KMEANS_ROUNDS
    ).collect()
    assert len(card) == KMEANS_ROUNDS
    assert all(1 <= r.n_clusters <= 5 for r in card)  # 500 vecs / mod 100
    assert all(0 <= r.n_changed <= 500 for r in card)
    assert all(-1.0 <= r.mean_cosine <= 1.0 for r in card)
    for a, b in zip(card, card[1:]):
        assert b.mean_cosine >= a.mean_cosine - 2e-6
