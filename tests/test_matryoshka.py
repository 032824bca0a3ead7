"""Matryoshka truncation card: high recall iff the prefix carries the signal.

On an MRL-like planted corpus (cluster structure lives in the first 16
coordinates, the tail is low-amplitude noise) prefix search at d=16 must
recover nearly the full-width top-k — the 4x byte saving is real. On
the near-random driver testdata the same card reports ~0.22, proving the
measurement actually discriminates (truncation is NOT free on arbitrary
embeddings).
"""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_spark.operators.similarity import (
    EMB_DIM,
    TOP_K,
    _prefix_topk,
)

N_CLUSTERS = 10
PER_CLUSTER = 30
N = N_CLUSTERS * PER_CLUSTER


@pytest.fixture(scope="module", name="mrl_corpus")
def mrl_corpus_fixture(spark):
    rng = np.random.RandomState(37)
    rows = []
    for c in range(N_CLUSTERS):
        center = rng.randn(16)
        center /= np.linalg.norm(center)
        for m in range(PER_CLUSTER):
            head = center + 0.3 * rng.randn(16)
            tail = 0.05 * rng.randn(EMB_DIM - 16)
            v = np.concatenate([head, tail])
            rows.append((c * PER_CLUSTER + m, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _recall(approx_rows, exact_rows) -> float:
    exact: dict[int, set[int]] = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    got: dict[int, set[int]] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    return float(
        np.mean(
            [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
        )
    )


def test_prefix_search_recovers_topk_when_signal_is_in_the_prefix(mrl_corpus):
    exact = _prefix_topk(mrl_corpus, EMB_DIM, k=TOP_K).collect()
    d16 = _prefix_topk(mrl_corpus, 16, k=TOP_K).collect()
    r16 = _recall(d16, exact)
    assert r16 >= 0.8, f"d16 recall {r16:.3f} on an MRL-like corpus"


def test_card_discriminates_on_unstructured_embeddings(spark, sf_dir):
    from mapreduce_spark.registry import get_queries

    rows = get_queries()["matryoshka_recall_report"](spark, sf_dir).collect()
    by_tier: dict[str, list[float]] = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r["recall"])
    m16 = sum(by_tier["d16"]) / len(by_tier["d16"])
    m32 = sum(by_tier["d32"]) / len(by_tier["d32"])
    # near-random testdata: truncation must visibly hurt (the card's
    # whole value is that it MEASURES this instead of assuming MRL)
    assert m16 < 0.8 and m32 < 0.8, (m16, m32)
