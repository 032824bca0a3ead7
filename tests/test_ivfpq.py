"""IVFADC — the composed production ANN tier (routing x compression).

On a planted clustered corpus (the test_ann_scaled geometry: 20 clusters
x 25 members at member-to-center cosine 0.85, so intra-cluster neighbors
dominate exact top-k), the composed tier must:

* honor routing STRUCTURALLY — every returned (query, vec) pair lies in
  one of the query's probed lists (a violated subset invariant means the
  ADC stage leaked candidates routing never admitted);
* keep results in-cluster — the trained quantizer's lists align with the
  planted clusters, so same-cluster share ~1.0;
* price the composition honestly — recall vs exact L2 is bounded below,
  and the routing stage costs almost nothing ON TOP of quantization
  (composed recall within 0.05 of unrouted full-corpus ADC): with a
  trained quantizer, what IVFADC loses is PQ's loss, which
  pq_recall_report_trained prices separately.
"""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_spark.operators.similarity import (
    IVF_CENT_REM,
    SCALED_IVF_CENT_MOD,
    SCALED_IVF_NPROBE,
    TOP_K,
    ivf_candidates,
    ivfpq_adc_topk,
    refined_centroids,
)

DIM = 64
N_CLUSTERS = 20
PER_CLUSTER = 25  # == SCALED_IVF_CENT_MOD -> one seed (id % 25 == 7) per cluster
MEMBER_COS = 0.85
N = N_CLUSTERS * PER_CLUSTER


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module", name="clustered")
def clustered_fixture(spark):
    rng = np.random.RandomState(11)
    ids, vecs = [], []
    for c in range(N_CLUSTERS):
        center = _unit(rng.randn(DIM))
        for m in range(PER_CLUSTER):
            w = rng.randn(DIM)
            w = _unit(w - np.dot(w, center) * center)
            vecs.append(MEMBER_COS * center + np.sqrt(1 - MEMBER_COS**2) * w)
            ids.append(c * PER_CLUSTER + m)
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


@pytest.fixture(scope="module", name="found")
def found_fixture(clustered):
    df, _ = clustered
    cent = refined_centroids(df, SCALED_IVF_CENT_MOD, IVF_CENT_REM)
    return ivfpq_adc_topk(
        df, cent, SCALED_IVF_NPROBE, k=TOP_K, n_queries=N
    ).collect()


def _exact_l2_truth(vecs) -> dict[int, set[int]]:
    """Exact top-{TOP_K} by L2 on the float32-quantized corpus — the
    same baseline ivfpq_recall_report grades against."""
    V = np.array([[np.float32(x) for x in v] for v in vecs], dtype=np.float64)
    d2 = ((V[:, None, :] - V[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return {
        q: set(int(i) for i in np.argsort(d2[q], kind="stable")[:TOP_K])
        for q in range(len(vecs))
    }


def _recall(found_rows, truth) -> float:
    got: dict[int, set[int]] = {}
    for r in found_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    return float(
        np.mean([len(truth[q] & got.get(q, set())) / TOP_K for q in truth])
    )


def test_ivfpq_honors_routing(clustered, found):
    """Subset invariant: the ADC stage may only score pairs routing
    admitted — every hit must sit in a probed list of its query."""
    df, _ = clustered
    cent = refined_centroids(df, SCALED_IVF_CENT_MOD, IVF_CENT_REM)
    cand = {
        (r["query_id"], r["vec_id"])
        for r in ivf_candidates(
            df, cent, SCALED_IVF_NPROBE, n_queries=N
        ).collect()
    }
    leaked = [(r["query_id"], r["vec_id"]) for r in found
              if (r["query_id"], r["vec_id"]) not in cand]
    assert not leaked, f"{len(leaked)} hits outside probed lists: {leaked[:5]}"


def test_ivfpq_stays_in_cluster(found):
    """The trained quantizer's lists align with the planted clusters, so
    essentially every ADC hit is a same-cluster vector (measured 1.0)."""
    assert len(found) >= N * TOP_K * 0.9
    same = sum(
        1 for r in found
        if r["query_id"] // PER_CLUSTER == r["vec_id"] // PER_CLUSTER
    )
    assert same / len(found) >= 0.95


def test_ivfpq_recall_decomposes_to_pq_loss(clustered, found):
    """Composed recall >= 0.5 vs exact L2 (measured 0.576 — PQ's 8-byte
    codes are the binding constraint), AND routing costs <= 0.05 recall
    on top of UNROUTED full-corpus ADC (nprobe >= |lists| makes routing
    admit everything, isolating quantization loss) — the trained coarse
    quantizer makes the 25x candidate-set reduction nearly free."""
    df, vecs = clustered
    truth = _exact_l2_truth(vecs)
    composed = _recall(found, truth)
    assert composed >= 0.5, f"composed IVFADC recall {composed:.3f} < 0.5"
    cent = refined_centroids(df, SCALED_IVF_CENT_MOD, IVF_CENT_REM)
    unrouted = ivfpq_adc_topk(
        df, cent, nprobe=10**6, k=TOP_K, n_queries=N
    ).collect()
    full_adc = _recall(unrouted, truth)
    assert composed >= full_adc - 0.05, (
        f"routing lost {full_adc - composed:.3f} recall "
        f"(composed {composed:.3f} vs full-ADC {full_adc:.3f})"
    )
