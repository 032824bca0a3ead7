"""Binary sign quantization + Hamming search (the 1-bit tier).

Three claims, each with its own failure mode:

* bit packing is EXACT — a hand-constructed sign pattern must reproduce
  the two words bit-for-bit (an off-by-one in the bit split silently
  degrades every downstream distance);
* on a planted corpus whose neighbors sit at cosine 0.70-0.82 (Hamming
  ~16 vs ambient ~32, a ~4.5-sigma gap at 64 bits), both stages find
  essentially every partner;
* on near-random data where 1-bit ranking is genuinely weak (measured
  recall 0.26 at sf0.001), the exact re-rank stage must buy back a
  strict, material recall improvement (measured 0.60) — the claim the
  two-stage architecture rests on.
"""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_spark.operators.similarity import (
    TOP_K,
    hamming_rerank_topk,
    hamming_topk,
    sign_codes_frame,
)

SF_DIR = "/root/testdata/sf0.001"
DIM = 64
N_PAIRS = 150
PAIR_B_BASE = 1000
NOISE_BASE = 2000
N_NOISE = 200


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module", name="paired")
def paired_fixture(spark):
    rng = np.random.RandomState(7)
    ids, vecs, truth = [], [], {}
    for i in range(N_PAIRS):
        c = 0.70 + 0.12 * i / (N_PAIRS - 1)
        u = _unit(rng.randn(DIM))
        w = rng.randn(DIM)
        w = _unit(w - np.dot(w, u) * u)
        v = c * u + np.sqrt(1 - c * c) * w
        ids += [i, PAIR_B_BASE + i]
        vecs += [u, v]
        truth[i] = PAIR_B_BASE + i
    for j in range(N_NOISE):
        ids.append(NOISE_BASE + j)
        vecs.append(_unit(rng.randn(DIM)))
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, truth


def test_sign_packing_is_exact(spark):
    """Signs -,+,+,-,+,+,... (negative at i % 3 == 0) must pack to the
    exact two words and popcount — computed independently in Python."""
    hand = [(-1.0 if i % 3 == 0 else 1.0) for i in range(DIM)]
    hdf = spark.createDataFrame([(0, hand)], "vec_id long, embedding array<float>")
    r = sign_codes_frame(hdf).collect()[0]
    w0 = sum(1 << i for i in range(32) if i % 3 != 0)
    w1 = sum(1 << (i - 32) for i in range(32, 64) if i % 3 != 0)
    n_pos = sum(1 for i in range(DIM) if i % 3 != 0)
    assert (r["w0"], r["w1"], r["n_pos"]) == (w0, w1, n_pos)


@pytest.mark.parametrize("stage", [hamming_topk, hamming_rerank_topk])
def test_planted_partners_found(paired, stage):
    """Cosine >= 0.70 partners sit ~16 Hamming vs ambient ~32 — both
    stages must recover >= 95% of them (measured 1.0)."""
    df, truth = paired
    found = stage(df, TOP_K, N_PAIRS).collect()
    got = {(r["query_id"], r["vec_id"]) for r in found}
    recall = sum(1 for q, p in truth.items() if (q, p) in got) / len(truth)
    assert recall >= 0.95, f"partner recall {recall:.3f} < 0.95"


def test_rerank_buys_back_recall(spark):
    """On the near-random driver testdata, ranking by the 1-bit code
    alone is weak; the exact re-rank of the 4x shortlist must beat it
    STRICTLY and materially (measured 0.26 -> 0.60)."""
    from mapreduce_spark.registry import get_queries

    rows = get_queries()["hamming_recall_report"](spark, SF_DIR).collect()
    by_tier: dict[str, list[float]] = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r["recall"])
    ham = sum(by_tier["hamming"]) / len(by_tier["hamming"])
    rer = sum(by_tier["hamming_rerank"]) / len(by_tier["hamming_rerank"])
    assert rer > ham + 0.1, f"rerank {rer:.3f} not materially above {ham:.3f}"
    assert rer >= 0.5, f"rerank recall {rer:.3f} < 0.5"
