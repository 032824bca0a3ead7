"""Min-label clustering over the k-NN graph: the reach law + planted
co-labeling.

* Reach law, exactly: on a hand-built chain graph 0-1-2-...-6, after
  L = KNN_CLUSTER_ITERS synchronous min-label rounds every node holds
  the minimum id within graph distance L — node v ends at max(0, v - L).
  An off-by-one in the unrolling (or accidental asynchronous
  propagation, which would collapse the whole chain to 0) fails this.
* Planted pairs: under the scaled LSH geometry the graph contains the
  planted partner edges (test_ann_scaled's law), so >= 90% of planted
  cosine-0.7+ pairs must end co-labeled.
"""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_spark.operators.similarity import (
    KNN_CLUSTER_ITERS,
    KNN_GRAPH_SCALED_K,
    SCALED_LSH_PLANES,
    SCALED_LSH_TABLES,
    knn_cluster_labels,
    knn_graph_edges,
)

DIM = 64
N_PAIRS = 80
PAIR_B_BASE = 1000
NOISE_BASE = 2000
N_NOISE = 150


def test_chain_reach_law(spark):
    n = 7
    emb = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in knn_cluster_labels(emb, edges).collect()
    }
    assert got == {v: max(0, v - KNN_CLUSTER_ITERS) for v in range(n)}


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module", name="paired")
def paired_fixture(spark):
    rng = np.random.RandomState(7)
    ids, vecs, truth = [], [], {}
    for i in range(N_PAIRS):
        c = 0.72 + 0.10 * i / (N_PAIRS - 1)
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
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ), truth


def test_planted_pairs_co_labeled(paired):
    df, truth = paired
    edges = knn_graph_edges(
        df, SCALED_LSH_PLANES, SCALED_LSH_TABLES, KNN_GRAPH_SCALED_K
    )
    labels = {
        r["vec_id"]: r["cluster_id"]
        for r in knn_cluster_labels(df, edges).collect()
    }
    hits = sum(1 for q, p in truth.items() if labels[q] == labels[p])
    recall = hits / len(truth)
    assert recall >= 0.9, f"co-label recall {recall:.3f} < 0.9"


def test_triangle_census_on_planted_clique_and_path(spark):
    """Hand-computed census: a 4-clique (every vertex: deg 3, 3
    triangles, coefficient 1.0) glued by one bridge edge to a 3-path
    (bridge and path vertices: 0 triangles, coefficient 0)."""
    from mapreduce_spark.operators.similarity import (
        mutual_knn_edges,
        triangle_census,
    )

    # clique {0,1,2,3}; bridge 3-4; path 4-5
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    # feed DIRECTED edges (both directions) through mutual_knn_edges to
    # also pin the mutuality rule: drop one direction of 4-5 -> edge gone
    directed = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    directed.remove((5, 4))
    ed = mutual_knn_edges(
        spark.createDataFrame(directed, "src long, dst long")
    )
    rows = {r.vec_id: r for r in triangle_census(ed).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}  # 5 dropped: one-sided edge
    for v in (0, 1, 2):
        assert rows[v].degree == 3
        assert rows[v].n_triangles == 3
        assert rows[v].clustering_coeff == 1.0
    assert rows[3].degree == 4 and rows[3].n_triangles == 3
    assert rows[3].clustering_coeff == round(2 * 3 / (4 * 3), 6)
    assert rows[4].degree == 1 and rows[4].n_triangles == 0
    assert rows[4].clustering_coeff == 0.0


def test_label_propagation_planted_two_clusters(spark):
    """On two well-separated embedding clusters with 20% seeds in each,
    label propagation must label EVERY vector correctly — the planted
    complement of the testdata card (where near-random embeddings give
    chance accuracy and the card honestly reports it)."""
    import os
    import tempfile

    from mapreduce_spark.operators.similarity import (
        EMB_DIM,
        LP_SEED_MOD,
        knn_label_propagation,
    )

    rows = []
    for j in range(60):
        cluster = j % 2  # even ids cluster 0, odd ids cluster 1
        vec = [0.0] * EMB_DIM
        vec[0] = 10.0 if cluster == 0 else -10.0
        vec[1 + (j % (EMB_DIM - 1))] = 0.1  # make vectors distinct
        rows.append((j, [float(x) for x in vec], cluster))
    spool = tempfile.mkdtemp(prefix="lp_planted_")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(spool, "embeddings.parquet")
    )
    out = knn_label_propagation(spark, spool).collect()
    assert len(out) == 60
    n_seed = sum(1 for r in out if r["seeded"])
    assert n_seed == len([j for j in range(60) if j % LP_SEED_MOD == 0])
    for r in out:
        assert r["label_prop"] is not None, r
        assert r["is_correct"] is True, r
