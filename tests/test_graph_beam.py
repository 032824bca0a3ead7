"""Graph-beam ANN (the NSW serving family): mechanism and cost law.

The driver testdata's embeddings are near-random (no graph walk can add
much there — graph_beam_recall_report documents the modest lift), so the
MECHANISM is proven on a planted corpus: a tight cluster whose only
landmark is one member. Entry-only search can rank just the landmarks;
the beam must walk the k-NN graph's intra-cluster edges and surface the
other members. The cost law — visited candidates per query bounded by
|entries| + rounds x beam x k, independent of |V| — is asserted from the
visited set itself.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from mapreduce_spark.operators.similarity import (
    BEAM_ROUNDS,
    BEAM_WIDTH,
    IVF_CENT_MOD,
    IVF_CENT_REM,
    KNN_GRAPH_K,
    LSH_PLANES,
    LSH_TABLES,
    N_QUERIES,
    graph_beam_topk,
    knn_graph_edges,
)
from mapreduce_spark.sources.tables import load_table


def _planted_corpus(spark, n=100, dim=64, seed=11):
    """Corpus where vec 7 (the only landmark under the % 100 == 7 rule)
    anchors a tight cluster {7, 20..24}; queries 0..4 sit in the same
    cluster; everything else is far-away noise."""
    rng = np.random.default_rng(seed)
    center = rng.normal(size=dim)
    center /= np.linalg.norm(center)
    rows = []
    cluster = {7, 20, 21, 22, 23, 24}
    for vid in range(n):
        if vid < N_QUERIES or vid in cluster:
            v = center + 0.05 * rng.normal(size=dim)
        else:
            v = rng.normal(size=dim)  # ambient: cosine ~0 to the center
        rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_beam_surfaces_cluster_members_entries_miss(spark):
    emb = _planted_corpus(spark)
    graph = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    ent, beam, _ = graph_beam_topk(emb, graph)
    ent_hits = {
        (r["query_id"], r["vec_id"]) for r in ent.collect()
    }
    beam_hits = {
        (r["query_id"], r["vec_id"]) for r in beam.collect()
    }
    planted = {20, 21, 22, 23, 24}
    # entry-only can rank ONLY landmark vectors (7 and noise landmarks);
    # the planted non-landmark members are unreachable without the walk
    assert not {v for _, v in ent_hits} & planted
    # the beam walks 7's out-edges and surfaces planted members for
    # every query
    for q in range(N_QUERIES):
        found = {v for qq, v in beam_hits if qq == q} & planted
        assert len(found) >= 2, (q, sorted(found))


def test_beam_recall_monotone_vs_entries(spark, sf_dir):
    from mapreduce_spark.registry import get_queries

    rep = get_queries()["graph_beam_recall_report"](spark, sf_dir)
    rows = {(r["tier"], r["query_id"]): r["recall"] for r in rep.collect()}
    for (tier, qid), rec in rows.items():
        if tier == "graph_beam":
            assert rec >= rows[("entries_only", qid)]


def test_beam_cost_law(spark, sf_dir):
    """Visited (= scored) candidates per query stay within
    |entries| + BEAM_ROUNDS x BEAM_WIDTH x KNN_GRAPH_K — the bound that
    makes serving cost independent of |V|."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    _, _, visited = graph_beam_topk(emb, graph)
    n_entries = emb.filter(
        F.col("vec_id") % IVF_CENT_MOD == IVF_CENT_REM
    ).count()
    bound = n_entries + BEAM_ROUNDS * BEAM_WIDTH * KNN_GRAPH_K
    per_q = visited.groupBy("query_id").count().collect()
    assert per_q
    for r in per_q:
        assert r["count"] <= bound, (r["query_id"], r["count"], bound)
    # scored once: no duplicate (query, vec) rows in the visited set
    assert visited.count() == visited.select("query_id", "vec_id").distinct().count()


def test_persisted_graph_beam_matches_in_memory(spark, sf_dir, monkeypatch):
    """The stored src-bucketed graph serves the identical ranking, and
    the serve-side plan contains no graph re-derivation (no LSH bucket
    explode — the stored scan replaces the whole build).

    The plan pin is asserted on the LAZY form (SPARK_GRAFT_NO_MATERIALIZE
    — the r12 A/B knob): the production path eagerly checkpoints each
    beam round (operators/artifacts.py), which truncates the visible
    lineage, so only the un-materialized plan can PROVE the serve path
    reads the stored scan and derives nothing. The rows comparison
    crosses the two modes (materialized in-memory walk vs lazy stored
    walk), pinning that materialization is value-neutral here."""
    from mapreduce_spark.operators.similarity import (
        GRAPH_INDEX_TABLE,
        graph_index_write,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph_index_write(emb)
    stored = spark.table(GRAPH_INDEX_TABLE)
    with monkeypatch.context() as m:
        m.setenv("SPARK_GRAFT_NO_MATERIALIZE", "1")
        _, beam_disk, _ = graph_beam_topk(emb, stored)
        disk_rows = sorted(map(tuple, beam_disk.collect()))
        plan = beam_disk._jdf.queryExecution().executedPlan().toString()
    graph = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    _, beam_mem, _ = graph_beam_topk(emb, graph)
    mem_rows = sorted(map(tuple, beam_mem.collect()))
    assert disk_rows == mem_rows
    # serve path never re-derives the graph: no bucket posexplode of the
    # corpus, no sign-code bit packing — just the stored scan
    assert "posexplode" not in plan.lower()
    assert GRAPH_INDEX_TABLE in plan


def test_routed_beam_surfaces_cluster_members(spark):
    """The routed entry must ROUTE: probing the query's nearest cells
    has to land in the planted cluster's cell and surface its members
    (directly or through the walk), with the per-query entry volume
    inside the nprobe x cap contract."""
    from mapreduce_spark.operators.similarity import (
        ROUTED_ENTRY_CAP,
        ROUTED_NPROBE,
        graph_beam_topk_routed,
        routed_entry,
    )

    emb = _planted_corpus(spark)
    graph = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    _, beam, _ = graph_beam_topk_routed(emb, graph)
    hits = {(r["query_id"], r["vec_id"]) for r in beam.collect()}
    planted = {20, 21, 22, 23, 24}
    for q in range(N_QUERIES):
        found = {v for qq, v in hits if qq == q} & planted
        assert len(found) >= 2, (q, sorted(found))
    _, _, entries = routed_entry(emb)
    per_q = entries.groupBy("query_id").count().collect()
    for r in per_q:
        assert r["count"] <= ROUTED_NPROBE * ROUTED_ENTRY_CAP


def test_routed_entry_cost_sublinear(spark):
    """VERDICT r9 #2's done-condition: the entry stage's scored-candidate
    count is pinned to ~sqrt(|V|), via the SQLMetrics the NLJ audit
    reads — the centroid crossJoin's build side IS the K centroids, so
    its reported row count is the per-query centroid-scoring cost. 16x
    the corpus must grow that cost ~4x (sqrt law), not 16x (the landmark
    tier's law), and the member-entry volume must stay inside the
    constant nprobe x cap bound at both sizes."""
    from mapreduce_spark.operators.similarity import (
        ROUTED_ENTRY_CAP,
        ROUTED_NPROBE,
        _routed_cent_mod,
        routed_entry,
    )
    from mapreduce_spark.plans import audit

    costs = {}
    for n in (256, 4096):
        emb = _planted_corpus(spark, n=n)
        scored0, cent, entries = routed_entry(emb)
        k_cents = cent.count()
        expected_k = sum(
            1 for v in range(n) if v % _routed_cent_mod(n) == 1
        )
        assert k_cents == expected_k
        # the SQLMetrics pin: every NLJ build side in the routed entry
        # plan is the centroid table — K rows, never the corpus
        build_rows = audit.nlj_build_rows(scored0)
        assert build_rows and all(r == k_cents for r in build_rows), (
            build_rows,
            k_cents,
        )
        for r in entries.groupBy("query_id").count().collect():
            assert r["count"] <= ROUTED_NPROBE * ROUTED_ENTRY_CAP
        costs[n] = k_cents
    # sqrt law: 16x corpus -> ~4x centroid-scoring cost, far below 16x
    growth = costs[4096] / costs[256]
    assert 2.0 <= growth <= 6.0, costs


def test_appended_vectors_discoverable(spark):
    """The append's point: a vector added AFTER the build is reachable
    by beam search only through append-written edges (its forward edge
    into the cluster landmark's reverse). Before the append it cannot
    appear in any ranking; after, every query surfaces it."""
    from mapreduce_spark.operators.similarity import (
        GRAPH_APPEND_TABLE,
        graph_index_append,
        graph_index_write,
        APPEND_MOD,
        APPEND_REM,
    )

    rng = np.random.default_rng(23)
    dim = 64
    center = rng.normal(size=dim)
    center /= np.linalg.norm(center)
    cluster = {7, 20, 21, 22, 33}  # 33 % 20 == 13: the appended member
    assert 33 % APPEND_MOD == APPEND_REM
    rows = []
    for vid in range(100):
        if vid < N_QUERIES or vid in cluster:
            v = center + 0.05 * rng.normal(size=dim)
        else:
            v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    base = emb.filter(F.col("vec_id") % APPEND_MOD != APPEND_REM)
    graph_index_write(base, GRAPH_APPEND_TABLE)
    _, beam0, _ = graph_beam_topk(emb, spark.table(GRAPH_APPEND_TABLE))
    assert 33 not in {r["vec_id"] for r in beam0.collect()}
    graph_index_append(emb, GRAPH_APPEND_TABLE)
    _, beam1, _ = graph_beam_topk(emb, spark.table(GRAPH_APPEND_TABLE))
    hits = {(r["query_id"], r["vec_id"]) for r in beam1.collect()}
    for q in range(N_QUERIES):
        assert (q, 33) in hits, q


def test_routed_persisted_serves_from_stored_artifacts(spark, sf_dir, monkeypatch):
    """The fully-persisted routed tier: identical rows to the in-plan
    routed form, and the serve plan contains NO routing derivation —
    no |V| x K nearest-centroid assignment (the member_rank window
    exists only at build time), no graph re-derivation. This is the
    r10 probe-bench lesson pinned: the in-plan routed probe re-derived
    the assignment at ~4x the landmark probe's latency.

    All plan pins run under SPARK_GRAFT_NO_MATERIALIZE (the r12 A/B
    knob): the production path eagerly checkpoints the beam rounds and
    the member table, which truncates the visible lineage — only the
    lazy plans can carry (or prove the absence of) the derivation
    markers. The final row comparison crosses modes (materialized
    routed walk vs the lazy forms), pinning value-neutrality."""
    from mapreduce_spark.operators.similarity import (
        BEAM_ROUNDS,
        BEAM_WIDTH,
        TOP_K,
        _beam_walk,
        graph_beam_topk_routed,
        graph_index_write_routed,
        routed_entry_from,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph_index_write_routed(emb, "t_graph_rt")
    with monkeypatch.context() as m:
        m.setenv("SPARK_GRAFT_NO_MATERIALIZE", "1")
        scored0, _ = routed_entry_from(
            emb,
            spark.table("t_graph_rt_cent"),
            spark.table("t_graph_rt_members"),
        )
        beam_disk, _ = _beam_walk(
            emb,
            spark.table("t_graph_rt"),
            scored0,
            BEAM_ROUNDS,
            BEAM_WIDTH,
            TOP_K,
        )
        disk_rows = sorted(map(tuple, beam_disk.collect()))
        plan = beam_disk._jdf.queryExecution().executedPlan().toString()
        graph = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
        _, beam_mem_lazy, _ = graph_beam_topk_routed(emb, graph)
        mem_plan = beam_mem_lazy._jdf.queryExecution().executedPlan().toString()
    assert "member_rank" not in plan  # assignment is build-time only
    assert "posexplode" not in plan.lower()  # no graph/bucket re-derivation
    assert "t_graph_rt" in plan
    # and the in-plan form DOES carry the assignment, so the pin is real
    assert "member_rank" in mem_plan
    # the production (materialized) routed walk returns the same rows
    graph2 = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    _, beam_mem, _ = graph_beam_topk_routed(emb, graph2)
    assert disk_rows == sorted(map(tuple, beam_mem.collect()))
