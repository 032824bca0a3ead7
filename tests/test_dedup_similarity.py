"""Invariant tests for the dedup + similarity families at sf0.001.

The DuckDB value-hash equivalence is the driver's gate; these tests pin
the *semantic invariants* a user relies on (thresholds honored, candidate
generation via key joins not cartesian, exact-vs-ANN containment).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_spark.operators import dedup as D
from mapreduce_spark.operators import similarity as S
from mapreduce_spark.registry import get_queries
from mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def qs():
    return get_queries()


def test_dedup_exact_partitions_all_docs(spark, sf_dir, qs):
    out = qs["dedup_exact"](spark, sf_dir)
    total_docs = load_table(spark, sf_dir, "documents").count()
    agg = out.agg(
        F.sum("n_copies").alias("n"), F.count(F.lit(1)).alias("groups")
    ).collect()[0]
    assert agg["n"] == total_docs  # every doc in exactly one content group
    assert agg["groups"] <= total_docs


def test_dedup_minhash_thresholds_and_ordering(spark, sf_dir, qs):
    rows = qs["dedup_minhash_lsh"](spark, sf_dir).collect()
    assert rows, "corpus contains seeded near-dups; expected pairs"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert D.JACCARD_THRESHOLD <= r["jaccard"] <= 1.0


def test_dedup_minhash_no_cartesian_in_plan(spark, sf_dir, qs):
    plan = qs["dedup_minhash_lsh"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_cluster_is_consistent_partition(spark, sf_dir, qs):
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in qs["dedup_cluster"](spark, sf_dir).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in qs["dedup_minhash_lsh"](spark, sf_dir).collect()
    ]
    total_docs = load_table(spark, sf_dir, "documents").count()
    assert len(labels) == total_docs  # every doc labeled, incl. singletons
    for doc, root in labels.items():
        assert root <= doc  # cluster id is the component minimum
        assert labels[root] == root  # roots are fixed points (keepers)
    for a, b in pairs:
        assert labels[a] == labels[b], f"near-dup pair ({a},{b}) split"


def test_dedup_ngram_jaccard_threshold(spark, sf_dir, qs):
    for r in qs["dedup_ngram_jaccard"](spark, sf_dir).collect():
        assert r["jaccard"] >= D.NGRAM_JACCARD_MIN


def test_dedup_simhash_identical_docs_same_signature(spark, sf_dir, qs):
    sig = qs["dedup_simhash"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = sig.join(docs, "doc_id").select("text", "simhash")
    n_texts = joined.select("text").distinct().count()
    n_pairs = joined.distinct().count()
    assert n_pairs == n_texts  # same text → same simhash, always
    for r in sig.limit(200).collect():
        assert 0 <= r["simhash"] < (1 << D.SIMHASH_BITS)


def test_dedup_embedding_cosine_threshold(spark, sf_dir, qs):
    for r in qs["dedup_embedding"](spark, sf_dir).collect():
        assert r["vec_a"] < r["vec_b"]
        assert r["cosine"] >= D.COSINE_THRESHOLD


def test_similarity_topk_shape_and_order(spark, sf_dir, qs):
    rows = qs["similarity_topk"](spark, sf_dir).collect()
    assert len(rows) == S.N_QUERIES * S.TOP_K
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for query_id, group in by_q.items():
        group.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in group] == list(range(1, S.TOP_K + 1))
        cosines = [r["cosine"] for r in group]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["vec_id"] != query_id for r in group)


def test_ann_results_subset_of_exact_scores(spark, sf_dir, qs):
    # ANN cosines are exact cosines of a candidate subset: every ANN hit's
    # score must equal the exact score for that (query, vec) pair.
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in qs["similarity_topk"](spark, sf_dir).collect()
    }
    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        rows = qs[name](spark, sf_dir).collect()
        assert rows, name
        hits = sum(
            1
            for r in rows
            if (r["query_id"], r["vec_id"]) in exact
            and exact[(r["query_id"], r["vec_id"])] == r["cosine"]
        )
        # recall vs exact top-k: tuned families should recover a majority
        assert hits / len(rows) > 0.3, f"{name} recall collapsed: {hits}/{len(rows)}"


def test_ann_no_cartesian_candidate_join(spark, sf_dir, qs):
    # LSH candidates must come from the bucket equi-join; IVF probes
    # ARE a (tiny, broadcast) nested-loop against centroids by design.
    plan = qs["similarity_ann_lsh"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_contamination_check_asymmetric_containment(spark, sf_dir, qs):
    rows = qs["contamination_check"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: (r["source"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        assert docs[r["bench_doc"]][0] == D.BENCH_SOURCE
        assert docs[r["train_doc"]][0] != D.BENCH_SOURCE
        assert D.CONTAM_THRESHOLD <= r["containment"] <= 1.0


def test_contamination_no_cartesian_in_plan(spark, sf_dir, qs):
    plan = (
        qs["contamination_check"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_catches_all_common_shingle_benchmark_doc(spark, tmp_path):
    """VERDICT r3's recall hole: a benchmark doc made ENTIRELY of common
    text (every shingle's corpus DF > NGRAM_DF_MAX) generated zero
    candidates under the r3 rare-shingle index and was silently missed.
    The benchmark-keyed inverted join must flag every containing train
    doc at containment 1.0."""
    from mapreduce_spark.registry import get_queries

    common = "the quick brown fox jumps over the lazy dog every single day"
    n_train = D.NGRAM_DF_MAX + 2  # every shingle DF = n_train + 1 > max
    rows = [(i, "en", common, "crawlA") for i in range(n_train)]
    rows.append((1000, "en", common, D.BENCH_SOURCE))  # the benchmark doc
    rows.append((1001, "en", "totally unrelated words about parquet row groups", "crawlA"))
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r["train_doc"], r["bench_doc"]): r["containment"]
        for r in get_queries()["contamination_check"](spark, str(tmp_path)).collect()
    }
    assert got == {(i, 1000): 1.0 for i in range(n_train)}


def test_incremental_index_matches_one_shot_cross_pairs(spark, sf_dir, qs, tmp_path):
    """Persist the MinHash index for 80% of the corpus, dedup the other
    20% against the RELOADED index, and require exactly the one-shot
    run's cross (old, new) pairs — the incremental flow loses nothing."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)

    bands, hashes = D.minhash_index(old)
    bands.write.mode("overwrite").parquet(str(tmp_path / "bands"))
    hashes.write.mode("overwrite").parquet(str(tmp_path / "hashes"))
    got = {
        (r["new_doc"], r["old_doc"], r["jaccard"])
        for r in D.dedup_against_index(
            new,
            spark.read.parquet(str(tmp_path / "bands")),
            spark.read.parquet(str(tmp_path / "hashes")),
        ).collect()
    }

    full = qs["dedup_minhash_lsh"](spark, sf_dir).collect()
    expect = set()
    for r in full:
        a_new, b_new = r["doc_a"] % 5 == 0, r["doc_b"] % 5 == 0
        if a_new and not b_new:
            expect.add((r["doc_a"], r["doc_b"], r["jaccard"]))
        elif b_new and not a_new:
            expect.add((r["doc_b"], r["doc_a"], r["jaccard"]))
    assert got == expect
    assert expect, "corpus should contain cross old/new near-dup pairs"


def test_kmeans_refine_partitions_all_vectors(spark, sf_dir, qs):
    # every vector lands in exactly one cluster; refined centroids keep
    # the embedding dimensionality and actually move off their seeds.
    # (Output is the flat (cid, n_members, pos, c) component frame —
    # driver-canon-safe — so centroids reassemble here by cid.)
    emb = load_table(spark, sf_dir, "embeddings")
    total, dims = emb.count(), len(emb.first()["embedding"])
    rows = qs["kmeans_refine"](spark, sf_dir).collect()
    cents: dict[int, dict[int, float]] = {}
    members: dict[int, int] = {}
    for r in rows:
        cents.setdefault(r["cid"], {})[r["pos"]] = r["c"]
        members[r["cid"]] = r["n_members"]
    assert sum(members.values()) == total
    seeds = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(
            F.col("vec_id") % S.IVF_CENT_MOD == S.IVF_CENT_REM
        ).collect()
    }
    assert set(cents) <= set(seeds)
    moved = 0
    for cid, comp in cents.items():
        assert sorted(comp) == list(range(dims))
        centroid = [comp[p] for p in range(dims)]
        if any(abs(a - b) > 1e-9 for a, b in zip(centroid, seeds[cid])):
            moved += 1
    assert moved > 0


def test_knn_label_votes_match_topk_neighbors(spark, sf_dir, qs):
    # the prediction must be recomputable from similarity_topk's output
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    topk = qs["similarity_topk"](spark, sf_dir).collect()
    votes: dict[int, dict[int, int]] = {}
    for r in topk:
        v = votes.setdefault(r["query_id"], {})
        lab = labels[r["vec_id"]]
        v[lab] = v.get(lab, 0) + 1
    for r in qs["knn_label"](spark, sf_dir).collect():
        v = votes[r["query_id"]]
        best = min(v, key=lambda lab: (-v[lab], lab))
        assert r["predicted_label"] == best
        assert r["votes"] == v[best]
        assert r["true_label"] == labels[r["query_id"]]
        assert r["is_correct"] == (best == labels[r["query_id"]])


def test_ann_recall_report_bounds_and_consistency(spark, sf_dir, qs):
    from mapreduce_spark.operators.similarity import N_QUERIES, TOP_K

    rep = {
        (r["tier"], r["query_id"]): r
        for r in qs["ann_recall_report"](spark, sf_dir).collect()
    }
    assert set(rep) == {
        (t, q) for t in ("lsh", "ivf") for q in range(N_QUERIES)
    }
    for r in rep.values():
        assert r["n_exact"] == TOP_K
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert r["recall"] == round(r["n_hits"] / r["n_exact"], 6)
    # recall must agree with an independent set intersection per tier
    exact_sets = {}
    for r in qs["similarity_topk"](spark, sf_dir).collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for tier, qname in (("lsh", "similarity_ann_lsh"), ("ivf", "similarity_ann_ivf")):
        ann_sets = {}
        for r in qs[qname](spark, sf_dir).collect():
            ann_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        for q in exact_sets:
            want = len(exact_sets[q] & ann_sets.get(q, set()))
            assert rep[(tier, q)]["n_hits"] == want


def test_embedding_pca_power_finds_dominant_axis(spark, tmp_path):
    """Vectors spread widely along dim 3 (and faintly elsewhere) must
    yield a principal direction dominated by dim 3, at full +-1000 units
    after max-abs renormalization."""
    import random

    from mapreduce_spark.operators.similarity import EMB_DIM

    rng = random.Random(7)
    rows = []
    for i in range(40):
        vec = [rng.uniform(-0.01, 0.01) for _ in range(EMB_DIM)]
        vec[3] = rng.choice([-1, 1]) * rng.uniform(0.3, 0.5)
        rows.append((i, vec, i % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    from mapreduce_spark.registry import get_queries

    got = {
        r["pos"]: r["axis_unit"]
        for r in get_queries()["embedding_pca_power"](spark, str(tmp_path)).collect()
    }
    assert len(got) == EMB_DIM
    assert abs(got[3]) == 1000  # dominant axis pegs the renormalizer
    others = [abs(v) for p, v in got.items() if p != 3]
    assert max(others) < 200  # everything else is noise-scale


def test_dedup_recall_report_semantics(spark, tmp_path):
    from mapreduce_spark.registry import get_queries

    base = "the quick brown fox jumps over the lazy dog again and again today"
    spark.createDataFrame(
        [
            (0, "en", base),
            (1, "en", base.upper()),  # exact normalized dup: J = 1.0, so the
            # minhash signatures are identical and every band collides —
            # the one case LSH can NEVER miss, keeping this deterministic
            (2, "en", "completely different words about spark shuffles"),
        ],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    (r,) = get_queries()["dedup_recall_report"](spark, str(tmp_path)).collect()
    assert r["n_true"] == 1
    assert r["n_found"] == 1
    assert r["recall"] == 1.0

    # a corpus with no near-dups: vacuous recall of 1.0, zero counts
    spark.createDataFrame(
        [(0, "en", "alpha beta gamma delta epsilon zeta"),
         (1, "en", "one two three four five six seven")],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/e/documents.parquet")
    (r2,) = get_queries()["dedup_recall_report"](spark, f"{tmp_path}/e").collect()
    assert (r2["n_true"], r2["n_found"], r2["recall"]) == (0, 0, 1.0)


def test_source_contamination_matrix_attribution(spark, tmp_path):
    from mapreduce_spark.registry import get_queries

    base = "the quick brown fox jumps over the lazy dog again and again today"
    spark.createDataFrame(
        [
            (0, "en", base, "crawlA"),
            (1, "en", base.upper(), "crawlB"),   # cross-source exact dup
            (2, "en", "unrelated text about catalyst optimizer rules", "crawlB"),
        ],
        "doc_id long, lang string, text string, source string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = get_queries()["source_contamination_matrix"](
        spark, str(tmp_path)
    ).collect()
    got = {(r["source_a"], r["source_b"]): r["n_pairs"] for r in rows}
    assert got == {("crawlA", "crawlB"): 1}  # one straddling pair, attributed


def test_cluster_stats_accounting(spark, tmp_path):
    """Sizes histogram must exactly account for every document, and the
    removable budget must equal docs minus clusters."""
    from mapreduce_spark.registry import get_queries

    base = "the quick brown fox jumps over the lazy dog again and again today"
    spark.createDataFrame(
        [
            (0, "en", base),
            (1, "en", base.upper()),      # exact dup of 0 -> one 2-cluster
            (2, "en", "unrelated words about catalyst optimizer internals"),
            (3, "en", "another singleton document with distinct vocabulary"),
        ],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = get_queries()["dedup_cluster_stats"](spark, str(tmp_path)).collect()
    got = {r["cluster_size"]: r for r in rows}
    assert got[1]["n_clusters"] == 2 and got[1]["n_removable"] == 0
    assert got[2]["n_clusters"] == 1 and got[2]["n_removable"] == 1
    assert sum(r["n_docs"] for r in rows) == 4
    assert sum(r["n_removable"] for r in rows) == 4 - sum(
        r["n_clusters"] for r in rows
    )


def test_minhash_signatures_match_inline_pipeline(spark, sf_dir):
    """The exported signature table equals what dedup_minhash_lsh
    computes inline (same base hashes, same permutations)."""
    from mapreduce_spark.operators.dedup import (
        N_PERMS,
        _doc_shingles,
        _minhash_sig,
        base_hashes,
    )
    from mapreduce_spark.registry import get_queries

    exported = get_queries()["minhash_signatures"](spark, sf_dir)
    sh = _doc_shingles(spark, sf_dir).filter(F.size("sgl") > 0)
    inline = sh.select(
        "doc_id",
        *[
            _minhash_sig(base_hashes(F.col("sgl")), i).alias(f"sig{i}")
            for i in range(N_PERMS)
        ],
    )
    cols = ["doc_id"] + [f"sig{i}" for i in range(N_PERMS)]
    a = sorted(tuple(r[c] for c in cols) for r in exported.collect())
    b = sorted(tuple(r[c] for c in cols) for r in inline.collect())
    assert a == b and len(a) > 0


def test_contamination_gate_bloom_matches_exact_intersection(spark, sf_dir, qs):
    """The Bloom-prefiltered gate must be BIT-identical to the naive
    exact plan (per-row array_intersect against the full benchmark
    shingle set): no false negatives from the bloom, false positives
    removed by the equi-join re-check."""
    got = {
        (r["doc_id"], r["source"], r["bench_overlap"])
        for r in qs["contamination_gate_bloom"](spark, sf_dir).collect()
    }
    from mapreduce_spark.functions.text import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")
    sgl = F.array_distinct(shingles(tokens("text"), 3))
    bench = (
        docs.filter(F.col("source") == D.BENCH_SOURCE)
        .select(F.explode(sgl).alias("s"))
        .agg(F.coalesce(F.collect_set("s"), F.array()).alias("bset"))
    )
    naive = {
        (r["doc_id"], r["source"], r["bench_overlap"])
        for r in (
            docs.filter(F.col("source") != D.BENCH_SOURCE)
            .select("doc_id", "source", sgl.alias("sgl"))
            .filter(F.size("sgl") > 0)
            .crossJoin(F.broadcast(bench))
            .select(
                "doc_id",
                "source",
                F.round(
                    F.size(F.array_intersect("sgl", "bset")).cast("double")
                    / F.size("sgl"),
                    6,
                ).alias("bench_overlap"),
            )
            .filter(F.col("bench_overlap") < D.CONTAM_THRESHOLD)
        ).collect()
    }
    assert got == naive and len(got) > 0


def test_bloom_filter_no_false_negatives_and_low_fpp(spark):
    """functions/bloom.py contract: every inserted value probes True;
    the probe-miss rate for 10k absent values stays under 2% at the
    default 2^19-bit / 4-hash geometry with 5k inserted values."""
    from mapreduce_spark.functions.bloom import bloom_build, bloom_probe

    vals = spark.range(5000).select(F.concat(F.lit("in-"), "id").alias("v"))
    absent = spark.range(10000).select(F.concat(F.lit("out-"), "id").alias("v"))
    bloom = bloom_build(vals, "v")
    probed_in = (
        vals.withColumn("_k", F.lit(1))
        .join(F.broadcast(bloom.withColumn("_k", F.lit(1))), "_k")
        .select(bloom_probe(F.col("bw"), F.col("v")).alias("hit"))
        .agg(F.sum(F.col("hit").cast("int")).alias("n"))
        .collect()[0]["n"]
    )
    assert probed_in == 5000  # zero false negatives, by construction
    fp = (
        absent.withColumn("_k", F.lit(1))
        .join(F.broadcast(bloom.withColumn("_k", F.lit(1))), "_k")
        .select(bloom_probe(F.col("bw"), F.col("v")).alias("hit"))
        .agg(F.sum(F.col("hit").cast("int")).alias("n"))
        .collect()[0]["n"]
    )
    assert fp / 10000 < 0.02


def test_semdedup_drops_near_twin_keeps_distant(spark, tmp_path):
    """Two planted near-parallel vectors in the same centroid cell: the
    higher id is dropped with the lower as keeper; an orthogonal vector
    survives. Centroid seeds are vec_id % 100 == 7."""
    from mapreduce_spark.registry import get_queries

    base = [0.0] * 64
    base[0] = 1.0
    twin = [0.0] * 64
    twin[0] = 0.98
    twin[1] = 0.05
    ortho = [0.0] * 64
    ortho[32] = 1.0
    rows = [
        (7, base, 0),      # centroid seed AND member
        (50, twin, 0),     # near-duplicate of 7 -> dropped, keeper 7
        (107, ortho, 1),   # second centroid seed, far from everything
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {
        (r["drop_id"], r["keep_id"])
        for r in get_queries()["semdedup_clusters"](spark, str(tmp_path)).collect()
    }
    assert got == {(50, 7)}


def test_contamination_gate_bloom_empty_benchmark_keeps_everything(spark, tmp_path):
    """No benchmark slice -> all-zero bloom -> zero candidates -> every
    doc kept at overlap 0.0 (the advisor-flagged divergence class: an
    empty static side must mean 'no contamination', not NULL-drop)."""
    from mapreduce_spark.registry import get_queries

    rows = [
        (0, "en", "some perfectly ordinary training text here", "crawlA"),
        (1, "en", "another unrelated document about something else", "crawlB"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r["bench_overlap"]
        for r in get_queries()["contamination_gate_bloom"](spark, str(tmp_path)).collect()
    }
    assert got == {0: 0.0, 1: 0.0}


def test_dedup_keep_best_elects_max_quality_keeper(spark, sf_dir, qs):
    """keep-best partitions documents identically to dedup_cluster but
    elects the (quality desc, doc_id asc)-max member of each cluster."""
    rows = qs["dedup_keep_best"](spark, sf_dir).collect()
    cluster_of = {
        r["doc_id"]: r["cluster_id"]
        for r in qs["dedup_cluster"](spark, sf_dir).collect()
    }
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == cluster_of
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        keepers = [m for m in members if m["is_keeper"]]
        assert len(keepers) == 1
        best = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]


def test_hybrid_rrf_fuses_both_rankings(spark, sf_dir, qs):
    """Every fused doc comes from at least one input list, its rrf score
    reconstructs exactly from the two ranks, and the output is ordered by
    fused score with the doc_id tie-break."""
    from mapreduce_spark.operators.similarity import (
        HYBRID_LIST_K,
        HYBRID_SEM_QUERY,
        HYBRID_TOP_K,
        RRF_K,
    )
    from mapreduce_spark.operators.textops import bm25_topk

    rows = qs["hybrid_rrf"](spark, sf_dir).collect()
    assert 0 < len(rows) <= HYBRID_TOP_K
    lex_ids = [r["doc_id"] for r in bm25_topk(spark, sf_dir).collect()]
    for r in rows:
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
        if r["lex_rank"] is not None:
            assert lex_ids[r["lex_rank"] - 1] == r["doc_id"]
            assert 1 <= r["lex_rank"] <= HYBRID_LIST_K
        if r["sem_rank"] is not None:
            assert 1 <= r["sem_rank"] <= HYBRID_LIST_K
            assert r["doc_id"] != HYBRID_SEM_QUERY
        expect_nano = sum(
            round(1e9 / (RRF_K + rk))
            for rk in (r["lex_rank"], r["sem_rank"])
            if rk is not None
        )
        assert round(r["rrf"] * 1e9) == expect_nano
    scores = [(round(r["rrf"] * 1e9), -r["doc_id"]) for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_embedding_outliers_are_the_most_distant_per_label(spark, sf_dir, qs):
    """Flagged vectors are exactly the k most-distant from their label
    centroid, per an independent float recompute (ranking margins are
    far above float error on this data)."""
    import math

    from mapreduce_spark.operators.similarity import EMB_OUTLIER_K

    rows = qs["embedding_outliers"](spark, sf_dir).collect()
    emb = {
        r["vec_id"]: (r["label"], r["embedding"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    by_label: dict[int, list] = {}
    for vid, (lab, vec) in emb.items():
        by_label.setdefault(lab, []).append((vid, vec))
    for lab, members in by_label.items():
        dim = len(members[0][1])
        cent = [
            sum(v[i] for _, v in members) / len(members) for i in range(dim)
        ]
        dists = sorted(
            (
                (math.dist(v, cent), vid)
                for vid, v in members
            ),
            key=lambda t: (-t[0], t[1]),
        )
        expect = [vid for _, vid in dists[:EMB_OUTLIER_K]]
        got = [r["vec_id"] for r in sorted(rows, key=lambda r: r["rank"])
               if r["label"] == lab]
        assert got == expect, f"label {lab}: {got} != {expect}"
        for r in rows:
            if r["label"] == lab:
                ref = next(d for d, vid in dists if vid == r["vec_id"])
                assert abs(r["dist"] - ref) < 1e-3


def test_knn_graph_neighbors_are_bucket_exact(spark, sf_dir, qs):
    """Every edge's cosine equals the exact pairwise cosine, ranks are
    dense per source, and each source's neighbor list is the true top-k
    of its LSH candidate set (validated against similarity_ann_lsh for
    the shared query vectors)."""
    from mapreduce_spark.operators.similarity import KNN_GRAPH_K, N_QUERIES

    rows = qs["knn_graph"](spark, sf_dir).collect()
    assert rows
    by_src: dict[int, list] = {}
    for r in rows:
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], []).append(r)
    for src, edges in by_src.items():
        edges.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in edges] == list(range(1, len(edges) + 1))
        assert len(edges) <= KNN_GRAPH_K
        cos = [r["cosine"] for r in edges]
        assert cos == sorted(cos, reverse=True)
    # the fixed-query ANN ranking must agree on the shared prefix
    ann = {}
    for r in qs["similarity_ann_lsh"](spark, sf_dir).collect():
        ann.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for q in range(N_QUERIES):
        if q not in by_src or q not in ann:
            continue
        ann_sorted = [t[1] for t in sorted(ann[q])][: len(by_src[q])]
        graph_sorted = [r["dst"] for r in sorted(by_src[q], key=lambda r: r["rank"])]
        assert graph_sorted == ann_sorted[: len(graph_sorted)]


def test_pq_codes_pick_nearest_seed_subvector(spark, sf_dir, qs):
    """Every sub-space code is the exact argmin seed per an independent
    float recompute (quantized to the same 1e4 grid), and seed vectors
    code to themselves with zero error."""
    from mapreduce_spark.operators.similarity import (
        EMB_DIM,
        PQ_SEED_MOD,
        PQ_SEED_REM,
        PQ_SUBS,
    )

    rows = {r["vec_id"]: r for r in qs["embedding_pq_codes"](spark, sf_dir).collect()}
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    assert set(rows) == set(emb)
    sub = EMB_DIM // PQ_SUBS
    seeds = [vid for vid in emb if vid % PQ_SEED_MOD == PQ_SEED_REM]
    import math

    def q(x):
        return math.floor(x * 10_000)

    for vid, r in list(rows.items())[:50]:
        # pq_code ships as the '_'-joined code string (driver-canon-safe)
        code = [int(c) for c in r["pq_code"].split("_")]
        vq = [q(x) for x in emb[vid]]
        for s_idx in range(PQ_SUBS):
            best = min(
                (
                    (
                        sum(
                            (vq[p] - q(emb[sid][p])) ** 2
                            for p in range(s_idx * sub, (s_idx + 1) * sub)
                        ),
                        sid,
                    )
                    for sid in seeds
                ),
            )
            assert code[s_idx] == best[1], (vid, s_idx)
        if vid % PQ_SEED_MOD == PQ_SEED_REM:
            assert code == [vid] * PQ_SUBS
            assert r["quant_mse"] == 0.0


def test_pq_adc_scores_reconcile_with_codes(spark, sf_dir, qs):
    """Each ADC score recomputes exactly as the sum of the query's
    sub-distances to the vector's OWN code entries, and per-query ranks
    are a dense 1..k ordered by (adc_d2, vec_id)."""
    from mapreduce_spark.operators.similarity import (
        EMB_DIM,
        PQ_SUBS,
        TOP_K,
    )
    import math

    rows = qs["similarity_pq_adc"](spark, sf_dir).collect()
    assert rows
    codes = {
        r["vec_id"]: [int(c) for c in r["pq_code"].split("_")]
        for r in qs["embedding_pq_codes"](spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    sub = EMB_DIM // PQ_SUBS

    def q(x):
        return math.floor(x * 10_000)

    def subd2(qid, sid, s_idx):
        return sum(
            (q(emb[qid][p]) - q(emb[sid][p])) ** 2
            for p in range(s_idx * sub, (s_idx + 1) * sub)
        )

    by_q: dict[int, list] = {}
    for r in rows:
        assert r["vec_id"] != r["query_id"]
        expect = sum(
            subd2(r["query_id"], codes[r["vec_id"]][s], s)
            for s in range(PQ_SUBS)
        )
        assert r["adc_d2"] == expect
        by_q.setdefault(r["query_id"], []).append(r)
    for edges in by_q.values():
        edges.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in edges] == list(range(1, len(edges) + 1))
        assert len(edges) <= TOP_K
        keys = [(r["adc_d2"], r["vec_id"]) for r in edges]
        assert keys == sorted(keys)


def test_pq_recall_report_reconciles_with_adc_and_exact_l2(spark, sf_dir, qs):
    """recall = |ADC top-k intersect exact-L2 top-k| / k, recomputed
    independently per query on raw vectors."""
    import math

    from mapreduce_spark.operators.similarity import N_QUERIES, TOP_K

    report = {r["query_id"]: r for r in qs["pq_recall_report"](spark, sf_dir).collect()}
    assert set(report) == set(range(N_QUERIES))
    adc = {}
    for r in qs["similarity_pq_adc"](spark, sf_dir).collect():
        adc.setdefault(r["query_id"], set()).add(r["vec_id"])
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def q(x):
        return math.floor(x * 10_000)

    for qid in range(N_QUERIES):
        d2s = sorted(
            (
                sum((q(a) - q(b)) ** 2 for a, b in zip(emb[qid], vec)),
                vid,
            )
            for vid, vec in emb.items()
            if vid != qid
        )
        exact_topk = {vid for _, vid in d2s[:TOP_K]}
        r = report[qid]
        assert r["n_exact"] == TOP_K
        assert r["n_hits"] == len(exact_topk & adc.get(qid, set()))
        assert r["recall"] == round(r["n_hits"] / TOP_K, 6)


def test_ngram_novelty_duplicate_scores_zero_original_full(spark, tmp_path):
    """The first doc owns every shingle (novelty 1.0); its exact copy
    owns none (0.0); a half-overlapping doc scores the novel fraction
    of ITS OWN distinct shingles."""
    a = "one two three four five six seven eight"
    rows = [
        (0, a),
        (1, a),                                  # exact copy
        (2, a + " nine ten eleven twelve"),      # extends a
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    from mapreduce_spark.registry import get_queries

    got = {
        r.doc_id: r
        for r in get_queries()["ngram_novelty"](spark, str(tmp_path)).collect()
    }
    assert got[0].novelty == 1.0
    assert got[1].novelty == 0.0
    # doc 2: shingles of a 12-token doc = 10; the 6 containing a token
    # past "eight" are new (shingles at positions 7..10 plus ...); exact:
    # shared with doc 0 = shingles fully inside the first 8 tokens = 6
    assert got[2].n_shingles == 10
    assert got[2].n_novel == 4
    assert got[2].novelty == 0.4
