"""Invariants of the round-5 curation gauges (bucket skew + mixture card).

Oracle parity pins cross-engine exactness; these tests pin the CLAIMS:
occupancy conservation and geometry bounds for lsh_bucket_stats, share
normalization and the temperature-flattening direction for
domain_mix_report.
"""

from __future__ import annotations

from mapreduce_spark.registry import get_queries

SF_DIR = "/root/testdata/sf0.001"


def test_bucket_stats_conserve_vectors(spark):
    """Every table of every profile must account for every vector exactly
    once (n_vectors == |V|), within the geometry's bucket bound
    (2^planes), with sum_sq >= n_vectors (equality iff singletons)."""
    rows = get_queries()["lsh_bucket_stats"](spark, SF_DIR).collect()
    n_v = {r["n_vectors"] for r in rows}
    assert len(n_v) == 1, f"occupancy not conserved across tables: {n_v}"
    bounds = {"demo": (4, 2**4), "scaled": (32, 2**8)}
    seen = {"demo": 0, "scaled": 0}
    for r in rows:
        tables, max_buckets = bounds[r["profile"]]
        seen[r["profile"]] += 1
        assert 1 <= r["n_buckets"] <= max_buckets
        assert r["max_bucket"] <= r["n_vectors"]
        assert r["sum_sq"] >= r["n_vectors"]
        assert r["cand_pairs"] >= 0
        assert r["cand_pairs"] <= r["sum_sq"] // 2
    assert seen == {"demo": 4, "scaled": 32}


def test_scaled_profile_cuts_pair_volume(spark):
    """The point of more planes: per-table candidate-pair volume under
    the scaled geometry (256 buckets) must be well below the demo's
    (16 buckets) — the all-pairs-degeneration defense, measured."""
    rows = get_queries()["lsh_bucket_stats"](spark, SF_DIR).collect()
    by = {"demo": [], "scaled": []}
    for r in rows:
        by[r["profile"]].append(r["cand_pairs"])
    demo_avg = sum(by["demo"]) / len(by["demo"])
    scaled_avg = sum(by["scaled"]) / len(by["scaled"])
    assert scaled_avg < demo_avg / 4, (
        f"scaled per-table pair volume {scaled_avg:.0f} not well below "
        f"demo {demo_avg:.0f}"
    )


def test_mix_report_shares_normalize_and_flatten(spark):
    """Both share columns must sum to ~1, and temperature alpha=0.5 must
    FLATTEN the mixture: every cell above the average token share is
    down-weighted (boost < 1.05) and the smallest cell is up-weighted
    (boost > 1) — the direction the recipe exists for."""
    rows = get_queries()["domain_mix_report"](spark, SF_DIR).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["target_share"] for r in rows) - 1.0) < 1e-3
    avg = 1.0 / len(rows)
    for r in rows:
        if r["token_share"] > 2 * avg:
            assert r["boost"] < 1.05, f"large cell up-weighted: {r}"
    smallest = min(rows, key=lambda r: r["token_share"])
    assert smallest["boost"] > 1.0, f"smallest cell not up-weighted: {smallest}"


def test_minhash_band_stats_conserve_docs(spark):
    """Every band must account for every (nonempty) doc exactly once,
    with 36 bands present and occupancy arithmetic self-consistent."""
    rows = get_queries()["minhash_band_stats"](spark, SF_DIR).collect()
    assert len(rows) == 36
    n_docs = {r["n_docs"] for r in rows}
    assert len(n_docs) == 1, f"doc mass differs across bands: {n_docs}"
    for r in rows:
        assert r["max_bucket"] <= r["n_docs"]
        assert r["sum_sq"] >= r["n_docs"]
        assert 0 <= r["cand_pairs"] <= r["sum_sq"] // 2
