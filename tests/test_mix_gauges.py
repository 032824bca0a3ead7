"""Invariants of the round-5 curation gauges (bucket skew + mixture card).

Oracle parity pins cross-engine exactness; these tests pin the CLAIMS:
occupancy conservation and geometry bounds for lsh_bucket_stats, share
normalization and the temperature-flattening direction for
domain_mix_report.
"""

from __future__ import annotations

from mapreduce_spark.operators.similarity import (
    LSH_DYN_MIN_PLANES,
    LSH_TARGET_BUCKET,
    lsh_planes_for,
)
from mapreduce_spark.registry import get_queries

SF_DIR = "/root/testdata/sf0.001"


def test_bucket_stats_conserve_vectors(spark):
    """Every table of every profile must account for every vector exactly
    once (n_vectors == |V|), within the geometry's bucket bound
    (2^planes), with sum_sq >= n_vectors (equality iff singletons)."""
    rows = get_queries()["lsh_bucket_stats"](spark, SF_DIR).collect()
    n_v = {r["n_vectors"] for r in rows}
    assert len(n_v) == 1, f"occupancy not conserved across tables: {n_v}"
    dyn_planes = lsh_planes_for(next(iter(n_v)))
    bounds = {
        "demo": (4, 2**4),
        "scaled": (32, 2**8),
        "dyn": (32, 2**dyn_planes),
    }
    seen = {"demo": 0, "scaled": 0, "dyn": 0}
    for r in rows:
        tables, max_buckets = bounds[r["profile"]]
        seen[r["profile"]] += 1
        assert 1 <= r["n_buckets"] <= max_buckets
        assert r["max_bucket"] <= r["n_vectors"]
        assert r["sum_sq"] >= r["n_vectors"]
        assert r["cand_pairs"] >= 0
        assert r["cand_pairs"] <= r["sum_sq"] // 2
    assert seen == {"demo": 4, "scaled": 32, "dyn": 32}


def test_dyn_profile_pins_expected_occupancy(spark):
    """The dynamic-plane law's contract: expected occupancy
    |V| / 2^planes sits in (TARGET/2, TARGET] for every corpus size the
    law is evaluated at — checked at the fixture corpus and as a pure
    integer law across six decades of |V|."""
    rows = get_queries()["lsh_bucket_stats"](spark, SF_DIR).collect()
    n = next(r["n_vectors"] for r in rows)
    planes = lsh_planes_for(n)
    if (1 << planes) * LSH_TARGET_BUCKET > n * 2:
        # only the LSH_DYN_MIN_PLANES fixture floor may overshoot
        assert planes == LSH_DYN_MIN_PLANES
    for nn in (10**3, 10**4, 10**5, 10**6, 10**7, 10**9):
        p = lsh_planes_for(nn)
        assert (1 << p) * LSH_TARGET_BUCKET >= nn
        assert (1 << (p - 1)) * LSH_TARGET_BUCKET < nn or (
            p == LSH_DYN_MIN_PLANES
        )


def test_scaled_profile_cuts_pair_volume(spark):
    """The point of more planes: per-table candidate-pair volume under
    the scaled geometry (256 buckets) must be well below the demo's
    (16 buckets) — the all-pairs-degeneration defense, measured."""
    rows = get_queries()["lsh_bucket_stats"](spark, SF_DIR).collect()
    by = {"demo": [], "scaled": [], "dyn": []}
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


def test_epoch_capped_waterfill_planted(spark):
    """Planted skew: a tiny and a small source must hit the 4-epoch cap
    exactly while the huge source absorbs the remaining budget uniformly,
    and the allocation exhausts the budget (floor rounding aside)."""
    import os
    import tempfile

    from mapreduce_spark.operators.curation import (
        MIX_BUDGET_FRACTION,
        MIX_EPOCH_CAP,
        mix_epoch_capped,
    )

    rows, did = [], 0
    for source, n_docs, toks_per_doc in [
        ("tiny", 1, 10),
        ("small", 5, 10),
        ("huge", 100, 100),
    ]:
        for _ in range(n_docs):
            text = " ".join(f"t{did}x{j}" for j in range(toks_per_doc))
            rows.append((did, text, "en", source, len(text)))
            did += 1
    spool = tempfile.mkdtemp(prefix="waterfill_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(spool, "documents.parquet")
    )
    out = {r["source"]: r for r in mix_epoch_capped(spark, spool).collect()}
    total = sum(r["n_tokens"] for r in out.values())
    budget = total // MIX_BUDGET_FRACTION
    assert out["tiny"]["capped"] and out["small"]["capped"]
    assert not out["huge"]["capped"]
    for s in ("tiny", "small"):
        assert out[s]["alloc_tokens"] == out[s]["n_tokens"] * MIX_EPOCH_CAP
        assert abs(out[s]["epochs"] - MIX_EPOCH_CAP) < 1e-9
    assert out["huge"]["epochs"] < MIX_EPOCH_CAP
    allocated = sum(r["alloc_tokens"] for r in out.values())
    # one floor per uncapped source of slack, never over budget
    assert budget - 1 <= allocated <= budget


def test_epoch_capped_never_exceeds_budget_or_cap(spark):
    """On the fixture corpus: every source's epochs <= cap and the total
    allocation never exceeds the budget."""
    from mapreduce_spark.operators.curation import (
        MIX_BUDGET_FRACTION,
        MIX_EPOCH_CAP,
    )
    from mapreduce_spark.registry import get_queries

    rows = get_queries()["mix_epoch_capped"](spark, "/root/testdata/sf0.001").collect()
    total = sum(r["n_tokens"] for r in rows)
    assert sum(r["alloc_tokens"] for r in rows) <= total // MIX_BUDGET_FRACTION
    for r in rows:
        assert r["epochs"] <= MIX_EPOCH_CAP + 1e-9
        assert r["capped"] == (r["alloc_tokens"] == r["n_tokens"] * MIX_EPOCH_CAP) or r["capped"] is False
