"""The bucket-occupancy cap (VERDICT r5 #1): in-group pair enumeration
must never materialize O(c^2) pairs inside one aggregation group.

Three pins:
1. Branch parity — both strategies produce the identical pair set, so
   correctness is invariant to where the cap sits (forced by running the
   same bucketed frame with cap=2 and cap=10**6).
2. The planted hot bucket — 10,000 copies of one band key (the
   boilerplate-page scenario) completes and yields exactly C(10^4, 2)
   pairs; under the uncapped r5 form this was one 5*10^7-struct array in
   a single group.
3. The gauges gate the cap — max bucket occupancy on the testdata at
   BOTH production LSH geometries stays under BUCKET_CAP, so a geometry
   change that degenerates buckets fails CI instead of OOMing a cluster
   (VERDICT r5 #8).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_spark.operators.pairing import (
    BUCKET_CAP,
    bucketed_pairs,
    bucketed_query_pairs,
)
from mapreduce_spark.registry import get_queries


def _pairs_set(df):
    return {tuple(r) for r in df.collect()}


def test_branch_parity_same_pairs(spark):
    """cap=2 (everything through the salted join) == cap=10**6
    (everything in-group) on a mixed-occupancy bucket table."""
    rows = []
    for b in range(6):
        for i in range(b + 2):  # occupancies 2..7
            rows.append((b, 1000 * b + i))
    df = spark.createDataFrame(rows, "bucket long, id long")
    small_path = _pairs_set(
        bucketed_pairs(df, ["bucket"], "id", cap=10**6)
    )
    join_path = _pairs_set(bucketed_pairs(df, ["bucket"], "id", cap=2))
    assert small_path == join_path
    # and the expected volume: sum over buckets of C(occ, 2)
    assert len(small_path) == sum((b + 2) * (b + 1) // 2 for b in range(6))


def test_branch_parity_query_pairs(spark):
    rows = [(b, i) for b in range(4) for i in range(b * 3, b * 3 + 5)]
    df = spark.createDataFrame(rows, "bucket long, id long")
    pred = lambda c: c < F.lit(6)  # noqa: E731
    a = _pairs_set(
        bucketed_query_pairs(df, ["bucket"], "id", pred, cap=10**6)
    )
    b = _pairs_set(bucketed_query_pairs(df, ["bucket"], "id", pred, cap=2))
    assert a == b and len(a) > 0
    for q, v in a:
        assert q < 6 and v != q


@pytest.mark.seal
def test_hot_bucket_bounded_memory(spark):
    """10^4 ids in ONE bucket: the salted-join branch must stream all
    C(10^4, 2) pairs without a single-group O(c^2) array."""
    n = 10_000
    df = spark.range(n).select(
        F.lit(0).alias("bucket"), F.col("id").alias("id")
    )
    got = bucketed_pairs(df, ["bucket"], "id").count()
    assert got == n * (n - 1) // 2


def test_hot_bucket_query_pairs_bounded(spark):
    n = 5_000
    df = spark.range(n).select(
        F.lit(0).alias("bucket"), F.col("id").alias("id")
    )
    got = bucketed_query_pairs(
        df, ["bucket"], "id", lambda c: c < F.lit(3)
    ).count()
    assert got == 3 * (n - 1)


def test_capped_plan_has_both_branches(spark):
    """The physical plan of a capped enumeration must contain BOTH the
    in-group expansion (size(vs) <= cap filter) and the join fallback
    (size(vs) > cap filter + a join on the bucket key) — the audit
    VERDICT r5 asked for, so a refactor that silently drops the
    fallback fails here."""
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3)], "bucket long, id long"
    )
    plan = (
        bucketed_pairs(df, ["bucket"], "id")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "extended"
            )
        )
    )
    assert f"size(vs#" in plan or "size(vs)" in plan
    assert "<= 64" in plan and "> 64" in plan, plan[:2000]
    assert "Join" in plan and "_salt" in plan


def test_gauges_stay_under_cap(spark, sf_dir):
    """Skew gauges as CI gates: testdata occupancy at the PRODUCTION
    geometries must sit under BUCKET_CAP, keeping every healthy bucket
    on the fast in-group path (measured: minhash 144/36 max 4 and
    scaled-LSH max 48 at sf0.1; the demo LSH profile is deliberately
    coarse — max 201 at sf0.1 — and is exactly what the fallback is
    for, so it is NOT gated)."""
    qs = get_queries()
    mh = qs["minhash_band_stats"](spark, sf_dir).collect()
    worst_mh = max(r["max_bucket"] for r in mh)
    lsh = qs["lsh_bucket_stats"](spark, sf_dir).collect()
    worst_lsh = max(
        r["max_bucket"] for r in lsh if r["profile"] == "scaled"
    )
    for name, worst in [("minhash", worst_mh), ("lsh_scaled", worst_lsh)]:
        assert worst <= BUCKET_CAP, (
            f"{name}: max occupancy {worst} exceeds BUCKET_CAP="
            f"{BUCKET_CAP}; re-price the cap or fix the geometry"
        )
