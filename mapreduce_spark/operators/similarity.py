"""Similarity search over the ``embeddings`` table (array<float> column).

Three tiers, mirroring a production ANN stack:

- ``similarity_topk``     exact brute-force cosine top-k — the correctness
                          baseline; |Q| x |V| with the query side broadcast
- ``similarity_ann_lsh``  random-hyperplane LSH: candidates share a
                          (table, bucket) key with the query -> bucket join
- ``similarity_ann_ivf``  IVF: vectors assigned to their nearest seed
                          centroid; queries probe the nprobe closest
                          centroid lists only

The approximate tiers trade recall for a candidate set that scales with
neighbor density instead of |V| — the 100 TB path. All vector math is
JVM-side (functions/vectors.py) and bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.window import Window

from mapreduce_spark.functions.hashing import md5_long_sql
from mapreduce_spark.functions.vectors import (
    cosine_n,
    hyperplane,
    norm,
    sql_cosine_pair,
)
from mapreduce_spark.operators.artifacts import materialize, run_concurrently
from mapreduce_spark.operators.pairing import (
    bucketed_pairs,
    bucketed_query_pairs,
)
from mapreduce_spark.operators.textops import BM25_SQL, BM25_TOP_K
from mapreduce_spark.registry import register
from mapreduce_spark.sources.tables import fan_out, load_table

N_QUERIES = 5        # query set: vec_id < N_QUERIES
EMB_DIM = 64         # embeddings.embedding width (TESTDATA.md contract)
TOP_K = 10
LSH_TABLES = 4
LSH_PLANES = 4
IVF_CENT_MOD = 100   # centroids: vec_id % IVF_CENT_MOD == IVF_CENT_REM
IVF_CENT_REM = 7
IVF_NPROBE = 2

# --- PRODUCTION ANN profile (the dedup SCALED_PERMS/SCALED_BANDS playbook:
# r3/r4 flagged the constants above as demo geometry — fine for fixtures,
# wrong shape for 1e9 vectors). The two knobs separate cleanly:
#
# * PLANES control COST: expected bucket occupancy is |V| / 2^planes per
#   table, so planes must track log2(|V| / target_bucket_size) for pair
#   volume to stay ~|V| * bucket_size instead of degenerating toward
#   |V|^2 / 2^planes. At the test corpus (|V| ~ 500-2000, target ~2-8
#   per bucket) that rule gives 8 planes; at 1e9 vectors it gives ~27.
#   The equi-join plan shape is IDENTICAL at any plane count.
# * TABLES control RECALL: a true neighbor at angle theta collides in one
#   table with p = (1 - theta/pi)^planes and is found with
#   1 - (1 - p)^tables. At 8 planes / 32 tables: cosine 0.80 -> 0.996,
#   0.75 -> 0.985, 0.70 -> 0.961 — the >= 0.9 contract for the
#   cosine >= 0.7 neighborhoods real embedding corpora put near-dups in
#   (random-direction cosines concentrate near 0 at dim 64, so relevant
#   neighbors sit far above ambient). tests/test_ann_scaled.py asserts
#   empirical recall >= 0.9 on a planted-neighbor corpus in exactly that
#   band, and that the demo geometry misses measurably on the same data.
#
# The IVF tier scales by a SQRT-LAW coarse quantizer (K = ivf_cent_mod(|V|)
# ~ sqrt(|V|) lists — VERDICT r10 #2, the routed graph tier's law applied
# to IVF routing) that is TRAINED (one Lloyd iteration from the
# deterministic seeds — kmeans_refine's machinery) rather than raw seed
# vectors, probed at nprobe=4; at production |V| both the per-query
# routing cost (K cosines) and the expected probed-list volume
# (nprobe x |V|/K) grow ~sqrt(|V|) while nprobe stays a small constant
# multiple of the recall target. SCALED_IVF_CENT_MOD survives only as the
# landmark graph-beam tier's entry modulus (that tier's docstring states
# its linear entry honestly; the routed tier is the production path) and
# as explicit test geometry.
SCALED_LSH_PLANES = 8
SCALED_LSH_TABLES = 32
# Dynamic plane law for the GRAPH-BUILD tier (VERDICT r11 #2): a fixed
# plane count makes expected bucket occupancy |V|/2^planes GROW with the
# corpus, so the graph build's pair volume degenerates toward
# |V|^2/2^planes (measured: growth ratio 1.26 at 5x rows in
# BENCH_SCALE_r11). The production law pins occupancy instead: planes =
# smallest p with (1 << p) * LSH_TARGET_BUCKET >= |V| — an INTEGER
# range-scan both engines compute bit-identically (no float log2; libm
# rounding at exact-power-of-two boundaries is engine-dependent, the
# oracle-exactness rule from the IVF sqrt law). Expected occupancy then
# sits in (LSH_TARGET_BUCKET/2, LSH_TARGET_BUCKET] at any corpus size,
# so pair volume stays ~|V| x target — linear. Query-SERVING tiers
# (similarity_ann_lsh_scaled, multiprobe) keep the static 8x32 profile:
# their recall contract is tuned to it (tests/test_ann_scaled.py) and
# their per-query cost is one bucket, not a self-join.
LSH_TARGET_BUCKET = 8
LSH_DYN_MIN_PLANES = 4  # fixture floor: never below the demo geometry
# Production graph out-degree (lifted from the demo's fixture-sized k=3;
# label propagation / diversity sampling conventionally use k in 10..50).
KNN_GRAPH_SCALED_K = 10


def lsh_planes_for(n: int) -> int:
    """Smallest p >= LSH_DYN_MIN_PLANES with (1 << p) * LSH_TARGET_BUCKET
    >= n — exact-integer twin of the oracle's range-scan CTE
    (_sql_dyn_buckets_cte, whose scan stops at p = 56: DuckDB BIGINT
    shifts RAISE on overflow, and 2^56 x target already covers any
    conceivable corpus). At the sf0.01 corpus (|V|=500) this gives 6
    planes, at sf0.1 (2000) the legacy 8, at 1e9 vectors 27."""
    p = LSH_DYN_MIN_PLANES
    while (1 << p) * LSH_TARGET_BUCKET < n:
        p += 1
    return p

SCALED_IVF_CENT_MOD = 25
SCALED_IVF_NPROBE = 4
# Hierarchical routing: supers probed per query/vector at the two-level
# tiers (the recall lever of the n^1.25 build path; see the HIERARCHICAL
# IVF block below).
IVF_HIER_SUPER_PROBE = 2
# Lloyd training sample: ~IVF_TRAIN_PER_CENT points per centroid
# (stride = max(1, cm // 64), so |S| ~ 64 K and training costs ~64 n —
# LINEAR; FAISS warns below ~39 points/centroid and this first attempt
# at an n^0.75 sample sat at ~4.5/centroid and measurably degraded the
# residual tier's quantization, caught by
# tests/test_ivfpq_residual.py's MSE-drop law). At the test corpora the
# stride is 1: small corpora train on everything.
IVF_TRAIN_PER_CENT = 64


def _rank_topk(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    """row_number over (cosine desc, vec_id) per query; keep the top k."""
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


_SQL_RANK = f"""
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
        FROM scored)
    WHERE rank <= {TOP_K}
"""


def _score_pairs(
    emb: DataFrame, cand: DataFrame, broadcast_cand: bool = False
) -> DataFrame:
    """Exact cosine for candidate (query_id, vec_id) pairs, with per-vector
    norms computed once on each join input instead of per pair.
    ``broadcast_cand`` marks candidate sets with a PROVEN small bound
    (the graph-beam law) so the corpus side streams through a hash join
    and never shuffles on the serve path."""
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    eq = embn.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    ev = embn.select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("ve"),
        F.col("nrm").alias("vn"),
    )
    left = cand.join(F.broadcast(eq), "query_id")
    if broadcast_cand:
        left = F.broadcast(left)
    return (
        left
        .join(ev, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_n(F.col("qe"), F.col("ve"), F.col("qn"), F.col("vn")), 6).alias(
                "cosine"
            ),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, v.vec_id,
               round({sql_cosine_pair('q.qe', 'v.embedding')}, 6) AS cosine
        FROM q JOIN embeddings v ON v.vec_id <> q.query_id)
    {_SQL_RANK}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the small query set against the full
    vector table (one pass over V, no shuffle of V), then per-query top-k
    via window rank. The plan every ANN variant is measured against."""
    return _exact_topk(spark, sf_dir)


def _exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_n(F.col("qe"), F.col("embedding"), F.col("qn"), F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored)


# ---------------------------------------------------------------------------
# Hyperplane-LSH bucket derivation. The bucket bit for (table, plane) is
# the SIGN of an exact integer dot product: quantized embedding
# xq = floor(x * 10000) (the PQ convention — engine-consistent on
# float32) against integer plane weights wq = md5("t_p_d") % 2001 - 1000
# (exactly hyperplane() x 1000). Integer sums are order-independent, so
# both engines agree bit-for-bit with NO float-fold-order engineering,
# and Spark evaluates the whole projection in whole-stage codegen: the
# former per-plane aggregate(zip_with(...)) literal folds were
# higher-order functions Spark always interprets — measured 4.5 s of a
# 5.7 s knn_graph_scaled run at sf0.1 just deriving buckets — while the
# fully-unrolled literal-sum form OOMed Catalyst at the 256-plane
# geometry. Weights ride a broadcast 16k-row table (the codebook
# pattern), so at 1e9 vectors the derivation is one map-side
# broadcast-join + partial agg, no shuffle beyond |V| x tables rows.
_XQ_SCALE = 10_000


def _wq_table(spark: SparkSession, planes: int, tables: int) -> DataFrame:
    """Broadcastable integer plane-weight table (pos, table_idx, plane,
    wq), built driver-side from the same md5 stream as hyperplane()."""
    rows = [
        (d, t, p, int(round(w * 1000)))
        for t in range(tables)
        for p in range(planes)
        for d, w in enumerate(hyperplane(t, p))
    ]
    return spark.createDataFrame(
        rows, "pos int, table_idx int, plane int, wq long"
    )


def _lsh_dots(emb: DataFrame, planes: int, tables: int) -> DataFrame:
    """(vec_id, table_idx, _d0.._dP): the per-plane exact-integer dot
    products behind every bucket bit. One pass: posexplode the quantized
    vector, broadcast-join the weight table, and ONE (vec_id,
    table_idx)-keyed hash agg computes all plane dots as per-plane
    conditional sums — every operator codegen-friendly, every sum exact
    integer. Shared by the sign-packing bucket derivation and the
    multi-probe margin ranking (the probe order IS |dot|, so both
    consumers must read the same numbers)."""
    spark = emb.sparkSession
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * _XQ_SCALE).cast("bigint").alias("xq"),
    )
    joined = ex.join(F.broadcast(_wq_table(spark, planes, tables)), "pos")
    dots = [
        F.sum(
            F.when(F.col("plane") == p, F.col("xq") * F.col("wq")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias(f"_d{p}")
        for p in range(planes)
    ]
    return joined.groupBy("vec_id", "table_idx").agg(*dots)


def _pack_sign_bucket(planes: int) -> Column:
    """Sign-packed bucket id from the _d0.._dP dot columns."""
    bucket = F.lit(0).cast("bigint")
    for p in range(planes):
        bucket = bucket + F.when(
            F.col(f"_d{p}") >= 0, F.lit(1 << p).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def lsh_buckets(emb: DataFrame, planes: int, tables: int) -> DataFrame:
    """(vec_id, table_idx, bucket) under an arbitrary (planes, tables)
    geometry — THE bucket derivation every LSH entry point shares (the
    dedup _band_key_fn discipline: one rule, so any two same-profile
    consumers are always key-compatible)."""
    return _lsh_dots(emb, planes, tables).select(
        "vec_id", F.col("table_idx").cast("int").alias("table_idx"),
        _pack_sign_bucket(planes).alias("bucket")
    )


def lsh_buckets_np(emb: DataFrame, planes: int, tables: int) -> DataFrame:
    """lsh_buckets computed as an Arrow-batched int64 MATMUL
    (mapInPandas) instead of the explode + weight-join + hash-agg plan —
    bit-identical buckets (same xq = floor(x * {_XQ_SCALE}) quantization
    in float64, same md5-stream integer weights, exact int64 sums; the
    equality is pinned frame-for-frame by tests/test_ann_scaled.py).

    Why it exists: the JVM derivation materializes |V| x {EMB_DIM} x
    tables x planes joined rows, so when the DYNAMIC plane law raises
    planes with log2|V| the derivation grows n log n with a visible
    constant — BENCH_SCALE r12's first run measured knn_graph_scaled at
    growth ratio 1.26 purely from this stage (pair volume itself was
    already pinned). A dense integer matmul is the one shape Spark's
    built-in operators can only express as that row explosion, i.e. the
    legitimate Pandas case; per batch it is (rows x {EMB_DIM}) @
    ({EMB_DIM} x tables*planes) with no shuffle and no Python
    per-row loop. Single-probe consumers (the dynamic-plane graph tier
    and the static-geometry serving tier) derive buckets here; only
    multiprobe keeps the JVM derivation, because it needs the per-plane
    |dot| margins inside the same JVM plan."""
    import numpy as np
    import pandas as pd

    wq = np.empty((tables * planes, EMB_DIM), dtype=np.int64)
    for t in range(tables):
        for p in range(planes):
            for d, w in enumerate(hyperplane(t, p)):
                wq[t * planes + p, d] = int(round(w * 1000))
    shifts = np.array([1 << p for p in range(planes)], dtype=np.int64)
    n_tables, n_planes = tables, planes

    def derive(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            xq = np.floor(x * _XQ_SCALE).astype(np.int64)
            dots = xq @ wq.T  # (rows, tables*planes), exact int64
            bits = (dots >= 0).reshape(-1, n_tables, n_planes)
            buckets = (bits * shifts).sum(axis=2, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(np.int64), n_tables
                    ),
                    "table_idx": np.tile(
                        np.arange(n_tables, dtype=np.int32), len(pdf)
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    # fan_out (r13, guide §2.5): the matmul runs per input partition and
    # a single-file corpus scans as one task — spread it across the
    # cores first (1 MB/task density: tiny corpora stay
    # un-repartitioned; no-op at multi-file scale).
    return fan_out(
        emb.select("vec_id", "embedding"), bytes_per_task=1 << 20
    ).mapInPandas(derive, "vec_id bigint, table_idx int, bucket bigint")


def _sql_buckets_cte(
    planes: int = LSH_PLANES, tables: int = LSH_TABLES, prefix: str = ""
) -> str:
    """DuckDB twin of lsh_buckets: weights regenerated in-engine from the
    same md5 stream, quantized embedding unnested, integer dots grouped,
    sign bits packed. Ends in ``{prefix}buckets(vec_id, table_idx,
    bucket)`` — the only CTE consumers reference (prefix keeps two
    geometries in one query from colliding)."""
    wq_expr = md5_long_sql(
        "CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' "
        "|| CAST(d AS VARCHAR)"
    )
    return f"""
    {prefix}wq AS (
        SELECT t AS table_idx, p AS plane, d AS pos,
               {wq_expr} % 2001 - 1000 AS wq
        FROM range({tables}) _t(t), range({planes}) _p(p),
             range({EMB_DIM}) _d(d)),
    {prefix}xq_b AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_XQ_SCALE})
                    AS BIGINT) AS xq
        FROM embeddings),
    {prefix}dots AS (
        SELECT x.vec_id, w.table_idx, w.plane,
               CAST(sum(x.xq * w.wq) AS BIGINT) AS dq
        FROM {prefix}xq_b x JOIN {prefix}wq w ON w.pos = x.pos
        GROUP BY x.vec_id, w.table_idx, w.plane),
    {prefix}buckets AS (
        SELECT vec_id, CAST(table_idx AS INTEGER) AS table_idx,
               CAST(sum(CASE WHEN dq >= 0
                             THEN CAST(1 AS BIGINT) << plane
                             ELSE 0 END) AS BIGINT) AS bucket
        FROM {prefix}dots GROUP BY vec_id, table_idx)"""


_SQL_BUCKETS_CTE = _sql_buckets_cte()


def _sql_dyn_buckets_cte(tables: int, prefix: str) -> str:
    """DuckDB twin of the DYNAMIC-plane bucket derivation (lsh_buckets
    at lsh_planes_for(|V|)): the plane count comes from an integer
    range-scan CTE — smallest p in [{LSH_DYN_MIN_PLANES}, 64) with
    (1 << p) * {LSH_TARGET_BUCKET} >= count(*) — then the static chain
    (weights / quantized unnest / integer dots / sign packing) runs with
    plane indices filtered to p < planes. Ends in ``{{prefix}}buckets``
    with the same shape as _sql_buckets_cte, so graph consumers swap
    geometry without touching their own CTEs."""
    wq_expr = md5_long_sql(
        "CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' "
        "|| CAST(d AS VARCHAR)"
    )
    return f"""
    {prefix}np AS (
        SELECT CAST(min(p) AS BIGINT) AS planes
        FROM range({LSH_DYN_MIN_PLANES}, 57) _p(p)
        WHERE (CAST(1 AS BIGINT) << p) * {LSH_TARGET_BUCKET}
              >= (SELECT count(*) FROM embeddings)),
    {prefix}wq AS (
        SELECT t AS table_idx, p AS plane, d AS pos,
               {wq_expr} % 2001 - 1000 AS wq
        FROM range({tables}) _t(t), range(57) _p(p),
             range({EMB_DIM}) _d(d), {prefix}np
        WHERE p < planes),
    {prefix}xq_b AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_XQ_SCALE})
                    AS BIGINT) AS xq
        FROM embeddings),
    {prefix}dots AS (
        SELECT x.vec_id, w.table_idx, w.plane,
               CAST(sum(x.xq * w.wq) AS BIGINT) AS dq
        FROM {prefix}xq_b x JOIN {prefix}wq w ON w.pos = x.pos
        GROUP BY x.vec_id, w.table_idx, w.plane),
    {prefix}buckets AS (
        SELECT vec_id, CAST(table_idx AS INTEGER) AS table_idx,
               CAST(sum(CASE WHEN dq >= 0
                             THEN CAST(1 AS BIGINT) << plane
                             ELSE 0 END) AS BIGINT) AS bucket
        FROM {prefix}dots GROUP BY vec_id, table_idx)"""


@register(
    "similarity_ann_lsh",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, vb.vec_id
        FROM buckets qb JOIN buckets vb
          ON qb.table_idx = vb.table_idx AND qb.bucket = vb.bucket
         AND vb.vec_id <> qb.vec_id
        WHERE qb.vec_id < {N_QUERIES}),
    scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    {_SQL_RANK}
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via hyperplane LSH: score only vectors that share
    a (table, bucket) key with the query. The candidate join is a key
    equi-join on the bucket — per-query work tracks bucket occupancy
    (|V| / 2^planes per table), not |V|."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ann_lsh_topk(emb, LSH_PLANES, LSH_TABLES)


def ann_lsh_topk(
    emb: DataFrame,
    planes: int,
    tables: int,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    bucket_fn=None,
) -> DataFrame:
    """Profile-parameterized LSH ANN over a (vec_id, embedding) frame:
    bucket derivation -> (table, bucket) candidate equi-join -> exact
    cosine on candidates -> per-query top-k. Identical plan shape at any
    geometry — the demo and PRODUCTION registrations differ only in the
    constants they pass (the minhash_lsh_pairs discipline).

    Candidates come from the CAPPED in-group enumeration
    (pairing.bucketed_query_pairs): healthy buckets expand their
    (query, candidate) pairs inside the (table, bucket) group off one
    groupBy-collect exchange — buckets derived exactly once, the r5 win
    over the self-join that re-derived the {tables} x {planes}-plane
    projection on both inputs (measured 2-4x slower) — while buckets
    above BUCKET_CAP fall back to a salted join so no single
    aggregation group ever materializes O(c^2) pairs (AQE splits
    partitions, not groups). Same candidate SET either way by
    construction; lsh_bucket_stats is the gauge that prices the cap.

    bucket_fn follows knn_graph_edges' convention: lsh_buckets (JVM
    plan — the default) or lsh_buckets_np (Arrow matmul, bit-identical
    output — what the production-geometry registrations pass, where
    the JVM derivation's |V| x dim x tables x planes row explosion is
    the dominant stage)."""
    buckets = (bucket_fn or lsh_buckets)(emb, planes, tables)
    cand = bucketed_query_pairs(
        buckets,
        ["table_idx", "bucket"],
        "vec_id",
        lambda c: c < F.lit(n_queries),
    ).distinct()
    scored = _score_pairs(emb, cand)
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
@register(
    "similarity_ann_ivf",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id % {IVF_CENT_MOD} = {IVF_CENT_REM}),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings v, cent c)
        WHERE rn = 1),
    probe AS (
        SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES})
        WHERE rn <= {IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT p.query_id, a.vec_id
        FROM probe p JOIN assign a ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id),
    scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    {_SQL_RANK}
    """,
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic seed centroids (vec_id % 100 == 7, a
    1-iteration k-means stand-in), every vector assigned to its nearest
    centroid (broadcast centroids — one pass over V), queries probe the
    nprobe=2 nearest centroid lists. Candidate join is an equi-join on
    centroid id; per-query cost is the probed lists, not |V|."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    cent = embn.filter(F.col("vec_id") % IVF_CENT_MOD == IVF_CENT_REM).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    return ann_ivf_topk(emb, cent, IVF_NPROBE)


def ivf_candidates(
    emb: DataFrame,
    cent: DataFrame,
    nprobe: int,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """(query_id, vec_id) candidate pairs from IVF routing: every vector
    assigned to its nearest (cid, ce, cn) centroid (broadcast argmax),
    each query probing its nprobe nearest lists, candidates via the cid
    equi-join — the routing stage shared by the exact-rescoring IVF tier
    (ann_ivf_topk) and the code-rescoring IVFADC tier (ivfpq_adc_topk)."""
    embn = emb.withColumn("nrm", norm(F.col("embedding")))

    def nearest(df: DataFrame, id_col: str, keep: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).select(
            F.col(id_col),
            "cid",
            F.round(
                cosine_n(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")), 6
            ).alias("_c"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("_c").desc(), F.col("cid"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep)
            .select(id_col, "cid")
        )

    assign = nearest(embn, "vec_id", 1)
    probe = nearest(
        embn.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), "embedding", "nrm"
        ),
        "query_id",
        nprobe,
    )
    return (
        probe.join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


def ann_ivf_topk(
    emb: DataFrame,
    cent: DataFrame,
    nprobe: int,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """IVF ANN over a (vec_id, embedding) frame against an ARBITRARY
    (cid, ce, cn) centroid frame — raw seed vectors (the demo) or trained
    quantizer output (the production registration) plug into the same
    plan: broadcast-centroid argmax assignment, nprobe-nearest-list
    probe, candidate equi-join on cid, exact cosine, per-query top-k."""
    cand = ivf_candidates(emb, cent, nprobe, n_queries)
    scored = _score_pairs(emb, cand)
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# One Lloyd iteration: assign to nearest seed centroid, recompute means
@register(
    "kmeans_refine",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id % {IVF_CENT_MOD} = {IVF_CENT_REM}),
    assign AS (
        SELECT vec_id, cid, embedding FROM (
            SELECT v.vec_id, c.cid, v.embedding,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings v, cent c)
        WHERE rn = 1),
    ex AS (
        SELECT cid, i AS pos, embedding[i + 1] AS x
        FROM assign, UNNEST(range(len(embedding))) AS t(i)),
    q AS (
        SELECT cid, pos,
               SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
               count(*) AS n
        FROM ex GROUP BY cid, pos),
    c2 AS (SELECT cid, pos, n, s / n / 1000000.0 AS c FROM q)
    SELECT cid, CAST(n AS BIGINT) AS n_members,
           CAST(pos AS BIGINT) AS pos, c
    FROM c2 ORDER BY cid, pos
    """,
)
def kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means (Lloyd) iteration from the IVF seed centroids: assign
    every vector to its nearest centroid by cosine, then recompute each
    cluster's mean — the update step behind IVF quantizer training and
    embedding clustering. Iterating is this same plan in a driver loop
    (the dedup_cluster pattern); one step stays SQL-expressible so the
    oracle can pin it exactly.

    Assignment is an ARGMAX AGGREGATE (max over struct(score, -cid)),
    not a window — it partially aggregates map-side, so the per-vector
    candidate rows never shuffle, only |V| assignment rows do. The mean
    reuses embedding_centroid's integer micro-unit trick: quantize,
    BIGINT-sum (exact, associative), divide once — bit-identical at any
    parallelism on both engines.

    Output is the FLAT (cid, n_members, pos, c) component frame rather
    than reassembled arrays: the driver's pandas canonicalizer cannot
    sort array cells (CORRECTNESS_r07 ERR class), and the flat frame is
    also the shape downstream consumers (refined_centroids) aggregate
    from anyway."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c2 = _lloyd_c2(emb, IVF_CENT_MOD, IVF_CENT_REM)
    return c2.select(
        "cid",
        F.col("n").cast("bigint").alias("n_members"),
        F.col("pos").cast("bigint").alias("pos"),
        "c",
    ).orderBy("cid", "pos")


def _lloyd_c2(
    emb: DataFrame, cent_mod: int, rem: int, stride: int | None = None
) -> DataFrame:
    """(cid, pos, n, c): ONE Lloyd iteration from the vec_id % cent_mod
    == rem seeds at an arbitrary modulus — assignment by argmax aggregate
    over broadcast seeds, mean update in exact integer micro-units, each
    component c the exact ratio s/n/1e6 (one IEEE division chain,
    bit-identical on both engines). Shared by kmeans_refine (the oracled
    one-step query) and refined_centroids (the trained-quantizer input
    to the production IVF registration). With ``stride`` set, the
    assignment/update runs over the vec_id % stride == 0 SAMPLE only
    (FAISS's train-on-a-sample posture): at stride ~ n^0.25 the Lloyd
    pass costs |S| x K ~ n^1.25 instead of |V| x K ~ n^1.5 — the
    training half of the two-level build-cost fix (BENCH_SCALE r11).
    Seeds still come from the FULL corpus; seed cells with no sample
    member drop out (refined_centroids already tolerates shrinkage)."""
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    if stride is not None:
        embn = embn.filter(F.col("vec_id") % stride == 0)
        cent_src = emb.withColumn("nrm", norm(F.col("embedding")))
    else:
        cent_src = embn
    cent = cent_src.filter(F.col("vec_id") % cent_mod == rem).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cand = embn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        F.struct(
            F.round(
                cosine_n(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")), 6
            ).alias("score"),
            (-F.col("cid")).alias("negcid"),
        ).alias("sc"),
    )
    assign = cand.groupBy("vec_id").agg(
        (-F.max("sc")["negcid"]).alias("cid"),
        F.first("embedding").alias("embedding"),
    )
    ex = assign.select("cid", F.posexplode("embedding").alias("pos", "x"))
    q = ex.groupBy("cid", "pos").agg(
        F.sum(F.floor(F.col("x").cast("double") * 1e6).cast("bigint")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return q.select("cid", "pos", "n", (F.col("s") / F.col("n") / 1e6).alias("c"))


def refined_centroids(
    emb: DataFrame, cent_mod: int, rem: int, stride: int | None = None
) -> DataFrame:
    """(cid, ce, cn): the TRAINED coarse quantizer — one Lloyd iteration
    from the deterministic seeds, reassembled to per-centroid double
    arrays with precomputed norms, ready to plug into ann_ivf_topk.
    Components are exact integer ratios (s/n/1e6), so both engines hold
    bit-identical centroid doubles and every downstream cosine agrees.
    ``stride`` trains on the vec_id % stride == 0 sample (_lloyd_c2)."""
    c2 = _lloyd_c2(emb, cent_mod, rem, stride)
    carr = c2.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("ce")
    )
    return carr.select("cid", "ce", norm(F.col("ce")).alias("cn"))


def ivf_cent_mod(n: int) -> int:
    """Sqrt-law coarse-quantizer modulus for the PRODUCTION IVF tiers
    (VERDICT r10 #2, closing the r9 scale-killer's IVF half): cent_mod =
    ceil(sqrt(n)) floored at IVF_CENT_REM + 1 (so the vec_id %
    cent_mod == {rem} seed set is never empty), giving K = |seeds| ~
    sqrt(n) centroids. With K ~ sqrt(|V|) and nprobe constant, the
    per-query routing cost (K exact cosines) AND the expected probed-
    list volume (nprobe x |V|/K ~ sqrt(|V|)) both grow as sqrt of the
    corpus — FAISS pins K in the same band for the same reason — vs the
    fixed-modulus convention's K = |V|/25, which made routing linear in
    the corpus (1e7+ cosines/query at 1e9 vectors). Exact for n < 2^52
    (double sqrt of an integer is correctly rounded there), matching
    DuckDB's ceil(sqrt(count(*))) bit-for-bit. The graph tier's
    _routed_cent_mod is the same law with a different floor/remainder;
    it stays separate because its geometry is pinned by its own
    SQLMetrics tests."""
    return max(IVF_CENT_REM + 1, math.ceil(math.sqrt(n)))


def ivf_centroids_sqrt(emb: DataFrame) -> DataFrame:
    """(cid, ce, cn): the sqrt-law TRAINED coarse quantizer — seed
    K ~ sqrt(|V|) deterministic seeds (vec_id % ivf_cent_mod(|V|) ==
    IVF_CENT_REM), Lloyd-refine one step exactly as refined_centroids.
    The one emb.count() here is the INDEX-BUILD sizing scalar (the
    routed_artifacts convention), never a serve-time collect. This is
    the FLAT sqrt-law BASELINE tier: after the r11 two-level rollout it
    feeds only ivf_hier_recall_report's flat comparison arm and the
    tests; every production IVF/IVFADC registration and the persisted
    vector index build through ivf_trained_hier instead (the n^1.25
    two-level quantizer)."""
    return refined_centroids(emb, ivf_cent_mod(emb.count()), IVF_CENT_REM)


# ---------------------------------------------------------------------------
# Full k-means training: N checkpointed Lloyd rounds + convergence card
KMEANS_ROUNDS = 6         # demo depth (K = |V|/IVF_CENT_MOD seeds)
KMEANS_SCALED_ROUNDS = 8  # production depth at the scaled-IVF geometry


def _kmeans_assign(embn: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid, score): every vector assigned to its nearest
    centroid by 6dp-rounded cosine (ties to the lower cid) via an ARGMAX
    AGGREGATE over the broadcast centroid frame — partially aggregates
    map-side, so only |V| assignment rows shuffle, never the |V| x K
    candidate rows."""
    cand = embn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.struct(
            F.round(
                cosine_n(
                    F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")
                ),
                6,
            ).alias("score"),
            (-F.col("cid")).alias("negcid"),
        ).alias("sc"),
    )
    best = cand.groupBy("vec_id").agg(F.max("sc").alias("b"))
    return best.select(
        "vec_id",
        (-F.col("b.negcid")).alias("cid"),
        F.col("b.score").alias("score"),
    )


def _kmeans_update(assign: DataFrame, embn: DataFrame) -> DataFrame:
    """(cid, ce, cn): exact integer micro-unit mean centroids from an
    assignment — _lloyd_c2's update step against an ARBITRARY assignment
    frame. Components are exact BIGINT-sum ratios (s/n/1e6), one IEEE
    division chain, bit-identical on both engines at any parallelism."""
    ex = assign.join(embn.select("vec_id", "embedding"), "vec_id").select(
        "cid", F.posexplode("embedding").alias("pos", "x")
    )
    q = ex.groupBy("cid", "pos").agg(
        F.sum(F.floor(F.col("x").cast("double") * 1e6).cast("bigint")).alias(
            "s"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    c2 = q.select("cid", "pos", (F.col("s") / F.col("n") / 1e6).alias("c"))
    carr = c2.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("ce")
    )
    return carr.select("cid", "ce", norm(F.col("ce")).alias("cn"))


def _kmeans_train_frame(
    spark: SparkSession, sf_dir: str, cent_mod: int | None, rounds: int
) -> DataFrame:
    """Per-round convergence card (round, n_clusters, n_changed,
    mean_cosine) of ``rounds`` full Lloyd iterations from the
    vec_id % cent_mod == IVF_CENT_REM seeds, under the checkpointed-loop
    discipline (dedup_cluster / bpe_train_scaled): each round's centroid
    table (K rows) and assignment (|V| rows) materialize eagerly via
    localCheckpoint before the next round plans, so plan depth stays O(1)
    per round and the same loop runs any depth on a 100 TB corpus —
    per-round cost is one broadcast-argmax pass plus one (cid, pos)
    partial-aggregated mean, nothing |V|^2.

    This is spherical k-means (assign by cosine, update by mean — the
    mean direction maximizes the summed cosine), so mean_cosine is
    monotone non-decreasing round over round up to the 1e-6 centroid
    quantization; tests/test_kmeans_train.py pins the law and full
    convergence (n_changed -> 0) on a planted two-cluster corpus."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    embn = emb.withColumn("nrm", norm(F.col("embedding"))).localCheckpoint(
        eager=True
    )
    if cent_mod is None:  # sqrt-law production geometry (ivf_cent_mod)
        cent_mod = ivf_cent_mod(embn.count())
    cent = embn.filter(F.col("vec_id") % cent_mod == IVF_CENT_REM).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    prev = _kmeans_assign(embn, cent).localCheckpoint(eager=True)
    stats = []
    for r in range(1, rounds + 1):
        cent = _kmeans_update(prev, embn).localCheckpoint(eager=True)
        cur = _kmeans_assign(embn, cent).localCheckpoint(eager=True)
        st = (
            cur.alias("a")
            .join(prev.alias("p"), "vec_id")
            .agg(
                F.countDistinct(F.col("a.cid"))
                .cast("bigint")
                .alias("n_clusters"),
                F.sum(
                    F.when(F.col("a.cid") != F.col("p.cid"), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_changed"),
                (
                    F.sum(F.col("a.score").cast("decimal(18,6)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                ).alias("mean_cosine"),
            )
            .select(F.lit(r).cast("bigint").alias("round"), "*")
        )
        stats.append(st)
        prev = cur
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out.orderBy("round")


def _sql_kmeans_train(cent_mod: int | None, rounds: int) -> str:
    """DuckDB mirror of _kmeans_train_frame: rounds chained as
    MATERIALIZED CTEs (re-inlining the assignment per downstream
    reference is the 5x oracle blow-up the knn_graph_clusters_scaled
    materialization fix closed), each round one argmax assignment + one
    micro-unit mean, stats rows joined adjacent-round."""
    cos = sql_cosine_pair("v.embedding", "c.ce")
    if cent_mod is None:  # sqrt-law twin of ivf_cent_mod
        ctes = [
            f"km_cm AS (SELECT GREATEST({IVF_CENT_REM + 1}, "
            f"CAST(ceil(sqrt(count(*))) AS BIGINT)) AS cm FROM embeddings)",
            f"c0 AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce "
            f"FROM embeddings, km_cm WHERE vec_id % cm = {IVF_CENT_REM})",
        ]
    else:
        ctes = [
            f"c0 AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce "
            f"FROM embeddings WHERE vec_id % {cent_mod} = {IVF_CENT_REM})"
        ]
    for r in range(rounds + 1):
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT vec_id, cid, score FROM ("
            f"SELECT vec_id, cid, score, row_number() OVER ("
            f"PARTITION BY vec_id ORDER BY score DESC, cid) AS rn "
            f"FROM (SELECT v.vec_id, c.cid, round({cos}, 6) AS score "
            f"FROM embeddings v, c{r} c)) WHERE rn = 1)"
        )
        if r < rounds:
            ctes.append(
                f"c{r + 1} AS MATERIALIZED (SELECT cid, "
                f"list(cc ORDER BY pos) AS ce FROM ("
                f"SELECT cid, pos, "
                f"SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
                f" / count(*) / 1000000.0 AS cc "
                f"FROM (SELECT a.cid, t.i AS pos, v.embedding[t.i + 1] AS x "
                f"FROM a{r} a JOIN embeddings v USING (vec_id), "
                f"UNNEST(range(len(v.embedding))) AS t(i)) "
                f"GROUP BY cid, pos) GROUP BY cid)"
            )
    stats = [
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"CAST(count(DISTINCT a.cid) AS BIGINT) AS n_clusters, "
        f"CAST(sum(CASE WHEN a.cid <> p.cid THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_changed, "
        f"CAST(SUM(CAST(a.score AS DECIMAL(18,6))) AS DOUBLE) / count(*)"
        f" AS mean_cosine "
        f"FROM a{r} a JOIN a{r - 1} p USING (vec_id)"
        for r in range(1, rounds + 1)
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(stats)
        + ") ORDER BY round"
    )


@register(
    "kmeans_train_iters",
    oracle=_sql_kmeans_train(IVF_CENT_MOD, KMEANS_ROUNDS),
)
def kmeans_train_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-means TRAINING at the demo IVF geometry: {KMEANS_ROUNDS}
    chained Lloyd rounds (kmeans_refine is one step of exactly this loop)
    with a per-round convergence card — n_clusters still receiving
    members, n_changed reassignments vs the previous round, and the
    spherical-k-means objective mean_cosine (exact decimal sum / count).
    The quantizer-shopping record: read the card, pick the round where
    n_changed flatlines, train the coarse quantizer that deep."""
    return _kmeans_train_frame(spark, sf_dir, IVF_CENT_MOD, KMEANS_ROUNDS)


@register(
    "kmeans_train_scaled",
    oracle=_sql_kmeans_train(None, KMEANS_SCALED_ROUNDS),
)
def kmeans_train_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kmeans_train_iters at the PRODUCTION sqrt-law IVF geometry
    (K ~ sqrt(|V|) seeds via ivf_cent_mod, {KMEANS_SCALED_ROUNDS} rounds)
    — the training depth the scaled IVF/IVFADC tiers' coarse quantizer
    would actually ship with; same checkpointed loop, so the unrolled
    plan never deepens with rounds."""
    return _kmeans_train_frame(
        spark, sf_dir, None, KMEANS_SCALED_ROUNDS
    )


# ---------------------------------------------------------------------------
# k-NN majority-vote classification over the exact top-k neighbors
@register(
    "knn_label",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, v.vec_id,
               round({sql_cosine_pair('q.qe', 'v.embedding')}, 6) AS cosine
        FROM q JOIN embeddings v ON v.vec_id <> q.query_id),
    ranked AS ({_SQL_RANK}),
    votes AS (
        SELECT r.query_id, e.label, count(*) AS votes
        FROM ranked r JOIN embeddings e ON e.vec_id = r.vec_id
        GROUP BY r.query_id, e.label),
    pred AS (
        SELECT query_id, label AS predicted_label, votes FROM (
            SELECT query_id, label, votes,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY votes DESC, label) AS rn
            FROM votes) WHERE rn = 1)
    SELECT p.query_id, t.label AS true_label, p.predicted_label, p.votes,
           (p.predicted_label = t.label) AS is_correct
    FROM pred p JOIN embeddings t ON t.vec_id = p.query_id
    ORDER BY p.query_id
    """,
)
def knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification: predict each query vector's label by majority
    vote among its exact top-k cosine neighbors (self excluded); ties
    break to the smallest label. The standard embedding-quality probe
    (label-consistency of the neighborhood structure).

    Shape: reuses the exact top-k plan (broadcast query set, one pass
    over V); the |Q| x k neighbor list is then BROADCAST against the
    label column — the vector table stays stationary for the label
    lookup too. The vote rollup and argmax run on |Q| x labels rows, a
    no-op exchange at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    ranked = _exact_topk(spark, sf_dir)
    votes = (
        emb.select("vec_id", "label")
        .join(F.broadcast(ranked), "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )
    truth = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(F.broadcast(truth), "query_id")
        .select(
            "query_id",
            "true_label",
            "predicted_label",
            "votes",
            (F.col("predicted_label") == F.col("true_label")).alias("is_correct"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training
HARD_NEG_K = 5


@register(
    "hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS query_label
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, q.query_label, v.vec_id,
               v.label AS neg_label,
               round({sql_cosine_pair('q.qe', 'v.embedding')}, 6) AS cosine
        FROM q JOIN embeddings v ON v.label <> q.query_label)
    SELECT query_id, query_label, vec_id, neg_label, cosine, rank FROM (
        SELECT query_id, query_label, vec_id, neg_label, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
        FROM scored)
    WHERE rank <= {HARD_NEG_K}
    """,
)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each query vector, the top-k most
    COSINE-SIMILAR vectors carrying a DIFFERENT label — the examples a
    contrastive/embedding trainer wants as in-batch negatives, and the
    dual of knn_label (which scores same-label neighborhood purity).
    The reference's only notion of 'grouping unlike things' is the
    reduce-side key partition (/root/reference/mapreduce/worker/
    __main__.py:105); this is the trainer-facing generalization.

    Shape: identical to the exact top-k baseline — the |Q|-row query
    side (with its labels) broadcasts against one stationary pass over
    V; the label-mismatch predicate rides the broadcast join, so
    mismatching rows are dropped at the scan with no extra exchange,
    then one per-query window keeps k rows. At 1e9 vectors the exact
    pass swaps out for any registered ANN shortlist (LSH / IVFADC /
    Hamming tiers) feeding the same label-filtered rerank — the
    candidate generator is the pluggable part, exactly as in
    similarity_hamming_rerank."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = emb.join(
        F.broadcast(q), F.col("label") != F.col("query_label")
    ).select(
        "query_id",
        "query_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        F.round(
            cosine_n(F.col("qe"), F.col("embedding"), F.col("qn"), F.col("nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select("query_id", "query_label", "vec_id", "neg_label", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Mean-pooled class centroids: the vector-aggregation primitive
@register(
    "embedding_centroid",
    oracle="""
    WITH ex AS (
        SELECT label, i AS pos, embedding[i + 1] AS x
        FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
    q AS (
        SELECT label, pos,
               SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
               count(*) AS n
        FROM ex GROUP BY label, pos),
    c AS (SELECT label, pos, s / n / 1000000.0 AS c FROM q)
    SELECT label, CAST(pos AS BIGINT) AS pos, c
    FROM c ORDER BY label, pos
    """,
)
def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean-pooled centroid — the vector aggregation behind
    class prototypes, IVF coarse quantizers, and embedding drift checks.

    Float summation order is parallelism-dependent, so components are
    first quantized to integer micro-units (floor(double(x) * 1e6): one
    IEEE double multiply + floor, bit-identical on both engines — the
    float32 component is widened exactly first) and summed as
    BIGINT — exact, associative, merges map-side. The mean is two IEEE
    divisions on exact integers, bit-identical on both engines (no
    rounding step, whose half-way tie rules differ between engines).
    Shape: posexplode to (label, dim) rows — |vecs| x
    64, the scan's own size — one shuffle to aggregate, and centroids
    reassemble with a sort inside each tiny (label) group, so no stage
    ever holds more than |labels| x dims scalars."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    q = ex.groupBy("label", "pos").agg(
        F.sum(F.floor(F.col("x").cast("double") * 1e6).cast("bigint")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    c = q.select(
        "label",
        F.col("pos").cast("bigint").alias("pos"),
        (F.col("s") / F.col("n") / 1e6).alias("c"),
    )
    # Flat (label, pos, c) component rows, not reassembled arrays: the
    # driver's pandas canonicalizer cannot sort array cells, and the flat
    # frame is what downstream vector math consumes anyway.
    return c.orderBy("label", "pos")


# ---------------------------------------------------------------------------
_SQL_EXACT_TOPK_CTE = f"""
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    scored_e AS (
        SELECT q.query_id, v.vec_id,
               round({sql_cosine_pair('q.qe', 'v.embedding')}, 6) AS cosine
        FROM q JOIN embeddings v ON v.vec_id <> q.query_id),
    topk_e AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_e)
        WHERE rank <= {TOP_K})"""

_SQL_ANN_TOPK_CTE = f"""
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, vb.vec_id
        FROM buckets qb JOIN buckets vb
          ON qb.table_idx = vb.table_idx AND qb.bucket = vb.bucket
         AND vb.vec_id <> qb.vec_id
        WHERE qb.vec_id < {N_QUERIES}),
    scored_a AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    topk_a AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_a)
        WHERE rank <= {TOP_K})"""


# IVF top-k as a CTE chain ending in topk_i (mirrors similarity_ann_ivf).
_SQL_IVF_TOPK_CTE = f"""
    cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
             WHERE vec_id % {IVF_CENT_MOD} = {IVF_CENT_REM}),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings v, cent c)
        WHERE rn = 1),
    probe AS (
        SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES})
        WHERE rn <= {IVF_NPROBE}),
    cand_i AS (
        SELECT DISTINCT p.query_id, a.vec_id
        FROM probe p JOIN assign a ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id),
    scored_i AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand_i c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    topk_i AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_i)
        WHERE rank <= {TOP_K})"""


def _sql_tier_recall(tier: str, topk: str) -> str:
    return f"""
    SELECT '{tier}' AS tier, base.query_id, base.n_exact,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / base.n_exact, 6)
             AS recall
    FROM base LEFT JOIN
         (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM topk_e e JOIN {topk} a
            ON a.query_id = e.query_id AND a.vec_id = e.vec_id
          GROUP BY e.query_id) h
      ON h.query_id = base.query_id"""


@register(
    "ann_recall_report",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_SQL_BUCKETS_CTE},
    {_SQL_ANN_TOPK_CTE},
    {_SQL_IVF_TOPK_CTE},
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('lsh', 'topk_a')}
    UNION ALL
    {_sql_tier_recall('ivf', 'topk_i')}
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of BOTH approximate tiers (hyperplane LSH and IVF)
    against the exact baseline, per query — the measurement that decides
    whether an ANN index is usable (tune LSH_TABLES/LSH_PLANES or
    IVF_NPROBE until the tier clears the target, then ship). An
    evaluation harness as a first-class, oracle-checked operator.

    Plan shape: each ranked top-k set is |Q| x {TOP_K} rows, so the
    intersection joins and rollups are driver-free trivia on top of the
    underlying plans; the expensive inputs (one broadcast scoring pass,
    one bucket join, one centroid probe) are exactly the plans being
    graded."""
    exact = similarity_topk(spark, sf_dir).select("query_id", "vec_id")
    return _tier_recall(exact, "lsh", similarity_ann_lsh(spark, sf_dir)).unionByName(
        _tier_recall(exact, "ivf", similarity_ann_ivf(spark, sf_dir))
    )


def _tier_recall(
    exact: DataFrame, tier: str, ann: DataFrame, id_col: str = "query_id"
) -> DataFrame:
    """Per-id recall of an approximate (id, vec_id) set against the exact
    one: (tier, id, n_exact, n_hits, recall) — the rollup every recall
    gauge (ANN demo + scaled, PQ, knn-graph) shares."""
    other = "dst" if id_col == "src" else "vec_id"
    base = exact.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        exact.join(ann.select(id_col, other), [id_col, other], "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return base.join(hits, id_col, "left").select(
        F.lit(tier).alias("tier"),
        id_col,
        "n_exact",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.col("n_exact"),
            6,
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH (Lv, Josephson, Wang, Charikar, Li — VLDB 2007;
# public). Single-probe LSH buys recall with MORE TABLES: every extra
# table is another full copy of the bucket index and another corpus-wide
# bucket derivation — at 1e9 vectors, tables are the memory bill.
# Multi-probe buys the same recall QUERY-SIDE: a near neighbor that
# misses the query's bucket almost always landed just across one of the
# low-|margin| hyperplanes (the per-plane dot measures distance to the
# cut), so each query ALSO probes the buckets reached by flipping its
# n_probes smallest-|dot| sign bits. Corpus-side cost is unchanged —
# the probe fan-out multiplies only the broadcast-side query rows.
MP_TABLES = 1   # the pitch: ONE table multi-probed vs LSH_TABLES single
MP_PROBES = 3   # base bucket + 3 perturbations = 4 probes per query


def lsh_multiprobe_candidates(
    emb: DataFrame,
    planes: int,
    tables: int,
    n_probes: int,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """(query_id, vec_id) candidates under query-side multi-probe: the
    corpus is bucketed ONCE by the shared sign rule; each query probes
    its own bucket plus the ``n_probes`` buckets across its
    lowest-|dot| hyperplanes (deterministic (|dot|, plane) order). The
    probe table is |Q| x tables x (n_probes + 1) rows — broadcast — so
    the candidate join stays a (table, bucket) equi-join against the
    unchanged corpus index."""
    corpus = lsh_buckets(emb, planes, tables)
    qd = _lsh_dots(emb.filter(F.col("vec_id") < n_queries), planes, tables)
    margins = F.array_sort(
        F.array(*[
            F.struct(
                F.abs(F.col(f"_d{p}")).alias("m"),
                F.lit(p).alias("p"),
                F.lit(1 << p).cast("bigint").alias("bit"),
            )
            for p in range(planes)
        ])
    )
    probes = F.concat(
        F.array(F.col("base")),
        F.transform(
            F.slice(F.col("ms"), 1, n_probes),
            lambda s: F.col("base").bitwiseXOR(s["bit"]),
        ),
    )
    q = (
        qd.select(
            F.col("vec_id").alias("query_id"),
            F.col("table_idx").cast("int").alias("table_idx"),
            _pack_sign_bucket(planes).alias("base"),
            margins.alias("ms"),
        )
        .select("query_id", "table_idx", F.explode(probes).alias("bucket"))
    )
    return (
        F.broadcast(q)
        .join(corpus, ["table_idx", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


def _sql_multiprobe_ctes(
    prefix: str = "mp",
    planes: int = LSH_PLANES,
    tables: int = MP_TABLES,
    probes: int = MP_PROBES,
) -> str:
    """DuckDB twin of lsh_multiprobe_candidates at an arbitrary
    geometry: reuses the {prefix}dots / {prefix}buckets CTEs, ranks
    planes by (|dot|, plane), flips the top ``probes`` bits with xor.
    Ends in ``{prefix}cand(query_id, vec_id)``."""
    return (
        _sql_buckets_cte(planes, tables, prefix=prefix)
        + f""",
    {prefix}q AS (
        SELECT vec_id, table_idx,
               CAST(sum(CASE WHEN dq >= 0 THEN CAST(1 AS BIGINT) << plane
                             ELSE 0 END) AS BIGINT) AS base,
               list_sort(list(struct_pack(
                   m := abs(dq), p := plane,
                   b := CAST(CAST(1 AS BIGINT) << plane AS BIGINT)))) AS ms
        FROM {prefix}dots WHERE vec_id < {N_QUERIES}
        GROUP BY vec_id, table_idx),
    {prefix}pr AS (
        SELECT vec_id AS query_id, table_idx,
               unnest(list_prepend(base,
                   list_transform(ms[1:{probes}],
                                  s -> xor(base, s.b)))) AS bucket
        FROM {prefix}q),
    {prefix}cand AS (
        SELECT DISTINCT p.query_id, b.vec_id
        FROM {prefix}pr p JOIN {prefix}buckets b
          ON b.table_idx = p.table_idx AND b.bucket = p.bucket
        WHERE b.vec_id <> p.query_id)"""
    )


@register(
    "similarity_ann_lsh_multiprobe",
    oracle=f"""
    WITH {_sql_multiprobe_ctes()},
    scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6)
                 AS cosine
        FROM mpcand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    {_SQL_RANK}
    """,
)
def similarity_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-{TOP_K} from ONE {LSH_PLANES}-plane table probed at
    1 + {MP_PROBES} buckets per query — the multi-probe trade: recall
    comparable to the {LSH_TABLES}-table single-probe demo tier at 1/
    {LSH_TABLES} the index memory and 1/{LSH_TABLES} the corpus-side
    bucket-derivation work (multiprobe_recall_report prices it, and
    tests/test_multiprobe.py pins the candidate-superset invariant).
    Plan shape is unchanged from the single-probe tier: a broadcast
    probe table, one (table, bucket) equi-join, exact cosine on
    candidates, windowed top-k."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cand = lsh_multiprobe_candidates(emb, LSH_PLANES, MP_TABLES, MP_PROBES)
    return _rank_topk(_score_pairs(emb, cand))


@register(
    "multiprobe_recall_report",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_sql_multiprobe_ctes()},
    sp_cand AS (
        SELECT DISTINCT q.vec_id AS query_id, b.vec_id
        FROM mpq q JOIN mpbuckets b
          ON b.table_idx = q.table_idx AND b.bucket = q.base
        WHERE b.vec_id <> q.vec_id),
    topk_sp AS (
        SELECT query_id, vec_id FROM (
            SELECT s.query_id, s.vec_id,
                   row_number() OVER (PARTITION BY s.query_id
                       ORDER BY s.cosine DESC, s.vec_id) AS rank
            FROM (SELECT c.query_id, c.vec_id,
                         round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6)
                           AS cosine
                  FROM sp_cand c
                  JOIN embeddings eq ON eq.vec_id = c.query_id
                  JOIN embeddings ev ON ev.vec_id = c.vec_id) s)
        WHERE rank <= {TOP_K}),
    topk_mp AS (
        SELECT query_id, vec_id FROM (
            SELECT s.query_id, s.vec_id,
                   row_number() OVER (PARTITION BY s.query_id
                       ORDER BY s.cosine DESC, s.vec_id) AS rank
            FROM (SELECT c.query_id, c.vec_id,
                         round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6)
                           AS cosine
                  FROM mpcand c
                  JOIN embeddings eq ON eq.vec_id = c.query_id
                  JOIN embeddings ev ON ev.vec_id = c.vec_id) s)
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('lsh_t1_single', 'topk_sp')}
    UNION ALL
    {_sql_tier_recall('lsh_t1_multiprobe', 'topk_mp')}
    """,
)
def multiprobe_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the SAME one-table index probed both ways —
    single-probe vs multi-probe(1+{MP_PROBES}) — against the exact
    baseline: the number that licenses trading {LSH_TABLES}x index
    memory for a constant query-side probe fan-out. Multi-probe
    candidates are a superset of single-probe's by construction, so
    per-query recall can only rise; the report shows BY HOW MUCH the
    flipped low-margin buckets close the gap to the multi-table tier."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    exact = _exact_topk(spark, sf_dir).select("query_id", "vec_id")
    sp = ann_lsh_topk(emb, LSH_PLANES, MP_TABLES)
    mp = _rank_topk(
        _score_pairs(
            emb, lsh_multiprobe_candidates(emb, LSH_PLANES, MP_TABLES, MP_PROBES)
        )
    )
    return _tier_recall(exact, "lsh_t1_single", sp).unionByName(
        _tier_recall(exact, "lsh_t1_multiprobe", mp)
    )



# The production form: the planted-corpus test (tests/test_multiprobe.py)
# measures this geometry at 0.99 recall vs the 32-table single-probe
# tier's 0.98 — the several-x table cut the 2007 paper claims.
MP_SCALED_TABLES = 8


@register(
    "similarity_ann_lsh_multiprobe_scaled",
    oracle=f"""
    WITH {_sql_multiprobe_ctes('mps', SCALED_LSH_PLANES, MP_SCALED_TABLES)},
    scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6)
                 AS cosine
        FROM mpscand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    {_SQL_RANK}
    """,
)
def similarity_ann_lsh_multiprobe_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-probe at the PRODUCTION plane count: {SCALED_LSH_PLANES}
    planes x {MP_SCALED_TABLES} tables probed at 1 + {MP_PROBES} buckets
    — measured 0.99 recall on the planted cosine-0.70..0.82 corpus
    against the {SCALED_LSH_TABLES}-table single-probe tier's 0.98
    (tests/test_multiprobe.py), at 1/4 the index memory and 1/4 the
    corpus-side bucket-derivation bill. The geometry a 1e9-vector
    deployment would actually pick: planes scale with log2|V| for
    bucket occupancy, probes hold recall, tables pay only for the last
    nines."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cand = lsh_multiprobe_candidates(
        emb, SCALED_LSH_PLANES, MP_SCALED_TABLES, MP_PROBES
    )
    return _rank_topk(_score_pairs(emb, cand))


# ---------------------------------------------------------------------------
# Top principal direction by power iteration over the Gram matrix, exact
# integer arithmetic.
PCA_ITERS = 2
PCA_XQ_SCALE = 10_000   # float*1e4 is exact in double (24+14 mantissa bits)
PCA_V_SCALE = 1_000     # direction vector renormalized to +-1000 units
PCA_GRAM_SHRINK = 10_000  # Gram entries shrunk once before the iterations


def _sql_pca_power() -> str:
    """Unrolled DuckDB CTE chain mirroring the Spark plan: Gram matrix
    (via a plain self-join on vec_id — oracle clarity over speed), one
    sign-split truncating shrink, then matrix-vector power iterations.
    All arithmetic is integer, so both engines produce bit-identical
    BIGINT directions."""
    ctes = [
        f"""
    ex AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {PCA_XQ_SCALE})
                    AS BIGINT) AS xq
        FROM embeddings),
    gram AS (SELECT a.pos AS i, b.pos AS j,
                    CAST(sum(CAST(a.xq * b.xq AS HUGEINT)) AS HUGEINT) AS g
             FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
    gsm AS (SELECT i, j,
                   CAST(CASE WHEN g < 0 THEN -((-g) // {PCA_GRAM_SHRINK})
                             ELSE g // {PCA_GRAM_SHRINK} END AS BIGINT) AS gs
            FROM gram),
    v0 AS (SELECT CAST(range AS BIGINT) AS pos,
                  CAST({PCA_V_SCALE} AS BIGINT) AS vq
           FROM range(0, {EMB_DIM}))"""
    ]
    for i in range(1, PCA_ITERS + 1):
        ctes.append(
            f"""
    w{i} AS (
        SELECT g.i AS pos,
               CAST(sum(CAST(g.gs AS HUGEINT) * v.vq) AS HUGEINT) AS w
        FROM gsm g JOIN v{i - 1} v ON g.j = v.pos GROUP BY g.i),
    m{i} AS (SELECT greatest(max(abs(w)), CAST(1 AS HUGEINT)) AS m FROM w{i}),
    v{i} AS (
        SELECT pos,
               CAST(CASE WHEN w < 0 THEN -((-w * {PCA_V_SCALE}) // m)
                         ELSE (w * {PCA_V_SCALE}) // m END AS BIGINT) AS vq
        FROM w{i} CROSS JOIN m{i})"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT pos, vq AS axis_unit,
           round(CAST(vq AS DOUBLE) / {PCA_V_SCALE}, 6) AS axis
    FROM v{PCA_ITERS}
    """
    )


@register("embedding_pca_power", oracle=_sql_pca_power())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud (uncentered Gram)
    by power iteration — the dimensionality-analysis pass a training
    pipeline runs before choosing projection/whitening.

    Single-pass Gram formulation (VERDICT r3 #7; replaces the r3 plan
    whose every iteration re-joined the full exploded table and shuffled
    64*N rows): the 64x64 Gram matrix G = X^T X is aggregated in ONE
    pass over the data — each vector emits its d(d+1)/2 upper-triangle
    products (posexplode over a sliced copy of the quantized array,
    symmetry supplies the lower triangle after the shuffle) into a
    map-side-combined groupBy with 2,080 groups. Everything downstream
    operates on the 4,096-row (or 64-row) constant-size tables: per
    iteration one broadcast join + 64-group aggregate computes w = G.v,
    and a collect_list fold to ONE array row renormalizes by max-abs
    without a second reference to the w subtree. The half-matrix ends in
    a pinned repartition exchange (the dedup.py:218 exchange-reuse idiom)
    so the mirror union and both iterations read one materialized shuffle
    — the data-sized pass executes once. Adding iterations costs zero
    additional passes over the data, vs one 64*N-row shuffle each in r3.

    Exactness discipline (the pagerank playbook): embeddings quantize to
    floor(x*1e4) — exact in double for float32 inputs — then G sums
    xq_i*xq_j exactly, shrinks ONCE by sign-split truncating div (agreeing
    with DuckDB's // on negatives), and the iterations are pure integer
    matrix-vector products renormalized to +-1000 units. Bit-identical
    BIGINT axes on both engines. Magnitudes: per-term products fit in
    BIGINT, but every data-proportional ACCUMULATION (the Gram sum, the
    w = G.v sum, and the w*1e3 renormalize product) runs in
    DECIMAL(38,0) — HUGEINT on the oracle side — because 64-bit versions
    wrap silently at N ~ 1.4e7 (w*1e3) and N ~ 9e10 (Gram) vectors;
    38 digits are exact past N = 1e20. Only the bounded quotients
    (gs <= N*1e4, vq <= 1e3) return to BIGINT."""
    # fan_out (r13, guide §2.5): the d(d+1)/2-products explode is the
    # data-proportional pass and ran on the scan's row-group tasks (25x
    # bench: core-insensitive at ~20 s, 6x faster spread). 1 MB/task
    # density: tiny corpora stay un-repartitioned; no-op at multi-file
    # scale.
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), bytes_per_task=1 << 20)
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * PCA_XQ_SCALE).cast("bigint"),
    )
    ex = emb.select(q.alias("qarr")).select(
        F.posexplode("qarr").alias("i", "xi"), "qarr"
    )
    half = ex.select(
        "i",
        "xi",
        F.posexplode(
            F.slice("qarr", F.col("i") + 1, F.lit(EMB_DIM) - F.col("i"))
        ).alias("jj", "xj"),
    ).select(
        "i",
        (F.col("i") + F.col("jj")).alias("j"),
        (F.col("xi") * F.col("xj")).alias("p"),
    )
    # DECIMAL(38,0) sum (HUGEINT in the oracle): per-term products fit in
    # BIGINT (|xq_i*xq_j| <= 1e8) but the corpus-wide sum must not — with
    # a 64-bit accumulator the Gram entries silently wrap at N ~ 9e10
    # vectors; the 38-digit accumulator is exact at any realistic N.
    gram_h = half.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("g")
    )
    gs_h = gram_h.select(
        "i",
        "j",
        F.when(F.col("g") < 0, -F.expr(f"(-g) div {PCA_GRAM_SHRINK}"))
        .otherwise(F.expr(f"g div {PCA_GRAM_SHRINK}"))
        .alias("gs"),
    ).repartition(1)  # pin: one materialized shuffle, every reader reuses it
    gs = gs_h.unionByName(
        gs_h.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "gs"
        )
    )

    v = spark.range(0, EMB_DIM).select(
        F.col("id").cast("bigint").alias("pos"),
        F.lit(PCA_V_SCALE).cast("bigint").alias("vq"),
    )
    for _ in range(PCA_ITERS):
        # w accumulates in DECIMAL(38,0) and the *PCA_V_SCALE renormalize
        # product runs in decimal too: with BIGINT arithmetic w*1000
        # wraps silently at N ~ 1.4e7 vectors (r4 review finding) — four
        # orders below the exactness this operator claims. The quotient
        # itself is <= PCA_V_SCALE, so vq lands back in BIGINT.
        w = (
            gs.join(F.broadcast(v), gs.j == v.pos)
            .groupBy("i")
            .agg(
                F.sum(F.col("gs").cast("decimal(38,0)") * F.col("vq")).alias(
                    "w"
                )
            )
        )
        # fold the 64 w rows into ONE array attribute so max-abs and the
        # renormalize read a single column — w's subtree referenced once
        warr = w.agg(
            F.array_sort(F.collect_list(F.struct("i", "w"))).alias("wa")
        )
        mx = F.greatest(
            F.array_max(F.transform("wa", lambda x: F.abs(x["w"]))),
            F.lit(1).cast("decimal(38,0)"),
        )
        v = warr.select(
            F.posexplode(
                F.transform(
                    "wa",
                    lambda e: F.struct(
                        e["i"].alias("pos"),
                        F.when(
                            e["w"] < 0,
                            -F.call_function(
                                "div", -(e["w"] * PCA_V_SCALE), mx
                            ),
                        )
                        .otherwise(
                            F.call_function("div", e["w"] * PCA_V_SCALE, mx)
                        )
                        .alias("vq"),
                    ),
                )
            ).alias("ign", "e")
        ).select(F.col("e.pos").alias("pos"), F.col("e.vq").alias("vq"))
    return v.select(
        "pos",
        F.col("vq").alias("axis_unit"),
        F.round(F.col("vq").cast("double") / PCA_V_SCALE, 6).alias("axis"),
    )


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): cluster-scoped semantic
# near-dup removal over the embedding space.
SEMDEDUP_TAU = 0.35  # same planted-near-dup threshold as dedup_embedding


@register(
    "semdedup_clusters",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id % {IVF_CENT_MOD} = {IVF_CENT_REM}),
    assign AS (
        SELECT vec_id, cid, embedding FROM (
            SELECT v.vec_id, c.cid, v.embedding,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings v, cent c)
        WHERE rn = 1),
    pairs AS (
        SELECT a.cid, a.vec_id AS ka, b.vec_id AS kb,
               round({sql_cosine_pair('a.embedding', 'b.embedding')}, 6) AS c
        FROM assign a JOIN assign b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE round({sql_cosine_pair('a.embedding', 'b.embedding')}, 6)
              >= {SEMDEDUP_TAU}),
    ranked AS (
        SELECT cid, kb AS drop_id, ka, c,
               row_number() OVER (PARTITION BY kb ORDER BY ka) AS rn
        FROM pairs)
    SELECT cid, ka AS keep_id, drop_id, c AS cosine
    FROM ranked WHERE rn = 1
    """,
)
def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: vectors are assigned to
    their nearest seed centroid (the IVF/kmeans_refine assignment), and
    only WITHIN each cluster are pairwise cosines computed; a vector is
    dropped when some lower-id cluster-mate sits at cosine >=
    SEMDEDUP_TAU = 0.35 (its keeper = the lowest such id, reported with
    that pair's cosine). This is the paper's cost model verbatim: the
    quadratic pair search is confined to cluster cells, so total work is
    sum(|cell|^2) ~ |V|^2/k instead of |V|^2, and each cell's pairs come
    from one equi-join on cid.

    Plan shape: assignment is the argmax AGGREGATE over broadcast
    centroids (map-side partial, |V| assignment rows shuffle once); the
    pair search is a self-equi-join on cid (AQE splits a skewed cell);
    keeper election is a min-struct aggregate on the dropped id, not a
    window sort. Distinct from dedup_embedding, which buckets by random
    hyperplanes: SemDeDup's cells follow the data's cluster structure,
    the production recipe when a quantizer already exists (e.g. the IVF
    index is built anyway)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    cent = emb.filter(F.col("vec_id") % IVF_CENT_MOD == IVF_CENT_REM).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.struct(
                F.round(
                    cosine_n(
                        F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")
                    ),
                    6,
                ).alias("score"),
                (-F.col("cid")).alias("negcid"),
            ).alias("sc"),
        )
        .groupBy("vec_id")
        .agg(F.max("sc").alias("m"))
        .select("vec_id", (-F.col("m.negcid")).alias("cid"))
    )
    av = assign.join(emb, "vec_id").select("cid", "vec_id", "embedding", "nrm")
    a, b = av.alias("a"), av.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cid").alias("cid"),
            F.col("a.vec_id").alias("ka"),
            F.col("b.vec_id").alias("kb"),
            F.round(
                cosine_n(
                    F.col("a.embedding"),
                    F.col("b.embedding"),
                    F.col("a.nrm"),
                    F.col("b.nrm"),
                ),
                6,
            ).alias("c"),
        )
        .filter(F.col("c") >= SEMDEDUP_TAU)
    )
    return (
        pairs.groupBy("cid", F.col("kb").alias("drop_id"))
        .agg(F.min(F.struct("ka", "c")).alias("m"))
        .select(
            "cid",
            F.col("m.ka").alias("keep_id"),
            "drop_id",
            F.col("m.c").alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) of
# the BM25 lexical list and an embedding-cosine semantic list — the
# standard way modern retrieval (and retrieval-driven data curation)
# combines keyword and vector search without score calibration.
RRF_K = 60           # the paper's smoothing constant
HYBRID_SEM_QUERY = 0  # semantic query = this vec_id's embedding
# Depth of each input ranking. The lexical depth IS BM25_SQL's LIMIT, so
# tie the constant to it rather than shadowing it with a parallel literal.
HYBRID_LIST_K = BM25_TOP_K
HYBRID_TOP_K = 10     # fused results returned


def _rrf_term(rank_col: str) -> Column:
    """round(1e9 / (RRF_K + rank)) as BIGINT nano-units; 0 when the doc
    is absent from that list — exact on both engines."""
    return F.coalesce(
        F.round(F.lit(1_000_000_000.0) / (F.lit(RRF_K) + F.col(rank_col))).cast(
            "bigint"
        ),
        F.lit(0).cast("bigint"),
    )


@register(
    "hybrid_rrf",
    oracle=f"""
    WITH lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
                    AS BIGINT) AS lex_rank
        FROM ({BM25_SQL}) bq),
    q0 AS (SELECT embedding AS qe FROM embeddings
           WHERE vec_id = {HYBRID_SEM_QUERY}),
    semtop AS (
        SELECT vec_id AS doc_id, cosine FROM (
            SELECT v.vec_id,
                   round({sql_cosine_pair('q0.qe', 'v.embedding')}, 6) AS cosine
            FROM embeddings v CROSS JOIN q0
            WHERE v.vec_id <> {HYBRID_SEM_QUERY})
        ORDER BY cosine DESC, vec_id LIMIT {HYBRID_LIST_K}),
    sem AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
                    AS BIGINT) AS sem_rank
        FROM semtop),
    fused AS (
        SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
               coalesce(CAST(round(1000000000.0 / ({RRF_K} + l.lex_rank))
                             AS BIGINT), 0)
             + coalesce(CAST(round(1000000000.0 / ({RRF_K} + s.sem_rank))
                             AS BIGINT), 0) AS rrf_nano
        FROM lex l FULL JOIN sem s ON l.doc_id = s.doc_id)
    SELECT doc_id, lex_rank, sem_rank,
           round(CAST(rrf_nano AS DOUBLE) / 1000000000, 9) AS rrf
    FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT {HYBRID_TOP_K}
    """,
)
def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    the BM25 top-{HYBRID_LIST_K} lexical list (textops.bm25_topk, fixed
    query) and the cosine top-{HYBRID_LIST_K} semantic list (query =
    vec_id {HYBRID_SEM_QUERY}'s embedding; doc_id and vec_id share one id
    domain in the testdata) are fused by rrf(d) = sum 1/({RRF_K}+rank),
    each term in exact integer nano-units so the fused ordering cannot
    diverge on float summation.

    Scale shape: both input rankings end in TakeOrdered top-k (never a
    global sort); the partitionless row_number windows run AFTER the
    limit, over constant {HYBRID_LIST_K}-row sets, so the single-partition
    window is O(k) regardless of corpus size; the fusion join and final
    top-k are over 2k rows. The semantic side is one pass over the vector
    table against a 1-row broadcast query."""
    from mapreduce_spark.operators.textops import bm25_topk

    wlex = Window.orderBy(F.col("score_micro").desc(), "doc_id")
    lex = (
        bm25_topk(spark, sf_dir)
        .select("doc_id", "score_micro")
        .withColumn("lex_rank", F.row_number().over(wlex).cast("bigint"))
        .select("doc_id", "lex_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    q0 = emb.filter(F.col("vec_id") == HYBRID_SEM_QUERY).select(
        F.col("embedding").alias("qe"), F.col("nrm").alias("qn")
    )
    semtop = (
        emb.filter(F.col("vec_id") != HYBRID_SEM_QUERY)
        .crossJoin(F.broadcast(q0))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine_n(F.col("qe"), F.col("embedding"), F.col("qn"), F.col("nrm")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(HYBRID_LIST_K)
    )
    wsem = Window.orderBy(F.col("cosine").desc(), "doc_id")
    sem = (
        semtop.withColumn("sem_rank", F.row_number().over(wsem).cast("bigint"))
        .select("doc_id", "sem_rank")
    )
    fused = lex.join(sem, "doc_id", "full").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (_rrf_term("lex_rank") + _rrf_term("sem_rank")).alias("rrf_nano"),
    )
    return (
        fused.orderBy(F.col("rrf_nano").desc(), "doc_id")
        .limit(HYBRID_TOP_K)
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round(F.col("rrf_nano").cast("double") / 1_000_000_000, 9).alias("rrf"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding outliers: per-label distance-to-centroid ranking — the
# prototypicality filter of curation pipelines (flag probable mislabels /
# noise vectors for review before training).
EMB_OUTLIER_K = 5  # most-distant vectors reported per label


@register(
    "embedding_outliers",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS xq
        FROM embeddings),
    sums AS (SELECT label, pos, CAST(sum(xq) AS BIGINT) AS s,
                    CAST(count(*) AS BIGINT) AS n
             FROM ex GROUP BY label, pos),
    d2 AS (SELECT e.vec_id, e.label,
                  CAST(sum(CAST(e.xq * s.n - s.s AS HUGEINT)
                           * CAST(e.xq * s.n - s.s AS HUGEINT)) AS HUGEINT)
                    AS d2,
                  max(s.n) AS n
           FROM ex e JOIN sums s ON s.label = e.label AND s.pos = e.pos
           GROUP BY e.vec_id, e.label),
    ranked AS (
        SELECT label, vec_id,
               round(sqrt(CAST(d2 AS DOUBLE)) / n / 1000000, 6) AS dist,
               CAST(row_number() OVER (PARTITION BY label
                                       ORDER BY d2 DESC, vec_id) AS BIGINT)
                 AS rank
        FROM d2)
    SELECT label, vec_id, dist, rank FROM ranked WHERE rank <= {EMB_OUTLIER_K}
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{EMB_OUTLIER_K} most-distant vectors from their own label's
    mean centroid — the prototypicality screen a curation run uses to
    surface probable mislabels/noise before training (the distance-based
    complement of semdedup_clusters' too-similar filter).

    Integer-exact distances: components quantize to micro-units, and the
    scaled squared distance sum((xq*n - s)^2) — where s is the label's
    exact component sum and n its count — is computed entirely in
    integers, accumulated in DECIMAL(38,0) (HUGEINT on the oracle side;
    the squares reach ~1e30 at n~1e9, far past BIGINT). Ordering ranks on
    the exact integer, so ranking cannot diverge; the reported dist is
    one identical double conversion + sqrt on both engines.

    Plan shape: the per-(label, pos) sums table is |labels| x 64 rows —
    one exploded map-side-combined aggregate, reassembled to arrays and
    BROADCAST; scoring is then a zero-shuffle per-row zip_with fold over
    each vector. The only post-scan shuffle is the per-label top-k
    window over |labels| partitions."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1e6).cast("bigint"),
        ).alias("qarr"),
    )
    ex = emb.select("label", F.posexplode("qarr").alias("pos", "xq"))
    sums = ex.groupBy("label", "pos").agg(
        F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n")
    )
    sarr = sums.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda e: e["s"],
        ).alias("sarr"),
        F.max("n").alias("n"),
    )
    j = emb.join(F.broadcast(sarr), "label")
    diff = F.zip_with(
        "qarr", "sarr", lambda xq, s: xq * F.col("n") - s
    )
    dist2 = F.aggregate(
        diff,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: acc + t.cast("decimal(38,0)") * t,
    )
    scored = j.select("label", "vec_id", "n", dist2.alias("d2"))
    w = Window.partitionBy("label").orderBy(F.col("d2").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= EMB_OUTLIER_K)
        .select(
            "label",
            "vec_id",
            F.round(
                F.sqrt(F.col("d2").cast("double")) / F.col("n") / 1e6, 6
            ).alias("dist"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# 1-bit sign codes (Charikar 2002: sign(x_i) is axis-aligned hyperplane
# LSH, so Hamming/64 estimates angle/pi — good enough to SHORTLIST, not
# to rank). Defined here, ahead of the k-NN graph that uses them as its
# shortlist metric; the Hamming retrieval tier below registers them as a
# standalone data product. dim 64 packs into bits 0..31 / 32..63 of TWO
# BIGINT words so no partial sum ever reaches the 64-bit sign bit.
HAMMING_RERANK_FACTOR = 4
# Shortlist width floor for the k-NN graph build: 64-bit Hamming is a
# COARSE rank (65 distinct values, ties rampant), so a 4xk shortlist at
# small k (the demo graph's k=3 -> 12) throws away true neighbors the
# tie-broken popcount order can't distinguish — measured graph recall
# 0.46 -> 0.30 at sf0.01. A floor of 48 keeps the shortlist wide enough
# to cover Hamming's rank noise while still pruning the coarse-bucket
# candidate fan (hundreds per source at the demo geometry).
KNN_SHORTLIST_FLOOR = 48


def _knn_shortlist(k: int) -> int:
    return max(k * HAMMING_RERANK_FACTOR, KNN_SHORTLIST_FLOOR)


def _sign_word(lo: int) -> Column:
    """Bits lo..lo+31 of the sign code as a BIGINT: bit i set iff
    embedding[lo + i] >= 0 (exact on float32 in both engines)."""
    return F.expr(
        "aggregate(sequence(0, 31), cast(0 as bigint), (acc, i) -> acc + "
        f"IF(element_at(embedding, i + {lo} + 1) >= 0, "
        "shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"
    )


_SQL_SIGN_CTES = """
    sgn_ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               CASE WHEN CAST(unnest(embedding) AS DOUBLE) >= 0
                    THEN 1 ELSE 0 END AS b
        FROM embeddings),
    sgn AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN pos < 32
                             THEN b * (CAST(1 AS BIGINT) << pos)
                             ELSE 0 END) AS BIGINT) AS w0,
               CAST(sum(CASE WHEN pos >= 32
                             THEN b * (CAST(1 AS BIGINT) << (pos - 32))
                             ELSE 0 END) AS BIGINT) AS w1,
               CAST(sum(b) AS BIGINT) AS n_pos
        FROM sgn_ex GROUP BY vec_id)"""


def sign_codes_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, w0, w1, n_pos) — the packed 64-bit sign code over an
    arbitrary (vec_id, embedding) frame. Zero-shuffle: one fold per
    word per row."""
    return emb.select(
        "vec_id",
        _sign_word(0).alias("w0"),
        _sign_word(32).alias("w1"),
        (F.bit_count(_sign_word(0)) + F.bit_count(_sign_word(32)))
        .cast("bigint")
        .alias("n_pos"),
    )


# ---------------------------------------------------------------------------
# Full-corpus k-NN graph over the LSH buckets: every vector's top-k
# bucket-mate neighbors — the input artifact for graph-based curation
# (near-dup clustering, diversity sampling, label propagation).
KNN_GRAPH_K = 3


def _sql_knn_graph(
    bprefix: str, k: int, src_cap: str = "", member_pred: str = ""
) -> str:
    """Full knn-graph SELECT over a {bprefix}buckets CTE (optionally
    restricted to src < src_cap for the recall gauges, or to members
    satisfying ``member_pred`` — both endpoints — for the append
    lifecycle's base graph). Requires
    _SQL_SIGN_CTES in the same WITH: bucket candidates are shortlisted
    to HAMMING_RERANK_FACTOR x k per source by popcount Hamming over
    the sign codes before any float cosine is paid (VERDICT r5 #5 —
    the hamming_rerank_topk two-stage discipline applied to the graph
    build)."""
    conds = []
    if src_cap:
        conds.append(f"a.vec_id < {src_cap}")
    if member_pred:
        conds.append(member_pred.format(v="a.vec_id"))
        conds.append(member_pred.format(v="b.vec_id"))
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    return f"""
    cand_{bprefix}g AS (
        SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
        FROM {bprefix}buckets a JOIN {bprefix}buckets b
          ON a.table_idx = b.table_idx AND a.bucket = b.bucket
         AND b.vec_id <> a.vec_id
        {where}),
    hshort_{bprefix}g AS (
        SELECT src, dst FROM (
            SELECT c.src, c.dst,
                   row_number() OVER (PARTITION BY c.src ORDER BY
                       bit_count(xor(sa.w0, sb.w0))
                       + bit_count(xor(sa.w1, sb.w1)), c.dst) AS hrank
            FROM cand_{bprefix}g c
            JOIN sgn sa ON sa.vec_id = c.src
            JOIN sgn sb ON sb.vec_id = c.dst)
        WHERE hrank <= {_knn_shortlist(k)}),
    scored_{bprefix}g AS (
        SELECT c.src, c.dst,
               round({sql_cosine_pair('ea.embedding', 'eb.embedding')}, 6)
                 AS cosine
        FROM hshort_{bprefix}g c
        JOIN embeddings ea ON ea.vec_id = c.src
        JOIN embeddings eb ON eb.vec_id = c.dst),
    graph_{bprefix}g AS MATERIALIZED (
        SELECT src, dst, cosine, rank FROM (
            SELECT src, dst, cosine,
                   CAST(row_number() OVER (PARTITION BY src
                                           ORDER BY cosine DESC, dst) AS BIGINT)
                     AS rank
            FROM scored_{bprefix}g)
        WHERE rank <= {k})"""


@register(
    "knn_graph",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)}
    SELECT src, dst, cosine, rank FROM graph_g
    """,
)
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph over the WHOLE vector table: each vector's
    top-{KNN_GRAPH_K} neighbors among its LSH bucket-mates (hyperplane
    buckets, {LSH_TABLES} tables x 2^{LSH_PLANES} buckets), ranked by
    exact cosine. similarity_ann_lsh generalized from a fixed query set
    to every vector — the neighbor-graph data product that graph-based
    curation (connected-component dedup, diversity sampling, label
    propagation) consumes.

    Scale shape: candidates come ONLY from the (table, bucket) equi-join,
    so pair volume is sum(bucket_size^2) over buckets. That is NOT
    free: with a fixed 2^{LSH_PLANES}-bucket geometry buckets grow with
    |V| and the pair volume degenerates toward |V|^2/2^{LSH_PLANES} —
    at production scale LSH_PLANES must rise with log2(|V|) so the
    EXPECTED bucket size stays constant (e.g. ~20 planes at 1e9
    vectors), which keeps pair volume ~|V| x bucket_size; the equi-join
    shape is unchanged by the plane count, and AQE splits residual hot
    buckets. Norms are computed once per side; the per-source top-k is
    a window over each vector's own candidate list. Vectors whose
    buckets contain no other member yield no rows (the graph's honest
    sparsity at the corpus fringe).

    Cosine cost is HALVED by orienting the candidate join src < dst:
    cosine(a, b) = cosine(b, a), so each unordered pair is scored ONCE
    and the scored row is mirrored by a zero-cost union before the
    per-source window (which does need both orientations — a's top-k
    and b's top-k are different questions). r4's plan scored both
    orientations, running the 64-dim fold twice per pair on the
    dominant stage of the heaviest bench query."""
    return _knn_graph_profile(spark, sf_dir, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)


def _knn_graph_profile(
    spark: SparkSession, sf_dir: str, planes: int, tables: int, k: int
) -> DataFrame:
    """knn_graph under an arbitrary (planes, tables, k) profile — shared
    by the demo and scaled registrations; one plan, two geometries."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn_graph_edges(emb, planes, tables, k)


def knn_graph_edges_scaled(
    emb: DataFrame, k: int = KNN_GRAPH_SCALED_K
) -> DataFrame:
    """THE production k-NN graph: dynamic plane count
    lsh_planes_for(|V|) x {SCALED_LSH_TABLES} tables — expected bucket
    occupancy pinned in ({LSH_TARGET_BUCKET}/2, {LSH_TARGET_BUCKET}] at
    any corpus size, so the build's candidate-pair volume stays
    ~|V| x target instead of |V|^2/2^planes (BENCH_SCALE_r11's measured
    1.26 growth ratio under the fixed 8-plane geometry). The one
    emb.count() is the BUILD-time sizing scalar (the ivf_trained_hier
    convention); every scaled-graph consumer (knn_graph_scaled, the
    scaled cluster/beam/recall registrations) builds through this
    helper so the family shares one geometry, mirrored by
    _SQL_SDYN_BUCKETS_CTE on the oracle side. Buckets come from the
    Arrow-matmul derivation (lsh_buckets_np — bit-identical to
    lsh_buckets, without the n x planes JVM row explosion that grows
    n log n under the dynamic plane law)."""
    return knn_graph_edges(
        emb,
        lsh_planes_for(emb.count()),
        SCALED_LSH_TABLES,
        k,
        bucket_fn=lsh_buckets_np,
    )


def knn_graph_edges(
    emb: DataFrame, planes: int, tables: int, k: int, bucket_fn=lsh_buckets
) -> DataFrame:
    """The profile-parameterized k-NN-graph builder over any
    (vec_id, embedding) frame (fixture corpora in tests, the registered
    table in queries). src < dst pairs come from the CAPPED in-group
    enumeration (pairing.bucketed_pairs): healthy (table, bucket)
    groups expand in-group off one groupBy-collect exchange — buckets
    derived once, per-group expansion in-memory trivia at the target
    occupancy (~8 -> 28 pairs) — and buckets above BUCKET_CAP fall back
    to a salted self-join so one boilerplate-hot bucket can never
    materialize O(c^2) pairs inside a single aggregation group (AQE
    splits partitions, not groups — VERDICT r5 #1).

    Two-stage scoring (VERDICT r5 #5 — hamming_rerank_topk's discipline
    applied to the graph build): the candidate pairs are first ranked
    per source by popcount Hamming over the packed 64-bit sign codes —
    two BIGINT xor+popcounts per pair, computed ONCE per unordered pair
    and mirrored free since Hamming is symmetric — and only the
    _knn_shortlist(k)-wide shortlist pays the {EMB_DIM}-term float
    cosine fold. At production bucket occupancy the shortlist cuts the
    dominant stage's float work by the candidate-to-shortlist ratio;
    sources with fewer candidates than the shortlist width are passed
    through unchanged (shortlist is a no-op there).

    bucket_fn picks the bucket DERIVATION (identical output either
    way): lsh_buckets (JVM plan — the default, right for static demo
    geometry) or lsh_buckets_np (Arrow matmul — what the dynamic-plane
    production builder passes, where the JVM derivation's n x planes
    row explosion would reintroduce a measured n log n term)."""
    cand = bucketed_pairs(
        bucket_fn(emb, planes, tables),
        ["table_idx", "bucket"],
        "vec_id",
        "src",
        "dst",
    ).distinct()
    sgn = sign_codes_frame(emb).select("vec_id", "w0", "w1")
    sa = sgn.select(
        F.col("vec_id").alias("src"),
        F.col("w0").alias("a0"),
        F.col("w1").alias("a1"),
    )
    sb = sgn.select(
        F.col("vec_id").alias("dst"),
        F.col("w0").alias("b0"),
        F.col("w1").alias("b1"),
    )
    hhalf = cand.join(sa, "src").join(sb, "dst").select(
        "src",
        "dst",
        (
            F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
            + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
        )
        .cast("bigint")
        .alias("hamming"),
    )
    # mirror each unordered pair IN-TASK (explode of a 2-struct array)
    # instead of a self-union: the union form planned hhalf — and the
    # whole bucket derivation + sign joins under it — TWICE (guide §2.4:
    # remove duplicate subtree execution; values identical, Hamming is
    # symmetric)
    hboth = hhalf.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("src"),
                    F.col("dst").alias("dst"),
                    F.col("hamming").alias("hamming"),
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("hamming").alias("hamming"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.hamming")
    wh = Window.partitionBy("src").orderBy("hamming", "dst")
    short = (
        hboth.withColumn("hrank", F.row_number().over(wh))
        .filter(F.col("hrank") <= _knn_shortlist(k))
        .select("src", "dst")
    )
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    ea = embn.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("ae"),
        F.col("nrm").alias("an"),
    )
    eb = embn.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("be"),
        F.col("nrm").alias("bn"),
    )
    scored = short.join(ea, "src").join(eb, "dst").select(
        "src",
        "dst",
        F.round(
            cosine_n(F.col("ae"), F.col("be"), F.col("an"), F.col("bn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Graph-based ANN serving (the NSW family — Malkov et al. 2014, the
# layer-0 search HNSW ships; public). The missing fourth serving family
# next to buckets (LSH), lists (IVF) and codes (PQ): the offline
# artifact is the k-NN GRAPH (knn_graph — already a first-class data
# product here), and a query is answered by BEAM SEARCH over it — score
# a fixed entry set, then repeatedly expand the current best beam's
# graph neighbors. Per query per round the frontier is <= BEAM_WIDTH
# nodes with <= KNN_GRAPH_K out-edges each, so TOTAL scored candidates
# are <= |entries| + rounds x beam x k — independent of |V|. The rounds
# are unrolled joins (the knn_graph_clusters discipline), each one a
# (frontier.vec_id = graph.src) equi-join plus the shared broadcast
# scoring pass; the graph itself is derived once.
BEAM_ROUNDS = 2
BEAM_WIDTH = 4


def _beam_frontier(scored: DataFrame, beam: int) -> DataFrame:
    """Top-``beam`` (query_id, vec_id) of a scored frame, deterministic
    (cosine desc, vec_id)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= beam)
        .select("query_id", "vec_id")
    )


def graph_beam_topk(
    emb: DataFrame,
    graph: DataFrame,
    rounds: int = BEAM_ROUNDS,
    beam: int = BEAM_WIDTH,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    cent_mod: int = IVF_CENT_MOD,
    rem: int = IVF_CENT_REM,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(entry-only top-k, beam-search top-k, visited set) over a
    (src, dst) neighbor graph with LANDMARK entry: the |V|/cent_mod IVF
    seed vectors, scored in full against the broadcast query set. The
    WALK is beam-law-bounded, but this entry stage is linear in the
    corpus (|V|/cent_mod exact cosines per query) — fine for fixtures
    and recall gauges, the wrong serve path at 1e9 vectors. Production
    serving is graph_beam_topk_routed, whose entry cost is
    ~sqrt(|V|) + nprobe x cap. Each round anti-joins already-visited
    pairs so a node is scored once; returning both rankings lets the
    recall report price exactly what the walk adds over the entries."""
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    q = embn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    seeds = embn.filter(F.col("vec_id") % cent_mod == rem)
    scored0 = (
        seeds.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_n(F.col("qe"), F.col("embedding"), F.col("qn"), F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    beam_topk, visited = _beam_walk(emb, graph, scored0, rounds, beam, k)
    return _rank_topk(scored0, k), beam_topk, visited


def _beam_walk(
    emb: DataFrame,
    graph: DataFrame,
    scored0: DataFrame,
    rounds: int,
    beam: int,
    k: int,
) -> tuple[DataFrame, DataFrame]:
    """The walk stage shared by every beam tier: from a scored entry set,
    ``rounds`` iterations of expand-the-frontier's-out-edges, score only
    NEW (query, vec) pairs, keep the best ``beam`` as the next frontier.
    Returns (top-k of the visited set, the visited set itself).

    The entry set and each round's newly-scored pairs are MATERIALIZED
    (operators/artifacts.py; every frame is beam-law-bounded — <= |Q| x
    (|entries| + rounds x beam x k) rows): the visited/frontier chain
    references each round's frame 3+ times across the anti-join, the
    union and the next frontier, and before r12 each reference re-ran
    the full upstream derivation — entry scoring AND the k-NN-graph
    build — blowing the routed tier's executed plan up to 208 broadcast
    builds / 208 scans with zero ReusedExchange (plans/r12/)."""
    edges = graph.select("src", "dst")
    visited = materialize(scored0)
    frontier = _beam_frontier(visited, beam)
    for _ in range(rounds):
        # The WALK's frontier/visited frames broadcast: past the entry
        # stage they are bounded by the beam law (<= |Q| x (|entries| +
        # rounds x beam x k) rows), so the graph and the corpus stream
        # through hash joins with no shuffle. The bound is only as good
        # as |entries|: landmark entry (graph_beam_topk) carries
        # |V|/cent_mod entries — linear in the corpus — while the routed
        # entry (graph_beam_topk_routed) caps it at nprobe x cap.
        cand = (
            F.broadcast(frontier)
            .join(edges, frontier["vec_id"] == edges["src"])
            .select("query_id", F.col("dst").alias("vec_id"))
            .filter(F.col("vec_id") != F.col("query_id"))
            .distinct()
            .join(F.broadcast(visited), ["query_id", "vec_id"], "left_anti")
        )
        scored_r = materialize(_score_pairs(emb, cand, broadcast_cand=True))
        visited = visited.unionByName(scored_r)
        frontier = _beam_frontier(scored_r, beam)
    return _rank_topk(visited, k), visited


def _sql_beam_round_ctes(
    rounds: int = BEAM_ROUNDS, beam: int = BEAM_WIDTH, graph: str = "graph_g"
) -> str:
    """The walk rounds shared by every beam oracle: from a ``bv0``
    (query_id, vec_id, cosine) entry CTE defined earlier in the WITH,
    emit bf/bc/bs/bv CTEs per round, ending in ``bv{rounds}`` — the
    visited set."""
    ctes = []
    for r in range(1, rounds + 1):
        prev = f"bv{r - 1}"
        src = "bv0" if r == 1 else f"bs{r - 1}"
        ctes.append(
            f"""
    bf{r - 1} AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rn
            FROM {src})
        WHERE rn <= {beam}),
    bc{r} AS (
        SELECT DISTINCT f.query_id, g.dst AS vec_id
        FROM bf{r - 1} f JOIN {graph} g ON g.src = f.vec_id
        WHERE g.dst <> f.query_id
          AND NOT EXISTS (SELECT 1 FROM {prev} v
                          WHERE v.query_id = f.query_id
                            AND v.vec_id = g.dst)),
    bs{r} AS MATERIALIZED (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6)
                 AS cosine
        FROM bc{r} c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    bv{r} AS MATERIALIZED (
        SELECT * FROM {prev} UNION ALL SELECT * FROM bs{r})"""
        )
    return ",".join(ctes)


def _sql_graph_beam_ctes(
    rounds: int = BEAM_ROUNDS, beam: int = BEAM_WIDTH,
    graph: str = "graph_g",
    cent_mod: int = IVF_CENT_MOD, rem: int = IVF_CENT_REM,
) -> str:
    """DuckDB twin of graph_beam_topk (LANDMARK entry) over the
    materialized graph CTE (requires buckets + sign + _sql_knn_graph in
    the same WITH). Ends in ``bv{rounds}(query_id, vec_id, cosine)`` —
    the visited set — plus ``bv0`` for the entry-only tier."""
    entry = f"""
    bq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {N_QUERIES}),
    bv0 AS MATERIALIZED (
        SELECT q.query_id, s.vec_id,
               round({sql_cosine_pair('q.qe', 's.embedding')}, 6) AS cosine
        FROM bq q JOIN embeddings s
          ON s.vec_id % {cent_mod} = {rem}
         AND s.vec_id <> q.query_id)"""
    return entry + "," + _sql_beam_round_ctes(rounds, beam, graph)


@register(
    "similarity_graph_beam",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_graph_beam_ctes()},
    scored AS (SELECT * FROM bv{BEAM_ROUNDS})
    {_SQL_RANK}
    """,
)
def similarity_graph_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-{TOP_K} by beam search over the k-NN graph (the NSW/HNSW
    serving family), LANDMARK-entry tier: score the {IVF_CENT_MOD}-modulus
    landmark set, then {BEAM_ROUNDS} rounds of
    expand-the-best-{BEAM_WIDTH}-nodes' neighbors. The WALK scores at
    most {BEAM_ROUNDS} x {BEAM_WIDTH} x {KNN_GRAPH_K} candidates per
    query regardless of corpus size, and every expansion is a (frontier,
    graph.src) equi-join — but the ENTRY stage scores |V|/{IVF_CENT_MOD}
    landmarks per query, linear in the corpus (VERDICT r9). This tier is
    the recall gauge's baseline; production serving is
    similarity_graph_beam_routed, whose entry routes through the
    ~sqrt(|V|)-centroid coarse quantizer. Recall vs the bucket tiers is
    priced by graph_beam_recall_report; visited-growth and cost-law
    contracts are pinned in tests/test_graph_beam.py."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph = materialize(
        knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    )
    _, beam, _ = graph_beam_topk(emb, graph)
    return beam


# --------------------------------------------------------------------------
# ROUTED beam entry (VERDICT r9 #2): the production serve path. The
# landmark convention above prices entry at |V|/cent_mod exact cosines
# per query — linear in the corpus, 4e7 cosines/query at 1e9 vectors,
# defeating the graph tier's purpose. The routed entry is the IVF idea
# applied to entry selection (Malkov et al.'s hierarchy collapsed to one
# coarse level): K ~ sqrt(|V|) centroids (cent_mod scales with |V| so K
# does — FAISS pins K in the 2^16-2^18 band or ~sqrt(N) for the same
# reason), every vector assigned OFFLINE to its nearest centroid with a
# per-cell member rank, and a query scores only the K centroids plus the
# top-ENTRY_CAP members of its ROUTED_NPROBE nearest cells. Entry-stage
# exact cosines per query = K + nprobe x cap ~ sqrt(|V|) + O(1); the walk
# then proceeds under the unchanged beam law. Sub-linearity is pinned by
# SQLMetrics in tests/test_graph_beam.py (the centroid NLJ build side IS
# K) and graded by the graph_beam_routed_entry_stats gauge.
ROUTED_NPROBE = 4
ROUTED_ENTRY_CAP = 16
ROUTED_REM = 1


def _routed_cent_mod(n: int) -> int:
    """cent_mod = ceil(sqrt(n)), floored at 2, so K = |{vec_id % cent_mod
    == ROUTED_REM}| ~ sqrt(n). Exact for n < 2^52 (double sqrt of an
    integer is correctly rounded there), matching DuckDB's
    ceil(sqrt(count(*))) bit-for-bit."""
    return max(2, math.ceil(math.sqrt(n)))


def routed_artifacts(
    emb: DataFrame, cap: int = ROUTED_ENTRY_CAP
) -> tuple[DataFrame, DataFrame]:
    """The routed entry's OFFLINE structures — (centroids, members):
    ~sqrt(|V|) centroid rows (cid, ce, cn) and each cell's top-``cap``
    members by offline centroid affinity. These are INDEX-BUILD
    artifacts (the one emb.count() here is the build-time sizing scalar,
    not a serve-time collect); graph_index_write_routed persists them so
    a probe never re-derives the |V| x K assignment."""
    n = emb.count()
    cent_mod = _routed_cent_mod(n)
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    cent = embn.filter(F.col("vec_id") % cent_mod == ROUTED_REM).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    pairs = embn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.round(
            cosine_n(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")), 6
        ).alias("cc"),
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("cc").desc(), F.col("cid"))
    assign = (
        pairs.withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "cid", "cc")
    )
    wm = Window.partitionBy("cid").orderBy(F.col("cc").desc(), F.col("vec_id"))
    members = (
        assign.withColumn("member_rank", F.row_number().over(wm))
        .filter(F.col("member_rank") <= cap)
        .select("vec_id", "cid")
    )
    # the member table is the expensive artifact (the |V| x K offline
    # assignment NLJ sits above it) and downstream beam plans reference
    # the entry set it feeds several times — materialize it once
    # (operators/artifacts.py; <= K x cap rows)
    return cent, materialize(members)


def routed_entry_from(
    emb: DataFrame,
    cent: DataFrame,
    members: DataFrame,
    nprobe: int = ROUTED_NPROBE,
    n_queries: int = N_QUERIES,
) -> tuple[DataFrame, DataFrame]:
    """(scored entry set, entry-candidate pairs) — the routed entry's
    SERVE path over given (possibly stored) routing artifacts: a query
    pays K centroid cosines + at most nprobe x cap member cosines,
    whether the artifacts came from routed_artifacts in-plan or from the
    tables graph_index_write_routed persisted."""
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    q = embn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    qc = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "cid",
        F.round(
            cosine_n(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")), 6
        ).alias("qc"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("qc").desc(), F.col("cid"))
    probe = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cid")
    )
    entries = (
        F.broadcast(probe)
        .join(members, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored0 = _score_pairs(emb, entries, broadcast_cand=True)
    return scored0, entries


def routed_entry(
    emb: DataFrame,
    nprobe: int = ROUTED_NPROBE,
    cap: int = ROUTED_ENTRY_CAP,
    n_queries: int = N_QUERIES,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(scored entry set, centroid frame, entry-candidate pairs) with
    the routing artifacts derived in-plan — the one-shot form the
    in-memory graded queries use; the persisted tier splits the same
    code into routed_artifacts (build) + routed_entry_from (serve)."""
    cent, members = routed_artifacts(emb, cap)
    scored0, entries = routed_entry_from(emb, cent, members, nprobe, n_queries)
    return scored0, cent, entries


def graph_beam_topk_routed(
    emb: DataFrame,
    graph: DataFrame,
    rounds: int = BEAM_ROUNDS,
    beam: int = BEAM_WIDTH,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    nprobe: int = ROUTED_NPROBE,
    cap: int = ROUTED_ENTRY_CAP,
    scored0: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(entry-only top-k, beam top-k, visited set) with the ROUTED entry:
    the serve path whose per-query exact-cosine count is
    K + nprobe x cap + rounds x beam x k ~ sqrt(|V|) + O(1) — sub-linear
    in the corpus, unlike graph_beam_topk's landmark entry. ``scored0``
    lets a caller pre-build the routed entry set concurrently with the
    graph (the §2.6 overlap in the registered routed queries).

    ``nprobe``/``cap``/``n_queries`` are ENTRY-BUILD parameters only
    (ADVICE r12): when a pre-built ``scored0`` is passed they are
    unused — entry behavior is whatever parameters built scored0 —
    so do not combine non-default values with scored0."""
    if scored0 is None:
        scored0, _, _ = routed_entry(emb, nprobe, cap, n_queries)
    beam_topk, visited = _beam_walk(emb, graph, scored0, rounds, beam, k)
    return _rank_topk(scored0, k), beam_topk, visited


def _sql_routed_entry_ctes(
    nprobe: int = ROUTED_NPROBE,
    cap: int = ROUTED_ENTRY_CAP,
    n_queries: int = N_QUERIES,
) -> str:
    """DuckDB twin of routed_entry, ending in bv0 (the scored entry set)
    plus rt_cent/rt_members/rt_probe for the gauge."""
    return f"""
    rt_cm AS (SELECT GREATEST(2, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS cm
              FROM embeddings),
    rt_cent AS (SELECT vec_id AS cid, embedding AS ce
                FROM embeddings, rt_cm WHERE vec_id % cm = {ROUTED_REM}),
    rt_pairs AS (
        SELECT v.vec_id, c.cid,
               round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) AS cc
        FROM embeddings v, rt_cent c),
    rt_assign AS (
        SELECT vec_id, cid, cc FROM (
            SELECT vec_id, cid, cc,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY cc DESC, cid) AS rn
            FROM rt_pairs)
        WHERE rn = 1),
    rt_members AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY cid
                       ORDER BY cc DESC, vec_id) AS mr
            FROM rt_assign)
        WHERE mr <= {cap}),
    bq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {n_queries}),
    rt_probe AS (
        SELECT query_id, cid FROM (
            SELECT q.query_id, c.cid,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY round({sql_cosine_pair('q.qe', 'c.ce')}, 6)
                                    DESC, c.cid) AS rn
            FROM bq q, rt_cent c)
        WHERE rn <= {nprobe}),
    bv0 AS MATERIALIZED (
        SELECT DISTINCT q.query_id, m.vec_id,
               round({sql_cosine_pair('q.qe', 'e.embedding')}, 6) AS cosine
        FROM rt_probe p
        JOIN rt_members m ON m.cid = p.cid
        JOIN bq q ON q.query_id = p.query_id
        JOIN embeddings e ON e.vec_id = m.vec_id
        WHERE m.vec_id <> q.query_id)"""


@register(
    "similarity_graph_beam_routed",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_routed_entry_ctes()},
    {_sql_beam_round_ctes()},
    scored AS (SELECT * FROM bv{BEAM_ROUNDS})
    {_SQL_RANK}
    """,
)
def similarity_graph_beam_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph tier's PRODUCTION serve path (VERDICT r9 #2): beam
    search whose entry routes through a ~sqrt(|V|)-centroid coarse
    quantizer — K = |V|/ceil(sqrt(|V|)) centroids scored per query, the
    {ROUTED_NPROBE} nearest cells probed, and only each cell's top
    {ROUTED_ENTRY_CAP} members (by offline centroid affinity) entering
    the walk. Per-query exact cosines: ~sqrt(|V|) + {ROUTED_NPROBE} x
    {ROUTED_ENTRY_CAP} + {BEAM_ROUNDS} x {BEAM_WIDTH} x {KNN_GRAPH_K},
    vs the landmark tier's |V|/{IVF_CENT_MOD}. Sub-linearity is pinned
    via SQLMetrics (the centroid NLJ build side) in
    tests/test_graph_beam.py; entry volume is graded by
    graph_beam_routed_entry_stats."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # the graph checkpoint and the routed-entry build (which checkpoints
    # the member table) share no dependency — overlap them (guide §2.6;
    # A/B-measured, OPTIMIZATION_r12.md)
    graph, (scored0, _, _) = run_concurrently(
        lambda: materialize(
            knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
        ),
        lambda: routed_entry(emb),
    )
    _, beam, _ = graph_beam_topk_routed(emb, graph, scored0=scored0)
    return beam


@register(
    "graph_beam_routed_entry_stats",
    oracle=f"""
    WITH {_sql_routed_entry_ctes()},
    per_q AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n
              FROM bv0 GROUP BY query_id),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors FROM embeddings),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_centroids FROM rt_cent)
    SELECT nv.n_vectors, nc.n_centroids,
           CAST(max(per_q.n) AS BIGINT) AS entry_rows_max,
           max(per_q.n) <= {ROUTED_NPROBE * ROUTED_ENTRY_CAP} AS entry_bounded,
           nc.n_centroids * nc.n_centroids <= 4 * nv.n_vectors
             AS routing_sublinear
    FROM per_q, nv, nc
    GROUP BY nv.n_vectors, nc.n_centroids
    """,
)
def graph_beam_routed_entry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The routed tier's cost gauge (allpairs_prefix_stats' sibling):
    corpus size, centroid count, the worst per-query entry-candidate
    volume, and two in-plan contracts the oracle re-verifies — entries
    never exceed nprobe x cap, and K^2 <= 4|V| (K ~ sqrt(|V|), the
    sub-linear routing law). Run it before trusting a corpus-scale
    extrapolation, not after."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scored0, cent, _ = routed_entry(emb)
    per_q = scored0.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    nv = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
    nc = cent.agg(F.count(F.lit(1)).cast("bigint").alias("n_centroids"))
    return (
        per_q.agg(F.max("n").cast("bigint").alias("entry_rows_max"))
        .crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_vectors",
            "n_centroids",
            "entry_rows_max",
            (F.col("entry_rows_max") <= F.lit(ROUTED_NPROBE * ROUTED_ENTRY_CAP))
            .alias("entry_bounded"),
            (F.col("n_centroids") * F.col("n_centroids")
             <= F.lit(4) * F.col("n_vectors")).alias("routing_sublinear"),
        )
    )


@register(
    "graph_beam_recall_report",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_graph_beam_ctes()},
    topk_ent AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
            FROM bv0)
        WHERE rank <= {TOP_K}),
    topk_bm AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
            FROM bv{BEAM_ROUNDS})
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('entries_only', 'topk_ent')}
    UNION ALL
    {_sql_tier_recall('graph_beam', 'topk_bm')}
    """,
)
def graph_beam_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the landmark set alone vs the full beam search
    against the exact baseline — the number that shows what walking the
    graph ADDS over just scoring the coarse landmarks (entries_only is
    beam search with rounds=0, so the gap is purely the walk's). The
    per-query beam contract makes this the cheapest serving tier to
    gauge: both rankings come from one visited-set lineage."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph = materialize(
        knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    )
    exact = _exact_topk(spark, sf_dir).select("query_id", "vec_id")
    ent, beam, _ = graph_beam_topk(emb, graph)
    return _tier_recall(exact, "entries_only", ent).unionByName(
        _tier_recall(exact, "graph_beam", beam)
    )


@register(
    "graph_beam_routed_recall_report",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_routed_entry_ctes()},
    {_sql_beam_round_ctes()},
    topk_ent AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
            FROM bv0)
        WHERE rank <= {TOP_K}),
    topk_bm AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
            FROM bv{BEAM_ROUNDS})
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('routed_entries_only', 'topk_ent')}
    UNION ALL
    {_sql_tier_recall('graph_beam_routed', 'topk_bm')}
    """,
)
def graph_beam_routed_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@{TOP_K} of the ROUTED serve path vs the exact baseline —
    graph_beam_recall_report for the production entry. The question this
    answers is the one the routing rewrite raised: scoring only
    ~sqrt(|V|) centroids and entering at {ROUTED_NPROBE} x
    {ROUTED_ENTRY_CAP} cell members instead of |V|/{IVF_CENT_MOD}
    landmarks is strictly LESS entry coverage — the walk must earn it
    back, and this gauge prices exactly that (routed_entries_only =
    rounds=0, so the gap between the rows is purely the walk's
    contribution under the cheaper entry). Ship the routed tier where
    its recall row matches the landmark report's; fall back to more
    nprobe/cap where it doesn't."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # same §2.6 overlap as similarity_graph_beam_routed
    graph, (scored0, _, _) = run_concurrently(
        lambda: materialize(
            knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
        ),
        lambda: routed_entry(emb),
    )
    exact = _exact_topk(spark, sf_dir).select("query_id", "vec_id")
    ent, beam, _ = graph_beam_topk_routed(emb, graph, scored0=scored0)
    return _tier_recall(exact, "routed_entries_only", ent).unionByName(
        _tier_recall(exact, "graph_beam_routed", beam)
    )


# --------------------------------------------------------------------------
# Persisted graph index: the k-NN graph as the ON-DISK serving artifact
# (the dedup-band-index / IVFADC-codes discipline applied to the NSW
# tier). The graph is expensive to build (buckets + sign shortlists +
# cosine ranking over the whole corpus) and cheap to serve from; a real
# deployment builds it once, stores it bucketed by src, and every query
# batch walks the STORED edges — no bucket derivation, no sign codes,
# no re-ranking ever reruns on the serve path.
GRAPH_INDEX_TABLE = "knn_graph_store"
GRAPH_INDEX_BUCKETS = 8


def graph_index_write(emb: DataFrame, name: str = GRAPH_INDEX_TABLE) -> None:
    """Build and persist the k-NN graph ``name``: the demo-geometry
    knn_graph edge table written as a src-bucketed, src-sorted parquet
    table. Bucketing by src co-locates each vertex's out-edges in one
    file split, so a frontier probe touches |frontier| bucket groups —
    at a production 1e9 x k edge table the serve-side read is the
    frontier's buckets, never the table."""
    spark = emb.sparkSession
    from mapreduce_spark.sources.fs import fs_delete, warehouse_uri

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a stale location with no catalog entry (crashed run, fresh
    # session over an old warehouse) must not block the rebuild
    fs_delete(spark, f"{warehouse_uri(spark)}/{name}")
    graph = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    (
        graph.write.mode("overwrite")
        .format("parquet")
        .bucketBy(GRAPH_INDEX_BUCKETS, "src")
        .sortBy("src")
        .saveAsTable(name)
    )


@register(
    "similarity_graph_beam_persisted",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_graph_beam_ctes()},
    scored AS (SELECT * FROM bv{BEAM_ROUNDS})
    {_SQL_RANK}
    """,
)
def similarity_graph_beam_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """similarity_graph_beam served FROM THE STORED GRAPH: build + write
    the src-bucketed edge table once (the offline job), then run the
    beam walk reading edges back from disk — row-for-row identical to
    the in-memory tier (pinned in tests/test_graph_beam.py), with the
    serve path's plan containing NO bucket/sign/cosine graph derivation
    (only the stored scan, the bounded broadcast frontier joins, and the
    candidate scoring pass). The lifecycle mirror of
    dedup_index_persisted / similarity_index_persisted for the fourth
    serving family."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph_index_write(emb)
    stored = spark.table(GRAPH_INDEX_TABLE)
    _, beam, _ = graph_beam_topk(emb, stored)
    return beam


def graph_index_write_routed(emb: DataFrame, name: str) -> None:
    """Build + persist the COMPLETE routed-serving graph index ``name``:
    the src-bucketed edge table (graph_index_write) plus the two routing
    artifacts the r10 probe bench caught being re-derived per probe —
    ``{name}_cent`` (~sqrt(|V|) centroid rows with embeddings + norms)
    and ``{name}_members`` (each cell's top-cap entry members). Both are
    K-and-cap-sized (broadcastable at any corpus size: ~32k rows at
    1e9 vectors), so they store as plain tables; the |V| x K
    nearest-centroid assignment is paid HERE, once, never at serve
    time."""
    graph_index_write(emb, name)
    routed_artifacts_write(emb, name)


def routed_artifacts_write(emb: DataFrame, name: str) -> None:
    """Persist ONLY the routing artifacts ``{name}_cent`` /
    ``{name}_members`` next to an edge table that already exists (or is
    written separately) — the piece of graph_index_write_routed a caller
    reuses when the beam graph itself is shared (tools/bench_probe.py
    prices the routing artifacts' build apart from the edge build this
    way)."""
    from mapreduce_spark.sources.fs import fs_delete, warehouse_uri

    spark = emb.sparkSession
    cent, members = routed_artifacts(emb)
    for suffix, df in (("cent", cent), ("members", members)):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        # a stale location with no catalog entry (dead session over an
        # old warehouse) must not block the rebuild — graph_index_write's
        # rule applied to the routing artifacts
        fs_delete(spark, f"{warehouse_uri(spark)}/{name}_{suffix}")
        df.write.mode("overwrite").saveAsTable(f"{name}_{suffix}")


@register(
    "similarity_graph_beam_routed_persisted",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_routed_entry_ctes()},
    {_sql_beam_round_ctes()},
    scored AS (SELECT * FROM bv{BEAM_ROUNDS})
    {_SQL_RANK}
    """,
)
def similarity_graph_beam_routed_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The routed graph tier served ENTIRELY from stored artifacts — the
    true production probe: edges, centroids, and entry members all read
    back from the index graph_index_write_routed persisted, so a probe
    pays K centroid cosines + nprobe x cap entry cosines + the bounded
    walk, and NO derivation of any kind (no bucket/sign/cosine graph
    build, no |V| x K assignment — the r10 probe bench measured the
    in-plan routed form re-deriving that assignment at 4x the landmark
    probe's latency, which this variant exists to eliminate;
    BENCH_PROBE_r10.json carries the split). Same oracle as
    similarity_graph_beam_routed: storage must be invisible in the
    rows."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph_index_write_routed(emb, "knn_graph_rt")
    scored0, _ = routed_entry_from(
        emb, spark.table("knn_graph_rt_cent"), spark.table("knn_graph_rt_members")
    )
    beam, _ = _beam_walk(
        emb, spark.table("knn_graph_rt"), scored0, BEAM_ROUNDS, BEAM_WIDTH, TOP_K
    )
    return beam




@register(
    "graph_degree_stats",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
            FROM graph_g GROUP BY src),
    recip AS (SELECT CAST(count(*) AS BIGINT) AS n_recip
              FROM graph_g a JOIN graph_g b
                ON b.src = a.dst AND b.dst = a.src)
    SELECT CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(sum(d) AS BIGINT) AS n_edges,
           CAST(min(d) AS BIGINT) AS min_deg,
           CAST(max(d) AS BIGINT) AS max_deg,
           round(CAST(sum(d) AS DOUBLE) / count(*), 6) AS avg_deg,
           round(CAST((SELECT n_recip FROM recip) AS DOUBLE) / sum(d), 6)
             AS reciprocity
    FROM deg
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph index's health card (vindex_cell_stats' sibling for the
    fourth serving family): vertex/edge counts, out-degree min/max/mean
    (sparse fringes mean unreachable corners), and RECIPROCITY — the
    share of edges whose reverse edge also exists. Reciprocity is the
    NSW navigability proxy: beam search travels src -> dst, so a vector
    that appears only as someone's dst with no out-edges back is a
    dead end, and a low-reciprocity graph loses recall in exactly the
    regions a degree histogram looks fine in. One groupBy + one
    self-equi-join on the k x |V| edge table — run it before shipping a
    billion-vector graph, not after."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    g = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K).select(
        "src", "dst"
    )
    deg = g.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = (
        g.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_recip"))
    )
    card = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        F.sum("d").cast("bigint").alias("n_edges"),
        F.min("d").cast("bigint").alias("min_deg"),
        F.max("d").cast("bigint").alias("max_deg"),
        F.round(F.sum("d").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_deg"
        ),
    )
    return card.crossJoin(F.broadcast(n_recip)).select(
        "n_vertices",
        "n_edges",
        "min_deg",
        "max_deg",
        "avg_deg",
        F.round(
            F.col("n_recip").cast("double") / F.col("n_edges"), 6
        ).alias("reciprocity"),
    )


# --------------------------------------------------------------------------
# Graph index APPEND (the NSW insert, bulk form): new vectors join the
# stored graph without rebuilding it. Forward edges rank each new
# vector's top-k BASE bucket-mates by exact cosine (the same candidate
# machinery as the build, restricted to batch sources, so cost past the
# bucketing pass tracks |batch|); every forward edge also appends its
# REVERSE edge, because beam search travels src -> dst and a vector
# with no in-path out-edges back to it is invisible to serving — the
# reverse edges are what make the batch DISCOVERABLE (graded below and
# pinned in tests/test_graph_beam.py). Existing edge files are never
# rewritten: both edge sets append new files into the bucketed layout.
GRAPH_APPEND_TABLE = "knn_graph_store_app"
APPEND_MOD = 20
APPEND_REM = 13
_APPEND_IS_BATCH = f"{{v}} % {APPEND_MOD} = {APPEND_REM}"
_APPEND_IS_BASE = f"{{v}} % {APPEND_MOD} <> {APPEND_REM}"


def graph_index_append(
    emb: DataFrame, name: str = GRAPH_APPEND_TABLE, k: int = KNN_GRAPH_K
) -> None:
    """Fold the APPEND_MOD/APPEND_REM batch of ``emb`` into the stored
    graph ``name`` (built over the base partition): forward top-k edges
    batch -> base plus their reverses, appended to the bucketed table.
    Candidates come from the capped query-pair enumeration with the
    batch predicate on the query side, so buckets without a batch
    member drop before any pair expands."""
    from mapreduce_spark.operators.pairing import bucketed_query_pairs

    buckets = lsh_buckets(emb, LSH_PLANES, LSH_TABLES)
    cand = bucketed_query_pairs(
        buckets,
        ["table_idx", "bucket"],
        "vec_id",
        lambda c: c % APPEND_MOD == F.lit(APPEND_REM),
    ).filter(F.col("vec_id") % APPEND_MOD != APPEND_REM).distinct()
    # No broadcast hint: append candidates scale as |batch| x bucket
    # occupancy x tables — NOT the beam law _score_pairs' hint is
    # reserved for — so AQE picks the join strategy from runtime stats
    # (ADVICE r9).
    scored = _score_pairs(emb, cand)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    fwd = (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias("src"),
            F.col("vec_id").alias("dst"),
            "cosine",
            "rank",
        )
    )
    # Reverse edges keep cosine (it is symmetric — the true pair value)
    # but carry rank = NULL: rank is a FORWARD-only contract (position in
    # src's own neighbor ordering), and reusing the forward rank here
    # would let one base vertex hold several rank-1 out-edges in the
    # stored table (ADVICE r9). Beam serving reads only (src, dst);
    # rank-reading consumers must filter rank IS NOT NULL on appended
    # graphs.
    rev = fwd.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        "cosine",
        F.lit(None).cast("bigint").alias("rank"),
    )
    (
        fwd.unionByName(rev)
        .write.mode("append")
        .format("parquet")
        .bucketBy(GRAPH_INDEX_BUCKETS, "src")
        .sortBy("src")
        .saveAsTable(name)
    )


_SQL_APPEND_GRAPH = f"""
    cand_app AS (
        SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
        FROM buckets a JOIN buckets b
          ON a.table_idx = b.table_idx AND a.bucket = b.bucket
        WHERE a.vec_id % {APPEND_MOD} = {APPEND_REM}
          AND b.vec_id % {APPEND_MOD} <> {APPEND_REM}),
    scored_app AS (
        SELECT c.src, c.dst,
               round({sql_cosine_pair('ea.embedding', 'eb.embedding')}, 6)
                 AS cosine
        FROM cand_app c
        JOIN embeddings ea ON ea.vec_id = c.src
        JOIN embeddings eb ON eb.vec_id = c.dst),
    fwd AS (
        SELECT src, dst, cosine, rank FROM (
            SELECT src, dst, cosine,
                   CAST(row_number() OVER (PARTITION BY src
                       ORDER BY cosine DESC, dst) AS BIGINT) AS rank
            FROM scored_app)
        WHERE rank <= {KNN_GRAPH_K}),
    graph_app AS MATERIALIZED (
        SELECT src, dst FROM graph_g
        UNION ALL SELECT src, dst FROM fwd
        UNION ALL SELECT dst AS src, src AS dst FROM fwd)"""


@register(
    "similarity_graph_beam_appended",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K, member_pred=_APPEND_IS_BASE)},
    {_SQL_APPEND_GRAPH},
    {_sql_graph_beam_ctes(graph="graph_app")},
    scored AS (SELECT * FROM bv{BEAM_ROUNDS})
    {_SQL_RANK}
    """,
)
def similarity_graph_beam_appended(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The graph index's INGEST op, graded end-to-end: build + store the
    graph over the base partition (vec_id % {APPEND_MOD} !=
    {APPEND_REM}), APPEND the held-out batch (forward top-{KNN_GRAPH_K}
    edges into the base + their reverses — the bulk NSW insert), then
    beam-serve the standard query set from the stored table alone. The
    appended vectors are reachable ONLY through append-written edges,
    so this grades discoverability, not just write mechanics; base edge
    files are never rewritten (append adds files to the bucketed
    layout). dedup_incremental / similarity_index_appended's mirror for
    the fourth serving family."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % APPEND_MOD != APPEND_REM)
    graph_index_write(base, GRAPH_APPEND_TABLE)
    graph_index_append(emb, GRAPH_APPEND_TABLE)
    stored = spark.table(GRAPH_APPEND_TABLE)
    _, beam, _ = graph_beam_topk(emb, stored)
    return beam


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011): the vector-compression tier
# of a production ANN stack (brute -> LSH -> IVF -> PQ).
PQ_SUBS = 8                    # sub-spaces of EMB_DIM / PQ_SUBS dims each
# Codebook seeds: every 10th vector (NOT the IVF 1-per-100 convention —
# a 5-entry-per-sub-space codebook measured recall ~0.05; 1-per-10 gives
# the 10x denser book that lifts ADC recall into usable territory, and
# pq_recall_report is the gauge that justifies the density).
PQ_SEED_MOD = 10
PQ_SEED_REM = 7
# Argmin tie-break packing: packed = d2 * PQ_PACK + seed_id. Headroom:
# per-sub d2 <= sub_dim * (2 * max|x| * 1e4)^2 — for |x| <= 3 that is
# 2.9e10, so d2 * 1e8 <= 2.9e18 < 2^63; seed ids must stay < PQ_PACK
# (enforced with a per-row raise_error in _pq_pairs — a larger id would
# silently corrupt BOTH the argmin order and the decoded code).
PQ_PACK = 100_000_000


# ONE definition of the PQ code/ADC derivation, shared by all three PQ
# oracles (the _CLUSTER_CTES discipline: a second copy would drift).
_SQL_PQ_CTES = f"""
    pq_ex AS (
        SELECT vec_id,
               (generate_subscripts(embedding, 1) - 1) // {EMB_DIM // PQ_SUBS}
                 AS sub_idx,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xq
        FROM embeddings),
    pq_seeds AS (SELECT vec_id AS seed_id, sub_idx, pos, xq FROM pq_ex
                 WHERE vec_id % {PQ_SEED_MOD} = {PQ_SEED_REM}),
    pq_pairs AS (
        SELECT e.vec_id, e.sub_idx, s.seed_id,
               CAST(sum((e.xq - s.xq) * (e.xq - s.xq)) AS BIGINT) AS d2
        FROM pq_ex e JOIN pq_seeds s
          ON s.sub_idx = e.sub_idx AND s.pos = e.pos
        GROUP BY e.vec_id, e.sub_idx, s.seed_id),
    pq_codes AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) % {PQ_PACK} AS code
        FROM pq_pairs GROUP BY vec_id, sub_idx),
    pq_qtab AS (SELECT vec_id AS query_id, sub_idx, seed_id, d2
                FROM pq_pairs WHERE vec_id < {N_QUERIES}),
    adc AS (
        SELECT q.query_id, c.vec_id,
               CAST(sum(q.d2) AS BIGINT) AS adc_d2
        FROM pq_codes c
        JOIN pq_qtab q ON q.sub_idx = c.sub_idx AND q.seed_id = c.code
        WHERE c.vec_id <> q.query_id
        GROUP BY q.query_id, c.vec_id)"""


def _pq_ex_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, sub_idx, pos, xq) over an ARBITRARY (vec_id, embedding)
    frame — the frame-level pq_ex builder the planted-corpus tests share
    with the registered queries."""
    sub_dim = EMB_DIM // PQ_SUBS
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
        .select(
            "vec_id",
            (F.col("pos") / sub_dim).cast("int").alias("sub_idx"),
            "pos",
            F.floor(F.col("x").cast("double") * 10_000).cast("bigint").alias(
                "xq"
            ),
        )
    )


def _pq_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, sub_idx, pos, xq) — every vector exploded to 1e4
    micro-unit components. The single Spark-side source every PQ
    operator builds on (the _SQL_PQ_CTES pq_ex mirror)."""
    return _pq_ex_frame(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )


# Unrolled 8-term integer sub-distance: small enough for whole-stage
# codegen, unlike the interpreted higher-order fold (measured 5-7x
# faster at sf0.1, identical sums — integer addition reassociates
# exactly). The 64-term float cosine CANNOT take this form: its unrolled
# method blows the JIT limit and float addition is order-sensitive.
_PQ_D2 = "cast(" + " + ".join(
    f"(element_at(xqa, {i}) - element_at(sqa, {i}))"
    f" * (element_at(xqa, {i}) - element_at(sqa, {i}))"
    for i in range(1, EMB_DIM // PQ_SUBS + 1)
) + " as bigint)"


def _pq_sub_arrays(ex: DataFrame) -> DataFrame:
    """(vec_id, sub_idx, xqa: array<bigint>) — each sub-vector assembled
    into one pos-ordered integer array. Distances then evaluate as one
    8-element fold per (vector, codebook-entry) ROW instead of 8 joined
    pos-rows feeding a 3.2M-group aggregation — measured 8.5x faster at
    sf0.1 with bit-identical d2 (integer sums are order-independent, so
    unlike the float cosine fold this reassociation is exact by
    construction)."""
    return ex.groupBy("vec_id", "sub_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "xq"))),
            lambda e: e["xq"],
        ).alias("xqa")
    )


def _pq_pairs_frame(ex: DataFrame) -> DataFrame:
    """_pq_pairs over a prebuilt (vec_id, sub_idx, pos, xq) frame."""
    xa = _pq_sub_arrays(ex)
    seeds = xa.filter(F.col("vec_id") % PQ_SEED_MOD == PQ_SEED_REM).select(
        F.when(F.col("vec_id") < PQ_PACK, F.col("vec_id"))
        .otherwise(
            F.raise_error(
                f"PQ seed id >= PQ_PACK ({PQ_PACK}): renumber the codebook"
            )
        )
        .alias("seed_id"),
        "sub_idx",
        F.col("xqa").alias("sqa"),
    )
    return xa.join(F.broadcast(seeds), "sub_idx").select(
        "vec_id", "sub_idx", "seed_id", F.expr(_PQ_D2).alias("d2")
    )


def _pq_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, sub_idx, seed_id, d2): exact sub-space L2^2 of every
    vector to every codebook entry — shared by codes, ADC, and the
    recall report so the stored codes and the lookup tables can never
    desynchronize. Guards the packed-argmin invariant: a seed id >=
    PQ_PACK would silently corrupt both the argmin order and the
    decoded code, so it raises instead."""
    return _pq_pairs_frame(_pq_quantized(spark, sf_dir))


def _pq_code_card(best: DataFrame) -> DataFrame:
    """(vec_id, pq_code, quant_mse) from a (vec_id, sub_idx, packed)
    argmin frame, with pq_code emitted as the '_'-joined code STRING
    rather than an array: the correctness driver canonicalizes results
    through pandas ``sort_values``, which raises ``unhashable type`` on
    array cells (CORRECTNESS_r07: embedding_pq_codes_opq ERR), so every
    graded output must be scalar. The encoding is bijective with the
    code vector — base-PQ_PACK digits joined in sub_idx order — and
    costs nothing at scale (string build is row-local JVM work)."""
    return best.groupBy("vec_id").agg(
        F.concat_ws(
            "_",
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_idx", "packed"))),
                lambda e: (e["packed"] % PQ_PACK).cast("string"),
            ),
        ).alias("pq_code"),
        F.round(
            F.sum(F.expr(f"packed div {PQ_PACK}")).cast("double")
            / (EMB_DIM * 100_000_000),
            6,
        ).alias("quant_mse"),
    )


# Oracle-side twin of _pq_code_card's tail: string_agg joins the codes in
# sub_idx order with the same '_' separator the Spark side uses.
def _sql_pq_code_tail(best_cte: str) -> str:
    return f"""
    SELECT vec_id,
           string_agg(CAST(packed % {PQ_PACK} AS VARCHAR),
                      '_' ORDER BY sub_idx) AS pq_code,
           round(CAST(sum(packed // {PQ_PACK}) AS DOUBLE)
                 / (CAST({EMB_DIM} AS BIGINT) * 100000000), 6) AS quant_mse
    FROM {best_cte} GROUP BY vec_id"""


@register(
    "embedding_pq_codes",
    oracle=f"""
    WITH {_SQL_PQ_CTES},
    best AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) AS packed
        FROM pq_pairs GROUP BY vec_id, sub_idx)
    {_sql_pq_code_tail('best')}
    """,
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (Jegou et al. 2011): each vector's
    {PQ_SUBS} sub-vectors are assigned to their nearest codebook entry
    (the IVF seed vectors' sub-vectors — the vec_id % {PQ_SEED_MOD} ==
    {PQ_SEED_REM} convention), yielding a {PQ_SUBS}-id code per vector
    plus its quantization MSE — the compressed representation a
    PQ-accelerated ANN index stores instead of raw floats (~32x smaller
    at one byte per sub-space in production).

    Exactness: components quantize to 1e4 micro-units (exact for
    float32); sub-space L2^2 distances are pure BIGINT sums; the argmin
    packs (d2, seed_id) into ONE integer so the min aggregate IS the
    tie-broken argmin — no float compare anywhere; the reported MSE is
    one identical double division.

    Scale shape: the codebook is |seeds| x {EMB_DIM} rows, BROADCAST;
    vectors explode to (vec, sub, pos) once, the distance aggregate and
    the packed argmin both combine map-side, and codes reassemble with
    one groupBy per vector — cost is |V| x |seeds| sub-distances, the
    PQ-training shape (at production scale the codebook is k-means-
    refined per sub-space, kmeans_refine's machinery)."""
    best = _pq_pairs(spark, sf_dir).groupBy("vec_id", "sub_idx").agg(
        F.min(F.col("d2") * PQ_PACK + F.col("seed_id")).alias("packed")
    )
    return _pq_code_card(best)


# ---------------------------------------------------------------------------
@register(
    "similarity_pq_adc",
    oracle=f"""
    WITH {_SQL_PQ_CTES}
    SELECT query_id, vec_id, adc_d2, rank FROM (
        SELECT query_id, vec_id, adc_d2,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_d2, vec_id) AS BIGINT)
                 AS rank
        FROM adc)
    WHERE rank <= {TOP_K}
    """,
)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (the ADC of Jegou et al. 2011):
    each query precomputes its exact sub-distance to EVERY codebook
    entry (a |Q| x {PQ_SUBS} x |seeds| lookup table), then every stored
    vector is scored by summing the table entries its {PQ_SUBS}-id code
    selects — the query never touches raw stored vectors, which is the
    entire point of PQ at scale (the index holds codes, ~32x smaller).
    Distances are exact micro-unit BIGINTs end-to-end, so ranking is
    integer-deterministic.

    Plan shape: the lookup table is tiny and BROADCAST; stored codes
    join it on (sub_idx, code) — a key equi-join, no raw-vector math per
    candidate — and the per-(query, vec) sum combines map-side; top-k
    per query is a window over each query's scored list. Cost per query
    tracks |V| code-lookups, not |V| x {EMB_DIM} float ops."""
    pairs = _pq_pairs(spark, sf_dir)
    codes = pairs.groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias(
            "code"
        )
    )
    qtab = pairs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "sub_idx",
        F.col("seed_id").alias("code"),
        "d2",
    )
    adc = (
        codes.join(F.broadcast(qtab), ["sub_idx", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


# ---------------------------------------------------------------------------
@register(
    "pq_recall_report",
    oracle=f"""
    WITH {_SQL_PQ_CTES},
    l2 AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(sum((q.xq - v.xq) * (q.xq - v.xq)) AS BIGINT) AS d2
        FROM pq_ex q JOIN pq_ex v
          ON v.sub_idx = q.sub_idx AND v.pos = q.pos
         AND v.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY 1, 2),
    topk_e AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d2, vec_id) AS rank
            FROM l2)
        WHERE rank <= {TOP_K}),
    topk_p AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, vec_id) AS rank
            FROM adc)
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('pq', 'topk_p')}
    """,
)
def pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of PQ asymmetric-distance search against the exact
    L2 baseline — the SAME metric ADC approximates, so the report
    measures pure quantization loss (a cosine baseline would conflate it
    with metric mismatch). The number that decides the PQ codebook's
    density/split before shipping the compressed index
    (ann_recall_report's sibling for the compression tier; PQ trades
    exactness for a ~32x smaller index, and THIS is the price tag).

    Plan shape: the exact side is one quantized-component equi-join
    against the {N_QUERIES}-row broadcast query set with a map-side
    integer sum; both ranked lists are |Q| x {TOP_K} rows, so the
    intersection semi-join and rollup are trivia on top of the plans
    being graded."""
    exq = _pq_quantized(spark, sf_dir).select("vec_id", "pos", "xq")
    qside = exq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xq").alias("qq")
    )
    l2 = (
        exq.join(F.broadcast(qside), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum((F.col("qq") - F.col("xq")) * (F.col("qq") - F.col("xq")))
            .cast("bigint")
            .alias("d2")
        )
    )
    we = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        l2.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    adc = similarity_pq_adc(spark, sf_dir).select("query_id", "vec_id")
    hits = (
        exact.join(adc, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return base.join(hits, "query_id", "left").select(
        F.lit("pq").alias("tier"),
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
            / F.col("n_exact"),
            6,
        ).alias("recall"),
    )


# ===========================================================================
# PRODUCTION ANN profile registrations (VERDICT r4 #1/#6/#7): the scaled
# geometry for the LSH and IVF tiers + their recall gauges, mirroring the
# dedup_minhash_lsh_scaled playbook. tests/test_ann_scaled.py asserts
# empirical recall >= 0.9 on a planted-neighbor corpus for both tiers.

_SQL_SCALED_BUCKETS_CTE = _sql_buckets_cte(
    SCALED_LSH_PLANES, SCALED_LSH_TABLES, "s"
)
# The graph-build tier's geometry: DYNAMIC planes (lsh_planes_for's
# integer law) at the scaled table count, same terminal name `sbuckets`
# so _sql_knn_graph('s', ...) and every downstream graph CTE are
# untouched by the swap. Serving-tier oracles keep the static CTE above.
_SQL_SDYN_BUCKETS_CTE = _sql_dyn_buckets_cte(SCALED_LSH_TABLES, "s")


def _sql_lsh_topk_ctes(bprefix: str, suffix: str, k: int = TOP_K) -> str:
    """CTE chain cand_{suffix} -> scored_{suffix} -> topk_{suffix} over a
    {bprefix}buckets CTE — the LSH candidate/score/rank pipeline for an
    arbitrary geometry's bucket table."""
    return f"""
    cand_{suffix} AS (
        SELECT DISTINCT qb.vec_id AS query_id, vb.vec_id
        FROM {bprefix}buckets qb JOIN {bprefix}buckets vb
          ON qb.table_idx = vb.table_idx AND qb.bucket = vb.bucket
         AND vb.vec_id <> qb.vec_id
        WHERE qb.vec_id < {N_QUERIES}),
    scored_{suffix} AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand_{suffix} c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    topk_{suffix} AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_{suffix})
        WHERE rank <= {k})"""


def _sql_refined_cent_body(seed_sql: str, assign_extra: str = "") -> str:
    """The Lloyd-iteration CTE chain ending in rcent(cid, ce), over an
    arbitrary seed CTE body — shared by the fixed-modulus and sqrt-law
    seeders so the refinement SQL exists exactly once. ``assign_extra``
    appends FROM/WHERE text to the assignment stage (the sampled trainer
    restricts it to the vec_id % sm == 0 sample)."""
    return f"""
    rc_cent AS ({seed_sql}),
    rc_assign AS (
        SELECT vec_id, cid, embedding FROM (
            SELECT v.vec_id, c.cid, v.embedding,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings v, rc_cent c{assign_extra})
        WHERE rn = 1),
    rc_ex AS (
        SELECT cid, i AS pos, embedding[i + 1] AS x
        FROM rc_assign, UNNEST(range(len(embedding))) AS t(i)),
    rc_q AS (
        SELECT cid, pos,
               SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
               count(*) AS n
        FROM rc_ex GROUP BY cid, pos),
    rcent AS (SELECT cid, list(s / n / 1000000.0 ORDER BY pos) AS ce
              FROM rc_q GROUP BY cid)"""


def _sql_refined_cent_cte(cent_mod: int, rem: int) -> str:
    """CTE chain ending in rcent(cid, ce): one Lloyd iteration from the
    vec_id % cent_mod == rem seeds — the SQL twin of refined_centroids
    (kmeans_refine's oracle at an arbitrary modulus, reassembled to
    centroid arrays). Components are exact integer ratios s/n/1e6, so
    rcent.ce is bit-identical to the Spark-side ce."""
    return _sql_refined_cent_body(
        f"""SELECT vec_id AS cid, embedding AS ce FROM embeddings
                WHERE vec_id % {cent_mod} = {rem}"""
    )


def _sql_refined_cent_cte_sqrt() -> str:
    """DuckDB twin of ivf_centroids_sqrt: the sqrt-law seed modulus
    computed in-query (GREATEST({IVF_CENT_REM}+1, ceil(sqrt(count(*))))
    — bit-identical to Python's math.ceil(math.sqrt(n)) for n < 2^52),
    then the shared Lloyd refinement chain ending in rcent(cid, ce)."""
    return (
        f"""rc_cm AS (SELECT GREATEST({IVF_CENT_REM + 1},
                     CAST(ceil(sqrt(count(*))) AS BIGINT)) AS cm
              FROM embeddings),"""
        + _sql_refined_cent_body(
            f"""SELECT vec_id AS cid, embedding AS ce FROM embeddings, rc_cm
                WHERE vec_id % cm = {IVF_CENT_REM}"""
        )
    )


def _sql_refined_cent_cte_sqrt_sampled() -> str:
    """DuckDB twin of ivf_trained_hier's quantizer: sqrt-law seeds from
    the full corpus, Lloyd assignment/update restricted to the
    vec_id % ts == 0 SAMPLE (ts = max(1, cm // {IVF_TRAIN_PER_CENT}), so
    |S| ~ {IVF_TRAIN_PER_CENT} K and training costs ~{IVF_TRAIN_PER_CENT}
    n — linear; ts = 1 at the test corpora, i.e. full-corpus training).
    Emits rc_cm AND rc_sm (consumed by the two-level assign/probe CTEs),
    ending in rcent(cid, ce)."""
    return (
        f"""rc_cm AS (SELECT GREATEST({IVF_CENT_REM + 1},
                     CAST(ceil(sqrt(count(*))) AS BIGINT)) AS cm
              FROM embeddings),
    rc_sm AS (SELECT cm, GREATEST(2, CAST(ceil(sqrt(cm)) AS BIGINT)) AS sm
              FROM rc_cm),
    rc_ts AS (SELECT GREATEST(1, cm // {IVF_TRAIN_PER_CENT}) AS ts
              FROM rc_cm),"""
        + _sql_refined_cent_body(
            f"""SELECT vec_id AS cid, embedding AS ce FROM embeddings, rc_cm
                WHERE vec_id % cm = {IVF_CENT_REM}""",
            assign_extra=", rc_ts WHERE v.vec_id % ts = 0",
        )
    )


def _sql_hier_topk_ctes(
    nprobe: int, suffix: str, k: int = TOP_K, n_queries: int = N_QUERIES
) -> str:
    """Two-level (hierarchical) assign/probe/score over the rcent
    trained quantizer — the drop-in successor of
    _sql_ivf_refined_topk_ctes: internal stages are ht{suffix}_*, the
    terminal CTEs keep the flat builder's names (assign_{suffix},
    probe_{suffix}, cand_{suffix}, scored_{suffix}, topk_{suffix}) so
    every downstream consumer (the ADC chain, the recall reports, the
    cell-stats gauge) reads identically. Supers = every sm-th surviving
    centroid; vectors and queries route super-first, so no stage
    multiplies |V| by K."""
    return f"""
    ht{suffix}_super AS (
        SELECT cid AS sid, ce AS se FROM rcent, rc_sm
        WHERE cid % (cm * sm) = {IVF_CENT_REM}),
    ht{suffix}_c2s AS (
        SELECT cid, ce, sid FROM (
            SELECT c.cid, c.ce, s.sid,
                   row_number() OVER (PARTITION BY c.cid
                       ORDER BY round({sql_cosine_pair('c.ce', 's.se')}, 6)
                                    DESC, (c.cid <> s.sid), s.sid) AS rn
            FROM rcent c, ht{suffix}_super s)
        WHERE rn = 1),
    ht{suffix}_vsup AS (
        SELECT vec_id, sid FROM (
            SELECT v.vec_id, s.sid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 's.se')}, 6)
                                    DESC, s.sid) AS rn
            FROM embeddings v, ht{suffix}_super s)
        WHERE rn = 1),
    assign_{suffix} AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6)
                                    DESC, c.cid) AS rn
            FROM embeddings v
            JOIN ht{suffix}_vsup u ON u.vec_id = v.vec_id
            JOIN ht{suffix}_c2s c ON c.sid = u.sid)
        WHERE rn = 1),
    ht{suffix}_qsup AS (
        SELECT query_id, sid FROM (
            SELECT q.vec_id AS query_id, s.sid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 's.se')}, 6)
                                    DESC, s.sid) AS rn
            FROM embeddings q, ht{suffix}_super s
            WHERE q.vec_id < {n_queries})
        WHERE rn <= {IVF_HIER_SUPER_PROBE}),
    probe_{suffix} AS (
        SELECT query_id, cid FROM (
            SELECT u.query_id, c.cid,
                   row_number() OVER (PARTITION BY u.query_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 'c.ce')}, 6)
                                    DESC, c.cid) AS rn
            FROM ht{suffix}_qsup u
            JOIN embeddings q ON q.vec_id = u.query_id
            JOIN ht{suffix}_c2s c ON c.sid = u.sid)
        WHERE rn <= {nprobe}),
    cand_{suffix} AS (
        SELECT DISTINCT p.query_id, a.vec_id
        FROM probe_{suffix} p JOIN assign_{suffix} a ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id),
    scored_{suffix} AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand_{suffix} c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    topk_{suffix} AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_{suffix})
        WHERE rank <= {k})"""


def _sql_ivf_refined_topk_ctes(nprobe: int, suffix: str, k: int = TOP_K) -> str:
    """CTE chain assign_{suffix} .. topk_{suffix}: the IVF probe/score
    pipeline against the rcent trained-quantizer CTE."""
    return f"""
    assign_{suffix} AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings v, rcent c)
        WHERE rn = 1),
    probe_{suffix} AS (
        SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings q, rcent c WHERE q.vec_id < {N_QUERIES})
        WHERE rn <= {nprobe}),
    cand_{suffix} AS (
        SELECT DISTINCT p.query_id, a.vec_id
        FROM probe_{suffix} p JOIN assign_{suffix} a ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id),
    scored_{suffix} AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand_{suffix} c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    topk_{suffix} AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_{suffix})
        WHERE rank <= {k})"""


@register(
    "similarity_ann_lsh_scaled",
    oracle=f"""
    WITH {_SQL_SCALED_BUCKETS_CTE},
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, vb.vec_id
        FROM sbuckets qb JOIN sbuckets vb
          ON qb.table_idx = vb.table_idx AND qb.bucket = vb.bucket
         AND vb.vec_id <> qb.vec_id
        WHERE qb.vec_id < {N_QUERIES}),
    scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM cand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    {_SQL_RANK}
    """,
)
def similarity_ann_lsh_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity_ann_lsh under the PRODUCTION geometry: {SCALED_LSH_PLANES}
    planes (bucket-size control — 2^{SCALED_LSH_PLANES} buckets/table keeps
    expected occupancy at |V|/256; at 1e9 vectors the same rule raises
    planes to ~27, leaving the equi-join plan untouched) x
    {SCALED_LSH_TABLES} tables (recall driver — a cosine-0.7 neighbor
    collides somewhere with p = 0.961, >= 0.9 for every cosine >= 0.7
    neighborhood). Same plan as the demo registration — only the profile
    constants differ; tests/test_ann_scaled.py asserts empirical recall
    >= 0.9 on a planted-neighbor corpus and that the demo geometry
    misses measurably on the same data. Buckets come from the
    Arrow-matmul derivation (bit-identical; the JVM explosion was this
    query's dominant stage at the 256-weight production geometry)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ann_lsh_topk(
        emb, SCALED_LSH_PLANES, SCALED_LSH_TABLES, bucket_fn=lsh_buckets_np
    )


@register(
    "similarity_ann_ivf_scaled",
    oracle=f"""
    WITH {_sql_refined_cent_cte_sqrt_sampled()},
    {_sql_hier_topk_ctes(SCALED_IVF_NPROBE, 'si')}
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS BIGINT)
                 AS rank
        FROM scored_si)
    WHERE rank <= {TOP_K}
    """,
)
def similarity_ann_ivf_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity_ann_ivf under the PRODUCTION recipe: a sqrt-law coarse
    quantizer (K = ivf_cent_mod(|V|) ~ sqrt(|V|) lists, VERDICT r10 #2)
    TRAINED on the vec_id % sm == 0 sample (one Lloyd iteration, |S| x K
    ~ n^1.25) and consumed through TWO-LEVEL routing (ivf_trained_hier,
    BENCH_SCALE r11's build-cost fix rolled family-wide): vectors and
    queries score K2 ~ n^0.25 supers first, then only the probed supers'
    member centroids, so per-query routing AND the whole one-shot build
    stay sub-linear-per-row — no stage touches |V| x K rows (the flat
    sqrt tier's n^1.5 term, measured at ratio 1.83 in the two-point
    bench). nprobe={SCALED_IVF_NPROBE} cells probed as before.
    tests/test_ivf_sqrt.py pins the sqrt-law seed geometry;
    tests/test_ivf_hier.py pins the two-level routing law;
    tests/test_ann_scaled.py asserts recall >= 0.9 on a planted
    clustered corpus and that training strictly improves the spherical
    quantization objective."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_a, sup = ivf_trained_hier(emb)
    cand, _, _ = ivf_candidates_hier(emb, cent_a, sup, SCALED_IVF_NPROBE)
    return _rank_topk(_score_pairs(emb, cand.select("query_id", "vec_id")))


@register(
    "ann_recall_report_scaled",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_SQL_SCALED_BUCKETS_CTE},
    {_sql_lsh_topk_ctes('s', 'sa')},
    {_sql_refined_cent_cte_sqrt_sampled()},
    {_sql_hier_topk_ctes(SCALED_IVF_NPROBE, 'si')},
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('lsh', 'topk_sa')}
    UNION ALL
    {_sql_tier_recall('ivf', 'topk_si')}
    """,
)
def ann_recall_report_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_recall_report for the PRODUCTION profile: recall@{TOP_K} of
    the scaled LSH tier ({SCALED_LSH_PLANES} planes x {SCALED_LSH_TABLES}
    tables) and the trained-quantizer IVF tier (Lloyd-refined
    ~sqrt(|V|) lists via ivf_cent_mod, nprobe={SCALED_IVF_NPROBE}) against
    the exact cosine baseline — the gauge the production profile's
    credibility rests on (dedup_recall_report_scaled's sibling for the
    vector tiers). Same trivia-on-top-of-the-graded-plans shape as the
    demo report. NOTE: the driver testdata's vectors are near-random
    (10th-neighbor cosines ~0.21-0.32, far below the cosine-0.7 band the
    profile contracts for), so THIS table reports the profile's floor on
    unstructured data; the >= 0.9 contract is asserted on the planted
    corpus in tests/test_ann_scaled.py, where neighbor geometry matches
    a real embedding corpus."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    exact = similarity_topk(spark, sf_dir).select("query_id", "vec_id")
    lsh = ann_lsh_topk(
        emb, SCALED_LSH_PLANES, SCALED_LSH_TABLES, bucket_fn=lsh_buckets_np
    )
    cent_a, sup = ivf_trained_hier(emb)
    cand, _, _ = ivf_candidates_hier(emb, cent_a, sup, SCALED_IVF_NPROBE)
    ivf = _rank_topk(_score_pairs(emb, cand.select("query_id", "vec_id")))
    return _tier_recall(exact, "lsh", lsh).unionByName(
        _tier_recall(exact, "ivf", ivf)
    )


# ---------------------------------------------------------------------------
# HIERARCHICAL (two-level) IVF — the n^1.5 BUILD-cost fix (BENCH_SCALE
# r11). The sqrt-law quantizer made per-QUERY routing ~sqrt(|V|), but a
# one-shot build still assigns EVERY vector by scoring all K ~ sqrt(|V|)
# centroids: |V| x K = n^1.5 total work, and the two fused build+serve
# IVF queries grew at 1.55-1.65x row growth in the two-point scale bench.
# The fix is FAISS's IMI idea collapsed to one extra level: seed
# K2 ~ n^0.25 SUPER-centroids (every sm-th centroid seed, sm =
# ceil(sqrt(cm))), assign each centroid to its nearest super offline
# (K x K2 = n^0.75, trivia), and route every vector through supers
# first — K2 cosines to pick a super, then only that super's ~K/K2 =
# n^0.25 member centroids. Per-vector assignment cost drops from K to
# K2 + K/K2 ~ 2 n^0.25; total build n^1.25. Queries probe
# IVF_HIER_SUPER_PROBE supers (recall lever) then nprobe cells as
# usual. Centroids are the RAW sqrt-law seeds (no Lloyd pass — Lloyd
# itself is an |V| x K stage, the thing being removed);
# ivf_hier_recall_report prices the approximation against both the
# exact baseline and the flat Lloyd-trained tier.
# (IVF_HIER_SUPER_PROBE lives in the profile-constants block up top —
# the trained-hier SQL builders reference it before this block.)


def ivf_hier_sm(cm: int) -> int:
    """Super-stride sm = ceil(sqrt(cm)) floored at 2, so the super-seed
    modulus cm * sm keeps K2 = |{vec_id % (cm*sm) == IVF_CENT_REM}| ~
    n^0.25. Exact for cm < 2^52, matching DuckDB's ceil(sqrt(cm))."""
    return max(2, math.ceil(math.sqrt(cm)))


def _hier_frames(
    emb: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(embn, centroids, supers): the raw-seed two-level quantizer. The
    one emb.count() is the build-time sizing scalar (the
    ivf_centroids_sqrt convention)."""
    n = emb.count()
    cm = ivf_cent_mod(n)
    sm = ivf_hier_sm(cm)
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    cent = embn.filter(F.col("vec_id") % cm == IVF_CENT_REM).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    sup = embn.filter(F.col("vec_id") % (cm * sm) == IVF_CENT_REM).select(
        F.col("vec_id").alias("sid"),
        F.col("embedding").alias("se"),
        F.col("nrm").alias("sn"),
    )
    return embn, cent, sup


def _hier_cent_assigned(cent: DataFrame, sup: DataFrame) -> DataFrame:
    """(cid, ce, cn, sid): each centroid assigned offline to its nearest
    super-centroid (rounded cosine, ties to SELF-assignment first, then
    lower sid) — K x K2 work, broadcast-sized output. The self-first
    tie-break makes cid == sid an INVARIANT for every super (its cosine
    with itself is exactly 1.0, so no near-parallel sibling super can
    steal it at round(cos, 6) = 1.0), which in turn guarantees (a)
    _sup_from_cent_a recovers exactly the supers the build wrote and
    (b) every super's member cell is non-empty, so _hier_assign's inner
    join on sid never drops a vector."""
    scored = cent.crossJoin(F.broadcast(sup)).select(
        "cid",
        "ce",
        "cn",
        "sid",
        F.round(
            cosine_n(F.col("ce"), F.col("se"), F.col("cn"), F.col("sn")), 6
        ).alias("_c"),
    )
    w = Window.partitionBy("cid").orderBy(
        F.col("_c").desc(), F.col("cid") != F.col("sid"), F.col("sid")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cid", "ce", "cn", "sid")
    )


def _hier_assign(embn: DataFrame, cent_a: DataFrame, sup: DataFrame) -> DataFrame:
    """(vec_id, cid): every vector assigned through the super level —
    argmax-AGGREGATE over the broadcast supers (map-side partial, only
    |V| rows shuffle), then a broadcast HASH equi-join on sid brings in
    only the assigned super's ~n^0.25 member centroids for the final
    argmax. No stage anywhere touches |V| x K rows. The sid join is
    INNER, which is lossless because _hier_cent_assigned's self-first
    tie-break guarantees every super is its own member (cid == sid row
    present), so no super's member cell is empty and every vector
    survives assignment; the DuckDB oracles inner-join identically."""
    s1 = embn.crossJoin(F.broadcast(sup)).select(
        "vec_id",
        "embedding",
        "nrm",
        F.struct(
            F.round(
                cosine_n(F.col("embedding"), F.col("se"), F.col("nrm"), F.col("sn")),
                6,
            ).alias("score"),
            (-F.col("sid")).alias("negsid"),
        ).alias("sc"),
    )
    vsup = s1.groupBy("vec_id").agg(
        (-F.max("sc")["negsid"]).alias("sid"),
        F.first("embedding").alias("embedding"),
        F.first("nrm").alias("nrm"),
    )
    s2 = vsup.join(F.broadcast(cent_a), "sid").select(
        "vec_id",
        F.struct(
            F.round(
                cosine_n(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")),
                6,
            ).alias("score"),
            (-F.col("cid")).alias("negcid"),
        ).alias("sc"),
    )
    return s2.groupBy("vec_id").agg((-F.max("sc")["negcid"]).alias("cid"))


def _hier_query_probe(
    embn: DataFrame,
    cent_a: DataFrame,
    sup: DataFrame,
    w_super: int = IVF_HIER_SUPER_PROBE,
    nprobe: int = SCALED_IVF_NPROBE,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """(query_id, cid): each query routed to its nprobe nearest cells
    AMONG the centroids of its w_super nearest super-cells — K2 + w x
    n^0.25 cosines per query."""
    q = embn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding", "nrm"
    )
    qs = q.crossJoin(F.broadcast(sup)).select(
        "query_id",
        "embedding",
        "nrm",
        "sid",
        F.round(
            cosine_n(F.col("embedding"), F.col("se"), F.col("nrm"), F.col("sn")), 6
        ).alias("_cs"),
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("_cs").desc(), F.col("sid"))
    qsup = (
        qs.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= w_super)
        .select("query_id", "embedding", "nrm", "sid")
    )
    qc = qsup.join(F.broadcast(cent_a), "sid").select(
        "query_id",
        "cid",
        F.round(
            cosine_n(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")), 6
        ).alias("_cc"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("_cc").desc(), F.col("cid"))
    return (
        qc.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cid")
    )


def ann_ivf_hier_topk(
    emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Hierarchical IVF top-k: two-level routing for assignment AND
    query probe, then the usual cid equi-join -> exact cosine -> rank."""
    embn, cent, sup = _hier_frames(emb)
    cent_a = _hier_cent_assigned(cent, sup)
    assign = _hier_assign(embn, cent_a, sup)
    probe = _hier_query_probe(embn, cent_a, sup, n_queries=n_queries)
    cand = (
        F.broadcast(probe)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = _score_pairs(emb, cand)
    return _rank_topk(scored, k)


def ivf_trained_hier(
    emb: DataFrame, eager: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(cent_a, sup): the PRODUCTION two-level quantizer — sqrt-law
    seeds Lloyd-trained on the vec_id % ts == 0 SAMPLE (ts = max(1,
    cm // {IVF_TRAIN_PER_CENT}): ~{IVF_TRAIN_PER_CENT} points per
    centroid, |S| x K ~ {IVF_TRAIN_PER_CENT} n — LINEAR training;
    _lloyd_c2's stride path), supers = every sm-th surviving
    centroid, each centroid assigned offline to its nearest super
    (cid, ce, cn, sid). Every production IVF/IVFADC consumer and the
    persisted vector index build through this, so the whole family
    shares one n^1.25 build geometry (BENCH_SCALE r11's fix rolled
    family-wide). The one emb.count() is the build-time sizing scalar.

    DEFAULT is lazy (r12 optimization round, measured both ways): an
    unconditional eager materialization was tried and reverted — the
    flat consumers' few quantizer references execute concurrently on
    idle cores, so the monolithic plan's wall-clock tracks its critical
    path and the barrier jobs regressed them up to 1.8x at sf0.1
    (OPTIMIZATION_r12.md). ``eager=True`` materializes the trained
    table once (operators/artifacts.py) and recovers the super frame
    from it (exact by the cid == sid self-assignment invariant) — the
    residual-ADC path opts in, where the quantizer subtree is
    referenced ~5x per plan and the cut measured 0.55x."""
    n = emb.count()
    cm = ivf_cent_mod(n)
    sm = ivf_hier_sm(cm)
    ts = max(1, cm // IVF_TRAIN_PER_CENT)
    cent = refined_centroids(
        emb, cm, IVF_CENT_REM, stride=ts if ts > 1 else None
    )
    sup = cent.filter(F.col("cid") % (cm * sm) == IVF_CENT_REM).select(
        F.col("cid").alias("sid"),
        F.col("ce").alias("se"),
        F.col("cn").alias("sn"),
    )
    if eager and not os.environ.get("SPARK_GRAFT_NO_MATERIALIZE"):
        cent_a = materialize(_hier_cent_assigned(cent, sup))
        return cent_a, _sup_from_cent_a(cent_a)
    return _hier_cent_assigned(cent, sup), sup


def _sup_from_cent_a(cent_a: DataFrame) -> DataFrame:
    """Recover the super frame from a STORED (cid, ce, cn, sid) centroid
    table: supers are centroids that are their own super (the re-attach
    path — an index reader never re-derives moduli from corpus counts
    it no longer has). Exact recovery relies on _hier_cent_assigned's
    self-first tie-break invariant (every super has its cid == sid
    row even when a near-parallel sibling super ties at
    round(cosine, 6) = 1.0), mirrored by the (c.cid <> s.sid) sort key
    in the hs_c2s/ht_c2s/rsd_c2s oracle CTEs."""
    return cent_a.filter(F.col("cid") == F.col("sid")).select(
        F.col("cid").alias("sid"),
        F.col("ce").alias("se"),
        F.col("cn").alias("sn"),
    )


def _stored_cent_assign(embn: DataFrame, stored_cent: DataFrame) -> DataFrame:
    """(vec_id, cid) against a STORED centroid table, routing two-level
    when the table carries the super layer (a sid column — the
    production write path) and flat otherwise (explicit-modulus test
    indexes)."""
    if "sid" in stored_cent.columns:
        return _hier_assign(embn, stored_cent, _sup_from_cent_a(stored_cent))
    return _nearest_cells(embn, stored_cent, "vec_id", 1)


def _stored_cent_route(qn: DataFrame, stored_cent: DataFrame, nprobe: int) -> DataFrame:
    """(query_id, cid) x nprobe against a STORED centroid table — the
    query-side twin of _stored_cent_assign."""
    if "sid" in stored_cent.columns:
        return _hier_route_frame(
            qn,
            "query_id",
            stored_cent,
            _sup_from_cent_a(stored_cent),
            IVF_HIER_SUPER_PROBE,
            nprobe,
        )
    return _nearest_cells(qn, stored_cent, "query_id", nprobe)


def _hier_route_frame(
    df: DataFrame,
    id_col: str,
    cent_a: DataFrame,
    sup: DataFrame,
    w_super: int = IVF_HIER_SUPER_PROBE,
    keep: int = 1,
) -> DataFrame:
    """(id_col, cid): two-level routing for an arbitrary (id, embedding,
    nrm) frame — w_super nearest supers, then the keep nearest cells
    among those supers' member centroids (broadcast hash equi-join on
    sid, never an |rows| x K stage). The window form; the corpus-sized
    keep=1 assignment path uses _hier_assign's argmax aggregates."""
    s1 = df.crossJoin(F.broadcast(sup)).select(
        F.col(id_col),
        "embedding",
        "nrm",
        "sid",
        F.round(
            cosine_n(F.col("embedding"), F.col("se"), F.col("nrm"), F.col("sn")), 6
        ).alias("_cs"),
    )
    w1 = Window.partitionBy(id_col).orderBy(F.col("_cs").desc(), F.col("sid"))
    top_sup = (
        s1.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= w_super)
        .select(id_col, "embedding", "nrm", "sid")
    )
    qc = top_sup.join(F.broadcast(cent_a), "sid").select(
        F.col(id_col),
        "cid",
        F.round(
            cosine_n(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")), 6
        ).alias("_cc"),
    )
    w2 = Window.partitionBy(id_col).orderBy(F.col("_cc").desc(), F.col("cid"))
    return (
        qc.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= keep)
        .select(id_col, "cid")
    )


def ivf_candidates_hier(
    emb: DataFrame,
    cent_a: DataFrame,
    sup: DataFrame,
    nprobe: int,
    n_queries: int = N_QUERIES,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(cand, assign, probe) under two-level routing: corpus assignment
    via the argmax-aggregate path, query probes via the window path,
    candidates from the cid equi-join — ivf_candidates' drop-in for the
    production tiers (cand carries query_id, vec_id, cid so the
    residual ADC path can key its per-cell lookup tables)."""
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    assign = _hier_assign(embn, cent_a, sup)
    probe = _hier_query_probe(
        embn, cent_a, sup, IVF_HIER_SUPER_PROBE, nprobe, n_queries
    )
    cand = (
        F.broadcast(probe)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cid")
        .distinct()
    )
    return cand, assign, probe


def _sql_hier_ctes(
    w_super: int = IVF_HIER_SUPER_PROBE,
    nprobe: int = SCALED_IVF_NPROBE,
    n_queries: int = N_QUERIES,
) -> str:
    """DuckDB twin of the hierarchical IVF pipeline, ending in
    hs_assign / hs_qprobe / hs_cand (row_number rn=1 == the Spark
    argmax-aggregate with ties to the lower id)."""
    return f"""
    hs_cm AS (SELECT GREATEST({IVF_CENT_REM + 1},
                     CAST(ceil(sqrt(count(*))) AS BIGINT)) AS cm
              FROM embeddings),
    hs_m AS (SELECT cm,
                    GREATEST(2, CAST(ceil(sqrt(cm)) AS BIGINT)) AS sm
             FROM hs_cm),
    hs_cent AS (SELECT vec_id AS cid, embedding AS ce
                FROM embeddings, hs_m WHERE vec_id % cm = {IVF_CENT_REM}),
    hs_super AS (SELECT vec_id AS sid, embedding AS se
                 FROM embeddings, hs_m
                 WHERE vec_id % (cm * sm) = {IVF_CENT_REM}),
    hs_c2s AS (
        SELECT cid, ce, sid FROM (
            SELECT c.cid, c.ce, s.sid,
                   row_number() OVER (PARTITION BY c.cid
                       ORDER BY round({sql_cosine_pair('c.ce', 's.se')}, 6)
                                    DESC, (c.cid <> s.sid), s.sid) AS rn
            FROM hs_cent c, hs_super s)
        WHERE rn = 1),
    hs_vsup AS (
        SELECT vec_id, sid FROM (
            SELECT v.vec_id, s.sid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 's.se')}, 6)
                                    DESC, s.sid) AS rn
            FROM embeddings v, hs_super s)
        WHERE rn = 1),
    hs_assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6)
                                    DESC, c.cid) AS rn
            FROM embeddings v
            JOIN hs_vsup u ON u.vec_id = v.vec_id
            JOIN hs_c2s c ON c.sid = u.sid)
        WHERE rn = 1),
    hs_qsup AS (
        SELECT query_id, sid FROM (
            SELECT q.vec_id AS query_id, s.sid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 's.se')}, 6)
                                    DESC, s.sid) AS rn
            FROM embeddings q, hs_super s WHERE q.vec_id < {n_queries})
        WHERE rn <= {w_super}),
    hs_qprobe AS (
        SELECT query_id, cid FROM (
            SELECT u.query_id, c.cid,
                   row_number() OVER (PARTITION BY u.query_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 'c.ce')}, 6)
                                    DESC, c.cid) AS rn
            FROM hs_qsup u
            JOIN embeddings q ON q.vec_id = u.query_id
            JOIN hs_c2s c ON c.sid = u.sid)
        WHERE rn <= {nprobe}),
    hs_cand AS (
        SELECT DISTINCT p.query_id, a.vec_id
        FROM hs_qprobe p JOIN hs_assign a ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id)"""


@register(
    "similarity_ann_ivf_hier",
    oracle=f"""
    WITH {_sql_hier_ctes()},
    scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6)
                 AS cosine
        FROM hs_cand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    {_SQL_RANK}
    """,
)
def similarity_ann_ivf_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with HIERARCHICAL routing (the BENCH_SCALE r11 fix):
    assignment and query routing both pass through K2 ~ n^0.25
    super-centroids, so the one-shot build's total work is n^1.25 —
    down from the flat sqrt-law tier's n^1.5 (which the two-point scale
    bench measured at 1.55x row growth) — and nothing in the plan
    touches |V| x K rows: the only crossJoins have the K2-row super
    table on the build side, the vector->centroid stage is a broadcast
    HASH equi-join on sid, and both argmaxes partial-aggregate map-side.
    ivf_hier_cost_stats pins the routing-work law;
    ivf_hier_recall_report prices the raw-seed/approximate-assignment
    recall give-up against the flat Lloyd-trained tier."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ann_ivf_hier_topk(emb)


@register(
    "ivf_hier_recall_report",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_sql_hier_ctes()},
    scored_hh AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6)
                 AS cosine
        FROM hs_cand c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    topk_hh AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_hh)
        WHERE rank <= {TOP_K}),
    {_sql_refined_cent_cte_sqrt()},
    {_sql_ivf_refined_topk_ctes(SCALED_IVF_NPROBE, 'hf')},
    {_sql_ivf_refined_topk_ctes(IVF_HIER_SUPER_PROBE * SCALED_IVF_NPROBE, 'hm')},
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('ivf_flat', 'topk_hf')}
    UNION ALL
    {_sql_tier_recall('ivf_flat_matched', 'topk_hm')}
    UNION ALL
    {_sql_tier_recall('ivf_hier', 'topk_hh')}
    """,
)
def ivf_hier_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the hierarchical tier AND the Lloyd-trained
    flat sqrt-law tier against the exact cosine baseline, in one card —
    the number that says what the n^1.5 -> n^1.25 build-cost drop costs
    in recall (two approximations stack: raw seeds instead of
    Lloyd-trained centroids, and vectors assigned through one
    super-cell). THREE rows so the comparison is a read-off, not two
    reports apart (VERDICT r11 #4): `ivf_flat` probes
    {SCALED_IVF_NPROBE} cells (the production serve setting, equal
    CELLS-probed to the hier tier, whose probe keeps the best
    {SCALED_IVF_NPROBE} cells among its {IVF_HIER_SUPER_PROBE} nearest
    supers' members); `ivf_flat_matched` probes {IVF_HIER_SUPER_PROBE} x
    {SCALED_IVF_NPROBE} cells — the flat tier granted the hier tier's
    FULL routing budget (supers x nprobe), the upper bound a two-level
    router could reach if it kept every scored cell. ivf_hier between
    the two brackets the routing restriction's recall cost. Read it
    next to ann_recall_report_scaled before choosing a build tier."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    exact = similarity_topk(spark, sf_dir).select("query_id", "vec_id")
    cent = ivf_centroids_sqrt(emb)
    flat = ann_ivf_topk(emb, cent, SCALED_IVF_NPROBE)
    flat_m = ann_ivf_topk(
        emb, cent, IVF_HIER_SUPER_PROBE * SCALED_IVF_NPROBE
    )
    hier = ann_ivf_hier_topk(emb)
    return (
        _tier_recall(exact, "ivf_flat", flat)
        .unionByName(_tier_recall(exact, "ivf_flat_matched", flat_m))
        .unionByName(_tier_recall(exact, "ivf_hier", hier))
    )


@register(
    "ivf_hier_cost_stats",
    oracle=f"""
    WITH {_sql_hier_ctes()},
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors FROM embeddings),
    kc AS (SELECT CAST(count(*) AS BIGINT) AS k_cents FROM hs_cent),
    ks AS (SELECT CAST(count(*) AS BIGINT) AS k_super FROM hs_super),
    cell AS (SELECT sid, CAST(count(*) AS BIGINT) AS c
             FROM hs_c2s GROUP BY sid),
    probed AS (SELECT CAST(sum(cell.c) AS BIGINT) AS stage2
               FROM hs_vsup v JOIN cell ON cell.sid = v.sid)
    SELECT n.n_vectors, kc.k_cents, ks.k_super,
           CAST(n.n_vectors * kc.k_cents AS BIGINT) AS flat_route_cost,
           CAST(n.n_vectors * ks.k_super + probed.stage2 AS BIGINT)
             AS hier_route_cost,
           round(CAST(n.n_vectors * ks.k_super + probed.stage2 AS DOUBLE)
                 / (n.n_vectors * kc.k_cents), 6) AS cost_ratio
    FROM n, kc, ks, probed
    """,
)
def ivf_hier_cost_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The routing-work gauge for the hierarchical build: exact counts
    of centroid-scoring operations — flat_route_cost = |V| x K (what the
    flat tier's assignment pays) vs hier_route_cost = |V| x K2 + sum of
    probed super-cell sizes (what the two-level assignment pays). The
    ratio is the measured build-cost discount, and its growth law
    (~n^-0.25) is pinned at two corpus sizes in tests/test_ivf_hier.py;
    the integers themselves are pinned to the EXECUTED assignment
    plan's SQLMetrics (|V| x K2 = the stage-1 NLJ's output rows, stage2
    = the sid hash join's output rows) by
    test_cost_stats_integers_match_executed_plan_metrics. Structural
    counts, not timings — host weather cannot blur them."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivf_hier_cost_frame(emb)


def ivf_hier_cost_frame(emb: DataFrame) -> DataFrame:
    """ivf_hier_cost_stats over an arbitrary (vec_id, embedding) frame —
    the registered query and the SQLMetrics cross-check test share one
    derivation."""
    embn, cent, sup = _hier_frames(emb)
    cent_a = _hier_cent_assigned(cent, sup)
    s1 = embn.crossJoin(F.broadcast(sup)).select(
        "vec_id",
        F.struct(
            F.round(
                cosine_n(F.col("embedding"), F.col("se"), F.col("nrm"), F.col("sn")),
                6,
            ).alias("score"),
            (-F.col("sid")).alias("negsid"),
        ).alias("sc"),
    )
    vsup = s1.groupBy("vec_id").agg((-F.max("sc")["negsid"]).alias("sid"))
    cell = cent_a.groupBy("sid").agg(F.count(F.lit(1)).alias("c"))
    stage2 = (
        vsup.join(F.broadcast(cell), "sid")
        .agg(F.sum("c").cast("bigint").alias("stage2"))
    )
    counts = (
        embn.agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .crossJoin(cent.agg(F.count(F.lit(1)).cast("bigint").alias("k_cents")))
        .crossJoin(sup.agg(F.count(F.lit(1)).cast("bigint").alias("k_super")))
        .crossJoin(stage2)
    )
    return counts.select(
        "n_vectors",
        "k_cents",
        "k_super",
        (F.col("n_vectors") * F.col("k_cents"))
        .cast("bigint")
        .alias("flat_route_cost"),
        (F.col("n_vectors") * F.col("k_super") + F.col("stage2"))
        .cast("bigint")
        .alias("hier_route_cost"),
        F.round(
            (F.col("n_vectors") * F.col("k_super") + F.col("stage2")).cast(
                "double"
            )
            / (F.col("n_vectors") * F.col("k_cents")),
            6,
        ).alias("cost_ratio"),
    )


# ---------------------------------------------------------------------------
# knn_graph under the production geometry + the recall gauges (VERDICT r4
# #5/#6): k = KNN_GRAPH_SCALED_K (constants block) lifted from the
# demo's fixture-sized 3 to a curation-grade 10.
KNN_RECALL_SRCS = 50  # recall gauges sample this many source vectors


@register(
    "knn_graph_scaled",
    oracle=f"""
    WITH {_SQL_SDYN_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('s', KNN_GRAPH_SCALED_K)}
    SELECT src, dst, cosine, rank FROM graph_sg
    """,
)
def knn_graph_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_graph under the PRODUCTION profile: DYNAMIC plane count
    lsh_planes_for(|V|) x {SCALED_LSH_TABLES} tables — candidate volume
    stays ~|V| x {LSH_TARGET_BUCKET} because the plane count is the
    smallest p with (1 << p) * {LSH_TARGET_BUCKET} >= |V| (the
    integer-exact law; the previous fixed 8-plane geometry measured a
    1.26 time-growth : row-growth ratio at 5x rows, BENCH_SCALE_r11) —
    and a curation-grade k = {KNN_GRAPH_SCALED_K} (label propagation /
    diversity sampling conventionally use k in 10..50; the demo's k=3
    is fixture-sized). Identical plan to knn_graph — src<dst scoring
    with a mirrored union, one cosine per unordered pair."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn_graph_edges_scaled(emb)


@register(
    "knn_graph_recall_report",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SDYN_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K, str(KNN_RECALL_SRCS))},
    {_sql_knn_graph('s', KNN_GRAPH_SCALED_K, str(KNN_RECALL_SRCS))},
    sg AS (
        SELECT q.vec_id AS src, v.vec_id AS dst,
               round({sql_cosine_pair('q.embedding', 'v.embedding')}, 6) AS cosine
        FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
        WHERE q.vec_id < {KNN_RECALL_SRCS}),
    gex AS (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cosine DESC, dst) AS rank
        FROM sg),
    tier_r AS (
        SELECT 'graph' AS tier, e.src,
               CAST(count(*) AS BIGINT) AS n_exact,
               CAST(sum(CASE WHEN g.dst IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM gex e LEFT JOIN graph_g g ON g.src = e.src AND g.dst = e.dst
        WHERE e.rank <= {KNN_GRAPH_K}
        GROUP BY e.src
        UNION ALL
        SELECT 'graph_scaled' AS tier, e.src,
               CAST(count(*) AS BIGINT) AS n_exact,
               CAST(sum(CASE WHEN g.dst IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM gex e LEFT JOIN graph_sg g ON g.src = e.src AND g.dst = e.dst
        WHERE e.rank <= {KNN_GRAPH_SCALED_K}
        GROUP BY e.src)
    SELECT tier, src, n_exact, n_hits,
           round(CAST(n_hits AS DOUBLE) / n_exact, 6) AS recall
    FROM tier_r
    """,
)
def knn_graph_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gauge for BOTH knn-graph geometries (VERDICT r4 #5 — the
    one ANN tier that had no gauge): for {KNN_RECALL_SRCS} sampled source
    vectors, the fraction of each source's EXACT top-k cosine neighbors
    its graph edges recover — demo graph at k={KNN_GRAPH_K}, scaled
    graph at k={KNN_GRAPH_SCALED_K}, each graded against exact truth at
    its own k. At 100 TB the exact side is the diagnostic (run on a
    source sample, as here); the graphs are the product.

    Plan shape: the exact side broadcasts the {KNN_RECALL_SRCS}-row
    sampled query set against one pass over V (the similarity_topk
    shape); the graph sides push src < {KNN_RECALL_SRCS} below the
    per-src window into the candidate join, so neither graph is built
    beyond the sampled sources; the hit rollups are |S| x k trivia."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    q = embn.filter(F.col("vec_id") < KNN_RECALL_SRCS).select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = embn.join(F.broadcast(q), F.col("vec_id") != F.col("src")).select(
        "src",
        F.col("vec_id").alias("dst"),
        F.round(
            cosine_n(F.col("qe"), F.col("embedding"), F.col("qn"), F.col("nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    out = []
    for tier, k, graph in (
        ("graph", KNN_GRAPH_K, knn_graph(spark, sf_dir)),
        ("graph_scaled", KNN_GRAPH_SCALED_K, knn_graph_scaled(spark, sf_dir)),
    ):
        exact = ranked.filter(F.col("rank") <= k).select("src", "dst")
        gedges = graph.filter(F.col("src") < KNN_RECALL_SRCS)
        out.append(_tier_recall(exact, tier, gedges, id_col="src"))
    return out[0].unionByName(out[1])


# --------------------------------------------------------------------------
# The scaled-GRAPH registration: 8 planes x 32 tables, k = 10 — the
# geometry the curation consumers already run on — walked from the
# denser landmark set (the scaled IVF modulus). The walk cost law is
# unchanged with k = 10, but the |V|/25 landmark ENTRY is linear in the
# corpus; the production serve path pairs this graph geometry with the
# routed entry (similarity_graph_beam_routed's ~sqrt(|V|) quantizer).


@register(
    "similarity_graph_beam_scaled",
    oracle=f"""
    WITH {_SQL_SDYN_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('s', KNN_GRAPH_SCALED_K)},
    {_sql_graph_beam_ctes(graph="graph_sg", cent_mod=SCALED_IVF_CENT_MOD)},
    scored AS (SELECT * FROM bv{BEAM_ROUNDS})
    {_SQL_RANK}
    """,
)
def similarity_graph_beam_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity_graph_beam at the PRODUCTION profile: the scaled k-NN
    graph (the same artifact knn_graph_scaled grades and the curation
    consumers walk) searched from the {SCALED_IVF_CENT_MOD}-modulus
    landmark set. Out-degree k = {KNN_GRAPH_SCALED_K} widens each
    expansion, so two beam rounds reach ~{BEAM_ROUNDS} x {BEAM_WIDTH} x
    {KNN_GRAPH_SCALED_K} candidates per query while the per-query cost
    law is unchanged — the configuration whose recall
    graph_beam_recall_report_scaled prices against the exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph = materialize(knn_graph_edges_scaled(emb))
    _, beam, _ = graph_beam_topk(
        emb, graph, cent_mod=SCALED_IVF_CENT_MOD
    )
    return beam


@register(
    "graph_beam_recall_report_scaled",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_SQL_SDYN_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('s', KNN_GRAPH_SCALED_K)},
    {_sql_graph_beam_ctes(graph="graph_sg", cent_mod=SCALED_IVF_CENT_MOD)},
    topk_ent AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
            FROM bv0)
        WHERE rank <= {TOP_K}),
    topk_bm AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
            FROM bv{BEAM_ROUNDS})
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('entries_only_scaled', 'topk_ent')}
    UNION ALL
    {_sql_tier_recall('graph_beam_scaled', 'topk_bm')}
    """,
)
def graph_beam_recall_report_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """graph_beam_recall_report at the production profile — the walk's
    contribution over the denser landmarks, on the graph the curation
    stack actually maintains."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    graph = materialize(knn_graph_edges_scaled(emb))
    exact = _exact_topk(spark, sf_dir).select("query_id", "vec_id")
    ent, beam, _ = graph_beam_topk(emb, graph, cent_mod=SCALED_IVF_CENT_MOD)
    return _tier_recall(exact, "entries_only_scaled", ent).unionByName(
        _tier_recall(exact, "graph_beam_scaled", beam)
    )


# ---------------------------------------------------------------------------
# TRAINED PQ codebook (VERDICT r4 #3): one Lloyd iteration per sub-space
# on top of the sampled seed codebook — the Jegou et al. recipe (their
# codebooks are k-means per sub-space; the sampled book is just the init).
# The refined entry for (sub_idx, code) is the exact integer-quantized
# mean of the sub-vectors the sampled book assigned to that code; codes,
# ADC and the recall gauge then re-derive against the refined book.

_SQL_PQT_CTES = (
    _SQL_PQ_CTES
    + f""",
    pqt_members AS (
        SELECT e.sub_idx, c.code AS seed_id, e.pos,
               CAST(CASE WHEN sum(e.xq) < 0
                         THEN -((-sum(e.xq)) // count(*))
                         ELSE sum(e.xq) // count(*) END AS BIGINT) AS mq
        FROM pq_ex e JOIN pq_codes c
          ON c.vec_id = e.vec_id AND c.sub_idx = e.sub_idx
        GROUP BY e.sub_idx, c.code, e.pos),
    pqt_book AS (
        -- memberless entries keep their seed sub-vector (duplicate-seed
        -- tie-breaks must not shrink the book's width)
        SELECT s.sub_idx, s.seed_id, s.pos, COALESCE(m.mq, s.xq) AS cq
        FROM pq_seeds s LEFT JOIN pqt_members m
          ON m.sub_idx = s.sub_idx AND m.seed_id = s.seed_id
         AND m.pos = s.pos),
    pqt_pairs AS (
        SELECT e.vec_id, e.sub_idx, b.seed_id,
               CAST(sum((e.xq - b.cq) * (e.xq - b.cq)) AS BIGINT) AS d2
        FROM pq_ex e JOIN pqt_book b ON b.sub_idx = e.sub_idx AND b.pos = e.pos
        GROUP BY 1, 2, 3),
    pqt_codes AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) % {PQ_PACK} AS code
        FROM pqt_pairs GROUP BY vec_id, sub_idx),
    pqt_qtab AS (SELECT vec_id AS query_id, sub_idx, seed_id, d2
                 FROM pqt_pairs WHERE vec_id < {N_QUERIES}),
    adc_t AS (
        SELECT q.query_id, c.vec_id,
               CAST(sum(q.d2) AS BIGINT) AS adc_d2
        FROM pqt_codes c
        JOIN pqt_qtab q ON q.sub_idx = c.sub_idx AND q.seed_id = c.code
        WHERE c.vec_id <> q.query_id
        GROUP BY q.query_id, c.vec_id)"""
)


def _pq_refined_book_frame(ex: DataFrame) -> DataFrame:
    """(sub_idx, seed_id, pos, cq): the trained codebook — per sampled
    code, the exact integer-micro-unit mean of its assigned sub-vectors
    (sign-split truncating division, both engines' BIGINT semantics).

    Entries with NO assigned members carry their seed sub-vector through
    unchanged (a left join from the seed book, coalescing to the seed's
    own xq). A seed does NOT always assign at least itself: when two
    seeds share an identical sub-vector the packed argmin tie-breaks to
    the lower seed_id, and without the coalesce the higher seed's entry
    silently vanished, shrinking the trained book's width below the
    sampled book's (r5 ADVICE). Width parity is asserted in
    tests/test_pq_trained.py on a planted duplicate-seed corpus."""
    codes0 = _pq_pairs_frame(ex).groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias("code")
    )
    agg = (
        ex.join(codes0, ["vec_id", "sub_idx"])
        .groupBy("sub_idx", F.col("code").alias("seed_id"), "pos")
        .agg(F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    cq = F.when(
        F.col("s") < 0, -F.expr("(-s) div n")
    ).otherwise(F.expr("s div n"))
    seeds = ex.filter(
        (F.col("vec_id") % PQ_SEED_MOD) == PQ_SEED_REM
    ).select(
        "sub_idx", F.col("vec_id").alias("seed_id"), "pos",
        F.col("xq").alias("sx"),
    )
    members = agg.select(
        "sub_idx", "seed_id", "pos", cq.cast("bigint").alias("mq")
    )
    return seeds.join(members, ["sub_idx", "seed_id", "pos"], "left").select(
        "sub_idx", "seed_id", "pos",
        F.coalesce(F.col("mq"), F.col("sx")).alias("cq"),
    )


def _pq_pairs_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_pq_pairs_trained_frame over the sf_dir embeddings table."""
    return _pq_pairs_trained_frame(_pq_quantized(spark, sf_dir))


def _pq_pairs_trained_frame(ex: DataFrame) -> DataFrame:
    """(vec_id, sub_idx, seed_id, d2) against the TRAINED codebook —
    the _pq_pairs shape with pqt_book broadcast in place of the raw
    seed sub-vectors (entries reassembled to pos-ordered arrays for the
    same 8-element integer fold — see _pq_sub_arrays). Same packed-
    argmin headroom: |cq| <= max|xq|, so per-sub d2 keeps the
    d2 * PQ_PACK + seed_id bound. Stays lazy (r12: an eager book
    materialization was tried and reverted — it regressed the trained-PQ
    consumers ~1.5x at sf0.1 because the two book references execute
    concurrently and the barrier job costs more than the duplication it
    removes; OPTIMIZATION_r12.md)."""
    book = _pq_refined_book_frame(ex).groupBy("sub_idx", "seed_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cq"))),
            lambda e: e["cq"],
        ).alias("sqa")
    )
    return _pq_sub_arrays(ex).join(F.broadcast(book), "sub_idx").select(
        "vec_id", "sub_idx", "seed_id", F.expr(_PQ_D2).alias("d2")
    )


@register(
    "embedding_pq_codes_trained",
    oracle=f"""
    WITH {_SQL_PQT_CTES},
    best_t AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) AS packed
        FROM pqt_pairs GROUP BY vec_id, sub_idx)
    {_sql_pq_code_tail('best_t')}
    """,
)
def embedding_pq_codes_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding_pq_codes against the TRAINED codebook: one Lloyd
    iteration per sub-space (assign sub-vectors with the sampled book,
    replace each entry by its cell's exact integer mean) — the paper's
    actual codebook recipe, for which the sampled book is only the
    initialization. Lloyd guarantees the quantization objective is
    non-increasing; tests/test_pq_trained.py asserts the mean MSE
    strictly drops and ADC recall strictly rises on the testdata.
    Same plan shape as the sampled tier: the book is tiny and
    BROADCAST, distances partial-aggregate map-side, the argmin is the
    packed-integer min."""
    best = _pq_pairs_trained(spark, sf_dir).groupBy("vec_id", "sub_idx").agg(
        F.min(F.col("d2") * PQ_PACK + F.col("seed_id")).alias("packed")
    )
    return _pq_code_card(best)


@register(
    "similarity_pq_adc_trained",
    oracle=f"""
    WITH {_SQL_PQT_CTES}
    SELECT query_id, vec_id, adc_d2, rank FROM (
        SELECT query_id, vec_id, adc_d2,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_d2, vec_id) AS BIGINT)
                 AS rank
        FROM adc_t)
    WHERE rank <= {TOP_K}
    """,
)
def similarity_pq_adc_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity_pq_adc with the TRAINED codebook: queries precompute
    exact sub-distances to every refined entry, stored vectors are
    scored through their trained codes — identical lookup-join plan,
    better codebook. The recall delta over the sampled tier is the
    measured value of training (pq_recall_report_trained)."""
    pairs = _pq_pairs_trained(spark, sf_dir)
    codes = pairs.groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias(
            "code"
        )
    )
    qtab = pairs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "sub_idx",
        F.col("seed_id").alias("code"),
        "d2",
    )
    adc = (
        codes.join(F.broadcast(qtab), ["sub_idx", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


@register(
    "pq_recall_report_trained",
    oracle=f"""
    WITH {_SQL_PQT_CTES},
    l2 AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(sum((q.xq - v.xq) * (q.xq - v.xq)) AS BIGINT) AS d2
        FROM pq_ex q JOIN pq_ex v
          ON v.sub_idx = q.sub_idx AND v.pos = q.pos
         AND v.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY 1, 2),
    topk_e AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d2, vec_id) AS rank
            FROM l2)
        WHERE rank <= {TOP_K}),
    topk_t AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, vec_id) AS rank
            FROM adc_t)
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('pq_trained', 'topk_t')}
    """,
)
def pq_recall_report_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pq_recall_report for the TRAINED codebook — the number that
    justifies spending the Lloyd pass (tests/test_pq_trained.py asserts
    it strictly exceeds the sampled book's recall). Same exact-L2
    baseline, same trivia-sized intersection rollup."""
    exq = _pq_quantized(spark, sf_dir).select("vec_id", "pos", "xq")
    qside = exq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xq").alias("qq")
    )
    l2 = (
        exq.join(F.broadcast(qside), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum((F.col("qq") - F.col("xq")) * (F.col("qq") - F.col("xq")))
            .cast("bigint")
            .alias("d2")
        )
    )
    we = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        l2.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    adc = similarity_pq_adc_trained(spark, sf_dir).select("query_id", "vec_id")
    return _tier_recall(exact, "pq_trained", adc)


# ===========================================================================
# OPQ-style dimension allocation (Ge et al. 2013, "Optimized Product
# Quantization", the parametric eigenvalue-allocation idea — public):
# plain PQ splits dimensions CONTIGUOUSLY into sub-spaces, so when
# variance is concentrated in a few leading dimensions one sub-space
# carries nearly all the signal (its 256 entries can't cover it) while
# the rest quantize noise. The fix is to re-allocate dimensions so each
# sub-space receives a balanced share of the variance. Full OPQ learns a
# rotation matrix; the allocation-only variant used here PERMUTES
# dimensions — rank all dims by corpus variance, deal them round-robin
# across the {PQ_SUBS} sub-spaces — which is integer-exact, needs no
# iterative matrix solve, and captures most of the benefit whenever the
# distortion is axis-aligned (the planted-anisotropy test measures it).


def _opq_alloc(ex0: DataFrame) -> DataFrame:
    """(pos, r): each dimension's variance rank (0 = highest), from
    exact integer moments — n*Σx² - (Σx)² per dimension in DECIMAL(38,0)
    so both engines order identically (used ONLY for ordering, never
    output). The rank window is partitionless over exactly EMB_DIM
    rows — the bounded-frame shape the window audit enforces."""
    d38 = "decimal(38,0)"
    var = ex0.groupBy("pos").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("xq").cast(d38).alias("s1"),
        F.sum(F.col("xq") * F.col("xq")).cast(d38).alias("s2"),
    )
    vk = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).alias("vk")
    w = Window.orderBy(F.col("vk").desc(), "pos")
    return (
        var.select("pos", vk)
        .withColumn("r", (F.row_number().over(w) - 1).cast("int"))
        .select("pos", "r")
    )


def _opq_ex_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, sub_idx, pos, xq) under the variance-balanced dimension
    allocation: dim of rank r lands in sub-space r % {PQ_SUBS} at
    in-space position r (so every sub-space holds ranks {{i, i+8, ...}}
    — one slice of every variance tier). The 64-row allocation table
    broadcasts; everything downstream is the stock PQ machinery."""
    sub_dim = EMB_DIM // PQ_SUBS
    ex0 = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * 10_000).cast("bigint").alias("xq"),
    )
    alloc = _opq_alloc(ex0)
    return ex0.join(F.broadcast(alloc), "pos").select(
        "vec_id",
        (F.col("r") % PQ_SUBS).cast("int").alias("sub_idx"),
        F.col("r").cast("int").alias("pos"),
        "xq",
    )


_SQL_OPQ_CTES = f"""
    opq_ex0 AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xq
        FROM embeddings),
    opq_var AS (
        SELECT pos,
               CAST(count(*) AS HUGEINT) * CAST(sum(xq * xq) AS HUGEINT)
               - CAST(sum(xq) AS HUGEINT) * CAST(sum(xq) AS HUGEINT) AS vk
        FROM opq_ex0 GROUP BY pos),
    opq_alloc AS (
        SELECT pos,
               CAST(row_number() OVER (ORDER BY vk DESC, pos) - 1 AS BIGINT)
                 AS r
        FROM opq_var),
    opq_ex AS (
        SELECT e.vec_id, a.r % {PQ_SUBS} AS sub_idx, a.r AS pos, e.xq
        FROM opq_ex0 e JOIN opq_alloc a ON a.pos = e.pos),
    opq_seeds AS (SELECT vec_id AS seed_id, sub_idx, pos, xq FROM opq_ex
                  WHERE vec_id % {PQ_SEED_MOD} = {PQ_SEED_REM}),
    opq_pairs0 AS (
        SELECT e.vec_id, e.sub_idx, s.seed_id,
               CAST(sum((e.xq - s.xq) * (e.xq - s.xq)) AS BIGINT) AS d2
        FROM opq_ex e JOIN opq_seeds s
          ON s.sub_idx = e.sub_idx AND s.pos = e.pos
        GROUP BY 1, 2, 3),
    opq_codes0 AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) % {PQ_PACK} AS code
        FROM opq_pairs0 GROUP BY vec_id, sub_idx),
    opq_members AS (
        SELECT e.sub_idx, c.code AS seed_id, e.pos,
               CAST(CASE WHEN sum(e.xq) < 0
                         THEN -((-sum(e.xq)) // count(*))
                         ELSE sum(e.xq) // count(*) END AS BIGINT) AS mq
        FROM opq_ex e JOIN opq_codes0 c
          ON c.vec_id = e.vec_id AND c.sub_idx = e.sub_idx
        GROUP BY e.sub_idx, c.code, e.pos),
    opq_book AS (
        SELECT s.sub_idx, s.seed_id, s.pos, COALESCE(m.mq, s.xq) AS cq
        FROM opq_seeds s LEFT JOIN opq_members m
          ON m.sub_idx = s.sub_idx AND m.seed_id = s.seed_id
         AND m.pos = s.pos),
    opq_pairs AS (
        SELECT e.vec_id, e.sub_idx, b.seed_id,
               CAST(sum((e.xq - b.cq) * (e.xq - b.cq)) AS BIGINT) AS d2
        FROM opq_ex e JOIN opq_book b
          ON b.sub_idx = e.sub_idx AND b.pos = e.pos
        GROUP BY 1, 2, 3)"""


@register(
    "embedding_pq_codes_opq",
    oracle=f"""
    WITH {_SQL_OPQ_CTES},
    best_o AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) AS packed
        FROM opq_pairs GROUP BY vec_id, sub_idx)
    {_sql_pq_code_tail('best_o')}
    """,
)
def embedding_pq_codes_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding_pq_codes_trained under the OPQ dimension allocation:
    dims ranked by exact integer variance, dealt round-robin across
    sub-spaces, then the stock Lloyd-refined book + codes over the
    permuted components. Same bytes, same plan shape (the allocation is
    a broadcast 64-row join + one {EMB_DIM}-row rank window); what
    changes is WHICH dimensions share a codebook. On an anisotropic
    corpus this strictly cuts quantization MSE versus contiguous
    grouping (tests/test_opq_alloc.py plants 8-strong/56-weak dims and
    measures 0.0035 vs 0.0612 — a 94% cut); on isotropic data it is a
    no-op by construction."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pairs = _pq_pairs_trained_frame(_opq_ex_frame(emb))
    best = pairs.groupBy("vec_id", "sub_idx").agg(
        F.min(F.col("d2") * PQ_PACK + F.col("seed_id")).alias("packed")
    )
    return _pq_code_card(best)


_SQL_OPQ_ADC_CTES = (
    _SQL_OPQ_CTES
    + f""",
    opq_codes AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) % {PQ_PACK} AS code
        FROM opq_pairs GROUP BY vec_id, sub_idx),
    opq_qtab AS (SELECT vec_id AS query_id, sub_idx, seed_id, d2
                 FROM opq_pairs WHERE vec_id < {N_QUERIES}),
    adc_o AS (
        SELECT q.query_id, c.vec_id,
               CAST(sum(q.d2) AS BIGINT) AS adc_d2
        FROM opq_codes c
        JOIN opq_qtab q ON q.sub_idx = c.sub_idx AND q.seed_id = c.code
        WHERE c.vec_id <> q.query_id
        GROUP BY q.query_id, c.vec_id)"""
)


@register(
    "similarity_pq_adc_opq",
    oracle=f"""
    WITH {_SQL_OPQ_ADC_CTES}
    SELECT query_id, vec_id, adc_d2, rank FROM (
        SELECT query_id, vec_id, adc_d2,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_d2, vec_id) AS BIGINT)
                 AS rank
        FROM adc_o)
    WHERE rank <= {TOP_K}
    """,
)
def similarity_pq_adc_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity_pq_adc_trained under the OPQ dimension allocation —
    the retrieval path for the permuted codes: queries precompute exact
    sub-distances to the PERMUTED refined book, and stored vectors are
    scored through their OPQ codes. Identical
    lookup-join plan; permuting dimensions changes only which integers
    the folds run over. The MSE benefit (94% on planted anisotropy,
    tests/test_opq_alloc.py) carries directly into ADC distances since
    ADC error is exactly the quantization error of the stored side."""
    pairs = _pq_pairs_trained_frame(
        _opq_ex_frame(
            load_table(spark, sf_dir, "embeddings").select(
                "vec_id", "embedding"
            )
        )
    )
    codes = pairs.groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias(
            "code"
        )
    )
    qtab = pairs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "sub_idx",
        F.col("seed_id").alias("code"),
        "d2",
    )
    adc = (
        codes.join(F.broadcast(qtab), ["sub_idx", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


# ===========================================================================
# Matryoshka dimension truncation (Kusupati et al. 2022, "Matryoshka
# Representation Learning" — public): MRL-trained embeddings keep most
# of their ranking power in their leading coordinates, so serving can
# read a PREFIX of each vector — 4x fewer bytes scanned and a 4x
# smaller index at d=16 — and rerank survivors at full width. This card
# prices exactly that lever on the corpus at hand.
MRL_DIMS = (16, 32)


def _prefix_topk(emb: DataFrame, d: int, k: int = TOP_K) -> DataFrame:
    """Exact cosine top-k over the FIRST ``d`` coordinates only — the
    similarity_topk broadcast shape on sliced arrays (norms recomputed
    at the truncated width; fold order matches the oracle's
    range(1, d+1) fold element for element)."""
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, d).alias("embedding")
    )
    embn = trunc.withColumn("nrm", norm(F.col("embedding")))
    q = embn.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = embn.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(
            cosine_n(F.col("qe"), F.col("embedding"), F.col("qn"), F.col("nrm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id")
    )


def _sql_prefix_topk(d: int, suffix: str) -> str:
    return f"""
    scored_{suffix} AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               round({sql_cosine_pair('q.embedding', 'v.embedding', d)}, 6)
                 AS cosine
        FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    topk_{suffix} AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored_{suffix})
        WHERE rank <= {TOP_K})"""


@register(
    "matryoshka_recall_report",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_sql_prefix_topk(MRL_DIMS[0], 'd16')},
    {_sql_prefix_topk(MRL_DIMS[1], 'd32')},
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('d16', 'topk_d16')}
    UNION ALL
    {_sql_tier_recall('d32', 'topk_d32')}
    """,
)
def matryoshka_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of PREFIX-truncated exact search (first 16 and
    first 32 of {EMB_DIM} dims) against the full-width baseline — the
    Matryoshka serving lever priced on this corpus: if d=16 recall
    clears the bar, the scan reads 1/4 of the bytes and the ANN index
    shrinks 4x before any quantization is even applied (truncation
    composes with the PQ/SQ8 tiers). On non-MRL-trained embeddings
    (this testdata) the card shows what truncation COSTS instead — same
    measurement, opposite conclusion, which is why it must be measured
    per-corpus rather than assumed. Plan per tier: the similarity_topk
    broadcast shape over sliced arrays; slicing happens at the scan
    projection, so the pairwise fold really runs at the truncated
    width."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    exact = similarity_topk(spark, sf_dir).select("query_id", "vec_id")
    out = None
    for d in MRL_DIMS:
        rep = _tier_recall(exact, f"d{d}", _prefix_topk(emb, d))
        out = rep if out is None else out.unionByName(rep)
    return out


# ===========================================================================
# Scalar quantization, SQ8 (FAISS ScalarQuantizer QT_8bit — public): one
# byte PER DIMENSION, each dim independently affine-coded against its
# corpus [min, max]. The OTHER workhorse compression tier: 4x smaller
# than raw floats (vs PQ's 32x) but nearly lossless — the
# bytes-vs-recall point teams pick when PQ's recall ceiling is too low
# and raw vectors don't fit. All integer-exact: the micro-unit grid,
# the affine code, and the reconstruction are BIGINT on both engines.
SQ_LEVELS = 255


def _sq8_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, pos, xq, code, rq): per-component affine SQ8 code and
    its exact integer reconstruction rq = mn + (code*(mx-mn)) div 255.
    Operands are non-negative by construction (xq >= mn), so truncating
    division agrees across engines. The per-dimension [mn, mx] frame is
    {EMB_DIM} rows, broadcast."""
    ex0 = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * 10_000).cast("bigint").alias("xq"),
    )
    mnmx = ex0.groupBy("pos").agg(
        F.min("xq").alias("mn"), F.max("xq").alias("mx")
    )
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.expr(f"((xq - mn) * {SQ_LEVELS}) DIV (mx - mn)"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        ex0.join(F.broadcast(mnmx), "pos")
        .withColumn("code", code)
        .withColumn("rq", F.expr(f"mn + (code * (mx - mn)) DIV {SQ_LEVELS}"))
        .select("vec_id", "pos", "xq", "code", "rq")
    )


_SQL_SQ8_CTES = f"""
    sq_ex0 AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xq
        FROM embeddings),
    sq_mnmx AS (SELECT pos, min(xq) AS mn, max(xq) AS mx
                FROM sq_ex0 GROUP BY pos),
    sq_f AS (
        SELECT e.vec_id, e.pos, e.xq,
               CASE WHEN m.mx > m.mn
                    THEN ((e.xq - m.mn) * {SQ_LEVELS}) // (m.mx - m.mn)
                    ELSE CAST(0 AS BIGINT) END AS code,
               m.mn, m.mx
        FROM sq_ex0 e JOIN sq_mnmx m ON m.pos = e.pos),
    sq_r AS (
        SELECT vec_id, pos, xq, code,
               mn + (code * (mx - mn)) // {SQ_LEVELS} AS rq
        FROM sq_f)"""


@register(
    "embedding_sq8_codes",
    oracle=f"""
    WITH {_SQL_SQ8_CTES}
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), '_' ORDER BY pos) AS sq_code,
           round(CAST(sum((xq - rq) * (xq - rq)) AS DOUBLE)
                 / (CAST({EMB_DIM} AS BIGINT) * 100000000), 6) AS recon_mse
    FROM sq_r GROUP BY vec_id
    """,
)
def embedding_sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 codes + reconstruction MSE per vector: each of the {EMB_DIM}
    components affine-quantized to its own 8-bit grid. One corpus pass
    for the per-dimension ranges (a {EMB_DIM}-row broadcast), one for
    the codes — same two-pass economics at 1e9 vectors. recon_mse is
    directly comparable to the PQ tiers' quant_mse: SQ8 spends 8x the
    bytes for ~2000x less distortion (measured 3.0e-6 vs trained PQ's
    6.4e-3 at sf0.01), the trade sq8_recall_report prices."""
    # (Distinct from analytics.embedding_quantize: that is per-VECTOR
    # max-abs symmetric int8 — row-local, no corpus statistics, no
    # search path. SQ8 trains per-DIMENSION ranges on the corpus and
    # carries the asymmetric search + recall gauge — the FAISS tier.)
    f = _sq8_frame(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    return f.groupBy("vec_id").agg(
        F.concat_ws(
            "_",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))),
                lambda e: e["code"].cast("string"),
            ),
        ).alias("sq_code"),
        F.round(
            F.sum((F.col("xq") - F.col("rq")) * (F.col("xq") - F.col("rq")))
            .cast("double")
            / (EMB_DIM * 100_000_000),
            6,
        ).alias("recon_mse"),
    )


@register(
    "similarity_sq8_topk",
    oracle=f"""
    WITH {_SQL_SQ8_CTES},
    sq_d2 AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(sum((q.xq - v.rq) * (q.xq - v.rq)) AS BIGINT) AS adc_d2
        FROM sq_r v JOIN sq_r q ON q.pos = v.pos AND q.vec_id <> v.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY 1, 2)
    SELECT query_id, vec_id, adc_d2, rank FROM (
        SELECT query_id, vec_id, adc_d2,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_d2, vec_id) AS BIGINT)
                 AS rank
        FROM sq_d2)
    WHERE rank <= {TOP_K}
    """,
)
def similarity_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric top-{TOP_K} through SQ8: exact query components scored
    against stored RECONSTRUCTIONS (the FAISS asymmetric-distance
    convention — query-side precision is free, only the corpus is
    compressed). Plan: the {N_QUERIES}-query component table broadcasts
    against one pass over the reconstructed corpus, distances
    partial-aggregate map-side per (query, vector) — similarity_topk's
    shape with rq in place of raw floats, so the serving state is the
    1-byte-per-dim codes alone. sq8_recall_report measures ~lossless
    recall vs the exact-L2 baseline."""
    f = _sq8_frame(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    q = f.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xq").alias("qq")
    )
    d2 = (
        f.join(F.broadcast(q), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum((F.col("qq") - F.col("rq")) * (F.col("qq") - F.col("rq")))
            .cast("bigint")
            .alias("adc_d2")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        d2.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


@register(
    "sq8_recall_report",
    oracle=f"""
    WITH {_SQL_SQ8_CTES},
    {_SQL_PQT_CTES},
    sq_d2 AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(sum((q.xq - v.rq) * (q.xq - v.rq)) AS BIGINT) AS adc_d2
        FROM sq_r v JOIN sq_r q ON q.pos = v.pos AND q.vec_id <> v.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY 1, 2),
    l2 AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(sum((q.xq - v.xq) * (q.xq - v.xq)) AS BIGINT) AS d2
        FROM sq_ex0 q JOIN sq_ex0 v
          ON v.pos = q.pos AND v.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY 1, 2),
    topk_e AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d2, vec_id) AS rank
            FROM l2)
        WHERE rank <= {TOP_K}),
    topk_s AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, vec_id) AS rank
            FROM sq_d2)
        WHERE rank <= {TOP_K}),
    topk_p AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, vec_id) AS rank
            FROM adc_t)
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('sq8', 'topk_s')}
    UNION ALL
    {_sql_tier_recall('pq_trained', 'topk_p')}
    """,
)
def sq8_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of SQ8 (64 bytes/vec) NEXT TO trained PQ (8
    bytes/vec) against the same exact-L2 baseline — the bytes-vs-recall
    curve in one graded card: SQ8 should sit near 1.0 (8 bits/dim is
    ~lossless for ranking) while PQ trades recall for the 8x smaller
    index, and the right tier for a workload is read straight off this
    report. Rollups are |Q| x {TOP_K} trivia over the two tier plans."""
    exq = _pq_quantized(spark, sf_dir).select("vec_id", "pos", "xq")
    qside = exq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xq").alias("qq")
    )
    l2 = (
        exq.join(F.broadcast(qside), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum((F.col("qq") - F.col("xq")) * (F.col("qq") - F.col("xq")))
            .cast("bigint")
            .alias("d2")
        )
    )
    we = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        l2.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    sq8 = similarity_sq8_topk(spark, sf_dir).select("query_id", "vec_id")
    pqt = similarity_pq_adc_trained(spark, sf_dir).select("query_id", "vec_id")
    return _tier_recall(exact, "sq8", sq8).unionByName(
        _tier_recall(exact, "pq_trained", pqt)
    )


# ===========================================================================
# IVFADC (Jegou et al. 2011, Sec. V): the COMPOSED production tier — the
# trained coarse quantizer routes each query to its nprobe nearest
# inverted lists, and the vectors in those lists are scored through
# their PQ codes alone (asymmetric distance), never through raw floats.
# This is the architecture billion-scale ANN systems actually ship
# (FAISS IndexIVFPQ): routing bounds the candidate set to the probed
# lists (~nprobe/|lists| of the corpus), PQ bounds per-candidate cost to
# {PQ_SUBS} table lookups and the index to codes (~32x smaller). This
# tier encodes raw vectors (FAISS's by_residual=False mode); the
# residual-encoded production default (ONE shared book trained on
# residuals, per-(query, cell) lookup tables) is the
# similarity_ivfpq_adc_residual tier below, and
# ivfpq_residual_recall_report prices the difference.

_SQL_IVFPQ_ADC_CTE = f"""
    adc_ip AS (
        SELECT c.query_id, c.vec_id,
               CAST(sum(q.d2) AS BIGINT) AS adc_d2
        FROM cand_ip c
        JOIN pqt_codes pc ON pc.vec_id = c.vec_id
        JOIN pqt_qtab q ON q.query_id = c.query_id
                       AND q.sub_idx = pc.sub_idx AND q.seed_id = pc.code
        GROUP BY c.query_id, c.vec_id)"""


def ivfpq_adc_topk(
    emb: DataFrame,
    cent: DataFrame,
    nprobe: int,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    sup: DataFrame | None = None,
) -> DataFrame:
    """IVFADC over a (vec_id, embedding) frame and a (cid, ce) centroid
    frame: IVF routing supplies the (query_id, vec_id) candidate pairs,
    the TRAINED PQ book supplies codes + per-query lookup tables, and
    the score is the exact-integer ADC sum over the candidate's codes —
    the only per-candidate work is {PQ_SUBS} lookup-join rows. With
    ``sup`` given, ``cent`` is a (cid, ce, cn, sid) two-level quantizer
    and routing goes super-first (ivf_candidates_hier — the n^1.25
    production path); without it, the flat broadcast-argmax routing
    (tests and the demo geometry)."""
    if sup is None:
        cand = ivf_candidates(emb, cent, nprobe, n_queries)
    else:
        cand, _, _ = ivf_candidates_hier(emb, cent, sup, nprobe, n_queries)
        cand = cand.select("query_id", "vec_id")
    pairs = _pq_pairs_trained_frame(_pq_ex_frame(emb))
    codes = pairs.groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias(
            "code"
        )
    )
    qtab = pairs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        "sub_idx",
        F.col("seed_id").alias("code"),
        "d2",
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qtab), ["query_id", "sub_idx", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


_IVFPQ_ADC_SQL = f"""
    WITH {_sql_refined_cent_cte_sqrt_sampled()},
    {_sql_hier_topk_ctes(SCALED_IVF_NPROBE, 'ip')},
    {_SQL_PQT_CTES},
    {_SQL_IVFPQ_ADC_CTE}
    SELECT query_id, vec_id, adc_d2, rank FROM (
        SELECT query_id, vec_id, adc_d2,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_d2, vec_id) AS BIGINT)
                 AS rank
        FROM adc_ip)
    WHERE rank <= {TOP_K}
    """


@register("similarity_ivfpq_adc", oracle=_IVFPQ_ADC_SQL)
def similarity_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed IVFADC search under the production profile: the
    Lloyd-trained ~sqrt(|V|)-list coarse quantizer (ivf_cent_mod,
    VERDICT r10 #2) routes each query to nprobe={SCALED_IVF_NPROBE} lists
    (similarity_ann_ivf_scaled's routing), and list members are scored
    by trained-PQ asymmetric distance (similarity_pq_adc_trained's
    scoring) — raw stored vectors are touched by NEITHER stage, which
    is what lets a 1e9-vector index live in memory: the serving state
    is (cid, {PQ_SUBS}-byte code) per vector plus two tiny codebooks.

    Plan shape: routing is TWO-LEVEL (super argmax, then the probed
    supers' member centroids via a broadcast hash equi-join on sid —
    ivf_candidates_hier, so the build never touches |V| x K rows) +
    the cid equi-join; scoring joins candidates to codes on vec_id and to the
    BROADCAST per-query lookup table on (query_id, sub_idx, code), and
    the ADC sum partial-aggregates map-side. Per-query cost tracks
    |probed lists| x {PQ_SUBS} lookups — independent of |V| once list
    sizes are balanced (the trained quantizer's job; AQE deskews any
    residual imbalance). Distances are exact micro-unit BIGINTs, so
    ranking is integer-deterministic across engines."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # quantizer stays LAZY (r12 optimization round, measured): eager was
    # tried here — the subtree has ~4 references (assign + probe via
    # cent_a AND sup) — and LOST the A/B (6.39/7.27 s vs 4.87/4.43 s at
    # sf0.1): all four references execute concurrently inside the one
    # monolithic job, so idle cores absorb the duplication and the
    # checkpoint barrier only adds wall-clock (OPTIMIZATION_r12.md).
    # Contrast the residual tier, whose refs span SERIAL build stages.
    cent_a, sup = ivf_trained_hier(emb)
    return ivfpq_adc_topk(emb, cent_a, SCALED_IVF_NPROBE, sup=sup)


@register(
    "ivfpq_recall_report",
    oracle=f"""
    WITH {_sql_refined_cent_cte_sqrt_sampled()},
    {_sql_hier_topk_ctes(SCALED_IVF_NPROBE, 'ip')},
    {_SQL_PQT_CTES},
    {_SQL_IVFPQ_ADC_CTE},
    l2 AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(sum((q.xq - v.xq) * (q.xq - v.xq)) AS BIGINT) AS d2
        FROM pq_ex q JOIN pq_ex v
          ON v.sub_idx = q.sub_idx AND v.pos = q.pos
         AND v.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY 1, 2),
    topk_e AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d2, vec_id) AS rank
            FROM l2)
        WHERE rank <= {TOP_K}),
    topk_ip2 AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, vec_id) AS rank
            FROM adc_ip)
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('ivfpq', 'topk_ip2')}
    """,
)
def ivfpq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the composed IVFADC tier against the exact-L2
    baseline — the one number that prices the WHOLE production stack
    (routing loss from probing {SCALED_IVF_NPROBE} lists x quantization
    loss from {PQ_SUBS}-byte codes) rather than each stage alone, which
    is what an operator actually ships with. pq_recall_report_trained
    isolates the quantization share; the gap between the two reports is
    the routing share. tests/test_ivfpq.py asserts the composed tier's
    recall bar on a planted clustered corpus where neighbor geometry
    matches a real embedding corpus."""
    exq = _pq_quantized(spark, sf_dir).select("vec_id", "pos", "xq")
    qside = exq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xq").alias("qq")
    )
    l2 = (
        exq.join(F.broadcast(qside), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum((F.col("qq") - F.col("xq")) * (F.col("qq") - F.col("xq")))
            .cast("bigint")
            .alias("d2")
        )
    )
    we = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        l2.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    adc = similarity_ivfpq_adc(spark, sf_dir).select("query_id", "vec_id")
    return _tier_recall(exact, "ivfpq", adc)


# ===========================================================================
# Residual-encoded IVFPQ (Jegou et al. 2011 Sec. V-A; FAISS IndexIVFPQ's
# by_residual=True DEFAULT): instead of PQ-coding raw vectors, each
# vector is coded as the residual to its own coarse centroid — residuals
# concentrate near the origin regardless of which cell a vector lives
# in, so ONE shared codebook (trained on residuals) spends its 256
# entries per sub-space on a much tighter distribution and recall rises
# at the SAME code budget. The price is query-side: the ADC lookup
# table becomes per (query, probed cell) — (q - c_cell) changes with the
# cell — i.e. nprobe tables instead of one, still broadcast trivia.
RQ_CAP = 30_000  # |residual| micro-unit bound that keeps per-sub d2 within
#                  the packed-argmin headroom (d2 * PQ_PACK + id < 2^63):
#                  diff <= 2*RQ_CAP -> d2 <= 8 * 3.6e9 = 2.9e10 << 9.2e10


def _cent_micro(cent: DataFrame) -> DataFrame:
    """(cid, pos, cq): centroid components at the PQ 1e4 micro scale.
    Centroid doubles are exact integer ratios (s/n/1e6) bit-identical on
    both engines, so floor(c * 1e4) is a deterministic BIGINT twin."""
    return cent.select("cid", F.posexplode("ce").alias("pos", "c")).select(
        "cid",
        "pos",
        F.floor(F.col("c") * 10_000).cast("bigint").alias("cq"),
    )


def _residual_ex(ex: DataFrame, cells: DataFrame, cex: DataFrame, id_col: str) -> DataFrame:
    """(id_col[, cid], sub_idx, pos, xq): PQ micro components re-expressed
    as residuals to the given (id, cid) cell assignment. Guarded: a
    residual beyond +-RQ_CAP would corrupt the packed argmin, so it
    raises instead of silently mis-coding."""
    rq = F.col("xq") - F.col("cq")
    guarded = F.when(F.abs(rq) <= RQ_CAP, rq).otherwise(
        F.raise_error(
            f"residual exceeds +-{RQ_CAP} micro-units: packed-argmin "
            "headroom broken — renormalize the corpus or raise PQ_PACK"
        )
    )
    return (
        ex.join(cells, id_col)
        .join(F.broadcast(cex), ["cid", "pos"])
        .select(id_col, "cid", "sub_idx", "pos", guarded.alias("xq"))
    )


def _book_arrays(book: DataFrame) -> DataFrame:
    """(sub_idx, seed_id, sqa): a (sub_idx, seed_id, pos, cq) book
    reassembled to pos-ordered arrays for the unrolled integer fold."""
    return book.groupBy("sub_idx", "seed_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cq"))),
            lambda e: e["cq"],
        ).alias("sqa")
    )


def ivfpq_adc_residual_topk(
    emb: DataFrame,
    cent: DataFrame,
    nprobe: int,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    sup: DataFrame | None = None,
) -> DataFrame:
    """Residual-encoded IVFADC over a (vec_id, embedding) frame and a
    (cid, ce, cn) centroid frame. Stages: (1) coarse-assign every vector
    (broadcast argmax — ivf_candidates' routing); (2) train ONE PQ book
    on the corpus RESIDUALS (same Lloyd refinement as the raw tier);
    (3) code each vector's residual; (4) per (query, probed cell), build
    the ADC table from the QUERY residual to that cell; (5) sum code
    lookups per candidate, top-k. All distances exact micro-unit
    BIGINTs — ranking is integer-deterministic across engines. Plan
    shape matches ivfpq_adc_topk: the book, centroid table and per-query
    tables broadcast; candidates join codes on vec_id; the ADC sum
    partial-aggregates map-side. Cites FAISS IndexIVFPQ by_residual
    (public) as the production default this mirrors.

    The four multiply-consumed build artifacts — cell assignment (2
    refs), residual training set (4 refs: book seeds, assignment,
    refinement, corpus coding), trained residual book (2 refs) and the
    query probe (2 refs) — are MATERIALIZED (operators/artifacts.py):
    before r12 each reference re-ran its subtree in-plan, multiplying
    the one-shot build into 194 executed exchanges / 134 scans with
    zero ReusedExchange (plans/r12/similarity_ivfpq_adc_residual_*.txt
    is the before/after evidence)."""
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    cex = _cent_micro(cent)
    ex = _pq_ex_frame(emb)
    qframe = embn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding", "nrm"
    )

    def _corpus_side() -> tuple[DataFrame, DataFrame, DataFrame]:
        # dependent chain: assignment -> residual training set -> book
        assign = materialize(
            _nearest_cells(embn, cent, "vec_id", 1)
            if sup is None
            else _hier_assign(embn, cent, sup)
        )
        res = materialize(
            _residual_ex(ex, assign, cex, "vec_id").select(
                "vec_id", "sub_idx", "pos", "xq"
            )
        )
        return assign, res, materialize(
            _book_arrays(_pq_refined_book_frame(res))
        )

    def _probe_side() -> DataFrame:
        return materialize(
            _nearest_cells(qframe, cent, "query_id", nprobe)
            if sup is None
            else _hier_route_frame(
                qframe, "query_id", cent, sup, IVF_HIER_SUPER_PROBE, nprobe
            )
        )

    # the corpus-side build chain and the query probe share only the
    # quantizer — overlap the two checkpoint chains (guide §2.6;
    # A/B-measured, OPTIMIZATION_r12.md)
    (assign, res_ex, book_arr), probe = run_concurrently(
        _corpus_side, _probe_side
    )
    corpus_pairs = _pq_sub_arrays(res_ex).join(
        F.broadcast(book_arr), "sub_idx"
    ).select("vec_id", "sub_idx", "seed_id", F.expr(_PQ_D2).alias("d2"))
    codes = corpus_pairs.groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias(
            "code"
        )
    )
    q_res = _residual_ex(
        ex.filter(F.col("vec_id") < n_queries).withColumnRenamed(
            "vec_id", "query_id"
        ),
        probe,
        cex,
        "query_id",
    )
    q_arr = q_res.groupBy("query_id", "cid", "sub_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "xq"))),
            lambda e: e["xq"],
        ).alias("xqa")
    )
    qtab = q_arr.join(F.broadcast(book_arr), "sub_idx").select(
        "query_id",
        "cid",
        "sub_idx",
        F.col("seed_id").alias("code"),
        F.expr(_PQ_D2).alias("d2"),
    )
    cand = (
        probe.join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cid")
        .distinct()
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qtab), ["query_id", "cid", "sub_idx", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


# The residual CTE chain: rcent -> assignment/probe -> residual ex ->
# seed book -> Lloyd-refined book -> codes -> per-(query, cell) tables ->
# ADC. Mirrors _SQL_PQT_CTES stage for stage, sourced from residuals.
_SQL_RSD_CTES = f"""
    {_sql_refined_cent_cte_sqrt_sampled()},
    rsd_super AS (
        SELECT cid AS sid, ce AS se FROM rcent, rc_sm
        WHERE cid % (cm * sm) = {IVF_CENT_REM}),
    rsd_c2s AS (
        SELECT cid, ce, sid FROM (
            SELECT c.cid, c.ce, s.sid,
                   row_number() OVER (PARTITION BY c.cid
                       ORDER BY round({sql_cosine_pair('c.ce', 's.se')}, 6) DESC,
                                (c.cid <> s.sid), s.sid) AS rn
            FROM rcent c, rsd_super s)
        WHERE rn = 1),
    rsd_vsup AS (
        SELECT vec_id, sid FROM (
            SELECT v.vec_id, s.sid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 's.se')}, 6) DESC,
                                s.sid) AS rn
            FROM embeddings v, rsd_super s)
        WHERE rn = 1),
    rsd_assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY round({sql_cosine_pair('v.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM embeddings v
            JOIN rsd_vsup u ON u.vec_id = v.vec_id
            JOIN rsd_c2s c ON c.sid = u.sid)
        WHERE rn = 1),
    rsd_qsup AS (
        SELECT query_id, sid FROM (
            SELECT q.vec_id AS query_id, s.sid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 's.se')}, 6) DESC,
                                s.sid) AS rn
            FROM embeddings q, rsd_super s WHERE q.vec_id < {N_QUERIES})
        WHERE rn <= {IVF_HIER_SUPER_PROBE}),
    rsd_probe AS (
        SELECT query_id, cid FROM (
            SELECT u.query_id, c.cid,
                   row_number() OVER (PARTITION BY u.query_id
                       ORDER BY round({sql_cosine_pair('q.embedding', 'c.ce')}, 6) DESC,
                                c.cid) AS rn
            FROM rsd_qsup u
            JOIN embeddings q ON q.vec_id = u.query_id
            JOIN rsd_c2s c ON c.sid = u.sid)
        WHERE rn <= {SCALED_IVF_NPROBE}),
    rsd_cex AS (
        SELECT cid, i AS pos,
               CAST(floor(CAST(ce[i + 1] AS DOUBLE) * 10000) AS BIGINT) AS cq
        FROM rcent, UNNEST(range(len(ce))) AS t(i)),
    rsd_ex0 AS (
        SELECT vec_id,
               (generate_subscripts(embedding, 1) - 1) // {EMB_DIM // PQ_SUBS}
                 AS sub_idx,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xq
        FROM embeddings),
    rsd_ex AS (
        SELECT e.vec_id, e.sub_idx, e.pos, e.xq - c.cq AS xq
        FROM rsd_ex0 e
        JOIN rsd_assign a ON a.vec_id = e.vec_id
        JOIN rsd_cex c ON c.cid = a.cid AND c.pos = e.pos),
    rsd_seeds AS (SELECT vec_id AS seed_id, sub_idx, pos, xq FROM rsd_ex
                  WHERE vec_id % {PQ_SEED_MOD} = {PQ_SEED_REM}),
    rsd_pairs0 AS (
        SELECT e.vec_id, e.sub_idx, s.seed_id,
               CAST(sum((e.xq - s.xq) * (e.xq - s.xq)) AS BIGINT) AS d2
        FROM rsd_ex e JOIN rsd_seeds s
          ON s.sub_idx = e.sub_idx AND s.pos = e.pos
        GROUP BY 1, 2, 3),
    rsd_codes0 AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) % {PQ_PACK} AS code
        FROM rsd_pairs0 GROUP BY vec_id, sub_idx),
    rsd_members AS (
        SELECT e.sub_idx, c.code AS seed_id, e.pos,
               CAST(CASE WHEN sum(e.xq) < 0
                         THEN -((-sum(e.xq)) // count(*))
                         ELSE sum(e.xq) // count(*) END AS BIGINT) AS mq
        FROM rsd_ex e JOIN rsd_codes0 c
          ON c.vec_id = e.vec_id AND c.sub_idx = e.sub_idx
        GROUP BY e.sub_idx, c.code, e.pos),
    rsd_book AS (
        SELECT s.sub_idx, s.seed_id, s.pos, COALESCE(m.mq, s.xq) AS cq
        FROM rsd_seeds s LEFT JOIN rsd_members m
          ON m.sub_idx = s.sub_idx AND m.seed_id = s.seed_id
         AND m.pos = s.pos),
    rsd_pairs AS (
        SELECT e.vec_id, e.sub_idx, b.seed_id,
               CAST(sum((e.xq - b.cq) * (e.xq - b.cq)) AS BIGINT) AS d2
        FROM rsd_ex e JOIN rsd_book b
          ON b.sub_idx = e.sub_idx AND b.pos = e.pos
        GROUP BY 1, 2, 3),
    rsd_codes AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) % {PQ_PACK} AS code
        FROM rsd_pairs GROUP BY vec_id, sub_idx),
    rsd_qex AS (
        SELECT e.vec_id AS query_id, p.cid, e.sub_idx, e.pos,
               e.xq - c.cq AS xq
        FROM rsd_ex0 e
        JOIN rsd_probe p ON p.query_id = e.vec_id
        JOIN rsd_cex c ON c.cid = p.cid AND c.pos = e.pos
        WHERE e.vec_id < {N_QUERIES}),
    rsd_qtab AS (
        SELECT q.query_id, q.cid, q.sub_idx, b.seed_id,
               CAST(sum((q.xq - b.cq) * (q.xq - b.cq)) AS BIGINT) AS d2
        FROM rsd_qex q JOIN rsd_book b
          ON b.sub_idx = q.sub_idx AND b.pos = q.pos
        GROUP BY 1, 2, 3, 4),
    rsd_cand AS (
        SELECT DISTINCT p.query_id, a.vec_id, a.cid
        FROM rsd_probe p JOIN rsd_assign a ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id),
    rsd_adc AS (
        SELECT c.query_id, c.vec_id, CAST(sum(q.d2) AS BIGINT) AS adc_d2
        FROM rsd_cand c
        JOIN rsd_codes rc ON rc.vec_id = c.vec_id
        JOIN rsd_qtab q ON q.query_id = c.query_id AND q.cid = c.cid
                       AND q.sub_idx = rc.sub_idx AND q.seed_id = rc.code
        GROUP BY 1, 2)"""


@register(
    "embedding_pq_codes_residual",
    oracle=f"""
    WITH {_SQL_RSD_CTES},
    best_r AS (
        SELECT vec_id, sub_idx,
               min(d2 * {PQ_PACK} + seed_id) AS packed
        FROM rsd_pairs GROUP BY vec_id, sub_idx)
    {_sql_pq_code_tail('best_r')}
    """,
)
def embedding_pq_codes_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding_pq_codes_trained with RESIDUAL encoding (FAISS
    by_residual): each vector's code quantizes (x - c_cell), not x.
    Residuals from every cell share one origin-centered distribution, so
    the same {PQ_SUBS}-byte budget buys a finer quantization — the
    quant_mse column is directly comparable to the trained tier's and
    tests/test_ivfpq_residual.py asserts the mean strictly drops; the
    recall gain is priced by ivfpq_residual_recall_report."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent, sup = ivf_trained_hier(emb, eager=True)
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    assign = _hier_assign(embn, cent, sup)
    # the residual training set is read 4x downstream (book seeds,
    # assignment, refinement, corpus coding) — materialized once
    res_ex = materialize(
        _residual_ex(
            _pq_ex_frame(emb), assign, _cent_micro(cent), "vec_id"
        ).select("vec_id", "sub_idx", "pos", "xq")
    )
    book_arr = _book_arrays(_pq_refined_book_frame(res_ex))
    pairs = _pq_sub_arrays(res_ex).join(
        F.broadcast(book_arr), "sub_idx"
    ).select("vec_id", "sub_idx", "seed_id", F.expr(_PQ_D2).alias("d2"))
    best = pairs.groupBy("vec_id", "sub_idx").agg(
        F.min(F.col("d2") * PQ_PACK + F.col("seed_id")).alias("packed")
    )
    return _pq_code_card(best)


_IVFPQ_RSD_SQL = f"""
    WITH {_SQL_RSD_CTES}
    SELECT query_id, vec_id, adc_d2, rank FROM (
        SELECT query_id, vec_id, adc_d2,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_d2, vec_id) AS BIGINT)
                 AS rank
        FROM rsd_adc)
    WHERE rank <= {TOP_K}
    """


@register("similarity_ivfpq_adc_residual", oracle=_IVFPQ_RSD_SQL)
def similarity_ivfpq_adc_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity_ivfpq_adc with RESIDUAL encoding — the FAISS
    IndexIVFPQ production default (by_residual=True). Same routing, same
    code budget, same plan shape; what changes is WHAT the codes
    quantize (x - c_cell, one shared residual-trained book) and that the
    broadcast ADC lookup table is keyed by (query, probed cell) instead
    of query alone — nprobe x {PQ_SUBS} x |book| integer rows per query,
    still trivia. ivfpq_residual_recall_report measures what the
    re-centering buys at the same bytes."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_a, sup = ivf_trained_hier(emb, eager=True)
    return ivfpq_adc_residual_topk(emb, cent_a, SCALED_IVF_NPROBE, sup=sup)


@register(
    "ivfpq_residual_recall_report",
    oracle=f"""
    WITH {_SQL_RSD_CTES},
    {_sql_hier_topk_ctes(SCALED_IVF_NPROBE, 'ip')},
    {_SQL_PQT_CTES},
    {_SQL_IVFPQ_ADC_CTE},
    l2 AS (
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(sum((q.xq - v.xq) * (q.xq - v.xq)) AS BIGINT) AS d2
        FROM rsd_ex0 q JOIN rsd_ex0 v
          ON v.sub_idx = q.sub_idx AND v.pos = q.pos
         AND v.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY 1, 2),
    topk_e AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d2, vec_id) AS rank
            FROM l2)
        WHERE rank <= {TOP_K}),
    topk_raw AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, vec_id) AS rank
            FROM adc_ip)
        WHERE rank <= {TOP_K}),
    topk_rsd AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, vec_id) AS rank
            FROM rsd_adc)
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('ivfpq_raw', 'topk_raw')}
    UNION ALL
    {_sql_tier_recall('ivfpq_residual', 'topk_rsd')}
    """,
)
def ivfpq_residual_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the raw-encoded AND residual-encoded IVFADC
    tiers against the same exact-L2 baseline, side by side — the report
    that prices what residual re-centering buys at the identical
    routing + code budget (VERDICT r6 #4). Same trivia-sized rollups as
    ann_recall_report; the expensive inputs are exactly the two tier
    plans being compared."""
    exq = _pq_quantized(spark, sf_dir).select("vec_id", "pos", "xq")
    qside = exq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xq").alias("qq")
    )
    l2 = (
        exq.join(F.broadcast(qside), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum((F.col("qq") - F.col("xq")) * (F.col("qq") - F.col("xq")))
            .cast("bigint")
            .alias("d2")
        )
    )
    we = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        l2.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    raw = similarity_ivfpq_adc(spark, sf_dir).select("query_id", "vec_id")
    rsd = similarity_ivfpq_adc_residual(spark, sf_dir).select(
        "query_id", "vec_id"
    )
    return _tier_recall(exact, "ivfpq_raw", raw).unionByName(
        _tier_recall(exact, "ivfpq_residual", rsd)
    )


# ===========================================================================
# Persisted vector-index lifecycle (the dedup.minhash_index_write
# discipline applied to the ANN tier): the IVFADC serving state —
# (cid, PQ code) per vector plus the two tiny codebooks — lives ON DISK
# between query batches, with the codes PARTITIONED BY coarse cell so a
# probe reads only its nprobe directories (Spark plans a dynamic-
# partition-pruning subquery off the broadcast route side — asserted by
# tests/test_vector_index.py). Re-quantizing 1e9 vectors per query batch
# is the cost this kills; the write is one pass, the probe touches
# nprobe/|cells| of the corpus bytes.


def _nearest_cells(
    df: DataFrame, cent: DataFrame, id_col: str, keep: int
) -> DataFrame:
    """(id_col, cid): each row's ``keep`` nearest centroids by rounded
    cosine (ties to lower cid) — assignment at keep=1, query routing at
    keep=nprobe. Expects (id_col, embedding, nrm) rows and a broadcast-
    sized (cid, ce, cn) centroid frame."""
    scored = df.crossJoin(F.broadcast(cent)).select(
        F.col(id_col),
        "cid",
        F.round(
            cosine_n(F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cn")),
            6,
        ).alias("_c"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_c").desc(), F.col("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep)
        .select(id_col, "cid")
    )


def _vindex_codes_path(spark: SparkSession, name: str) -> str:
    from mapreduce_spark.sources.fs import warehouse_uri

    return f"{warehouse_uri(spark)}/{name}_codes"


def vector_index_write(
    emb: DataFrame,
    name: str,
    cent_mod: int | None = None,
    rem: int = IVF_CENT_REM,
    train: DataFrame | None = None,
) -> None:
    """Build and persist the IVFADC index ``name``: codes for ``emb`` as
    cid-partitioned parquet (one directory per coarse cell — at a
    production 32k-cell geometry that is 32k directories, each holding
    that cell's (vec_id, {PQ_SUBS}-byte code) rows), the trained
    TWO-LEVEL coarse quantizer as ``{{name}}_centroids`` — (cid, ce, cn,
    sid) rows, each centroid carrying its super assignment so appends
    and probes route super-first from the stored table alone — and the
    trained PQ book as ``{{name}}_book`` (both broadcast-sized
    tables). ``train`` is the
    TRAINING corpus for both codebooks (default: ``emb`` itself) — in
    production the quantizer trains on a sample while data arrives
    incrementally, so the two are distinct by design (and
    similarity_index_appended grades exactly that split). One data
    pass; raw embeddings are never stored."""
    spark = emb.sparkSession
    from mapreduce_spark.sources.fs import fs_delete

    train = emb if train is None else train
    for suffix in ("centroids", "book"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        fs_delete(
            spark,
            f"{_vindex_codes_path(spark, name).removesuffix('_codes')}_{suffix}",
        )
    if cent_mod is None:
        # production default: sample-trained sqrt-law quantizer WITH its
        # super routing layer — the stored (cid, ce, cn, sid) table lets
        # append/probe route two-level without re-deriving any modulus.
        # Stays lazy (r12 optimization round, measured): eager lost the
        # similarity_index_persisted A/B (12.68/8.31 s vs 7.00/7.06 s)
        # — the quantizer is consumed by ONE write action whose two
        # subtree references run concurrently (OPTIMIZATION_r12.md)
        cent, _ = ivf_trained_hier(train)
    else:
        cent = refined_centroids(train, cent_mod, rem)
    book = _pq_refined_book_frame(_pq_ex_frame(train)).groupBy(
        "sub_idx", "seed_id"
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cq"))),
            lambda e: e["cq"],
        ).alias("sqa")
    )
    # the quantizer write and the book write share no dependency (the
    # book trains on raw sub-vectors, not on cells): overlap the two
    # jobs so one back-fills the other's tail (guide §2.6; A/B-measured
    # in the r12 optimization round, OPTIMIZATION_r12.md). The codes
    # append below reads BOTH stored tables, so it stays after the join.
    run_concurrently(
        lambda: cent.write.mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{name}_centroids"),
        lambda: book.write.mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{name}_book"),
    )
    fs_delete(spark, _vindex_codes_path(spark, name))
    vector_index_append(emb, name)


def vector_index_append(new_emb: DataFrame, name: str) -> None:
    """Fold a batch of new vectors into the on-disk index ``name``:
    assignment and codes derive from the STORED quantizer and book (read
    back — stored and derived state can never drift, and the expensive
    training never reruns), and the coded rows append into the
    cid-partitioned layout (new files only in the touched cells'
    directories). The ingest op that makes a billion-vector index
    maintainable: per-batch cost tracks |batch|, the corpus codes are
    never rewritten, and probes see appended vectors immediately."""
    spark = new_emb.sparkSession
    stored_cent = spark.table(f"{name}_centroids")
    stored_book = spark.table(f"{name}_book")
    embn = new_emb.withColumn("nrm", norm(F.col("embedding")))
    assign = _stored_cent_assign(embn, stored_cent)
    pairs = _pq_sub_arrays(_pq_ex_frame(new_emb)).join(
        F.broadcast(stored_book), "sub_idx"
    ).select("vec_id", "sub_idx", "seed_id", F.expr(_PQ_D2).alias("d2"))
    codes = pairs.groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias(
            "code"
        )
    )
    codes_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub_idx", "code"))),
            lambda e: e["code"].cast("int"),
        ).alias("pq_code")
    )
    (
        assign.join(codes_arr, "vec_id")
        .repartition("cid")
        .write.partitionBy("cid")
        .mode("append")
        .parquet(_vindex_codes_path(spark, name))
    )


def vector_index_probe(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    nprobe: int = SCALED_IVF_NPROBE,
    k: int = TOP_K,
    codes_path: str | None = None,
) -> DataFrame:
    """ADC top-k of a (vec_id, embedding) query batch against the
    on-disk index ``name``: route each query to its nprobe cells under
    the STORED quantizer, read ONLY those cells' code partitions (the
    route side broadcasts, so Catalyst prunes the codes scan with a
    dynamic-partition-pruning subquery), build the per-query lookup
    table against the STORED book, and fold integer ADC sums over the
    candidates' codes. Nothing here touches raw corpus embeddings —
    the probe's input bytes are nprobe/|cells| of the code table plus
    two broadcast codebooks. ``codes_path`` points the code scan at a
    location other than the warehouse default — the re-attach path
    (vector_index_attach), where the codebook TABLES need catalog
    entries but the cid-partitioned codes are read by path alone."""
    cent = spark.table(f"{name}_centroids")
    book = spark.table(f"{name}_book")
    codes = spark.read.parquet(codes_path or _vindex_codes_path(spark, name))
    qn = queries.withColumn("nrm", norm(F.col("embedding"))).select(
        F.col("vec_id").alias("query_id"), "embedding", "nrm"
    )
    route = _stored_cent_route(qn, cent, nprobe)
    qtab = (
        _pq_sub_arrays(_pq_ex_frame(queries))
        .join(F.broadcast(book), "sub_idx")
        .select(
            F.col("vec_id").alias("query_id"),
            "sub_idx",
            F.col("seed_id").alias("code"),
            F.expr(_PQ_D2).alias("d2"),
        )
    )
    cand = codes.join(route, "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sub = cand.select(
        "query_id", "vec_id", F.posexplode("pq_code").alias("sub_idx", "code")
    )
    adc = (
        sub.join(F.broadcast(qtab), ["query_id", "sub_idx", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


@register(
    "vindex_cell_stats",
    oracle=f"""
    WITH {_sql_refined_cent_cte_sqrt_sampled()},
    {_sql_hier_topk_ctes(SCALED_IVF_NPROBE, 'vs')},
    per AS (SELECT cid, CAST(count(*) AS BIGINT) AS c
            FROM assign_vs GROUP BY cid)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(c) AS BIGINT) AS n_vectors,
           CAST(max(c) AS BIGINT) AS max_cell,
           CAST(sum(c * c) AS BIGINT) AS sum_sq,
           round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6) AS balance
    FROM per
    """,
)
def vindex_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-occupancy gauge for the production IVF quantizer — the
    vector index's skew report (lsh_bucket_stats' sibling): non-empty
    cell count, max cell size, Σc² (the probe-cost law: expected scanned
    rows per query track the probed cells' sizes), and balance =
    max_cell / mean_cell (1.0 = perfectly balanced; a runaway value
    means one dense direction owns the corpus and the quantizer needs
    re-training or more cells BEFORE a 1e9-vector index is built around
    it). tests/test_vector_index.py gates balance on the testdata so a
    quantizer change that degenerates cells fails CI, not a cluster.

    Plan shape: the two-level assignment (shared with every production
    IVF consumer — super argmax, then the assigned super's member
    centroids), a cid partial-agg, then a 1-row rollup — strictly
    cheaper than any probe it prices."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_a, sup = ivf_trained_hier(emb)
    embn = emb.withColumn("nrm", norm(F.col("embedding")))
    per = (
        _hier_assign(embn, cent_a, sup)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("c").cast("bigint").alias("n_vectors"),
        F.max("c").cast("bigint").alias("max_cell"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
        F.round(
            F.max("c").cast("double")
            * F.count(F.lit(1))
            / F.sum("c"),
            6,
        ).alias("balance"),
    )


@register("similarity_index_persisted", oracle=_IVFPQ_ADC_SQL)
def similarity_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity_ivfpq_adc with the index round-tripped THROUGH DISK:
    build + persist the production-profile IVFADC index (cid-partitioned
    codes, stored quantizer + book), then probe the query set against
    the files — same rows as the in-memory query (same oracle), but the
    serving path now starts from the artifact a real vector store ships:
    the probe re-reads only its nprobe cells (dynamic partition pruning
    off the broadcast route) and never re-quantizes the corpus. The
    vector-side mirror of dedup_index_persisted."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vector_index_write(emb, "vindex_demo")
    return vector_index_probe(
        spark,
        "vindex_demo",
        emb.filter(F.col("vec_id") < N_QUERIES),
        SCALED_IVF_NPROBE,
        TOP_K,
    )


def vector_index_attach(
    spark: SparkSession,
    name: str,
    centroids_location: str,
    book_location: str,
) -> None:
    """Re-attach a vector index written by a PREVIOUS session under
    ``name``: external parquet tables over the surviving quantizer and
    book locations (schema inferred from the files — neither is
    bucketed, so plain USING parquet LOCATION DDL restores them), after
    which vector_index_probe(name, ..., codes_path=...) serves without
    rewriting a byte. minhash_index_attach's vector-side mirror: the
    in-memory catalog dies with the session; the artifacts do not."""
    for suffix, loc in (
        ("centroids", centroids_location),
        ("book", book_location),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        spark.sql(
            f"CREATE TABLE {name}_{suffix} USING parquet LOCATION '{loc}'"
        )


@register("similarity_index_attached", oracle=_IVFPQ_ADC_SQL)
def similarity_index_attached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector index's cross-session RESTORE path, graded
    (dedup_index_attached's mirror for the ANN family): build + persist
    the production IVFADC index, then re-attach its quantizer and book
    UNDER A NEW NAME from nothing but their surviving parquet locations
    and probe against the attached catalog entries + the path-read
    cid-partitioned codes — same rows as the one-shot in-memory query
    (same oracle), zero data rewritten. The original catalog entries are
    left in place rather than dropped (dropping a managed table purges
    its files), so the attach is exercised purely through location +
    DDL."""
    from mapreduce_spark.sources.fs import warehouse_uri

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vector_index_write(emb, "vindex_att")
    w = warehouse_uri(spark)
    vector_index_attach(
        spark,
        "vindex_att_reborn",
        f"{w}/vindex_att_centroids",
        f"{w}/vindex_att_book",
    )
    return vector_index_probe(
        spark,
        "vindex_att_reborn",
        emb.filter(F.col("vec_id") < N_QUERIES),
        SCALED_IVF_NPROBE,
        TOP_K,
        codes_path=_vindex_codes_path(spark, "vindex_att"),
    )


def vector_index_compact(spark: SparkSession, name: str) -> None:
    """OPTIMIZE-style maintenance rewrite for the vector index's
    cid-partitioned code layout (minhash_index_compact's sibling): every
    vector_index_append leaves new files in each touched cell's
    directory, so after K ingests a probe of a cell opens up to K+1
    files. Compaction spools the codes to a temporary plain copy
    (severing the read from the directory about to be overwritten) and
    rewrites them repartitioned ON cid — each write task holds whole
    cells, so every cell directory collapses back to one file. Same
    rows, same partition layout, so probe plans (dynamic partition
    pruning off the broadcast route) and results are untouched. Pure
    maintenance, never required for correctness; the stored quantizer
    and book are not touched."""
    from mapreduce_spark.sources.fs import fs_delete, fs_mkdtemp

    path = _vindex_codes_path(spark, name)
    spool = fs_mkdtemp(spark, f"vcompact_{name}")
    try:
        spark.read.parquet(path).write.mode("overwrite").parquet(
            f"{spool}/codes"
        )
        fs_delete(spark, path)
        (
            spark.read.parquet(f"{spool}/codes")
            .repartition("cid")
            .write.partitionBy("cid")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        fs_delete(spark, spool)


@register("similarity_index_compacted", oracle=_IVFPQ_ADC_SQL)
def similarity_index_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector index's FULL maintenance lifecycle in one graded query
    (dedup_index_compacted's vector-side mirror): write the even-vec_id
    half as the initial index, APPEND the odd half under the stored
    artifacts, COMPACT the two-files-per-cell append debris back to one
    file per cell, then probe — identical rows to the one-shot in-memory
    IVFADC query (same oracle), proving appends AND compaction are both
    invisible to serving. One-file-per-cell after compaction is pinned
    by tests/test_vector_index.py."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vector_index_write(
        emb.filter(F.col("vec_id") % 2 == 0), "vindex_cpt", train=emb
    )
    vector_index_append(emb.filter(F.col("vec_id") % 2 == 1), "vindex_cpt")
    vector_index_compact(spark, "vindex_cpt")
    return vector_index_probe(
        spark,
        "vindex_cpt",
        emb.filter(F.col("vec_id") < N_QUERIES),
        SCALED_IVF_NPROBE,
        TOP_K,
    )


@register("similarity_index_appended", oracle=_IVFPQ_ADC_SQL)
def similarity_index_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector index's INGEST lifecycle, graded: the quantizer and
    book train once on the full corpus (the production posture — train
    on a sample, data arrives incrementally), the even-vec_id half is
    written as the initial index, the odd half arrives later via
    vector_index_append (coded under the STORED artifacts, appended
    into the touched cells' directories only), and the probe of the
    fully-staged index must return row-for-row what the one-shot
    in-memory IVFADC query computes — same oracle as
    similarity_ivfpq_adc, proving appends are invisible to probes (the
    dedup_index_compacted law on the vector side)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vector_index_write(
        emb.filter(F.col("vec_id") % 2 == 0), "vindex_app", train=emb
    )
    vector_index_append(emb.filter(F.col("vec_id") % 2 == 1), "vindex_app")
    return vector_index_probe(
        spark,
        "vindex_app",
        emb.filter(F.col("vec_id") < N_QUERIES),
        SCALED_IVF_NPROBE,
        TOP_K,
    )


# ---------------------------------------------------------------------------
# RESIDUAL persisted index (VERDICT r7 #4): the ship-state artifact of the
# FAISS by_residual default. vector_index_write stores raw-subvector codes;
# these store codes of (x - c_cell) plus the residual-trained book — the
# index a production deployment actually serves, since residual encoding
# buys +recall at the same byte budget (tests/test_ivfpq_residual.py).


def vector_index_write_residual(
    emb: DataFrame,
    name: str,
    cent_mod: int | None = None,
    rem: int = IVF_CENT_REM,
    train: DataFrame | None = None,
) -> None:
    """Build + persist the residual-encoded IVFADC index ``name``: the
    trained coarse quantizer as ``{name}_centroids``, the RESIDUAL-
    trained PQ book (Lloyd-refined on the training corpus's (x - c_cell)
    micro components) as ``{name}_book``, and cid-partitioned residual
    codes. Same storage layout and byte budget as vector_index_write —
    what changes is what the codes quantize. ``train`` defaults to
    ``emb`` (production: train on a sample, append the stream)."""
    spark = emb.sparkSession
    from mapreduce_spark.sources.fs import fs_delete

    train = emb if train is None else train
    for suffix in ("centroids", "book"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        fs_delete(
            spark,
            f"{_vindex_codes_path(spark, name).removesuffix('_codes')}_{suffix}",
        )
    if cent_mod is None:
        # eager (r12 optimization round, measured): the lazy quantizer
        # subtree re-ran in BOTH the centroid-write action and the
        # book-write action (assign + _cent_micro reference cent);
        # eager trains once and both actions read the checkpoint
        cent, _ = ivf_trained_hier(train, eager=True)
    else:
        cent = refined_centroids(train, cent_mod, rem)
    embn = train.withColumn("nrm", norm(F.col("embedding")))
    assign = _stored_cent_assign(embn, cent)
    res_ex = _residual_ex(
        _pq_ex_frame(train), assign, _cent_micro(cent), "vec_id"
    ).select("vec_id", "sub_idx", "pos", "xq")
    book = _book_arrays(_pq_refined_book_frame(res_ex))
    # both writes read the checkpointed quantizer (eager above), so
    # they are independent jobs — overlap them (guide §2.6; the codes
    # append reads both stored tables and stays after the join)
    run_concurrently(
        lambda: cent.write.mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{name}_centroids"),
        lambda: book.write.mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{name}_book"),
    )
    fs_delete(spark, _vindex_codes_path(spark, name))
    vector_index_append_residual(emb, name)


def vector_index_append_residual(new_emb: DataFrame, name: str) -> None:
    """Fold a batch into the residual index ``name`` under the STORED
    quantizer and residual book (read back, never retrained — stored and
    derived state cannot drift): coarse-assign, re-express each vector
    as its cell residual, code against the stored book, append into the
    touched cells' directories only. Per-batch cost tracks |batch|."""
    spark = new_emb.sparkSession
    stored_cent = spark.table(f"{name}_centroids")
    stored_book = spark.table(f"{name}_book")
    embn = new_emb.withColumn("nrm", norm(F.col("embedding")))
    assign = _stored_cent_assign(embn, stored_cent)
    res_ex = _residual_ex(
        _pq_ex_frame(new_emb), assign, _cent_micro(stored_cent), "vec_id"
    ).select("vec_id", "sub_idx", "pos", "xq")
    pairs = _pq_sub_arrays(res_ex).join(
        F.broadcast(stored_book), "sub_idx"
    ).select("vec_id", "sub_idx", "seed_id", F.expr(_PQ_D2).alias("d2"))
    codes = pairs.groupBy("vec_id", "sub_idx").agg(
        (F.min(F.col("d2") * PQ_PACK + F.col("seed_id")) % PQ_PACK).alias(
            "code"
        )
    )
    codes_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub_idx", "code"))),
            lambda e: e["code"].cast("int"),
        ).alias("pq_code")
    )
    (
        assign.join(codes_arr, "vec_id")
        .repartition("cid")
        .write.partitionBy("cid")
        .mode("append")
        .parquet(_vindex_codes_path(spark, name))
    )


def vector_index_probe_residual(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    nprobe: int = SCALED_IVF_NPROBE,
    k: int = TOP_K,
) -> DataFrame:
    """Residual ADC top-k against the on-disk index ``name``: route each
    query under the STORED quantizer, read ONLY the routed cells' code
    partitions (broadcast route side → dynamic partition pruning, same
    plan pin as the raw probe), build the per-(query, cell) lookup table
    from the QUERY'S residual to that cell against the STORED book, and
    fold integer ADC sums over candidate codes. The corpus is never
    re-quantized; probe input bytes are nprobe/|cells| of the code table
    plus two broadcast codebooks."""
    cent = spark.table(f"{name}_centroids")
    book = spark.table(f"{name}_book")
    codes = spark.read.parquet(_vindex_codes_path(spark, name))
    qn = queries.withColumn("nrm", norm(F.col("embedding"))).select(
        F.col("vec_id").alias("query_id"), "embedding", "nrm"
    )
    route = _stored_cent_route(qn, cent, nprobe)
    q_res = _residual_ex(
        _pq_ex_frame(queries).withColumnRenamed("vec_id", "query_id"),
        route,
        _cent_micro(cent),
        "query_id",
    )
    q_arr = q_res.groupBy("query_id", "cid", "sub_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "xq"))),
            lambda e: e["xq"],
        ).alias("xqa")
    )
    qtab = q_arr.join(F.broadcast(book), "sub_idx").select(
        "query_id",
        "cid",
        "sub_idx",
        F.col("seed_id").alias("code"),
        F.expr(_PQ_D2).alias("d2"),
    )
    cand = codes.join(route, "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sub = cand.select(
        "query_id",
        "cid",
        "vec_id",
        F.posexplode("pq_code").alias("sub_idx", "code"),
    )
    adc = (
        sub.join(F.broadcast(qtab), ["query_id", "cid", "sub_idx", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_d2", "rank")
    )


@register("similarity_index_persisted_residual", oracle=_IVFPQ_RSD_SQL)
def similarity_index_persisted_residual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """similarity_ivfpq_adc_residual with the index round-tripped
    THROUGH DISK — the deployable artifact of the FAISS by_residual
    default (VERDICT r7 #4): build + persist the residual-encoded
    production index (cid-partitioned residual codes, stored quantizer +
    residual book), then probe the query set against the files. Same
    rows as the in-memory residual query (same oracle); the probe
    re-reads only its nprobe cells via dynamic partition pruning and
    never re-quantizes the corpus (pinned in tests/test_vector_index.py),
    and recall is at least the raw persisted tier's on the planted
    clustered corpus (tests/test_ivfpq_residual.py)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vector_index_write_residual(emb, "vindex_rsd")
    return vector_index_probe_residual(
        spark,
        "vindex_rsd",
        emb.filter(F.col("vec_id") < N_QUERIES),
        SCALED_IVF_NPROBE,
        TOP_K,
    )


# ===========================================================================
# Binary sign quantization + Hamming search: the 1-bit compression tier
# (256x: 64 float32 dims -> one 8-byte word). The sign-code primitives
# themselves (HAMMING_RERANK_FACTOR, sign_codes_frame, _SQL_SIGN_CTES)
# live above the k-NN-graph section, which shares them as its shortlist
# metric.


@register(
    "embedding_sign_codes",
    oracle=f"""
    WITH {_SQL_SIGN_CTES}
    SELECT vec_id, w0, w1, n_pos FROM sgn
    """,
)
def embedding_sign_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit sign quantization (binary embeddings): each vector's 64
    coordinate signs packed into two BIGINT words (bits 0..31 / 32..63 —
    splitting keeps every partial sum off the 64-bit sign bit) plus the
    popcount — the 256x-compressed representation the Hamming tier scans
    and a persistable data product (8 bytes + id per vector, so 1e9
    vectors fit in ~16 GB of executor memory where the float index needs
    256 GB). Zero shuffle: two per-row integer folds; both engines pack
    from the same float32 >= 0 predicate, so the words are bit-identical."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return sign_codes_frame(emb)


def hamming_topk(
    emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Per-query Hamming top-k over the packed sign codes: the
    xor+popcount scan (2 BIGINT ops per candidate word) with the tiny
    query code set broadcast; ties break on vec_id so ranking is
    integer-deterministic (Hamming takes only 65 values, so ties are
    the norm, not the edge case)."""
    sgn = sign_codes_frame(emb).select("vec_id", "w0", "w1")
    q = sgn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    scored = sgn.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        (
            F.bit_count(F.col("w0").bitwiseXOR(F.col("q0")))
            + F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
        )
        .cast("bigint")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "hamming", "rank")
    )


def _sql_hamming_scored() -> str:
    return f"""
    hq AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM sgn
           WHERE vec_id < {N_QUERIES}),
    hscored AS (
        SELECT hq.query_id, s.vec_id,
               CAST(bit_count(xor(s.w0, hq.q0))
                    + bit_count(xor(s.w1, hq.q1)) AS BIGINT) AS hamming
        FROM hq JOIN sgn s ON s.vec_id <> hq.query_id)"""


@register(
    "similarity_hamming_topk",
    oracle=f"""
    WITH {_SQL_SIGN_CTES},
    {_sql_hamming_scored()}
    SELECT query_id, vec_id, hamming, rank FROM (
        SELECT query_id, vec_id, hamming,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY hamming, vec_id) AS BIGINT)
                 AS rank
        FROM hscored)
    WHERE rank <= {TOP_K}
    """,
)
def similarity_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance top-{TOP_K} over the 1-bit sign codes: candidate
    cost is two xor+popcount BIGINT ops (SIMD-friendly JVM intrinsics —
    the cheapest scan any tier here can run), the index is the 256x-
    compressed sign table, and hamming/64 estimates angle/pi by the
    SimHash law. The shortlisting stage of binary-quantized retrieval;
    similarity_hamming_rerank adds the exact second stage."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return hamming_topk(emb)


def hamming_rerank_topk(
    emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Two-stage search: Hamming shortlist of HAMMING_RERANK_FACTOR x k,
    exact cosine re-rank of the shortlist only."""
    short = hamming_topk(emb, k * HAMMING_RERANK_FACTOR, n_queries).select(
        "query_id", "vec_id"
    )
    return _rank_topk(_score_pairs(emb, short), k)


@register(
    "similarity_hamming_rerank",
    oracle=f"""
    WITH {_SQL_SIGN_CTES},
    {_sql_hamming_scored()},
    hshort AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY hamming, vec_id) AS rank
            FROM hscored)
        WHERE rank <= {TOP_K * HAMMING_RERANK_FACTOR}),
    scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM hshort c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    {_SQL_RANK}
    """,
)
def similarity_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization retrieval as production ships it: the popcount
    scan shortlists {HAMMING_RERANK_FACTOR}x{TOP_K} candidates per query
    from the 256x-compressed sign index, then ONLY the shortlist pays
    exact float cosine — per-query float work drops from |V| x {EMB_DIM}
    ops to {HAMMING_RERANK_FACTOR * TOP_K} x {EMB_DIM} while the scan
    stage stays two BIGINT ops per candidate. hamming_recall_report
    prices both stages against the exact baseline (the rerank tier
    recovers most of what raw Hamming ranking loses)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return hamming_rerank_topk(emb)


@register(
    "hard_negatives_scaled",
    oracle=f"""
    WITH {_SQL_SIGN_CTES},
    lab AS (SELECT s.vec_id, s.w0, s.w1, e.label
            FROM sgn s JOIN embeddings e USING (vec_id)),
    hq AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1,
                  label AS query_label
           FROM lab WHERE vec_id < {N_QUERIES}),
    hscored AS (
        SELECT hq.query_id, hq.query_label, s.vec_id, s.label AS neg_label,
               CAST(bit_count(xor(s.w0, hq.q0))
                    + bit_count(xor(s.w1, hq.q1)) AS BIGINT) AS hamming
        FROM hq JOIN lab s ON s.label <> hq.query_label),
    hshort AS (
        SELECT query_id, query_label, vec_id, neg_label FROM (
            SELECT query_id, query_label, vec_id, neg_label,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY hamming, vec_id) AS rank
            FROM hscored)
        WHERE rank <= {HARD_NEG_K * HAMMING_RERANK_FACTOR}),
    scored AS (
        SELECT c.query_id, c.query_label, c.vec_id, c.neg_label,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM hshort c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id)
    SELECT query_id, query_label, vec_id, neg_label, cosine, rank FROM (
        SELECT query_id, query_label, vec_id, neg_label, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
        FROM scored)
    WHERE rank <= {HARD_NEG_K}
    """,
)
def hard_negatives_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hard_negatives on the PRODUCTION candidate path its demo
    docstring promises: the wrong-label scan runs over the 1-bit sign
    codes (two xor+popcount BIGINT ops per candidate — the 256x-
    compressed index, so at 1e9 vectors the shortlist stage never
    touches a float), shortlists 4x k per query, and only the shortlist
    pays exact cosine + final ranking — similarity_hamming_rerank's
    two-stage economics with the label-mismatch predicate pushed into
    the CHEAP stage, where it also shrinks the candidate stream.
    Deterministic end-to-end (integer Hamming ranking with vec_id
    tie-break), so the oracle replays the exact shortlist."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    lab = sign_codes_frame(emb.select("vec_id", "embedding")).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    q = lab.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
        F.col("label").alias("query_label"),
    )
    hscored = lab.join(
        F.broadcast(q), F.col("label") != F.col("query_label")
    ).select(
        "query_id",
        "query_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        (
            F.bit_count(F.col("w0").bitwiseXOR(F.col("q0")))
            + F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
        )
        .cast("bigint")
        .alias("hamming"),
    )
    wh = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    short = (
        hscored.withColumn("_rn", F.row_number().over(wh))
        .filter(F.col("_rn") <= HARD_NEG_K * HAMMING_RERANK_FACTOR)
        .select("query_id", "query_label", "vec_id", "neg_label")
    )
    rer = _score_pairs(emb.select("vec_id", "embedding"), short.select("query_id", "vec_id"))
    scored = rer.join(short, ["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select("query_id", "query_label", "vec_id", "neg_label", "cosine", "rank")
    )



@register(
    "hamming_recall_report",
    oracle=f"""
    WITH {_SQL_EXACT_TOPK_CTE},
    {_SQL_SIGN_CTES},
    {_sql_hamming_scored()},
    topk_h AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY hamming, vec_id) AS rank
            FROM hscored)
        WHERE rank <= {TOP_K}),
    hshort AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY hamming, vec_id) AS rank
            FROM hscored)
        WHERE rank <= {TOP_K * HAMMING_RERANK_FACTOR}),
    rr_scored AS (
        SELECT c.query_id, c.vec_id,
               round({sql_cosine_pair('eq.embedding', 'ev.embedding')}, 6) AS cosine
        FROM hshort c
        JOIN embeddings eq ON eq.vec_id = c.query_id
        JOIN embeddings ev ON ev.vec_id = c.vec_id),
    topk_rr AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM rr_scored)
        WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM topk_e GROUP BY query_id)
    {_sql_tier_recall('hamming', 'topk_h')}
    UNION ALL
    {_sql_tier_recall('hamming_rerank', 'topk_rr')}
    """,
)
def hamming_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of BOTH binary-quantization stages against the
    exact cosine baseline: 'hamming' prices ranking by the 1-bit code
    alone, 'hamming_rerank' prices the two-stage pipeline — the delta is
    what {HAMMING_RERANK_FACTOR}x-shortlist + exact re-rank buys back,
    and the gauge that sets the shortlist factor before shipping
    (ann_recall_report's sibling for the compression-first stack)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    exact = similarity_topk(spark, sf_dir).select("query_id", "vec_id")
    return _tier_recall(exact, "hamming", hamming_topk(emb)).unionByName(
        _tier_recall(exact, "hamming_rerank", hamming_rerank_topk(emb))
    )


# ===========================================================================
# LSH bucket-occupancy gauge: the SKEW diagnostic every bucket-join tier
# rides on. Candidate-pair volume is Σ_buckets c·(c-1)/2 per table, so a
# single hot bucket dominates cost (and wall-clock, since that bucket is
# one join partition until AQE splits it). This is the number that sets
# PLANES at a new corpus size — the knn_graph/ann_lsh docstrings state
# the rule (planes ~ log2(|V|/target_bucket)); this gauge MEASURES the
# outcome per table for both geometry profiles in one report.


def lsh_bucket_stats_frame(
    emb: DataFrame, planes: int, tables: int, profile: str,
    bucket_fn=lsh_buckets,
) -> DataFrame:
    """Per-table occupancy rollup of one geometry: bucket count, max
    occupancy, Σc² and candidate-pair volume Σ c·(c-1)/2 (exact BIGINTs;
    c·(c-1) is even so the halving division is lossless). bucket_fn
    follows knn_graph_edges' convention so each profile is priced on
    the derivation its consumers actually run."""
    per = (
        bucket_fn(emb, planes, tables)
        .groupBy("table_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per.groupBy("table_idx").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").cast("bigint").alias("max_bucket"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias("cand_pairs"),
        F.sum("c").cast("bigint").alias("n_vectors"),
    ).select(
        F.lit(profile).alias("profile"),
        "table_idx",
        "n_buckets",
        "max_bucket",
        "sum_sq",
        "cand_pairs",
        "n_vectors",
    )


def _sql_bucket_stats(src: str, profile: str) -> str:
    return f"""
    SELECT '{profile}' AS profile, table_idx,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(c) AS BIGINT) AS max_bucket,
           CAST(sum(c * c) AS BIGINT) AS sum_sq,
           CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs,
           CAST(sum(c) AS BIGINT) AS n_vectors
    FROM (SELECT table_idx, bucket, CAST(count(*) AS BIGINT) AS c
          FROM {src} GROUP BY table_idx, bucket)
    GROUP BY table_idx"""


@register(
    "lsh_bucket_stats",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SCALED_BUCKETS_CTE},
    {_sql_dyn_buckets_cte(SCALED_LSH_TABLES, 'dy')}
    {_sql_bucket_stats('buckets', 'demo')}
    UNION ALL
    {_sql_bucket_stats('sbuckets', 'scaled')}
    UNION ALL
    {_sql_bucket_stats('dybuckets', 'dyn')}
    """,
)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy report for all THREE LSH geometry profiles
    (demo, static scaled, and the graph tier's DYNAMIC-plane geometry —
    the row that shows occupancy pinned in ({LSH_TARGET_BUCKET}/2,
    {LSH_TARGET_BUCKET}] at any corpus size), per table:
    bucket count, max occupancy, Σc², and the candidate-pair volume
    Σ c·(c-1)/2 that IS the cost of every bucket-join consumer
    (similarity_ann_lsh, knn_graph, dedup_embedding). The production
    tuning loop reads this before touching PLANES: if max_bucket rides
    far above |V|/2^planes, the corpus has a dense direction and needs
    more planes (or salting) — key_skew_report's sibling for the vector
    tiers, and the gauge that catches degeneration toward all-pairs
    BEFORE a 100 TB knn_graph run is launched, not after.

    Plan shape: one bucket derivation per profile (the embedding read
    once per profile, planes evaluated in a single projection), a
    (table, bucket) partial-agg shuffle, then a |tables|-row rollup —
    strictly cheaper than any consumer it prices."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return lsh_bucket_stats_frame(
        emb, LSH_PLANES, LSH_TABLES, "demo"
    ).unionByName(
        lsh_bucket_stats_frame(
            emb, SCALED_LSH_PLANES, SCALED_LSH_TABLES, "scaled"
        )
    ).unionByName(
        lsh_bucket_stats_frame(
            emb,
            lsh_planes_for(emb.count()),
            SCALED_LSH_TABLES,
            "dyn",
            bucket_fn=lsh_buckets_np,
        )
    )


# ===========================================================================
# Semantic clusters over the k-NN graph: the graph-based-curation consumer
# the knn_graph docstring promises (near-dup cluster discovery / diversity
# bucketing). Min-label propagation, KNN_CLUSTER_ITERS synchronous rounds
# unrolled into ONE Catalyst plan (the pagerank_transitions discipline —
# no driver loop, no collect): after L rounds every node holds the min
# vec_id within graph distance L, so tight semantic clusters (diameter
# <= L) collapse to one id. dedup_cluster is the CONVERGED component
# answer for near-dup pairs; this is the fixed-depth, fixed-cost variant
# an iteration-bounded production pass ships (cost = L x |edges| shuffle).
KNN_CLUSTER_ITERS = 3


def knn_cluster_labels(emb: DataFrame, edges: DataFrame) -> DataFrame:
    """(vec_id, cluster_id) after {KNN_CLUSTER_ITERS} min-label rounds
    over the symmetrized edge set; isolated vectors keep their own id."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = emb.select("vec_id", F.col("vec_id").alias("cluster_id"))
    for _ in range(KNN_CLUSTER_ITERS):
        nbr = (
            sym.join(
                labels.select(
                    F.col("vec_id").alias("dst"), F.col("cluster_id").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nmin"))
        )
        labels = (
            labels.join(nbr, labels.vec_id == nbr.src, "left")
            .select(
                "vec_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
    return labels


def _sql_knn_clusters(graph: str = "graph_g") -> str:
    ctes = [
        f"""
    kc_sym AS MATERIALIZED (
        SELECT src, dst FROM {graph}
        UNION SELECT dst AS src, src AS dst FROM {graph}),
    kc_l0 AS (SELECT vec_id, vec_id AS cluster_id FROM embeddings)"""
    ]
    for i in range(1, KNN_CLUSTER_ITERS + 1):
        ctes.append(f"""
    kc_n{i} AS (
        SELECT s.src, min(l.cluster_id) AS nmin
        FROM kc_sym s JOIN kc_l{i - 1} l ON l.vec_id = s.dst
        GROUP BY s.src),
    kc_l{i} AS (
        SELECT l.vec_id,
               least(l.cluster_id, coalesce(n.nmin, l.cluster_id)) AS cluster_id
        FROM kc_l{i - 1} l LEFT JOIN kc_n{i} n ON n.src = l.vec_id)""")
    return ",".join(ctes)


@register(
    "knn_graph_clusters",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_knn_clusters()}
    SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id
    FROM kc_l{KNN_CLUSTER_ITERS}
    """,
)
def knn_graph_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster labels from the k-NN graph: {KNN_CLUSTER_ITERS}
    unrolled min-label rounds over the symmetrized knn_graph edge set —
    every vector ends holding the minimum vec_id within graph distance
    {KNN_CLUSTER_ITERS}, so tight semantic neighborhoods (the clusters
    graph-based curation samples across) share one label while isolated
    vectors keep their own. Fixed depth = fixed cost: each round is one
    |edges|-row join + a dst-keyed partial-agg min and one label join —
    the iteration-bounded production shape (dedup_cluster's driver loop
    is the run-to-convergence complement; at 100 TB you budget rounds,
    not fixpoints). All-integer labels — bit-identical across engines.
    tests/test_knn_clusters.py pins planted-pair co-labeling and the
    distance-{KNN_CLUSTER_ITERS} reach law on a constructed chain."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    edges = knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    return knn_cluster_labels(emb, edges)


@register(
    "knn_graph_clusters_scaled",
    oracle=f"""
    WITH {_SQL_SDYN_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('s', KNN_GRAPH_SCALED_K)},
    {_sql_knn_clusters('graph_sg')}
    SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id
    FROM kc_l{KNN_CLUSTER_ITERS}
    """,
)
def knn_graph_clusters_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_graph_clusters under the PRODUCTION graph: dynamic planes
    (lsh_planes_for x {SCALED_LSH_TABLES} tables — the pinned-occupancy
    law) at curation-grade k={KNN_GRAPH_SCALED_K} — the registration the
    planted co-label test (tests/test_knn_clusters.py) already exercises
    frame-level, so the demo and production profiles both carry oracle
    rows (the dedup_minhash_lsh / _scaled pairing applied to the graph
    consumer). Same fixed-depth min-label plan; only the edge profile
    differs."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn_cluster_labels(emb, knn_graph_edges_scaled(emb))


# ---------------------------------------------------------------------------
# Label propagation over the k-NN graph: semi-supervised labeling — the
# third graph consumer (min-label finds CONNECTIVITY, this finds weighted
# CONSENSUS: a node between two clusters takes the majority side, where
# min-label would collapse both to one id).
LP_SEED_MOD = 5   # vec_id % 5 == 0 are the labeled seeds (20%)
LP_ITERS = 3


def _sql_label_prop(graph: str = "graph_g") -> str:
    ctes = [
        f"""
    lp_sym AS MATERIALIZED (
        SELECT src, dst FROM {graph}
        UNION SELECT dst AS src, src AS dst FROM {graph}),
    lp_l0 AS (SELECT vec_id,
                     CASE WHEN vec_id % {LP_SEED_MOD} = 0 THEN label END AS lab,
                     label AS tl
              FROM embeddings)"""
    ]
    for i in range(1, LP_ITERS + 1):
        ctes.append(f"""
    lp_v{i} AS (
        SELECT s.src, l.lab AS nl, CAST(count(*) AS BIGINT) AS c
        FROM lp_sym s JOIN lp_l{i - 1} l ON l.vec_id = s.dst
        WHERE l.lab IS NOT NULL
        GROUP BY s.src, l.lab),
    lp_b{i} AS (
        SELECT src, nl FROM (
            SELECT src, nl,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY c DESC, nl) AS rn
            FROM lp_v{i})
        WHERE rn = 1),
    lp_l{i} AS MATERIALIZED (
        SELECT l.vec_id,
               CASE WHEN l.vec_id % {LP_SEED_MOD} = 0 THEN l.lab
                    ELSE coalesce(b.nl, l.lab) END AS lab,
               l.tl
        FROM lp_l{i - 1} l LEFT JOIN lp_b{i} b ON b.src = l.vec_id)""")
    return ",".join(ctes)


@register(
    "knn_label_propagation",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_label_prop()}
    SELECT vec_id,
           (vec_id % {LP_SEED_MOD} = 0) AS seeded,
           CAST(lab AS INT) AS label_prop,
           tl AS label_true,
           (lab = tl) AS is_correct
    FROM lp_l{LP_ITERS}
    """,
)
def knn_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised LABEL PROPAGATION over the k-NN graph (Zhu &
    Ghahramani 2002 / Raghavan et al. 2007, synchronous variant): 20% of
    vectors keep their true label as clamped seeds; for {LP_ITERS}
    unrolled rounds every other vector takes the MAJORITY label among
    its labeled neighbors (ties to the smallest label — integer-
    deterministic), keeping its previous state when no neighbor is
    labeled yet. The curation use: propagate expensive labels (human
    quality ratings, audited domains) from a small labeled slice across
    the whole corpus via embedding neighborhoods. Distinct from
    knn_graph_clusters (min-label = pure connectivity: one bridge edge
    merges two clusters; majority vote does not) and knn_label (direct
    vote among exact neighbors of 5 queries; this propagates
    transitively corpus-wide over the LSH-built graph).

    Card carries seeded / propagated label / true label / is_correct,
    so the output doubles as the accuracy report of the propagation.
    Shape per round: one |edges|-row join + a (src,label) map-side-
    combined vote count + an argmax struct-max + a label join — same
    fixed-depth budget discipline as knn_graph_clusters; labels are
    integers end to end, oracle rounds MATERIALIZED."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    edges = knn_graph_edges(
        emb.select("vec_id", "embedding"), LSH_PLANES, LSH_TABLES, KNN_GRAPH_K
    )
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    seeded = F.col("vec_id") % LP_SEED_MOD == 0
    labels = emb.select(
        "vec_id",
        F.when(seeded, F.col("label")).alias("lab"),
        F.col("label").alias("tl"),
    )
    for _ in range(LP_ITERS):
        votes = (
            sym.join(
                labels.filter(F.col("lab").isNotNull()).select(
                    F.col("vec_id").alias("dst"), F.col("lab").alias("nl")
                ),
                "dst",
            )
            .groupBy("src", "nl")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        best = votes.groupBy("src").agg(
            F.max(F.struct(F.col("c"), (-F.col("nl")).alias("neg"))).alias("b")
        ).select("src", (-F.col("b.neg")).cast("int").alias("bl"))
        labels = labels.join(
            best, labels.vec_id == best.src, "left"
        ).select(
            "vec_id",
            F.when(seeded, F.col("lab"))
            .otherwise(F.coalesce(F.col("bl"), F.col("lab")))
            .alias("lab"),
            "tl",
        )
    return labels.select(
        "vec_id",
        seeded.alias("seeded"),
        F.col("lab").cast("int").alias("label_prop"),
        F.col("tl").alias("label_true"),
        (F.col("lab") == F.col("tl")).alias("is_correct"),
    )


# ---------------------------------------------------------------------------
# Triangle census of the mutual k-NN graph: transitivity is the standard
# density probe of a neighbor graph (a vector whose neighbors are also
# neighbors of EACH OTHER sits inside a tight semantic clump — redundancy
# a curation pass down-samples; a triangle-free vector is a bridge/outlier
# worth keeping). Mutual edges (both directions ranked) make the graph
# undirected and robust to one-sided hub attraction.


def mutual_knn_edges(edges: DataFrame) -> DataFrame:
    """(u, v) with u < v where BOTH (u->v) and (v->u) appear in the
    directed k-NN edge frame — one self-equi-join on the reversed key."""
    a = edges.select("src", "dst")
    b = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        a.join(b, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )


def _sql_knn_triangles(graph: str = "graph_g") -> str:
    """CTE chain ed/deg/tric/pertri over a knn-graph CTE: mutual
    undirected edges, per-vertex degree, the ordered-triple triangle
    join, and per-vertex triangle counts."""
    return f"""
    ed AS (
        SELECT DISTINCT a.src AS u, a.dst AS v
        FROM {graph} a JOIN {graph} b
          ON b.src = a.dst AND b.dst = a.src
        WHERE a.src < a.dst),
    deg AS (
        SELECT vid, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT u AS vid FROM ed UNION ALL SELECT v AS vid FROM ed)
        GROUP BY vid),
    tric AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM ed e1
        JOIN ed e2 ON e2.u = e1.v
        JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
    pertri AS (
        SELECT vid, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT a AS vid FROM tric
            UNION ALL SELECT b AS vid FROM tric
            UNION ALL SELECT c AS vid FROM tric)
        GROUP BY vid)"""


@register(
    "knn_graph_triangles",
    oracle=f"""
    WITH {_SQL_BUCKETS_CTE},
    {_SQL_SIGN_CTES},
    {_sql_knn_graph('', KNN_GRAPH_K)},
    {_sql_knn_triangles()}
    SELECT d.vid AS vec_id, d.degree,
           coalesce(p.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN round(CAST(2 * coalesce(p.n_triangles, 0) AS DOUBLE)
                           / (d.degree * (d.degree - 1)), 6)
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN pertri p ON p.vid = d.vid
    """,
)
def knn_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle census + local clustering coefficient of the
    MUTUAL k-NN graph (Watts-Strogatz transitivity over the
    graph-curation artifact): mutual edges from one reversed-key
    self-join, triangles from the ordered-triple join e(a,b) ⋈ e(b,c) ⋈
    e(a,c) with a<b<c (each triangle materializes exactly once), degree
    and per-vertex counts from key rollups. Coefficient =
    2T/(deg·(deg-1)), rounded 6dp from exact integers — engine-stable.

    Scale shape: mutual edges are <= |V|·k rows, every join is a key
    equi-join on vertex ids, and the triple join's fan-out is bounded by
    the true triangle count (the ordered a<b<c form never enumerates a
    wedge twice) — at 100 TB this is the cheap follow-up pass over the
    already-built graph, not a new neighbor search."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ed = mutual_knn_edges(
        knn_graph_edges(emb, LSH_PLANES, LSH_TABLES, KNN_GRAPH_K)
    ).localCheckpoint(eager=True)
    return triangle_census(ed)


def triangle_census(ed: DataFrame) -> DataFrame:
    """(vec_id, degree, n_triangles, clustering_coeff) over an
    undirected (u, v) edge frame with u < v — the census body shared by
    the registered query and the planted-clique test
    (tests/test_knn_clusters.py)."""
    deg = (
        ed.select(F.col("u").alias("vid"))
        .unionByName(ed.select(F.col("v").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    e2 = ed.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = ed.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tric = (
        ed.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(e2, "b")
        .join(e3, ["a", "c"])
    )
    pertri = (
        tric.select(F.col("a").alias("vid"))
        .unionByName(tric.select(F.col("b").alias("vid")))
        .unionByName(tric.select(F.col("c").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            (2 * F.coalesce("n_triangles", F.lit(0))).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return deg.join(pertri, "vid", "left").select(
        F.col("vid").alias("vec_id"),
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        coeff.alias("clustering_coeff"),
    )


# ---------------------------------------------------------------------------
# Embedding-health card: per-dimension moments. The pre-flight check every
# vector tier above assumes silently: a dead dimension (all zeros / all one
# value) wastes PQ sub-space capacity, a scale-drifted dimension dominates
# every unnormalized distance, and both are invisible until recall craters.


@register(
    "embedding_dim_stats",
    oracle="""
    WITH ex AS (
        SELECT i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    q AS (
        SELECT pos,
               CAST(count(*) AS BIGINT) AS n,
               SUM(CAST(floor(x * 1000000.0) AS BIGINT)) AS s,
               SUM(CAST(floor(x * 1000000.0) AS BIGINT)
                   * CAST(floor(x * 1000000.0) AS BIGINT)) AS ss,
               min(x) AS vmin, max(x) AS vmax,
               CAST(sum(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_zero
        FROM ex GROUP BY pos)
    SELECT CAST(pos AS BIGINT) AS pos, n,
           round(CAST(s AS DOUBLE) / n / 1000000.0, 6) AS mean,
           round(sqrt(greatest(
               CAST(ss AS DOUBLE) / n
               - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
               0.0)) / 1000000.0, 6) AS std,
           round(vmin, 6) AS vmin, round(vmax, 6) AS vmax, n_zero
    FROM q ORDER BY pos
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION moments of the embedding table: mean, std, min/max
    and exact-zero count for each of the {EMB_DIM} coordinates — the
    embedding-health card run before building any index (dead dims waste
    PQ sub-spaces; scale drift breaks unnormalized metrics; a std near 0
    flags a collapsed encoder). Mean and std derive from exact integer
    micro-unit sums (s, ss are BIGINT — order-independent at any
    parallelism), finished by one deterministic IEEE chain both engines
    share; min/max are exact float comparisons.

    Plan shape: one posexplode pass, {EMB_DIM} groups, every aggregate
    partial-combines map-side — at 100 TB the shuffle carries
    {EMB_DIM} x n_partitions partial rows, nothing vector-sized."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "xf")).select(
        "pos", F.col("xf").cast("double").alias("x")
    )
    u = F.floor(F.col("x") * 1e6).cast("bigint")
    q = ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(u).alias("s"),
        F.sum(u * u).alias("ss"),
        F.min("x").alias("vmin"),
        F.max("x").alias("vmax"),
        F.sum(F.when(F.col("x") == 0.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )
    mean_d = F.col("s").cast("double") / F.col("n")
    return q.select(
        F.col("pos").cast("bigint").alias("pos"),
        "n",
        F.round(mean_d / 1e6, 6).alias("mean"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.col("ss").cast("double") / F.col("n") - mean_d * mean_d,
                    F.lit(0.0),
                )
            )
            / 1e6,
            6,
        ).alias("std"),
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
        "n_zero",
    ).orderBy("pos")
