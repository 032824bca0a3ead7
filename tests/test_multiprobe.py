"""Multi-probe LSH (Lv et al. 2007): the query-side recall lever.

Three contracts, all structural rather than corpus-luck:

* Superset: multi-probe candidates CONTAIN the single-probe candidates
  of the same index (the base bucket is always probed), so per-query
  recall is monotonically >= single-probe's. Asserted set-wise on the
  driver testdata.
* The probes are real perturbations: every probe bucket differs from
  the base bucket in exactly one bit, and there are exactly
  1 + MP_PROBES distinct probes per (query, table).
* Plan shape: the candidate join stays a broadcast (table, bucket)
  equi-join — no cartesian, corpus bucketed once.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_spark.operators.similarity import (
    LSH_PLANES,
    MP_PROBES,
    MP_TABLES,
    N_QUERIES,
    lsh_buckets,
    lsh_multiprobe_candidates,
)
from mapreduce_spark.plans import audit
from mapreduce_spark.sources.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_multiprobe_candidates_superset_of_single_probe(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    buckets = lsh_buckets(emb, LSH_PLANES, MP_TABLES)
    qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_idx", "bucket"
    )
    single = (
        qb.join(buckets, ["table_idx", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    multi = lsh_multiprobe_candidates(emb, LSH_PLANES, MP_TABLES, MP_PROBES)
    missing = single.join(multi, ["query_id", "vec_id"], "left_anti")
    assert missing.count() == 0
    # and it genuinely widens the net on this corpus
    assert multi.count() > single.count()


def test_multiprobe_probe_rows_exploded(spark, sf_dir):
    """The exploded probe frame: 1 + MP_PROBES rows per (query, table),
    all distinct, all within Hamming distance 1 of the base."""
    from mapreduce_spark.operators.similarity import (
        _lsh_dots,
        _pack_sign_bucket,
    )

    emb = _emb(spark, sf_dir)
    qd = _lsh_dots(emb.filter(F.col("vec_id") < N_QUERIES), LSH_PLANES, MP_TABLES)
    margins = F.array_sort(
        F.array(*[
            F.struct(
                F.abs(F.col(f"_d{p}")).alias("m"),
                F.lit(p).alias("p"),
                F.lit(1 << p).cast("bigint").alias("bit"),
            )
            for p in range(LSH_PLANES)
        ])
    )
    probes = F.concat(
        F.array(F.col("base")),
        F.transform(
            F.slice(F.col("ms"), 1, MP_PROBES),
            lambda s: F.col("base").bitwiseXOR(s["bit"]),
        ),
    )
    rows = (
        qd.select(
            F.col("vec_id").alias("query_id"),
            "table_idx",
            _pack_sign_bucket(LSH_PLANES).alias("base"),
            margins.alias("ms"),
        )
        .select("query_id", "table_idx", "base", probes.alias("probes"))
        .collect()
    )
    assert rows, "query probe frame is empty"
    for r in rows:
        ps = r["probes"]
        assert len(ps) == 1 + MP_PROBES
        assert len(set(ps)) == 1 + MP_PROBES
        assert ps[0] == r["base"]
        for p in ps[1:]:
            diff = p ^ r["base"]
            assert diff != 0 and (diff & (diff - 1)) == 0  # one bit


def test_multiprobe_recall_monotone(spark, sf_dir):
    from mapreduce_spark.registry import get_queries

    rep = get_queries()["multiprobe_recall_report"](spark, sf_dir)
    rows = {(r["tier"], r["query_id"]): r["recall"] for r in rep.collect()}
    for (tier, qid), rec in rows.items():
        if tier == "lsh_t1_multiprobe":
            assert rec >= rows[("lsh_t1_single", qid)]


def test_multiprobe_plan_is_broadcast_equi_join(spark, sf_dir):
    df = lsh_multiprobe_candidates(
        _emb(spark, sf_dir), LSH_PLANES, MP_TABLES, MP_PROBES
    )
    assert not audit.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --- production geometry: the memory-for-probes trade, measured -------------
# The planted corpus from tests/test_ann_scaled.py: planted partners at
# cosines 0.70..0.82 in ambient noise, where recall is pure band
# geometry. The 2007 paper's claim is that multi-probe at T tables
# matches single-probe at several-x T tables; here 8 tables + 3 probes
# measures 0.99 vs 32 single-probed tables' 0.98 — same recall, 1/4 the
# index memory and corpus-side derivation bill.
import numpy as np

from mapreduce_spark.operators.similarity import (
    SCALED_LSH_PLANES,
    SCALED_LSH_TABLES,
    TOP_K,
    _rank_topk,
    _score_pairs,
    ann_lsh_topk,
)

_MP_DIM = 64
_MP_PAIRS = 100
_MP_PARTNER = 1000
_MP_NOISE_BASE = 2000
_MP_NOISE = 150


def _planted_pairs(spark):
    rng = np.random.RandomState(7)

    def unit(v):
        return v / np.linalg.norm(v)

    ids, vecs, truth = [], [], {}
    for i in range(_MP_PAIRS):
        c = 0.70 + 0.12 * i / (_MP_PAIRS - 1)
        u = unit(rng.randn(_MP_DIM))
        w = rng.randn(_MP_DIM)
        w = unit(w - w.dot(u) * u)
        ids += [i, _MP_PARTNER + i]
        vecs += [u, c * u + np.sqrt(1 - c * c) * w]
        truth[i] = _MP_PARTNER + i
    for j in range(_MP_NOISE):
        ids.append(_MP_NOISE_BASE + j)
        vecs.append(unit(rng.randn(_MP_DIM)))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    return df, truth


def _recall(df, truth, topk_df) -> float:
    got = {(r["query_id"], r["vec_id"]) for r in topk_df.collect()}
    return sum(1 for q, p in truth.items() if (q, p) in got) / len(truth)


def test_multiprobe_matches_4x_tables_on_planted_corpus(spark):
    df, truth = _planted_pairs(spark)
    sp8 = _recall(
        df, truth,
        ann_lsh_topk(df, SCALED_LSH_PLANES, 8, k=TOP_K, n_queries=_MP_PAIRS),
    )
    sp32 = _recall(
        df, truth,
        ann_lsh_topk(
            df, SCALED_LSH_PLANES, SCALED_LSH_TABLES, k=TOP_K,
            n_queries=_MP_PAIRS,
        ),
    )
    cand = lsh_multiprobe_candidates(
        df, SCALED_LSH_PLANES, 8, MP_PROBES, n_queries=_MP_PAIRS
    )
    mp8 = _recall(df, truth, _rank_topk(_score_pairs(df, cand), TOP_K))
    # the probes close a real gap (8 single-probed tables miss badly)...
    assert sp8 < 0.9, f"single-probe t8 recall {sp8:.3f} not in the gap band"
    # ...to production-contract recall at 1/4 the index of the 32-table
    # tier (measured 0.99 vs 0.98; both asserted with slack)
    assert mp8 >= 0.9, f"multi-probe t8 recall {mp8:.3f} < 0.9"
    assert mp8 >= sp32 - 0.05, f"mp t8 {mp8:.3f} << sp t32 {sp32:.3f}"
