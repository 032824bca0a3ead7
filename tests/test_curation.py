"""Invariants for the composed curation pipeline (operators/curation.py).

The DuckDB value-hash is the driver's gate; these pin what a user of the
curated corpus relies on: the gate threshold is honored, the manifest is
duplicate-free, and the rollup is exactly the manifest aggregated.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_spark.operators import curation as C
from mapreduce_spark.registry import get_queries
from mapreduce_spark.sources.tables import load_table


def test_manifest_honors_gate_and_dedup(spark, sf_dir):
    qs = get_queries()
    rows = qs["curation_manifest"](spark, sf_dir).collect()
    assert rows, "curated corpus should be non-empty"
    total_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) < total_docs  # the gate actually curates
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # keeper selection is unique
    for r in rows:
        assert r["quality"] >= C.QUALITY_THRESHOLD
        assert r["n_tokens"] >= C.MIN_TOKENS


def test_rollup_is_manifest_aggregated(spark, sf_dir):
    qs = get_queries()
    manifest = qs["curation_manifest"](spark, sf_dir)
    rollup = {r["source"]: r for r in qs["curation_pipeline"](spark, sf_dir).collect()}
    recomputed = (
        manifest.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .collect()
    )
    assert {r["source"] for r in recomputed} == set(rollup)
    for r in recomputed:
        assert rollup[r["source"]]["n_docs"] == r["n_docs"]
        assert rollup[r["source"]]["total_tokens"] == r["total_tokens"]


def test_pipeline_single_plan_shuffle_budget(spark, sf_dir):
    # scrub+score+gate must fuse into the scan stage: the whole pipeline
    # is the dedup groupBy, its semi-join fold-back, the rollup, and the
    # declared output order — nothing else may introduce an exchange.
    from mapreduce_spark.plans import audit

    df = get_queries()["curation_pipeline"](spark, sf_dir)
    assert audit.exchange_count(df) <= 4, audit.simple_plan(df)


def test_mix_upweights_rare_sources(spark, sf_dir):
    # alpha=0.5 smoothing: a rarer source keeps a HIGHER fraction of its
    # docs than a common one, total lands near the target fraction, and
    # membership is a pure function of doc_id (deterministic re-run).
    qs = get_queries()
    sampled = qs["mix_weighted_sample"](spark, sf_dir)
    rates = {
        r["source"]: r["rate_micro"]
        for r in sampled.select("source", "rate_micro").distinct().collect()
    }
    counts = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rates) <= set(counts)
    for s, rate in rates.items():
        assert 0 < rate <= C.MIX_HASH_MOD
    if len(counts) > 1:
        rare = min(counts, key=counts.get)
        common = max(counts, key=counts.get)
        if counts[rare] < counts[common]:  # strict skew exists
            assert rates[rare] >= rates[common]
    total = sum(counts.values())
    n_sampled = sampled.count()
    assert 0.3 * total <= n_sampled <= 0.7 * total  # near the 0.5 target
    assert n_sampled == qs["mix_weighted_sample"](spark, sf_dir).count()


def test_global_shuffle_is_a_sharded_permutation(spark, sf_dir):
    # every doc appears exactly once; positions are dense 1..n per shard;
    # the permutation actually decorrelates ids (not the identity order).
    rows = get_queries()["global_shuffle"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == total
    assert len({r["doc_id"] for r in rows}) == total
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["shard"] < C.SHUFFLE_SHARDS
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, members in by_shard.items():
        assert sorted(m["pos"] for m in members) == list(range(1, len(members) + 1))
    shard0 = sorted(by_shard[0], key=lambda r: r["pos"])
    assert [r["doc_id"] for r in shard0] != sorted(r["doc_id"] for r in shard0)


def test_pack_bins_follow_prefix_sum_definition(spark, sf_dir):
    # A doc joins bin floor(tokens_before / budget), so replaying each
    # source's bins in order must reproduce every bin id from the running
    # fill — the exact first-fit-sequential contract (bins can under-fill
    # only when a straddling doc pushed the next doc over the line).
    rows = get_queries()["pack_sequences"](spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin_id"])
        assert bins[0]["bin_id"] == 0, source
        fill = 0
        for b in bins:
            assert b["n_docs"] >= 1
            assert b["bin_tokens"] >= 1
            assert fill // C.PACK_BUDGET == b["bin_id"], (source, fill, b)
            fill += b["bin_tokens"]


def test_curation_neardup_drops_one_token_edits(spark, tmp_path):
    """A one-token edit of a kept doc survives EXACT dedup but must be
    dropped by the near-dup pipeline (min-id domination); the edited copy
    has the larger doc_id, so the original is the keeper."""
    from mapreduce_spark.registry import get_queries

    base = (
        "the quick brown fox jumps over the lazy dog while many other "
        "common words fill this document with enough tokens to pass the "
        "quality gate easily today"
    )
    edited = base.replace("lazy", "sleepy")
    spark.createDataFrame(
        [
            (0, "en", base, "srcA"),
            (7, "en", edited, "srcA"),  # near-dup, larger id -> dominated
            (3, "en", "an unrelated document about spark shuffle plans "
                      "and catalyst optimizer internals with plenty of "
                      "distinct vocabulary to stay above the gate", "srcB"),
        ],
        "doc_id long, lang string, text string, source string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    qs = get_queries()
    nd = {r["source"]: r["n_docs"] for r in
          qs["curation_pipeline_neardup"](spark, str(tmp_path)).collect()}
    exact = {r["source"]: r["n_docs"] for r in
             qs["curation_pipeline"](spark, str(tmp_path)).collect()}
    assert exact["srcA"] == 2  # exact dedup keeps both variants
    assert nd["srcA"] == 1     # near-dup pipeline drops the edit
    assert nd["srcB"] == exact["srcB"] == 1


def test_filter_agreement_cells_reconcile_with_both_gates(spark, sf_dir):
    """The confusion matrix partitions the scored corpus, and each cell's
    count matches an independent recompute from the two gate queries."""
    qs = get_queries()
    rows = qs["filter_agreement_report"](spark, sf_dir).collect()
    cells = {(r["quality_keep"], r["gopher_keep"]): r["n_docs"] for r in rows}
    q_keep = {
        r["doc_id"]: r["quality"] >= C.QUALITY_THRESHOLD
        for r in qs["quality_score"](spark, sf_dir).collect()
    }
    g_keep = {
        r["doc_id"]: r["keep"] for r in qs["gopher_rules"](spark, sf_dir).collect()
    }
    assert set(q_keep) == set(g_keep)  # same zero-token drop rule
    expect: dict[tuple[bool, bool], int] = {}
    for d, qk in q_keep.items():
        expect[(qk, g_keep[d])] = expect.get((qk, g_keep[d]), 0) + 1
    assert cells == expect
    assert sum(cells.values()) == len(q_keep)


def test_export_jsonl_shards_roundtrip_and_layout(spark):
    """The manifest's totals must equal the in-memory kept corpus (the
    files ARE the corpus), the layout must be one directory per shard
    with real JSON lines, and a re-export is idempotent (content-stable
    shard assignment -> identical digests)."""
    import glob
    import json

    from mapreduce_spark.operators.curation import (
        EXPORT_SHARDS,
        _export_path,
        _kept,
    )
    from mapreduce_spark.registry import get_queries

    sf = "/root/testdata/sf0.001"
    q = get_queries()["export_jsonl_shards"]
    m1 = {r.shard: r for r in q(spark, sf).collect()}
    kept = _kept(spark, sf).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert sum(r.n_docs for r in m1.values()) == kept.n
    assert sum(r.total_tokens for r in m1.values()) == kept.t
    assert set(m1) <= set(range(EXPORT_SHARDS))
    # operators hand out warehouse URIs (Hadoop-FS-safe); the test's
    # layout inspection is deliberately local, so strip the scheme
    from urllib.parse import urlparse

    path = urlparse(_export_path(spark)).path
    dirs = sorted(glob.glob(f"{path}/shard=*"))
    assert len(dirs) == len(m1)
    files = glob.glob(f"{dirs[0]}/part-*.json")
    assert files
    with open(files[0]) as fh:
        line = json.loads(fh.readline())
    assert {"doc_id", "source", "n_tokens", "quality", "text"} <= set(line)
    # idempotent: same corpus -> same manifest, digests included
    m2 = {r.shard: r for r in q(spark, sf).collect()}
    assert {k: (v.n_docs, v.content_digest) for k, v in m1.items()} == {
        k: (v.n_docs, v.content_digest) for k, v in m2.items()
    }


def test_stream_export_gate_dedups_across_batches_via_the_sink(spark, tmp_path, monkeypatch):
    """A duplicate pair SPLIT ACROSS micro-batches (doc 1 in batch 1,
    its identical copy doc 3 in batch 2) admits exactly the first: the
    second batch's probe finds the digest in the files batch 1 wrote.
    Within-batch duplicates elect one keeper. The planted corpus makes
    every doc pass the quality gate."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    rows = [
        (1, "src", base),                      # batch 1 (doc_id % 4 == 1)
        (5, "src", base + " unique five"),     # batch 1, distinct
        (3, "src", base),                      # batch 2: exact copy of 1
        (7, "src", base + " unique seven"),    # batch 2, distinct
        (11, "src", base + " unique seven"),   # batch 2: in-batch dup of 7
    ]
    df = spark.createDataFrame(
        [(i, t, s, len(t)) for i, s, t in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from mapreduce_spark.registry import get_queries

    out = get_queries()["stream_export_gate"](spark, str(tmp_path)).collect()
    got = {(r.doc_id, r.batch_idx) for r in out}
    assert got == {(1, 1), (5, 1), (7, 2)}


def test_stratified_sampling_is_partitioning_independent(spark):
    """sample_stratified's edge over a seeded sampleBy: membership is a
    pure function of the row (content hash vs per-stratum rate), so any
    repartitioning — or task retry — yields the IDENTICAL sample, where
    sampleBy's per-partition RNG silently changes composition with the
    input split; per-stratum yield tracks its rate."""
    from collections import Counter

    import mapreduce_spark.operators.relational as rel
    from mapreduce_spark.operators.relational import sample_stratified
    from mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    base = sorted(map(tuple, sample_stratified(spark, sf).collect()))

    orig = rel.load_table
    try:
        rel.load_table = lambda s, d, n: orig(s, d, n).repartition(
            16, "l_returnflag"
        )
        reparted = sorted(map(tuple, sample_stratified(spark, sf).collect()))
    finally:
        rel.load_table = orig
    assert base == reparted

    total = Counter()
    for r in (
        load_table(spark, sf, "lineitem").select("l_returnflag").collect()
    ):
        total[r["l_returnflag"]] += 1
    kept = Counter(row[0] for row in base)
    for flag, ppk in (("R", 50), ("N", 100), ("A", 200)):
        if total[flag] == 0:
            continue
        rate = kept[flag] / total[flag]
        assert abs(rate - ppk / 1000) < 0.15, (flag, rate, ppk)


@pytest.fixture(scope="module")
def leak_corpus_sf(spark, tmp_path_factory) -> str:
    """Planted split-leakage corpus: docs 1/2 are one-token-apart
    near-dups whose content-hash buckets land in train (36) and test
    (99) respectively — found by brute-forcing the suffix token against
    the same md5 bucket rule train_test_split uses. Doc 3 is unrelated."""
    root = tmp_path_factory.mktemp("leak_corpus")
    base = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "brew strong coffee near the old stone bridge"
    )
    rows = [
        (1, f"{base} alpha0", "en", "web", 0),
        (2, f"{base} beta240", "en", "web", 0),
        (3, "completely different content about database engines and "
            "distributed shuffle partitioning strategies for analytics",
         "en", "web", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/documents.parquet")
    return str(root)


def test_split_leakage_report_planted_pair(spark, leak_corpus_sf):
    from mapreduce_spark.operators.curation import (
        split_leakage_report,
        train_test_split,
    )

    splits = {
        r.doc_id: r.split
        for r in train_test_split(spark, leak_corpus_sf).collect()
    }
    assert splits[1] == "train" and splits[2] == "test"
    out = split_leakage_report(spark, leak_corpus_sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert {r.split_a, r.split_b} == {"train", "test"}
    assert r.jaccard >= 0.5
