"""Invariants for the composed curation pipeline (operators/curation.py).

The DuckDB value-hash is the driver's gate; these pin what a user of the
curated corpus relies on: the gate threshold is honored, the manifest is
duplicate-free, and the rollup is exactly the manifest aggregated.
"""

from __future__ import annotations

import pyspark.sql.functions as F

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
