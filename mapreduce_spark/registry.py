"""Query registry: one entry per operator from SURVEY.md §2.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable plus
(optionally) the equivalent ANSI SQL a DuckDB oracle can run on the same
parquet tables. The driver's correctness gate compares both sides.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL (the comparison sorts columns by name).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Every name here MUST exist —
# a missing module is a real breakage, not something to except away.
_QUERY_MODULES = [
    "mapreduce_spark.operators.relational",
    "mapreduce_spark.operators.analytics",
    "mapreduce_spark.operators.tpch",
    "mapreduce_spark.operators.joins",
    "mapreduce_spark.operators.windows",
    "mapreduce_spark.operators.textops",
    "mapreduce_spark.operators.dedup",
    "mapreduce_spark.operators.curation",
    "mapreduce_spark.operators.graph",
    "mapreduce_spark.operators.similarity",
    "mapreduce_spark.operators.mr",
    "mapreduce_spark.operators.multimodal",
    "mapreduce_spark.streaming.events",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The correctness driver grades queries in dict order and only grades the
# first 50, so ordering IS the official record. This list pins the grading
# window to the SURVEY §2C core checklist (Q1-Q19) followed by the head of
# every LLM-pipeline family (dedup, similarity/ANN, text analysis,
# curation, graph, multimodal, TPC-H composites, streaming). Everything
# else follows in module-registration order.
#
# r7 rotation (VERDICT r6 #3): nine settled §2C slots rotated out —
# map_transform, groupby_multikey, distinct_rows, sort_global, join_anti,
# union_all, set_intersect, set_except, window_rank — every one holds an
# official PASS row in CORRECTNESS r1-r6 and stays pinned by the
# full-registry sweep + tests/test_exact_rows.py. In their place the six
# never-officially-graded r6 closers (span decontamination, colocated
# join, logreg gate, label propagation, streaming export gate,
# epoch-capped mixing) plus the round-7 additions (residual IVFPQ,
# z-order pruned scan, OPQ-rotated codes) carry official driver rows.
GRADING_PRIORITY = [
    # --- SURVEY §2C core checklist heads (rotated members keep their
    # r1-r6 official rows; see rotation note above)
    "scan_project", "filter_grep", "filter_predicate",
    "wordcount", "groupby_agg",
    "topk", "join_equi", "join_broadcast",
    "partition_by_hash", "agg_distinct", "pipe_exec",
    # --- deduplication family
    "dedup_exact", "dedup_minhash_lsh", "dedup_incremental",
    "dedup_embedding", "dedup_cluster",
    # --- similarity / ANN family
    "similarity_topk", "similarity_ann_lsh", "similarity_ann_ivf",
    "ann_recall_report",
    # --- text-analysis family
    "text_stats", "quality_score", "doc_chunk", "repetition_stats",
    "bm25_topk", "perplexity_bigram",
    # --- curation family
    "curation_pipeline", "train_test_split", "global_shuffle",
    # --- graph / multimodal / streaming flagships
    "pagerank_transitions", "multimodal_dedup", "multimodal_decode",
    "stream_window_counts",
    # --- TPC-H composite
    "tpch_q5_local_volume",
    # --- r6 lifecycle flagships (see rotation note above; asof_join and
    # range_join rotated out at close — both hold official r5 PASS rows
    # (CORRECTNESS_r05.json) and stay pinned by the full-registry sweep —
    # so the materialized-view lifecycle and the trained logreg filter
    # carry official rows too)
    "dedup_index_persisted", "similarity_index_persisted",
    "bpe_token_count", "export_jsonl_shards",
    "rollup_incremental_view", "quality_logreg_train",
    # --- r7 rotation: the six r6 closers that never held official rows
    "decontaminate_spans_scaled", "join_colocated", "quality_logreg_gate",
    "knn_label_propagation", "stream_export_gate", "mix_epoch_capped",
    # --- round-7 additions (registered this round; join_semi rotated
    # out alongside the nine above — official r1-r6 rows + sweep-pinned)
    "similarity_ivfpq_adc_residual", "zorder_pruned_scan",
    "ivfpq_residual_recall_report", "embedding_pq_codes_opq",
]


def _ordered(specs: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Priority window first, then the rest in registration order."""
    out = {n: specs[n] for n in GRADING_PRIORITY if n in specs}
    out.update((n, s) for n, s in specs.items() if n not in out)
    return out


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its queries register."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return _ordered(REGISTRY)


def get_queries() -> dict[str, QueryFn]:
    """Name -> (spark, sf_dir) -> DataFrame for every registered query."""
    return {name: spec.fn for name, spec in load_all().items()}


def get_oracles() -> dict[str, str]:
    """Name -> DuckDB oracle SQL (queries without one are rows-only)."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}
