"""End-to-end corpus curation: the composed training-data pipeline.

The individual stages each exist as their own audited operator
(textops.text_scrub / textops.quality_score / dedup.dedup_exact); this
module chains them into the single plan a real pretraining-data run
executes — scrub -> quality gate -> exact-dedup keeper -> corpus rollup
— so the whole pipeline is one Catalyst plan (filters fused into the
scan, one shuffle for the dedup, one for the final rollup) instead of
materialized hops between stages, which is how the reference would run
it (one MapReduce job per stage with intermediate files,
/root/reference/mapreduce/manager/__main__.py:257-300).

Engine-parity discipline: the quality gate compares the ROUNDED score on
both engines (one shared 6dp rounding, so the >= threshold can't flip on
a ulp); the rollup's mean quality is an exact DECIMAL(18,6) sum of those
rounded scores followed by a single IEEE division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduce_spark.functions.text import SQL_TOKENS, tokens
from mapreduce_spark.operators.textops import (
    STOPWORDS,
    _hits,
    _sql_hits,
    scrub_expr,
    sql_scrub,
)
from mapreduce_spark.registry import register
from mapreduce_spark.sources.tables import load_table

MIN_TOKENS = 5          # drop near-empty docs before scoring
QUALITY_THRESHOLD = 0.6  # corpus median — the gate keeps the better half

# Shared CTE chain: scrub -> tokenize -> score -> gate -> keeper.
# ``kept`` is the curated corpus both queries consume.
_SQL_KEPT_CTES = f"""
    WITH scrubbed AS (
        SELECT doc_id, source, {sql_scrub('text')} AS clean_text
        FROM documents),
    t AS (
        SELECT doc_id, source, clean_text,
               {SQL_TOKENS.format(col='clean_text')} AS toks
        FROM scrubbed),
    scored AS (
        SELECT doc_id, source, clean_text,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               round(0.4 * least(len(toks) / 100.0, 1.0)
                     + 0.4 * CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     + 0.2 * (1.0 - CAST({_sql_hits(STOPWORDS['en'])} AS DOUBLE)
                                    / len(toks)), 6) AS quality
        FROM t WHERE len(toks) >= {MIN_TOKENS}),
    gated AS (
        SELECT * FROM scored WHERE quality >= {QUALITY_THRESHOLD}),
    keeper AS (
        SELECT min(doc_id) AS doc_id FROM gated GROUP BY clean_text),
    kept AS (
        SELECT g.doc_id, g.source, g.n_tokens, g.quality
        FROM gated g JOIN keeper k ON g.doc_id = k.doc_id)
"""


def _kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus: scrubbed, quality-gated, exact-deduped docs."""
    docs = load_table(spark, sf_dir, "documents")
    clean = docs.select(
        "doc_id", "source", scrub_expr(F.col("text")).alias("clean_text")
    )
    toks = tokens(F.col("clean_text"))
    scored = clean.select(
        "doc_id",
        "source",
        "clean_text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            0.4 * F.least(F.size(toks) / 100.0, F.lit(1.0))
            + 0.4 * F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            + 0.2
            * (
                1.0
                - _hits(toks, STOPWORDS["en"]).cast("double") / F.size(toks)
            ),
            6,
        ).alias("quality"),
    ).filter(F.size(toks) >= MIN_TOKENS)
    gated = scored.filter(F.col("quality") >= QUALITY_THRESHOLD)
    keeper = gated.groupBy("clean_text").agg(F.min("doc_id").alias("doc_id"))
    return (
        gated.join(keeper.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "source", "n_tokens", "quality")
    )


@register(
    "curation_manifest",
    oracle=_SQL_KEPT_CTES
    + """
    SELECT doc_id, source, n_tokens, quality FROM kept
    """,
)
def curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document manifest of the curated corpus — the file list a
    training job consumes. One plan: the scrub + score + gate are
    per-row expressions fused into the scan stage; the exact-dedup
    keeper (min doc_id per identical clean text) is the only shuffle,
    and the keeper set folds back as a LEFT SEMI join on doc_id, so full
    text strings cross the wire once (inside the groupBy), never in the
    rejoin. At 100 TB the groupBy key would be a text digest rather than
    the text itself — dedup_exact already demonstrates that form."""
    return _kept(spark, sf_dir)


@register(
    "curation_pipeline",
    oracle=_SQL_KEPT_CTES
    + """
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
                / count(*) AS DOUBLE) AS mean_quality
    FROM kept
    GROUP BY source
    ORDER BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup after the full curation pipeline: per source, how
    many documents survived the quality gate + dedup and the token
    budget they contribute. The rollup output is |sources| rows, so the
    final exchange is a near-no-op; mean quality sums exact
    DECIMAL(18,6) then divides once (order-independent at any
    parallelism)."""
    kept = _kept(spark, sf_dir)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (
                F.sum(F.col("quality").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("mean_quality"),
        )
        .orderBy("source")
    )
