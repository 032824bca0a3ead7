"""Sink layer: scale-aware parquet writers.

Reference analog: the reference's only sink is a directory of per-reduce
text part files (/root/reference/mapreduce/worker/__main__.py:141-149) —
that exact contract lives in operators/mr.py run_dir_job. These writers
are the columnar upgrades a 100 TB deployment stores its tables with:

- partitioned layout -> partition pruning at read time (a filter on the
  partition key skips whole directories, verified in
  tests/test_plan_audits.py::test_partition_pruning_reaches_scan);
- bucketed layout -> co-located, shuffle-free joins on the bucket key
  (verified in tests/test_plan_audits.py::test_bucketed_join_needs_no_shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, *keys: str, mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet: one directory level per key value.

    Choose low-cardinality keys (date, region, status); a filter on them
    prunes partitions at plan time. High-cardinality keys would explode
    the directory count and produce millions of small files."""
    df.write.partitionBy(*keys).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table: rows are hash-routed
    to ``buckets`` files by ``key`` at WRITE time, so two tables bucketed
    the same way join with ZERO shuffle — the payoff compounds for every
    subsequent co-keyed join or aggregation. Size buckets so one bucket
    of the largest table fits an executor core's working memory."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode(mode).saveAsTable(table)
