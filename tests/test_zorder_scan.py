"""Z-order pruned scan: the layout must ACTUALLY skip files.

zorder_layout reports Morton bounding boxes; zorder_pruned_scan writes
the real partitioned layout and answers a range predicate through it.
These tests pin the part the oracle can't see: the scan plan carries a
PartitionFilter on the Morton cell, the executed scan reads <= 1/4 of
the layout's files, and the same predicate over a HASH layout (the
reference's md5-mod-R economics) reads every file.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pyspark.sql.functions as F

from mapreduce_spark.plans import audit
from mapreduce_spark.sources.tables import load_table


def _scan_num_files(df, path_fragment: str) -> int:
    """numFiles SQLMetric of the executed parquet scan whose file list
    contains ``path_fragment`` (distinguishes the pruned layout scan
    from the raw-lineitem min/max scan in the same plan)."""
    for n in audit._walk(audit._executed_tree(df)):
        if audit._simple_name(n) != "FileSourceScanExec":
            continue
        roots = n.relation().location().rootPaths().mkString(",")
        if path_fragment not in roots:
            continue
        opt = n.metrics().get("numFiles")
        if opt.isDefined():
            return int(opt.get().value())
    raise AssertionError(f"no executed scan over {path_fragment}")


def test_zorder_scan_prunes_to_quarter_of_files(spark, sf_dir):
    from mapreduce_spark.operators.analytics import (
        ZORDER_QUARTER_CELLS,
        ZORDER_TABLE_DIR,
    )
    from mapreduce_spark.registry import get_queries
    from mapreduce_spark.sources.fs import warehouse_uri

    df = get_queries()["zorder_pruned_scan"](spark, sf_dir)  # writes layout
    # (a) the cell restriction reaches the scan as a PARTITION filter —
    # pruned at listing time, before any file is opened
    plan = audit.physical_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "zcell" in m.group(1), plan[:2000]
    # (b) the executed scan reads <= 1/4 of the layout's files
    df.collect()
    import os

    local = urlparse(f"{warehouse_uri(spark)}/{ZORDER_TABLE_DIR}").path
    per_cell = {
        d: len([f for f in os.listdir(os.path.join(local, d))
                if f.endswith(".parquet")])
        for d in os.listdir(local)
        if d.startswith("zcell=")
    }
    total = sum(per_cell.values())
    expected = sum(
        per_cell.get(f"zcell={c}", 0) for c in ZORDER_QUARTER_CELLS
    )
    read = _scan_num_files(df, ZORDER_TABLE_DIR)
    assert read == expected, (read, expected, per_cell)
    assert read * 4 <= total, f"read {read} of {total} files"


def test_hash_layout_reads_every_file_for_same_predicate(spark, sf_dir, tmp_path):
    """The contrast claim: the identical predicate over a hash-
    partitioned copy of the same slice touches ALL files — what z-order
    buys is exactly the difference."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_linestatus", "l_quantity"
    )
    hash_path = str(tmp_path / "hash_lineitem")
    li.repartition(16).write.mode("overwrite").parquet(hash_path)
    mm = li.agg(
        F.min("l_partkey").alias("xmin"), F.max("l_partkey").alias("xmax")
    )
    scan = (
        spark.read.parquet(hash_path)
        .crossJoin(F.broadcast(mm))
        .filter(F.expr("l_partkey <= xmin + (xmax - xmin) DIV 4"))
        .groupBy("l_linestatus")
        .count()
    )
    scan.collect()
    import os

    written = len(
        [f for f in os.listdir(hash_path) if f.endswith(".parquet")]
    )
    assert written >= 8  # the layout really is spread over many files
    assert _scan_num_files(scan, "hash_lineitem") == written
