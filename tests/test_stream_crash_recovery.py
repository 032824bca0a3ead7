"""Crash-recovery replay for the sink-as-state streaming gates.

stream_export_gate's claim (VERDICT r6 #5): because the dedup state IS
the sink, recovery needs no checkpoint repair — kill the query between
micro-batches, even after a TORN APPEND (some of a batch's rows reached
the export, some did not), restart over the same directory with a
completely fresh checkpoint, and the export converges to exactly the
one-shot content: no duplicate digest, no lost document.

The test drives the production per-batch unit (export_gate_batch) both
through real Structured Streaming queries (availableNow, fresh temp
checkpoint per start — i.e. every restart re-reads ALL files, the
worst-case replay) and directly for the one-shot truth.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from mapreduce_spark.operators.curation import _export_path, export_gate_batch
from mapreduce_spark.sources.fs import fs_delete
from mapreduce_spark.sources.tables import load_table


def _export_rows(spark, path):
    rows = (
        spark.read.json(path)
        .select("doc_id", "fp", "fp2", "shard")
        .collect()
    )
    return sorted(map(tuple, rows))


def _spool_file(df, spool: str, name: str, mtime: float) -> None:
    part = os.path.join(spool, f"_mk_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(part)
    src = next(
        os.path.join(part, f)
        for f in os.listdir(part)
        if f.endswith(".parquet")
    )
    dst = os.path.join(spool, "incoming", name)
    os.rename(src, dst)
    os.utime(dst, (mtime, mtime))


def _run_stream(spark, sf_dir: str, in_dir: str, path: str) -> None:
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .writeStream.foreachBatch(
            lambda df, _i: (export_gate_batch(df, path), None)[1]
        )
        .queryName("crash_recovery_export")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_export_gate_replays_to_one_shot_content(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 4 == 1)
    b1 = docs.filter(F.col("doc_id") % 4 == 3)

    # --- one-shot truth: both batches through the same per-batch unit
    truth_path = _export_path(spark) + "_crashtruth"
    fs_delete(spark, truth_path)
    export_gate_batch(b0, truth_path)
    export_gate_batch(b1, truth_path)
    truth = _export_rows(spark, truth_path)

    # --- crashed run: stream processes batch 0, then the query dies
    path = _export_path(spark) + "_crashtest"
    fs_delete(spark, path)
    spool = str(tmp_path / "spool")
    os.makedirs(os.path.join(spool, "incoming"))
    now = time.time()
    _spool_file(b0, spool, "batch0.parquet", now - 600)
    _run_stream(spark, sf_dir, os.path.join(spool, "incoming"), path)

    # --- torn append: strike half of one shard's exported lines, as if
    # the crash hit mid-write and those rows never reached the sink
    from urllib.parse import urlparse

    local = urlparse(path).path
    shard_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(local)
        for f in fs
        if f.endswith(".json")
    ]
    assert shard_files, "batch 0 exported nothing"
    with open(shard_files[0]) as fh:
        lines = fh.readlines()
    kept, torn = lines[: len(lines) // 2], lines[len(lines) // 2 :]
    assert torn, "need at least one torn row for the scenario"
    # rewrite under a fresh name (a shared test session caches listed
    # file lengths; a genuinely restarted driver starts cold, and a real
    # torn file is a never-completed NEW file, not an in-place edit)
    os.remove(shard_files[0])
    with open(shard_files[0] + ".torn.json", "w") as fh:
        fh.writelines(kept)

    # --- restart: batch 1 has arrived; the checkpoint is GONE (each
    # start uses a fresh temp checkpoint), so batch 0 fully replays too
    _spool_file(b1, spool, "batch1.parquet", now - 300)
    _run_stream(spark, sf_dir, os.path.join(spool, "incoming"), path)

    got = _export_rows(spark, path)
    # exactly-once by content: the torn rows were re-admitted, the
    # surviving rows were not duplicated, batch 1 landed once
    assert got == truth
    digests = [(fp, fp2) for _, fp, fp2, _ in got]
    assert len(digests) == len(set(digests)), "duplicate digest in export"


def test_cdc_gate_replay_is_idempotent(spark, sf_dir, tmp_path):
    """stream_cdc_gate's recovery claim: admission depends only on
    (payload, store) and admitted chunks fold into the store, so after a
    between-batches crash a FULL replay from a lost checkpoint re-admits
    nothing — the replayed batch's own chunks are already stored
    (shared == total), and the card converges to one-shot content."""
    from mapreduce_spark.operators.multimodal import (
        _media_from_docs,
        cdc_doc_chunk_rows,
        cdc_gate_batch,
        cdc_index_write,
    )

    docs = load_table(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 4 == 1)
    b1 = docs.filter(F.col("doc_id") % 4 == 3)

    def fresh_store(name: str) -> None:
        corpus = _media_from_docs(docs.filter(F.col("doc_id") % 2 == 0))
        cdc_index_write(cdc_doc_chunk_rows(corpus), name)

    # one-shot truth
    fresh_store("cdc_crash_truth")
    truth_dir = str(tmp_path / "truth_card")
    cdc_gate_batch(b0, "cdc_crash_truth", truth_dir)
    cdc_gate_batch(b1, "cdc_crash_truth", truth_dir)
    truth = sorted(map(tuple, spark.read.parquet(truth_dir).collect()))

    # crashed run: batch 0 commits (card + fold), then the query dies;
    # the restart's checkpoint is gone, so batch 0 REPLAYS before batch 1
    fresh_store("cdc_crash_replay")
    card_dir = str(tmp_path / "replay_card")
    cdc_gate_batch(b0, "cdc_crash_replay", card_dir)
    cdc_gate_batch(b0, "cdc_crash_replay", card_dir)  # the replay
    cdc_gate_batch(b1, "cdc_crash_replay", card_dir)
    got = sorted(map(tuple, spark.read.parquet(card_dir).collect()))
    assert got == truth
    ids = [r[0] for r in got]
    assert len(ids) == len(set(ids)), "replay duplicated an admitted doc"
