"""Reference-corpus golden replay (SURVEY §5 strategy point 3).

Runs the engine's MR-compat pipeline over the reference's OWN input corpus
(/root/reference/tests/testdata/input/file01-08) and compares against the
reference's golden outputs — the same check its integration tests make:
word count order-insensitive (/root/reference/tests/test_integration_02.py:
83-87) and grep line-set (/root/reference/tests/test_integration_01.py:81-85).
Honors the fine print: empty-string keys (golden line 1 is `\t9`),
first-tab key split, `tr '[ \t]'` tokenization (brackets are delimiters).
"""

from __future__ import annotations

import pathlib

import pytest

from mapreduce_spark.operators.mr import EXEC_DIR, MapReduceJob
from tests.conftest import REF_CORRECT, REF_INPUT

pytestmark = pytest.mark.skipif(
    not pathlib.Path(REF_INPUT).is_dir(), reason="reference corpus not present"
)


def _golden(name: str) -> list[str]:
    text = pathlib.Path(REF_CORRECT, name).read_text()
    return [line for line in text.split("\n") if line != ""]


def test_wordcount_matches_reference_golden(spark):
    lines = spark.sparkContext.textFile(REF_INPUT, minPartitions=4)
    job = MapReduceJob(
        mapper=f"python3 {EXEC_DIR}/wc_map.py",
        reducer=f"python3 {EXEC_DIR}/wc_reduce.py",
        num_reducers=2,
    )
    got = sorted(job.run(lines).collect())
    assert got == sorted(_golden("word_count_correct.txt"))


def test_wordcount_empty_key_counted(spark):
    # The reference's trademark edge case: 9 blank/delimiter-only segments
    # across the corpus → golden's first line is "\t9".
    lines = spark.sparkContext.textFile(REF_INPUT, minPartitions=4)
    job = MapReduceJob(
        mapper=f"python3 {EXEC_DIR}/wc_map.py",
        reducer=f"python3 {EXEC_DIR}/wc_reduce.py",
        num_reducers=1,
    )
    out = dict(line.split("\t", 1) for line in job.run(lines).collect())
    golden = dict(line.split("\t", 1) for line in _golden("word_count_correct.txt"))
    assert out[""] == golden[""]


def test_reference_own_executables_match_golden(spark):
    """The strongest parity proof: the reference's ACTUAL unmodified shell
    executables (wc_map.sh / wc_reduce.sh) run inside our pipe layer over
    its own corpus and reproduce its golden output — a user of the
    reference can run their existing executables on this engine unchanged
    (SURVEY M3)."""
    ref_exec = pathlib.Path("/root/reference/tests/testdata/exec")
    if not (ref_exec / "wc_map.sh").exists():
        pytest.skip("reference executables not present")
    lines = spark.sparkContext.textFile(REF_INPUT, minPartitions=4)
    job = MapReduceJob(
        mapper=f"bash {ref_exec}/wc_map.sh",
        reducer=f"bash {ref_exec}/wc_reduce.sh",
        num_reducers=2,
    )
    got = sorted(job.run(lines).collect())
    assert got == sorted(_golden("word_count_correct.txt"))


def test_dir_job_file_contract(spark, tmp_path):
    """Analog of the reference's test_integration_03: a directory-level job
    with R=2 writes exactly two part files named like the reference's,
    each sorted within itself, whose union equals the golden output."""
    from mapreduce_spark.operators.mr import EXEC_DIR, run_dir_job

    out_dir = str(tmp_path / "out")
    run_dir_job(
        spark,
        REF_INPUT,
        out_dir,
        mapper=f"python3 {EXEC_DIR}/wc_map.py",
        reducer=f"python3 {EXEC_DIR}/wc_reduce.py",
        num_reducers=2,
    )
    parts = sorted(p.name for p in pathlib.Path(out_dir).glob("part-*"))
    assert parts == ["part-00000", "part-00001"]  # exactly R outputs
    combined = []
    for p in parts:
        lines = pathlib.Path(out_dir, p).read_text().splitlines()
        assert lines == sorted(lines)  # sorted within each partition
        combined.extend(lines)
    assert sorted(combined) == sorted(_golden("word_count_correct.txt"))


def test_grep_matches_reference_golden(spark):
    lines = spark.sparkContext.textFile(REF_INPUT, minPartitions=4)
    job = MapReduceJob(
        mapper=f"python3 {EXEC_DIR}/grep_map.py",
        reducer=f"python3 {EXEC_DIR}/grep_reduce.py",
        num_reducers=1,
        env={"GREP_QUERY": "product"},  # the reference's default query
    )
    got = sorted(job.run(lines).collect())
    assert got == sorted(_golden("grep_correct.txt"))


def test_input_large_within_reference_time_budget(spark):
    """BASELINE.md parity: the reference hard-asserts its map stage over
    tests/testdata/input_large (3.7 MB, 4 files) finishes in < 10 s
    (/root/reference/tests/test_worker_11.py:122). Run the WHOLE
    map+shuffle+reduce wordcount through the pipe layer over the same
    bytes and hold the full pipeline to the same 10 s budget the
    reference grants its map stage alone. (The reference's companion
    < 1 MiB map-memory assert maps to Spark's pipelined execution — no
    operator in this repo materializes rows driver-side; see
    tests/test_hygiene.py.)"""
    import time

    large = "/root/reference/tests/testdata/input_large"
    lines = spark.sparkContext.textFile(f"{large}/*")
    job = MapReduceJob(
        mapper=f"python3 {EXEC_DIR}/wc_map.py",
        reducer=f"python3 {EXEC_DIR}/wc_reduce.py",
        num_reducers=2,
    )
    t0 = time.time()
    out = job.run(lines).collect()
    elapsed = time.time() - t0
    assert elapsed < 10.0, f"pipeline took {elapsed:.1f}s (reference budget 10s)"
    # sanity: real wordcount output, sorted within each partition
    assert len(out) > 1000
    assert all("\t" in line for line in out[:50])
