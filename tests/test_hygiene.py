"""Codebase hygiene gates (the analog of the reference's style tests,
/root/reference/tests/test_style.py — adapted to this engine's rules).

These encode the scale disciplines as enforceable checks rather than
conventions: no driver materialization in operator paths, no
row-at-a-time Python UDFs, docstrings everywhere, and oracle coverage.
"""

from __future__ import annotations

import pathlib
import re

SRC = pathlib.Path(__file__).resolve().parent.parent / "mapreduce_spark"

# Files allowed to call .collect()/.count() on a DataFrame:
# - plans/audit.py: diagnostic helper, must finalize AQE plans
# - operators/dedup.py: dedup_cluster's per-round convergence test (a
#   scalar aggregate, documented)
COLLECT_ALLOWED = {"plans/audit.py", "operators/dedup.py"}


def _py_files():
    return [p for p in SRC.rglob("*.py")]


def test_no_driver_materialization_in_operator_paths():
    bad = []
    for p in _py_files():
        rel = str(p.relative_to(SRC))
        if rel in COLLECT_ALLOWED:
            continue
        text = p.read_text()
        if re.search(r"\.collect\(\)|\.toPandas\(\)|\.toLocalIterator\(\)", text):
            bad.append(rel)
    assert not bad, f"driver materialization in operator paths: {bad}"


def test_no_row_at_a_time_python_udfs():
    for p in _py_files():
        text = p.read_text()
        assert not re.search(r"F\.udf\(|@udf\b|spark\.udf\.register", text), str(p)


def test_every_public_function_documented():
    undocumented = []
    for p in _py_files():
        text = p.read_text()
        for m in re.finditer(r"^def ([a-z]\w*)\(.*?\).*?:\n(\s+)(\S)", text, re.M | re.S):
            name, _, first = m.groups()
            if not name.startswith("_") and first not in ("\"", "'"):
                undocumented.append(f"{p.name}:{name}")
    assert not undocumented, undocumented


def test_no_local_fs_calls_in_operator_paths():
    """Index/table maintenance must go through the Hadoop FileSystem API
    (sources/fs.py) so the same code works on file://, hdfs:// and
    s3a:// — driver-side shutil against a urlparse'd local path only
    works while the warehouse happens to be the driver's disk (VERDICT
    r6 #7). compat.py is exempt: the reference-parity task farm spools
    to the local disk BY DESIGN (mirroring the reference's tmpdir
    intermediates); streaming/curation spool SOURCES (tempfile + os.*)
    simulate arriving files and stay local by design — this gate bans
    shutil/urlparse, the warehouse-manipulation primitives."""
    bad = []
    for p in _py_files():
        rel = str(p.relative_to(SRC))
        if rel == "compat.py":
            continue
        text = p.read_text()
        if re.search(
            r"^\s*(import shutil\b|from urllib\.parse import)", text, re.M
        ):
            bad.append(rel)
    assert not bad, f"local-FS warehouse manipulation in: {bad}"


def test_no_rand_in_correctness_critical_paths():
    # rand() is allowed only where the ANSWER is salt-independent
    # (wordcount_salted documents this); deterministic md5 elsewhere
    for p in _py_files():
        text = p.read_text()
        for m in re.finditer(r"F\.rand\(", text):
            window = text[max(0, m.start() - 2000):m.start()]
            assert "wordcount_salted" in window, f"unexpected rand() in {p}"
