"""Cluster lifecycle CLI integration test (tools/cluster.py).

Mirrors the reference's integration/shutdown test
(/root/reference/tests/test_integration_00.py: start manager+workers,
verify readiness, shut down cleanly) and its lifecycle script semantics
(/root/reference/bin/mapreduce:8-60): start refuses a second cluster,
status reflects readiness, a submitted FIFO job produces correct
part-files, and the reference's exact shutdown wire message drains the
cluster gracefully (exit without pkill).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = [sys.executable, os.path.join(REPO, "tools", "cluster.py")]


def _run(env: dict, *args: str, timeout: float = 120.0):
    return subprocess.run(
        CLI + list(args), env=env, capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )


@pytest.fixture(name="cluster_env")
def cluster_env_fixture(tmp_path):
    env = os.environ.copy()
    env["MR_SPARK_CLUSTER_DIR"] = str(tmp_path / "cluster")
    yield env
    # teardown whether the test passed or failed (reference fixture shape)
    subprocess.run(CLI + ["stop"], env=env, capture_output=True, timeout=60)


def test_lifecycle_start_submit_stop(cluster_env, tmp_path):
    env = cluster_env

    # no cluster yet -> status exits 1 (reference: pgrep finds nothing)
    assert _run(env, "status").returncode == 1

    assert _run(env, "start").returncode == 0
    assert _run(env, "status").returncode == 0
    # second start must refuse, exit 1 (reference: pgrep guard)
    assert _run(env, "start", timeout=30).returncode == 1

    # FIFO job through the spool: wordcount with the engine's executables
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World Bye World\nHello Hadoop\n")
    out_dir = tmp_path / "output"
    r = _run(
        env, "submit",
        "-i", str(in_dir), "-o", str(out_dir),
        "-m", "python3 mapreduce_spark/exec/wc_map.py",
        "-r", "python3 mapreduce_spark/exec/wc_reduce.py",
        "--nmappers", "2", "--nreducers", "2",
    )
    assert r.returncode == 0, r.stderr
    got = {}
    for part in sorted(out_dir.glob("part-*")):
        for line in part.read_text().splitlines():
            k, v = line.split("\t", 1)
            got[k] = int(v)
    assert got == {"hello": 2, "world": 2, "bye": 1, "hadoop": 1}

    # graceful shutdown via the spooled shutdown message; daemon must be
    # gone and status must flip to 1
    t0 = time.monotonic()
    assert _run(env, "stop").returncode == 0
    assert time.monotonic() - t0 < 30
    assert _run(env, "status").returncode == 1
    # pid/ready markers cleaned up -> a fresh start would be allowed
    base = env["MR_SPARK_CLUSTER_DIR"]
    assert not os.path.exists(os.path.join(base, "daemon.pid"))
    assert not os.path.exists(os.path.join(base, "ready"))
