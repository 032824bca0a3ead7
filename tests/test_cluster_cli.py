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


# --------------------------------------------------------------------------
# Packaging parity (VERDICT r7 #5): the reference ships mapreduce-manager /
# mapreduce-worker / mapreduce-submit as pip console scripts
# (/root/reference/setup.py:24-29). pyproject.toml must declare the same
# three, and the declared main()s must run the test_integration_00-style
# round trip: manager up, worker registered, wire-submitted wordcount job
# produces correct part files, shutdown drains both processes cleanly.

ENTRY_POINTS = {
    "mapreduce-manager": "mapreduce_spark.cli.manager:main",
    "mapreduce-worker": "mapreduce_spark.cli.worker:main",
    "mapreduce-submit": "mapreduce_spark.cli.submit:main",
}


def test_pyproject_declares_reference_console_scripts():
    import importlib
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    assert proj["project"]["scripts"] == ENTRY_POINTS
    for target in ENTRY_POINTS.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn))


def _free_ports(n):
    import socket

    socks = []
    for _ in range(n):
        s = socket.socket()
        s.bind(("localhost", 0))
        socks.append(s)
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def _wait_tcp(port, timeout=30.0):
    import socket

    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("localhost", port), timeout=1):
                return
        except OSError:
            time.sleep(0.2)
    raise TimeoutError(f"port {port} never opened")


def test_console_entry_points_run_integration_round_trip(tmp_path):
    """The three declared entry points, invoked as `python -m` on the
    exact modules pyproject installs, complete the reference's
    integration round trip."""
    from mapreduce_spark.compat import send_json
    from mapreduce_spark.operators.mr import EXEC_DIR

    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    mgr_port, hb_port, wrk_port = _free_ports(3)
    mgr = subprocess.Popen(
        [sys.executable, "-m", "mapreduce_spark.cli.manager",
         "--port", str(mgr_port), "--hb-port", str(hb_port)],
        env=env, cwd=tmp_path,
    )
    wrk = None
    try:
        _wait_tcp(mgr_port)
        wrk = subprocess.Popen(
            [sys.executable, "-m", "mapreduce_spark.cli.worker",
             "--port", str(wrk_port),
             "--manager-port", str(mgr_port),
             "--manager-hb-port", str(hb_port)],
            env=env, cwd=tmp_path,
        )
        _wait_tcp(wrk_port)
        in_dir = tmp_path / "input"
        in_dir.mkdir()
        (in_dir / "f1.txt").write_text("Hello World Bye World\nHello Hadoop\n")
        out_dir = tmp_path / "output"
        r = subprocess.run(
            [sys.executable, "-m", "mapreduce_spark.cli.submit",
             "-H", "localhost", "-p", str(mgr_port),
             "-i", str(in_dir), "-o", str(out_dir),
             "-m", f"python3 {EXEC_DIR}/wc_map.py",
             "-r", f"python3 {EXEC_DIR}/wc_reduce.py"],
            env=env, cwd=tmp_path, capture_output=True, text=True, timeout=60,
        )
        assert r.returncode == 0, r.stderr
        assert f"Submitted job to manager localhost:{mgr_port}" in r.stdout
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if (out_dir / "_SUCCESS").exists():
                break
            time.sleep(0.5)
        else:
            raise TimeoutError("job never produced _SUCCESS")
        got = {}
        for part in sorted(out_dir.glob("part-*")):
            for line in part.read_text().splitlines():
                k, v = line.split("\t", 1)
                got[k] = int(v)
        assert got == {"hello": 2, "world": 2, "bye": 1, "hadoop": 1}
    finally:
        try:
            send_json("localhost", mgr_port, {"message_type": "shutdown"})
        except OSError:
            pass
        for proc in (p for p in (mgr, wrk) if p is not None):
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                raise
    assert mgr.returncode == 0 and wrk.returncode == 0
