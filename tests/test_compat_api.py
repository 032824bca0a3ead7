"""Blocking Manager/Worker constructor API tests (mapreduce_spark/compat.py).

Mirrors the reference's integration shutdown test
(/root/reference/tests/test_integration_00.py): spawn Manager + 2 Workers
as processes with the reference constructor signatures, wait for
readiness, drive them purely over the wire, and verify a clean shutdown —
plus a job round-trip the reference exercises via mapreduce-submit
(/root/reference/mapreduce/submit.py): a ``new_manager_job`` TCP message
produces correct part-file output through the Spark engine.
"""

from __future__ import annotations

import multiprocessing
import socket
import time

import pytest

from mapreduce_spark.compat import Manager, Worker, send_json


def _free_ports(n: int) -> list[int]:
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("localhost", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def _wait_port(port: int, timeout: float = 30.0) -> None:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("localhost", port), timeout=1):
                return
        except OSError:
            time.sleep(0.1)
    raise TimeoutError(f"port {port} never became ready")


@pytest.fixture(name="processes")
def processes_fixture():
    processes: list[multiprocessing.Process] = []
    yield processes
    for p in processes:  # teardown runs whether the test passed or failed
        p.terminate()
        p.join()


def _start_cluster(processes, n_workers: int = 2) -> int:
    """Spawn Manager + workers (reference constructor signatures); return
    the manager port. 'spawn' keeps the children free of the parent's
    JVM/session state."""
    ctx = multiprocessing.get_context("spawn")
    manager_port, hb_port, *worker_ports = _free_ports(2 + n_workers)
    p = ctx.Process(
        name=f"Manager:{manager_port}",
        target=Manager,
        args=("localhost", manager_port, hb_port),
    )
    p.start()
    processes.append(p)
    _wait_port(manager_port)
    for wp in worker_ports:
        q = ctx.Process(
            name=f"Worker:{wp}",
            target=Worker,
            args=("localhost", wp, "localhost", manager_port, hb_port),
        )
        q.start()
        processes.append(q)
        _wait_port(wp)
    return manager_port


def test_shutdown(processes):
    """Reference test_integration_00.test_shutdown: one shutdown message
    to the manager stops the whole cluster; every process exits 0."""
    manager_port = _start_cluster(processes)
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    deadline = time.monotonic() + 30
    for p in processes:
        p.join(timeout=max(0.1, deadline - time.monotonic()))
    for p in processes:
        assert not p.is_alive(), f"{p.name} survived shutdown"
        assert p.exitcode == 0, f"{p.name} exit {p.exitcode}"


def test_new_manager_job_runs_on_spark(processes, tmp_path):
    """A wire-submitted job produces the engine's wordcount output."""
    manager_port = _start_cluster(processes, n_workers=1)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World Bye World\nHello Hadoop\n")
    out_dir = tmp_path / "output"
    send_json(
        "localhost",
        manager_port,
        {
            "message_type": "new_manager_job",
            "input_directory": str(in_dir),
            "output_directory": str(out_dir),
            "mapper_executable": "python3 mapreduce_spark/exec/wc_map.py",
            "reducer_executable": "python3 mapreduce_spark/exec/wc_reduce.py",
            "num_mappers": 2,
            "num_reducers": 2,
        },
    )
    deadline = time.monotonic() + 120  # child pays full Spark startup
    while time.monotonic() < deadline:
        if out_dir.is_dir() and (out_dir / "_SUCCESS").exists():
            break
        time.sleep(0.5)
    got = {}
    for part in sorted(out_dir.glob("part-*")):
        for line in part.read_text().splitlines():
            k, v = line.split("\t", 1)
            got[k] = int(v)
    assert got == {"hello": 2, "world": 2, "bye": 1, "hadoop": 1}
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    for p in processes:
        p.join(timeout=30)
        assert p.exitcode == 0


def test_dead_worker_detected_and_shutdown_still_clean(processes):
    """Reference heartbeat semantics (manager/__main__.py:318-333): a
    worker that stops heartbeating is marked dead after 5 missed 2s
    periods, and shutdown must still complete cleanly without it (the
    shutdown broadcast skips dead workers instead of hanging)."""
    from mapreduce_spark.compat import HEARTBEAT_DEAD_MISSES, HEARTBEAT_EVERY_S

    manager_port = _start_cluster(processes, n_workers=2)
    victim = processes[-1]  # one worker goes silent
    victim.terminate()
    victim.join()
    time.sleep(HEARTBEAT_EVERY_S * (HEARTBEAT_DEAD_MISSES + 1))
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    survivors = [p for p in processes if p is not victim]
    for p in survivors:
        p.join(timeout=30)
        assert not p.is_alive(), f"{p.name} survived shutdown"
        assert p.exitcode == 0, f"{p.name} exit {p.exitcode}"
