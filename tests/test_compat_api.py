"""Blocking Manager/Worker constructor API tests (mapreduce_spark/compat.py).

Mirrors the reference's integration and manager message-sequence tests:

- shutdown / heartbeat-death lifecycle
  (/root/reference/tests/test_integration_00.py);
- a wire-submitted ``new_manager_job`` executed end-to-end by a REAL
  Worker via farmed new_map_task/new_reduce_task messages
  (/root/reference/mapreduce/submit.py round-trip);
- the manager's observable task-farm message sequence — map tasks split
  round-robin over sorted input files, reduce tasks grouping the
  intermediate files by partition — mirroring
  /root/reference/tests/test_manager_03.py:127-179;
- dead-worker task RESEND: a busy worker that stops heartbeating has its
  in-flight task re-sent to the next ready worker, mirroring
  /root/reference/tests/test_manager_05.py:194-223;
- the no-worker fallback: with zero registered workers the manager runs
  the job on its local Spark session.
"""

from __future__ import annotations

import json
import multiprocessing
import socket
import threading
import time

import pytest

from mapreduce_spark.compat import (
    HEARTBEAT_DEAD_MISSES,
    HEARTBEAT_EVERY_S,
    Manager,
    Worker,
    _recv_json,
    _serve_tcp,
    send_json,
)
from mapreduce_spark.operators.mr import EXEC_DIR


# Manager port -> its UDP heartbeat port (recorded by _start_cluster so a
# test can attach a fresh worker to a running manager).
_HB_PORTS: dict[int, int] = {}


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
    _HB_PORTS[manager_port] = hb_port  # for tests that restart workers
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


def _submit_wordcount(manager_port: int, in_dir, out_dir, n_map=2, n_red=2):
    send_json(
        "localhost",
        manager_port,
        {
            "message_type": "new_manager_job",
            "input_directory": str(in_dir),
            "output_directory": str(out_dir),
            "mapper_executable": f"python3 {EXEC_DIR}/wc_map.py",
            "reducer_executable": f"python3 {EXEC_DIR}/wc_reduce.py",
            "num_mappers": n_map,
            "num_reducers": n_red,
        },
    )


def _read_counts(out_dir) -> dict[str, int]:
    got = {}
    for part in sorted(out_dir.glob("part-*")):
        for line in part.read_text().splitlines():
            k, v = line.split("\t", 1)
            got[k] = int(v)
    return got


def _wait_success(out_dir, deadline_s: float) -> None:
    deadline = time.monotonic() + deadline_s
    while time.monotonic() < deadline:
        if out_dir.is_dir() and (out_dir / "_SUCCESS").exists():
            return
        time.sleep(0.5)
    raise TimeoutError(f"no _SUCCESS in {out_dir}")


def test_new_manager_job_farmed_to_worker(processes, tmp_path, monkeypatch):
    """A wire-submitted job is FARMED: the real Worker executes the
    new_map_task/new_reduce_task messages via subprocess pipes and the
    final part files carry the engine's wordcount output."""
    monkeypatch.chdir(tmp_path)  # manager writes tmp/job-*/intermediate here
    manager_port = _start_cluster(processes, n_workers=1)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World Bye World\nHello Hadoop\n")
    out_dir = tmp_path / "output"
    _submit_wordcount(manager_port, in_dir, out_dir)
    _wait_success(out_dir, 60)
    assert _read_counts(out_dir) == {"hello": 2, "world": 2, "bye": 1, "hadoop": 1}
    # the worker really produced intermediate maptask files
    inter = tmp_path / "tmp" / "job-0" / "intermediate"
    assert sorted(p.name for p in inter.glob("maptask*")) == [
        "maptask00000-part00000",
        "maptask00000-part00001",
    ]
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    for p in processes:
        p.join(timeout=30)
        assert p.exitcode == 0


def test_new_manager_job_spark_fallback_without_workers(
    processes, tmp_path, monkeypatch
):
    """With ZERO registered workers the manager executes the job on its
    local Spark session (operators/mr.py pipe layer) — same output."""
    monkeypatch.chdir(tmp_path)
    manager_port = _start_cluster(processes, n_workers=0)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World Bye World\nHello Hadoop\n")
    out_dir = tmp_path / "output"
    _submit_wordcount(manager_port, in_dir, out_dir)
    _wait_success(out_dir, 120)  # child pays full Spark startup
    assert _read_counts(out_dir) == {"hello": 2, "world": 2, "bye": 1, "hadoop": 1}
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    for p in processes:
        p.join(timeout=30)
        assert p.exitcode == 0


@pytest.mark.seal
def test_dead_worker_detected_and_shutdown_still_clean(processes):
    """Reference heartbeat semantics (manager/__main__.py:318-333): a
    worker that stops heartbeating is marked dead after 5 missed 2s
    periods, and shutdown must still complete cleanly without it (the
    shutdown broadcast skips dead workers instead of hanging)."""
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


# ---------------------------------------------------------------------------
# Wire-only scripted worker: records every message the manager sends and
# acknowledges tasks as finished WITHOUT executing anything, so the tests
# below pin the manager's observable message sequence exactly like the
# reference's mocked-socket manager tests.


class ScriptedWorker:
    def __init__(
        self,
        port: int,
        manager_port: int,
        hb_port: int,
        auto_finish: bool = True,
        finish_delay: float = 0.0,
    ):
        self.host, self.port = "localhost", port
        self.manager_port, self.hb_port = manager_port, hb_port
        self.auto_finish = auto_finish
        self.finish_delay = finish_delay
        self.received: list[dict] = []  # every message, arrival order
        self._stop = threading.Event()
        self._beat = threading.Event()
        self._beat.set()
        self._threads = [
            threading.Thread(target=self._serve, daemon=True),
            threading.Thread(target=self._heartbeat, daemon=True),
        ]
        for t in self._threads:
            t.start()
        _wait_port(port)
        send_json(
            "localhost",
            manager_port,
            {
                "message_type": "register",
                "worker_host": self.host,
                "worker_port": self.port,
            },
        )

    def tasks(self) -> list[dict]:
        return [m for m in self.received if "task_id" in m]

    def stop_heartbeat(self) -> None:
        self._beat.clear()

    def close(self) -> None:
        self._stop.set()

    def _serve(self) -> None:
        with _serve_tcp(self.host, self.port) as sock:
            while not self._stop.is_set():
                try:
                    conn, _ = sock.accept()
                except TimeoutError:
                    continue
                with conn:
                    msg = _recv_json(conn)
                if not msg:
                    continue
                self.received.append(msg)
                kind = msg.get("message_type")
                if kind == "shutdown":
                    return
                if kind in ("new_map_task", "new_reduce_task") and self.auto_finish:
                    if self.finish_delay:
                        time.sleep(self.finish_delay)
                    if kind == "new_map_task":
                        outs = [
                            f"{msg['output_directory']}/"
                            f"maptask{msg['task_id']:05d}-part{p:05d}"
                            for p in range(msg["num_partitions"])
                        ]
                    else:
                        outs = [
                            f"{msg['output_directory']}/part-{msg['task_id']:05d}"
                        ]
                    send_json(
                        "localhost",
                        self.manager_port,
                        {
                            "message_type": "finished",
                            "task_id": msg["task_id"],
                            "output_paths": outs,
                            "worker_host": self.host,
                            "worker_port": self.port,
                        },
                    )

    def _heartbeat(self) -> None:
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as sock:
            beat = json.dumps(
                {
                    "message_type": "heartbeat",
                    "worker_host": self.host,
                    "worker_port": self.port,
                }
            ).encode()
            while not self._stop.wait(HEARTBEAT_EVERY_S / 2):
                if self._beat.is_set():
                    try:
                        sock.sendto(beat, ("localhost", self.hb_port))
                    except OSError:
                        pass


@pytest.fixture(name="scripted")
def scripted_fixture():
    workers: list[ScriptedWorker] = []
    yield workers
    for w in workers:
        w.close()


def _input_files(tmp_path, n=4):
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    for i in range(1, n + 1):
        (in_dir / f"file{i:02d}").write_text(f"line {i}\n")
    return in_dir


def test_manager_task_message_sequence(processes, scripted, tmp_path, monkeypatch):
    """Mirrors reference test_manager_03.py:127-179: ONE worker,
    num_mappers=2, num_reducers=1 — the manager must send exactly two
    new_map_task messages with the sorted input files split round-robin
    (file01,file03 / file02,file04), then one new_reduce_task naming both
    maptask*-part00000 intermediates."""
    monkeypatch.chdir(tmp_path)
    ctx = multiprocessing.get_context("spawn")
    manager_port, hb_port, worker_port = _free_ports(3)
    p = ctx.Process(target=Manager, args=("localhost", manager_port, hb_port))
    p.start()
    processes.append(p)
    _wait_port(manager_port)
    w = ScriptedWorker(worker_port, manager_port, hb_port)
    scripted.append(w)

    in_dir = _input_files(tmp_path)
    out_dir = tmp_path / "output"
    send_json(
        "localhost",
        manager_port,
        {
            "message_type": "new_manager_job",
            "input_directory": str(in_dir),
            "output_directory": str(out_dir),
            "mapper_executable": "wc_map.sh",
            "reducer_executable": "wc_reduce.sh",
            "num_mappers": 2,
            "num_reducers": 1,
        },
    )
    _wait_success(out_dir, 30)

    # the reference sends the CWD-relative tmp/job-N/intermediate path
    # (test_manager_03 pins exactly this string)
    inter = "tmp/job-0/intermediate"
    assert w.tasks() == [
        {
            "message_type": "new_map_task",
            "task_id": 0,
            "input_paths": [str(in_dir / "file01"), str(in_dir / "file03")],
            "executable": "wc_map.sh",
            "output_directory": inter,
            "num_partitions": 1,
            "worker_host": "localhost",
            "worker_port": worker_port,
        },
        {
            "message_type": "new_map_task",
            "task_id": 1,
            "input_paths": [str(in_dir / "file02"), str(in_dir / "file04")],
            "executable": "wc_map.sh",
            "output_directory": inter,
            "num_partitions": 1,
            "worker_host": "localhost",
            "worker_port": worker_port,
        },
        {
            "message_type": "new_reduce_task",
            "task_id": 0,
            "executable": "wc_reduce.sh",
            "input_paths": [
                f"{inter}/maptask00000-part00000",
                f"{inter}/maptask00001-part00000",
            ],
            "output_directory": str(out_dir),
            "worker_host": "localhost",
            "worker_port": worker_port,
        },
    ]
    assert w.received[0] == {
        "message_type": "register_ack",
        "worker_host": "localhost",
        "worker_port": worker_port,
    }
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    p.join(timeout=30)
    assert p.exitcode == 0


@pytest.mark.seal
def test_dead_worker_task_resend(processes, scripted, tmp_path, monkeypatch):
    """Mirrors reference test_manager_05.py:194-223: two workers; the one
    holding map task 1 stops heartbeating mid-task, so after 5 missed 2 s
    periods the manager re-sends THE SAME task (task_id + input_paths) to
    the surviving worker, which then also gets the reduce task — and the
    job still completes."""
    monkeypatch.chdir(tmp_path)
    ctx = multiprocessing.get_context("spawn")
    manager_port, hb_port, port_a, port_b = _free_ports(4)
    p = ctx.Process(target=Manager, args=("localhost", manager_port, hb_port))
    p.start()
    processes.append(p)
    _wait_port(manager_port)
    # A finishes slowly so task 1 must go to B; B accepts but never finishes.
    wa = ScriptedWorker(port_a, manager_port, hb_port, finish_delay=1.0)
    wb = ScriptedWorker(port_b, manager_port, hb_port, auto_finish=False)
    scripted.extend([wa, wb])

    in_dir = _input_files(tmp_path)
    out_dir = tmp_path / "output"
    send_json(
        "localhost",
        manager_port,
        {
            "message_type": "new_manager_job",
            "input_directory": str(in_dir),
            "output_directory": str(out_dir),
            "mapper_executable": "wc_map.sh",
            "reducer_executable": "wc_reduce.sh",
            "num_mappers": 2,
            "num_reducers": 1,
        },
    )
    # B goes silent as soon as it holds a task
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline and not wb.tasks():
        time.sleep(0.1)
    assert wb.tasks(), "worker B never received a task"
    wb.stop_heartbeat()

    _wait_success(out_dir, HEARTBEAT_EVERY_S * (HEARTBEAT_DEAD_MISSES + 3) + 30)

    [b_task] = wb.tasks()
    assert b_task["message_type"] == "new_map_task"
    a_kinds = [(t["message_type"], t["task_id"]) for t in wa.tasks()]
    # A ran its own map task, B's resent map task, and the reduce task.
    assert ("new_map_task", b_task["task_id"]) in a_kinds
    assert ("new_reduce_task", 0) in a_kinds
    assert len(a_kinds) == 3
    resent = next(
        t
        for t in wa.tasks()
        if t["message_type"] == "new_map_task"
        and t["task_id"] == b_task["task_id"]
    )
    assert resent["input_paths"] == b_task["input_paths"]
    assert resent["worker_port"] == port_a  # re-stamped for the new owner
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    p.join(timeout=30)
    assert p.exitcode == 0


def test_broken_executable_fails_job_without_hanging_queue(
    processes, tmp_path, monkeypatch
):
    """r4 review finding: a mapper that crashes used to be swallowed by
    the worker, leaving it marked busy forever and wedging the FIFO
    queue. Now the worker reports task_status='failed', the manager
    retries up to MAX_TASK_RETRIES then fails the JOB (writes _FAILURE,
    no _SUCCESS), and the next job in the queue still runs."""
    monkeypatch.chdir(tmp_path)
    manager_port = _start_cluster(processes, n_workers=1)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World\n")
    bad_out = tmp_path / "bad_out"
    send_json(
        "localhost",
        manager_port,
        {
            "message_type": "new_manager_job",
            "input_directory": str(in_dir),
            "output_directory": str(bad_out),
            "mapper_executable": "/nonexistent/mapper",
            "reducer_executable": f"python3 {EXEC_DIR}/wc_reduce.py",
            "num_mappers": 1,
            "num_reducers": 1,
        },
    )
    good_out = tmp_path / "good_out"
    _submit_wordcount(manager_port, in_dir, good_out, n_map=1, n_red=1)
    _wait_success(good_out, 60)  # queue not wedged by the failed job
    assert (bad_out / "_FAILURE").exists()
    assert not (bad_out / "_SUCCESS").exists()
    assert _read_counts(good_out) == {"hello": 1, "world": 1}
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    for p in processes:
        p.join(timeout=30)
        assert p.exitcode == 0


def test_subdirectory_in_input_is_ignored(processes, tmp_path, monkeypatch):
    """r4 review finding: glob('*') used to round-robin subdirectories
    into map tasks, handing workers unopenable input paths."""
    monkeypatch.chdir(tmp_path)
    manager_port = _start_cluster(processes, n_workers=1)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World Bye World\nHello Hadoop\n")
    (in_dir / "nested_dir").mkdir()  # must be skipped, not dispatched
    out_dir = tmp_path / "output"
    _submit_wordcount(manager_port, in_dir, out_dir, n_map=2, n_red=1)
    _wait_success(out_dir, 60)
    assert _read_counts(out_dir) == {"hello": 2, "world": 2, "bye": 1, "hadoop": 1}
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    for p in processes:
        p.join(timeout=30)
        assert p.exitcode == 0


def test_duplicate_or_stale_finished_reports_are_ignored():
    """r4 review finding: on_finished used to count ANY report. A
    falsely-declared-dead worker whose task was requeued (its 'task'
    popped) must not double-count the stage or duplicate output_paths."""
    import types

    from mapreduce_spark.compat import _TaskFarm

    m = types.SimpleNamespace(
        workers=[
            {
                "host": "h",
                "port": 1,
                "status": "busy",
                "missed_hb": 0,
                "task": {"message_type": "new_map_task", "task_id": 0},
            }
        ],
        _lock=threading.Lock(),
        _shutdown=threading.Event(),
    )
    farm = _TaskFarm(m, {})
    farm.total = 2
    msg = {
        "message_type": "finished",
        "worker_host": "h",
        "worker_port": 1,
        "task_id": 0,
        "output_paths": ["p1"],
    }
    farm.on_finished(dict(msg))
    assert (farm.completed, farm.output_paths) == (1, ["p1"])
    farm.on_finished(dict(msg))  # duplicate: task already cleared
    assert (farm.completed, farm.output_paths) == (1, ["p1"])
    # stale report for a DIFFERENT task_id than the one in flight
    m.workers[0]["status"] = "busy"
    m.workers[0]["task"] = {"message_type": "new_map_task", "task_id": 1}
    farm.on_finished(dict(msg))  # task_id 0 != in-flight 1 -> ignored
    assert (farm.completed, farm.output_paths) == (1, ["p1"])
    assert m.workers[0]["status"] == "busy"  # untouched


def test_mapper_nonzero_exit_fails_job(processes, tmp_path, monkeypatch):
    """r4 review finding: a mapper that EMITS OUTPUT then exits nonzero
    used to be counted successful (only Popen failures were caught), so
    the job finished over truncated data. Now the worker checks the exit
    status, the task fails with bounded retries, the job gets _FAILURE,
    and no partial output is published."""
    monkeypatch.chdir(tmp_path)
    manager_port = _start_cluster(processes, n_workers=1)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World\n")
    bad_mapper = tmp_path / "half_then_die.py"
    bad_mapper.write_text("import sys\nprint('hello\\t1')\nsys.exit(3)\n")
    bad_out = tmp_path / "bad_out"
    send_json(
        "localhost",
        manager_port,
        {
            "message_type": "new_manager_job",
            "input_directory": str(in_dir),
            "output_directory": str(bad_out),
            "mapper_executable": f"python3 {bad_mapper}",
            "reducer_executable": f"python3 {EXEC_DIR}/wc_reduce.py",
            "num_mappers": 1,
            "num_reducers": 1,
        },
    )
    good_out = tmp_path / "good_out"
    _submit_wordcount(manager_port, in_dir, good_out, n_map=1, n_red=1)
    _wait_success(good_out, 60)  # queue not wedged by the failed job
    assert (bad_out / "_FAILURE").exists()
    assert not (bad_out / "_SUCCESS").exists()
    # the failed attempts must not leave published intermediate files
    inter = tmp_path / "tmp" / "job-0" / "intermediate"
    assert not list(inter.glob("maptask*")), "truncated output was published"
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    for p in processes:
        p.join(timeout=30)
        assert p.exitcode == 0


@pytest.mark.seal
def test_restarted_worker_reregisters_and_farms(processes, tmp_path, monkeypatch):
    """r4 review finding: a worker restarting on the same (host, port)
    used to leave TWO registry entries; the stale dead one swallowed
    'finished' reports and wedged the stage. Re-register now REPLACES
    the old entry, so a job submitted after the restart farms and
    completes."""
    import multiprocessing as mp

    monkeypatch.chdir(tmp_path)
    manager_port = _start_cluster(processes, n_workers=1)
    victim = processes[-1]
    worker_port = int(victim.name.split(":")[1])
    victim.terminate()
    victim.join()
    # let the manager notice the death (5 missed 2s heartbeats)
    time.sleep(HEARTBEAT_EVERY_S * (HEARTBEAT_DEAD_MISSES + 1))
    # restart a worker on the SAME port; it re-registers with the manager
    ctx = mp.get_context("spawn")
    q = ctx.Process(
        name=f"Worker:{worker_port}",
        target=Worker,
        args=("localhost", worker_port, "localhost", manager_port,
              _HB_PORTS[manager_port]),
    )
    q.start()
    processes.append(q)
    _wait_port(worker_port)
    time.sleep(1.0)  # registration round-trip
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("Hello World\n")
    out_dir = tmp_path / "output"
    _submit_wordcount(manager_port, in_dir, out_dir, n_map=1, n_red=1)
    _wait_success(out_dir, 60)
    assert _read_counts(out_dir) == {"hello": 1, "world": 1}
    send_json("localhost", manager_port, {"message_type": "shutdown"})
    for p in processes:
        if p is victim:
            continue  # terminated by the test; exits with SIGTERM
        p.join(timeout=30)
        assert p.exitcode == 0
