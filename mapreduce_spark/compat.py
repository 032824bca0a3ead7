"""Blocking ``Manager``/``Worker`` constructor API (reference parity).

The reference package exports exactly two symbols — ``Manager`` and
``Worker`` with BLOCKING constructors (/root/reference/mapreduce/
__init__.py:8-9); its tests spawn them as processes and drive them purely
over the wire (/root/reference/tests/test_integration_00.py). This module
provides the same surface on the Spark engine, speaking the reference's
COMPLETE observable protocol:

- cluster membership: TCP JSON messages in 4096-byte chunks with 1 s
  accept timeouts and invalid JSON ignored (/root/reference/mapreduce/
  manager/__main__.py:59-91), ``register`` -> ``register_ack`` handshake
  (:93-106), UDP ``heartbeat`` every 2 s with >=5 missed marking a worker
  dead (:318-358, worker/__main__.py:172-185), and ``shutdown`` forwarded
  to every live worker before the manager exits (:190-195);
- task farming: ``new_manager_job`` (:110-139) enqueues FIFO and runs
  single-flight; when live workers are registered the manager FARMS the
  job as ``new_map_task`` messages (input files sorted by name,
  round-robin into num_mappers groups; manager/__main__.py:252-300) and,
  once every map task's ``finished`` arrives (:140-160), as
  ``new_reduce_task`` messages grouping the intermediate
  ``maptaskMMMMM-partPPPPP`` files by partition index (:203-244);
  a worker that dies mid-task (>=5 missed heartbeats while busy) has its
  in-flight task RESENT to the next ready worker (:304-329);
- worker task execution: ``new_map_task`` pipes each input file through
  the mapper executable and appends each output line to the partition
  file chosen by md5(first-tab key) % num_partitions
  (worker/__main__.py:85-126) — the SAME hash the Spark pipe layer uses
  (operators/mr.py `_md5_partition`), so farmed and Spark-native runs of
  one job partition identically; ``new_reduce_task`` sorts each
  intermediate file, k-way-merges them into the reducer executable, and
  writes ``part-{task:05d}`` (:127-166); both report ``finished`` with
  task_id + output_paths.

If a job arrives while NO workers are registered, the manager falls back
to executing it directly on its local Spark session (operators/mr.py
MapReduceJob) — same results, since the pipe layer implements the same
(map -> md5-partition -> sort -> merge -> reduce) contract. Either path
ends by dropping a ``_SUCCESS`` marker in the output directory.

Wire-compatible with the reference's own lifecycle script semantics
(bin/mapreduce: netcat'ing ``{"message_type": "shutdown"}`` to the
manager port stops the cluster). Implementation is stdlib sockets +
threads, written fresh against the message shapes above.
"""

from __future__ import annotations

import heapq
import json
import os
import shlex
import shutil
import socket
import subprocess
import threading
import time
from pathlib import Path

HEARTBEAT_EVERY_S = 2.0
HEARTBEAT_DEAD_MISSES = 5
ACCEPT_TIMEOUT_S = 1.0
CHUNK = 4096
DISPATCH_POLL_S = 0.05
MAX_TASK_RETRIES = 3  # failed-task resends before the whole job is failed


def send_json(host: str, port: int, obj: dict) -> None:
    """One-shot TCP JSON send (the reference's sendMessage contract:
    connect, dump, close — receiver reads to EOF)."""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as sock:
        sock.connect((host, port))
        sock.sendall(json.dumps(obj).encode("utf-8"))


def _recv_json(conn: socket.socket) -> dict | None:
    chunks = []
    while True:
        try:
            data = conn.recv(CHUNK)
        except OSError:
            break
        if not data:
            break
        chunks.append(data)
    try:
        return json.loads(b"".join(chunks).decode("utf-8"))
    except (json.JSONDecodeError, UnicodeDecodeError):
        return None  # invalid JSON ignored, like the reference


def _serve_tcp(host: str, port: int):
    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind((host, port))
    sock.listen()
    sock.settimeout(ACCEPT_TIMEOUT_S)
    return sock


class _TaskFarm:
    """One farmed job: dispatch map then reduce tasks to ready workers.

    The manager's serve loop feeds ``on_finished``; the heartbeat checker
    feeds ``requeue`` when a busy worker dies. ``run`` blocks (inside the
    single-flight job-runner thread) until the job completes or the
    manager shuts down.
    """

    def __init__(self, manager: "Manager", job: dict):
        self.m = manager
        self.job = job
        self.output_paths: list[str] = []
        self.completed = 0
        self.total = 0
        self.pending: list[dict] = []
        self.attempts: dict[tuple[str, int], int] = {}
        self.failed = False

    # -- task construction (the reference's observable splits) ------------
    def _map_tasks(self) -> list[dict]:
        """Input files sorted by basename, round-robin into num_mappers
        groups; empty groups are skipped (reference doJob,
        manager/__main__.py:252-270)."""
        job = self.job
        # files only: a stray subdirectory round-robined into a task would
        # hand the worker an unopenable input path
        files = sorted(
            (p for p in Path(job["input_directory"]).glob("*") if p.is_file()),
            key=lambda p: p.name,
        )
        m = max(1, int(job.get("num_mappers", 2)))
        groups: list[list[str]] = [[] for _ in range(m)]
        for i, f in enumerate(files):
            groups[i % m].append(str(f))
        return [
            {
                "message_type": "new_map_task",
                "task_id": i,
                "input_paths": grp,
                "executable": job["mapper_executable"],
                "output_directory": job["intermediate_directory"],
                "num_partitions": int(job.get("num_reducers", 2)),
            }
            for i, grp in enumerate(groups)
            if grp
        ]

    def _reduce_tasks(self, map_outputs: list[str]) -> list[dict]:
        """Group intermediate files by their partition index (the -partP
        suffix of the worker's maptaskM-partP naming), sorted within each
        group — same grouping the reference's round-robin over the sorted
        file list produces (manager/__main__.py:206-221)."""
        by_part: dict[int, list[str]] = {}
        for path in sorted(map_outputs):
            part = int(path.rsplit("-part", 1)[1])
            by_part.setdefault(part, []).append(path)
        return [
            {
                "message_type": "new_reduce_task",
                "task_id": part,
                "executable": self.job["reducer_executable"],
                "input_paths": paths,
                "output_directory": self.job["output_directory"],
            }
            for part, paths in sorted(by_part.items())
        ]

    # -- dispatch loop ----------------------------------------------------
    def run(self) -> None:
        map_outputs = self._run_stage(self._map_tasks())
        if self.m._shutdown.is_set() or self.failed:
            self._mark_failed()
            return
        self._run_stage(self._reduce_tasks(map_outputs))
        if not self.m._shutdown.is_set():
            if self.failed:
                self._mark_failed()
                return
            out = Path(self.job["output_directory"])
            out.mkdir(parents=True, exist_ok=True)
            (out / "_SUCCESS").touch()

    def _mark_failed(self) -> None:
        """A task exhausted its retries: surface the failure instead of
        hanging the FIFO queue (the reference has no failure path — a
        broken executable stalls it; this layer fails the JOB and moves
        on)."""
        if self.m._shutdown.is_set():
            return
        out = Path(self.job["output_directory"])
        out.mkdir(parents=True, exist_ok=True)
        (out / "_FAILURE").touch()

    def _run_stage(self, tasks: list[dict]) -> list[str]:
        """Dispatch tasks to ready workers until the stage completes.

        With pending tasks and ZERO ready workers the loop WAITS — the
        reference's semantics: a manager with no live workers holds the
        job until a worker (re-)registers (a restarted worker revives
        via _register's replace-on-reregister). Job-level FAILURE is
        reserved for the executable-retry path, not worker scarcity."""
        with self.m._lock:
            self.pending = list(tasks)
            self.total = len(tasks)
            self.completed = 0
            self.output_paths = []
        while not self.m._shutdown.is_set():
            with self.m._lock:
                if self.completed >= self.total:
                    return list(self.output_paths)
                task = worker = None
                if self.pending:
                    for w in self.m.workers:
                        if w["status"] == "ready":
                            worker = w
                            task = self.pending.pop(0)
                            msg = dict(task)
                            msg["worker_host"] = w["host"]
                            msg["worker_port"] = w["port"]
                            w["status"] = "busy"
                            w["task"] = msg
                            break
            if task is not None:
                try:
                    send_json(worker["host"], worker["port"], msg)
                except OSError:
                    # Unreachable worker: give the task back and let the
                    # heartbeat checker declare the worker dead in time.
                    with self.m._lock:
                        worker["status"] = "dead"
                        worker.pop("task", None)
                        self.pending.insert(0, task)
                continue  # immediately look for another ready worker
            time.sleep(DISPATCH_POLL_S)
        return list(self.output_paths)

    # -- called from the manager's serve loop / heartbeat checker ---------
    def on_finished(self, msg: dict) -> None:
        """A worker reported a task done (caller holds the manager lock).

        Only the worker's CURRENT in-flight task counts: a report from a
        falsely-declared-dead worker (its task was popped on death and
        requeued) or any duplicate/stale task_id is ignored, so stage
        accounting and output_paths never double-count. A report carrying
        task_status='failed' frees the worker and requeues the task up to
        MAX_TASK_RETRIES attempts, after which the JOB is failed."""
        for w in self.m.workers:
            if w["host"] != msg.get("worker_host") or w["port"] != msg.get(
                "worker_port"
            ):
                continue
            task = w.get("task")
            if task is None or task.get("task_id") != msg.get("task_id"):
                continue  # stale or duplicate report; keep scanning
            w["status"] = "ready" if w["status"] != "dead" else "dead"
            w.pop("task", None)
            if msg.get("task_status") == "failed":
                key = (task["message_type"], int(task["task_id"]))
                self.attempts[key] = self.attempts.get(key, 0) + 1
                if self.attempts[key] >= MAX_TASK_RETRIES:
                    self.failed = True
                    self.completed += 1  # unblock the stage loop
                else:
                    self.requeue(task)
                return
            self.output_paths.extend(msg.get("output_paths", []))
            self.completed += 1
            return

    def requeue(self, task_msg: dict) -> None:
        """A busy worker died: resend its task to the next ready worker
        (caller holds the manager lock). The stale worker_host/worker_port
        fields are stripped; dispatch re-stamps them (the reference's
        send_replacementTask, manager/__main__.py:304-315)."""
        task = {
            k: v
            for k, v in task_msg.items()
            if k not in ("worker_host", "worker_port")
        }
        self.pending.insert(0, task)


class Manager:
    """Blocking manager: serves the wire protocol until ``shutdown``.

    Constructor signature matches the reference
    (/root/reference/mapreduce/manager/__main__.py:22) and, like it, does
    not return until the cluster is told to shut down. Old ``tmp/job-*``
    intermediate directories are cleared at startup (reference :36-40).
    """

    def __init__(self, host: str, port: int, hb_port: int):
        self.host, self.port, self.hb_port = host, port, hb_port
        self.workers: list[dict] = []
        self.jobs: list[dict] = []
        self.job_counter = 0
        self._farm: _TaskFarm | None = None
        self._lock = threading.Lock()
        self._shutdown = threading.Event()
        self._spark = None

        for old in Path("tmp").glob("job-*"):
            shutil.rmtree(old, ignore_errors=True)

        threads = [
            threading.Thread(target=self._heartbeat_listener, daemon=True),
            threading.Thread(target=self._heartbeat_checker, daemon=True),
            threading.Thread(target=self._job_runner, daemon=True),
        ]
        for t in threads:
            t.start()
        try:
            self._serve()  # blocks until shutdown
        finally:
            self._shutdown.set()
            if self._spark is not None:
                self._spark.stop()

    # -- wire protocol ----------------------------------------------------
    def _serve(self) -> None:
        with _serve_tcp(self.host, self.port) as sock:
            while not self._shutdown.is_set():
                try:
                    conn, _ = sock.accept()
                except TimeoutError:
                    continue
                with conn:
                    msg = _recv_json(conn)
                if not msg or "message_type" not in msg:
                    continue
                kind = msg["message_type"]
                if kind == "register":
                    self._register(msg)
                elif kind == "new_manager_job":
                    self._enqueue_job(msg)
                elif kind == "finished":
                    with self._lock:
                        if self._farm is not None:
                            self._farm.on_finished(msg)
                elif kind == "shutdown":
                    self._broadcast_shutdown()
                    return

    def _register(self, msg: dict) -> None:
        """Admit a worker and ack it. A malformed register (missing
        fields) or a worker that died between connecting and the ack must
        be DROPPED, not allowed to crash the serve loop — the module's
        'invalid messages ignored' contract."""
        try:
            worker = {
                "host": msg["worker_host"],
                "port": msg["worker_port"],
                "status": "ready",
                "missed_hb": 0,
            }
        except KeyError:
            return
        try:
            send_json(
                worker["host"],
                worker["port"],
                {
                    "message_type": "register_ack",
                    "worker_host": worker["host"],
                    "worker_port": worker["port"],
                },
            )
        except OSError:
            return  # worker vanished before the ack; registration dropped
        with self._lock:
            # A re-register from the same (host, port) REPLACES the old
            # entry (the worker restarted, or its first ack was lost):
            # keeping both would let the stale dead/task-less entry
            # swallow 'finished' reports addressed to the live one. Any
            # in-flight task on the old entry is lost with the old
            # process — requeue it.
            for old in list(self.workers):
                if old["host"] == worker["host"] and old["port"] == worker["port"]:
                    task = old.pop("task", None)
                    if task is not None and self._farm is not None:
                        self._farm.requeue(task)
                    self.workers.remove(old)
            self.workers.append(worker)

    def _enqueue_job(self, msg: dict) -> None:
        """FIFO-enqueue with the reference's per-job intermediate dir
        (tmp/job-{n}/intermediate, created at submission time;
        manager/__main__.py:110-125)."""
        with self._lock:
            job_id = self.job_counter
            self.job_counter += 1
        inter = Path("tmp") / f"job-{job_id}" / "intermediate"
        inter.mkdir(parents=True, exist_ok=True)
        job = dict(msg)
        job["intermediate_directory"] = str(inter)
        with self._lock:
            self.jobs.append(job)

    def _broadcast_shutdown(self) -> None:
        with self._lock:
            live = [w for w in self.workers if w["status"] != "dead"]
        for w in live:
            try:
                send_json(w["host"], w["port"], {"message_type": "shutdown"})
            except OSError:
                pass  # already gone; manager still exits cleanly

    # -- heartbeats (UDP, 2 s period, >=5 misses => dead) -----------------
    def _heartbeat_listener(self) -> None:
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as sock:
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            sock.bind((self.host, self.hb_port))
            sock.settimeout(ACCEPT_TIMEOUT_S)
            while not self._shutdown.is_set():
                try:
                    data = sock.recv(CHUNK)
                except TimeoutError:
                    continue
                except OSError:
                    return
                try:
                    msg = json.loads(data.decode("utf-8"))
                except (json.JSONDecodeError, UnicodeDecodeError):
                    continue
                if msg.get("message_type") != "heartbeat":
                    continue
                with self._lock:
                    for w in self.workers:
                        if (
                            w["host"] == msg.get("worker_host")
                            and w["port"] == msg.get("worker_port")
                        ):
                            w["missed_hb"] = 0

    def _heartbeat_checker(self) -> None:
        while not self._shutdown.wait(HEARTBEAT_EVERY_S):
            with self._lock:
                for w in self.workers:
                    w["missed_hb"] += 1
                    if (
                        w["missed_hb"] >= HEARTBEAT_DEAD_MISSES
                        and w["status"] != "dead"
                    ):
                        task = w.pop("task", None)
                        w["status"] = "dead"
                        if task is not None and self._farm is not None:
                            self._farm.requeue(task)  # resend to a live worker

    # -- jobs: FIFO queue, single-flight ----------------------------------
    def _job_runner(self) -> None:
        while not self._shutdown.wait(0.1):
            with self._lock:
                job = self.jobs.pop(0) if self.jobs else None
                farm = None
                if job is not None and any(
                    w["status"] != "dead" for w in self.workers
                ):
                    farm = self._farm = _TaskFarm(self, job)
            if job is None:
                continue
            try:
                if farm is not None:
                    farm.run()  # farm tasks over the wire
                else:
                    self._run_job_spark(job)  # no workers: local Spark
            except Exception:  # a failed job must not kill the manager
                pass
            finally:
                with self._lock:
                    self._farm = None

    def _run_job_spark(self, job: dict) -> None:
        from mapreduce_spark.operators.mr import MapReduceJob
        from mapreduce_spark.session import get_spark

        if self._spark is None:
            self._spark = get_spark("compat-manager")
            self._spark.sparkContext.setLogLevel("ERROR")
        lines = self._spark.sparkContext.textFile(
            job["input_directory"], minPartitions=int(job.get("num_mappers", 2))
        )
        MapReduceJob(
            mapper=job["mapper_executable"],
            reducer=job["reducer_executable"],
            num_reducers=int(job.get("num_reducers", 2)),
        ).run(lines).saveAsTextFile(job["output_directory"])


class Worker:
    """Blocking worker: register -> heartbeat -> execute farmed tasks
    until ``shutdown``.

    Constructor signature matches the reference
    (/root/reference/mapreduce/worker/__main__.py:24). Tasks run inline in
    the serve loop (the worker is busy while executing, exactly like the
    reference), via subprocess pipes sharing the engine's md5-mod-R
    partition function (operators/mr.py)."""

    def __init__(
        self,
        host: str,
        port: int,
        manager_host: str,
        manager_port: int,
        manager_hb_port: int,
    ):
        self.host, self.port = host, port
        self.manager_host = manager_host
        self.manager_port = manager_port
        self.manager_hb_port = manager_hb_port
        self._shutdown = threading.Event()
        self._registered = threading.Event()

        hb = threading.Thread(target=self._heartbeat_loop, daemon=True)
        hb.start()
        try:
            self._serve()  # blocks until shutdown
        finally:
            self._shutdown.set()

    def _serve(self) -> None:
        with _serve_tcp(self.host, self.port) as sock:
            send_json(
                self.manager_host,
                self.manager_port,
                {
                    "message_type": "register",
                    "worker_host": self.host,
                    "worker_port": self.port,
                },
            )
            while not self._shutdown.is_set():
                try:
                    conn, _ = sock.accept()
                except TimeoutError:
                    continue
                with conn:
                    msg = _recv_json(conn)
                if not msg:
                    continue
                kind = msg.get("message_type")
                if kind == "register_ack":
                    self._registered.set()
                elif kind == "new_map_task":
                    self._run_task(self._map_task, msg)
                elif kind == "new_reduce_task":
                    self._run_task(self._reduce_task, msg)
                elif kind == "shutdown":
                    return

    # -- task execution ---------------------------------------------------
    def _run_task(self, fn, msg: dict) -> None:
        reply = {
            "message_type": "finished",
            "task_id": msg["task_id"],
            "worker_host": self.host,
            "worker_port": self.port,
        }
        try:
            reply["output_paths"] = fn(msg)
        except Exception:
            # A broken task must not kill the worker process — but silence
            # would leave the manager waiting forever with this worker
            # marked busy. Report the failure; the manager requeues the
            # task (bounded retries) and frees the worker.
            reply["output_paths"] = []
            reply["task_status"] = "failed"
        try:
            send_json(self.manager_host, self.manager_port, reply)
        except OSError:
            pass  # manager gone; shutdown will arrive or heartbeats lapse

    def _map_task(self, msg: dict) -> list[str]:
        """Pipe each input file through the mapper; append each output
        line to partition file md5(first-tab key) % R — the reference's
        maptask{task:05d}-part{part:05d} contract
        (worker/__main__.py:85-117).

        Two hardenings over the reference:
        - nonzero mapper exit => the task FAILS (raise -> task_status=
          'failed' -> bounded retries). The reference never checks, so a
          mapper dying mid-stream yields a 'successful' job over
          truncated output.
        - partition files are written under an attempt-private name and
          os.replace'd into place only after the mapper finishes. A
          falsely-declared-dead worker still running while its requeued
          duplicate writes the SAME final paths can therefore never
          interleave bytes: each attempt publishes a complete file
          atomically, and both attempts' contents are identical."""
        from mapreduce_spark.operators.mr import _md5_partition

        r = int(msg["num_partitions"])
        out_dir = Path(msg["output_directory"])
        out_dir.mkdir(parents=True, exist_ok=True)
        paths = [
            str(out_dir / f"maptask{int(msg['task_id']):05d}-part{p:05d}")
            for p in range(r)
        ]
        tmp = f".inflight-{self.port}-{os.getpid()}"
        sinks = [open(p + tmp, "w", encoding="utf-8") for p in paths]
        try:
            for input_path in msg["input_paths"]:
                with open(input_path, encoding="utf-8") as infile:
                    proc = subprocess.Popen(
                        shlex.split(msg["executable"]),
                        stdin=infile,
                        stdout=subprocess.PIPE,
                        text=True,
                    )
                    with proc:
                        for line in proc.stdout:
                            if not line.endswith("\n"):
                                line += "\n"
                            key = line.split("\t", 1)[0]
                            sinks[_md5_partition(key) % r].write(line)
                    if proc.returncode != 0:
                        raise RuntimeError(
                            f"mapper exited {proc.returncode}: "
                            f"{msg['executable']}"
                        )
        except BaseException:
            for f in sinks:
                f.close()
            for p in paths:
                Path(p + tmp).unlink(missing_ok=True)
            raise
        for f in sinks:
            f.close()
        for p in paths:
            os.replace(p + tmp, p)
        return paths

    def _reduce_task(self, msg: dict) -> list[str]:
        """Sort each intermediate file, k-way merge into the reducer,
        write part-{task:05d} (worker/__main__.py:127-157). Same
        hardenings as _map_task: nonzero reducer exit fails the task, and
        the part file is published atomically from an attempt-private
        name so duplicate attempts can never interleave."""
        runs = []
        for input_path in msg["input_paths"]:
            with open(input_path, encoding="utf-8") as f:
                runs.append(sorted(f.readlines()))
        out_dir = Path(msg["output_directory"])
        out_dir.mkdir(parents=True, exist_ok=True)
        out_path = str(out_dir / f"part-{int(msg['task_id']):05d}")
        tmp_path = f"{out_path}.inflight-{self.port}-{os.getpid()}"
        try:
            with open(tmp_path, "w", encoding="utf-8") as outfile:
                proc = subprocess.Popen(
                    shlex.split(msg["executable"]),
                    stdin=subprocess.PIPE,
                    stdout=outfile,
                    text=True,
                )
                with proc:
                    for line in heapq.merge(*runs):
                        proc.stdin.write(line)
                    proc.stdin.close()
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"reducer exited {proc.returncode}: "
                        f"{msg['executable']}"
                    )
        except BaseException:
            Path(tmp_path).unlink(missing_ok=True)
            raise
        os.replace(tmp_path, out_path)
        return [out_path]

    def _heartbeat_loop(self) -> None:
        self._registered.wait()
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as sock:
            beat = json.dumps(
                {
                    "message_type": "heartbeat",
                    "worker_host": self.host,
                    "worker_port": self.port,
                }
            ).encode("utf-8")
            while not self._shutdown.is_set():
                try:
                    sock.sendto(beat, (self.manager_host, self.manager_hb_port))
                except OSError:
                    pass
                if self._shutdown.wait(HEARTBEAT_EVERY_S):
                    return
