"""Blocking ``Manager``/``Worker`` constructor API (reference parity).

The reference package exports exactly two symbols — ``Manager`` and
``Worker`` with BLOCKING constructors (/root/reference/mapreduce/
__init__.py:8-9); its tests spawn them as processes and drive them purely
over the wire (/root/reference/tests/test_integration_00.py). This module
provides the same surface on the Spark engine:

- the cluster-membership wire protocol is real and reference-shaped:
  TCP JSON messages in 4096-byte chunks with 1 s accept timeouts and
  invalid JSON ignored (/root/reference/mapreduce/manager/__main__.py:
  59-91), ``register`` -> ``register_ack`` handshake (:93-106), UDP
  ``heartbeat`` every 2 s with >=5 missed marking a worker dead
  (:318-358, worker/__main__.py:172-185), and ``shutdown`` forwarded to
  every live worker before the manager exits (:190-195);
- ``new_manager_job`` (:110-139) enqueues FIFO and runs single-flight —
  but EXECUTION is the Spark engine (operators/mr.py MapReduceJob), not
  task messages farmed to the workers: Spark's scheduler replaces the
  reference's new_map_task/new_reduce_task/finished loop, which is the
  whole point of the port. Workers therefore carry membership only
  (register, heartbeat, shutdown) — they are the protocol peers the
  reference tests expect, while compute lives in the manager's local
  Spark session.

Wire-compatible with the reference's own lifecycle script semantics
(bin/mapreduce: netcat'ing ``{"message_type": "shutdown"}`` to the
manager port stops the cluster). Implementation is stdlib sockets +
threads, written fresh against the message shapes above.
"""

from __future__ import annotations

import json
import socket
import threading
import time

HEARTBEAT_EVERY_S = 2.0
HEARTBEAT_DEAD_MISSES = 5
ACCEPT_TIMEOUT_S = 1.0
CHUNK = 4096


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


class Manager:
    """Blocking manager: serves the wire protocol until ``shutdown``.

    Constructor signature matches the reference
    (/root/reference/mapreduce/manager/__main__.py:22) and, like it, does
    not return until the cluster is told to shut down.
    """

    def __init__(self, host: str, port: int, hb_port: int):
        self.host, self.port, self.hb_port = host, port, hb_port
        self.workers: list[dict] = []
        self.jobs: list[dict] = []
        self._lock = threading.Lock()
        self._shutdown = threading.Event()
        self._spark = None

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
                    with self._lock:
                        self.jobs.append(msg)  # FIFO, single-flight runner
                elif kind == "shutdown":
                    self._broadcast_shutdown()
                    return

    def _register(self, msg: dict) -> None:
        worker = {
            "host": msg["worker_host"],
            "port": msg["worker_port"],
            "status": "ready",
            "missed_hb": 0,
        }
        with self._lock:
            self.workers.append(worker)
        send_json(
            worker["host"],
            worker["port"],
            {
                "message_type": "register_ack",
                "worker_host": worker["host"],
                "worker_port": worker["port"],
            },
        )

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
                    if w["missed_hb"] >= HEARTBEAT_DEAD_MISSES:
                        w["status"] = "dead"

    # -- jobs: FIFO queue, single-flight, executed by Spark ---------------
    def _job_runner(self) -> None:
        while not self._shutdown.wait(0.1):
            with self._lock:
                job = self.jobs.pop(0) if self.jobs else None
            if job is None:
                continue
            try:
                self._run_job(job)
            except Exception:  # a failed job must not kill the manager
                pass

    def _run_job(self, job: dict) -> None:
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
    """Blocking worker: register -> heartbeat until ``shutdown``.

    Constructor signature matches the reference
    (/root/reference/mapreduce/worker/__main__.py:24). Membership only:
    compute runs in the manager's Spark session (module docstring)."""

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
                if msg.get("message_type") == "register_ack":
                    self._registered.set()
                elif msg.get("message_type") == "shutdown":
                    return

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
