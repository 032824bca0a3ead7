"""Cluster lifecycle CLI: start | stop | status | restart | submit.

Command-for-command parity with the reference's lifecycle script
(/root/reference/bin/mapreduce:8-60) on the Spark engine:

- ``start``  — refuse (exit 1) if a cluster is already running, else
  launch the daemon: one long-lived SparkSession (the manager+workers —
  Spark's driver/scheduler replaces the TCP manager of
  /root/reference/mapreduce/manager/__main__.py) serving a FIFO job
  spool (reference §2A-12 job queue).
- ``stop``   — graceful first: enqueue ``{"message_type": "shutdown"}``
  (the reference's exact netcat wire message,
  /root/reference/bin/mapreduce:38); the daemon drains the current job,
  stops Spark, and exits 0. If it ignores the message past the grace
  period, SIGTERM (the reference's pkill fallback).
- ``status`` — exit 0 iff the daemon is alive AND the session is ready
  (reference: manager and workers all present), else 1.
- ``restart``— stop then start.
- ``submit`` — drop a mapper/reducer-executable job into the FIFO spool
  and (by default) wait for its result, mirroring mapreduce-submit
  against a running manager (/root/reference/mapreduce/submit.py).

State lives under $MR_SPARK_CLUSTER_DIR (default
/tmp/mapreduce_spark_cluster): ``daemon.pid``, ``ready`` marker,
``jobs/`` spool (FIFO by zero-padded sequence number), ``done/``
results. Everything is stdlib-only.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_DIR = "/tmp/mapreduce_spark_cluster"
POLL_S = 0.2
STOP_GRACE_S = 15.0
START_TIMEOUT_S = 90.0


def _cluster_dir() -> str:
    return os.environ.get("MR_SPARK_CLUSTER_DIR", DEFAULT_DIR)


def _paths() -> dict[str, str]:
    base = _cluster_dir()
    return {
        "base": base,
        "pid": os.path.join(base, "daemon.pid"),
        "ready": os.path.join(base, "ready"),
        "jobs": os.path.join(base, "jobs"),
        "done": os.path.join(base, "done"),
        "log": os.path.join(base, "daemon.log"),
    }


def _alive_pid() -> int | None:
    """Daemon pid if one is running, else None (stale pidfiles cleaned)."""
    p = _paths()
    try:
        with open(p["pid"]) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        for f in (p["pid"], p["ready"]):
            try:
                os.remove(f)
            except OSError:
                pass
        return None
    except PermissionError:
        pass
    return pid


def _next_seq(jobs_dir: str) -> str:
    """Zero-padded FIFO sequence: max existing + 1."""
    seqs = [
        int(name.split("-")[0])
        for name in os.listdir(jobs_dir)
        if name.split("-")[0].isdigit()
    ]
    return f"{(max(seqs) + 1) if seqs else 0:06d}"


def _spool_write(jobs_dir: str, name: str, msg: dict) -> None:
    """Atomic spool drop: the daemon polls ``*.json`` every 200 ms, so a
    plain open-write-close can expose a half-written file and crash its
    json.load. Write to a ``.tmp`` name (excluded from the daemon's
    filter) and os.rename into place — rename is atomic on POSIX."""
    tmp = os.path.join(jobs_dir, name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(msg, f)
    os.rename(tmp, os.path.join(jobs_dir, name))


# ---------------------------------------------------------------------------
# daemon


def _daemon_main() -> int:
    """The long-lived cluster process: SparkSession + FIFO spool loop."""
    p = _paths()
    os.makedirs(p["jobs"], exist_ok=True)
    os.makedirs(p["done"], exist_ok=True)
    with open(p["pid"], "w") as f:
        f.write(str(os.getpid()))

    from mapreduce_spark.session import get_spark

    spark = get_spark("mr-cluster")
    spark.sparkContext.setLogLevel("ERROR")
    with open(p["ready"], "w") as f:
        f.write("ready")

    try:
        while True:
            pending = sorted(
                n for n in os.listdir(p["jobs"]) if n.endswith(".json")
            )
            if not pending:
                time.sleep(POLL_S)
                continue
            name = pending[0]  # FIFO: lowest sequence number first
            path = os.path.join(p["jobs"], name)
            try:
                with open(path) as f:
                    msg = json.load(f)
            except (OSError, json.JSONDecodeError):
                # One corrupt spool file must not tear down the cluster
                # (clients write via _spool_write's atomic rename, but a
                # foreign/damaged drop is still survivable: discard it).
                try:
                    os.remove(path)
                except OSError:
                    pass
                continue
            try:
                os.remove(path)
            except OSError:
                pass  # racing removal must not kill the daemon
            if msg.get("message_type") == "shutdown":
                return 0
            result = _run_job(spark, msg)
            _spool_write(p["done"], name, result)  # atomic: client polls it
    finally:
        for f in (p["ready"], p["pid"]):
            try:
                os.remove(f)
            except OSError:
                pass
        spark.stop()


def _run_job(spark, msg: dict) -> dict:
    """One spooled mapper/reducer-executable job (reference new_manager_job)."""
    from mapreduce_spark.operators.mr import MapReduceJob

    try:
        lines = spark.sparkContext.textFile(
            msg["input_directory"], minPartitions=int(msg.get("num_mappers", 2))
        )
        job = MapReduceJob(
            mapper=msg["mapper_executable"],
            reducer=msg["reducer_executable"],
            num_reducers=int(msg.get("num_reducers", 2)),
        )
        job.run(lines).saveAsTextFile(msg["output_directory"])
        parts = sorted(
            f
            for f in os.listdir(msg["output_directory"])
            if f.startswith("part-")
        )
        return {"status": "ok", "partitions": parts}
    except Exception as exc:  # job failure must not kill the cluster
        return {"status": "error", "error": str(exc)}


# ---------------------------------------------------------------------------
# client commands


def cmd_start() -> int:
    if _alive_pid() is not None:
        print("mapreduce cluster already running", file=sys.stderr)
        return 1
    p = _paths()
    os.makedirs(p["base"], exist_ok=True)
    os.makedirs(p["jobs"], exist_ok=True)
    os.makedirs(p["done"], exist_ok=True)
    try:
        os.remove(p["ready"])
    except OSError:
        pass
    with open(p["log"], "ab") as log:
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "_daemon"],
            stdout=log,
            stderr=log,
            env=os.environ.copy(),
            start_new_session=True,  # survive the client's exit
        )
    deadline = time.monotonic() + START_TIMEOUT_S
    while time.monotonic() < deadline:
        if os.path.exists(p["ready"]):
            print(f"cluster ready (pid {_alive_pid()}) at {p['base']}")
            return 0
        time.sleep(POLL_S)
    print("cluster failed to become ready; see " + p["log"], file=sys.stderr)
    return 1


def cmd_stop() -> int:
    pid = _alive_pid()
    if pid is None:
        print("no cluster running")
        return 0
    print("stopping mapreduce...")
    p = _paths()
    seq = _next_seq(p["jobs"])
    _spool_write(p["jobs"], f"{seq}-shutdown.json", {"message_type": "shutdown"})
    deadline = time.monotonic() + STOP_GRACE_S
    while time.monotonic() < deadline:
        if _alive_pid() is None:
            return 0
        time.sleep(POLL_S)
    print("killing mapreduce cluster ...")
    try:
        os.kill(pid, signal.SIGTERM)
    except ProcessLookupError:
        pass
    time.sleep(1.0)
    return 0


def cmd_status() -> int:
    pid = _alive_pid()
    ready = os.path.exists(_paths()["ready"])
    if pid is not None and ready:
        print(f"{pid} mapreduce-cluster (ready)")
        return 0
    return 1


def cmd_submit(args: argparse.Namespace) -> int:
    if cmd_status() != 0:
        print("no running cluster (start one first)", file=sys.stderr)
        return 1
    if os.path.exists(args.output_directory):
        print(
            f"Output directory already exists: {args.output_directory}",
            file=sys.stderr,
        )
        return 1
    p = _paths()
    seq = _next_seq(p["jobs"])
    name = f"{seq}-job.json"
    msg = {
        "message_type": "new_manager_job",
        "input_directory": args.input_directory,
        "output_directory": os.path.abspath(args.output_directory),
        "mapper_executable": args.mapper_executable,
        "reducer_executable": args.reducer_executable,
        "num_mappers": args.num_mappers,
        "num_reducers": args.num_reducers,
    }
    _spool_write(p["jobs"], name, msg)
    print(f"submitted {name}")
    if args.no_wait:
        return 0
    done = os.path.join(p["done"], name)
    deadline = time.monotonic() + args.timeout
    while time.monotonic() < deadline:
        if os.path.exists(done):
            with open(done) as f:
                result = json.load(f)
            print(json.dumps(result))
            return 0 if result.get("status") == "ok" else 1
        if _alive_pid() is None:
            print("cluster died while job was queued", file=sys.stderr)
            return 1
        time.sleep(POLL_S)
    print("timed out waiting for job", file=sys.stderr)
    return 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="cluster", description="Spark engine cluster lifecycle"
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("start")
    sub.add_parser("stop")
    sub.add_parser("status")
    sub.add_parser("restart")
    sub.add_parser("_daemon")  # internal: the forked cluster process
    sp = sub.add_parser("submit")
    sp.add_argument("--input", "-i", dest="input_directory", required=True)
    sp.add_argument("--output", "-o", dest="output_directory", required=True)
    sp.add_argument("--mapper", "-m", dest="mapper_executable", required=True)
    sp.add_argument("--reducer", "-r", dest="reducer_executable", required=True)
    sp.add_argument("--nmappers", dest="num_mappers", type=int, default=2)
    sp.add_argument("--nreducers", dest="num_reducers", type=int, default=2)
    sp.add_argument("--no-wait", action="store_true")
    sp.add_argument("--timeout", type=float, default=120.0)
    args = p.parse_args(argv)
    if args.cmd == "start":
        return cmd_start()
    if args.cmd == "stop":
        return cmd_stop()
    if args.cmd == "status":
        return cmd_status()
    if args.cmd == "restart":
        cmd_stop()
        return cmd_start()
    if args.cmd == "_daemon":
        return _daemon_main()
    return cmd_submit(args)


if __name__ == "__main__":
    raise SystemExit(main())
