"""``mapreduce-worker``: start a blocking cluster worker.

Flag-for-flag parity with the reference's worker CLI
(/root/reference/mapreduce/worker/__main__.py:189-194): --host, --port,
--manager-host, --manager-port, --manager-hb-port, same defaults.
Registers with the manager, heartbeats, executes farmed map/reduce
tasks, and blocks until the shutdown broadcast.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    """Argument parser with the reference worker's flags and defaults."""
    p = argparse.ArgumentParser(
        prog="mapreduce-worker",
        description="Start a MapReduce-compatible worker.",
    )
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=6001)
    p.add_argument("--manager-host", dest="manager_host", default="localhost")
    p.add_argument("--manager-port", dest="manager_port", type=int, default=6000)
    p.add_argument(
        "--manager-hb-port", dest="manager_hb_port", type=int, default=5999
    )
    return p


def main(argv: list[str] | None = None) -> int:
    """Parse argv, start the worker, block until shutdown."""
    args = build_parser().parse_args(argv)
    from mapreduce_spark.compat import Worker

    Worker(
        args.host,
        args.port,
        args.manager_host,
        args.manager_port,
        args.manager_hb_port,
    )  # blocks until shutdown
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
