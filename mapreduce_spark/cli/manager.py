"""``mapreduce-manager``: start the blocking cluster manager daemon.

Flag-for-flag parity with the reference's manager CLI
(/root/reference/mapreduce/manager/__main__.py:363-368): --host, --port,
--hb-port, same defaults. Blocks until a ``shutdown`` wire message
arrives (the reference's lifecycle contract).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    """Argument parser with the reference manager's flags and defaults."""
    p = argparse.ArgumentParser(
        prog="mapreduce-manager",
        description="Start the MapReduce-compatible manager daemon.",
    )
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=6000)
    p.add_argument("--hb-port", dest="hb_port", type=int, default=5999)
    return p


def main(argv: list[str] | None = None) -> int:
    """Parse argv, start the manager, block until shutdown."""
    args = build_parser().parse_args(argv)
    from mapreduce_spark.compat import Manager

    Manager(args.host, args.port, args.hb_port)  # blocks until shutdown
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
