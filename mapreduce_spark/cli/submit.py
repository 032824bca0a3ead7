"""``mapreduce-submit``: submit a job to a RUNNING manager daemon.

Wire-for-wire parity with the reference's submit client
(/root/reference/mapreduce/submit.py:20-106): same flags and defaults,
same ``new_manager_job`` JSON message over one TCP send, same summary
output. (tools/mr_submit.py is the daemonless sibling that runs the
same job directly on a local SparkSession.)
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    """Argument parser with the reference submit client's flags and defaults."""
    p = argparse.ArgumentParser(
        prog="mapreduce-submit",
        description="Submit a mapper/reducer-executable job to the manager.",
    )
    p.add_argument("--host", "-H", default="localhost")
    p.add_argument("--port", "-p", type=int, default=6000)
    p.add_argument("--input", "-i", dest="input_directory",
                   default="tests/testdata/input")
    p.add_argument("--output", "-o", dest="output_directory",
                   default="output")
    p.add_argument("--mapper", "-m", dest="mapper_executable",
                   default="tests/testdata/exec/wc_map.sh")
    p.add_argument("--reducer", "-r", dest="reducer_executable",
                   default="tests/testdata/exec/wc_reduce.sh")
    p.add_argument("--nmappers", dest="num_mappers", type=int, default=2)
    p.add_argument("--nreducers", dest="num_reducers", type=int, default=2)
    return p


def main(argv: list[str] | None = None) -> int:
    """Parse argv and send one new_manager_job message to the manager."""
    args = build_parser().parse_args(argv)
    from mapreduce_spark.compat import send_json

    job = {
        "message_type": "new_manager_job",
        "input_directory": args.input_directory,
        "output_directory": args.output_directory,
        "mapper_executable": args.mapper_executable,
        "reducer_executable": args.reducer_executable,
        "num_mappers": args.num_mappers,
        "num_reducers": args.num_reducers,
    }
    try:
        send_json(args.host, args.port, job)
    except OSError as err:
        print("Failed to send job to manager.", file=sys.stderr)
        print(err, file=sys.stderr)
        return 1
    print(f"Submitted job to manager {args.host}:{args.port}")
    print("input directory     ", args.input_directory)
    print("output directory    ", args.output_directory)
    print("mapper executable   ", args.mapper_executable)
    print("reducer executable  ", args.reducer_executable)
    print("num mappers         ", args.num_mappers)
    print("num reducers        ", args.num_reducers)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
