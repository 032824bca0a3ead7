"""Drop-in `mapreduce-submit` CLI on the Spark engine.

Flag-for-flag parity with the reference's submit client
(/root/reference/mapreduce/submit.py:20-58): a user's existing invocation

    mapreduce-submit -i tests/testdata/input -o output \\
        -m tests/testdata/exec/wc_map.sh -r tests/testdata/exec/wc_reduce.sh \\
        --nmappers 2 --nreducers 2

runs unchanged as `python tools/mr_submit.py <same flags>` — same input
contract (directory of text files), same executables, same output contract
(output/part-00000.. files, one per reduce partition, sorted within each).

--host/--port are accepted for compatibility and ignored: there is no
manager daemon to contact — Spark's driver/scheduler replaces the
reference's TCP manager (its job queue, task assignment, heartbeats and
re-execution: /root/reference/mapreduce/manager/__main__.py). --nmappers
becomes the minimum input partition count (the reference round-robins
files into num_mappers map tasks; Spark splits the same glob into at
least that many partitions).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mr_submit",
        description="Submit a mapper/reducer-executable job to the Spark engine.",
    )
    p.add_argument("--host", "-H", default="localhost",
                   help="ignored (no manager daemon; kept for CLI parity)")
    p.add_argument("--port", "-p", type=int, default=6000,
                   help="ignored (no manager daemon; kept for CLI parity)")
    p.add_argument("--input", "-i", dest="input_directory",
                   default="tests/testdata/input", help="Input directory")
    p.add_argument("--output", "-o", dest="output_directory",
                   default="output", help="Output directory")
    p.add_argument("--mapper", "-m", dest="mapper_executable",
                   default="tests/testdata/exec/wc_map.sh",
                   help="Mapper executable")
    p.add_argument("--reducer", "-r", dest="reducer_executable",
                   default="tests/testdata/exec/wc_reduce.sh",
                   help="Reducer executable")
    p.add_argument("--nmappers", dest="num_mappers", type=int, default=2,
                   help="Number of mappers (minimum input partitions)")
    p.add_argument("--nreducers", dest="num_reducers", type=int, default=2,
                   help="Number of reducers (output partitions)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not os.path.isdir(args.input_directory):
        print(f"Input directory not found: {args.input_directory}", file=sys.stderr)
        return 1
    if os.path.exists(args.output_directory):
        print(
            f"Output directory already exists: {args.output_directory}",
            file=sys.stderr,
        )
        return 1

    from mapreduce_spark.operators.mr import MapReduceJob
    from mapreduce_spark.session import get_spark

    spark = get_spark("mr-submit")
    spark.sparkContext.setLogLevel("ERROR")
    lines = spark.sparkContext.textFile(
        args.input_directory, minPartitions=args.num_mappers
    )
    job = MapReduceJob(
        mapper=args.mapper_executable,
        reducer=args.reducer_executable,
        num_reducers=args.num_reducers,
    )
    job.run(lines).saveAsTextFile(args.output_directory)
    parts = sorted(
        f for f in os.listdir(args.output_directory) if f.startswith("part-")
    )
    print(f"wrote {len(parts)} partitions to {args.output_directory}: {parts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
