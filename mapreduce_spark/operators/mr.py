"""MapReduce-compat layer: the reference's executable contract on Spark.

The reference's ONLY query interface is "run a mapper executable and a
reducer executable inside a (map -> hash-partition-by-key -> sort ->
merge -> reduce) skeleton" (/root/reference/mapreduce/worker/__main__.py:
94-155). ``MapReduceJob`` reproduces that contract with RDD ``pipe``:

  lines.pipe(mapper)                               # map stage, stdin->stdout
       .map(line -> (line, None))
       .repartitionAndSortWithinPartitions(        # shuffle: md5(key) % R
            R, md5-of-first-tab-key, sort by whole line)
       .keys().pipe(reducer)                       # reduce stage

Semantics preserved from the reference:
- key = text before the FIRST tab; the EMPTY STRING is a valid key
  (worker __main__.py:105; tests/test_worker_04.py:109-115);
- partition = md5(key) mod R (worker __main__.py:106-109) — so each key's
  lines land in one reduce partition and per-partition counts are global;
- reduce input sorted by WHOLE LINE within each partition (worker
  __main__.py:130-136,151-155), so reducers may rely on adjacency;
- the reducer executable sees all lines of a key contiguously.

Difference (documented, not semantic): the reference pipes each FILE
through one mapper process; we pipe each PARTITION. Identical results for
stateless line-oriented executables — the only kind the reference's test
corpus contains.

This is the slow path by design — subprocess pipes can never beat the
native DataFrame operators — but it proves capability parity: a user of
the reference can run their existing executables unchanged.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mapreduce_spark.registry import register
from mapreduce_spark.sources.tables import load_table

EXEC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "exec")


def _md5_partition(line_key: str) -> int:
    """The reference's shuffle hash: int(md5(key).hexdigest(), 16)
    (worker __main__.py:106-109). Spark applies `% numPartitions`."""
    return int(hashlib.md5(line_key.encode()).hexdigest(), 16)


class MapReduceJob:
    """A reference job: (mapper exe, reducer exe, num_reducers).

    ``run`` takes an RDD of input lines and returns an RDD of output
    lines — the analog of submit.py's (input dir -> output dir) contract
    with directories replaced by RDDs/DataFrames.
    """

    def __init__(
        self,
        mapper: str,
        reducer: str,
        num_reducers: int = 4,
        env: dict[str, str] | None = None,
    ):
        self.mapper = mapper
        self.reducer = reducer
        self.num_reducers = num_reducers
        # Environment passed to both executables — the analog of invoking
        # the reference's mapper with CLI args (grep_map.py accepts the
        # query as argv[1]; our exec/ scripts read it from the env).
        self.env = env or {}

    def run(self, lines):
        mapped = lines.pipe(self.mapper, env=self.env)
        shuffled = (
            mapped.map(lambda line: (line, None))
            .repartitionAndSortWithinPartitions(
                numPartitions=self.num_reducers,
                partitionFunc=lambda line: _md5_partition(line.split("\t", 1)[0]),
            )
            .keys()
        )
        return shuffled.pipe(self.reducer, env=self.env)


# ---------------------------------------------------------------------------
@register(
    "pipe_exec",
    oracle="""
    SELECT word, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(lower(text), '[ \t\\[\\]]')) AS word
        FROM documents)
    GROUP BY word
    """,
)
def pipe_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q19: word count run through ACTUAL executables
    (mapreduce_spark/exec/wc_map.py + wc_reduce.py, contract-identical to
    the reference's wc_map.sh/wc_reduce.sh) via the MR-compat pipe layer.

    The oracle counts every split segment — including empty-string keys
    from consecutive delimiters, the reference's trademark edge case —
    because pipe() terminates each element with a newline, making per-doc
    segments exactly string_split_regex(text).
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    lines = docs.rdd.map(lambda r: r[0] if r[0] is not None else "")
    job = MapReduceJob(
        mapper=f"python3 {EXEC_DIR}/wc_map.py",
        reducer=f"python3 {EXEC_DIR}/wc_reduce.py",
        num_reducers=4,
    )
    out = job.run(lines)
    parsed = out.map(lambda line: line.split("\t", 1)).map(
        lambda kv: (kv[0], int(kv[1]))
    )
    schema = StructType(
        [StructField("word", StringType(), True), StructField("cnt", LongType(), True)]
    )
    return spark.createDataFrame(parsed, schema)


@register(
    "pipe_grep",
    oracle="""
    SELECT text AS line FROM documents WHERE contains(lower(text), 'data')
    """,
)
def pipe_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's second canonical workload (grep) through the pipe
    layer: mapper emits `1\\tline` on match, reducer projects the value —
    single key '1' means one reducer sees all matches sorted, exactly the
    reference's grep_reduce contract."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    lines = docs.rdd.map(lambda r: r[0] if r[0] is not None else "")
    job = MapReduceJob(
        mapper=f"python3 {EXEC_DIR}/grep_map.py",
        reducer=f"python3 {EXEC_DIR}/grep_reduce.py",
        num_reducers=2,
    )
    out = job.run(lines)
    schema = StructType([StructField("line", StringType(), True)])
    return spark.createDataFrame(out.map(lambda x: (x,)), schema)


def run_dir_job(
    spark,
    input_directory: str,
    output_directory: str,
    mapper: str,
    reducer: str,
    num_reducers: int = 2,
    env: dict[str, str] | None = None,
) -> None:
    """Full file-contract parity with the reference's job submission
    (/root/reference/mapreduce/submit.py:70-78): read a directory of text
    files, run the executable pipeline, write one output file per reduce
    partition. ``saveAsTextFile`` names parts ``part-00000..`` — the same
    scheme as the reference's ``part-{t:05d}``
    (/root/reference/mapreduce/worker/__main__.py:141-149) — and each part
    is sorted because the reducer consumes its partition in sorted order,
    reproducing the reference's sorted-within-partition output property
    (tests/test_worker_08.py:229-245)."""
    lines = spark.sparkContext.textFile(input_directory)
    out = MapReduceJob(mapper, reducer, num_reducers=num_reducers, env=env).run(lines)
    out.saveAsTextFile(output_directory)
