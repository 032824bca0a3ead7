"""Non-parquet source loaders: text directories, CSV, JSON.

Reference analog: the reference's only data source is "glob all files in a
directory of plain text, sorted by basename"
(/root/reference/mapreduce/manager/__main__.py:257-259), one record per
line. ``read_text_dir`` is that source as a DataFrame; csv/json loaders
round out the ingest surface. All loaders return lazy DataFrames so
pruning/pushdown reach the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_text_dir(spark: SparkSession, directory: str, with_file: bool = False) -> DataFrame:
    """Directory-of-text-files source: one row per line, column ``value``.

    ``with_file=True`` adds the source filename (the reference's
    round-robin split key; in Spark the split policy is the scheduler's —
    only the filename's identity is ever semantic)."""
    df = spark.read.text(f"{directory.rstrip('/')}/*")
    if with_file:
        df = df.withColumn("input_file", F.input_file_name())
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV loader; pass an explicit schema at scale (inference = extra scan)."""
    reader = spark.read.option("header", header).option("delimiter", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines loader; explicit schema avoids the inference scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_kv_lines(spark: SparkSession, directory: str) -> DataFrame:
    """Text dir parsed into the reference's KV model: key = text before
    the FIRST tab (may be empty), value = the rest
    (/root/reference/mapreduce/worker/__main__.py:105)."""
    lines = read_text_dir(spark, directory)
    return lines.select(
        F.substring_index("value", "\t", 1).alias("key"),
        F.expr("substring(value, length(substring_index(value, '\t', 1)) + 2)").alias(
            "val"
        ),
    )
