"""Parquet table loaders for the driver-generated star schema.

Reference analog: the reference's only source is "glob a directory of text
files" (/root/reference/mapreduce/manager/__main__.py:257-259). Here the
source layer is columnar parquet with schema normalization; text sources
live in sources/readers.py.

Scale note: loaders return lazy DataFrames — predicate pushdown and column
pruning reach the parquet scan because nothing here forces materialization.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduce_spark.session import tune_session

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (spark.sql.legacy.parquet.nanosAsLong) and we rebuild timestamp_ntz.
_NANOS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def _nanos_to_ts_ntz(col: str):
    # timestampadd on a fixed NTZ epoch is session-timezone-independent,
    # matching a UTC-naive oracle exactly (nanos floored to micros, the
    # same truncation DuckDB applies reading TIMESTAMP_NS).
    return F.expr(
        f"timestampadd(MICROSECOND, {col} div 1000, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias(col)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, normalizing nanos-timestamp columns to timestamp_ntz."""
    tune_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, _nanos_to_ts_ntz(col))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load several tables at once; see load_table."""
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so operators can also be expressed via spark.sql."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
