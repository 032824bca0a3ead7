"""Shared column-expression helpers: exact decimal aggs, text, hashing."""

from mapreduce_spark.functions.exact import dsum, davg, dsum_expr
from mapreduce_spark.functions.text import tokens, shingles
from mapreduce_spark.functions.hashing import md5_long, md5_long_sql

__all__ = [
    "dsum",
    "davg",
    "dsum_expr",
    "tokens",
    "shingles",
    "md5_long",
    "md5_long_sql",
]
