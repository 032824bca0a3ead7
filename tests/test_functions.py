"""Unit tests for the shared column builders (functions/).

Analog of the reference's worker unit tests asserting exact map outputs
(/root/reference/tests/test_worker_04.py:105-115) — tiny inputs, exact
expected values.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pyspark.sql.functions as F
import pytest

from mapreduce_spark.functions.exact import dsum
from mapreduce_spark.functions.hashing import md5_long, md5_long_sql
from mapreduce_spark.functions.text import shingles, tokens
from mapreduce_spark.functions.vectors import (
    cosine,
    dot,
    dot_literal,
    hyperplane,
    sql_cosine_pair,
)

SAMPLES = ["", "hello", "the quick brown fox", "naïve café", "0|a b"]


def py_md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_md5_long_matches_hashlib(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", md5_long(F.col("s")).alias("h")).collect()}
    for s in SAMPLES:
        assert got[s] == py_md5_long(s), s


def test_md5_long_sql_matches_spark():
    con = duckdb.connect()
    for s in SAMPLES:
        (v,) = con.execute(f"SELECT {md5_long_sql('?')}", [s]).fetchone()
        assert v == py_md5_long(s), s


def test_tokens_lowercase_drop_empty(spark):
    rows = [
        ("  Hello\tWorld  foo ",),
        ("",),
        ("ONE",),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["text"])
    out = [r[0] for r in df.select(tokens("text").alias("t")).collect()]
    assert out == [["hello", "world", "foo"], [], ["one"], None]


def test_shingles_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], ["text"])
    out = [
        r[0]
        for r in df.select(shingles(tokens("text"), 3).alias("s")).collect()
    ]
    assert out == [["a b c", "b c d"], [], []]


def test_dsum_is_decimal_exact(spark):
    # 0.1 summed 1000 times: double accumulation drifts, decimal does not.
    df = spark.createDataFrame([(0.1,)] * 1000, ["v"]).repartition(8)
    (got,) = df.agg(dsum("v", "s")).collect()[0]
    assert got == 100.0


def test_dot_and_cosine_exact(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert row["d"] == pytest.approx(12.0)
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert row["c"] == pytest.approx(12.0 / (na * nb))


def test_cosine_matches_duckdb_bitwise(spark):
    a = [0.25, -1.5, 3.125, 0.0]
    b = [1.0, 2.0, -0.5, 4.25]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    (sc,) = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]
    con = duckdb.connect()
    (dc,) = con.execute(
        f"SELECT {sql_cosine_pair('a', 'b', dim=4)} FROM (SELECT {a} AS a, {b} AS b)"
    ).fetchone()
    assert sc == dc  # bit-identical, not approx — the oracle contract


def test_hyperplane_deterministic_and_bounded():
    p1 = hyperplane(2, 3, dim=16)
    p2 = hyperplane(2, 3, dim=16)
    assert p1 == p2
    assert all(-1.0 <= x <= 1.0 for x in p1)
    assert p1 != hyperplane(2, 4, dim=16)


def test_dot_literal_matches_python(spark):
    vec = [0.5, -0.25, 2.0]
    plane = [1.0, 2.0, -1.0]
    df = spark.createDataFrame([(vec,)], ["v"])
    (got,) = df.select(dot_literal(F.col("v"), plane).alias("d")).collect()[0]
    assert got == pytest.approx(sum(x * y for x, y in zip(vec, plane)))
