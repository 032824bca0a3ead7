"""Tri-engine parity: every TPC-H oracle is ANSI enough to run UNCHANGED
through spark.sql() and reproduce the DataFrame plan's rows exactly.

The driver already checks DataFrame-vs-DuckDB; this closes the triangle
(DataFrame == Spark SQL == DuckDB) and proves the declared SQL surface is
a real second API, not just test scaffolding: a SQL-only user can run the
whole TPC-H suite on this engine by pasting the documented queries.
"""

from __future__ import annotations

import pytest

from mapreduce_spark.registry import get_oracles, get_queries
from mapreduce_spark.sources.tables import TABLE_NAMES, register_views


def _canon(rows):
    return sorted(tuple(str(x) for x in r) for r in rows)


@pytest.mark.seal
def test_tpch_oracles_run_unchanged_on_spark_sql(spark, sf_dir):
    oracles, qs = get_oracles(), get_queries()
    names = [n for n in sorted(oracles) if n.startswith("tpch_")]
    assert len(names) >= 17
    register_views(spark, sf_dir)
    try:
        for name in names:
            via_sql = _canon(spark.sql(oracles[name]).collect())
            via_df = _canon(qs[name](spark, sf_dir).collect())
            assert via_sql == via_df, f"{name}: spark.sql != DataFrame"
    finally:
        for t in TABLE_NAMES:
            spark.catalog.dropTempView(t)
