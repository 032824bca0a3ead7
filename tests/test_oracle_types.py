"""Oracle output-type gate (VERDICT r9 #1).

Round 9's only official FAIL (`tpch_q12_priority_mix`) was an oracle-typing
defect: DuckDB typed two uncast ``SUM(CASE...)`` output columns as HUGEINT
(int128). The driver's value hash is type-sensitive — DuckDB's pandas
conversion widens HUGEINT to float64 while Spark returns int64 — so the
hash mismatched on bit-identical values. The local stringifying gate
masked it.

This gate runs DuckDB ``DESCRIBE`` over every registered oracle (plan-only,
no execution — the full 287-oracle sweep takes ~2 s) and fails on any
output column DuckDB types as HUGEINT / UHUGEINT / INT128. Companion to
tools/schema_sweep.py's array gate and tests/test_driver_canon.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_spark.registry import load_all

SF_SMOKE = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
BANNED = ("HUGEINT", "INT128")  # UHUGEINT contains HUGEINT


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield c
    c.close()


def _hugeint_cols(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rows = con.execute("DESCRIBE " + sql).fetchall()
    return [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in BANNED)
    ]


def test_no_oracle_emits_hugeint_output_columns(con):
    offenders = {}
    for name, spec in load_all().items():
        bad = _hugeint_cols(con, spec.oracle)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles with HUGEINT/INT128 output columns (driver hash will "
        f"mismatch Spark's BIGINT on identical values — wrap in "
        f"CAST(... AS BIGINT)): {offenders}"
    )


def test_gate_fires_on_a_seeded_hugeint_oracle(con):
    # Prove the detector works: an uncast SUM(CASE...) over a BIGINT view
    # is exactly the q12 defect shape and must be flagged.
    seeded = """
    SELECT SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS n
    FROM orders
    """
    assert _hugeint_cols(con, seeded) == [("n", "HUGEINT")]
    fixed = """
    SELECT CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
    FROM orders
    """
    assert _hugeint_cols(con, fixed) == []
