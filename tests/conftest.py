"""Shared fixtures: one tuned SparkSession per test session.

Mirrors the reference's test harness role (/root/reference/tests/utils/
__init__.py spawns real Manager+Worker processes); here the "cluster" is
the tuned local session from mapreduce_spark.session.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"
REF_INPUT = "/root/reference/tests/testdata/input"
REF_CORRECT = "/root/reference/tests/testdata/correct"


@pytest.fixture(scope="session")
def spark():
    from mapreduce_spark.session import get_spark

    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
