"""Physical-plan inspection helpers (see audit.py)."""

from mapreduce_spark.plans.audit import (
    broadcast_join_count,
    exchange_count,
    has_cartesian,
    physical_plan,
    scan_read_schemas,
    scans_with_pushed_filters,
)

__all__ = [
    "physical_plan",
    "exchange_count",
    "broadcast_join_count",
    "has_cartesian",
    "scan_read_schemas",
    "scans_with_pushed_filters",
]
