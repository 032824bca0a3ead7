"""Cross-engine deterministic hashing (md5-derived 60-bit integers).

The reference shuffles with md5-mod-R
(/root/reference/mapreduce/worker/__main__.py:106-109). We reuse md5 for a
different purpose: MinHash/SimHash signatures that an external SQL oracle
can reproduce bit-for-bit, because md5 is available in both engines while
Spark's murmur3/xxhash64 are not available in DuckDB.

md5_long(x) = first 15 hex digits of md5(x) parsed base-16 -> [0, 2^60),
always non-negative, fits in a BIGINT in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def md5_long(c: Column) -> Column:
    """60-bit integer hash of a string column (oracle-reproducible)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str) -> str:
    """DuckDB fragment equal to md5_long for the same string expression."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def md5_long2(c: Column) -> Column:
    """The OTHER 60 bits of the md5 (hex chars 16..30). Pairing this with
    md5_long gives a 120-bit key whose birthday-collision odds are
    negligible at any corpus size (n^2/2^121), where a single 60-bit key
    predicts thousands of collisions at ~1e11 rows."""
    return F.conv(F.substring(F.md5(c), 16, 15), 16, 10).cast("bigint")


def md5_long2_sql(expr: str) -> str:
    """DuckDB fragment equal to md5_long2 for the same expression."""
    return f"CAST('0x' || substring(md5({expr}), 16, 15) AS BIGINT)"
