"""PySpark-native analytics engine with the capabilities of
zhangjames01/485-mapreduce (UMich EECS 485 P4 MapReduce job server).

The reference executes (map -> hash-partition -> sort -> merge -> reduce)
over line-oriented text via user executables
(/root/reference/mapreduce/worker/__main__.py:94-155). This package
re-expresses that algebra Spark-first:

- ``operators/``  — the declared relational + LLM-pipeline operator
  inventory (SURVEY.md §2C), pure DataFrame API, Catalyst-optimized.
- ``sources/``    — table loaders (parquet/text/csv/json) with schema
  normalization (nanos timestamps -> timestamp_ntz).
- ``functions/``  — reusable column expression builders (exact decimal
  aggregation, tokenization, md5-based hashing, vector math).
- ``streaming/``  — Structured Streaming over the events table.
- ``plans/``      — plan inspection helpers (explain/shuffle audits).
- ``operators/mr.py`` — the MapReduce-compat layer (``rdd.pipe``)
  reproducing the reference's stdin/stdout executable contract.
- ``compat.py``   — blocking ``Manager``/``Worker`` constructors speaking
  the reference's TCP/UDP wire protocol (register/heartbeat/shutdown/
  new_manager_job), jobs executed by the Spark engine. Mirrors the
  reference package's two exports (/root/reference/mapreduce/__init__.py:8-9).
"""

from mapreduce_spark.session import get_spark, tune_session
from mapreduce_spark.registry import REGISTRY, get_queries, get_oracles
from mapreduce_spark.compat import Manager, Worker

__all__ = [
    "get_spark", "tune_session", "REGISTRY", "get_queries", "get_oracles",
    "Manager", "Worker",
]

__version__ = "0.1.0"
