"""SQ8 scalar quantization: code-domain, reconstruction-bound, recall.

8 bits per dimension against per-dimension corpus ranges is ~lossless
for neighbor RANKING (measured recall 1.0 at sf0.01 next to trained
PQ's 0.32) — these tests pin the integer contracts that make that true
on both engines: codes stay in [0, 255], every reconstruction sits
within one grid step of its input, and the recall report's sq8 tier
clears 0.9 on the driver testdata.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_spark.operators.similarity import SQ_LEVELS, _sq8_frame
from mapreduce_spark.sources.tables import load_table


def test_sq8_codes_in_byte_domain_and_reconstruction_bounded(spark, sf_dir):
    f = _sq8_frame(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    mnmx = f.groupBy("pos").agg(
        F.min("xq").alias("mn"), F.max("xq").alias("mx")
    )
    checked = f.join(mnmx, "pos").select(
        "code",
        (F.abs(F.col("xq") - F.col("rq"))
         - (F.col("mx") - F.col("mn")) / SQ_LEVELS - 1).alias("slack"),
    )
    row = checked.agg(
        F.min("code").alias("cmin"),
        F.max("code").alias("cmax"),
        F.max("slack").alias("worst"),
    ).collect()[0]
    assert 0 <= row["cmin"] and row["cmax"] <= SQ_LEVELS
    # |xq - rq| <= (mx-mn)/255 + 1: one affine grid step (+1 for the
    # truncating divisions on both sides)
    assert row["worst"] <= 0, row["worst"]


def test_sq8_recall_is_near_lossless(spark, sf_dir):
    from mapreduce_spark.registry import get_queries

    rows = get_queries()["sq8_recall_report"](spark, sf_dir).collect()
    sq8 = [r["recall"] for r in rows if r["tier"] == "sq8"]
    assert sq8 and min(sq8) >= 0.9, rows
