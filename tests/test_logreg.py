"""Invariants of the in-plan trained logistic-regression quality filter
(quality_logreg_train): oracle parity pins the exact weight trajectory;
these pin the LEARNING claims — integer state, real held-out improvement
over the zero-model, and a separable planted corpus driven to perfect
held-out accuracy.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_spark.operators.textops import (
    LOGREG_ROUNDS,
    _logreg_features,
)
from mapreduce_spark.registry import get_queries

SF_DIR = "/root/testdata/sf0.001"


def test_logreg_learns_on_testdata(spark):
    """Held-out accuracy must beat both the zero-model (z=0 predicts
    'reject' for every doc => accuracy = holdout reject share) and a
    0.7 floor by the final round, with every weight a BIGINT."""
    rows = (
        get_queries()["quality_logreg_train"](spark, SF_DIR)
        .orderBy("round")
        .collect()
    )
    assert [r["round"] for r in rows] == list(range(1, LOGREG_ROUNDS + 1))
    for r in rows:
        for c in ("w_bias", "w_len", "w_distinct", "w_stop"):
            assert isinstance(r[c], int), (c, r)
    f = _logreg_features(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ).filter(~F.col("is_train"))
    zero_model_acc = f.filter(F.col("y") == 0.0).count() / f.count()
    final = rows[-1]["holdout_acc"]
    assert final >= max(0.7, zero_model_acc + 0.05), (final, zero_model_acc)
    assert final >= rows[0]["holdout_acc"] - 1e-9


def test_logreg_separates_planted_corpus(spark):
    """On a corpus where the teacher label is determined by length alone
    (long docs pass, short docs fail, wide margin), gradient descent
    must reach PERFECT held-out accuracy within the trained rounds."""
    from mapreduce_spark.operators.textops import quality_logreg_train

    import os
    import tempfile

    rows = []
    for i in range(200):
        # Even ids train, odd ids hold out; label teacher: quality>=0.6.
        # 'aa bb cc ...' distinct tokens: long docs (80 tokens) score
        # 0.4*0.8+0.4*1.0+0.2*1.0 = 0.92 >= 0.6; short (5 tokens) score
        # 0.4*0.05+0.4*1+0.2*1 = 0.62... use repeated token to sink
        # distinct ratio: 'aa aa aa aa aa' -> 0.4*0.05+0.4*0.2+0.2*1.0
        # = 0.3 < 0.6.
        n = 80 if i % 4 < 2 else 5
        words = (
            [f"w{i}x{j}" for j in range(n)]
            if n == 80
            else ["aa"] * n
        )
        rows.append((i, " ".join(words), "en", "src", len(" ".join(words))))
    spool = tempfile.mkdtemp(prefix="logreg_planted_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(spool, "documents.parquet"))
    out = (
        quality_logreg_train(spark, spool)
        .orderBy("round")
        .collect()
    )
    assert out[-1]["holdout_acc"] == 1.0, [r["holdout_acc"] for r in out]
