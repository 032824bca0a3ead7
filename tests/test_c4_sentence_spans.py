"""C4 three-sentence-span dedup on a planted two-page corpus.

Raffel et al. 2020 §2.2 semantics: of any three-sentence span occurring
more than once, exactly one occurrence (the least (doc_id, start))
survives; later occurrences lose the covered SENTENCES, not the page.
A two-sentence overlap is below the span width and must survive
everywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_spark.operators.textops import dedup_c4_sentence_spans


def _corpus(spark, tmp_path):
    boiler = (
        "Subscribe to our newsletter today. "
        "All rights reserved by the publisher. "
        "Terms of service apply to every visitor."
    )
    page_a = f"Original reporting opens this page. {boiler} Unique closing thought here."
    # same 3-sentence block re-served on a later page
    page_b = f"Completely different opener for page two. {boiler} Another distinct ending."
    # only a 2-sentence overlap: below the span width, must survive
    page_c = (
        "Fresh first sentence on page three. "
        "All rights reserved by the publisher. "
        "Terms of service apply to every visitor. "
        "But its third sentence differs entirely."
    )
    spark.createDataFrame(
        [
            (1, "en", page_a, "srcA"),
            (5, "en", page_b, "srcB"),
            (9, "en", page_c, "srcC"),
        ],
        "doc_id long, lang string, text string, source string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_keep_first_excises_only_later_full_spans(spark, tmp_path):
    sf = _corpus(spark, tmp_path)
    rows = {
        r["doc_id"]: r for r in dedup_c4_sentence_spans(spark, sf).collect()
    }
    # keeper page: all 5 sentences intact
    assert rows[1]["n_removed"] == 0
    assert "Subscribe to our newsletter today" in rows[1]["clean_text"]
    # later page: exactly the 3 boilerplate sentences excised
    assert rows[5]["n_removed"] == 3
    assert "Subscribe" not in rows[5]["clean_text"]
    assert "Completely different opener" in rows[5]["clean_text"]
    assert "Another distinct ending" in rows[5]["clean_text"]
    # 2-sentence overlap is below the span width: nothing removed
    assert rows[9]["n_removed"] == 0
    assert "All rights reserved" in rows[9]["clean_text"]


def test_punctuation_free_corpus_passes_through(spark, sf_dir):
    # the driver testdata has no sentence delimiters — every doc is one
    # sentence, no 3-spans exist, and the operator must be the identity
    # on sentence counts
    out = dedup_c4_sentence_spans(spark, sf_dir)
    agg = out.agg(
        F.sum("n_removed").alias("rm"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert agg["rm"] == 0 and agg["n"] > 0
