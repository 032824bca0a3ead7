"""Multi-iteration BPE training: hand-computed merge chain + the greedy
non-overlapping rewrite law.

The fixture corpus is chosen so the three learned rules CHAIN — the
second merge consumes the first's output symbol ("h e" -> "he", then
"t he" -> "the"), which a single pair count (bpe_pair_merge) can never
produce — and so ties exercise the (cnt DESC, pair ASC) election.

    words: the x3, then x1, aaaa x1
    iter 0: pairs {t h: 4, h e: 4, e n: 1, a a: 3} -> "h e" (tie, ASC)
    iter 1: pairs {t he: 4, he n: 1, a a: 3}       -> "t he"
    iter 2: pairs {the n: 1, a a: 3}               -> "a a"

The rewrite helper is additionally pinned on the overlap case BPE is
defined by: |a|a|a|a| under rule (a, a) must become |aa|aa| (greedy
left-to-right, no overlap), never |aa|a|a| (a single literal replace
pass) or |a|aa|a|.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_spark.operators.textops import (
    _bpe_merge_frame,
    bpe_train_iters,
)


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_merge_rules_chain(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, ["the the then", "the aaaa"])
    rows = sorted(
        bpe_train_iters(spark, sf_dir).collect(), key=lambda r: r["iter"]
    )
    got = [(r["iter"], r["pair"], r["merged"], r["cnt"]) for r in rows]
    assert got == [
        (0, "h e", "he", 4),
        (1, "t he", "the", 4),
        (2, "a a", "aa", 3),
    ]


def test_rewrite_is_greedy_nonoverlapping(spark):
    wf = spark.createDataFrame([("|a|a|a|a|", 1)], "w string, f long")
    best = spark.createDataFrame(
        [("a a", 3, "a", "a")], "pair string, cnt long, a string, b string"
    )
    out = _bpe_merge_frame(wf, best).collect()
    assert out[0]["w"] == "|aa|aa|"


def test_rewrite_catches_first_pass_misses(spark):
    """Alternating occurrences: one literal pass merges occurrences 1 and
    3 only (the shared delimiter of 2 and 4 is consumed); the second
    pass must finish the job — |ab|ab|ab|ab|."""
    wf = spark.createDataFrame([("|a|b|a|b|a|b|a|b|", 1)], "w string, f long")
    best = spark.createDataFrame(
        [("a b", 4, "a", "b")], "pair string, cnt long, a string, b string"
    )
    out = _bpe_merge_frame(wf, best).collect()
    assert out[0]["w"] == "|ab|ab|ab|ab|"


def test_apply_segments_with_learned_rules(spark, tmp_path):
    """After the three learned merges (h e -> he, t he -> the, a a -> aa)
    the vocabulary must segment as: the -> [the], then -> [the, n],
    aaaa -> [aa, aa] (the greedy non-overlap on the last rule)."""
    from mapreduce_spark.operators.textops import bpe_apply

    sf_dir = _write_docs(spark, tmp_path, ["the the then", "the aaaa"])
    got = {
        r["word"]: (list(r["symbols"]), r["n_symbols"], r["f"])
        for r in bpe_apply(spark, sf_dir).collect()
    }
    assert got == {
        "the": (["the"], 1, 3),
        "then": (["the", "n"], 2, 1),
        "aaaa": (["aa", "aa"], 2, 1),
    }
