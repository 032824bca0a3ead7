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
import pytest

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
    """Alternating occurrences: a single literal replace pass merges
    occurrences 1 and 3 only (the shared delimiter of 2 and 4 is
    consumed); the greedy fold must merge all four — |ab|ab|ab|ab|."""
    wf = spark.createDataFrame([("|a|b|a|b|a|b|a|b|", 1)], "w string, f long")
    best = spark.createDataFrame(
        [("a b", 4, "a", "b")], "pair string, cnt long, a string, b string"
    )
    out = _bpe_merge_frame(wf, best).collect()
    assert out[0]["w"] == "|ab|ab|ab|ab|"


def test_rewrite_odd_self_merge_runs(spark):
    """The case that broke the r5 two-pass replace (ADVICE r5, high):
    greedy left-to-right on a 5-run of a self-merging symbol yields
    [aa, aa, a] — the two-pass replace produced [aa, a, aa], and on a
    6-run 4 symbols where greedy gives 3. Both runs pinned here, plus a
    tail that must not merge leftward through the merged symbol."""
    wf = spark.createDataFrame(
        [
            ("|a|a|a|a|a|", 1),      # 5-run
            ("|a|a|a|a|a|a|", 2),    # 6-run
            ("|x|a|a|a|y|", 3),      # interior 3-run
        ],
        "w string, f long",
    )
    best = spark.createDataFrame(
        [("a a", 9, "a", "a")], "pair string, cnt long, a string, b string"
    )
    got = {r["f"]: r["w"] for r in _bpe_merge_frame(wf, best).collect()}
    assert got == {
        1: "|aa|aa|a|",
        2: "|aa|aa|aa|",
        3: "|x|aa|a|y|",
    }


def test_train_oracle_parity_on_self_merge_runs(spark, tmp_path):
    """End-to-end Spark-vs-DuckDB parity on a corpus whose argmax rule
    self-merges over >= 5-length runs — exactly where the r5 two-pass
    replace and any non-greedy oracle would diverge. Both the learned
    rule chain and the final segmentation must agree engine-for-engine."""
    import duckdb

    from mapreduce_spark.operators.textops import bpe_apply
    from mapreduce_spark.registry import REGISTRY

    sf_dir = _write_docs(spark, tmp_path, ["zzzzz zzzzzz zz", "zzzzz q"])
    # symbols ships as the '|'-joined string (driver-canon-safe)
    spark_rows = sorted(
        (r["word"], tuple(r["symbols"].split("|")), r["n_symbols"], r["f"])
        for r in bpe_apply(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle_rows = sorted(
        (w, tuple(s.split("|")), n, f)
        for w, f, s, n in con.execute(REGISTRY["bpe_apply"].oracle).fetchall()
    )
    assert spark_rows == oracle_rows
    # greedy chain: iter0 (z,z) makes zzzzz -> [zz,zz,z] (NOT the
    # two-pass [zz,z,zz]); iter1 then elects (zz,zz) on cnt 4 — under
    # the old rewrite that count was 2 and a tie broke differently —
    # and iter2 (zzzz,z) folds zzzzz to a single symbol.
    seg = {w: list(s) for w, s, _, _ in spark_rows}
    assert seg["zzzzz"] == ["zzzzz"]
    assert seg["zzzzzz"] == ["zzzz", "zz"]
    assert seg["zz"] == ["zz"]


def test_apply_segments_with_learned_rules(spark, tmp_path):
    """After the three learned merges (h e -> he, t he -> the, a a -> aa)
    the vocabulary must segment as: the -> [the], then -> [the, n],
    aaaa -> [aa, aa] (the greedy non-overlap on the last rule)."""
    from mapreduce_spark.operators.textops import bpe_apply

    sf_dir = _write_docs(spark, tmp_path, ["the the then", "the aaaa"])
    got = {
        r["word"]: (r["symbols"].split("|"), r["n_symbols"], r["f"])
        for r in bpe_apply(spark, sf_dir).collect()
    }
    assert got == {
        "the": (["the"], 1, 3),
        "then": (["the", "n"], 2, 1),
        "aaaa": (["aa", "aa"], 2, 1),
    }


@pytest.mark.seal
def test_token_count_monotone_nonincreasing_in_depth(spark, tmp_path):
    """Each merge rule rewrites some (>= 0) adjacent pair occurrences
    into single symbols, so the corpus token count under the learned
    vocab can only fall (or stall) as merge depth grows — the law the
    production bpe_token_count query rides (VERDICT r5 #6). Swept over
    depths 0..16 on a corpus with chaining merges AND self-merge runs
    (the case the r5 two-pass rewrite broke)."""
    from mapreduce_spark.operators.textops import _bpe_run

    sf_dir = _write_docs(
        spark,
        tmp_path,
        ["the the then there", "aaaaaa aaaa zzzzz", "banana bandana"],
    )
    syms = "filter(split(w, '\\\\|'), s -> s <> '')"
    counts = []
    for n in [0, 1, 2, 4, 8, 16]:
        _, wf = _bpe_run(spark, sf_dir, n_iters=n, checkpoint=n > 4)
        counts.append(
            wf.agg(
                F.sum(F.expr(f"f * size({syms})")).cast("bigint")
            ).collect()[0][0]
        )
    assert counts == sorted(counts, reverse=True), counts
    assert counts[-1] < counts[0], "16 merges must actually shrink tokens"


def test_tokenizer_fertility_partitions_the_corpus_token_count(spark):
    """Per-lang token counts are a PARTITION of the corpus count: summing
    the fertility card's n_tokens / n_words across langs must equal
    bpe_token_count's corpus totals exactly (same trained vocabulary,
    same word definition); fertility >= 1 since every word is at least
    one symbol."""
    from mapreduce_spark.registry import get_queries

    sf = "/root/testdata/sf0.001"
    card = get_queries()["tokenizer_fertility"](spark, sf).collect()
    total = get_queries()["bpe_token_count"](spark, sf).collect()[0]
    assert sum(r.n_tokens for r in card) == total.n_tokens
    assert all(r.fertility >= 1.0 for r in card)
    assert all(r.chars_per_token > 0 for r in card)


def test_persisted_vocab_reproduces_in_session_tokenization(spark, sf_dir):
    """The artifact lifecycle law: tokenizing from the STORED rules table
    alone must reproduce the in-session trained tokenization exactly."""
    from mapreduce_spark.operators.textops import (
        bpe_token_count,
        bpe_vocab_persisted,
    )

    persisted = bpe_vocab_persisted(spark, sf_dir).collect()
    in_session = bpe_token_count(spark, sf_dir).collect()
    assert [tuple(r) for r in persisted] == [tuple(r) for r in in_session]
