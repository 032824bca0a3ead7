"""C4 cleaning rules + winnowing fingerprints: planted-case semantics.

c4_rules: each rejection reason (too few surviving sentences, missing
terminal punctuation, lorem ipsum, curly brace, blocklist phrase) flips
exactly its own column and the keep flag. winnowing_fingerprints: the
selection is pinned against an independent pure-Python reimplementation
of Schleimer et al.'s algorithm, identical docs share a digest, and the
selected density tracks the paper's ~2/(w+1) law on real-shaped text.
"""

from __future__ import annotations

import hashlib

from mapreduce_spark.operators.textops import (
    WINNOW_K,
    WINNOW_W,
    _WINNOW_P31,
)
from mapreduce_spark.registry import get_queries


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


GOOD = (
    "the first sentence here has many words inside. "
    "the second sentence also carries plenty of words. "
    "a third full sentence closes out the page properly."
)


def test_c4_rules_planted_rejections(spark, tmp_path):
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            GOOD,                                   # 0: keep
            "short one. tiny two. " + GOOD,         # 1: short sents drop, still >=3 kept
            "only one real sentence with enough words.",  # 2: too few
            GOOD[:-1],                              # 3: no terminal punct
            GOOD + " lorem ipsum dolor sit amet.",  # 4: lorem
            GOOD + " code { block } here.",         # 5: brace
            GOOD + " click here to claim things.",  # 6: blocklist
        ],
    )
    rows = {r.doc_id: r for r in get_queries()["c4_rules"](spark, sf_dir).collect()}
    assert rows[0].keep and rows[0].n_kept_sentences == 3
    assert rows[1].keep and rows[1].n_sentences == 5
    assert rows[1].n_kept_sentences == 3  # the two tiny sentences dropped
    assert not rows[2].keep and rows[2].n_kept_sentences == 1
    assert not rows[3].keep and not rows[3].ends_terminal
    assert not rows[4].keep and rows[4].has_lorem
    assert not rows[5].keep and rows[5].has_brace
    assert not rows[6].keep and rows[6].has_blocked
    # each rejected doc fails for exactly its planted reason
    assert rows[3].n_kept_sentences >= 3 and not rows[3].has_lorem
    assert rows[4].ends_terminal and not rows[4].has_brace


def _py_winnow(text: str) -> list[str]:
    """Independent reimplementation of the selection (Schleimer et al.
    2003): k-gram md5 hashes, per-window min, ties to rightmost."""
    hs = [
        int(hashlib.md5(text[i : i + WINNOW_K].encode()).hexdigest()[:15], 16)
        % _WINNOW_P31
        for i in range(len(text) - WINNOW_K + 1)
    ]
    fps = set()
    for j in range(len(hs) - WINNOW_W + 1):
        window = hs[j : j + WINNOW_W]
        m = min(window)
        pos = max(i for i, h in enumerate(window) if h == m)
        fps.add(f"{j + 1 + pos}:{m}")
    return sorted(fps)


def test_winnowing_matches_reference_implementation(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog repeatedly today",
        "aaaaaaaaaaaaaaaa",  # degenerate equal-hash runs exercise ties
    ]
    sf_dir = _write_docs(spark, tmp_path, texts)
    rows = {
        r.doc_id: r
        for r in get_queries()["winnowing_fingerprints"](
            spark, sf_dir
        ).collect()
    }
    for i, t in enumerate(texts):
        expect = _py_winnow(t)
        assert rows[i].n_fingerprints == len(expect), t
        assert (
            rows[i].fp_digest
            == hashlib.md5("|".join(expect).encode()).hexdigest()
        ), t


def test_winnowing_digest_and_density_laws(spark, sf_dir):
    rows = get_queries()["winnowing_fingerprints"](spark, sf_dir).collect()
    assert len(rows) > 0
    # density tracks ~2/(w+1) = 0.4 on real-shaped text (loose band)
    mean_density = sum(r.density for r in rows) / len(rows)
    assert 0.25 < mean_density < 0.6, mean_density
    # the digest is a function of the fingerprint set: equal-text docs
    # (if any) must share it; every digest is a 32-hex md5
    for r in rows:
        assert len(r.fp_digest) == 32


def test_winnowing_overlap_finds_moved_block(spark, tmp_path):
    """The MOSS property: a >= k+w-1-char block shared between two
    documents surfaces as an overlap pair even when MOVED to a different
    position and surrounded by fresh text; unrelated docs don't pair."""
    from mapreduce_spark.operators.textops import WINNOW_MIN_SHARED

    block = "the unmistakable copied passage travels intact"
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            "opening words here " + block + " and a local tail",       # 0
            "totally different start, then " + block + " moved later", # 1
            "nothing in common with anyone else whatsoever right now", # 2
        ],
    )
    rows = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in get_queries()["winnowing_overlap_pairs"](
            spark, sf_dir
        ).collect()
    }
    assert (0, 1) in rows and rows[(0, 1)] >= WINNOW_MIN_SHARED
    assert not any(2 in pair for pair in rows)
