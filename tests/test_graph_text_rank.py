"""Exact-row tests for repetition_stats, bm25_topk, pagerank_transitions,
and dedup_incremental over hand-built micro tables.

PageRank is checked against an independent pure-Python fixpoint using the
same integer micro-unit arithmetic, so the expected values come from
neither Spark nor DuckDB.
"""

from __future__ import annotations

import datetime as dt

import pytest

from mapreduce_spark.registry import get_queries


@pytest.fixture(scope="module")
def micro_sf(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("graph_micro")

    def write(name: str, rows, schema: str):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{name}.parquet")

    write(
        "documents",
        [
            (0, "en", "Hello world hello"),
            (1, "en", ""),
            (2, "de", "world world"),
            (3, "en", "the quick brown fox jumps"),  # odd -> incoming batch
            (4, "en", "The quick brown fox jumps"),  # even -> indexed corpus
            (5, "en", "spark query merge"),
            (6, "en", "spark spark spark"),
            (7, "en", "other words only here"),
        ],
        "doc_id long, lang string, text string",
    )
    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    write(
        "events",
        [
            (1, t(0), 1, "click", 1.0, "{}"),
            (2, t(8), 1, "click", 1.0, "{}"),
            (3, t(12), 1, "error", 1.0, "{}"),
            (4, t(15), 1, "purchase", 9.0, "{}"),
            (5, t(0), 2, "error", 1.0, "{}"),
            (6, t(0), 3, "click", 1.0, "{}"),
            (7, t(5), 3, "error", 1.0, "{}"),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    return str(root)


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_repetition_stats_exact(spark, micro_sf):
    df = get_queries()["repetition_stats"](spark, micro_sf)
    got = {
        r["doc_id"]: (r["n_tokens"], r["top_bigram_frac"], r["dup_trigram_frac"])
        for r in df.collect()
    }
    # docs 1 (empty) and 2 (two tokens) are excluded (< 3 tokens)
    assert got[0] == (3, 0.5, 0.0)  # "hello world"/"world hello" 1 each of 2
    assert got[3] == (5, 0.25, 0.0)  # 4 distinct bigrams
    assert got[4] == got[3]  # case-normalized twin
    assert 1 not in got and 2 not in got
    # a degenerate repeated doc: all mass on one bigram
    rep = spark.createDataFrame(
        [(99, "en", "ha ha ha ha")], "doc_id long, lang string, text string"
    )
    rep.write.mode("overwrite").parquet(f"{micro_sf}/rep_tmp/documents.parquet")
    df2 = get_queries()["repetition_stats"](spark, f"{micro_sf}/rep_tmp")
    r = df2.collect()[0]
    assert r["top_bigram_frac"] == 1.0  # "ha ha" x3 of 3
    assert r["dup_trigram_frac"] == 0.5  # ["ha ha ha"] x2 -> 1 dup of 2


def test_bm25_ranks_multi_term_doc_first(spark, micro_sf):
    df = get_queries()["bm25_topk"](spark, micro_sf)
    got = [r["doc_id"] for r in df.collect()]
    # doc 5 hits all three query terms (idf-rich), doc 6 only repeats
    # 'spark'; docs without any query term never appear.
    assert got[0] == 5
    assert got[1] == 6
    assert set(got) == {5, 6}
    scores = {r["doc_id"]: r["bm25"] for r in df.collect()}
    assert scores[5] > scores[6] > 0


def _py_pagerank(edges, nodes, iters=3, scale=1_000_000_000_000):
    """Independent integer-unit PageRank (same arithmetic, pure Python)."""
    out_w = {}
    for (s, _), w in edges.items():
        out_w[s] = out_w.get(s, 0) + w
    n = len(nodes)
    ranks = {v: scale // n for v in nodes}
    for _ in range(iters):
        sums = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            sums[d] += (ranks[s] * w) // out_w[s]
        ranks = {
            v: (15 * scale) // (100 * n) + (17 * sums[v]) // 20 for v in nodes
        }
    return ranks


def test_pagerank_exact_vs_python(spark, micro_sf):
    df = get_queries()["pagerank_transitions"](spark, micro_sf)
    got = {r["event_type"]: r["rank_units"] for r in df.collect()}
    # transitions: u1 click->click, click->error, error->purchase; u3 click->error
    edges = {("click", "click"): 1, ("click", "error"): 2, ("error", "purchase"): 1}
    expected = _py_pagerank(edges, ["click", "error", "purchase"])
    assert got == expected
    # rank mass stays <= 1 and every node keeps at least the teleport term
    assert sum(got.values()) <= 1_000_000_000_000
    assert min(got.values()) >= (15 * 1_000_000_000_000) // 300


def test_perplexity_bigram_hand_computed(spark, tmp_path):
    # corpus: "a b a b" and "a b" -> c("a b")=3, c("b a")=1, ctx a=3 b=1, V=2
    spark.createDataFrame(
        [(1, "en", "a b a b"), (2, "en", "a b")],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    df = get_queries()["perplexity_bigram"](spark, str(tmp_path))
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"]) for r in df.collect()}
    # P(b|a) = 4/5 -> nll 0.223144; P(a|b) = 2/3 -> nll 0.405465
    assert got[2] == (1, 0.223144)
    # doc 1: (2*223144 + 405465) div 3 = 283917 micro -> 0.283917
    # (truncating micro average; engine-identical, unlike a rounded
    # double quotient)
    assert got[1] == (3, 0.283917)
    # the repeated-bigram doc is more "fluent" (lower nll) than uniform
    assert got[1][1] > got[2][1]


def test_bpe_pair_merge_weights_by_word_frequency(spark, tmp_path):
    # words: "aaa" f=2 (pairs "aa" x2 each), "ab" f=1 -> aa:4, ab:1
    spark.createDataFrame(
        [(1, "en", "aaa ab"), (2, "en", "aaa")],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    df = get_queries()["bpe_pair_merge"](spark, str(tmp_path))
    assert [(r["pair"], r["cnt"]) for r in df.collect()] == [("aa", 4), ("ab", 1)]


def test_dup_span_stats_flags_cross_doc_copies(spark, micro_sf):
    df = get_queries()["dup_span_stats"](spark, micro_sf)
    got = {r["doc_id"]: (r["n_spans"], r["n_dup"], r["dup_frac"]) for r in df.collect()}
    # docs 3/4 are normalized twins: their single 5-gram span occurs twice
    # corpus-wide -> fully duplicated
    assert got[3] == (1, 1, 1.0)
    assert got[4] == (1, 1, 1.0)
    # every other >=5-token doc shares no 5-gram with anything
    for d, (n, ndup, frac) in got.items():
        if d not in (3, 4):
            assert ndup == 0 and frac == 0.0


def test_train_test_split_coassigns_duplicates(spark, micro_sf):
    df = get_queries()["train_test_split"](spark, micro_sf)
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in df.collect()}
    assert set(got) == set(range(8))  # every doc assigned exactly once
    # docs 3/4 differ only in case -> same normalized content -> same split
    assert got[3] == got[4]
    assert all(s in {"train", "valid", "test"} for _, s in got.values())


def test_dedup_incremental_finds_cross_half_twin(spark, micro_sf):
    df = get_queries()["dedup_incremental"](spark, micro_sf)
    got = rows(df, "new_doc", "old_doc", "jaccard")
    assert (3, 4, 1.0) in got  # odd batch doc 3 matches indexed even doc 4
    for new_doc, old_doc, _ in got:
        assert new_doc % 2 == 1 and old_doc % 2 == 0


def test_token_entropy_hand_computed(spark, tmp_path):
    import math

    spark.createDataFrame(
        [(1, "en", "a a a a"), (2, "en", "a b c d"), (3, "en", "a a b b")],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    df = get_queries()["token_entropy"](spark, str(tmp_path))
    got = {r["doc_id"]: (r["n_tokens"], r["entropy"]) for r in df.collect()}
    assert got[1] == (4, round(math.log(4) - round(4 * math.log(4) * 1e6) / 4e6, 6))
    assert got[1][1] == 0.0  # single token -> zero entropy
    assert got[2] == (4, round(math.log(4), 6))  # uniform -> ln(4)
    mid = math.log(4) - round(2 * math.log(2) * 1e6) * 2 / 4e6
    assert got[3] == (4, round(mid, 6))
    assert got[1][1] < got[3][1] < got[2][1]


def test_gopher_rules_hand_computed(spark, tmp_path):
    # one passing doc, one too short, one top-word-heavy, one stopword-free
    long_good = "the cat sat on a mat and then the dog ran to it in a park " \
                "with many other fine words making twenty five total words"
    docs = spark.createDataFrame(
        [
            (0, "en", long_good),                 # all rules pass
            (1, "en", "the of and to in is it a"),  # fails word-count min
            (2, "en", "the " * 30 + "of and in it is"),  # top-word frac > 0.3
            (3, "en", " ".join(f"w{i}" for i in range(25))),  # 0 stopwords, digit tokens
        ],
        "doc_id long, lang string, text string",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in get_queries()["gopher_rules"](spark, str(tmp_path)).collect()
    }
    assert got[0]["keep"] and all(
        got[0][c]
        for c in ("rule_word_count", "rule_mean_word_len", "rule_stopwords",
                  "rule_alpha", "rule_top_word")
    )
    assert not got[1]["rule_word_count"] and not got[1]["keep"]
    assert not got[2]["rule_top_word"] and not got[2]["keep"]
    assert got[2]["top_word_frac"] == round(30 / 35, 6)
    assert not got[3]["rule_stopwords"] and not got[3]["rule_alpha"]
    assert got[3]["n_words"] == 25 and not got[3]["keep"]


def test_ccnet_buckets_tercile_semantics(spark, micro_sf):
    df = get_queries()["ccnet_buckets"](spark, micro_sf)
    rows_ = df.collect()
    by_bucket = {}
    for r in rows_:
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["avg_nll"])
    # every scored doc lands in exactly one bucket, and bucket score
    # ranges are ordered head <= middle <= tail
    assert set(by_bucket) <= {"head", "middle", "tail"}
    assert sum(len(v) for v in by_bucket.values()) == len(rows_)
    if "head" in by_bucket and "middle" in by_bucket:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if "middle" in by_bucket and "tail" in by_bucket:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # buckets are balanced within one doc of each other for distinct scores
    scores = sorted(r["avg_nll"] for r in rows_)
    if len(set(scores)) == len(scores) and len(scores) >= 3:
        sizes = sorted(len(v) for v in by_bucket.values())
        assert sizes[-1] - sizes[0] <= 1


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    # target slice (lang=en) is dominated by the bigram "alpha beta";
    # a doc made of that bigram must outscore a doc of bigrams that
    # never appear in the target distribution.
    docs = spark.createDataFrame(
        [
            (0, "en", "alpha beta alpha beta alpha beta"),
            (1, "en", "alpha beta gamma"),
            (2, "de", "alpha beta alpha beta"),     # target-like, non-en
            (3, "de", "zeta eta theta iota kappa"), # nothing in target
        ],
        "doc_id long, lang string, text string",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in get_queries()["dsir_weights"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[0] > got[3]
    assert got[2] > got[3]  # scored by content, not by its lang label


def test_dedup_span_remove_keeps_first_occurrence_only(spark, tmp_path):
    """Keep-first (Lee et al.): the footer's canonical first occurrence
    (lowest doc_id) survives; the later copy is excised; unique prose
    survives; a short doc (< SPAN_N tokens) passes through unchanged."""
    from mapreduce_spark.registry import get_queries

    footer = "subscribe to our newsletter for updates"  # 6 tokens
    rows = [
        (0, "en", "alpha beta gamma delta epsilon zeta " + footer, "a"),
        (1, "en", footer + " totally different unique closing words here", "b"),
        (2, "en", "tiny doc", "c"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in get_queries()["dedup_span_remove"](spark, str(tmp_path)).collect()
    }
    # doc 0 holds the keeper occurrences of both duplicated 5-spans:
    # nothing removed; doc 1's copy (starts 0 and 1, covering tokens
    # 0..5) is excised in full
    assert got[0] == ("alpha beta gamma delta epsilon zeta " + footer, 12, 0)
    assert got[1] == ("totally different unique closing words here", 6, 6)
    assert got[2] == ("tiny doc", 2, 0)


def test_lang_confusion_cells_partition_the_corpus(spark, sf_dir):
    """Every document lands in exactly one (lang, lang_guess) cell, and
    the diagonal recomputes from lang_id's own per-doc guesses."""
    from mapreduce_spark.registry import get_queries
    from mapreduce_spark.sources.tables import load_table

    qs = get_queries()
    rows = qs["lang_confusion_report"](spark, sf_dir).collect()
    total_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total_docs
    guesses = {
        r["doc_id"]: r["lang_guess"]
        for r in qs["lang_id"](spark, sf_dir).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    expect: dict[tuple[str, str], int] = {}
    for d, g in guesses.items():
        expect[(langs[d], g)] = expect.get((langs[d], g), 0) + 1
    assert {(r["lang"], r["lang_guess"]): r["n_docs"] for r in rows} == expect


def test_trigram_backoff_branches_hand_computed(spark, tmp_path):
    """All three stupid-backoff branches verified against hand-computed
    NLLs on a 3-doc corpus: seen trigram (p = c3/c2), backed-off bigram
    (p = 0.4*c23/c1), and OOV base case (p = 0.16*(c+1)/(nt+vs))."""
    import math

    from mapreduce_spark.registry import get_queries

    spark.createDataFrame(
        [
            (0, "en", "a b c d", "s"),    # the model half (even doc_id)
            (1, "en", "a b c x", "s"),    # seen trigram + OOV base case
            (3, "en", "x b c y", "s"),    # bigram backoff + OOV base case
        ],
        "doc_id long, lang string, text string, source string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in get_queries()["perplexity_trigram_backoff"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {1, 3}
    # model: c3("a b c")=1, c2("a b")=c2("b c")=c2("c d")=1, c1(all)=1,
    # nt=4, vs=4
    nll = lambda p: round(1e6 * round(-math.log(p), 6))
    oov = nll(0.16 * 1 / 8)          # 0.16*(0+1)/(4+4)
    seen = nll(1.0)                  # c3/c2 = 1/1
    backoff = nll(0.4 * 1 / 1)       # 0.4*c2("b c")/c1("b")
    assert rows[1]["n_trigrams"] == 2
    assert rows[1]["avg_nll"] == ((seen + oov) // 2) / 1e6
    assert rows[3]["n_trigrams"] == 2
    assert rows[3]["avg_nll"] == ((backoff + oov) // 2) / 1e6


def test_dsir_resample_draws_reconcile_with_weights(spark, sf_dir):
    """The accepted set recomputes exactly from dsir_weights + the
    deterministic md5 draw, and the realized rate tracks the target."""
    import hashlib

    from mapreduce_spark.operators.textops import (
        DSIR_RESAMPLE_RATE,
        DSIR_RESAMPLE_SEED,
    )
    from mapreduce_spark.registry import get_queries

    qs = get_queries()
    picked = {
        r["doc_id"]: r for r in qs["dsir_resample"](spark, sf_dir).collect()
    }
    weights = {
        r["doc_id"]: r["dsir_logw"]
        for r in qs["dsir_weights"](spark, sf_dir).collect()
    }
    import math

    expect = set()
    for d, lw in weights.items():
        rate = min(1_000_000, max(0, round(1e6 * round(DSIR_RESAMPLE_RATE * math.exp(lw), 6))))
        h = int(hashlib.md5(f"{DSIR_RESAMPLE_SEED}{d}".encode()).hexdigest()[:15], 16)
        if h % 1_000_000 < rate:
            expect.add(d)
    assert set(picked) == expect
    for r in picked.values():
        assert 0 <= r["rate_micro"] <= 1_000_000
    # in-expectation rate: within a loose band of the target on 500 docs
    assert 0.05 < len(picked) / len(weights) < 0.6


def test_doc_length_histogram_buckets_partition_by_pow2(spark, sf_dir):
    """Buckets cover 2^b <= n < 2^(b+1), every tokenized doc lands in
    exactly one (source, bucket) cell, and token mass reconciles."""
    from mapreduce_spark.registry import get_queries
    from mapreduce_spark.sources.tables import load_table
    from mapreduce_spark.functions.text import tokens

    import pyspark.sql.functions as SF

    rows = get_queries()["doc_length_histogram"](spark, sf_dir).collect()
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", SF.size(tokens("text")).alias("n"))
        .filter(SF.col("n") > 0)
        .collect()
    )
    expect: dict[tuple, list] = {}
    for r in docs:
        b = r["n"].bit_length() - 1
        expect.setdefault((r["source"], b), []).append(r["n"])
    got = {(r["source"], r["len_bucket"]): r for r in rows}
    assert set(got) == set(expect)
    for key, ns in expect.items():
        assert got[key]["n_docs"] == len(ns)
        assert got[key]["total_tokens"] == sum(ns)
        b = key[1]
        assert all(2**b <= n < 2 ** (b + 1) for n in ns)


def test_dedup_span_remove_scaled_production_span(spark, tmp_path):
    """The production profile (SCALED_SPAN_N=50, Lee et al.'s ExactSubstr
    setting) excises a 60-token block copied between two docs with
    keep-first semantics, while a 45-token overlap — which the demo
    5-token profile would shred — passes through untouched: exactly the
    over-excision the paper's span length exists to prevent."""
    from mapreduce_spark.registry import get_queries

    block = " ".join(f"b{i}" for i in range(60))
    shared45 = " ".join(f"s{i}" for i in range(45))
    rows = [
        (0, "en", block, "a"),                       # keeper of the block
        (1, "en", block + " tail1 tail2 tail3", "b"),
        (2, "en", shared45 + " endx", "c"),
        (3, "en", shared45 + " endy", "d"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    qs = get_queries()
    scaled = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in qs["dedup_span_remove_scaled"](spark, str(tmp_path)).collect()
    }
    # keep-first: doc 0 holds every duplicated 50-span's canonical
    # occurrence; doc 1's 11 copies cover tokens 0..59 and are excised
    assert scaled[0] == (block, 60, 0)
    assert scaled[1] == ("tail1 tail2 tail3", 3, 60)
    # 46-token docs cannot carry a 50-span: untouched at the production
    # length...
    assert scaled[2] == (shared45 + " endx", 46, 0)
    assert scaled[3] == (shared45 + " endy", 46, 0)
    # ...but the demo 5-token profile shreds the same 45-token overlap —
    # the over-excision Lee et al.'s ~50-token setting avoids
    demo = {
        r["doc_id"]: r["n_removed"]
        for r in qs["dedup_span_remove"](spark, str(tmp_path)).collect()
    }
    assert demo[3] == 45 and scaled[3][2] == 0


def test_kn_bigram_branches_hand_computed(spark, tmp_path):
    """All three interpolated-KN branches verified against hand-computed
    NLLs on a tiny corpus: seen bigram (discounted ML + lambda*Pcont),
    unseen bigram under a seen history (lambda*Pcont alone), and unseen
    history (raw Pcont)."""
    import math

    from mapreduce_spark.operators.textops import KN_DISCOUNT
    from mapreduce_spark.registry import get_queries

    spark.createDataFrame(
        [
            (0, "en", "a b a b a c", "s"),  # model half (even doc_id)
            (1, "en", "a b", "s"),          # seen bigram
            (3, "en", "a a", "s"),          # unseen bigram, seen history
            (5, "en", "z a", "s"),          # unseen history
        ],
        "doc_id long, lang string, text string, source string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in get_queries()["perplexity_kn_bigram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {1, 3, 5}
    # model bigrams: "a b" x2, "b a" x2, "a c" x1 -> types bt=3, vs=3
    # hist a: c1=3, n1f=2 ; hist b: c1=2, n1f=1
    # cont b: n1b=1 ; cont a: n1b=1 ; cont c: n1b=1
    D = KN_DISCOUNT
    pc = lambda n1b: (n1b + 1) / (3 + 3)
    nll = lambda p: round(1e6 * round(-math.log(p), 6))
    seen = nll((2 - D) / 3 + ((D * 2) / 3) * pc(1))     # P(b|a)
    zero = nll(0.0 + ((D * 2) / 3) * pc(1))             # P(a|a)
    unhist = nll(pc(1))                                 # P(a|z)
    assert rows[1]["avg_nll"] == seen / 1e6
    assert rows[3]["avg_nll"] == zero / 1e6
    assert rows[5]["avg_nll"] == unhist / 1e6


def test_pagerank_iters_contracts_and_conserves(spark):
    """Damped power iteration is an L1 contraction with factor <= 0.85:
    each iteration's integer L1 delta must be at most 0.85x the previous
    (plus an integer-truncation slack of one unit per node), and total
    rank mass stays within truncation loss of PR_SCALE."""
    from mapreduce_spark.operators.graph import PR_SCALE, pagerank_iters

    card = pagerank_iters(spark, "/root/testdata/sf0.001").collect()
    assert [r.iter for r in card] == list(range(1, 13))
    n_nodes_bound = 64  # event types are a handful; slack bound only
    for a, b in zip(card, card[1:]):
        assert b.l1_delta_units <= int(0.85 * a.l1_delta_units) + n_nodes_bound
    assert card[-1].l1_delta_units < card[0].l1_delta_units
    for r in card:
        # teleport mass is exact; link mass loses at most 1 unit per
        # (edge endpoint) to integer div truncation
        assert 0 < r.sum_units <= PR_SCALE + n_nodes_bound
        assert r.sum_units > PR_SCALE // 2
