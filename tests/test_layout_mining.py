"""Invariants of the round-6 close additions: hard-negative mining, the
temperature-sweep mixing card, and the z-order layout card.

Oracle parity (tools/check_correctness.py, driver gate) pins cross-engine
exactness; these pin the semantic CLAIMS each docstring makes: negatives
never share the query's label, temperature flattens shares monotonically,
and Morton blocks bound BOTH dimensions at once — the property a hash or
single-column layout cannot have.
"""

from __future__ import annotations

from collections import defaultdict

from mapreduce_spark.registry import get_queries

SF_DIR = "/root/testdata/sf0.001"


def test_hard_negatives_exclude_query_label(spark):
    """Every mined negative must carry a label != its query's label, with
    exactly HARD_NEG_K rows per query, rank-dense and cosine-sorted."""
    from mapreduce_spark.operators.similarity import HARD_NEG_K, N_QUERIES

    rows = get_queries()["hard_negatives"](spark, SF_DIR).collect()
    per_q = defaultdict(list)
    for r in rows:
        assert r["neg_label"] != r["query_label"], r
        per_q[r["query_id"]].append(r)
    assert len(per_q) == N_QUERIES
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, HARD_NEG_K + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True), q


def test_hard_negatives_are_the_closest_wrong_label(spark):
    """The mined set must dominate every unmined wrong-label vector: the
    rank-k cosine is >= the best cosine among wrong-label vectors left
    out (checked exhaustively against the raw table)."""
    import duckdb

    from mapreduce_spark.operators.similarity import HARD_NEG_K

    rows = get_queries()["hard_negatives"](spark, SF_DIR).collect()
    con = duckdb.connect()
    emb = {
        v: (e, l)
        for v, e, l in con.execute(
            f"SELECT vec_id, embedding, label FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb)

    per_q = defaultdict(dict)
    for r in rows:
        per_q[r["query_id"]][r["vec_id"]] = r
    for qid, mined in per_q.items():
        qe, qlabel = emb[qid]
        floor = min(r["cosine"] for r in mined.values())
        best_unmined = max(
            (cos(qe, e) for v, (e, l) in emb.items() if l != qlabel and v not in mined),
            default=-1.0,
        )
        # 6dp rounding on the mined side vs raw float here: allow 1e-6.
        assert floor >= best_unmined - 1e-6, (qid, floor, best_unmined)
    assert all(len(m) == HARD_NEG_K for m in per_q.values())


def test_mix_temperature_sweep_flattens_and_normalizes(spark):
    """Per alpha: shares sum to 1 (within 6dp rounding per source);
    alpha=100 reproduces raw token shares with epochs == 1 everywhere;
    lowering alpha monotonically raises the smallest source's share and
    epochs (the up-weighting direction that motivates temperature)."""
    rows = get_queries()["mix_temperature_sweep"](spark, SF_DIR).collect()
    by_alpha = defaultdict(dict)
    for r in rows:
        by_alpha[r["alpha_pct"]][r["source"]] = r
    assert sorted(by_alpha) == [25, 50, 75, 100]
    n_src = len(by_alpha[100])
    for alpha, cells in by_alpha.items():
        assert len(cells) == n_src
        assert abs(sum(c["share"] for c in cells.values()) - 1.0) <= 2e-6 * n_src
    for c in by_alpha[100].values():
        assert abs(c["epochs"] - 1.0) <= 1e-4, c
    smallest = min(by_alpha[100].values(), key=lambda c: c["n_tokens"])["source"]
    largest = max(by_alpha[100].values(), key=lambda c: c["n_tokens"])["source"]
    if smallest != largest:
        sm = [by_alpha[a][smallest] for a in (100, 75, 50, 25)]
        assert all(a["share"] <= b["share"] + 1e-9 for a, b in zip(sm, sm[1:])), sm
        assert all(a["epochs"] <= b["epochs"] + 1e-9 for a, b in zip(sm, sm[1:]))
        lg = [by_alpha[a][largest] for a in (100, 75, 50, 25)]
        assert all(a["share"] >= b["share"] - 1e-9 for a, b in zip(lg, lg[1:])), lg


def test_zorder_blocks_bound_both_dimensions(spark):
    """Every Morton block's bounding box must be narrow in BOTH
    dimensions at once: span <= range * 16/255 + one quantization cell —
    the multi-dim pruning property. Row counts must conserve."""
    import duckdb

    rows = get_queries()["zorder_layout"](spark, SF_DIR).collect()
    con = duckdb.connect()
    xmin, xmax, ymin, ymax, total = con.execute(
        "SELECT min(l_partkey), max(l_partkey), min(l_suppkey), max(l_suppkey),"
        f" count(*) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()
    assert sum(r["n_rows"] for r in rows) == total
    assert len(rows) <= 256 and len({r["zbucket"] for r in rows}) == len(rows)
    # 16 of 256 quantized cells per dim per block, plus one cell of
    # boundary slop from the integer quantization.
    x_bound = (xmax - xmin) * 16 / 255 + (xmax - xmin) / 255 + 2
    y_bound = (ymax - ymin) * 16 / 255 + (ymax - ymin) / 255 + 2
    for r in rows:
        assert 0 <= r["zbucket"] < 256
        assert r["part_hi"] - r["part_lo"] <= x_bound, r
        assert r["supp_hi"] - r["supp_lo"] <= y_bound, r


def test_colocated_join_plans_no_exchange_no_sort(spark):
    """The co-located fact-fact join: both sides bucketed+sorted on the
    key, one file per bucket => the sort-merge join must plan with ZERO
    Exchange and ZERO Sort — the layout-amortized shuffle."""
    import re

    df = get_queries()["join_colocated"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert len(re.findall(r"\bSort \[", plan)) == 0, plan
    assert plan.count("SortMergeJoin") == 1, plan
    assert df.count() > 0


def test_decontaminate_spans_removes_all_benchmark_text(spark):
    """After decontamination NO benchmark 5-gram may survive anywhere in
    the cleaned training text (checked exhaustively), and a planted
    train doc quoting a benchmark item loses exactly the quoted window
    while its other tokens survive."""
    import os
    import tempfile

    from mapreduce_spark.operators.dedup import (
        BENCH_SOURCE,
        DECON_SPAN_N,
        decontaminate_spans,
    )

    bench_text = "alpha beta gamma delta epsilon"
    rows = [
        (0, bench_text, "en", BENCH_SOURCE, len(bench_text)),
        # quotes the full benchmark item inside other text
        (1, "intro words " + bench_text + " closing words", "en", "srcA", 0),
        # clean doc sharing no 5-gram with the benchmark
        (2, "one two three four five six seven", "en", "srcA", 0),
    ]
    spool = tempfile.mkdtemp(prefix="decon_planted_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(spool, "documents.parquet")
    )
    out = {r["doc_id"]: r for r in decontaminate_spans(spark, spool).collect()}
    assert set(out) == {1, 2}
    assert out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == "one two three four five six seven"
    assert out[1]["n_removed"] == 5, out[1]
    assert out[1]["clean_text"] == "intro words closing words"

    # Exhaustive survival check on the real fixture corpus.
    import duckdb

    cleaned = {
        r["doc_id"]: r["clean_text"]
        for r in decontaminate_spans(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    bench_docs = con.execute(
        "SELECT text FROM read_parquet(?) WHERE source = ?",
        [f"{SF_DIR}/documents.parquet", BENCH_SOURCE],
    ).fetchall()

    def grams(s):
        toks = [t for t in s.lower().split() if t]
        return {
            tuple(toks[i : i + DECON_SPAN_N])
            for i in range(len(toks) - DECON_SPAN_N + 1)
        }

    bench_grams = set()
    for (t,) in bench_docs:
        bench_grams |= grams(t)
    survivors = sum(
        len(grams(c) & bench_grams) for c in cleaned.values()
    )
    assert survivors == 0, survivors


def test_hard_negatives_scaled_structure_and_recall(spark):
    """The Hamming-shortlisted production path must keep the structural
    contract (k wrong-label rows per query, cosine-ranked) and recall a
    reasonable share of the exact mined set — 1-bit codes on the
    near-random fixture corpus are the worst case (hamming_recall_report
    measures ~0.6 for plain rerank), so the floor is deliberately loose;
    for contrastive training any sufficiently-hard negative serves."""
    from mapreduce_spark.operators.similarity import HARD_NEG_K, N_QUERIES

    exact = get_queries()["hard_negatives"](spark, SF_DIR).collect()
    scaled = get_queries()["hard_negatives_scaled"](spark, SF_DIR).collect()
    per_q = defaultdict(list)
    for r in scaled:
        assert r["neg_label"] != r["query_label"], r
        per_q[r["query_id"]].append(r)
    assert len(per_q) == N_QUERIES
    for rs in per_q.values():
        assert len(rs) == HARD_NEG_K
        rs.sort(key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    sc = {(r["query_id"], r["vec_id"]) for r in scaled}
    assert len(ex & sc) / len(ex) >= 0.3, len(ex & sc) / len(ex)


def test_decontaminate_scaled_is_strictly_more_conservative(spark):
    """The production 13-gram window must never excise MORE than the
    5-gram demo from any document (every 13-gram match contains 5-gram
    matches), and on the fixture corpus the demo flags a short-idiom
    overlap the scaled profile correctly spares."""
    demo = {
        r["doc_id"]: r["n_removed"]
        for r in get_queries()["decontaminate_spans"](spark, SF_DIR).collect()
    }
    scaled = {
        r["doc_id"]: r["n_removed"]
        for r in get_queries()["decontaminate_spans_scaled"](spark, SF_DIR).collect()
    }
    assert set(demo) == set(scaled)
    for d, n in scaled.items():
        assert n <= demo[d], (d, n, demo[d])
    assert sum(1 for v in scaled.values() if v > 0) < sum(
        1 for v in demo.values() if v > 0
    )
