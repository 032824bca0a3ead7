"""Exact-row operator tests over a hand-built micro sf directory.

The analog of the reference's worker data tests, which assert literal
output lists (/root/reference/tests/test_worker_08.py:199-245): every
query here runs over 4-6 hand-written rows and is checked against rows
computed by hand, independent of both Spark and DuckDB.
"""

from __future__ import annotations

import datetime as dt

import pytest

from mapreduce_spark.registry import get_queries


@pytest.fixture(scope="module")
def micro_sf(spark, tmp_path_factory) -> str:
    """A tiny sf dir with hand-written tables the queries can read."""
    root = tmp_path_factory.mktemp("micro_sf")

    def write(name: str, rows, schema: str):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{name}.parquet")

    ts = dt.datetime  # l_shipdate/o_orderdate are timestamp_ntz in parquet
    write(
        "lineitem",
        [
            (1, 100, 10, 1, 5.0, 1000.0, 0.10, 0.0, "R", "F", ts(1995, 7, 1)),
            (1, 200, 20, 2, 15.0, 2000.0, 0.00, 0.0, "N", "O", ts(1996, 1, 1)),
            (2, 100, 10, 1, 40.0, 8000.0, 0.05, 0.0, "R", "F", ts(1994, 1, 1)),
            (3, 300, 30, 1, 15.0, 1500.0, 0.00, 0.0, "A", "F", ts(1993, 5, 5)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    )
    write(
        "orders",
        [
            (1, 10, "O", 500000.0, ts(1995, 1, 1), "1-URGENT"),
            (2, 10, "F", 2000.0, ts(1996, 1, 1), "2-HIGH"),
            (3, 20, "O", 3000.0, ts(1997, 1, 1), "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    write(
        "customer",
        [
            (10, "Customer#10", 1, 100.0),
            (20, "Customer#20", 2, 200.0),
            (30, "Customer#30", 1, 300.0),  # no orders -> anti-join hit
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double",
    )
    write(
        "documents",
        [
            (0, "en", "Hello world hello"),
            (1, "en", ""),
            (2, "de", "world world"),
            # identical pair -> deterministic near-dup (jaccard 1.0)
            (3, "en", "the quick brown fox jumps"),
            (4, "en", "The quick brown fox jumps"),
        ],
        "doc_id long, lang string, text string",
    )
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write(
        "events",
        [
            # user 1: two clicks then an error and a purchase
            (1, t(10, 0), 1, "click", 1.0, "{}"),
            (2, t(10, 8), 1, "click", 1.0, "{}"),
            (3, t(10, 12), 1, "error", 1.0, "{}"),
            (4, t(10, 15), 1, "purchase", 9.0, "{}"),
            # user 2: error with no clicks at all
            (5, t(10, 0), 2, "error", 1.0, "{}"),
            # user 3: click exactly 10 min before the error (boundary, in)
            (6, t(9, 50), 3, "click", 1.0, "{}"),
            (7, t(10, 0), 3, "error", 1.0, "{}"),
            # user 4: click at the same instant as the error (boundary, in)
            (8, t(10, 0), 4, "click", 1.0, "{}"),
            (9, t(10, 0), 4, "error", 1.0, "{}"),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    return str(root)


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_wordcount_exact(spark, micro_sf):
    df = get_queries()["wordcount"](spark, micro_sf)
    assert rows(df, "word", "cnt") == [
        ("brown", 2), ("fox", 2), ("hello", 2), ("jumps", 2),
        ("quick", 2), ("the", 2), ("world", 3),
    ]


def test_wordcount_salted_equals_plain(spark, micro_sf):
    plain = get_queries()["wordcount"](spark, micro_sf)
    salted = get_queries()["wordcount_salted"](spark, micro_sf)
    assert rows(plain, "word", "cnt") == rows(salted, "word", "cnt")


def test_topk_exact(spark, micro_sf):
    # top-10 orders by o_totalprice desc; only 3 rows exist
    df = get_queries()["topk"](spark, micro_sf)
    got = [tuple(r) for r in df.select("o_orderkey", "o_totalprice").collect()]
    assert got == [(1, 500000.0), (3, 3000.0), (2, 2000.0)]


def test_join_semi_anti_exact(spark, micro_sf):
    # semi/anti split on "has an order over 300k": only customer 10 does
    semi = get_queries()["join_semi"](spark, micro_sf)
    anti = get_queries()["join_anti"](spark, micro_sf)
    assert {r["c_custkey"] for r in semi.collect()} == {10}
    assert {r["c_custkey"] for r in anti.collect()} == {20, 30}


def test_groupby_agg_exact(spark, micro_sf):
    df = get_queries()["groupby_agg"](spark, micro_sf)
    by_key = {(r["l_returnflag"], r["l_linestatus"]): r for r in df.collect()}
    r = by_key[("R", "F")]  # rows 1 and 3: qty 5+40, price 1000+8000
    assert r["sum_qty"] == 45.0
    assert r["sum_base_price"] == 9000.0
    # disc price: 1000*0.9 + 8000*0.95 = 900 + 7600
    assert r["sum_disc_price"] == 8500.0
    assert r["count_order"] == 2


def test_distinct_and_agg_distinct_exact(spark, micro_sf):
    distinct = get_queries()["distinct_rows"](spark, micro_sf)
    # (returnflag, linestatus) pairs: (R,F) (N,O) (A,F)
    assert distinct.count() == 3
    agg = get_queries()["agg_distinct"](spark, micro_sf)
    by_flag = {r["l_returnflag"]: r for r in agg.collect()}
    assert by_flag["R"]["n_parts"] == 1  # part 100 twice -> 1 distinct
    assert by_flag["R"]["n_suppliers"] == 1
    assert by_flag["R"]["n_rows"] == 2


def test_window_rank_exact(spark, micro_sf):
    # top-3 orders per customer by totalprice
    df = get_queries()["window_rank"](spark, micro_sf)
    got = {(r["o_custkey"], r["o_orderkey"]): r["rn"] for r in df.collect()}
    assert got == {(10, 1): 1, (10, 2): 2, (20, 3): 1}


def test_union_and_set_ops_exact(spark, micro_sf):
    union = get_queries()["union_all"](spark, micro_sf)
    assert union.count() == 6  # 3 orders + 3 customers
    # >150k orders: custkey {10}; customers with acctbal>0: {10,20,30}
    inter = get_queries()["set_intersect"](spark, micro_sf)
    exc = get_queries()["set_except"](spark, micro_sf)
    assert {r["custkey"] for r in inter.collect()} == {10}
    assert {r["custkey"] for r in exc.collect()} == {20, 30}


def test_asof_join_exact(spark, micro_sf):
    # the one purchase (user 1 @ 10:15) matches the LATEST click <= it
    # (10:08), not the earlier 10:00 one
    df = get_queries()["asof_join"](spark, micro_sf)
    got = [(r["event_id"], r["user_id"], r["wait_us"]) for r in df.collect()]
    assert got == [(4, 1, 7 * 60 * 1_000_000)]


def test_range_join_exact_boundaries(spark, micro_sf):
    # clicks within [error_ts - 10min, error_ts], both boundaries inclusive:
    # user 1: only the 10:08 click (10:00 is 12min before the 10:12 error)
    # user 2: no clicks -> no output row
    # user 3: click exactly 10min before  -> counted (lower boundary)
    # user 4: click at the same instant   -> counted (upper boundary)
    df = get_queries()["range_join"](spark, micro_sf)
    got = {(r["event_id"], r["user_id"]): r["n_clicks_before"] for r in df.collect()}
    assert got == {(3, 1): 1, (7, 3): 1, (9, 4): 1}


def test_sample_hash_deterministic(spark, micro_sf):
    a = get_queries()["sample_hash"](spark, micro_sf)
    b = get_queries()["sample_hash"](spark, micro_sf)
    assert rows(a, "l_orderkey", "l_linenumber") == rows(b, "l_orderkey", "l_linenumber")


def test_dedup_exact_finds_identical_pair(spark, micro_sf):
    # docs 3 and 4 differ only in case -> same normalized content hash
    df = get_queries()["dedup_exact"](spark, micro_sf)
    groups = {r["keeper_doc_id"]: r["n_copies"] for r in df.collect()}
    assert groups[3] == 2  # keeper is min(3,4), both copies counted
    assert sum(groups.values()) == 5  # every doc in exactly one group


def test_dedup_minhash_finds_identical_pair_only(spark, micro_sf):
    # identical shingle sets -> identical signatures -> guaranteed LSH
    # candidate with jaccard exactly 1.0; no other doc pair qualifies
    df = get_queries()["dedup_minhash_lsh"](spark, micro_sf)
    got = [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()]
    assert got == [(3, 4, 1.0)]


def test_dedup_cluster_merges_identical_pair(spark, micro_sf):
    labels = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in get_queries()["dedup_cluster"](spark, micro_sf).collect()
    }
    assert labels[4] == (3, False)  # 4 joins 3's cluster, 3 is keeper
    assert labels[3] == (3, True)
    for d in (0, 1, 2):
        assert labels[d] == (d, True)  # singletons keep themselves


def test_tpch_q6_empty_match_is_null_zero(spark, micro_sf):
    # no micro row satisfies all three predicates: global agg over an
    # empty set must yield exactly one (NULL revenue, 0 count) row
    [row] = get_queries()["tpch_q6_forecast"](spark, micro_sf).collect()
    assert row.revenue is None and row.n_items == 0


def test_groupby_argmax_exact(spark, micro_sf):
    df = get_queries()["groupby_argmax"](spark, micro_sf)
    assert rows(df, "c_nationkey", "max_acctbal", "top_custkey") == [
        (1, 300.0, 30),  # customers 10 (100.0) and 30 (300.0)
        (2, 200.0, 20),
    ]


def test_funnel_conversion_exact(spark, micro_sf):
    got = {
        r.user_id: (r.first_click, r.first_purchase, r.converted)
        for r in get_queries()["funnel_conversion"](spark, micro_sf).collect()
    }
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    assert got[1] == (t(10, 0), t(10, 15), True)
    assert got[2] == (None, None, None)  # error-only user
    assert got[3] == (t(9, 50), None, None)  # click, never purchased
    assert got[4] == (t(10, 0), None, None)
