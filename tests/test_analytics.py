"""Tests for the composed-analytics operators (operators/analytics.py)
and tfidf_top_terms: hand-computed micro cases plus error-bound checks
for the sketch-based scale-path aggregates.

Style follows the reference's literal-output data tests
(/root/reference/tests/test_worker_08.py:199-245): tiny inputs, rows
asserted by hand, independent of the DuckDB oracle gate.
"""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F
import pytest

from mapreduce_spark.operators.analytics import (
    agg_approx_distinct,
    funnel_conversion,
    grouping_sets_agg,
    quantile_approx,
    sessionize_batch,
    set_except_all,
    set_intersect_all,
)
from mapreduce_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def micro_events_sf(spark, tmp_path_factory) -> str:
    """events with hand-placed gaps: user 1 has two sessions (40-min gap),
    user 2 one session, user 3 clicks but never purchases."""
    root = tmp_path_factory.mktemp("micro_events")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes: float) -> dt.datetime:
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: session A = events 1,2 (10 min apart); 40-min gap; session B = 3
        (1, m(0), 1, "click", 1.0, "{}"),
        (2, m(10), 1, "purchase", 2.0, "{}"),
        (3, m(50), 1, "view", 3.0, "{}"),
        # user 2: one session, purchase BEFORE click -> converted False
        (4, m(0), 2, "purchase", 1.0, "{}"),
        (5, m(20), 2, "click", 1.0, "{}"),
        # user 3: click only -> converted NULL
        (6, m(0), 3, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/events.parquet")
    return str(root)


def test_sessionize_batch_hand_case(spark, micro_events_sf):
    out = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in sessionize_batch(spark, micro_events_sf).collect()
    }
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    assert out == {
        (1, 1): (2, m(0), m(10)),
        (1, 2): (1, m(50), m(50)),
        (2, 1): (2, m(0), m(20)),
        (3, 1): (1, m(0), m(0)),
    }


def test_funnel_conversion_hand_case(spark, micro_events_sf):
    out = {r.user_id: r for r in funnel_conversion(spark, micro_events_sf).collect()}
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    assert out[1].converted is True
    assert out[1].first_click == t0
    assert out[1].first_purchase == t0 + dt.timedelta(minutes=10)
    assert out[2].converted is False  # purchase precedes click
    assert out[3].converted is None  # no purchase at all
    assert out[3].first_purchase is None


def test_grouping_sets_matches_union_of_aggs(spark):
    """GROUPING SETS ((flag),(status),()) == the three grouped aggs."""
    li = load_table(spark, SF, "lineitem")
    got = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.cnt)
        for r in grouping_sets_agg(spark, SF).collect()
    }
    by_flag = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c")
    )
    for r in by_flag.collect():
        s, c = got[(r.l_returnflag, None)]
        assert c == r.c and math.isclose(s, r.s, rel_tol=1e-9)
    by_status = li.groupBy("l_linestatus").agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c")
    )
    for r in by_status.collect():
        s, c = got[(None, r.l_linestatus)]
        assert c == r.c and math.isclose(s, r.s, rel_tol=1e-9)
    total = li.agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c")).first()
    s, c = got[(None, None)]
    assert c == total.c and math.isclose(s, total.s, rel_tol=1e-9)
    # exactly |flags| + |statuses| + 1 output rows — no spurious sets
    n_flags = by_flag.count()
    n_statuses = by_status.count()
    assert len(got) == n_flags + n_statuses + 1


def test_bag_set_ops_multiplicity(spark):
    """INTERSECT ALL = min(m_a, m_b); EXCEPT ALL = max(m_a - m_b, 0)."""
    orders = load_table(spark, SF, "orders")
    m_o = {
        r.o_custkey: r.n
        for r in orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    m_f = {
        r.o_custkey: r.n
        for r in orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    inter = {r.o_custkey: r.n for r in set_intersect_all(spark, SF).collect()}
    expect_inter = {
        k: min(m_o[k], m_f[k]) for k in m_o.keys() & m_f.keys() if min(m_o[k], m_f[k])
    }
    assert inter == expect_inter
    exc = {r.o_custkey: r.n for r in set_except_all(spark, SF).collect()}
    expect_exc = {
        k: m_o[k] - m_f.get(k, 0) for k in m_o if m_o[k] - m_f.get(k, 0) > 0
    }
    assert exc == expect_exc


def test_approx_distinct_error_bound(spark):
    """The in-plan 5%-relative-error check (HLL rsd=1% vs exact) holds,
    and independently the raw HLL estimate stays within 5% of exact."""
    li = load_table(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.a
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a"))
        .collect()
    }
    for flag, n in exact.items():
        assert abs(approx[flag] - n) <= 0.05 * n
    rows = agg_approx_distinct(spark, SF).collect()
    assert rows and all(r.approx_within_5pct for r in rows)


def test_approx_quantile_rank_bound(spark):
    """The in-plan ±1%-rank band check holds, and independently the raw
    GK estimates land within the 1% rank tolerance of the exact rank."""
    li = load_table(spark, SF, "lineitem")
    vals = {}
    for r in li.select("l_returnflag", "l_quantity").collect():
        vals.setdefault(r.l_returnflag, []).append(r.l_quantity)
    approx = {
        r.l_returnflag: (r.m, r.p)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 10000).alias("m"),
            F.percentile_approx("l_quantity", 0.9, 10000).alias("p"),
        )
        .collect()
    }
    for flag, xs in vals.items():
        xs = sorted(xs)
        n = len(xs)
        for q, got in ((0.5, approx[flag][0]), (0.9, approx[flag][1])):
            lo = xs[max(0, math.floor((q - 0.01) * n) - 1)]
            hi = xs[min(n - 1, math.ceil((q + 0.01) * n))]
            assert lo <= got <= hi
    rows = quantile_approx(spark, SF).collect()
    assert rows and all(r.median_in_band and r.p90_in_band for r in rows)


def test_tpch_q3_limit_deterministic(spark):
    """Repeated runs of the top-10 return identical ordered rows."""
    from mapreduce_spark.operators.analytics import tpch_q3_shipping

    a = [tuple(r) for r in tpch_q3_shipping(spark, SF).collect()]
    b = [tuple(r) for r in tpch_q3_shipping(spark, SF).collect()]
    assert a == b and len(a) <= 10
    revs = [r[1] for r in a]
    assert revs == sorted(revs, reverse=True)


def test_zscore_outliers_are_extreme_per_type(spark):
    import statistics

    from mapreduce_spark.operators.analytics import Z_THRESHOLD, zscore_outliers

    rows = zscore_outliers(spark, SF).collect()
    assert rows, "sf0.001 should surface at least one outlier"
    assert all(abs(r["z"]) >= Z_THRESHOLD for r in rows)
    # every flagged event's value must be extreme within its own type,
    # per an independent raw recompute of the per-type moments
    ev = load_table(spark, SF, "events").select("event_type", "value").collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for r in rows:
        vals = by_type[r["event_type"]]
        mu = statistics.fmean(vals)
        sd = statistics.stdev(vals)
        assert abs((r["value"] - mu) / sd) > Z_THRESHOLD - 0.01


def test_event_path_topk_orders_and_bounds(spark):
    from mapreduce_spark.operators.analytics import PATH_TOP_K, event_path_topk

    rows = event_path_topk(spark, SF).collect()
    assert 0 < len(rows) <= PATH_TOP_K
    counts = [r["n_paths"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # total path occurrences can't exceed total events (each event ends
    # at most one 3-path)
    n_events = load_table(spark, SF, "events").count()
    assert sum(counts) <= n_events


def test_cms_estimates_never_undercount_and_hit_exact_at_small_scale(spark, sf_dir):
    """CMS one-sided guarantee: estimate >= exact always; at fixture
    scale the 4x8192 grid is collision-free for the top-20, so the
    estimates equal the exact counts and every bound check is TRUE."""
    from mapreduce_spark.registry import get_queries

    rows = get_queries()["cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["c_cms"] >= r["c_exact"]
        assert r["bound_ok"]


def test_tpch_q1_pricing_invariants(spark):
    """Q1's aggregates reconcile against an independent recount: group
    counts partition the filtered lineitems, averages times counts equal
    the sums, and the discounted/charged totals bracket the base price."""
    from mapreduce_spark.operators.tpch import tpch_q1_pricing

    rows = tpch_q1_pricing(spark, SF).collect()
    assert 0 < len(rows) <= 9  # |returnflag| x |linestatus| is tiny
    li = load_table(spark, SF, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    assert sum(r["count_order"] for r in rows) == li.count()
    for r in rows:
        assert r["sum_disc_price"] <= r["sum_base_price"]
        assert r["sum_charge"] >= r["sum_disc_price"]
        assert math.isclose(
            r["avg_qty"] * r["count_order"], r["sum_qty"], rel_tol=1e-9
        )
        assert math.isclose(
            r["avg_price"] * r["count_order"], r["sum_base_price"], rel_tol=1e-9
        )
    keys = [(r["l_returnflag"], r["l_linestatus"]) for r in rows]
    assert keys == sorted(keys)


def test_event_anomaly_mad_matches_independent_recompute(spark):
    """Flagged events are exactly those beyond MAD_K lower-median MADs,
    per a pure-Python recompute of both medians over quantized cents."""
    import math

    from mapreduce_spark.operators.analytics import MAD_K, event_anomaly_mad

    rows = event_anomaly_mad(spark, SF).collect()
    ev = load_table(spark, SF, "events").select(
        "event_id", "event_type", "value"
    ).collect()

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    def r100(v):
        # HALF_UP (away from zero), matching Spark F.round — Python's
        # built-in round() is banker's and diverges on exact half-cents
        s = 1 if v >= 0 else -1
        return s * math.floor(abs(v) * 100 + 0.5)

    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            (r["event_id"], r100(r["value"]))
        )
    expect = set()
    for t, pairs in by_type.items():
        med = lower_median([c for _, c in pairs])
        devs = [(eid, abs(c - med)) for eid, c in pairs]
        mad = lower_median([d for _, d in devs])
        if mad > 0:
            expect |= {eid for eid, d in devs if d > MAD_K * mad}
    assert {r["event_id"] for r in rows} == expect
    for r in rows:
        assert r["dev_cents"] > MAD_K * r["mad_cents"] > 0


def test_event_ohlc_bars_match_sorted_recompute(spark):
    """Every bar's open/close are the first/last event's value under
    (ts, event_id) order, high/low bound the bar, and volume counts
    reconcile with the raw events."""
    from mapreduce_spark.operators.analytics import event_ohlc

    rows = event_ohlc(spark, SF).collect()
    assert rows
    ev = load_table(spark, SF, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    bars: dict[tuple, list] = {}
    for r in ev:
        key = (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        bars.setdefault(key, []).append((r["ts"], r["event_id"], r["value"]))
    assert len(rows) == len(bars)
    for r in rows:
        members = sorted(bars[(r["event_type"], r["window_start"])])
        vals = [v for _, _, v in members]
        assert r["open"] == members[0][2]
        assert r["close"] == members[-1][2]
        assert r["high"] == max(vals)
        assert r["low"] == min(vals)
        assert r["n_events"] == len(members)
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


def test_funnel_latency_stats_recompute(spark):
    """n/mean/median reconcile against a pure-Python recompute over
    funnel_conversion's converted users."""
    from mapreduce_spark.operators.analytics import (
        funnel_conversion,
        funnel_latency_stats,
    )

    (row,) = funnel_latency_stats(spark, SF).collect()
    lats = sorted(
        int((r["first_purchase"] - r["first_click"]).total_seconds())
        for r in funnel_conversion(spark, SF).collect()
        if r["converted"]
    )
    assert row["n_converted"] == len(lats)
    assert math.isclose(row["mean_latency_s"], sum(lats) / len(lats), rel_tol=1e-12)
    assert row["median_latency_s"] == lats[(len(lats) + 1) // 2 - 1]


def test_activity_gini_matches_sorted_recompute(spark):
    """The distribution-based Gini equals the classic sorted-rank
    formula computed per type in pure Python (truncating micro-units)."""
    from mapreduce_spark.operators.analytics import activity_gini

    rows = {r["event_type"]: r for r in activity_gini(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("event_type", "user_id").collect()
    by_type: dict[str, dict] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], {}).setdefault(r["user_id"], 0)
        by_type[r["event_type"]][r["user_id"]] += 1
    for t, users in by_type.items():
        xs = sorted(users.values())
        u, tot = len(xs), sum(xs)
        s = sum((i + 1) * x for i, x in enumerate(xs))
        micro = (2 * s * 1_000_000 - (u + 1) * tot * 1_000_000) // (u * tot)
        r = rows[t]
        assert r["n_users"] == u and r["n_events"] == tot
        assert r["gini"] == micro / 1e6
        assert 0 <= r["gini"] < 1


def test_corr_matrix_hand_computed_and_bounded(spark, tmp_path):
    """Pearson on a planted frame: an exactly linear pair hits 1.0, an
    exactly anti-linear pair hits -1.0, and every corr is in [-1, 1]."""
    rows = [
        # qty, price=2*qty (corr 1), disc = -qty scaled (corr -1), tax noise
        (float(q), float(2 * q), float(10 - q) / 100, float(t) / 100)
        for q, t in zip(range(1, 9), [3, 1, 4, 1, 5, 9, 2, 6])
    ]
    df = spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    from mapreduce_spark.registry import get_queries

    got = {
        (r.col_a, r.col_b): r.corr
        for r in get_queries()["corr_matrix"](spark, str(tmp_path)).collect()
    }
    assert got[("l_quantity", "l_extendedprice")] == 1.0
    assert got[("l_quantity", "l_discount")] == -1.0
    assert all(-1.0 <= v <= 1.0 for v in got.values())


def test_moments_report_symmetric_and_skewed_groups(spark, tmp_path):
    """Planted quantities: a symmetric uniform group has skewness exactly
    0 and the hand-computed uniform excess kurtosis; a lopsided group
    skews positive. Moments are exact integers, so equality is exact."""
    rows = [("A", float(q)) for q in range(1, 6)] + [
        ("B", 1.0),
        ("B", 1.0),
        ("B", 1.0),
        ("B", 10.0),
    ]
    df = spark.createDataFrame(rows, "l_returnflag string, l_quantity double")
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    from mapreduce_spark.registry import get_queries

    got = {
        r.l_returnflag: r
        for r in get_queries()["moments_report"](spark, str(tmp_path)).collect()
    }
    a = got["A"]
    # uniform {1..5}: mean 3, m2 = 2, m4 = 6.8 -> excess kurt = 6.8/4 - 3
    assert a.n == 5
    assert a.mean_qty == 3.0
    assert a.skewness == 0.0
    assert a.kurtosis_excess == round(6.8 / 4.0 - 3.0, 6)
    b = got["B"]
    assert b.n == 4 and b.skewness > 1.0


def test_token_pmi_planted_collocation(spark, tmp_path):
    """6 copies of the bigram 'new york' clear the min-count gate; a
    4-copy pair is counted in the totals but excluded from the output.
    PMI matches the closed form on the planted counts."""
    import math

    docs = [("new york",)] * 6 + [("aa bb",)] * 4
    df = spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(docs)], "doc_id bigint, text string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from mapreduce_spark.registry import get_queries

    rows = get_queries()["token_pmi"](spark, str(tmp_path)).collect()
    assert [(r.w1, r.w2) for r in rows] == [("new", "york")]
    r = rows[0]
    assert (r.c_ab, r.c_w1, r.c_w2) == (6, 6, 6)
    # n_pairs = 10, n_tok = 20
    assert r.pmi == round(math.log((6 / 10) / ((6 / 20) * (6 / 20))), 6)


def test_span_corruption_plan_matches_python_recompute(spark, tmp_path):
    """The deterministic md5-drawn span plan matches an independent
    Python recompute of the same draws (starts at rate 1/14, lengths
    1..5, overlapping spans merged), and merged-span counts are
    consistent with the masked bitmap."""
    import hashlib

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from mapreduce_spark.operators.textops import SPAN_EVERY, SPAN_MAXL
    from mapreduce_spark.registry import get_queries

    def md5l(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = {
        r.doc_id: r
        for r in get_queries()["span_corruption_plan"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {0, 1, 2}
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.lower().split() if t]
        n = len(toks)
        starts = [
            md5l(f"{doc_id}:{j}") % SPAN_EVERY == 0 for j in range(1, n + 1)
        ]
        lens = [
            1 + md5l(f"{doc_id}:{j}:L") % SPAN_MAXL for j in range(1, n + 1)
        ]
        masked = [
            any(
                starts[s - 1] and lens[s - 1] > j - s
                for s in range(max(j - (SPAN_MAXL - 1), 1), j + 1)
            )
            for j in range(1, n + 1)
        ]
        n_masked = sum(masked)
        n_spans = sum(
            1
            for j in range(n)
            if masked[j] and (j == 0 or not masked[j - 1])
        )
        r = rows[doc_id]
        assert r.n_tokens == n
        assert r.n_masked == n_masked
        assert r.n_spans == n_spans
        assert r.noise_frac == round(n_masked / n, 6)
        # the merged-span structure is internally consistent
        assert r.n_spans <= r.n_masked <= r.n_spans * (2 * SPAN_MAXL - 1)
