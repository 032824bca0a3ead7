"""Relational core operators (SURVEY.md §2C Q1-Q10, Q14-Q16, Q18 + extras).

Every operator here is expressible as a user executable in the reference's
(map -> hash-partition -> sort -> group -> reduce) algebra
(/root/reference/mapreduce/worker/__main__.py:94-155); we express them
natively so Catalyst gets pushdown/pruning/partial-aggregation for free.

Scale notes per query are inline; the common rules:
- no collect()/toPandas() anywhere — plans stay distributed end to end;
- aggregates use exact decimal sums (functions.exact) so results are
  order-independent — mandatory at 1000-executor parallelism;
- filters/projections sit directly on the scan so they push into parquet.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduce_spark.functions.exact import davg, dsum
from mapreduce_spark.functions.text import tokens
from mapreduce_spark.registry import register
from mapreduce_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Q1 scan + projection
@register(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: ReadSchema carries only the 4 columns."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# Q2 substring filter (the reference's grep workload,
# /root/reference/tests/testdata/exec/grep_map.py:28)
@register(
    "filter_grep",
    oracle="""
    SELECT doc_id, text FROM documents WHERE lower(text) LIKE '%data%'
    """,
)
def filter_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring filter — grep as a pushed-down predicate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).contains("data")).select("doc_id", "text")


# Q3 comparison/boolean predicates
@register(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag = 'R'
      AND l_shipdate >= TIMESTAMP '1995-06-01'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates; all three push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


# Q4 scalar row transforms (string/math/date)
@register(
    "map_transform",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                      AS priority_uc,
           substring(o_orderpriority, 1, 1)            AS priority_code,
           concat(o_orderstatus, '-', o_orderpriority) AS status_tag,
           CAST(year(o_orderdate) AS INTEGER)          AS order_year,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,2)), 2)
                AS DOUBLE)                              AS price_with_tax
    FROM orders
    """,
)
def map_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow per-row transform; whole-stage codegen, zero shuffles.

    price_with_tax is computed in exact decimal on BOTH engines (double
    `o_totalprice * 1.1` disagrees in the last cent between engines), then
    cast to double once — the same discipline as functions/exact.py.
    """
    o = load_table(spark, sf_dir, "orders")
    tax = F.col("o_totalprice").cast("decimal(18,2)") * F.lit(1.1).cast("decimal(3,2)")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("priority_uc"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_tag"),
        F.year("o_orderdate").alias("order_year"),
        F.round(tax, 2).cast("double").alias("price_with_tax"),
    )


# Q5 word count — the reference's flagship workload
# (/root/reference/tests/testdata/exec/wc_map.sh, wc_reduce.sh)
@register(
    "wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    t -> t <> '')) AS word
          FROM documents)
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokenize -> explode -> count. Partial aggregation (map-side combine)
    happens before the shuffle — the upgrade the reference lacked (its wc
    mapper emits every `word\\t1` across the network)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "wordcount_salted",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    t -> t <> '')) AS word
          FROM documents)
    GROUP BY word
    """,
)
def wordcount_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof wordcount: natural text is Zipfian ("the"-class keys
    overload single reducers — the same exposure as the reference's
    md5-mod-R shuffle, SURVEY §4.3). Two-phase salted aggregation: count
    per (word, salt) with a random 4-way salt — splitting each hot key
    across 4 reducers — then merge the partial counts per word. Same
    answer as `wordcount` (identical oracle), bounded per-reducer load at
    any scale. The salt column never leaves the first aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    n_salts = 4
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy("word", "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy("word")
        .agg(F.sum("_partial").alias("cnt"))
    )


# Q6 hash aggregation (TPC-H Q1 shape)
@register(
    "groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter -> hash agg (partial+final) on 2 keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count("*").alias("count_order"),
        )
    )


# Q7 composite grouping keys
@register(
    "groupby_multikey",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority, CAST(year(o_orderdate) AS INTEGER)
    """,
)
def groupby_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-part composite key incl. a computed key (year)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        "o_orderstatus", "o_orderpriority", F.year("o_orderdate").alias("order_year")
    ).agg(
        F.count("*").alias("cnt"),
        dsum("o_totalprice", "total"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


# Q8 distinct
@register(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup = groupBy-all-cols; partial distinct runs map-side."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_linenumber")
        .distinct()
    )


# Q9 global sort
@register(
    "sort_global",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier ORDER BY s_acctbal DESC, s_suppkey
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order via range partitioning + local sort (sampled boundaries).
    The reference only ever sorts within a partition
    (/root/reference/mapreduce/worker/__main__.py:130-136)."""
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    )


# Q10 top-k
@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject: per-partition heap
    top-k, then a k-row merge on one task — no global sort materialized.
    Tie-break on o_orderkey keeps the answer engine-independent."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# Q14 union all
@register(
    "union_all",
    oracle="""
    SELECT o_custkey AS entity_id, o_totalprice AS amount, 'order' AS src FROM orders
    UNION ALL
    SELECT c_custkey AS entity_id, c_acctbal AS amount, 'customer' AS src FROM customer
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: concatenation, no shuffle, partitions appended."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_totalprice").alias("amount"),
        F.lit("order").alias("src"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_acctbal").alias("amount"),
        F.lit("customer").alias("src"),
    )
    return o.unionByName(c)


# Q15 set intersection / difference
@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — shuffle both sides on the full row."""
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    pos_cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return big_orders.intersect(pos_cust)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics)."""
    all_cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    big_spenders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return all_cust.subtract(big_spenders)


# Q16 controlled hash partitioning
@register(
    "partition_by_hash",
    oracle="""
    SELECT CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)
                AS BIGINT) % 16 AS bucket,
           count(*) AS cnt
    FROM lineitem GROUP BY bucket
    """,
)
def partition_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's md5-mod-R shuffle write
    (/root/reference/mapreduce/worker/__main__.py:106-117) as declarative
    hash partitioning: bucket = md5_long(key) % 16 (functions/hashing.py —
    deterministic and reproducible bit-for-bit in DuckDB, unlike Spark's
    internal Murmur3 layout), physically repartitioned by that bucket, then
    per-bucket row counts. Keys land in exactly one bucket; the histogram
    is engine-independent, so Q16 gets a full value oracle instead of the
    rows-only check it had in rounds 1-2."""
    from mapreduce_spark.functions.hashing import md5_long

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        li.withColumn("bucket", md5_long(F.col("l_orderkey").cast("string")) % 16)
        .repartition(16, "bucket")
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


# Q18 distinct aggregation
@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct: Catalyst expands to a single grouped plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


# -- extras beyond the lettered inventory ----------------------------------

@register(
    "having_filter",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey HAVING count(*) >= 15
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1.5
        FROM orders)
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above 1.5x the mean price. The threshold is computed with the
    exact decimal sum so both engines derive the identical double; the
    1-row aggregate is broadcast against the fact scan (no driver
    round-trip, no session temp-view side effects)."""
    o = load_table(spark, sf_dir, "orders")
    thr = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
            * 1.5
        ).alias("_thr")
    )
    return (
        o.join(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("_thr"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "case_when_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS tier,
           count(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation over the bucket."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("tier")
    )
    return o.groupBy(tier).agg(
        F.count("*").alias("cnt"), dsum("o_totalprice", "total")
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


@register(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all key subsets)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))


@register(
    "pivot_status",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns (explicit value list => single pass,
    no extra distinct-values job)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           CAST(length(p_name) AS INTEGER)   AS name_len,
           upper(p_brand)                    AS brand_uc,
           replace(p_type, ' ', '_')         AS type_slug,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand)                  AS brand_rev,
           trim(concat(' ', p_name, ' '))    AS name_trim
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (length/upper/replace/lpad/reverse/trim)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_uc"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)       AS y,
           CAST(month(o_orderdate) AS INTEGER)      AS m,
           CAST(day(o_orderdate) AS INTEGER)        AS d,
           CAST(dayofweek(o_orderdate) AS INTEGER)  AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction; Spark dayofweek is 1=Sunday, DuckDB 0=Sunday,
    normalized here by subtracting 1. month_start stays TIMESTAMP_NTZ on
    both sides — DATE output columns are banned registry-wide
    (tests/test_driver_canon.py): Spark dates reach pandas as object while
    DuckDB dates arrive datetime64, mismatching the driver's typed hash."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start"),
    )


@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                    AS disc_dev,
           CAST(ceil(l_extendedprice) AS BIGINT)     AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT)    AS price_floor,
           round(sqrt(l_quantity), 6)                AS qty_sqrt,
           round(ln(l_extendedprice), 6)             AS price_ln,
           round(power(l_tax, 2), 6)                 AS tax_sq
    FROM lineitem
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery; transcendentals rounded to 6 dp to absorb any last-ulp
    libm divergence across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_tax", 2), 6).alias("tax_sq"),
    )


@register(
    "quantile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles via the value-distribution method.

    Spark's `percentile` buffers every value of a group in one executor —
    a scale-killer when a group holds billions of rows. Instead we exploit
    fixed-point measures (l_quantity has ~50 distinct values): aggregate to
    (group, value, count) — map-side partial agg shrinks this to
    |groups|x|values| rows — then compute the interpolated quantile from
    cumulative counts. Exact at any data size; the window runs over the
    tiny distribution, never the raw rows.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    dist = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dist = (
        dist.withColumn("cum_end", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("l_returnflag")))
        .withColumn("cum_start", F.col("cum_end") - F.col("cnt") + 1)
    )

    def value_at(rank):  # value whose cumulative rank range covers `rank`
        return F.max(
            F.when((rank >= F.col("cum_start")) & (rank <= F.col("cum_end")), F.col("l_quantity"))
        )

    def rank_lo(q):  # 1-based interpolation position, floored/ceiled
        return F.floor(F.lit(1.0) + (F.col("n") - 1) * F.lit(q))

    def rank_hi(q):
        return F.ceil(F.lit(1.0) + (F.col("n") - 1) * F.lit(q))

    agg = dist.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        value_at(rank_lo(0.5)).alias("v_lo_50"),
        value_at(rank_hi(0.5)).alias("v_hi_50"),
        value_at(rank_lo(0.9)).alias("v_lo_90"),
        value_at(rank_hi(0.9)).alias("v_hi_90"),
    )

    def interp(q, lo, hi, alias):
        pos = F.lit(1.0) + (F.col("n") - 1) * F.lit(q)
        frac = pos - F.floor(pos)
        return F.round(F.col(lo) + frac * (F.col(hi) - F.col(lo)), 6).alias(alias)

    return agg.select(
        "l_returnflag",
        interp(0.5, "v_lo_50", "v_hi_50", "median_qty"),
        interp(0.9, "v_lo_90", "v_hi_90", "p90_qty"),
    )


@register(
    "collect_sorted",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list -> array_sort -> join: deterministic string aggregation
    (collect order is nondeterministic; the sort restores determinism).
    Scale note: collect_list buffers a group in memory — safe here because
    group size is bounded by the domain (nations per region); for unbounded
    groups use window_rank-style top-k pruning before collecting."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


# --------------------------------------------------------------------------
# Semi-structured + collection functions (SURVEY.md §2 "absent" list:
# JSON/array/map functions have no reference analog — native Spark surface).
@register(
    "json_functions",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k
    FROM events
    GROUP BY event_type
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props payload column:
    get_json_object pulls $.k out of each JSON string JVM-side (no Python),
    then a standard aggregate. At scale the JSON parse is per-row
    map-side work that pipelines inside codegen before the tiny shuffle."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
        )
    )


@register(
    "array_functions",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  s -> s <> '') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           toks[1] AS first_tok,
           list_max(toks) AS max_tok,
           list_contains(toks, 'the') AS has_the,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted
    FROM t WHERE len(toks) > 0
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection function surface over the token array: size,
    distinct count, element access, max, membership, slice of the sorted
    distinct set. All JVM-side collection expressions — zero shuffles,
    pure map-side pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens("text").alias("toks")).filter(F.size("toks") > 0)
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.col("toks")[0].alias("first_tok"),
        F.array_max("toks").alias("max_tok"),
        F.array_contains("toks", "the").alias("has_the"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct("toks")), 1, 3), ","
        ).alias("first3_sorted"),
    )


@register(
    "sample_hash",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                                     CAST(l_linenumber AS VARCHAR)), 1, 15)
               AS BIGINT) % 100 < 5
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample via content hashing — the reproducible way
    to sample 100 TB (rand() samples differ per run/engine; hash samples
    are stable, shardable, and join-consistent across tables keyed the
    same way). Pure map-side filter; no shuffle, no state."""
    from mapreduce_spark.functions.hashing import md5_long

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber"))
    return li.filter(md5_long(key) % 100 < 5).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "map_functions",
    oracle="""
    SELECT user_id,
           NULLIF(count(*) FILTER (WHERE event_type = 'click'), 0) AS n_click,
           CAST(count(DISTINCT event_type) AS INTEGER) AS n_types
    FROM events GROUP BY user_id
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: per-user (event_type -> count) map built with
    map_from_entries over the per-type counts, then element_at lookup
    (NULL when the key is absent — mirrored by NULLIF in the oracle) and
    size(). The collect_list is bounded by |event types| per user, so the
    map stays tiny at any scale; one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_counts")
    )
    return m.select(
        "user_id",
        F.element_at("type_counts", "click").alias("n_click"),
        F.size("type_counts").alias("n_types"),
    )


@register(
    "unpivot_metrics",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM w
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (the inverse of pivot_status): aggregate to a
    wide per-flag row, then unpivot the measure columns into (metric,
    value) pairs. unpivot is a zero-shuffle row explosion — the reshape
    happens after the aggregation, so only |groups| x |metrics| rows move."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"), dsum("l_extendedprice", "sum_price")
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT l_returnflag, l_orderkey, l_linenumber
    FROM lineitem
    WHERE CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                                     CAST(l_linenumber AS VARCHAR)), 1, 15)
               AS BIGINT) % 1000 <
          CASE l_returnflag WHEN 'R' THEN 50 WHEN 'N' THEN 100 ELSE 200 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum rates (R 5%, N 10%,
    A 20%) applied through the same content hash as sample_hash, so rare
    strata can be over-sampled reproducibly — the balanced-training-mix
    primitive (DataFrame.sampleBy's scale-safe twin: sampleBy's seeded
    draw is per-partition RNG state, so the SAME row flips in/out when
    partitioning, retries or split sizes change; this draw is a pure
    function of the row and is partitioning-independence-tested in
    tests/test_curation.py). Map-side filter only; rates live in one
    CASE expression."""
    from mapreduce_spark.functions.hashing import md5_long

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber"))
    rate = (
        F.when(F.col("l_returnflag") == "R", 50)
        .when(F.col("l_returnflag") == "N", 100)
        .otherwise(200)
    )
    return li.filter(md5_long(key) % 1000 < rate).select(
        "l_returnflag", "l_orderkey", "l_linenumber"
    )


# ---------------------------------------------------------------------------
# Heavy-hitter diagnostics: the skew report behind salting decisions
@register(
    "key_skew_report",
    oracle="""
    WITH c AS (SELECT o_custkey AS key, count(*) AS n
               FROM orders GROUP BY o_custkey),
    t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c)
    SELECT key, n, round(n / total, 6) AS share
    FROM c, t
    ORDER BY n DESC, key
    LIMIT 10
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest join/agg keys with their share of all rows — the
    diagnostic that decides when to salt (wordcount_salted, join_salted)
    or rely on AQE skew splitting. One groupBy on the key, a broadcast
    1-row total, and a TakeOrderedAndProject top-k: nothing in the plan
    holds more than the key histogram."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.agg(F.sum("n").cast("double").alias("total"))
    return (
        c.join(F.broadcast(t))
        .select("key", "n", F.round(F.col("n") / F.col("total"), 6).alias("share"))
        .orderBy(F.col("n").desc(), "key")
        .limit(10)
    )


@register(
    "quantile_weighted",
    oracle="""
    WITH d AS (
        SELECT l_returnflag, l_quantity,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS w
        FROM lineitem GROUP BY l_returnflag, l_quantity),
    c AS (
        SELECT l_returnflag, l_quantity, w,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM d)
    SELECT l_returnflag,
           CAST(min(CASE WHEN 2 * cumw >= tw THEN l_quantity END)
                AS DOUBLE) AS wmedian_qty,
           CAST(min(CASE WHEN 10 * cumw >= 9 * tw THEN l_quantity END)
                AS DOUBLE) AS wp90_qty
    FROM c GROUP BY l_returnflag
    """,
)
def quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED quantiles by the distribution method: the
    revenue-weighted median and p90 order quantity per return flag —
    "half the revenue ships in orders of at most N units", the
    inventory-planning statistic an unweighted median misstates
    whenever big orders carry disproportionate value. quantile_exact's
    scale shape carried to weights: aggregate to the (group, value,
    weight-sum) distribution (map-side combined, |groups| x ~50 rows
    for l_quantity), then the lower weighted quantile is the smallest
    value whose cumulative weight clears the threshold — pure integer
    arithmetic on exact cent sums (2*cumw >= W and 10*cumw >= 9*W avoid
    any division), so both engines agree bit-for-bit. No raw-row
    window, no per-group buffering, exact at any size."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("w")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cumw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(Window.partitionBy("l_returnflag"))
    )
    return c.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cumw") >= F.col("tw"), F.col("l_quantity")))
        .cast("double")
        .alias("wmedian_qty"),
        F.min(
            F.when(10 * F.col("cumw") >= 9 * F.col("tw"), F.col("l_quantity"))
        )
        .cast("double")
        .alias("wp90_qty"),
    )
