"""Relational operator inventory — SURVEY.md §2.B–§2.H.

The reference exposes the full SQL surface through Trino + Spark SQL
over its Iceberg tables (/root/reference/README.md:66-98; catalog
wiring /root/reference/scripts/extract_load.py:32,42-46). This module
re-expresses that surface natively in the DataFrame API, one named
query per capability row, each with a DuckDB oracle.

Scale notes per family:
- Joins: dimensions (region/nation/supplier, and customer at fixture
  scale) carry explicit ``broadcast()`` hints; fact-fact joins rely on
  sort-merge + AQE skew handling. Non-equi conditions always ride on
  top of an equi key so Spark never falls back to a nested-loop join
  on the fact table.
- Aggregations: all `groupBy` on natural low-cardinality keys → tiny
  shuffles after map-side partial aggregation.
- Windows: partition keys chosen with bounded fan-out (priority,
  status, user) so no single partition exceeds executor memory; the
  running-sum frame is ROWS-bounded which Spark evaluates in a single
  pass.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table as T
from .common import make_registry, davg, dec, dsum, sql_davg, sql_dsum

QUERIES, ORACLES, query = make_registry()


# ---------------------------------------------------------------------------
# §2.D — flagship aggregation (TPC-H Q1 pricing summary)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty} AS sum_qty,
           {sum_base} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           {avg_qty} AS avg_qty,
           {avg_price} AS avg_price,
           {avg_disc} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=sql_dsum("l_quantity"),
        sum_base=sql_dsum("l_extendedprice"),
        avg_qty=sql_davg("l_quantity"),
        avg_price=sql_davg("l_extendedprice"),
        avg_disc=sql_davg("l_discount"),
    ),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: scan → filter → hash-agg (SURVEY D2).

    Shuffles once on a 6-value grouping key after map-side partials;
    the shipdate predicate pushes down to the parquet scan.
    """
    li = T(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.B — projections / filters / predicates
# ---------------------------------------------------------------------------

@query(
    "b_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity < 25
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus IS NOT NULL
    """,
)
def b_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison / BETWEEN / IN / IS NULL predicates (SURVEY B5).

    All four predicates push down to the parquet scan (PushedFilters),
    and the 5-column projection prunes the read schema.
    """
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 25)
        & F.col("l_discount").between(0.05, 0.07)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "b_like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%a%'
    """,
)
def b_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern predicates (SURVEY B2/B5); prefix LIKE pushes down."""
    p = T(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%") | F.col("p_name").like("%a%")
    ).select("p_partkey", "p_name", "p_type")


# ---------------------------------------------------------------------------
# §2.C — joins
# ---------------------------------------------------------------------------

@query(
    "c1_join_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND r.r_name IN ('ASIA', 'EUROPE', 'AMERICA', 'AFRICA', 'MIDDLE EAST')
    GROUP BY n.n_name
    """,
)
def c1_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join star query (SURVEY C1/C5, TPC-H Q5-ish).

    Join order: fact(lineitem) ⋈ orders on orderkey (the only
    fact-fact join → sort-merge, AQE-skew-aware), then dims customer/
    nation/region attached with explicit broadcast hints — at 100 TB
    the fact side streams once with zero extra shuffles for the dims.
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE", "AMERICA", "AFRICA", "MIDDLE EAST")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@query(
    "c2_join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def c2_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (SURVEY C2).

    At scale: count orders per custkey FIRST (map-side combinable),
    then outer-join the tiny aggregate — never outer-join the raw fact.
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("order_cnt"),
        )
    )


@query(
    "c2_join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(c_cnt, 0) AS customer_cnt,
           COALESCE(s_cnt, 0) AS supplier_cnt
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def c2_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (SURVEY C2)."""
    cn = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    sn = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("c_cnt", F.lit(0)).cast("bigint").alias("customer_cnt"),
        F.coalesce("s_cnt", F.lit(0)).cast("bigint").alias("supplier_cnt"),
    )


@query(
    "c3_join_semi",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def c3_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with an open order (SURVEY C3)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@query(
    "c3_join_anti",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def c3_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all (SURVEY C3/B4).

    Same primitive as the reference's incremental new-file detection
    (set difference, /root/reference/scripts/extract_load.py:155-156),
    expressed as a distributed anti-join instead of driver Python.
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@query(
    "c4_theta_join",
    oracle="""
    SELECT s.s_nationkey AS nationkey, COUNT(*) AS richer_pairs
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_nationkey
    """,
)
def c4_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + non-equi residual (SURVEY C4).

    The nationkey equi-condition keeps this a hash/sort-merge join
    with the acctbal comparison as a residual filter — never a
    nested-loop over the cross product.
    """
    s = T(spark, sf_dir, "supplier")
    c = T(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy(s.s_nationkey.alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("richer_pairs"))
    )


@query(
    "c4_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def c4_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny inputs (SURVEY C4) — both sides bounded."""
    r = T(spark, sf_dir, "region").select("r_name")
    s = T(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@query(
    "c6_range_join",
    oracle="""
    SELECT b.band, COUNT(*) AS part_cnt, {avg_price} AS avg_price
    FROM part p
    JOIN (VALUES ('low', 0.0, 500.0), ('mid', 500.0, 1200.0),
                 ('high', 1200.0, 1e9)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """.format(avg_price=sql_davg("p_retailprice")),
)
def c6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join against a band table (SURVEY C6).

    The band side is a literal dimension → broadcast nested-loop over
    a 3-row table, i.e. effectively a map-side lookup. At scale with a
    large band table you'd bucketize the fact value to convert this to
    an equi-join; with a handful of bands, broadcast is optimal.
    """
    p = T(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 500.0), ("mid", 500.0, 1200.0), ("high", 1200.0, 1e9)],
        ["band", "lo", "hi"],
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("part_cnt"),
            davg("p_retailprice").alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# §2.D — aggregations
# ---------------------------------------------------------------------------

@query(
    "d2_group_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS order_cnt,
           {s} AS sum_total,
           {a} AS avg_total,
           MIN(o_totalprice) AS min_total,
           MAX(o_totalprice) AS max_total
    FROM orders GROUP BY o_orderpriority
    """.format(s=sql_dsum("o_totalprice"), a=sql_davg("o_totalprice")),
)
def d2_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum/avg/min/max/count (SURVEY D2)."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        dsum("o_totalprice").alias("sum_total"),
        davg("o_totalprice").alias("avg_total"),
        F.min("o_totalprice").alias("min_total"),
        F.max("o_totalprice").alias("max_total"),
    )


@query(
    "d3_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS nations,
           COUNT(*) AS customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def d3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (SURVEY D3) — expands then de-dups
    via Spark's two-stage distinct-aggregate rewrite."""
    c = T(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("nations"),
        F.count(F.lit(1)).alias("customers"),
    )


@query(
    "d4_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           {s} AS sum_qty, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.format(s=sql_dsum("l_quantity")),
)
def d4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping id (SURVEY D4)."""
    li = T(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")


@query(
    "d4_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def d4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two keys (SURVEY D4)."""
    o = T(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@query(
    "d5_having",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS cust_cnt
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 3
    """,
)
def d5_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter, SQL HAVING (SURVEY D5)."""
    c = T(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
        .filter(F.col("cust_cnt") > 3)
    )


@query(
    "d6_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def d6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection (SURVEY D6)."""
    return T(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "d7_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 2) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 2) AS var_qty,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 2) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d7_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (SURVEY D7): stddev/variance/median.

    `percentile` is the exact interpolated quantile (matches DuckDB's
    QUANTILE_CONT); at 100 TB you'd swap in `percentile_approx`
    (t-digest sketch, single pass, mergeable) and drop the oracle.
    """
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 2).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 2).alias("median_qty"),
    )


# ---------------------------------------------------------------------------
# §2.E — window functions
# ---------------------------------------------------------------------------

@query(
    "e1_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, o_orderpriority,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 5
    """,
)
def e1_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions + top-k filter (SURVEY E1/F4).

    Function-coverage query: row_number/rank/dense_rank/ntile in one
    pass. Note ntile disqualifies the WindowGroupLimit rewrite — for
    pure top-k at scale use the f4_topk_per_group formulation, which
    ships only per-partition heads.
    """
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "e2_window_lag_lead",
    oracle="""
    SELECT event_id,
           ROUND(value - LAG(value) OVER w, 2) AS delta_prev,
           ROUND(LEAD(value) OVER w - value, 2) AS delta_next,
           FIRST_VALUE(event_id) OVER w AS first_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e2_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first analytic windows over an event stream (SURVEY E2)."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
        F.first("event_id").over(w).alias("first_event"),
    )


@query(
    "e3_window_running",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_sum10
    FROM orders
    """,
)
def e3_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running sum + moving average (SURVEY E3).

    Decimal accumulation keeps the running sum order-exact; the frame
    is ROWS-bounded so Spark evaluates it streamingly per partition.
    """
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-9, 0)
    return o.select(
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(run).cast("double").alias("running_total"),
        F.sum(dec("o_totalprice")).over(mov).cast("double").alias("moving_sum10"),
    )


# ---------------------------------------------------------------------------
# §2.F — sorts / limits / top-k
# ---------------------------------------------------------------------------

@query(
    "f2_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def f2_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (SURVEY F2/F3).

    Spark plans this as TakeOrderedAndProject: per-partition top-10
    then a driver-side merge of k*partitions rows — no global sort,
    scales to any input size.
    """
    o = T(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .limit(10)
    )


@query(
    "f4_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    ) WHERE rn <= 2
    """,
)
def f4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (SURVEY F4)."""
    p = T(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# §2.G — set operations
# ---------------------------------------------------------------------------

@query(
    "g_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def g_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets (SURVEY G)."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.union(b).distinct()


@query(
    "g_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def g_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (SURVEY G)."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "g_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def g_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set EXCEPT — the reference's incremental set difference as SQL
    (SURVEY G; /root/reference/scripts/extract_load.py:155-156)."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


@query(
    "g_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def g_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag EXCEPT ALL (multiplicity-aware difference, SURVEY G)."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# §2.H — scalar functions
# ---------------------------------------------------------------------------

@query(
    "h2_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           TRIM(CONCAT(p_brand, ' ', p_type)) AS brand_type,
           CAST(REGEXP_EXTRACT(p_brand, '#(\\d+)', 1) AS BIGINT) AS brand_num,
           LEN(STRING_SPLIT(p_name, ' ')) AS name_words
    FROM part
    """,
)
def h2_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (SURVEY H2)."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat("p_brand", F.lit(" "), "p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("bigint").alias("brand_num"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("name_words"),
    )


@query(
    "h3_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS order_year,
           MONTH(o_orderdate) AS order_month,
           DAY(o_orderdate) AS order_day,
           QUARTER(o_orderdate) AS order_quarter,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
    FROM orders
    """,
)
def h3_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (SURVEY H3).

    Temporal outputs are formatted as strings / day counts so the
    value-hash is representation-stable across engines.
    """
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
    )


@query(
    "h4_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 4) AS price_r4,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_floor7,
           ROUND(SQRT(l_extendedprice), 2) AS price_sqrt,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod5
    FROM lineitem
    """,
)
def h4_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (SURVEY H4). sqrt/abs are IEEE-exact;
    transcendentals (ln/exp) are excluded from the oracle set because
    libm rounding differs across engines."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 4).alias("price_r4"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / 7).alias("qty_floor7"),
        F.round(F.sqrt("l_extendedprice"), 2).alias("price_sqrt"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
    )


@query(
    "h5_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                WHEN o_totalprice < 10000 THEN 'medium'
                ELSE 'large' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_norm,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2
    """,
)
def h5_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif (SURVEY H5)."""
    o = T(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "medium")
        .otherwise("large")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending"))
    return (
        o.select(band.alias("price_band"), status.alias("status_norm"))
        .groupBy("price_band", "status_norm")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "h6_array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           FLOOR(CAST(embedding[1] AS DOUBLE) * 10000.0 + 0.5) / 10000.0
               AS first_val,
           FLOOR((CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                 + CAST(embedding[3] AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
               AS head3_sum,
           CASE WHEN list_contains(embedding, 0.0) THEN TRUE ELSE FALSE END
               AS has_zero
    FROM embeddings
    """,
)
def h6_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over embedding vectors (SURVEY H6).

    Head-element arithmetic is done in double with per-element casts
    (not a float fold) so both engines compute the identical IEEE sum.

    r9: display rounding is the FLOOR form (floor(x*1e4 + 0.5)/1e4),
    not ROUND — pure IEEE ops on bit-identical operands, so both
    engines produce the same double for every FINITE value (Spark's
    floor(double) returns LONG, so NaN/Inf would diverge — the
    embedding fixture carries neither, and the old ROUND form is the
    right tool if such a column ever needs this treatment). Engine ROUND diverges at
    the representation edges: Spark rounds the binary expansion
    HALF_UP while DuckDB rounds in scaled double arithmetic, and duck
    preserves -0.0 where Spark emits +0.0 (one sf0.1 row hit exactly
    that: value hash 0.0 vs -0.0). The floor form also never emits
    -0.0 (floor of a value in [0, 1) is +0.0)."""
    e = T(spark, sf_dir, "embeddings")
    emb = F.col("embedding")

    def r4(c):
        return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    head3 = (
        emb.getItem(0).cast("double")
        + emb.getItem(1).cast("double")
        + emb.getItem(2).cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        r4(emb.getItem(0).cast("double")).alias("first_val"),
        r4(head3).alias("head3_sum"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@query(
    "h6_explode_unnest",
    oracle="""
    WITH words AS (
      SELECT p_partkey, UNNEST(STRING_SPLIT(p_name, ' ')) AS word
      FROM part
    )
    SELECT word, COUNT(*) AS cnt, COUNT(DISTINCT p_partkey) AS part_cnt
    FROM words GROUP BY word
    """,
)
def h6_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode / UNNEST of a split array (SURVEY H6) → word frequencies."""
    p = T(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("p_partkey").alias("part_cnt"),
        )
    )


@query(
    "h8_json_funcs",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS cnt,
           {v} AS sum_value
    FROM events GROUP BY 1
    """.format(v=sql_dsum("value")),
)
def h8_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (SURVEY H8, events.props)."""
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value"))
    )


@query(
    "h9_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(CAST(o_totalprice AS DECIMAL(12,1)) AS VARCHAR) AS price_dec_str,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CAST(o_orderkey AS DOUBLE) AS BIGINT) AS key_roundtrip
    FROM orders
    """,
)
def h9_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across the type lattice (SURVEY H9).

    double→int goes through explicit FLOOR because bare casts disagree
    across engines (Spark truncates, DuckDB rounds) — the engine
    surfaces the deterministic spelling.
    """
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.col("o_totalprice").cast("decimal(12,1)").cast("string").alias("price_dec_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.col("o_orderkey").cast("double").cast("bigint").alias("key_roundtrip"),
    )


@query(
    "h7_struct_map",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_from_struct,
           o_totalprice AS price_from_struct,
           o_totalprice AS price_from_map,
           'o' || CAST(o_orderkey AS VARCHAR) AS tag
    FROM orders
    WHERE o_totalprice > 200000
    """,
)
def h7_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access and map construction + key
    lookup (SURVEY H7). The Spark side routes values through a real
    STRUCT column and a MAP column and back out — proving the nested
    type surface — while the oracle checks the recovered values.
    Nested build+access is collapsed by Catalyst's
    SimplifyExtractValueOps, so this costs nothing physical.
    """
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    m = F.create_map(
        F.lit("price"), F.col("o_totalprice"),
        F.lit("half"), F.col("o_totalprice") / 2,
    )
    return o.select(
        "o_orderkey",
        s.getField("status").alias("status_from_struct"),
        s.getField("price").alias("price_from_struct"),
        F.element_at(m, F.lit("price")).alias("price_from_map"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("tag"),
    )


@query(
    "d3_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_within_rsd,
           TRUE AS parts_within_rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d3_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate per returnflag (SURVEY D3's
    approx tier). At 100 TB this replaces exact COUNT(DISTINCT) — one
    map-side sketch per partition, constant memory, no distinct
    shuffle.

    Oracle pattern for approximate ops: the exact counts are emitted
    as value columns (DuckDB recomputes them independently) and the
    HLL estimate is emitted as a deterministic within-bound boolean
    (|approx − exact| ≤ 3·rsd·exact, rsd = 0.02) that the oracle pins
    to TRUE. The sketch's error guarantee is thus checked in-driver,
    not just in pytest.
    """
    li = T(spark, sf_dir, "lineitem")
    # Two exact distincts in ONE aggregate would make Spark Expand
    # every row 4× (one replica per distinct/plain aggregate group —
    # measured 25 s at sf0.1). Instead: each exact distinct is its own
    # dedup-then-count (two cheap shuffles over shrinking data), the
    # HLL sketches ride a plain map-side agg, and three tiny per-flag
    # results join at the end.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("a_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("a_parts"),
    )
    exact_o = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    exact_p = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )

    def within(a: str, x: str) -> F.Column:
        return F.abs(F.col(a) - F.col(x)) <= F.col(x) * F.lit(0.06)

    return (
        sketches.join(exact_o, "l_returnflag")
        .join(exact_p, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            "exact_parts",
            within("a_orders", "exact_orders").alias("orders_within_rsd"),
            within("a_parts", "exact_parts").alias("parts_within_rsd"),
        )
    )


@query(
    "d7_quantiles_approx",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p95_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d7_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles of extendedprice per
    returnflag (SURVEY D7's approx tier) — mergeable sketches, single
    pass, bounded rank error ε = 1/accuracy = 1e-3.

    Round-2 fix (VERDICT "What's wrong" #1): the former array-typed
    `quantiles` column crashed the driver canonicalizer; the result
    is now all-scalar. Each GK estimate is checked against the exact
    percentiles at q ± 2ε (the sketch guarantees a value whose rank
    is within ε·n of target, hence between those exact quantiles) and
    emitted as a boolean the DuckDB oracle pins to TRUE, alongside
    the exact group cardinality as a real value column.
    """
    li = T(spark, sf_dir, "lineitem")
    qs = (0.25, 0.50, 0.75, 0.95)
    eps = 2.0e-3  # 2× the GK epsilon at accuracy=1000
    # ONE GK sketch evaluated at all 4 targets and ONE exact
    # percentile buffer evaluated at all 8 bound ranks (array forms) —
    # 12 independent aggregate buffers measured 9.0 s at sf0.1; the
    # two array-typed aggregates take 1.6 s. Arrays stay internal;
    # the output is all-scalar for the harness canonicalizer.
    bound_qs = [max(0.0, q - eps) for q in qs] + [min(1.0, q + eps) for q in qs]
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile_approx("l_extendedprice", list(qs), 1000).alias("approx"),
        F.percentile("l_extendedprice", F.array(*[F.lit(b) for b in bound_qs])).alias(
            "bounds"
        ),
    )
    cols = [F.col("l_returnflag"), F.col("n_rows")]
    for i, q in enumerate(qs):
        tag = f"{int(q * 100)}"
        a = F.element_at("approx", i + 1)
        lo = F.element_at("bounds", i + 1)
        hi = F.element_at("bounds", i + 5)
        cols.append(((lo <= a) & (a <= hi)).alias(f"p{tag}_ok"))
    return agg.select(*cols)


@query(
    "d13_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def d13_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via bitmap aggregates
    (SURVEY D3's third rung, between exact COUNT(DISTINCT) and HLL):
    distinct customers per order priority computed as

      groupBy(priority, bitmap_bucket_number(key), slice)
        -> bitmap_construct_agg          (partials)
      groupBy(priority, bucket) -> bitmap_or_agg    (MERGE partials)
      groupBy(priority) -> sum(bitmap_count)        (finalize)

    The middle OR-merge is the point: bitmap partials are mergeable
    state, so an incremental rollup can keep (priority, bucket,
    bitmap) materialized and OR in each new day's partial WITHOUT
    re-scanning history — exactness of HLL-style composability,
    none of HLL's error. Per-bucket bitmaps cover 2^15 adjacent key
    values in ≤4 KiB, so the shuffled state is bounded by the key
    range, not the row count; expand-distinct would shuffle every
    (priority, custkey) row instead. The `slice` stage stands in for
    per-increment partials (here: order-year) and proves the merge
    path; the oracle recomputes with plain COUNT(DISTINCT).
    """
    orders = T(spark, sf_dir, "orders")
    partials = (
        orders.select(
            "o_orderpriority",
            F.year("o_orderdate").alias("slice"),
            F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
            F.bitmap_bit_position(F.col("o_custkey")).alias("pos"),
        )
        .groupBy("o_orderpriority", "slice", "bucket")
        .agg(
            F.bitmap_construct_agg(F.col("pos")).alias("bm"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    merged = partials.groupBy("o_orderpriority", "bucket").agg(
        F.bitmap_or_agg(F.col("bm")).alias("bm"),
        F.sum("n").alias("n"),
    )
    return merged.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_customers"),
        F.sum("n").alias("n_orders"),
    )


@query(
    "c8_salted_skew_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {rev} AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """.format(
        rev="CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
    ),
)
def c8_salted_skew_join(
    spark: SparkSession, sf_dir: str, salt_buckets: int = 8
) -> DataFrame:
    """Manually salted fact-to-fact join (the pre-AQE skew weapon,
    still needed when one key dominates beyond what AQE's split
    threshold catches). Semantics-neutral — the oracle is the plain
    join.

    Build side replicates each row salt_buckets times with salt
    0..S-1; probe side computes a deterministic salt from the row
    hash. The join key becomes (key, salt), so a hot key's rows
    spread over S reducers instead of one. Replication cost is S× the
    BUILD side only — choose the smaller input. AQE's runtime skew
    split (spark.sql.adaptive.skewJoin) makes this unnecessary for
    moderate skew; the operator documents the heavy-artillery form.
    """
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = T(spark, sf_dir, "lineitem")
    salted_build = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(salt_buckets)]))
    )
    salted_probe = li.withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    return (
        salted_probe.join(
            salted_build,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (salted_probe["salt"] == salted_build["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "e1_window_pct",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0
               AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def e1_window_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking windows: percent_rank / cume_dist / ntile
    (SURVEY E1's statistical tier). Unique (price, key) sort order
    makes ranks deterministic; display rounding is the FLOOR form
    (floor(x*1e6 + 0.5)/1e6) in BOTH engines — the exact rationals
    these functions emit can land on 6-dp half-ties where engine
    ROUNDs disagree (the e4 sf0.1 finding; r9 review caught this
    query's oracle switched without its engine side)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        (F.floor(F.percent_rank().over(w) * F.lit(1000000.0)
                 + F.lit(0.5)) / F.lit(1000000.0)).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * F.lit(1000000.0)
                 + F.lit(0.5)) / F.lit(1000000.0)).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "d9_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'price' AS measure, l_extendedprice AS val
      FROM lineitem WHERE l_linenumber <= 2
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_linenumber <= 2
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_linenumber <= 2
    )
    """,
)
def d9_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide measures → long (measure, val) rows — the
    inverse of d8_pivot, one narrow projection + generator, no shuffle
    (SURVEY D family). The oracle spells it as the equivalent UNION ALL."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_extendedprice", "price")
        .when(F.col("measure") == "l_discount", "discount")
        .otherwise("tax"),
    )


@query(
    "c6_range_join_bucketized",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_pairs,
           CAST(MIN(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE))
                AS BIGINT) AS min_lag_days
    FROM orders JOIN lineitem
      ON l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL '4' DAY
    WHERE o_orderpriority = '1-URGENT' AND l_quantity > 45
    GROUP BY o_orderstatus
    """,
)
def c6_range_join_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact interval join via time-bucketing (SURVEY C6's
    scale path). A naive `ON ts BETWEEN lo AND hi` between two fact
    tables is a broadcast-nested-loop → O(n·m). Bucketizing converts
    it to an equi-join: each orders row is replicated to the ceil(w/b)
    week-buckets its 4-day window can touch (≤2 here), lineitem maps
    to exactly one bucket, the join key is an integer, and the range
    predicate refines the coarse matches. Both sides shuffle once on
    the bucket key — sort-merge/hash territory, skew-safe, no
    cross product (asserted in tests/test_plans.py). The selective
    filters push to both scans; without them a 4-day all-pairs window
    over the full tables genuinely yields ~150M pairs at sf0.1 — a
    reminder that interval-join cost is output-bound, not plan-bound.
    """
    bucket_days = 7
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "o_day"
        ),
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        "l_orderkey",
        "l_shipdate",
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias(
            "l_day"
        ),
    )
    # orders row covers days [o_day, o_day+3] → its window may span
    # bucket(o_day) and bucket(o_day+3); sequence emits each once.
    o_bucketed = o.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("o_day") / bucket_days).cast("int"),
                ((F.col("o_day") + 3) / bucket_days).cast("int"),
            )
        ),
    )
    li_bucketed = li.withColumn(
        "bucket", (F.col("l_day") / bucket_days).cast("int")
    )
    return (
        li_bucketed.join(o_bucketed, "bucket")
        .filter(
            (F.col("l_day") >= F.col("o_day"))
            & (F.col("l_day") < F.col("o_day") + 4)
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.col("l_day") - F.col("o_day"))
            .cast("bigint")
            .alias("min_lag_days"),
        )
    )


@query(
    "g_intersect_all",
    oracle="""
    SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def g_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each partkey kept min(countA,
    countR) times (SURVEY G). Catalyst plans it as a single left-semi
    style hash join on (value, occurrence) — no distinct collapse."""
    li = T(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").alias("partkey")
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("partkey")
    )
    return a.intersectAll(r)


@query(
    "h2_regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           translate(p_type, 'AEIOU', 'aeiou') AS tr_type,
           lpad(p_brand, 12, '*') AS lp,
           rpad(p_brand, 12, '.') AS rp,
           LENGTH(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS word_count
    FROM part
    """,
)
def h2_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex replace / translate / padding (SURVEY H2's mutation tier;
    h2_string_funcs covers the extraction tier). Note the dialect trap
    baked into the pairing: Spark regexp_replace is global by default,
    DuckDB needs the explicit 'g' flag."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.translate("p_type", "AEIOU", "aeiou").alias("tr_type"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_brand", 12, ".").alias("rp"),
        (
            F.length(F.regexp_replace("p_name", "[^ ]", "")) + 1
        ).cast("bigint").alias("word_count"),
    )


@query(
    "h3_calendar_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           weekofyear(o_orderdate) AS iso_week,
           dayname(o_orderdate) AS weekday_name,
           CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR)
               AS week_start
    FROM orders
    """,
)
def h3_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar functions (SURVEY H3's calendar tier): month-end, ISO
    week number, weekday name, week start. Both engines use ISO week
    semantics and Monday week starts; dates stringified for a
    representation-stable hash."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        F.date_format("o_orderdate", "EEEE").alias("weekday_name"),
        F.date_trunc("week", "o_orderdate").cast("date").cast("string").alias(
            "week_start"
        ),
    )


@query(
    "h10_try_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(o_orderkey AS DOUBLE) / (o_orderkey % 3)
           END AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 1000 = 0 THEN o_orderpriority
                         ELSE CAST(o_orderkey AS VARCHAR) END
                    AS INT) AS dirty_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
           TRY_CAST(CAST(9223372036854775807 AS HUGEINT)
                    + CASE WHEN o_orderkey % 5000 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS edge_add
    FROM orders
    """,
)
def h10_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-family addendum: the `try_*` escape hatches that make ANSI
    mode (Spark 4's default, on in this engine) livable — division by
    zero, malformed casts, and bigint overflow yield NULL instead of
    failing the job. The DuckDB oracle reproduces each semantics
    explicitly (CASE-guarded division; TRY_CAST; HUGEINT arithmetic
    TRY_CAST back to BIGINT for the overflow), so the NULL contract is
    hash-checked, not assumed. All map-only expression code.

    Failure is deliberately RARE (1/1000 dirty strings, 1/5000
    overflows): `TryEval` catches a real JVM exception per failing
    row, so a try_cast whose input is malformed on EVERY row costs
    ~10x the clean path (measured 1.5 s vs 0.14 s on 150k rows at
    sf0.1, and 2.1 s for an always-overflowing try_add). try_*
    belongs on mostly-clean columns with rare dirt — which is also
    the realistic data-cleaning shape; a column that always fails
    should be handled with an explicit CASE guard instead.
    """
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_orderkey"), F.col("o_orderkey") % 3).alias(
            "safe_div"
        ),
        F.expr(
            "TRY_CAST(CASE WHEN o_orderkey % 1000 = 0 THEN o_orderpriority"
            "              ELSE CAST(o_orderkey AS STRING) END AS INT)"
        ).alias("dirty_cast"),
        F.expr("TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "prio_num"
        ),
        F.try_add(
            F.lit(9223372036854775807),
            F.when(F.col("o_orderkey") % 5000 == 0, 1).otherwise(0),
        ).alias("edge_add"),
    )


@query(
    "d3_hll_sketch_merge",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS merged_within_bound,
           TRUE AS merge_close_to_direct
    FROM lineitem
    """,
)
def d3_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    `hll_sketch_agg` / `hll_union_agg`) — the property that makes
    approximate distincts COMPOSABLE at 100 TB: per-group (or
    per-partition, per-day, per-shard) sketches are tiny binary
    states that union into exactly the sketch a direct global pass
    would have built. That lets a pipeline maintain per-shard
    sketches incrementally and answer global distincts without ever
    re-touching the data.

    Checked here both ways: (a) `merged_within_bound` — the estimate
    from unioning 3 per-returnflag sketches is within 5% of the
    exact distinct, which the DuckDB oracle recomputes independently
    and pins TRUE (same approx-oracle pattern as
    d3_approx_count_distinct); (b) `merge_close_to_direct` — the
    merged estimate is within 2% of the direct whole-table sketch.
    NOT exact equality: DataSketches' union operator may re-target
    the register representation (HLL_4 vs HLL_8 / sparse promotion),
    so union-of-partials preserves the ERROR GUARANTEE, not the
    bit-identical estimate (measured 14908 merged vs 14892 direct vs
    14743 exact at sf0.01).
    """
    li = T(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("est_direct")
    )
    exact = (
        li.select("l_orderkey")
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    return (
        exact.crossJoin(merged)
        .crossJoin(direct)
        .select(
            "exact_orders",
            (
                F.abs(F.col("est_merged") - F.col("exact_orders"))
                <= 0.05 * F.col("exact_orders")
            ).alias("merged_within_bound"),
            (
                F.abs(F.col("est_merged") - F.col("est_direct"))
                <= 0.02 * F.col("est_direct")
            ).alias("merge_close_to_direct"),
        )
    )


@query(
    "e4_analytic_suite",
    oracle="""
    SELECT n_nationkey, c_custkey, c_acctbal,
           FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0
               AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume,
           FIRST_VALUE(c_custkey) OVER w AS poorest,
           NTH_VALUE(c_custkey, 3) OVER w AS third_poorest,
           LAST_VALUE(c_custkey) OVER (
             PARTITION BY n_nationkey ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS richest
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def e4_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window functions (SURVEY E1 completion):
    percent_rank / cume_dist / first_value / nth_value / last_value.
    percent_rank and cume_dist are exact rationals (rank arithmetic /
    row counts), so the raw doubles are bit-identical across engines —
    but a rational CAN land exactly on a 6-dp rounding midpoint, where
    Spark's HALF_UP and DuckDB's scaled-double ROUND disagree (three
    sf0.1 rows did: 0.0640625-class ties). r9: display rounding is the
    FLOOR form (floor(x*1e6 + 0.5)/1e6) in both engines — pure IEEE
    ops on identical operands, tie-free by construction. last_value requires the explicit
    unbounded-following frame in BOTH engines — the default frame ends
    at CURRENT ROW, which silently returns the current row's value;
    nth_value / first_value run on the default frame to pin that
    semantic difference too (nth_value is NULL until 3 peers have been
    seen). (c_acctbal, c_custkey) makes every ordering a total order.
    """
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    w = Window.partitionBy("n_nationkey").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_nationkey",
            "c_custkey",
            "c_acctbal",
            (F.floor(F.percent_rank().over(w) * F.lit(1000000.0)
                     + F.lit(0.5)) / F.lit(1000000.0)).alias("pct_rank"),
            (F.floor(F.cume_dist().over(w) * F.lit(1000000.0)
                     + F.lit(0.5)) / F.lit(1000000.0)).alias("cume"),
            F.first("c_custkey").over(w).alias("poorest"),
            F.nth_value("c_custkey", 3).over(w).alias("third_poorest"),
            F.last("c_custkey").over(w_full).alias("richest"),
        )
    )


@query(
    "h11_null_semantics",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS maybe_status,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM
            NULLIF(o_orderpriority, o_orderpriority)) AS null_safe_eq,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS coalesced,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open,
           CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT NULL
                THEN length(o_orderstatus) END AS closed_len
    FROM orders
    """,
)
def h11_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface (SURVEY H5 completion): NULLIF /
    COALESCE / IS NULL, and NULL-SAFE equality — Spark's `<=>`
    (eqNullSafe) against the ANSI `IS NOT DISTINCT FROM` spelling in
    the oracle, pinning that NULL <=> NULL is TRUE while NULL = NULL
    is NULL. The second NULLIF operand (col vs itself) manufactures a
    guaranteed NULL without leaving the row's own data, so the
    null-safe comparison exercises both NULL-NULL and NULL-value
    cases across the fixture. All map-only."""
    o = T(spark, sf_dir, "orders")
    maybe = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    always_null = F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority"))
    return o.select(
        "o_orderkey",
        maybe.alias("maybe_status"),
        maybe.eqNullSafe(always_null).alias("null_safe_eq"),
        F.coalesce(maybe, F.lit("OPEN")).alias("coalesced"),
        maybe.isNull().alias("is_open"),
        F.when(maybe.isNotNull(), F.length("o_orderstatus")).alias("closed_len"),
    )


@query(
    "d10_histogram",
    oracle="""
    WITH b AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(LEAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 20.0)),
                      19) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(l_extendedprice), 2) AS bucket_min,
           ROUND(MAX(l_extendedprice), 2) AS bucket_max
    FROM lineitem CROSS JOIN b
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def d10_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets of extendedprice per return
    flag) — the OLAP profiling aggregate behind every column-stats
    panel. Bucketing is spelled as portable FLOOR arithmetic with the
    top edge clamped into the last bucket (LEAST(…, 19)), identical
    IEEE ops in both engines — deliberately NOT an engine-specific
    width_bucket() call. Two passes: a 1-row min/max (broadcast), then
    one map-side-combined group-by; at 100 TB the range pass can come
    from footer stats (see a14) making the histogram single-pass.
    """
    li = T(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / 20.0)
        ),
        F.lit(19),
    ).cast("bigint")
    return (
        li.crossJoin(F.broadcast(b))
        .groupBy("l_returnflag", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("bucket_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bucket_max"),
        )
        .orderBy("l_returnflag", "bucket")
    )


@query(
    "h12_higher_order_funcs",
    oracle="""
    SELECT vec_id,
           LEN(list_filter(embedding, x -> x > 0)) AS n_pos,
           ROUND(list_reduce(
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (acc, x) -> acc + x), 6) AS norm_sq,
           ROUND(list_reduce(
             list_transform(
               list_zip(embedding, list_reverse(embedding)),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
             (acc, x) -> acc + x), 6) AS dot_rev
    FROM embeddings
    """,
)
def h12_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface (SURVEY H6 ext.): filter /
    transform / aggregate(fold) / zip_with as first-class lambda
    expressions — the declarative alternative to exploding an array
    through a shuffle. Demonstrated on the embedding column: positive
    count, squared norm (fold of squares), and dot(v, reverse(v)).

    These run entirely inside the JVM expression interpreter — map-
    only, no Python, no explode, no shuffle; at 100 TB this is a
    parquet-speed scan. Float parity: both engines fold LEFT-TO-RIGHT
    over the same element order, so the double accumulation is
    bit-identical (unlike a SUM over rows, which reduces in engine-
    specific order and needs the decimal contract).
    """
    e = T(spark, sf_dir, "embeddings")
    sq = F.transform(
        "embedding", lambda x: x.cast("double") * x.cast("double")
    )
    prod = F.zip_with(
        "embedding",
        F.reverse("embedding"),
        lambda a, b: a.cast("double") * b.cast("double"),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select(
        "vec_id",
        # .cast("bigint"): the file-wide size()/LEN() pairing
        # convention (DuckDB LEN is BIGINT) — h12 was the one query
        # relying on comparator width-normalization instead
        F.size(F.filter("embedding", lambda x: x > 0))
        .cast("bigint")
        .alias("n_pos"),
        F.round(fold(sq), 6).alias("norm_sq"),
        F.round(fold(prod), 6).alias("dot_rev"),
    )


@query(
    "d11_mode_median",
    oracle="""
    WITH vc AS (
      SELECT l_returnflag, l_linestatus, l_quantity, COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2, 3
    ),
    md AS (
      SELECT l_returnflag, l_linestatus, l_quantity AS mode_qty,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                                ORDER BY c DESC, l_quantity) AS rn
      FROM vc
    )
    SELECT g.l_returnflag, g.l_linestatus, g.median_qty, m.mode_qty
    FROM (
      SELECT l_returnflag, l_linestatus,
             MEDIAN(l_quantity) AS median_qty
      FROM lineitem GROUP BY 1, 2
    ) g
    JOIN md m ON g.l_returnflag = m.l_returnflag
            AND g.l_linestatus = m.l_linestatus AND m.rn = 1
    """,
)
def d11_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIAN and MODE per group (SURVEY D7 ext.). Median uses
    the engines' exact interpolating aggregate (both define it as
    quantile_cont(0.5), and the even-count midpoint is a single IEEE
    mean of identical operands). Mode is NOT the built-in: both
    engines' mode() leaves tie-breaking unspecified, so portability
    requires the explicit form — value-count aggregate + row_number
    ordered (count DESC, value ASC). Two shuffles: the value-count
    pre-aggregate (combiner-friendly: |distinct values| ≪ rows) and
    the per-group window over the tiny distinct-value table; the
    median aggregate rides the same group keys.
    """
    li = T(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    vc = li.groupBy(*keys, "l_quantity").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(*keys).orderBy(F.desc("c"), "l_quantity")
    mode = (
        vc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*keys, F.col("l_quantity").alias("mode_qty"))
    )
    med = li.groupBy(*keys).agg(F.median("l_quantity").alias("median_qty"))
    return med.join(mode, keys)


@query(
    "d12_corr_covar",
    oracle="""
    WITH mom AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / (n * CAST(n - 1 AS DOUBLE)), 4)
               AS covar_samp,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
               AS corr
    FROM mom
    """,
)
def d12_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance + Pearson correlation per group (SURVEY D7
    ext.), quantity vs extended price. The built-in corr()/covar_samp()
    aggregates reduce doubles in engine-specific order (different
    last-ulp results per engine AND per partitioning) — so the moments
    are accumulated EXACTLY instead: money-grade inputs are 2-dp
    decimals, their pairwise products are 4-dp decimals, and decimal
    sums are order-free. The closing algebra (n·Sxy − Sx·Sy etc.) is
    then a fixed chain of IEEE ops on identical operands in both
    engines — reproducible second-moment statistics, the same
    contract common.dsum gives first moments.

    One combiner-friendly aggregate; the five moment sums ride the
    same partial-agg pass a plain SUM would — no extra shuffle.
    """
    li = T(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    p = dec("l_extendedprice")
    mom = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return mom.select(
        "l_returnflag",
        "n",
        F.round(num / (n * (n - 1).cast("double")), 4).alias("covar_samp"),
        F.round(
            num
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("corr"),
    )


@query(
    "h13_variant",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS cnt,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
           MAX(json_extract_string(props, '$.k')) AS k_str_max,
           COUNT(json_extract_string(props, '$.nope')) AS n_missing
    FROM events GROUP BY 1
    """,
)
def h13_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (SURVEY H8 ext., Spark 4):
    ``parse_json`` decodes the JSON string ONCE into the binary
    VARIANT encoding, and every ``variant_get`` path extraction after
    that is a typed lookup into that encoding — the modern engine
    answer (Spark 4 / Snowflake / Delta variant shredding) to
    repeatedly re-parsing JSON text per accessed field, which is what
    ``get_json_object`` does (h8 keeps that classic path covered).

    Covered semantics: typed extraction (bigint and string views of
    the same field), missing-path → NULL (``n_missing`` pins it to 0
    without erroring), and aggregation over extracted values. The
    DuckDB oracle runs the identical lookups through its JSON type.

    Scale: map-only scan — parse + extraction are JVM expressions
    inside codegen, one shuffle for the final aggregate. At 100 TB the
    parse cost is paid once per row regardless of how many fields are
    read, vs once per field for the text-path functions.
    """
    e = T(spark, sf_dir, "events")
    v = F.parse_json("props")
    ek = F.variant_get(v, "$.k", "bigint")
    return (
        e.select(
            (ek % 10).alias("k_bucket"),
            ek.alias("k"),
            F.variant_get(v, "$.k", "string").alias("k_str"),
            F.variant_get(v, "$.nope", "bigint").alias("missing"),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.max("k_str").alias("k_str_max"),
            F.count("missing").alias("n_missing"),
        )
    )


@query(
    "h14_url_funcs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang
               || '?id=' || CAST(doc_id AS VARCHAR) || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param
    FROM u
    """,
)
def h14_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (SURVEY H2 ext.) — the provenance-analysis
    primitive every web-corpus pipeline needs (domain mixing, source
    filtering, URL dedup all start with host/path/query extraction).
    Spark side uses the BUILT-IN `parse_url` (JVM, codegen); DuckDB
    has no URL parser, so the oracle states the same extraction as
    anchored regexes — agreement on the constructed URLs proves the
    two formulations coincide where both are defined. Map-only.
    """
    d = T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "g_union_by_name",
    oracle="""
    SELECT n_nationkey AS key, n_name AS name,
           CAST(n_regionkey AS BIGINT) AS region, 'nation' AS src
    FROM nation
    UNION ALL
    SELECT r_regionkey AS key, r_name AS name,
           CAST(NULL AS BIGINT) AS region, 'region' AS src
    FROM region
    """,
)
def g_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union (SURVEY G ext.): `unionByName(allow
    MissingColumns=True)` aligns by COLUMN NAME and null-fills what a
    side lacks — the union you need when appending batches across a
    schema evolution (positional UNION would silently misalign or
    fail). The oracle states the same alignment explicitly with NULL
    fills. Map-only concatenation, no shuffle.
    """
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("bigint").alias("region"),
        F.lit("nation").alias("src"),
    )
    r = T(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"),
        F.col("r_name").alias("name"),
        F.lit("region").alias("src"),
    )
    return n.unionByName(r, allowMissingColumns=True)


@query(
    "h15_bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, o_custkey) AS key_mix,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           CAST(bit_count(o_orderkey) AS INTEGER) AS popcount,
           ~o_orderkey AS inverted
    FROM orders
    """,
)
def h15_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-function surface (SURVEY H4 ext.): and/or/xor, shifts,
    popcount, complement — the primitives behind the engine's own
    bitmask kernels (SimHash bands, ngram/containment masks, bitmap
    distinct, bloom probes), exposed as first-class query functions.
    Integer-exact, so parity is unconditional. Map-only.
    """
    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_mix"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("inverted"),
    )


@query(
    "f5_keyset_pagination",
    oracle="""
    WITH cursor_row AS (
      SELECT o_orderdate AS c_date, o_orderkey AS c_key
      FROM orders ORDER BY o_orderdate, o_orderkey
      LIMIT 1 OFFSET 99
    )
    SELECT o_orderkey, o_custkey,
           CAST(o_orderdate AS DATE) AS order_date, o_totalprice
    FROM orders, cursor_row
    WHERE (o_orderdate, o_orderkey) > (c_date, c_key)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20
    """,
)
def f5_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination (SURVEY F ext.): the page AFTER a
    cursor row, fetched with a WHERE (sort_key, tiebreak) > (cursor)
    predicate instead of OFFSET. The scale story is the point: OFFSET
    n scans and discards n rows on every page (O(n²) to walk a
    result set), while the keyset predicate PUSHES DOWN to the scan
    (row groups whose max date precedes the cursor are skipped) and
    each page is an independent top-k — TakeOrderedAndProject, no
    global sort, no discarded prefix. Cursor here is the 100th row's
    keys, derived identically in both engines; the unique tiebreak
    column is what makes pages gap- and overlap-free.
    """
    o = T(spark, sf_dir, "orders")
    cur = (
        o.orderBy("o_orderdate", "o_orderkey")
        .select("o_orderdate", "o_orderkey")
        .limit(100)
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .collect()[0]
    )
    after = (F.col("o_orderdate") > F.lit(cur[0])) | (
        (F.col("o_orderdate") == F.lit(cur[0]))
        & (F.col("o_orderkey") > F.lit(cur[1]))
    )
    return (
        o.filter(after)
        .orderBy("o_orderdate", "o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
        .limit(20)
    )


D16_BINS = 256


@query(
    "d16_histogram_quantiles",
    oracle=f"""
    WITH rng AS (
      SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      FROM lineitem
    ),
    b AS (
      SELECT l_returnflag AS f,
             LEAST(GREATEST(CAST(FLOOR((l_extendedprice - mn)
                 / ((mx - mn) / {D16_BINS})) AS INTEGER), 0),
                 {D16_BINS - 1}) AS bin
      FROM lineitem CROSS JOIN rng
    ),
    c AS (SELECT f, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
    cum AS (
      SELECT f, bin, n,
             SUM(n) OVER (PARTITION BY f ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY f) AS total
      FROM c
    ),
    pick AS (
      SELECT q.q, cum.*,
             ROW_NUMBER() OVER (
               PARTITION BY f, q.q ORDER BY bin) AS rn
      -- DOUBLE-typed targets (r7 review): bare VALUES (0.95) types
      -- DECIMAL(3,2) in DuckDB, making 'cum >= q*total' EXACT while
      -- Spark computes 0.95*total in IEEE doubles — at an exact
      -- boundary (cum == q*total) the engines would pick different
      -- bins. Cast so both run the identical double multiply.
      FROM cum CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)),
                                  (CAST(0.95 AS DOUBLE))) AS q(q)
      WHERE cum >= q.q * total
    ),
    est AS (
      SELECT f, q,
             ROUND(mn + (bin + (q * total - (cum - n)) / n)
                   * ((mx - mn) / {D16_BINS}), 4) AS e
      FROM pick CROSS JOIN rng WHERE rn = 1
    )
    SELECT f AS l_returnflag,
           MAX(CASE WHEN q = 0.5 THEN e END) AS p50_est,
           MAX(CASE WHEN q = 0.95 THEN e END) AS p95_est,
           TRUE AS p50_within_bin,
           TRUE AS p95_within_bin
    FROM est GROUP BY f
    """,
)
def d16_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE equi-width histogram (the
    t-digest/KLL role played by the simplest mergeable state: per-bin
    counts, which merge by addition — so per-partition, per-shard, or
    per-day histograms roll up without re-scanning, the same
    composable contract as d13's bitmaps and d15's count-min). The
    estimate interpolates inside the quantile's bin, so its error is
    bounded by one bin width; that bound is checked against the EXACT
    interpolated percentile in-driver (booleans pinned TRUE), and the
    estimate itself is integer/IEEE-deterministic — the oracle
    rebuilds the identical histogram and interpolation, so the
    VALUES hash-match too (stronger than the usual approx-tier
    bound-only check).

    100 TB design: one 2-value range broadcast, one combiner-heavy
    (group, bin) count (≤ groups × {D16_BINS} rows into the
    exchange), window over bins (bin-bounded). The raw column is
    scanned once, never sorted — exact percentiles need a per-group
    sort at every rollup level instead.
    """
    li = T(spark, sf_dir, "lineitem")
    rng = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    width = (F.col("mx") - F.col("mn")) / D16_BINS
    bin_ = F.least(
        F.greatest(
            F.floor((F.col("l_extendedprice") - F.col("mn")) / width).cast(
                "int"
            ),
            F.lit(0),
        ),
        F.lit(D16_BINS - 1),
    )
    b = li.crossJoin(F.broadcast(rng)).select(
        F.col("l_returnflag").alias("f"), bin_.alias("bin")
    )
    c = b.groupBy("f", "bin").agg(F.count(F.lit(1)).alias("n"))
    wcum = Window.partitionBy("f").orderBy("bin")
    cum = c.select(
        "f",
        "bin",
        "n",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(Window.partitionBy("f")).alias("total"),
    )
    qs = spark.createDataFrame([(0.5,), (0.95,)], "q double")
    picked = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("f", "q").orderBy("bin")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    est = picked.crossJoin(F.broadcast(rng)).select(
        "f",
        "q",
        F.round(
            F.col("mn")
            + (
                F.col("bin")
                + (F.col("q") * F.col("total") - (F.col("cum") - F.col("n")))
                / F.col("n")
            )
            * width,
            4,
        ).alias("e"),
        width.alias("w"),
    )
    exact = li.groupBy(F.col("l_returnflag").alias("f")).agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("x50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("x95"),
    )
    wide = est.groupBy("f").agg(
        F.max(F.when(F.col("q") == 0.5, F.col("e"))).alias("p50_est"),
        F.max(F.when(F.col("q") == 0.95, F.col("e"))).alias("p95_est"),
        F.any_value("w").alias("w"),
    )
    return (
        wide.join(exact, "f")
        .select(
            F.col("f").alias("l_returnflag"),
            "p50_est",
            "p95_est",
            (F.abs(F.col("p50_est") - F.col("x50")) <= F.col("w")).alias(
                "p50_within_bin"
            ),
            (F.abs(F.col("p95_est") - F.col("x95")) <= F.col("w")).alias(
                "p95_within_bin"
            ),
        )
    )


@query(
    "h16_xml_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(10,2))) AS DOUBLE)
             AS total_value
    FROM events GROUP BY event_type
    """,
)
def h16_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip (H-ext; Spark 4 native `from_xml` — the last of
    the semi-structured format rungs next to JSON/h8, VARIANT/h13 and
    CSV landing): each event is serialized to an XML fragment, then
    REALLY parsed back with `from_xml` into a typed struct, and the
    parsed fields aggregate. The oracle computes the same aggregate
    directly from the raw columns, so hash-equality proves the
    serialize→parse round-trip is lossless (values ride as
    DECIMAL(10,2) strings — engine-stable formatting).

    Map-only + one aggregate; the XML codec runs inside the JVM row
    pipeline, no Python."""
    e = T(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<event><type>"),
        F.col("event_type"),
        F.lit("</type><value>"),
        F.round(F.col("value"), 2).cast("decimal(10,2)").cast("string"),
        F.lit("</value></event>"),
    )
    parsed = e.select(
        F.from_xml(xml, "type STRING, value STRING").alias("p")
    ).select(
        F.col("p.type").alias("event_type"),
        F.col("p.value").cast("decimal(10,2)").alias("v"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("total_value"),
    )


@query(
    "d17_theta_sketch_setops",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             MAX(CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END) AS a,
             MAX(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END) AS b
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(SUM(a) AS BIGINT) AS exact_a,
           CAST(SUM(b) AS BIGINT) AS exact_b,
           COUNT(*) AS exact_union,
           CAST(SUM(a * b) AS BIGINT) AS exact_inter,
           CAST(SUM(a * (1 - b)) AS BIGINT) AS exact_diff,
           TRUE AS a_ok, TRUE AS b_ok, TRUE AS union_ok,
           TRUE AS inter_ok, TRUE AS diff_ok
    FROM m
    """,
)
def d17_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET OPERATIONS on sketches (DataSketches Theta — the sketch
    family whose point is that UNION, INTERSECTION and DIFFERENCE of
    distinct-count states are themselves sketch operations; HLL can
    only union): distinct customers active in the early epoch (A:
    ≤1997), the late epoch (B: ≥1998), and every Venn region of the
    two — estimated from two sketches built in ONE scan (conditional
    `when()` inputs), then combined sketch-side. At 100 TB this is
    audience-overlap / churn analysis without ever materializing the
    key sets: per-segment sketches are built once (mergeable,
    partial-aggregated) and ANY cross-segment overlap question is
    answered from stored sketch state.

    Oracle pattern as d3: exact Venn counts as value columns (one
    per-key flag aggregate — DuckDB recomputes), each estimate as a
    within-bound boolean pinned TRUE (|est−exact| ≤ 3%·exact + 8;
    measured ≤0.7% at sf0.1, exact below sketch capacity)."""
    o = T(spark, sf_dir, "orders")
    sk = o.select(
        F.theta_sketch_agg(
            F.when(F.year("o_orderdate") <= 1997, F.col("o_custkey"))
        ).alias("sa"),
        F.theta_sketch_agg(
            F.when(F.year("o_orderdate") >= 1998, F.col("o_custkey"))
        ).alias("sb"),
    ).select(
        F.theta_sketch_estimate("sa").alias("est_a"),
        F.theta_sketch_estimate("sb").alias("est_b"),
        F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("est_u"),
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias(
            "est_i"
        ),
        F.theta_sketch_estimate(F.theta_difference("sa", "sb")).alias(
            "est_d"
        ),
    )
    m = o.groupBy("o_custkey").agg(
        F.max(
            F.when(F.year("o_orderdate") <= 1997, 1).otherwise(0)
        ).alias("a"),
        F.max(
            F.when(F.year("o_orderdate") >= 1998, 1).otherwise(0)
        ).alias("b"),
    )
    exact = m.agg(
        F.sum("a").cast("bigint").alias("exact_a"),
        F.sum("b").cast("bigint").alias("exact_b"),
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("exact_inter"),
        F.sum(F.col("a") * (1 - F.col("b")))
        .cast("bigint")
        .alias("exact_diff"),
    )

    def ok(est, ex):
        return F.abs(F.col(est) - F.col(ex)) <= 0.03 * F.col(ex) + 8

    return (
        sk.crossJoin(F.broadcast(exact))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            "exact_diff",
            ok("est_a", "exact_a").alias("a_ok"),
            ok("est_b", "exact_b").alias("b_ok"),
            ok("est_u", "exact_union").alias("union_ok"),
            ok("est_i", "exact_inter").alias("inter_ok"),
            ok("est_d", "exact_diff").alias("diff_ok"),
        )
    )


@query(
    "d18_topn_plus_others",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name AS nation, p.p_type AS part_type,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                  AS DECIMAL(27,4)) AS revenue
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY nation ORDER BY revenue DESC, part_type) AS rk
      FROM rev
    )
    SELECT nation,
           CASE WHEN rk <= 3 THEN part_type ELSE 'OTHER' END AS bucket,
           CAST(SUM(revenue) AS DOUBLE) AS revenue,
           COUNT(*) AS n_part_types
    FROM ranked
    GROUP BY 1, 2
    """,
)
def d18_topn_plus_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N + OTHERS rollup (the BI-dashboard staple every reference
    user builds in dbt: keep each nation's 3 biggest part types by
    revenue, collapse the tail into one 'OTHER' bucket so the chart
    stays readable while totals stay exact): rank inside the
    aggregated (nation, part_type) table, then re-aggregate with the
    rank folded into a CASE bucket.

    100 TB design: ranking happens on the ALREADY-AGGREGATED rollup
    (nation × part_type — group-cardinality-sized, not fact-sized),
    so the window is cheap; the fact table pays only the first
    groupBy. Revenue stays decimal-exact through BOTH aggregation
    levels, so the OTHER bucket equals total − top-3 to the cent —
    the reconciliation property dashboards silently rely on.
    Deterministic top-3: revenue is exact decimal, ties broken by
    part_type.
    """
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    p = T(spark, sf_dir, "part")
    rev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(
            n["n_name"].alias("nation"), p["p_type"].alias("part_type")
        )
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("decimal(27,4)")
            .alias("revenue")
        )
    )
    wk = Window.partitionBy("nation").orderBy(
        F.col("revenue").desc(), F.col("part_type")
    )
    ranked = rev.withColumn("rk", F.row_number().over(wk))
    bucket = F.when(F.col("rk") <= 3, F.col("part_type")).otherwise("OTHER")
    return ranked.groupBy(
        "nation", bucket.alias("bucket")
    ).agg(
        F.sum("revenue").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_part_types"),
    )


@query(
    "c10_bucketed_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           TRUE AS join_zero_shuffle,
           TRUE AS sort_merge_join
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def c10_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join, driver-certified WITH its
    physical contract (SURVEY C5-ext; previously pytest-only): both
    sides are written `bucketBy(8, key).sortBy(key)` catalog tables,
    so the sort-merge join needs ZERO shuffle exchanges — the
    shuffle was paid once at WRITE time, and every subsequent join
    on the bucket key is exchange-free. At 100 TB this is the
    difference between re-shuffling two fact tables per query and
    never shuffling them again; broadcast is force-disabled while
    deriving the plan because at real scale neither fact side
    broadcasts (that is the regime bucketing exists for).

    The certified row set carries the aggregate AND two plan facts
    extracted from the forced-SMJ join subplan — `join_zero_shuffle`
    (no Exchange anywhere in it) and `sort_merge_join` — so a
    regression that silently reintroduces a shuffle flips a hashed
    boolean, not just a pytest.

    Table hygiene (ADVICE r3): deterministic per-SF table names with
    mode("overwrite") — never uuid-tagged — and any legacy `c10_*`
    table for another tag is dropped on the way in, so repeated
    bench/verify runs leave at most 2 tables per scale factor."""
    orders_t, lineitem_t = _c10_bucketed_tables(
        spark, sf_dir, overwrite=True
    )
    return _c10_join_with_plan_facts(spark, orders_t, lineitem_t)


def _c10_sf_tag(sf_dir: str) -> str:
    import os
    import re

    return re.sub(
        r"[^0-9A-Za-z]", "_", os.path.basename(sf_dir.rstrip("/"))
    ) or "default"


# (sf_dir tag) pairs already written by THIS process — bounds writes
# to one per table per process while keeping every process's
# certification a real shuffle-at-write.
_C10_WRITTEN: set = set()


def _c10_bucketed_tables(
    spark: SparkSession, sf_dir: str, *, overwrite: bool
) -> tuple:
    """Create (or reuse) the two bucketed catalog tables the c10
    queries join. `overwrite=True` rewrites once per process (the
    write-side certification); `overwrite=False` reuses a prior
    COMPLETED write even across processes: the session catalog is
    in-memory (metadata gone each process) but the warehouse
    DIRECTORY persists, so a `_SUCCESS`-marked location is registered
    back as an EXTERNAL bucketed table over the existing files
    instead of paying the 2-table write again (r7 review — the old
    code rmtree'd the byte-identical data and rewrote it, so the
    read-side bench measured exactly the write it exists to avoid;
    fixture parquet is immutable, so a completed prior write is
    equivalent). No legacy-tag drop loop anymore: it could never see
    pre-r4 tables (not in a fresh catalog) and it DROPPED live tables
    for any custom SPARK_GRAFT_SF_DIR tag outside a hardcoded list."""
    import os
    import shutil

    tag = _c10_sf_tag(sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for short, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"bucketed.c10_{short}_{tag}"
        path = os.path.join(wh, "bucketed.db", name.split(".", 1)[1])
        fresh = (sf_dir, name) not in _C10_WRITTEN
        exists = spark.catalog.tableExists(name)
        if (
            not exists
            and not (overwrite and fresh)
            and os.path.exists(os.path.join(path, "_SUCCESS"))
        ):
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in T(spark, sf_dir, short).schema.fields
            )
            spark.sql(
                f"CREATE TABLE {name} ({cols}) USING PARQUET"
                f" CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS"
                f" LOCATION '{path}'"
            )
            exists = True
        if (overwrite and fresh) or not exists:
            # a clean slate either way: the catalog entry may be the
            # external registration above (saveAsTable-overwrite onto
            # an external table trips LOCATION_ALREADY_EXISTS), and a
            # crashed write leaves a dir without _SUCCESS
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(path, ignore_errors=True)
            (
                T(spark, sf_dir, short)
                .write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(name)
            )
        _C10_WRITTEN.add((sf_dir, name))
    return f"bucketed.c10_orders_{tag}", f"bucketed.c10_lineitem_{tag}"


def _c10_join_with_plan_facts(
    spark: SparkSession, orders_t: str, lineitem_t: str
) -> DataFrame:
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(lineitem_t)
            .join(
                spark.table(orders_t),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_extendedprice", "l_discount", "o_orderpriority")
        )
        plan = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        zero_shuffle = "Exchange" not in plan
        smj = "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            "revenue",
            F.lit(zero_shuffle).alias("join_zero_shuffle"),
            F.lit(smj).alias("sort_merge_join"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "c10_bucketed_join_read",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           TRUE AS join_zero_shuffle,
           TRUE AS sort_merge_join
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def c10_bucketed_join_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READ side of the bucketed-join certification (VERDICT r3 #7):
    identical join, aggregate, and hashed plan facts as
    `c10_bucketed_join`, but the bucketed tables are written at most
    once — reused across processes when they already exist in the
    warehouse (the fixture parquet is immutable, so a prior run's
    bucketed copy is byte-identical). This is the number that matters
    at 100 TB: bucketing pays the shuffle ONCE at write time, and
    every subsequent join on the bucket key runs exchange-free — the
    bench should see that steady-state read cost, not re-measure the
    write each sweep."""
    orders_t, lineitem_t = _c10_bucketed_tables(
        spark, sf_dir, overwrite=False
    )
    return _c10_join_with_plan_facts(spark, orders_t, lineitem_t)


# sf_dir -> partitioned-layout dir written by THIS process (a38)
_A38_LAYOUTS: dict = {}


@query(
    "a38_dynamic_partition_pruning",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           TRUE AS dpp_active,
           TRUE AS broadcast_join
    FROM orders
    WHERE year(o_orderdate) >= 1997
    GROUP BY 1
    ORDER BY 1
    """,
)
def a38_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, driver-certified with its plan
    facts (VERDICT r3 #8 — previously pytest-only static pruning):
    the fact table is a Hive-layout parquet write partitioned by
    order year; the dim table carries a `recent` attribute known only
    at runtime. Joining fact to the filtered dim on the partition
    column must make Catalyst inject a `dynamicpruning` subquery into
    the fact scan's PartitionFilters — the fact directories for
    non-matching years are never opened, even though no literal year
    predicate exists in the query.

    At 100 TB this is THE mechanism that turns "join sales to the
    dim and filter on a dim attribute" from a full-lake scan into a
    few partitions: the broadcast of the filtered dim is reused as
    the pruning filter (reuseBroadcastOnly, Spark's default), so
    pruning costs nothing beyond the join's own broadcast. The two
    booleans — `dpp_active` (dynamicpruning expression present in
    the scan) and `broadcast_join` — ride the driver hash, so a
    regression that silently reverts to a full scan flips a hashed
    value, not just a pytest.

    Gotcha pinned here deliberately: the dim predicate must be one
    Catalyst's `isLikelySelective` recognizes (a comparison / IN /
    LIKE). A bare boolean attribute filter (`WHERE recent`) is NOT
    considered selective and silently disables DPP — measured on
    this exact query; hence the dim carries a string `era` attribute
    filtered with an equality.

    Reference parity: partition-pruned scans over partitioned
    Iceberg tables are the reference stack's bread and butter
    (/root/reference/scripts/extract_load.py:95-110 writes
    format-version=2 tables whose engines prune by partition)."""
    import os
    import tempfile

    # Memoized per (process, sf_dir) like the c10 bucketed tables:
    # the partitioned layout is written once, and repeat invocations
    # (bench sweeps) measure the pruned READ the query certifies.
    base = _A38_LAYOUTS.get(sf_dir)
    if base is None:
        base = tempfile.mkdtemp(prefix="lakehouse-scratch-a38-dpp-")
        orders = T(spark, sf_dir, "orders")
        (
            orders.withColumn("o_year", F.year("o_orderdate"))
            .write.partitionBy("o_year")
            .parquet(os.path.join(base, "fact"))
        )
        (
            orders.select(F.year("o_orderdate").alias("o_year"))
            .distinct()
            .withColumn(
                "era",
                F.when(F.col("o_year") >= 1997, "recent").otherwise("old"),
            )
            .write.parquet(os.path.join(base, "dim"))
        )
        _A38_LAYOUTS[sf_dir] = base
    fact = spark.read.parquet(os.path.join(base, "fact"))
    dim = spark.read.parquet(os.path.join(base, "dim")).filter(
        F.col("era") == "recent"
    )
    j = fact.join(F.broadcast(dim), "o_year")
    agg = (
        j.groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    dpp = "dynamicpruning" in plan.lower()
    bhj = "BroadcastHashJoin" in plan
    return agg.select(
        "o_year",
        "n_orders",
        "total_price",
        F.lit(dpp).alias("dpp_active"),
        F.lit(bhj).alias("broadcast_join"),
    ).orderBy("o_year")


@query(
    "a39_runtime_bloom_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice')} AS total_price,
           TRUE AS bloom_built,
           TRUE AS bloom_pushed
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def a39_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning, driver-certified with its
    plan facts (VERDICT r3 #8 — previously pytest-only): on a
    selective shuffle join, Catalyst builds a bloom filter from the
    FILTERED build side (`bloom_filter_agg`) and injects a
    `might_contain` probe into the other side's scan, so probe rows
    that cannot match die before the exchange. At 100 TB this is the
    shuffle-join analogue of dynamic partition pruning: the probe
    side ships O(matching) rows instead of O(table).

    The fixture sits under Spark's 10 GiB application-side threshold,
    so the thresholds are tuned down while the plan is derived
    (broadcast also disabled — at real scale neither fact side
    broadcasts, which is the regime the bloom path exists for), then
    restored. The two booleans — `bloom_built` (bloom_filter_agg on
    the build side) and `bloom_pushed` (might_contain on the probe
    side) — ride the driver hash."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10000000",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = T(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = T(spark, sf_dir, "lineitem")
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        agg = j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("total_price"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        bloom_built = "bloom_filter_agg" in plan
        bloom_pushed = "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
    return agg.select(
        "o_orderpriority",
        "n_items",
        "total_price",
        F.lit(bloom_built).alias("bloom_built"),
        F.lit(bloom_pushed).alias("bloom_pushed"),
    ).orderBy("o_orderpriority")


@query(
    "a40_agg_pushdown",
    oracle="""
    SELECT CAST(MIN(o_orderkey) AS BIGINT) AS lo,
           CAST(MAX(o_orderkey) AS BIGINT) AS hi,
           COUNT(*) AS n,
           TRUE AS agg_pushed
    FROM orders
    """,
)
def a40_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet footer-statistics aggregate pushdown, driver-certified
    with its plan fact (the third plan-certification query of the r4
    flywheel, after a38 DPP and a39 bloom joins): an unfiltered
    MIN/MAX/COUNT is answered entirely from parquet footer metadata —
    the DSv2 scan shows `PushedAggregation` and no data page is ever
    decompressed. At 100 TB this turns "how many rows, what key
    range" from a cluster job into a planning-time metadata read —
    the same trick the snapshot layer's manifest stats pull at commit
    time, here certified on the raw-parquet path.

    The DSv2 path and the pushdown flag are session confs, toggled
    only while this plan is derived, then restored (the engine
    default keeps the battle-tested V1 path for general scans). The
    `agg_pushed` boolean rides the driver hash with the values, so
    the certification IS the driver row."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.parquet.aggregatePushdown",
            "spark.sql.sources.useV1SourceList",
        )
    }
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        # fresh=True: the DSv2/pushdown confs above resolve at
        # spark.read time, so this scan must be planned INSIDE the
        # conf window, never served from the table-handle memo.
        agg = T(spark, sf_dir, "orders", fresh=True).agg(
            F.min("o_orderkey").cast("bigint").alias("lo"),
            F.max("o_orderkey").cast("bigint").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        pushed = "PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]" in plan
        # Materialize the certified values INSIDE the conf window so
        # the collected row really came from the pushed-down plan.
        row = agg.first()
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [(row.lo, row.hi, row.n, pushed)],
        "lo bigint, hi bigint, n bigint, agg_pushed boolean",
    )


@query(
    "a42_aqe_skew_join",
    oracle=f"""
    WITH lft AS (
      SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
                  ELSE l_orderkey % 997 END AS k,
             l_extendedprice AS v
      FROM lineitem
    ),
    rgt AS (SELECT g AS k, g % 7 AS w FROM generate_series(0, 996) t(g))
    SELECT w,
           COUNT(*) AS n_rows,
           {sql_dsum('v')} AS total_v,
           TRUE AS skew_split,
           TRUE AS sort_merge_join
    FROM lft JOIN rgt USING (k)
    GROUP BY w ORDER BY w
    """,
)
def a42_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE runtime skew-join splitting, driver-certified with its
    plan facts (completing the skew story next to `c8_salted_skew_join`,
    the manual pre-AQE weapon): ~90% of the fact rows share ONE join
    key, so one reduce partition holds ~200x the median bytes. AQE
    must detect this from the materialized shuffle's map statistics
    and rewrite the sort-merge join to `SortMergeJoin(skew=true)` —
    the hot partition is split into map-block-aligned chunks, each
    joined against a DUPLICATED copy of the matching build partition,
    so the straggler task becomes N parallel tasks with no semantic
    change. The aggregate is collected while the tuned thresholds are
    active, so the certified values really came from the
    skew-rewritten plan; `skew_split` rides the driver hash.

    Two measured Spark behaviors pinned here (cost a debugging
    session each): (1) skew detection reads COMPRESSED shuffle sizes
    — a shuffle of mostly-constant columns lz4-compresses below any
    realistic threshold and never looks skewed, so the fact carries a
    real value column into the shuffle; (2) the split granularity is
    MAP BLOCKS — a single-mapper shuffle (this fixture's one-row-group
    parquet) is unsplittable no matter how skewed, hence the
    upstream repartition(8), which models the thousands of map tasks
    any real 100 TB fact scan has. At scale this rewrite is what
    turns the classic one-straggler-task join into even parallelism
    without hand-salting."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4096",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        li = T(spark, sf_dir, "lineitem").repartition(8)
        left = li.select(
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
            .otherwise(F.col("l_orderkey") % 997)
            .alias("k"),
            F.col("l_extendedprice").alias("v"),
        )
        right = spark.range(997).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("w")
        )
        agg = (
            left.join(right, "k")
            .groupBy("w")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                dsum("v").alias("total_v"),
            )
            .orderBy("w")
        )
        rows = agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        skewed = "SortMergeJoin(skew=true)" in plan
        smj = "SortMergeJoin" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [(r.w, r.n_rows, r.total_v, skewed, smj) for r in rows],
        "w bigint, n_rows bigint, total_v double, "
        "skew_split boolean, sort_merge_join boolean",
    )


@query(
    "a43_aqe_join_conversion",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           TRUE AS final_broadcast_join,
           TRUE AS initial_sort_merge_join,
           TRUE AS local_shuffle_read
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def a43_aqe_join_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE runtime join-strategy switch, driver-certified with its
    plan facts (the canonical AQE feature, completing the §4 set
    next to a38 DPP / a39 bloom / a42 skew): the optimizer's STATIC
    estimate of the filtered build side is too big to broadcast
    (static threshold forced down), so the initial plan is a
    sort-merge join — but once the build side's shuffle materializes,
    its ACTUAL bytes sit under the adaptive threshold and AQE
    replans the remaining stages into a BroadcastHashJoin with LOCAL
    shuffle reads (probe mappers' output consumed in place, no
    exchange network hop at all).

    At 100 TB this is the difference between planning for the
    estimate and paying for reality: selective dim filters routinely
    beat their estimates by orders of magnitude, and AQE harvests
    the win with zero query changes. Three plan facts ride the
    driver hash: `final_broadcast_join`, `initial_sort_merge_join`
    (proving the switch actually happened rather than the static
    planner broadcasting from the start), and `local_shuffle_read`."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "33554432"
        )
        li = T(spark, sf_dir, "lineitem")
        o = T(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        agg = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"))
            .orderBy("o_orderpriority")
        )
        rows = agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        initial = (
            plan.split("== Initial Plan ==")[1]
            if "== Initial Plan ==" in plan
            else ""
        )
        bhj = "BroadcastHashJoin" in final
        smj0 = "SortMergeJoin" in initial
        local = "AQEShuffleRead local" in final
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [(r.o_orderpriority, r.n_items, bhj, smj0, local) for r in rows],
        "o_orderpriority string, n_items bigint, "
        "final_broadcast_join boolean, initial_sort_merge_join boolean, "
        "local_shuffle_read boolean",
    )


@query(
    "a44_aqe_coalesce",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           TRUE AS coalesced_read
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def a44_aqe_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE shuffle-partition coalescing, driver-certified with its
    plan fact (continuing the r4 plan-certification flywheel: a38
    DPP, a39 bloom, a40 agg pushdown, a42 skew split, a43 join
    conversion): the session plans the aggregation shuffle at
    ``spark.sql.shuffle.partitions`` (32 here, thousands on a real
    cluster), but once the map side materializes, AQE reads the
    ACTUAL partition byte sizes and fuses adjacent tiny reduce
    partitions into a few advisory-sized reads — the executed plan
    carries ``AQEShuffleRead coalesced`` above the exchange.

    At 100 TB the same mechanism works in reverse importance: you
    size ``shuffle.partitions`` for the biggest stage of the job and
    let AQE shrink every smaller stage, instead of hand-tuning a
    per-stage constant. Without it, a 10k-partition default turns
    every small aggregate into 10k near-empty reduce tasks whose
    scheduling overhead dwarfs the work. The ``coalesced_read``
    boolean rides the driver hash, so a conf regression that pins
    the static partition count flips a hashed value.

    Reference parity: the reference's engines size reducers
    adaptively the same way (Trino's task.concurrency, Spark AQE) —
    /root/reference/scripts/extract_load.py:32 leaves partition
    tuning entirely to the engine."""
    # Host-independent thresholds, set/restored like a42/a43's tuned
    # confs (ADVICE r4): the session default shuffle.partitions is
    # the local core count, and on a low-core host AQE with
    # parallelismFirst may decline to coalesce — flipping a hashed
    # boolean on a correct engine. Pin a deliberately-too-high static
    # plan (64 partitions), a small advisory size, and size-first
    # coalescing so the fact certifies the MECHANISM on any host.
    confs = {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = (
            T(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice").alias("total_price"),
            )
            .orderBy("o_orderpriority")
        )
        rows = agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        coalesced = "AQEShuffleRead coalesced" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [(r.o_orderpriority, r.n_orders, r.total_price, coalesced) for r in rows],
        "o_orderpriority string, n_orders bigint, total_price double, "
        "coalesced_read boolean",
    )


@query(
    "a45_reused_exchange",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(rev_dec AS DOUBLE) AS revenue,
           ROUND(CAST(rev_dec AS DOUBLE)
                 / CAST((SELECT SUM(rev_dec) FROM per) AS DOUBLE),
                 6) AS share,
           TRUE AS exchange_reused
    FROM per
    ORDER BY o_orderpriority
    """,
)
def a45_reused_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-exchange reuse, driver-certified with its plan fact:
    the per-priority revenue aggregate feeds the result twice — once
    as the output rows, once reduced again to the global total that
    every row's ``share`` divides by. Catalyst must recognize the two
    identical aggregation subtrees and materialize the groupBy
    exchange ONCE, wiring the second consumer to a ``ReusedExchange``
    node instead of re-scanning + re-shuffling the fact table.

    This is the "aggregate, then compare to the total of the same
    aggregate" BI staple; at 100 TB exchange reuse halves the scan
    and shuffle cost of every such query, and losing it (e.g. by
    perturbing one subtree so the trees no longer match structurally)
    silently doubles cost with identical results — exactly the class
    of regression only a plan fact catches. ``exchange_reused`` rides
    the driver hash.

    Float parity: both revenue totals stay decimal-exact through both
    aggregation levels; the share is a single IEEE double division of
    bit-identical operands in both engines, rounded to 6 dp."""
    per = (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    total = per.agg(F.sum("rev_dec").alias("tot"))
    j = per.crossJoin(total).select(
        "o_orderpriority",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double") / F.col("tot").cast("double"), 6
        ).alias("share"),
    ).orderBy("o_orderpriority")
    rows = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    reused = "ReusedExchange" in plan
    return spark.createDataFrame(
        [(r.o_orderpriority, r.revenue, r.share, reused) for r in rows],
        "o_orderpriority string, revenue double, share double, "
        "exchange_reused boolean",
    )


@query(
    "a46_scan_pruning",
    oracle=f"""
    SELECT COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice')} AS revenue,
           TRUE AS filters_pushed,
           TRUE AS schema_pruned,
           2 AS read_cols
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def a46_scan_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown + column pruning, driver-certified with
    plan facts (previously pytest-only in test_plans.py — promoted to
    the driver hash per the flywheel pattern): the shipdate predicate
    must reach the parquet scan as a ``PushedFilters`` row-group
    filter, and the 16-column lineitem scan must narrow its
    ``ReadSchema`` to exactly the two referenced columns
    (l_extendedprice, l_shipdate).

    These two properties are THE difference between "read 100 TB"
    and "read the 2-column byte range of the matching row groups" —
    the first thing to check on any slow scan, and the first thing a
    refactor through a non-pushable expression silently breaks. Both
    booleans plus the read column COUNT ride the driver hash, so a
    widening regression flips a hashed value rather than a local
    test."""
    q = (
        T(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate")
            >= F.lit("1998-01-01 00:00:00").cast("timestamp")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("revenue"),
        )
    )
    rows = q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = "GreaterThanOrEqual(l_shipdate" in plan
    read_cols = 0
    for ln in plan.splitlines():
        if "ReadSchema:" in ln:
            schema = ln.split("ReadSchema:", 1)[1].strip()
            read_cols = schema.count(":")
            break
    pruned = read_cols == 2
    return spark.createDataFrame(
        [(rows[0].n_items, rows[0].revenue, pushed, pruned, read_cols)],
        "n_items bigint, revenue double, filters_pushed boolean, "
        "schema_pruned boolean, read_cols int",
    )


@query(
    "a48_codegen_partial_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity')} AS total_qty,
           TRUE AS whole_stage_codegen,
           TRUE AS map_side_partial_agg
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a48_codegen_partial_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-stage codegen + map-side partial aggregation, driver-
    certified with plan facts (the two JVM-side execution properties
    the scale brief leans on hardest — every hot expression fused
    into generated bytecode, and every aggregation shuffling partial
    states instead of raw rows): the executed plan must show
    `WholeStageCodegen` spans around the scan→filter→aggregate
    pipeline and a `partial_` aggregate mode BELOW the exchange
    (`partial_count`/`partial_sum` in the map stage, `finalmerge` /
    final above it).

    Why these ride the driver hash: both properties silently die —
    an expression that falls off the codegen whitelist (a UDF, a
    too-deep tree) or an aggregate rewritten without partials
    doesn't change a single output row, it just makes the same
    query shuffle ~rows-instead-of-groups and interpret-instead-of-
    compile, the difference between hours and minutes at 100 TB.
    A pytest catches it locally; the hashed fact catches it in every
    driver round from now on."""
    agg = (
        T(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )
    import re

    rows = agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # In the AQE plan string a codegen span renders as a `*(n)` stage
    # prefix on each fused operator (the WholeStageCodegen node name
    # only appears in non-adaptive plans); require the marker on the
    # aggregates themselves, in the FINAL plan section.
    final = plan.split("== Initial Plan ==")[0]
    codegen = re.search(r"\*\(\d+\) HashAggregate", final) is not None
    partial = "partial_count" in final or "partial_sum" in final
    return spark.createDataFrame(
        [(r.l_returnflag, r.n_items, r.total_qty, codegen, partial) for r in rows],
        "l_returnflag string, n_items bigint, total_qty double, "
        "whole_stage_codegen boolean, map_side_partial_agg boolean",
    )


# (sf tag, table) pairs built+ANALYZEd by THIS process (the session
# catalog is in-memory, so stats are per-process state like c10's
# table metadata).
_A53_BUILT: set = set()


def _a53_stats_tables(spark: SparkSession, sf_dir: str) -> tuple:
    """Three catalog tables with ANALYZE'd column statistics — the
    input CBO needs (reorder costs come from rowCount/NDV/min-max,
    which path-based parquet scans don't carry)."""
    import os
    import shutil

    tag = _c10_sf_tag(sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo")
    spec = {
        f"cbo.a53_li_{tag}": (
            "lineitem",
            ["l_orderkey", "l_quantity", "l_extendedprice"],
        ),
        f"cbo.a53_od_{tag}": (
            "orders",
            ["o_orderkey", "o_custkey", "o_orderpriority"],
        ),
        f"cbo.a53_cu_{tag}": ("customer", ["c_custkey", "c_mktsegment"]),
    }
    for name, (src, cols) in spec.items():
        if (sf_dir, name) in _A53_BUILT:
            continue
        if not spark.catalog.tableExists(name):
            # warehouse dir persists across processes; catalog
            # metadata does not (same note as _c10_bucketed_tables)
            wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
                "file:"
            )
            shutil.rmtree(
                os.path.join(wh, "cbo.db", name.split(".", 1)[1]),
                ignore_errors=True,
            )
            T(spark, sf_dir, src).select(*cols).write.mode(
                "overwrite"
            ).saveAsTable(name)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
        _A53_BUILT.add((sf_dir, name))
    return tuple(spec)


@query(
    "a53_cbo_join_reorder",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           TRUE AS cbo_stats_available,
           TRUE AS join_reordered,
           TRUE AS baseline_not_reordered
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def a53_cbo_join_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based join reordering, driver-certified with its plan
    facts (the §4 optimizer surface the a38-a48 flywheel had not yet
    pinned: everything so far certified RUNTIME adaptivity — DPP,
    bloom, AQE — this certifies the STATIC cost model): the query is
    WRITTEN fact-first (lineitem ⋈ orders ⋈ filtered customer), the
    shape a naive left-deep planner executes as fact⋈orders first —
    the most expensive possible order. With table/column statistics
    ANALYZEd into the catalog and `spark.sql.cbo.joinReorder` on,
    Catalyst's DP-based reorder (Selinger-style over the join graph)
    must instead join orders to the FILTERED customer dim first and
    bring the fact in last.

    Three facts ride the driver hash: `cbo_stats_available` (the
    optimized plan's Statistics carries a defined rowCount — proof
    ANALYZE reached the cost model), `join_reordered` (in the
    CBO plan the filtered dim's relation precedes the fact's in the
    join tree), and `baseline_not_reordered` (the SAME query planned
    with CBO off keeps the written fact-first order — the
    differential that proves the reorder came from the cost model,
    the a43 initial-vs-final pattern). Broadcast is disabled while
    deriving both plans so join ORDER, not join strategy, is what
    differs.

    At 100 TB: AQE fixes sizes at runtime but cannot re-ROOT a join
    tree — a fact-first multi-way join ships the fact table through
    every stage regardless of AQE. Statistics maintenance (ANALYZE
    after ingest, the reference delegates the same to engine
    defaults) is what keeps multi-dim star queries fact-last. Stats
    are in-memory-catalog state here, so each process re-ANALYZEs
    once (bounded: 3 footer-light passes).
    """
    import re as _re

    li, od, cu = _a53_stats_tables(spark, sf_dir)
    sql = f"""
      SELECT o.o_orderpriority, COUNT(*) AS n_items
      FROM {li} l
      JOIN {od} o ON l.l_orderkey = o.o_orderkey
      JOIN {cu} c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority
    """

    def rel_order(plan: str) -> list:
        return _re.findall(r"\.(a53_[a-z]+)_", plan)

    confs = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        # baseline: CBO off, same stats, same query — written order
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        base_order = rel_order(
            spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
        )
        baseline_not_reordered = base_order.index("a53_li") < base_order.index(
            "a53_cu"
        )
        # CBO on: stats drive the reorder; rows collected under it
        for k, v in confs.items():
            spark.conf.set(k, v)
        q = spark.sql(sql)
        rows = q.collect()
        opt = q._jdf.queryExecution().optimizedPlan()
        order = rel_order(opt.toString())
        join_reordered = order.index("a53_cu") < order.index("a53_li")
        stats_avail = bool(opt.stats().rowCount().isDefined())
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [
            (
                r.o_orderpriority,
                r.n_items,
                stats_avail,
                join_reordered,
                baseline_not_reordered,
            )
            for r in rows
        ],
        "o_orderpriority string, n_items bigint, "
        "cbo_stats_available boolean, join_reordered boolean, "
        "baseline_not_reordered boolean",
    )


# (sf_dir, table) pairs written by THIS process (c10's convention).
_C12_WRITTEN: set = set()


def _c12_sortfree_tables(spark: SparkSession, sf_dir: str) -> tuple:
    """Bucketed+sorted tables with EXACTLY ONE FILE PER BUCKET: the
    pre-write `repartition(8, key)` uses the same murmur3 bucket hash
    as `bucketBy`, so each write task owns one whole bucket — the
    layout Spark's bucket-scan output ordering requires."""
    import os
    import shutil

    tag = _c10_sf_tag(sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    for short, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"bucketed.c12_{short}_{tag}"
        if (sf_dir, name) in _C12_WRITTEN:
            continue
        if not spark.catalog.tableExists(name):
            wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
                "file:"
            )
            shutil.rmtree(
                os.path.join(wh, "bucketed.db", name.split(".", 1)[1]),
                ignore_errors=True,
            )
            cols = (
                ["o_orderkey", "o_orderpriority", "o_totalprice"]
                if short == "orders"
                else ["l_orderkey", "l_extendedprice"]
            )
            (
                T(spark, sf_dir, short)
                .select(*cols)
                .repartition(8, F.col(key))
                .write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(name)
            )
        _C12_WRITTEN.add((sf_dir, name))
    return f"bucketed.c12_orders_{tag}", f"bucketed.c12_lineitem_{tag}"


@query(
    "c12_sortfree_bucketed_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice')} AS revenue,
           TRUE AS sort_merge_join,
           TRUE AS join_zero_shuffle,
           TRUE AS join_zero_sort
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def c12_sortfree_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULLY-free co-located merge join — zero exchanges AND zero
    sorts — completing the bucketing story c10 certifies half of
    (c10's SMJ is exchange-free but still re-sorts both sides:
    `sortBy` orders rows within each bucket FILE, and with several
    files per bucket Spark cannot treat a bucket as globally sorted).
    Two measured Spark behaviors are pinned here, both required
    together:

    1. ONE FILE PER BUCKET: the pre-write `repartition(8, key)` uses
       the same murmur3 bucket function as `bucketBy`, so each write
       task owns exactly one bucket and emits exactly one file —
       making per-file sort order equal per-bucket sort order.
    2. `spark.sql.legacy.bucketedTableScan.outputOrdering=true`:
       Spark 3.0+ DISABLED bucket-scan output ordering by default
       (honoring it forces one-task-per-bucket reads even when no
       downstream op needs the order — a parallelism loss for most
       scans); a sort-heavy co-located join is exactly the case the
       opt-in exists for. Measured here: conf off → 2 Sort nodes;
       conf on + 1 file/bucket → 0 Sorts, 0 Exchanges.

    At 100 TB this is the nightly-join layout: both fact tables
    bucket-sorted by the join key at write time, and the recurring
    join degenerates to a pure streaming merge of pre-sorted files —
    no shuffle, no sort, no memory pressure. `sort_merge_join`,
    `join_zero_shuffle`, and `join_zero_sort` ride the driver hash;
    broadcast is disabled while deriving the plan (the two-fact
    regime) and the confs are restored after."""
    import re as _re

    orders_t, lineitem_t = _c12_sortfree_tables(spark, sf_dir)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = (
            spark.table(lineitem_t)
            .join(
                spark.table(orders_t),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_extendedprice", "o_orderpriority")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        smj = "SortMergeJoin" in plan
        zero_shuffle = "Exchange" not in plan
        zero_sort = len(_re.findall(r"\bSort \[", plan)) == 0
        rows = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum("l_extendedprice").alias("revenue"),
            )
            .orderBy("o_orderpriority")
            .collect()
        )
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [
            (r.o_orderpriority, r.n_items, r.revenue, smj, zero_shuffle, zero_sort)
            for r in rows
        ],
        "o_orderpriority string, n_items bigint, revenue double, "
        "sort_merge_join boolean, join_zero_shuffle boolean, "
        "join_zero_sort boolean",
    )
