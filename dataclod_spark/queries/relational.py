"""Relational surface — SURVEY.md §2.B (inherited DataFusion defaults).

The reference exposes the full DataFusion relational surface through
``QueryContext::sql`` (reference ``src/core/src/context.rs:69-79``); in this
engine the same surface is Spark SQL / Catalyst.  These queries exercise it
end-to-end over the driver's TPC-H-ish tables: scans with pushdown, all join
types, two-phase aggregation, grouping sets/rollup/cube, distinct aggregates,
set operations, correlated/scalar/EXISTS/IN subqueries, top-k, pivot.

Scale notes (100 TB design):
* fact-side scans keep filters and column pruning at the parquet source
  (Catalyst pushes both; verified via ``.explain`` — PushedFilters/ReadSchema);
* dimension joins (region/nation/customer/supplier/part) are broadcast —
  dims are small even at SF100k, fact tables never sit on the build side;
* aggregations are expressed as single groupBy so Spark plans partial
  (map-side) + final aggregation, no extra shuffle;
* double sums go through exact DECIMAL accumulation (``dsum``) so results are
  order-independent — required both for the DuckDB differential gate and for
  run-to-run determinism on a real cluster;
* every query avoids driver-side collect loops — plans are fully declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclod_spark.registry import davg, dsum, load, query

# Oracle-side spellings of dsum/davg (see registry.dsum docstring).
def _osum(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def _oavg(expr: str) -> str:
    return f"{_osum(expr)} / count({expr})"


_REV = "l_extendedprice * (1 - l_discount)"

# --------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): filter + wide aggregate
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    bench=True,
    doc="TPC-H Q1: scan-heavy grouped aggregate with arithmetic expressions",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round({_osum('l_quantity')}, 2)      AS sum_qty,
       round({_osum('l_extendedprice')}, 2) AS sum_base_price,
       round({_osum(_REV)}, 2)              AS sum_disc_price,
       round({_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}, 2) AS sum_charge,
       round({_oavg('l_quantity')}, 4)      AS avg_qty,
       round({_oavg('l_extendedprice')}, 4) AS avg_price,
       round({_oavg('l_discount')}, 4)      AS avg_disc,
       count(*)                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: Q1 is one narrow scan+partial-agg over the widest fact
    # table — spreading the unsplittable local scan measured 1.36 → 1.05 s
    # steady (all other relational queries shuffle/broadcast right after
    # the scan and measured a LOSS from spreading; they stay default-off)
    l = load(spark, sf_dir, "lineitem", spread=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(dsum(F.col("l_quantity")), 2).alias("sum_qty"),
            F.round(dsum(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(dsum(disc_price), 2).alias("sum_disc_price"),
            F.round(dsum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(davg(F.col("l_quantity")), 4).alias("avg_qty"),
            F.round(davg(F.col("l_extendedprice")), 4).alias("avg_price"),
            F.round(davg(F.col("l_discount")), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — shipping-priority top-N: join fact-fact-dim, group, top-k
# --------------------------------------------------------------------------


@query(
    "q3_top_orders",
    bench=True,
    doc="TPC-H Q3: customer⋈orders⋈lineitem, grouped revenue, top-10",
    oracle=f"""
SELECT o_orderkey,
       round({_osum(_REV)}, 2)   AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp_ntz")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer acts as a filter dimension: broadcast it
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("orderdate"), "o_orderpriority")
        .agg(F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS semi-join
# --------------------------------------------------------------------------


@query(
    "q4_order_priority",
    doc="TPC-H Q4 shape: EXISTS → left-semi join + grouped count",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem")
    # EXISTS with a correlated inequality → left-semi join on key + condition
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join with broadcast dims
# --------------------------------------------------------------------------


@query(
    "q5_local_supplier",
    bench=True,
    doc="TPC-H Q5: 6-way join (2 facts + 4 broadcast dims), grouped revenue",
    oracle=f"""
SELECT n_name, round({_osum(_REV)}, 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure pushed-down filter + global agg
# --------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    doc="TPC-H Q6: all predicates pushed to the parquet scan, single-row agg",
    oracle=f"""
SELECT round({_osum('l_extendedprice * l_discount')}, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(dsum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    doc="TPC-H Q7: nation-pair revenue by year; cross-filter via broadcast dims",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, round({_osum('volume')}, 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    df = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
    )
    return (
        df.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(dsum(F.col("volume")), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — market share (CASE inside aggregate, ratio of sums)
# --------------------------------------------------------------------------


@query(
    "q8_market_share",
    doc="TPC-H Q8: conditional aggregation ratio per year",
    oracle=f"""
SELECT o_year, round({_osum("CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END")}
                     / {_osum('volume')}, 4) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    df = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    nation_vol = F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return (
        df.groupBy("o_year")
        .agg(F.round(dsum(nation_vol) / dsum(F.col("volume")), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------


@query(
    "q9_profit",
    bench=True,
    doc="TPC-H Q9 shape: LIKE filter on part name, profit by nation/year",
    oracle=f"""
SELECT nation, o_year, round({_osum('amount')}, 2) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    df = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
    )
    return (
        df.groupBy("nation", "o_year")
        .agg(F.round(dsum(F.col("amount")), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting, top 20
# --------------------------------------------------------------------------


@query(
    "q10_returned_items",
    doc="TPC-H Q10: returned-lineitem revenue per customer, top-20",
    oracle=f"""
SELECT c_custkey, c_name,
       round({_osum(_REV)}, 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q12 (adapted) — priority counting by return flag
# --------------------------------------------------------------------------


@query(
    "q12_priority_by_flag",
    doc="TPC-H Q12 shape: CASE-counting aggregate over a joined filter",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join + double group)
# --------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    bench=True,
    doc="TPC-H Q13: left outer join, per-customer count, count distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                         AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q14 — promotion effect (conditional-agg percentage)
# --------------------------------------------------------------------------


@query(
    "q14_promo_revenue",
    doc="TPC-H Q14: promo revenue percentage in one month",
    oracle=f"""
SELECT round(100.0 * {_osum(f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END")}
             / {_osum(_REV)}, 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(F.round(F.lit(100.0) * dsum(promo) / dsum(rev), 4).alias("promo_revenue"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (per-group avg as a join)
# --------------------------------------------------------------------------


@query(
    "q17_small_qty_revenue",
    doc="TPC-H Q17: correlated avg-per-part subquery → aggregate+join",
    oracle=f"""
SELECT round({_osum('l_extendedprice')} / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS ap_partkey,
             0.5 * ({_oavg('l_quantity')}) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey) a
  ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < half_avg_qty
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # The correlated scalar subquery decorrelates to an aggregate + join —
    # the same shape Catalyst/DataFusion produce internally; expressing it
    # directly means one shuffle on l_partkey.
    avg_per_part = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.5) * davg(F.col("l_quantity"))).alias("half_avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_per_part, l.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(dsum(F.col("l_extendedprice")) / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over join)
# --------------------------------------------------------------------------


@query(
    "q18_large_volume_customer",
    bench=True,
    doc="TPC-H Q18: groupBy+having sum(qty), join back to customer/orders",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_totalprice,
       round({_osum('l_quantity')}, 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING {_osum('l_quantity')} > 150
)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan form (optimization guide §1.2 step 1: don't compute things
    # you throw away).  The final GROUP BY includes o_orderkey, and every
    # other group key (c_name, c_custkey, orderdate, o_totalprice) is
    # functionally determined by it, so the group's sum(l_quantity) IS the
    # per-order total the HAVING subquery already computed — the r10 form
    # scanned lineitem twice (once for the subquery, once to re-aggregate
    # the same sum after a semi-join).  dsum is exact DECIMAL accumulation,
    # so the single-pass value is bit-identical to the re-aggregated one
    # (proven against the unchanged oracle, strict, sf0.001/0.01/0.1).
    # No spread opt-in (r12): unlike q1, the groupBy(l_orderkey) shuffles
    # the scan output immediately, so the round-robin exchange was pure
    # overhead — measured cold one-shot (fresh JVM, driver protocol)
    # 2.42-2.75 s spread vs 1.62-1.79 s unspread AND steady best-of-3
    # 1.55 vs 1.23 s; the r11 opt-in predated the single-scan rewrite.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("__tot_qty"))
        .filter(F.col("__tot_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_totalprice",
            F.round(F.col("__tot_qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-predicate join filter)
# --------------------------------------------------------------------------


@query(
    "q19_discounted_revenue",
    doc="TPC-H Q19: OR-of-ANDs predicates across the join",
    oracle=f"""
SELECT round({_osum(_REV)}, 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q22 (adapted) — idle customers with above-average balance (anti join +
# uncorrelated scalar subquery)
# --------------------------------------------------------------------------


@query(
    "q22_idle_customers",
    doc="TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti join",
    oracle=f"""
SELECT c_nationkey,
       count(*) AS numcust,
       round({_osum('c_acctbal')}, 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {_oavg('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    # Uncorrelated scalar subquery → broadcast single-row aggregate (no
    # driver-side collect: stays in the plan as a 1-row cross join).
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(davg(F.col("c_acctbal")).alias("avg_bal"))
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(dsum(F.col("c_acctbal")), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Aggregation variants: rollup / cube / grouping sets / distinct aggregates
# --------------------------------------------------------------------------


@query(
    "a1_rollup",
    doc="ROLLUP with GROUPING() markers (DataFusion default feature → Spark rollup)",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       round({_osum('l_quantity')}, 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
""",
)
def a1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(dsum(F.col("l_quantity")), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n_rows")
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@query(
    "a2_cube",
    bench=True,
    doc="CUBE over two dimensions with count + sum",
    oracle=f"""
SELECT c_mktsegment, n_name,
       CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
       CAST(GROUPING(n_name) AS INT) AS g_nat,
       count(*) AS n_customers,
       round({_osum('c_acctbal')}, 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (c_mktsegment, n_name)
ORDER BY g_seg, g_nat, c_mktsegment, n_name
""",
)
def a2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .cube("c_mktsegment", "n_name")
        .agg(
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("n_name").cast("int").alias("g_nat"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(dsum(F.col("c_acctbal")), 2).alias("total_bal"),
        )
        .select("c_mktsegment", "n_name", "g_seg", "g_nat", "n_customers", "total_bal")
        .orderBy("g_seg", "g_nat", "c_mktsegment", "n_name")
    )


@query(
    "a3_grouping_sets",
    doc="explicit GROUPING SETS via SQL (Spark SQL = DataFusion SQL surface)",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round({_osum('o_totalprice')}, 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def a3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@query(
    "a4_distinct_aggs",
    doc="multiple DISTINCT aggregates in one grouped aggregation",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       round(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_distinct_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def a4_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.round(
                F.sum_distinct(F.col("l_quantity").cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_distinct_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "s1_setops",
    doc="UNION / INTERSECT / EXCEPT over two customer populations",
    oracle="""
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
SELECT 'only_building' AS tag, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
UNION ALL
SELECT 'only_rich' AS tag, c_custkey FROM (SELECT * FROM rich EXCEPT SELECT * FROM building)
UNION ALL
SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
ORDER BY tag, c_custkey
""",
)
def s1_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    out = (
        building.subtract(rich).select(F.lit("only_building").alias("tag"), "c_custkey")
        .unionAll(rich.subtract(building).select(F.lit("only_rich").alias("tag"), "c_custkey"))
        .unionAll(building.intersect(rich).select(F.lit("both").alias("tag"), "c_custkey"))
    )
    return out.orderBy("tag", "c_custkey")


# --------------------------------------------------------------------------
# Subqueries: IN / NOT EXISTS / correlated scalar
# --------------------------------------------------------------------------


@query(
    "s2_exists_in",
    doc="IN subquery + NOT-IN-on-literals over suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem
                    JOIN part ON l_partkey = p_partkey
                    WHERE p_brand = 'Brand#11')
  AND s_nationkey NOT IN (0, 1, 2)
ORDER BY s_suppkey
""",
)
def s2_exists_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").filter(~F.col("s_nationkey").isin(0, 1, 2))
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    supp_keys = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select("l_suppkey")
    return (
        s.join(supp_keys, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "s3_scalar_subquery",
    doc="correlated scalar subquery (avg per type) — decorrelated to agg+join",
    oracle=f"""
SELECT p_partkey, p_retailprice,
       round(type_avg, 4) AS type_avg_price
FROM part
JOIN (SELECT p_type AS t, {_oavg('p_retailprice')} AS type_avg FROM part GROUP BY p_type) a
  ON part.p_type = a.t
WHERE p_retailprice > 1.5 * type_avg
ORDER BY p_partkey
""",
)
def s3_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    avg_per_type = p.groupBy(F.col("p_type").alias("t")).agg(
        davg(F.col("p_retailprice")).alias("type_avg")
    )
    return (
        p.join(F.broadcast(avg_per_type), p.p_type == F.col("t"))
        .filter(F.col("p_retailprice") > 1.5 * F.col("type_avg"))
        .select("p_partkey", "p_retailprice", F.round("type_avg", 4).alias("type_avg_price"))
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Semi/anti join counts, broadcast-dim join, pivot, top-k
# --------------------------------------------------------------------------


@query(
    "j1_semi_anti",
    doc="left-semi and left-anti joins (EXISTS / NOT EXISTS counts)",
    oracle="""
SELECT 'with_orders' AS tag, count(*) AS n_customers
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'without_orders' AS tag, count(*) AS n_customers
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY tag
""",
)
def j1_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("with_orders").alias("tag"), "n_customers")
    )
    without = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("without_orders").alias("tag"), "n_customers")
    )
    return with_orders.unionAll(without).orderBy("tag")


@query(
    "j2_brand_supplier_revenue",
    bench=True,
    doc="fact⋈broadcast(part)⋈broadcast(supplier): revenue by brand×supplier, top-20",
    oracle=f"""
SELECT p_brand, s_name, round({_osum(_REV)}, 2) AS revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand, s_name
ORDER BY revenue DESC, p_brand, s_name
LIMIT 20
""",
)
def j2_brand_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "p_brand", "s_name")
        .limit(20)
    )


@query(
    "p1_pivot",
    doc="pivot (returnflag × linestatus) expressed as conditional aggregation",
    oracle=f"""
SELECT l_returnflag,
       round({_osum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")}, 2) AS qty_o,
       round({_osum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")}, 2) AS qty_f,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def p1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    qty_o = F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(F.lit(0.0))
    qty_f = F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(F.lit(0.0))
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(dsum(qty_o), 2).alias("qty_o"),
            F.round(dsum(qty_f), 2).alias("qty_f"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "r1_cte_values_rangejoin",
    doc="CTE + inline VALUES dimension + non-equi (theta) range join",
    oracle="""
WITH bands AS (
  SELECT * FROM (VALUES (0.0, 500.0, 'low'), (500.0, 2000.0, 'mid'),
                        (2000.0, 1e12, 'high')) AS t(lo, hi, band)
)
SELECT band, count(*) AS n_orders
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
""",
)
def r1_cte_values_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH bands AS (
          SELECT * FROM VALUES (0.0D, 500.0D, 'low'), (500.0D, 2000.0D, 'mid'),
                               (2000.0D, 1e12D, 'high') AS t(lo, hi, band)
        )
        SELECT band, count(*) AS n_orders
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
        ORDER BY band
        """
    )


@query(
    "r2_parameterized",
    doc="parameterized SQL (prepared-statement surface, handler.rs:134-144)",
    oracle="""
SELECT o_orderstatus, count(*) AS n_orders
FROM orders
WHERE o_totalprice > 1000.0 AND o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def r2_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # named-parameter substitution ≈ the reference's $n prepared parameters
    # (LogicalPlan::with_param_values, parser.rs:31-44)
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_orders
        FROM orders
        WHERE o_totalprice > :threshold AND o_orderpriority = :prio
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """,
        args={"threshold": 1000.0, "prio": "1-URGENT"},
    )


@query(
    "t1_topk",
    doc="ORDER BY ... LIMIT top-k (TakeOrderedAndProject, no full sort)",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 15
""",
)
def t1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Q15 — top supplier: scalar subquery over an aggregated CTE (TPC-H Q15 shape;
# the CREATE VIEW of the spec becomes a CTE / reused DataFrame)
# --------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    doc="TPC-H Q15: revenue CTE reused for both the join and the scalar max "
    "(the spec's CREATE VIEW revenue0)",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, round({_osum(_REV)}, 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    # the scalar max stays in-plan as a 1-row broadcast (no driver collect);
    # revenue is computed once and reused — Spark's exchange/subplan reuse
    # keeps it a single aggregation at execution
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS both
# correlated to the same outer row (TPC-H Q21 shape).  The driver's lineitem
# has no receipt/commit dates, so "late" is adapted to l_returnflag = 'R'
# with identical semantics on both the Spark and oracle side.
# --------------------------------------------------------------------------


@query(
    "q21_waiting_supplier",
    doc="TPC-H Q21: multi-correlated EXISTS (another supplier on the order) "
    "+ NOT EXISTS (no other supplier also late) over a self-joined fact",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name IN ('NATION_3', 'NATION_7')
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))

    l1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    # EXISTS → left-semi, NOT EXISTS → left-anti: both correlated on
    # (same order, different supplier); the anti side additionally
    # restricted to late rows.  Self-joins shuffle on l_orderkey — the
    # natural key — and the dims (supplier/nation/orders-filtered) broadcast.
    l2 = l.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "s4_setops_all",
    doc="INTERSECT ALL / EXCEPT ALL — multiplicity-preserving set ops "
    "(intersectAll/exceptAll) over order-priority multisets",
    oracle="""
WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
     b AS (SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000)
SELECT 'inter' AS tag, o_orderpriority, count(*) AS n
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
GROUP BY o_orderpriority
UNION ALL
SELECT 'exc' AS tag, o_orderpriority, count(*) AS n
FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
GROUP BY o_orderpriority
ORDER BY tag, o_orderpriority
""",
)
def s4_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-variant set ops keep duplicate multiplicity (min/count-difference
    semantics) — a different operator than the DISTINCT forms (Spark plans
    a row_number-tagged join under the hood)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_orderpriority")
    inter = (
        a.intersectAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("inter").alias("tag"), "o_orderpriority", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("exc").alias("tag"), "o_orderpriority", "n")
    )
    return inter.unionAll(exc).orderBy("tag", "o_orderpriority")


@query(
    "b1_bucketed_join",
    doc="bucketed co-located join: orders and lineitem written bucketed on "
    "the join key (8 buckets, sorted), then joined bucket-to-bucket — the "
    "shuffle-elimination lever for repeated big joins at 100 TB (plan "
    "asserted shuffle-free in tests/test_plans.py)",
    oracle=f"""
SELECT o.o_orderpriority AS o_orderpriority,
       count(*) AS n_items,
       round({_osum('l.l_extendedprice * (1 - l.l_discount)')}, 2) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def b1_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both fact tables bucketed+sorted on the join key, then join
    the bucketed tables: each bucket pairs with exactly one bucket on the
    other side, so the join runs with NO exchange on either input — the
    amortize-the-shuffle-once pattern (≈ Hive/Spark bucketing; the
    reference single-node engine has no analogue, its hash join always
    repartitions).  At 100 TB the one-time bucketed write replaces a
    per-query shuffle of the largest table."""
    import os
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"dataclod_buckets_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    for name, df, key in (("b1_orders", o, "o_orderkey"), ("b1_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(base, name))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    ob = spark.table("b1_orders").filter(F.col("o_orderstatus") == "O")
    lb = spark.table("b1_lineitem")
    return (
        ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "a6_percentiles",
    doc="ordered-set aggregates: exact median/quartiles via "
    "percentile_cont interpolation (DataFusion's APPROX_/PERCENTILE "
    "surface, pinned to the exact variant both engines share)",
    oracle="""
SELECT o_orderpriority,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p50,
       round(percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p25,
       round(percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p75,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_cont interpolates between two exact order statistics —
    the same a+(b−a)·f IEEE arithmetic in Spark and DuckDB, so rounding to
    4 dp is stable."""
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice").cast("double")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile(tp, F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile(tp, F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile(tp, F.lit(0.75)), 4).alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "a7_stat_aggregates",
    doc="statistical aggregate functions (corr / covar_samp / stddev_samp / "
    "var_samp) per return flag — the moment-based aggregate surface "
    "inherited from DataFusion defaults",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(stddev_samp(l_quantity), 4) AS stddev_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def a7_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment-based aggregates run as single-pass partial+final co-moment
    accumulation (Welford-style merge) — one shuffle of O(groups) state;
    both engines' streaming co-moment updates agree to well past the
    rounded digits at this scale."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "p2_partition_pruning",
    doc="hive-style partitioned write + partition-pruned read: events "
    "written partitioned by event_type, read back with a partition filter "
    "— the scan touches one directory (plan-asserted partition pruning)",
    oracle="""
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_start,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
FROM events
WHERE event_type = 'purchase'
GROUP BY bucket_start
ORDER BY bucket_start
""",
)
def p2_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB table-layout lever the driver parquet can't show on its
    own: a fact table partitioned by a low-cardinality column lets a
    partition filter skip whole directories before any I/O.  The query
    writes events partitioned by event_type once (per sf), re-reads with
    a partition-column filter, and aggregates — `tests/test_plans.py`
    asserts the scan plans with a pushed partition filter and one
    selected partition."""
    import os
    import tempfile

    from dataclod_spark.cache import materialize_once, source_key

    # cache key = full source path + source mtime: a regenerated events
    # parquet (or a different parent dir with the same leaf name) must
    # not hit a stale partitioned copy.  Concurrent sessions (pgwire is
    # thread-per-connection over one shared EngineSession) are serialized
    # by materialize_once's flock + atomic-rename lifecycle.
    key = source_key(os.path.join(sf_dir, "events.parquet"))
    base = os.path.join(tempfile.gettempdir(), f"dataclod_part_{key}")
    e = load(spark, sf_dir, "events")
    materialize_once(
        base,
        lambda staged: (
            e.select("event_id", "ts", "event_type", "value")
            .write.partitionBy("event_type")
            .mode("overwrite")
            .parquet(staged)
        ),
    )
    p = spark.read.parquet(base).filter(F.col("event_type") == "purchase")
    return (
        p.groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "n_events",
            "total_value",
        )
        .orderBy("bucket_start")
    )


@query(
    "u1_scd2_merge",
    doc="SCD type-2 dimension merge (operators/scd.py): change batches "
    "version-chained per key via one lead() window — valid_from/valid_to/"
    "is_current with no gaps or overlaps",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_mktsegment, 0 AS ver FROM customer
), chg1 AS (
  SELECT c_custkey, 'PROMOTED' AS c_mktsegment, 1 AS ver
  FROM customer WHERE c_custkey % 7 = 0
), chg2 AS (
  SELECT c_custkey, 'CHURNED' AS c_mktsegment, 2 AS ver
  FROM customer WHERE c_custkey % 13 = 0
), u AS (
  SELECT * FROM base UNION ALL SELECT * FROM chg1 UNION ALL SELECT * FROM chg2
)
SELECT c_custkey,
       c_mktsegment,
       ver AS valid_from,
       lead(ver) OVER (PARTITION BY c_custkey ORDER BY ver) AS valid_to,
       lead(ver) OVER (PARTITION BY c_custkey ORDER BY ver) IS NULL AS is_current
FROM u
ORDER BY c_custkey, valid_from
""",
)
def u1_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic change batches (segment promotions, churn marks)
    merged into the customer dimension: keys hit by both batches chain
    0 -> 1 -> 2 with each version closed at exactly the next stamp."""
    from dataclod_spark.operators.scd import scd2_apply

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = c.withColumn("ver", F.lit(0))
    chg1 = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_mktsegment", F.lit("PROMOTED"))
        .withColumn("ver", F.lit(1))
    )
    chg2 = (
        c.filter(F.col("c_custkey") % 13 == 0)
        .withColumn("c_mktsegment", F.lit("CHURNED"))
        .withColumn("ver", F.lit(2))
    )
    merged = scd2_apply(base, chg1.unionByName(chg2), key="c_custkey", version="ver")
    return merged.select(
        "c_custkey", "c_mktsegment", "valid_from", "valid_to", "is_current"
    ).orderBy("c_custkey", "valid_from")


@query(
    "p3_unpivot",
    doc="unpivot/melt (the reshape inverse of p1_pivot): per-flag measure "
    "columns melted to (flag, measure, value) rows via native df.unpivot",
    oracle="""
WITH agg AS (
  SELECT l_returnflag,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_price,
         round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM agg
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
)
ORDER BY l_returnflag, measure
""",
)
def p3_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape with Spark's native unpivot (a zero-shuffle
    Expand node — each input row emits one row per measure, no join)."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(dsum(F.col("l_quantity")), 2).alias("sum_qty"),
        F.round(dsum(F.col("l_extendedprice")), 2).alias("sum_price"),
        F.round(dsum(F.col("l_discount")), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "value"
    ).orderBy("l_returnflag", "measure")


@query(
    "x12_name_resolution",
    doc="entity resolution by edit distance: near-duplicate part names via "
    "native levenshtein with the length-difference lower-bound prefilter",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_1, b.p_name AS name_2,
       levenshtein(a.p_name, b.p_name) AS dist
FROM names a JOIN names b
  ON a.p_name < b.p_name
 AND abs(len(a.p_name) - len(b.p_name)) <= 2
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY name_1, name_2
""",
)
def x12_name_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entity-resolution primitive: candidate pairs bounded by the
    |len(a)-len(b)| <= d edit-distance lower bound (a free prefilter that
    prunes before the O(len^2) distance), exact levenshtein on survivors.
    At 100 TB the distinct-name table is the reduced join input and the
    length band (or a q-gram index) is the blocking key."""
    p = load(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_1"))
    b = names.select(F.col("p_name").alias("name_2"))
    return (
        a.join(
            b,
            (F.col("name_1") < F.col("name_2"))
            & (F.abs(F.length("name_1") - F.length("name_2")) <= 2),
        )
        .withColumn("dist", F.levenshtein("name_1", "name_2"))
        .filter(F.col("dist") <= 2)
        .orderBy("name_1", "name_2")
    )


@query(
    "u2_scd2_snapshot",
    doc="point-in-time (AS OF) read over the SCD2 dimension: segment "
    "distribution as of version 1 — between the two change batches",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_mktsegment, 0 AS ver FROM customer
), chg1 AS (
  SELECT c_custkey, 'PROMOTED' AS c_mktsegment, 1 AS ver
  FROM customer WHERE c_custkey % 7 = 0
), chg2 AS (
  SELECT c_custkey, 'CHURNED' AS c_mktsegment, 2 AS ver
  FROM customer WHERE c_custkey % 13 = 0
), u AS (
  SELECT * FROM base UNION ALL SELECT * FROM chg1 UNION ALL SELECT * FROM chg2
), hist AS (
  SELECT c_custkey, c_mktsegment, ver AS valid_from,
         lead(ver) OVER (PARTITION BY c_custkey ORDER BY ver) AS valid_to
  FROM u
)
SELECT c_mktsegment, count(*) AS n_customers
FROM hist
WHERE valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def u2_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF version 1: exactly one row per key qualifies (the SCD2
    no-gap/no-overlap invariant makes the snapshot a pure filter — no
    window, no dedup at read time)."""
    from dataclod_spark.operators.scd import scd2_apply

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = c.withColumn("ver", F.lit(0))
    chg1 = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_mktsegment", F.lit("PROMOTED"))
        .withColumn("ver", F.lit(1))
    )
    chg2 = (
        c.filter(F.col("c_custkey") % 13 == 0)
        .withColumn("c_mktsegment", F.lit("CHURNED"))
        .withColumn("ver", F.lit(2))
    )
    hist = scd2_apply(base, chg1.unionByName(chg2), key="c_custkey", version="ver")
    snap = hist.filter(
        (F.col("valid_from") <= 1)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 1))
    )
    return (
        snap.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "r3_recursive_cte",
    doc="WITH RECURSIVE hierarchy walk (native in Spark 4 and DuckDB): "
    "ancestor chains over a derived parent edge (k -> k div 2), depth "
    "distribution of the implied binary hierarchy",
    oracle="""
WITH RECURSIVE anc(key, anc_key, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT a.key, a.anc_key // 2, a.depth + 1 FROM anc a WHERE a.anc_key >= 2
)
SELECT max_depth, count(*) AS n_keys
FROM (SELECT key, max(depth) AS max_depth FROM anc GROUP BY key)
GROUP BY max_depth
ORDER BY max_depth
""",
)
def r3_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTEs are part of the inherited SQL surface (DataFusion
    ships them; Spark gained WITH RECURSIVE in 4.0) — each iteration is
    one distributed step, state is the frontier relation, and the fixed
    point here is bounded by the ~log2(max key) chain depth.  The
    iterative-DataFrame twin of this shape is
    operators/dedup.connected_components."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("r3_customer")
    return spark.sql(
        """
        WITH RECURSIVE anc(key, anc_key, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM r3_customer
          UNION ALL
          SELECT a.key, a.anc_key DIV 2, a.depth + 1 FROM anc a WHERE a.anc_key >= 2
        )
        SELECT max_depth, count(*) AS n_keys
        FROM (SELECT key, max(depth) AS max_depth FROM anc GROUP BY key)
        GROUP BY max_depth
        ORDER BY max_depth
        """
    )


@query(
    "u3_cdc_merge",
    doc="CDC MERGE-apply (operators/cdc.apply_changes): an I/U/D change "
    "batch derived from the customer dimension is merged into the "
    "snapshot — deletes drop, upserts replace/add, untouched keys pass "
    "through; one anti-join + union, the snapshot streams once",
    oracle="""
WITH del AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 11 = 0
), upd AS (
  SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + 100 AS c_acctbal, 'UPDATED' AS c_mktsegment
  FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 11 <> 0
), ins AS (
  SELECT c_custkey + 1000000 AS c_custkey,
         'new-' || c_custkey AS c_name,
         CAST(0 AS INTEGER) AS c_nationkey,
         CAST(0.0 AS DOUBLE) AS c_acctbal,
         'INSERTED' AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
), touched AS (
  SELECT c_custkey FROM del
  UNION ALL SELECT c_custkey FROM upd
  UNION ALL SELECT c_custkey FROM ins
), merged AS (
  SELECT * FROM customer
  WHERE c_custkey NOT IN (SELECT c_custkey FROM touched)
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
)
SELECT c_mktsegment,
       count(*) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS bal_sum
FROM merged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def u3_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch upsert/delete apply — the table-maintenance primitive Delta/
    Iceberg MERGE INTO compiles to.  The change batch (deterministically
    derived from the dimension itself) is a small fraction of the
    snapshot: the merge is one anti-join on the touched keys plus a
    union of the upsert payloads."""
    from dataclod_spark.operators.cdc import apply_changes

    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    upd = (
        c.filter((k % 5 == 0) & (k % 11 != 0))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (F.col("c_acctbal") + 100).alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
        .withColumn("op", F.lit("U"))
    )
    dels = c.filter(k % 11 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"),
    )
    ins = c.filter(k % 7 == 0).select(
        (k + 1000000).alias("c_custkey"),
        F.concat(F.lit("new-"), k.cast("string")).alias("c_name"),
        F.lit(0).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("INSERTED").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    merged = apply_changes(c, changes, "c_custkey", "op")
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 2
            ).alias("bal_sum"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the driver parquet set has no partsupp table, so q2/q11/
# q16/q20 derive one deterministically from part × supplier — 4 suppliers
# per part, keys/quantities/costs as pure integer arithmetic — identically
# in both engines (closing the "q2/q11/q16/q20 unimplementable" gap with
# full differential parity; the SHAPES match TPC-H, projected onto the
# columns the driver data carries).
# ---------------------------------------------------------------------------

_PS_SQL = """
ps AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey * 7 + i.i * 13) % ns.n AS BIGINT) AS ps_suppkey,
         CAST(1 + (p_partkey * 4 + i.i * 3) % 9999 AS BIGINT) AS ps_availqty,
         CAST((p_partkey * 31 + i.i * 7) % 100000 AS DOUBLE) / 100.0
           AS ps_supplycost
  FROM part,
       (SELECT unnest([0, 1, 2, 3]) AS i) i,
       (SELECT count(*) AS n FROM supplier) ns
)"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4 deterministic (partkey, suppkey) rows per part; supplier count
    folded in as a 1-row broadcast (no driver action).  Suppkeys are
    distinct per part for every driver SF (offsets 0/13/26/39 mod N are
    distinct for N=10/100/1000)."""
    p = load(spark, sf_dir, "part").select("p_partkey")
    n = load(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("__n"))
    k = F.col("p_partkey")
    i = F.col("__i")
    return (
        p.crossJoin(F.broadcast(n))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("__i"),
            "__n",
        )
        .select(
            k.alias("ps_partkey"),
            ((k * 7 + i * 13) % F.col("__n")).cast("bigint").alias("ps_suppkey"),
            (1 + (k * 4 + i * 3) % 9999).cast("bigint").alias("ps_availqty"),
            (((k * 31 + i * 7) % 100000).cast("double") / 100.0).alias(
                "ps_supplycost"
            ),
        )
    )


@query(
    "q2_min_cost_supplier",
    doc="TPC-H Q2 shape (derived partsupp): minimum-cost supplier per "
    "qualifying part within a region — correlated-min subquery resolved "
    "as a per-part min + equality join",
    oracle=f"""
WITH {_PS_SQL},
eligible AS (
  SELECT p.p_partkey, p.p_brand, ps.ps_suppkey, ps.ps_supplycost,
         s.s_name, s.s_acctbal, n.n_name, r.r_name
  FROM part p
  JOIN ps ON ps.ps_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size < 10 AND p.p_type = 'PROMO' AND r.r_name = 'ASIA'
), mins AS (
  SELECT p_partkey, min(ps_supplycost) AS min_cost
  FROM eligible GROUP BY p_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name, e.p_partkey, e.p_brand,
       round(e.ps_supplycost, 2) AS supply_cost
FROM eligible e JOIN mins m
  ON m.p_partkey = e.p_partkey AND e.ps_supplycost = m.min_cost
ORDER BY e.s_acctbal DESC, e.p_partkey, e.s_name
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated `cost = (SELECT min(...))` of TPC-H Q2 as one
    grouped min + equality join — two broadcast-friendly shuffles; the
    region/nation dims broadcast.  Derived costs are bit-identical in
    both engines (integer arithmetic / 100.0), so the min-equality join
    is exact."""
    ps = _derived_partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    eligible = (
        p.filter((F.col("p_size") < 10) & (F.col("p_type") == "PROMO"))
        .join(ps, p["p_partkey"] == ps["ps_partkey"])
        .join(s, s["s_suppkey"] == ps["ps_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select(
            "p_partkey", "p_brand", "ps_suppkey", "ps_supplycost",
            "s_name", "s_acctbal", "n_name",
        )
    )
    mins = eligible.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            mins,
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("ps_supplycost", 2).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q11_important_stock",
    doc="TPC-H Q11 shape (derived partsupp): per-part inventory value for "
    "one nation's suppliers (NATION_3 — populated at every driver SF), HAVING value > fraction of the nation total "
    "(scalar total folded in as a 1-row broadcast)",
    oracle=f"""
WITH {_PS_SQL},
natps AS (
  SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS val
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
), tot AS (
  SELECT CAST(sum(CAST(val AS DECIMAL(27,6))) AS DOUBLE) AS total FROM natps
)
SELECT ps_partkey,
       round(CAST(sum(CAST(val AS DECIMAL(27,6))) AS DOUBLE), 2) AS part_value
FROM natps CROSS JOIN tot
GROUP BY ps_partkey, tot.total
HAVING CAST(sum(CAST(val AS DECIMAL(27,6))) AS DOUBLE) > tot.total * 0.001
ORDER BY part_value DESC, ps_partkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's scalar subquery (the nation-wide total) rides as a 1-row
    broadcast crossJoin; per-term products are identical doubles and the
    cross-row sums DECIMAL-accumulate, so the HAVING comparison is
    engine-independent."""
    ps = _derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natps = (
        ps.join(s, s["s_suppkey"] == ps["ps_suppkey"])
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    tot = natps.agg(
        F.sum(F.col("val").cast("decimal(27,6)")).cast("double").alias("total")
    )
    return (
        natps.crossJoin(F.broadcast(tot))
        .groupBy("ps_partkey", "total")
        .agg(F.sum(F.col("val").cast("decimal(27,6)")).cast("double").alias("__sum"))
        .filter(F.col("__sum") > F.col("total") * 0.001)
        .select("ps_partkey", F.round("__sum", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@query(
    "q16_parts_supplier_counts",
    doc="TPC-H Q16 shape (derived partsupp): distinct supplier counts per "
    "(brand, type, size) bucket, excluding a brand, a type prefix, and a "
    "NOT IN supplier denylist",
    oracle=f"""
WITH {_PS_SQL}
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'PRO%'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77'
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's NOT IN denylist is a broadcast anti-join; the distinct count
    is one partial-aggregated shuffle on the (brand, type, size) key."""
    ps = _derived_partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PRO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    deny = load(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%77")
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        ps.join(F.broadcast(deny), "ps_suppkey", "left_anti")
        .join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_potential_promotion",
    doc="TPC-H Q20 shape (derived partsupp): suppliers holding more than "
    "half a year's shipped quantity of any qualifying part — nested IN "
    "subqueries as semi-joins over a correlated shipped-quantity aggregate",
    oracle=f"""
WITH {_PS_SQL},
shipped AS (
  SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
), qual AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM ps
  JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'small%'
  JOIN shipped sh
    ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty > sh.half_qty
)
SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
FROM supplier s JOIN qual q ON q.ps_suppkey = s.s_suppkey
ORDER BY s.s_name
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's correlated `availqty > 0.5 * sum(shipped)` resolves as one
    grouped aggregate over the year's lineitems joined back on the
    (part, supplier) key — integral double quantities sum exactly, so
    the comparison is engine-independent; the final IN is a semi-join."""
    ps = _derived_partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load(spark, sf_dir, "supplier")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.sum("l_quantity") * 0.5).alias("half_qty"))
    )
    qual = (
        ps.join(
            F.broadcast(p.select("p_partkey")),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(qual, s["s_suppkey"] == qual["ps_suppkey"], "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "u4_snapshot_diff",
    doc="snapshot diff by key (added/removed/changed + changed-column "
    "list, NULL-safe): the regression-diff between two pipeline runs — "
    "two deterministic snapshot variants of orders are compared so every "
    "change class is exercised at the gate",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 7 != 0
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus
  FROM orders WHERE o_orderkey % 5 != 0
), j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         array_to_string(list_filter([
           CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                THEN 'o_orderstatus' END,
           CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                THEN 'o_totalprice' END
         ], x -> x IS NOT NULL), ',') AS cc
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN cc != '' THEN 'changed' END AS change_type,
       CASE WHEN in_old AND in_new THEN cc ELSE '' END AS changed_cols
FROM j
WHERE (NOT in_old) OR (NOT in_new) OR cc != ''
ORDER BY o_orderkey
""",
)
def u4_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.cdc.snapshot_diff: one full-outer key join of the two
    partial projections; unchanged rows never leave the join, so output
    is bounded by change volume.  The snapshots are derived
    deterministically from orders (drop 1-in-7 vs 1-in-5; price doubled
    1-in-11, status overwritten 1-in-13) so added/removed/changed and
    multi-column changes all occur."""
    from dataclod_spark.operators.cdc import snapshot_diff

    o = load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    return snapshot_diff(old, new, keys=["o_orderkey"]).orderBy("o_orderkey")


@query(
    "u5_cdc_compact",
    doc="CDC change-log compaction (Delta CDF / Debezium batch prep): a "
    "multi-version change log — several ops per key in one batch window "
    "— collapses to ONE net effect per key before the MERGE: last "
    "payload wins, insert-then-delete cancels entirely, first-op I makes "
    "the net an insert; the compaction every MERGE target requires "
    "because its ON clause must match at most one source row per key",
    oracle="""
WITH log AS (
  SELECT c_custkey, c_acctbal + 1 AS c_acctbal, 'U' AS op, 1 AS seq
  FROM customer WHERE c_custkey % 4 = 1
  UNION ALL SELECT c_custkey, c_acctbal + 2, 'U', 2 FROM customer WHERE c_custkey % 4 = 1
  UNION ALL SELECT c_custkey, c_acctbal, 'I', 1 FROM customer WHERE c_custkey % 4 = 2
  UNION ALL SELECT c_custkey, c_acctbal + 5, 'U', 2 FROM customer WHERE c_custkey % 4 = 2
  UNION ALL SELECT c_custkey, c_acctbal, 'I', 1 FROM customer WHERE c_custkey % 4 = 3
  UNION ALL SELECT c_custkey, CAST(NULL AS DOUBLE), 'D', 2 FROM customer WHERE c_custkey % 4 = 3
  UNION ALL SELECT c_custkey, c_acctbal, 'U', 1 FROM customer WHERE c_custkey % 4 = 0
  UNION ALL SELECT c_custkey, CAST(NULL AS DOUBLE), 'D', 2 FROM customer WHERE c_custkey % 4 = 0
), cmp AS (
  -- payload rides in a struct: DuckDB's bare arg_max(value, seq) SKIPS
  -- rows whose value is NULL (a D row's payload), which would silently
  -- resurrect the pre-delete balance
  SELECT c_custkey,
         arg_max({'b': c_acctbal, 'o': op}, seq) AS last,
         arg_min(op, seq) AS first_op
  FROM log GROUP BY c_custkey
)
SELECT c_custkey, last.b AS c_acctbal,
       CASE WHEN last.o = 'D' THEN 'D'
            WHEN first_op = 'I' THEN 'I'
            ELSE 'U' END AS net_op
FROM cmp
WHERE NOT (last.o = 'D' AND first_op = 'I')
ORDER BY c_custkey
""",
)
def u5_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.cdc.compact_changes over a synthesized 2-op-per-key log
    covering all four net classes (U+U→U, I+U→I, I+D→cancel, U+D→D).
    One max_by/min_by aggregate — the log shuffles once on the key; the
    Spark struct payload and the oracle's arg_max struct carry the D
    rows' NULL balance faithfully on both engines."""
    from dataclod_spark.operators.cdc import compact_changes

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )

    def part(mod, bal, op, seq):
        return c.filter(F.col("c_custkey") % 4 == mod).select(
            "c_custkey",
            bal.alias("c_acctbal"),
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
        )

    b = F.col("c_acctbal")
    null_b = F.lit(None).cast("double")
    log = (
        part(1, b + 1, "U", 1)
        .unionByName(part(1, b + 2, "U", 2))
        .unionByName(part(2, b, "I", 1))
        .unionByName(part(2, b + 5, "U", 2))
        .unionByName(part(3, b, "I", 1))
        .unionByName(part(3, null_b, "D", 2))
        .unionByName(part(0, b, "U", 1))
        .unionByName(part(0, null_b, "D", 2))
    )
    return compact_changes(
        log, keys=["c_custkey"], seq_col="seq", op_col="op"
    ).orderBy("c_custkey")


@query(
    "a8_exact_group_quantiles",
    doc="EXACT discrete quantiles (percentile_disc: value at ASC rank "
    "ceil(q*n)) per group WITHOUT sorting whole groups: a GK sketch "
    "brackets each quantile's value, exact counts verify the band, and "
    "only the ~2n/accuracy band rows are ranked — the scale-safe exact "
    "alternative to both percentile_approx (approximate) and Spark's "
    "percentile aggregate (per-group in-memory collection); per-group "
    "full-rank fallback keeps it exact in every case",
    oracle="""
WITH r AS (
  SELECT l_returnflag, l_extendedprice AS x,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT l_returnflag, CAST(q AS DOUBLE) AS q, x AS value
FROM r CROSS JOIN (VALUES (0.25), (0.5), (0.9), (0.99)) AS t(q)
WHERE rn = greatest(CAST(ceil(q * n) AS BIGINT), 1)
ORDER BY l_returnflag, q
""",
)
def a8_exact_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.quantiles.group_quantiles_exact on lineitem prices per
    return flag — the round-8 banded-boundary pattern applied to the
    classic relational surface.  The extracted value at a rank is
    tie-independent (equal values sort adjacently), so no tiebreak
    column is needed and the oracle's arbitrary tie order is safe."""
    from dataclod_spark.operators.quantiles import group_quantiles_exact

    li = load(spark, sf_dir, "lineitem")
    return group_quantiles_exact(
        li, group="l_returnflag", col="l_extendedprice", qs=[0.25, 0.5, 0.9, 0.99]
    ).orderBy("l_returnflag", "q")


@query(
    "u6_scd2_enrich",
    doc="point-in-time fact enrichment: every order joined to the "
    "customer-segment VERSION valid on its order date (per-row as-of "
    "over SCD2 validity intervals — u2 is the global snapshot; this is "
    "the fact-pipeline read); orders before the first version keep NULL "
    "segment; 1:<=1 by the SCD2 no-gap/no-overlap invariant",
    oracle="""
WITH v AS (
  SELECT c_custkey, c_mktsegment, DATE '1993-06-01' AS vf FROM customer
  UNION ALL
  SELECT c_custkey, 'PROMOTED', DATE '1995-01-01' FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, 'CHURNED', DATE '1997-01-01' FROM customer WHERE c_custkey % 13 = 0
), hist AS (
  SELECT c_custkey, c_mktsegment, vf AS valid_from,
         lead(vf) OVER (PARTITION BY c_custkey ORDER BY vf) AS valid_to
  FROM v
)
SELECT h.c_mktsegment AS segment_at_order,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2)
         AS total_price
FROM orders o
LEFT JOIN hist h
  ON o.o_custkey = h.c_custkey
 AND o.o_orderdate >= h.valid_from
 AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
GROUP BY h.c_mktsegment
ORDER BY segment_at_order NULLS FIRST
""",
)
def u6_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.scd.scd2_enrich: equi-key join (broadcast/sort-merge,
    AQE-skew-splittable) with the validity interval as a post-filter —
    per-key fan-out bounded by version count, never a range-join blowup.
    The synthetic history stamps three dated versions (base 1993-06-01,
    PROMOTED 1995-01-01 for custkey%7, CHURNED 1997-01-01 for
    custkey%13); orders before the base date exercise the NULL path."""
    from dataclod_spark.operators.scd import scd2_enrich

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    v = (
        c.withColumn("vf", F.lit("1993-06-01").cast("date"))
        .unionByName(
            c.filter(F.col("c_custkey") % 7 == 0)
            .withColumn("c_mktsegment", F.lit("PROMOTED"))
            .withColumn("vf", F.lit("1995-01-01").cast("date"))
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 13 == 0)
            .withColumn("c_mktsegment", F.lit("CHURNED"))
            .withColumn("vf", F.lit("1997-01-01").cast("date"))
        )
    )
    from pyspark.sql import Window as W

    hist = v.select(
        F.col("c_custkey").alias("__k"),
        "c_mktsegment",
        F.col("vf").alias("valid_from"),
        F.lead("vf").over(
            W.partitionBy("c_custkey").orderBy("vf")
        ).alias("valid_to"),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    j = scd2_enrich(o, hist, "o_custkey", "o_orderdate", "__k")
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment_at_order"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total_price"),
        )
        .orderBy(F.col("segment_at_order").asc_nulls_first())
    )
