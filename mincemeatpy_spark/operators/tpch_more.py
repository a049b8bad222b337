"""The rest of the TPC-H-shaped benchmark suite (Q4, Q7, Q8, Q10, Q12,
Q13, Q14, Q15, Q17, Q18, Q19, Q22), adapted to the fixture star schema
(FIXTURES.md — no ``partsupp``, no comment/phone/shipmode columns; nation
names are ``NATION_<k>``, part types are single words).

Each query is a MapReduce-expressible composite over the reference's
O1-O6 dataflow (reference mincemeat.py:167-182, 306-355 — scan, flatMap,
combine, group-by-key, per-key reduce) re-expressed declaratively so
Catalyst plans the joins/aggregates; broadcast hints mark the dimension
sides that must NOT shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mincemeatpy_spark.operators._util import (
    decavg,
    decsum,
    oracle_decavg,
    oracle_decsum,
)
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "tpch_q4_priority_check",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
        """,
    category="join",
    doc="TPC-H Q4: correlated EXISTS as a left-semi join with a "
    "non-equi conjunct (l_shipdate > o_orderdate) on top of the "
    "orderkey equi-join — one shuffle on the join key, then a "
    "low-cardinality agg.",
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        GROUP BY supp_nation, cust_nation, l_year
        """,
    category="join",
    doc="TPC-H Q7: bilateral trade volume — two independent dimension "
    "chains (supplier→nation, orders→customer→nation) meeting at the "
    "fact, with a disjunctive cross-chain predicate that can only be "
    "applied after both chains join.  Both nation sides broadcast.",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("n1_key"),
                                F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("n2_key"),
                                F.col("n_name").alias("cust_nation")))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               {oracle_decsum("CASE WHEN n1.n_name = 'NATION_5' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
               / {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS mkt_share
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        GROUP BY o_year
        """,
    category="join",
    doc="TPC-H Q8: national market share — the deepest join tree in the "
    "suite (8 tables).  The selective part/region filters push into "
    "their scans; the share is a conditional-sum / total-sum ratio "
    "computed in one aggregation pass, not two queries.",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
        )
    )
    r = F.broadcast(t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(r, F.col("n2_region") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                decsum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0)))
                / decsum(vol)
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
        """,
    category="join",
    doc="TPC-H Q10: top-20 customers by returned-item revenue — fact "
    "filter (returnflag) and date-range both push to scans, nation "
    "broadcasts, and the top-k is a TakeOrderedAndProject (no global "
    "sort materialization).",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_by_status",
    oracle="""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_linestatus
        """,
    category="join",
    doc="TPC-H Q12 (adapted: l_linestatus for the missing l_shipmode): "
    "fact-fact join with conditional counting — the CASE pivots order "
    "priority into two counters in a single aggregation pass.",
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c
              LEFT OUTER JOIN orders o
                ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey) c_orders
        GROUP BY c_count
        """,
    category="join",
    doc="TPC-H Q13: customer order-count histogram — left outer join "
    "with an extra join-side predicate (kept out of WHERE so "
    "customers with zero orders survive), then a two-level "
    "aggregation.  count(o_orderkey) counts only matched rows.",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT 100.0 * {oracle_decsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
               / {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
          AND l.l_shipdate <  TIMESTAMP '1997-10-01'
        """,
    category="join",
    doc="TPC-H Q14: promo revenue share — one month of the fact "
    "broadcast-joined to part, conditional/total ratio in one pass.",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * decsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                / decsum(vol)
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {oracle_decsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
    category="join",
    doc="TPC-H Q15: top supplier — per-supplier revenue CTE reused "
    "twice (group + scalar max).  Implemented as one aggregation and "
    "a rank-1 window over the (tiny) per-supplier aggregate, so the "
    "fact is scanned once, not twice.",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    # The window runs over the per-supplier aggregate (|suppliers| rows),
    # not the fact — a single tiny partition is fine at any scale.
    top = (
        rev.withColumn("rnk", F.rank().over(Window.orderBy(F.col("total_revenue").desc())))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    s = t(spark, sf_dir, "supplier")
    return s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
        """,
    category="join",
    doc="TPC-H Q17: correlated scalar subquery (per-part average "
    "quantity) decorrelated into a broadcast self-aggregate join — "
    "the per-part aggregate is |part| rows, so it broadcasts instead "
    "of re-shuffling the fact.",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    qty_limit = F.broadcast(
        li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
            (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
        )
    )
    return (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .join(qty_limit, li.l_partkey == F.col("agg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q18_large_volume",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, sum(l.l_quantity) AS total_qty
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey
                               HAVING sum(l_quantity) > 250)
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        """,
    category="join",
    doc="TPC-H Q18: large-volume orders — the IN-subquery is a "
    "group-having aggregate semi-joined back to the fact.  Quantities "
    "are integer-valued doubles, so sum() is exact and the >250 "
    "threshold is engine-independent.",
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_orderkey"), "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@register(
    "tpch_q19_disjunctive_pred",
    oracle=f"""
        SELECT {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
        """,
    category="join",
    doc="TPC-H Q19: disjunctive mixed-table predicate — each disjunct "
    "spans both join sides, so it can't fully push down; Catalyst "
    "still derives the brand-IN / quantity-range residuals onto the "
    "scans and broadcasts part.",
)
def tpch_q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(t(spark, sf_dir, "part"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q22_dormant_customers",
    oracle=f"""
        SELECT n.n_name AS cust_nation,
               count(*) AS numcust,
               {oracle_decsum('c.c_acctbal')} AS totacctbal
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE c.c_acctbal > (SELECT {oracle_decavg('c2.c_acctbal')}
                             FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY n.n_name
        """,
    category="join",
    doc="TPC-H Q22 (adapted: nation for the missing phone prefix): "
    "dormant rich customers — scalar-average threshold via a "
    "broadcast 1-row cross join, NOT EXISTS as a left-anti join on "
    "orders.  The average uses exact decimal summation so the "
    "threshold comparison is engine-independent (_util module doc).",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    thr = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(decavg(F.col("c_acctbal")).alias("thr"))
    )
    n = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(thr)
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("cust_nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            decsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
