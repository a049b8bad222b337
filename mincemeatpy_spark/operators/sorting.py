"""Sorting, limits, top-k.

MR encoding in the reference: a single reduce key gives a total order in
one worker (doesn't scale); local top-k in ``collectfn`` merged in
``reducefn`` (SURVEY.md §2b).  Spark:

- global ORDER BY = range-partitioned sample sort (scales out);
- ORDER BY + LIMIT k = TakeOrderedAndProject: per-partition heap of k,
  driver merges k*partitions rows — no global sort at all.  At 100 TB
  top-k is effectively free; a full global sort is the thing to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "topk_global",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 15
        """,
    category="sort",
    doc="Global top-k: TakeOrderedAndProject (per-partition heaps), not a "
    "full sort.",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn
        FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (PARTITION BY c.c_mktsegment
                                      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
        )
        WHERE rn <= 3
        """,
    category="sort",
    doc="Top-k per group: window row_number + filter — one shuffle on the "
    "group key, early filter keeps only k rows per group downstream.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "global_sort_rank",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
        FROM orders
        ORDER BY pos
        LIMIT 100
        """,
    category="sort",
    doc="Global total order with positions — exercises the range-"
    "partitioned sample sort; single-partition window kept small by the "
    "downstream limit.",
)
def global_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_orderkey", "o_totalprice")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 100)
    )


@register(
    "sort_limit_offset",
    oracle="""
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        ORDER BY cents DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """,
    category="sort",
    doc="Keyset pagination surface: DataFrame.offset(40).limit(20) over "
    "a total order (cents DESC, key ASC tiebreaker — the module's "
    "determinism convention).  Spark executes offset+limit as a "
    "CollectLimit with skip — the driver materializes only "
    "offset+limit rows, never the sorted corpus; at scale the "
    "per-partition top-(offset+limit) is computed map-side exactly "
    "like top-k (TakeOrderedAndProject), so a deep page costs "
    "O(offset+limit), not a global sort.  (True keyset pagination — "
    "WHERE key > last_seen — is still the better production idiom for "
    "deep pages; this query is the API-parity check.)",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return (
        o.orderBy(F.col("cents").desc(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
    )
