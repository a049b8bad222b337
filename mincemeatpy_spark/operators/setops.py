"""Set operators: UNION / INTERSECT / EXCEPT.

MR encoding in the reference: map tags each row by source, reduce checks
the tag set per full-row key (SURVEY.md §2b).  Spark plans these as
aggregates/joins on the full row — distributed, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "set_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
        """,
    category="setop",
    doc="UNION (distinct): concat + group-by-all-columns.",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_union_all_counts",
    oracle="""
        SELECT nationkey, count(*) AS n
        FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey FROM supplier
        )
        GROUP BY nationkey
        """,
    category="setop",
    doc="UNION ALL preserves duplicates — counted per key to prove it.",
)
def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        """,
    category="setop",
    doc="INTERSECT: distinct keys present in both inputs (semi-join plan).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
        SELECT DISTINCT p_size AS k FROM part
        EXCEPT
        SELECT DISTINCT l_linenumber FROM lineitem
        """,
    category="setop",
    doc="EXCEPT: distinct left keys absent from the right (anti-join plan).",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select(F.col("p_size").alias("k")).distinct()
    l = t(spark, sf_dir, "lineitem").select(F.col("l_linenumber").alias("k")).distinct()
    return p.exceptAll(l).distinct()
