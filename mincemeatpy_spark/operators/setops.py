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


@register(
    "union_schema_evolution",
    oracle="""
        SELECT source, count(*) AS n,
               CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_missing_chars,
               CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_chars
        FROM (
            SELECT doc_id, source, NULL::BIGINT AS n_chars
            FROM documents WHERE doc_id % 2 = 0
            UNION ALL BY NAME
            SELECT doc_id, n_chars, source
            FROM documents WHERE doc_id % 2 = 1
        )
        GROUP BY source
        """,
    category="setop",
    doc="Schema-evolving union (unionByName + allowMissingColumns): an "
    "old snapshot written before the n_chars column existed unions "
    "with the current schema, missing columns null-filled, columns "
    "matched BY NAME not position — the append that breaks positional "
    "UNION ALL silently.  This is the ingestion-time half of schema "
    "evolution (source_schema_evolution covers the storage half).  "
    "Pure scan+union+agg: no shuffle beyond the final group-by at any "
    "scale.",
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    new = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "n_chars", "source")
    u = old.unionByName(new, allowMissingColumns=True)
    return u.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").isNull().cast("int")).cast("bigint").alias(
            "n_missing_chars"
        ),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("sum_chars"),
    )
