"""String / regexp / formatting scalar functions + conditional and
argmin/argmax aggregates — the inline-Python-in-mapfn surface of the
reference (SURVEY.md §2b "string/math scalar fns") as codegen'd builtins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "string_functions",
    oracle="""
        SELECT p_partkey,
               lpad(p_brand, 12, '*')            AS brand_pad,
               rpad(p_brand, 12, '.')            AS brand_rpad,
               replace(p_type, ' ', '_')         AS type_snake,
               reverse(p_brand)                  AS brand_rev,
               repeat(p_brand, 2)                AS brand_x2,
               strpos(p_type, 'a')               AS first_a,
               left(p_name, 6)                   AS name6,
               right(p_type, 4)                  AS type_tail,
               split_part(p_type, ' ', 1)        AS type_head
        FROM part
        WHERE p_partkey < 500
        """,
    category="function",
    doc="String builtin battery: pad/replace/reverse/repeat/position/"
    "slice/split_part.",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_x2"),
        F.instr("p_type", "a").alias("first_a"),
        F.substring("p_name", 1, 6).alias("name6"),
        F.substring(F.col("p_type"), -4, 4).alias("type_tail"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@register(
    "regexp_functions",
    oracle="""
        SELECT doc_id,
               regexp_extract(text, '([a-z]+)', 1)        AS first_word,
               regexp_matches(text, 'join .* table')      AS has_join_table,
               regexp_replace(text, '[aeiou]', '', 'g')   AS no_vowels_head
        FROM (
            SELECT doc_id, substring(text, 1, 40) AS text
            FROM documents WHERE doc_id < 50
        )
        """,
    category="function",
    doc="Regexp battery: extract (group 1), boolean match, global "
    "replace — Java and RE2-ish semantics agree on this POSIX subset.",
)
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.substring("text", 1, 40).alias("text"))
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("join .* table").alias("has_join_table"),
        F.regexp_replace("text", "[aeiou]", "").alias("no_vowels_head"),
    )


@register(
    "date_format_strings",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m')      AS ym,
               strftime(o_orderdate, '%Y/%m/%d')   AS ymd,
               strftime(o_orderdate, '%H:%M:%S')   AS hms
        FROM orders
        WHERE o_orderkey < 2000
        """,
    category="function",
    doc="Timestamp-to-string formatting (date_format vs strftime).",
)
def date_format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("ymd"),
        F.date_format("o_orderdate", "HH:mm:ss").alias("hms"),
    )


@register(
    "conditional_aggregates",
    oracle="""
        SELECT o_orderpriority,
               CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
               bool_or(o_orderstatus = 'F')               AS any_f,
               bool_and(o_totalprice > 0)                 AS all_positive,
               max_by(o_totalprice, o_orderkey)           AS price_of_max_key,
               min_by(o_totalprice, o_orderkey)           AS price_of_min_key
        FROM orders
        GROUP BY o_orderpriority
        """,
    category="function",
    doc="Conditional + argmin/argmax aggregates: count_if, bool_or/and, "
    "max_by/min_by (keyed on the unique order key for determinism).",
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.max_by("o_totalprice", "o_orderkey").alias("price_of_max_key"),
        F.min_by("o_totalprice", "o_orderkey").alias("price_of_min_key"),
    )
