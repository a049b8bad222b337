"""Row-level relational operators: projection, filter, scalar functions.

In the reference these are ``mapfn`` idioms — yield a transformed subset
of the value, or yield nothing to filter (reference mincemeat.py:167-173;
SURVEY.md §2b).  Here they are declarative ``select``/``filter`` so
Catalyst pushes predicates and column pruning into the parquet scan —
check ``.explain`` for ``PushedFilters`` / ``ReadSchema``; at 100 TB this
is the difference between reading 2 columns of pages and reading 11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "projection_filter",
    oracle="""
        SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity BETWEEN 25 AND 40 AND l_returnflag = 'R'
        """,
    doc="Predicate + projection, both pushed into the parquet scan.",
)
def projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(25, 40) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


@register(
    "scalar_functions",
    oracle="""
        SELECT p_partkey,
               upper(p_brand)                    AS brand_u,
               lower(p_type)                     AS type_l,
               length(p_name)                    AS name_len,
               round(p_retailprice * 1.1, 2)     AS bumped,
               substring(p_type, 1, 5)           AS type5,
               concat_ws('#', p_brand, p_type)   AS brand_type
        FROM part
        WHERE p_size < 15
        """,
    doc="String/math scalar functions, JVM-side (no Python UDFs).",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") < 15)
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.length("p_name").alias("name_len"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("bumped"),
            F.substring("p_type", 1, 5).alias("type5"),
            F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        )
    )


@register(
    "case_when_null",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END                          AS bal_class,
               coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_or_none,
               (c_acctbal IS NULL)                           AS bal_is_null
        FROM customer
        """,
    doc="CASE WHEN / NULLIF / COALESCE / IS NULL semantics.",
)
def case_when_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(none)")).alias(
            "seg_or_none"
        ),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
    )


@register(
    "date_functions",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                               AS oy,
               month(o_orderdate)                              AS om,
               quarter(o_orderdate)                            AS oq,
               date_trunc('month', o_orderdate)::TIMESTAMP     AS omonth,
               date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since,
               o_orderdate + INTERVAL 3 MONTH                  AS plus3m
        FROM orders
        WHERE o_orderkey < 5000
        """,
    doc="Date/time scalar functions: extract, trunc, diff, interval math.",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("oy"),
        F.month("o_orderdate").alias("om"),
        F.quarter("o_orderdate").alias("oq"),
        F.date_trunc("month", "o_orderdate").alias("omonth"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus3m"),
    )


@register(
    "try_arithmetic",
    oracle="""
        SELECT l_linenumber,
               count(*) AS n,
               CAST(sum(CASE WHEN l_discount = 0 THEN NULL
                             ELSE CAST(round(l_extendedprice / l_discount) AS BIGINT)
                        END) AS BIGINT) AS ratio_sum,
               CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_div_zero
        FROM lineitem
        GROUP BY l_linenumber
        """,
    category="relational",
    doc="Error-safe arithmetic (try_divide): division by zero yields NULL "
    "instead of failing the job — the ANSI-mode-safe idiom for derived "
    "ratios over dirty data, where one bad row must not kill a 100 TB "
    "job.  Nulls then drop out of the aggregate, and the null count is "
    "surfaced alongside so data quality stays observable.  (Oracle "
    "mirrors try_divide with an explicit CASE; the rounded-to-integer "
    "ratio keeps the sum exact cross-engine.)",
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))
    return li.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(ratio).cast("bigint")).alias("ratio_sum"),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0)).alias("n_div_zero"),
    )


@register(
    "math_functions_extended",
    oracle="""
        SELECT l_linenumber,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(round_even(l_quantity + 0.5, 0)) AS BIGINT)
                   AS bround_sum,
               CAST(sum(CASE
                        WHEN l_quantity <= 0 THEN 0
                        WHEN l_quantity >= 50 THEN 6
                        ELSE CAST(floor(l_quantity / 10.0) AS BIGINT) + 1
                        END) AS BIGINT) AS bucket_sum,
               CAST(factorial(l_linenumber) AS BIGINT) AS line_factorial,
               CAST(sum(CAST(floor(sqrt(l_quantity * l_quantity
                                        + CAST(l_linenumber AS DOUBLE)
                                          * l_linenumber) * 1000000)
                             AS BIGINT))
                    AS BIGINT) AS hypot_micro_sum,
               upper(to_base(CAST(l_linenumber * 2718 AS BIGINT), 16))
                   AS hexline
        FROM lineitem
        GROUP BY l_linenumber
        """,
    category="function",
    doc="Extended math scalar surface in one grouped pass: bround "
    "(banker's half-even rounding — the accounting convention; "
    "DuckDB twin round_even), width_bucket (equi-width histogram "
    "bucketing, oracle spelled as the clamped floor formula it is "
    "defined by), factorial (exact BIGINT for n<=20), the "
    "euclidean norm sqrt(x^2+y^2) checked as exact micro-truncated "
    "PER-ROW values summed as integers (spelled as the explicit "
    "formula in BOTH engines: Math.hypot's extra-precision algorithm "
    "differs from sqrt(x*x+y*y) in the last ulp, which micro-"
    "truncation amplifies — a measured cross-engine exactness "
    "lesson), and conv/to_base (radix conversion).  The half-"
    "even cases actually fire: quantities are integral, so q+0.5 is "
    "always a tie and bround's even/odd branch decides every row.",
)
def math_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    hyp_micro = (
        F.sqrt(
            F.col("l_quantity") * F.col("l_quantity")
            + F.col("l_linenumber").cast("double") * F.col("l_linenumber")
        )
        * 1_000_000
    ).cast("bigint")
    return li.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.bround(F.col("l_quantity") + 0.5, 0))
        .cast("bigint")
        .alias("bround_sum"),
        F.sum(
            F.width_bucket(
                F.col("l_quantity"), F.lit(0.0), F.lit(50.0), F.lit(5)
            )
        )
        .cast("bigint")
        .alias("bucket_sum"),
        F.factorial(F.first("l_linenumber")).alias("line_factorial"),
        F.sum(hyp_micro).cast("bigint").alias("hypot_micro_sum"),
        F.conv(
            (F.first("l_linenumber") * 2718).cast("string"),
            10,
            16,
        ).alias("hexline"),
    )
