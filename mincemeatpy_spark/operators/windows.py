"""Window functions.

The reference's window encoding: group by partition key, then
``reducefn`` sorts the whole value list in one worker's memory and scans
(SURVEY.md §2b) — all rows of a partition on one machine.  Spark's Window
operator keeps that per-partition locality (one shuffle on the partition
key) but sorts with spill and pipelines the scan — at 100 TB the thing to
watch is partition-key cardinality: a window over a key with millions of
rows per key serializes into one task; salt or pre-aggregate first.

Every ORDER BY carries a unique tiebreaker so results are deterministic
(the reference's value-list order is explicitly non-deterministic,
reference mincemeat.py:347 — we fix that flaw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mincemeatpy_spark.operators._util import DEC
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "window_rank",
    oracle="""
        SELECT s_suppkey, s_nationkey, s_acctbal,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rn
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
        """,
    category="window",
    doc="Ranking family: rank/dense_rank tie-aware, row_number with an "
    "explicit tiebreaker for determinism.",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    w_rn = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w_rn).alias("rn"),
    )


@register(
    "window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               lag(o_totalprice)  OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
    category="window",
    doc="lag/lead with offset and default — the sequence-analysis primitive.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@register(
    "window_running_sum",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total,
               count(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n_so_far
        FROM orders
        """,
    category="window",
    doc="Running aggregate with an explicit ROWS frame (decimal-exact sum "
    "so every prefix is bit-identical cross-engine).",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "window_range_frame",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               count(*) OVER w AS n_30d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                     RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        """,
    category="window",
    doc="RANGE frame over event-time (trailing 30 days per customer): "
    "value-based frame bounds, peers included — the moving-window "
    "aggregate for time series.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_30d"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("sum_30d"),
    )


@register(
    "window_distribution",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               ntile(4) OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal, c_custkey)          AS quartile,
               round(percent_rank() OVER (PARTITION BY c_nationkey
                                          ORDER BY c_acctbal), 6)     AS pct_rank,
               round(cume_dist() OVER (PARTITION BY c_nationkey
                                       ORDER BY c_acctbal), 6)        AS cdist
        FROM customer
        """,
    category="window",
    doc="Distribution family: ntile (tiebroken for determinism), "
    "percent_rank, cume_dist.",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w_tile = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_ties = W.partitionBy("c_nationkey").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w_tile).alias("quartile"),
        F.round(F.percent_rank().over(w_ties), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_ties), 6).alias("cdist"),
    )


@register(
    "window_first_last",
    oracle="""
        SELECT DISTINCT o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice)  OVER w AS last_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
    category="window",
    doc="first_value/last_value over a full-partition frame, collapsed "
    "with DISTINCT — first & last order price per customer.",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    ).distinct()


@register(
    "window_session_dynamic_gap",
    oracle="""
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS us,
                   epoch_us(ts) + CAST(1000000 AS BIGINT) * CASE event_type
                       WHEN 'purchase' THEN 3600
                       WHEN 'signup' THEN 1800
                       ELSE 600 END AS en
            FROM events
        ),
        m AS (
            SELECT user_id, us, en,
                   max(en) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_max
            FROM e
        ),
        sid AS (
            SELECT user_id, us, en,
                   sum(CASE WHEN prev_max IS NULL OR us > prev_max
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM m
        )
        SELECT user_id,
               CAST(min(us) AS BIGINT) AS start_us,
               CAST(max(en) AS BIGINT) AS end_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM sid GROUP BY user_id, sid
        """,
    category="window",
    doc="DYNAMIC-GAP session windows (session_window with a gap "
    "EXPRESSION): each event extends its session by an event-type-"
    "dependent horizon (purchase 60 min, signup 30 min, else 10 min) "
    "— the real-world sessionization rule engagement analytics uses "
    "(a purchase keeps a visit alive far longer than a stray click).  "
    "Merge semantics measured on this engine, not assumed: an event "
    "joins a session NON-STRICTLY (ts == current end merges) against "
    "the RUNNING MAX of member ends — a long-gap early event keeps "
    "absorbing later short-gap events even after their own horizons "
    "lapse (probed: [100,+30s][120,+5s][126,+5s] is ONE session "
    "ending 131).  The oracle replays exactly that interval-merge in "
    "closed form (running-max window + gaps-and-islands); bounds in "
    "exact int64 micros.  Ties are safe: positive gaps make the "
    "break flag order-independent between equal timestamps.  Plan: "
    "one shuffle on user_id, sessions assigned by Spark's "
    "MergingSessionsExec inside the aggregate — no self-join; at "
    "100 TB this is the same one-shuffle shape as static-gap "
    "sessionization.",
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("3600 seconds"))
        .when(F.col("event_type") == "signup", F.lit("1800 seconds"))
        .otherwise(F.lit("600 seconds"))
    )
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("start_us"),
            F.unix_micros("w.end").alias("end_us"),
            "n_events",
        )
    )
