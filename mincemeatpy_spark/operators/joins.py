"""Join operators.

In the reference every join is the classic MapReduce repartition join:
tag rows by source in ``mapfn``, pair the tagged lists per key in
``reducefn`` (SURVEY.md §2b; the reference itself names no join operator
— it's an idiom over mincemeat.py O2+O4+O5).  Here each join category is
a declarative ``df.join`` so Catalyst picks the physical strategy:

- dimension tables → broadcast-hash (no shuffle of the fact side);
- fact-fact equi-joins → sort-merge/shuffled-hash on the key, with AQE
  skew-splitting — the 100 TB default;
- small non-equi joins → broadcast nested-loop (only sane when one side
  is tiny — every query here that uses BNLJ broadcasts a <100-row side);
- as-of joins → union + ordered window scan (one shuffle, no join at
  all) — the scalable encoding of ASOF.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mincemeatpy_spark.operators._util import decsum, oracle_decsum
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "join_inner",
    oracle=f"""
        SELECT o.o_orderpriority,
               count(*)                                              AS n_items,
               {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        """,
    category="join",
    doc="Fact-fact equi-join on the shuffle key (sort-merge/shuffled-hash "
    "under AQE), then two-phase aggregate.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "join_broadcast_dims",
    oracle=f"""
        SELECT r.r_name, n.n_name,
               count(*)                         AS n_cust,
               {oracle_decsum('c.c_acctbal')}   AS total_bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
        """,
    category="join",
    doc="Star-schema rollup with explicitly broadcast dimensions: zero "
    "shuffle of the fact side before aggregation — the 100 TB pattern for "
    "dim joins (dims are KBs; the fact scan streams through map-side).",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            decsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c.c_mktsegment,
               count(*)            AS n_rows,
               count(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
        """,
    category="join",
    doc="LEFT OUTER join: unmatched left rows survive with NULL right side "
    "(count(col) vs count(*) makes the padding visible).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
    category="join",
    doc="LEFT SEMI join (EXISTS): right side reduced to its key set before "
    "probing — no row multiplication, no right-side columns shuffled.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
    category="join",
    doc="LEFT ANTI join (NOT EXISTS): the dedup/difference workhorse.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_full_outer",
    oracle="""
        SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
               s.n_supp,
               c.n_cust
        FROM (SELECT s_nationkey AS nationkey, count(*) AS n_supp
              FROM supplier GROUP BY s_nationkey) s
        FULL OUTER JOIN
             (SELECT c_nationkey AS nationkey, count(*) AS n_cust
              FROM customer GROUP BY c_nationkey) c
        ON s.nationkey = c.nationkey
        """,
    category="join",
    doc="FULL OUTER join of two aggregates with NULL padding on both sides.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    joined = s.join(c, "nationkey", "full_outer")
    # `using`-column join already coalesces the key in Spark & DuckDB alike
    return joined.select("nationkey", "n_supp", "n_cust")


@register(
    "join_theta_pairs",
    oracle="""
        SELECT p1.p_size, count(*) AS n_pairs
        FROM part p1
        JOIN part p2
          ON p1.p_size = p2.p_size
         AND p1.p_partkey < p2.p_partkey
         AND p1.p_retailprice < p2.p_retailprice
        GROUP BY p1.p_size
        """,
    category="join",
    doc="Theta join: equi component (p_size) carries the shuffle, "
    "inequality predicates evaluate post-match — Catalyst plans an "
    "equi-join + filter, NOT a nested loop.  At 100 TB a pure-inequality "
    "join must be banded first (see join_range_band).",
)
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p1 = t(spark, sf_dir, "part").alias("p1")
    p2 = t(spark, sf_dir, "part").alias("p2")
    cond = (
        (F.col("p1.p_size") == F.col("p2.p_size"))
        & (F.col("p1.p_partkey") < F.col("p2.p_partkey"))
        & (F.col("p1.p_retailprice") < F.col("p2.p_retailprice"))
    )
    return (
        p1.join(p2, cond)
        .groupBy(F.col("p1.p_size").alias("p_size"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# Six fixed maintenance windows over the events month (deterministic).
_WINDOWS = [
    (i, dt.datetime(2024, 1, 2 + 5 * i, 6, 0, 0), dt.datetime(2024, 1, 2 + 5 * i, 18, 0, 0))
    for i in range(6)
]
_WINDOWS_SQL = ", ".join(
    f"({i}, TIMESTAMP '{s.isoformat(sep=' ')}', TIMESTAMP '{e.isoformat(sep=' ')}')"
    for i, s, e in _WINDOWS
)


@register(
    "join_range_interval",
    oracle=f"""
        SELECT w.win_id, e.event_type, count(*) AS n, {oracle_decsum('e.value')} AS total
        FROM events e
        JOIN (VALUES {_WINDOWS_SQL}) AS w(win_id, w_start, w_end)
          ON e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY w.win_id, e.event_type
        """,
    category="join",
    doc="Interval/range join: events against time windows.  The window side "
    "is tiny and broadcast, so the plan is a broadcast nested-loop — the "
    "right call when one side fits in memory.  For big-big range joins, "
    "band both sides to a common bucket key and equi-join on the band "
    "(turning O(n*m) into O(n+m) shuffle) — see streaming/windows_batch "
    "for the banded encoding.",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = F.broadcast(
        spark.createDataFrame(_WINDOWS, "win_id int, w_start timestamp, w_end timestamp")
    )
    return (
        e.join(w, (e.ts >= w.w_start) & (e.ts < w.w_end))
        .groupBy("win_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), decsum(F.col("value")).alias("total"))
    )


@register(
    "join_asof",
    oracle="""
        SELECT user_id, click_id, last_err_id, last_err_ts
        FROM (
            SELECT user_id,
                   event_id AS click_id,
                   event_type,
                   last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
                       OVER w AS last_err_id,
                   last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
                       OVER w AS last_err_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        WHERE event_type = 'click'
        """,
    category="join",
    doc="AS-OF join (each click matched to the most recent error at-or-"
    "before it, per user) encoded as union + one ordered window scan: "
    "ONE shuffle on user_id, no join, no row multiplication.  This is "
    "the 100 TB encoding — a merge_asof per group (applyInPandas) does "
    "the same work with Python in the loop; see join_asof_pandas.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    err_id = F.when(F.col("event_type") == "error", F.col("event_id"))
    err_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    return (
        e.withColumn("last_err_id", F.last(err_id, ignorenulls=True).over(w))
        .withColumn("last_err_ts", F.last(err_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            "last_err_id",
            "last_err_ts",
        )
    )


@register(
    "join_asof_pandas",
    oracle="""
        SELECT user_id, click_id, last_err_id
        FROM (
            SELECT user_id,
                   event_id AS click_id,
                   event_type,
                   last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_err_id
            FROM events
        )
        WHERE event_type = 'click'
        """,
    category="join",
    doc="Same AS-OF semantics via applyInPandas + pandas.merge_asof per "
    "user group: demonstrates the grouped-map UDF escape hatch (Arrow "
    "batches, one group per call).  Slower than join_asof's pure-window "
    "plan; kept as the pattern for asof logic TOO complex for windows.",
)
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # Bucket-grouped: one Arrow batch per 64-way user-hash bucket, not
    # one python call per user — grouped-map overhead scales with group
    # COUNT, so high-cardinality keys must coarsen the grouping (the
    # rows of each user still arrive whole, so semantics are identical).
    e = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .withColumn("bkt", F.pmod(F.col("user_id"), F.lit(64)))
    )

    def asof_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # Positional as-of: most recent error at-or-before the click in
        # (ts, event_id) order — identical to the window encoding.  One
        # sorted pass over the bucket, resetting state at user changes.
        pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uids = pdf["user_id"].to_numpy()
        eids = pdf["event_id"].to_numpy()
        types = pdf["event_type"].to_numpy()
        out_uid, out_click, out_err = [], [], []
        prev_uid, last_err = None, None
        for uid, eid, et in zip(uids, eids, types):
            if uid != prev_uid:
                prev_uid, last_err = uid, None
            if et == "error":
                last_err = eid
            elif et == "click":
                out_uid.append(uid)
                out_click.append(eid)
                out_err.append(last_err)
        return pd.DataFrame(
            {
                "user_id": out_uid,
                "click_id": out_click,
                "last_err_id": pd.array(out_err, dtype="Int64"),
            }
        )

    return e.groupBy("bkt").applyInPandas(
        asof_group, schema="user_id long, click_id long, last_err_id long"
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               o.o_orderdate,
               {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1999-01-01'
          AND l.l_shipdate  > TIMESTAMP '1999-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """,
    category="join",
    doc="TPC-H Q3: selective dim filter → two fact joins → agg → top-k. "
    "Catalyst pushes the segment filter into the customer scan and "
    "broadcasts the filtered customer side under AQE.",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "join_asof_forward",
    oracle="""
        SELECT user_id, click_id, next_err_id, next_err_ts
        FROM (
            SELECT user_id,
                   event_id AS click_id,
                   event_type,
                   ts,
                   first_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
                       OVER w AS next_err_id,
                   first_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
                       OVER w AS next_err_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        WHERE event_type = 'click'
          AND next_err_ts IS NOT NULL
          AND next_err_ts <= ts + INTERVAL 1 DAY
        """,
    category="join",
    doc="FORWARD as-of join (direction='forward' in pandas terms): each "
    "click matched to the NEXT error at-or-after it per user, bounded "
    "by a 1-day tolerance — the 'what broke after this action' "
    "direction.  Same union+window encoding as join_asof but with "
    "first_value(ignorenulls) over CURRENT ROW..UNBOUNDED FOLLOWING; "
    "still exactly one user_id shuffle, no join, no row "
    "multiplication, and the tolerance is a post-filter on timestamp "
    "interval arithmetic (exact cross-engine).  The two directions "
    "compose into nearest-asof by coalescing whichever side is "
    "closer.",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    err_id = F.when(F.col("event_type") == "error", F.col("event_id"))
    err_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    return (
        e.withColumn("next_err_id", F.first(err_id, ignorenulls=True).over(w))
        .withColumn("next_err_ts", F.first(err_ts, ignorenulls=True).over(w))
        .filter(
            (F.col("event_type") == "click")
            & F.col("next_err_ts").isNotNull()
            & (F.col("next_err_ts") <= F.col("ts") + F.expr("INTERVAL 1 DAY"))
        )
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            "next_err_id",
            "next_err_ts",
        )
    )


@register(
    "join_range_banded",
    oracle="""
        SELECT b.band_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM events e
        JOIN (SELECT i AS band_id, i * 7 AS lo, i * 7 + 10 AS hi
              FROM generate_series(0, 70) s(i)) b
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band_id
        """,
    category="join",
    doc="BIG-BIG range join via banding — the scale path the broadcast "
    "nested-loop of join_range_interval cannot take when both sides "
    "are large: each interval [7b, 7b+10) is EXPLODED to the fixed-"
    "width buckets it overlaps (ceil(10/7)+1 per band), each probe "
    "row computes its single bucket floor(value/7), and the join "
    "becomes an EQUI-join on the bucket key with the exact range "
    "predicate as a post-filter.  O(n+m) shuffle instead of O(n*m) "
    "compare; the bucket arithmetic is internal to the plan (the "
    "oracle states the declarative range semantics).  The plan test "
    "asserts no nested-loop join survives.  This is how interval/"
    "IP-range/geo-band joins run at 100 TB.",
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.range(0, 71).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 7).cast("double").alias("lo"),
        (F.col("id") * 7 + 10).cast("double").alias("hi"),
    )
    # Buckets of width 7 covered by [lo, hi): floor(lo/7) .. floor((hi-)/7).
    banded = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / 7).cast("int"),
                F.floor((F.col("hi") - F.lit(1e-9)) / 7).cast("int"),
            )
        ).alias("bucket"),
    )
    e = t(spark, sf_dir, "events").select(
        "value",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.floor(F.col("value") / 7).cast("int").alias("bucket"),
    )
    joined = e.join(banded, "bucket").where(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("total_cents"),
    )


@register(
    "join_asof_nearest",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'error' THEN event_id END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_id,
                   last_value(CASE WHEN event_type = 'error' THEN ts END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_ts,
                   first_value(CASE WHEN event_type = 'error' THEN event_id END
                               IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS f_id,
                   first_value(CASE WHEN event_type = 'error' THEN ts END
                               IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS f_ts
            FROM events
        )
        SELECT user_id, event_id AS click_id,
               CASE WHEN b_id IS NULL THEN f_id
                    WHEN f_id IS NULL THEN b_id
                    WHEN epoch_us(ts) - epoch_us(b_ts)
                         <= epoch_us(f_ts) - epoch_us(ts) THEN b_id
                    ELSE f_id END AS nearest_err_id
        FROM seq
        WHERE event_type = 'click'
        """,
    category="join",
    doc="Nearest-direction AS-OF join (pandas merge_asof "
    "direction='nearest'): each click pairs with the error event "
    "closest in time, backward or forward, ties to backward.  Encoded "
    "as one ordered window pass computing both the last-error-before "
    "(last ignorenulls, unbounded preceding frame) and the "
    "first-error-after (first ignorenulls, following frame), then an "
    "exact integer-microsecond distance compare — still zero joins, "
    "one shuffle on user_id, same plan family as join_asof, so the "
    "100 TB cost is identical to the backward-only variant.  Lookups "
    "in both directions share the sort.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    back = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    err_id = F.when(F.col("event_type") == "error", F.col("event_id"))
    err_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    seq = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(err_id, ignorenulls=True).over(back).alias("b_id"),
        F.last(err_ts, ignorenulls=True).over(back).alias("b_ts"),
        F.first(err_id, ignorenulls=True).over(fwd).alias("f_id"),
        F.first(err_ts, ignorenulls=True).over(fwd).alias("f_ts"),
    )
    b_gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    f_gap = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    nearest = (
        F.when(F.col("b_id").isNull(), F.col("f_id"))
        .when(F.col("f_id").isNull(), F.col("b_id"))
        .when(b_gap <= f_gap, F.col("b_id"))
        .otherwise(F.col("f_id"))
    )
    return (
        seq.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            nearest.alias("nearest_err_id"),
        )
    )


@register(
    "join_runtime_bloom_filter",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o.o_orderpriority
        """,
    category="join",
    doc="RUNTIME BLOOM-FILTER join pruning (Spark 3.5+/4): when a "
    "selective filter sits on the build side of a shuffle join, the "
    "optimizer injects a bloom_filter_agg over the build keys and a "
    "might_contain probe into the STREAM side's scan — rows that "
    "cannot join die before the shuffle, the row-level analogue of "
    "dynamic partition pruning (join_dynamic_partition_pruning) for "
    "unpartitioned data.  At 100 TB this is the difference between "
    "shuffling the whole fact table and shuffling the ~30% that can "
    "match.  Demo shape: the size thresholds are lowered inside a "
    "save/restore block (defaults gate the rewrite to 10 GB+ scans — "
    "exactly right in production, never triggered at test SF) and "
    "broadcast is disabled so the shuffle join exists; the aggregate "
    "is materialized INSIDE the block so the executed plan — pinned "
    "by tests to carry might_contain — is the bloom plan, then confs "
    "restore so no other query inherits them.  Bounded collect: at "
    "most 5 priority rows (allowlisted).",
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = t(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        li = t(spark, sf_dir, "lineitem")
        agg = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("bigint"))
                .cast("bigint")
                .alias("sum_qty"),
            )
        )
        # materialize NOW: plans are resolved at action time, so the
        # bloom rewrite only exists while the thresholds are lowered —
        # at most 5 priority rows come back (bounded collect)
        rows = agg.collect()
        return spark.createDataFrame(
            rows, "o_orderpriority string, n_items bigint, sum_qty bigint"
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
