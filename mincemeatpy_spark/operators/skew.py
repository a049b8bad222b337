"""Skew-handling operators: salting patterns for hot keys.

The reference has the same skew problem in miniature: one reduce task
per distinct key (reference mincemeat.py:327-329), so a hot key
serializes onto one worker.  Spark's hash shuffle inherits that per-key
locality — these operators show the two standard fixes, both of which
produce results identical to the unsalted plan (which is exactly what
the oracle checks):

- two-phase aggregation: aggregate on (key, salt) first, then merge the
  S partials per key — the hot key's work spreads over S tasks;
- salted join: salt the fact side, replicate the (small) dim side S
  times, join on (key, salt).

AQE's skew-join splitting handles most cases automatically (enabled in
session.py); explicit salting remains the tool for extreme single-key
skew and for aggregations, where AQE doesn't split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mincemeatpy_spark.operators._util import decsum, oracle_decsum
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t

_S = 8  # salt fan-out


@register(
    "agg_skew_two_phase",
    oracle=f"""
        SELECT l_returnflag,
               count(*) AS n,
               {oracle_decsum('l_extendedprice')} AS total
        FROM lineitem
        GROUP BY l_returnflag
        """,
    category="skew",
    doc="Two-phase salted aggregation over a 3-value key (extreme skew): "
    "partial agg on (key, salt), final merge on key.  Decimal partials "
    "re-sum exactly, so the result is identical to the direct group-by — "
    "which is what the oracle asserts.",
)
def agg_skew_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(_S)))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("ps"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("ps").cast("double").alias("total"),
    )


@register(
    "join_skew_salted",
    oracle=f"""
        SELECT d.flag_name,
               count(*) AS n,
               {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM lineitem l
        JOIN (VALUES ('A', 'returned'), ('N', 'not_returned'), ('R', 'refused'))
             AS d(l_returnflag, flag_name)
          ON l.l_returnflag = d.l_returnflag
        GROUP BY d.flag_name
        """,
    category="skew",
    doc="Salted join against a tiny dim on a 3-value (maximally skewed) "
    "key: fact rows get salt in [0,S), the dim is replicated S times via "
    "explode(sequence), and the join key becomes (key, salt) — the hot "
    "key fans out over S reducers.  Result provably equals the plain "
    "join.  (For a dim this small you'd broadcast instead; salting is "
    "for when BOTH sides are too big to broadcast and one key is hot.)",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(_S))
    )
    dim = spark.createDataFrame(
        [("A", "returned"), ("N", "not_returned"), ("R", "refused")],
        "l_returnflag string, flag_name string",
    ).withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_S - 1))))
    return (
        li.join(dim, ["l_returnflag", "salt"])
        .groupBy("flag_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "skew_key_diagnostics",
    oracle="""
        WITH counts AS (
            SELECT l_suppkey AS k, count(*) AS n
            FROM lineitem
            GROUP BY l_suppkey
        )
        SELECT count(*) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(max(n) AS BIGINT) AS max_n,
               CAST(min(n) AS BIGINT) AS min_n,
               round(CAST(max(n) AS DOUBLE)
                     / (CAST(sum(n) AS DOUBLE) / count(*)), 6) AS skew_ratio,
               CAST(sum(CASE WHEN n * (SELECT count(*) FROM counts)
                                  > 2 * (SELECT sum(n) FROM counts)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
               CAST(min(CASE WHEN n = (SELECT max(n) FROM counts)
                             THEN k END) AS BIGINT) AS hottest_key
        FROM counts
        """,
    category="skew",
    doc="Shuffle-key skew profiling — the diagnostic that decides whether "
    "a join needs salting or AQE skew splitting BEFORE it runs: per-key "
    "row counts for the intended shuffle key, then the distribution's "
    "max/mean ratio, the number of hot keys (n > 2x mean, tested as the "
    "bigint cross-multiplication n*n_keys > 2*sum_n), and the smallest "
    "key attaining the max (deterministic tie-break).  The per-key count "
    "is a two-phase aggregate, so the full lineitem never shuffles — "
    "only (key, partial-count) pairs — and the distribution rollup runs "
    "over one row per key.  This is the sampling pass a 100 TB planner "
    "runs cheaply ahead of an expensive join.",
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = W.partitionBy()
    enriched = counts.select(
        "k",
        "n",
        F.count(F.lit(1)).over(w_all).alias("n_keys"),
        F.sum("n").over(w_all).alias("sum_n"),
        F.max("n").over(w_all).alias("mx"),
    )
    return enriched.agg(
        F.max("n_keys").alias("n_keys"),
        F.max("sum_n").cast("bigint").alias("n_rows"),
        F.max("mx").cast("bigint").alias("max_n"),
        F.min("n").cast("bigint").alias("min_n"),
        F.round(
            F.max("mx").cast("double")
            / (F.max("sum_n").cast("double") / F.max("n_keys")),
            6,
        ).alias("skew_ratio"),
        F.sum(
            (F.col("n") * F.col("n_keys") > F.lit(2) * F.col("sum_n")).cast("int")
        )
        .cast("bigint")
        .alias("n_hot_keys"),
        F.min(F.when(F.col("n") == F.col("mx"), F.col("k")))
        .cast("bigint")
        .alias("hottest_key"),
    )


# Adversarial single-hot-key join fixture, derived IN-PLAN (no staged
# file): every even l_orderkey maps to join key 2, so ONE key owns ~50%
# of lineitem.  This is the worst shape a shuffle join faces — the
# reference serializes the whole hot key onto one reduce call
# (mincemeat.py:327-329); an unsalted Spark SMJ serializes it onto one
# reduce task.
_HOT_DEN = 20  # a key is hot if it owns > 1/20 of rows (≤ 20 hot keys possible)
_SKEW_JK = "CASE WHEN l_orderkey % 2 = 0 THEN 2 ELSE l_orderkey END"

_HOTKEY_ORACLE = f"""
    SELECT o.o_orderpriority,
           count(*) AS n,
           {oracle_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o
      ON ({_SKEW_JK.replace('l_orderkey', 'l.l_orderkey')}) = o.o_orderkey
    GROUP BY o.o_orderpriority
    """


def _skewed_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.withColumn(
        "jk",
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(2).cast("bigint")).otherwise(
            F.col("l_orderkey")
        ),
    )


@register(
    "join_skew_hotkey_salted",
    oracle=_HOTKEY_ORACLE,
    category="skew",
    doc="Differential (hot-key-only) salting for an adversarial skewed "
    "join: one key owns ~50% of the fact rows.  The hot set is detected "
    "IN-PLAN — per-key counts (two-phase agg, map-side combine) crossed "
    "with the 1-row total; a key is hot iff n * 20 > total, so the hot "
    "set is bounded by construction (at most 20 keys can each own more "
    "than 1/20 of the rows) and safe to broadcast at ANY corpus size.  "
    "Hot fact rows get a uniform salt in [0,S); the dim side replicates "
    "ONLY its hot keys S times (explode(sequence)), cold keys once — so "
    "the dim blowup is |hot|*S rows, not |dim|*S like blanket salting.  "
    "The (jk, salt) join then spreads the hot key over S reducers.  "
    "Result provably equals the plain join (the oracle).  This is the "
    "100 TB shape: blanket salting multiplies the whole dim; AQE skew "
    "split (see join_skew_hotkey_aqe) needs no code but only fires on "
    "multi-mapper, byte-visible skew — differential salting is the "
    "explicit fix that always works, including for aggregations.",
)
def join_skew_hotkey_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = _skewed_fact(spark, sf_dir)
    counts = fact.groupBy("jk").agg(F.count(F.lit(1)).alias("n"))
    # total derives from the per-key counts (exchange reuse shares the
    # counts shuffle) — a separate fact.agg would re-scan the fact table
    total = counts.agg(F.sum("n").alias("total"))
    hot = (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n") * _HOT_DEN > F.col("total"))
        .select("jk", F.lit(True).alias("is_hot"))
    )
    salted = fact.join(F.broadcast(hot), "jk", "left").withColumn(
        "fsalt",
        F.when(
            F.col("is_hot"),
            F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(_S)),
        ).otherwise(F.lit(0)),
    )
    o = t(spark, sf_dir, "orders")
    dim = (
        o.join(
            F.broadcast(hot.withColumnRenamed("jk", "hk")),
            o.o_orderkey == F.col("hk"),
            "left",
        )
        .withColumn(
            "dsalt",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.when(F.col("is_hot"), F.lit(_S - 1)).otherwise(F.lit(0)),
                )
            ),
        )
        .select("o_orderkey", "o_orderpriority", "dsalt")
    )
    return (
        salted.join(
            dim,
            (salted.jk == dim.o_orderkey) & (salted.fsalt == dim.dsalt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_skew_hotkey_aqe",
    oracle=_HOTKEY_ORACLE,
    category="skew",
    doc="The unsalted twin of join_skew_hotkey_salted: the same "
    "adversarial 50%%-hot-key join written as a PLAIN declarative join, "
    "leaning on the engine — AQE's OptimizeSkewedJoin splits the hot "
    "reduce partition by map-output chunks at runtime "
    "(tests/test_plans.py pins SortMergeJoin(skew=true) / AQEShuffleRead "
    "skewed actually firing on this shape).  Two engine facts this repo "
    "measured (probes/r7/): the split granularity is MAP OUTPUTS, so a "
    "single-row-group parquet scan (one effective mapper) cannot be "
    "split — at 100 TB the scan has thousands of mappers and this is "
    "moot, but it is why the plan pin repartitions first; and detection "
    "is BYTES-based post-compression, so constant-key narrow rows that "
    "LZ4 collapses ~10x can hide row-count skew — wide heterogeneous "
    "rows (the 100 TB norm) detect fine.  Where those preconditions "
    "fail, differential salting (the salted twin) is the explicit fix.",
)
def join_skew_hotkey_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = _skewed_fact(spark, sf_dir)
    o = t(spark, sf_dir, "orders")
    return (
        fact.join(o, fact.jk == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )
