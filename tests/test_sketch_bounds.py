"""Error-bound checks for sketch operators.

The registered sketch queries are BOUND ASSERTIONS (exact value +
``within_bound`` boolean, oracle-gated) — a broken sketch goes red in
the driver gate.  These tests keep the TIGHTER local bounds by
recomputing the raw estimates inline, and assert the registered
queries' own ``within_bound`` never flaps at the local fixture scales:

- ``approx_count_distinct`` is HLL++ with requested rsd = 0.02 → allow
  3x the rsd (6%) for small-range safety (registered bound: 10% + 10).
- ``percentiles_approx`` uses accuracy = 1000 → rank error <= 1/1000 of
  the group size; assert the estimate lies between the exact quantiles
  at 0.5 +/- 2/1000 (registered bound: +/- 5/1000).
- ``hll_sketch_reaggregate`` is a Datasketches HLL union at default
  lgK = 12 → rse ~= 1.04 / sqrt(2^12) ~= 1.6%; allow 5% (registered
  bound: 10% + 10).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mincemeatpy_spark.registry import load_all_queries
from mincemeatpy_spark.tables import t

QUERIES = load_all_queries()


def _assert_registered_bound_true(spark, sf_dir, name):
    rows = QUERIES[name].fn(spark, sf_dir).collect()
    assert rows, name
    assert all(r["within_bound"] for r in rows), (name, rows)


def test_approx_count_distinct_within_bound(spark, sf_dir):
    _assert_registered_bound_true(spark, sf_dir, "approx_count_distinct")
    li = t(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("est"),
            F.countDistinct("l_partkey").alias("n"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["est"] - r["n"]) <= max(3, 0.06 * r["n"]), (
            r["l_returnflag"],
            r["est"],
            r["n"],
        )


def test_percentile_approx_within_rank_bound(spark, sf_dir):
    _assert_registered_bound_true(spark, sf_dir, "percentiles_approx")
    # exact quantile envelope at p = 0.5 +/- 2/accuracy
    rows = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("est"),
            F.expr("percentile(l_extendedprice, 0.498)").alias("lo"),
            F.expr("percentile(l_extendedprice, 0.502)").alias("hi"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r["lo"] <= r["est"] <= r["hi"], (
            r["l_returnflag"],
            r["est"],
            r["lo"],
            r["hi"],
        )


def test_hll_sketch_reaggregate_within_bound(spark, sf_dir):
    _assert_registered_bound_true(spark, sf_dir, "hll_sketch_reaggregate")
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    est = {
        r["event_type"]: r["est"]
        for r in daily.groupBy("event_type")
        .agg(
            F.expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").alias(
                "est"
            )
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)


def test_table_sample_within_bound(spark, sf_dir):
    _assert_registered_bound_true(spark, sf_dir, "table_sample")
