"""Error-bound checks for sketch operators.

The driver records rows-only results for ``oracle=None`` queries, so a
broken sketch (wrong column, wrong grouping, degenerate estimate) would
never turn a correctness row red.  These tests compute the EXACT value
each sketch approximates — in the same engine, same fixture — and assert
the estimate lands inside the sketch's documented error bound:

- ``approx_count_distinct`` is HLL++ with requested rsd = 0.02 → allow
  3x the rsd (6%) for small-range safety.
- ``percentiles_approx`` uses accuracy = 1000 → rank error <= 1/1000 of
  the group size; assert the estimate lies between the exact quantiles
  at 0.5 +/- 2/1000 (and is an actual member value, per its contract).
- ``hll_sketch_reaggregate`` is a Datasketches HLL union at default
  lgK = 12 → rse ~= 1.04 / sqrt(2^12) ~= 1.6%; allow 5%.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mincemeatpy_spark.registry import load_all_queries
from mincemeatpy_spark.tables import t

QUERIES = load_all_queries()


def test_approx_count_distinct_within_bound(spark, sf_dir):
    est = {
        r["l_returnflag"]: r["approx_parts"]
        for r in QUERIES["approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(3, 0.06 * n), (k, est[k], n)


def test_percentile_approx_within_rank_bound(spark, sf_dir):
    est = {
        r["l_returnflag"]: r["median_px"]
        for r in QUERIES["percentiles_approx"].fn(spark, sf_dir).collect()
    }
    # exact quantile envelope at p = 0.5 +/- 2/accuracy
    env = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.498)").alias("lo"),
            F.expr("percentile(l_extendedprice, 0.502)").alias("hi"),
        )
        .collect()
    )
    assert est and len(env) == len(est)
    for r in env:
        k = r["l_returnflag"]
        assert r["lo"] <= est[k] <= r["hi"], (k, est[k], r["lo"], r["hi"])


def test_hll_sketch_reaggregate_within_bound(spark, sf_dir):
    est = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["hll_sketch_reaggregate"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)
