"""Physical-plan assertions: the optimizations the engine's docstrings
promise must actually appear in the plans (pushdown, pruning, broadcast,
partial aggregation, top-k without global sort).
"""

from __future__ import annotations

from mincemeatpy_spark.registry import load_all_queries

QUERIES = load_all_queries()


def _plan(name, spark, sf_dir) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_parquet(spark, sf_dir):
    plan = _plan("projection_filter", spark, sf_dir)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThanOrEqual(l_quantity" in plan


def test_column_pruning(spark, sf_dir):
    plan = _plan("projection_filter", spark, sf_dir)
    # ReadSchema must contain only the needed columns, not all 11.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_shipdate" not in read_schema
    assert "l_tax" not in read_schema


def test_dim_join_is_broadcast(spark, sf_dir):
    plan = _plan("join_broadcast_dims", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_plan(spark, sf_dir):
    plan = _plan("join_semi", spark, sf_dir)
    assert "LeftSemi" in plan


def test_agg_is_two_phase(spark, sf_dir):
    # Catalyst's partial+final HashAggregate = the reference's
    # collectfn+reducefn split (mincemeat.py:174-182), planned automatically.
    plan = _plan("tpch_q1_pricing_summary", spark, sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan.lower()


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan("topk_global", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_partition_pruning(spark, sf_dir):
    # sink_partitioned_parquet reads back with a partition filter; the
    # scan must prune directories (PartitionFilters), not data-filter.
    df = QUERIES["sink_partitioned_parquet"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters:")[1].splitlines()[0]


def test_wordcount_codegen(spark, sf_dir):
    # The flagship's hot path must be inside whole-stage codegen; AQE only
    # shows the final (codegen-annotated) plan after execution.
    df = QUERIES["wordcount"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd operators; the partial
    # aggregate and the generate/filter must carry them.
    assert "*(1) HashAggregate" in plan
    assert "*(1) Generate" in plan or "*(1) Filter" in plan
