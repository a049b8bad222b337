"""Cost-based optimization demonstration (r8).

Catalyst's CBO (join reordering from ANALYZE'd table statistics) is an
engine property the repo relies on implicitly at cluster scale but had
never demonstrated: without statistics the optimizer keeps the user's
join order; with `spark.sql.cbo.enabled` + `joinReorder.enabled` and
`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`, a badly-ordered
star join (fact JOIN fact-sized-intermediate first, dim last) is
re-planned to filter through the small dimension first.

Runs in a subprocess: statistics live in the session catalog
(saveAsTable into the warehouse dir), and CBO flags must be set before
planning — the shared test session keeps its own config.
"""


from __future__ import annotations

import pytest


# r14 slow lane (VERDICT r13 task 2): CBO statistics/join-reorder suite (~86 s); the default
# `pytest tests/` run must fit the driver verify window — run with
# --runslow or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow

import os
import subprocess
import sys
import textwrap

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession, functions as F

    wh = tempfile.mkdtemp(prefix="cbo-wh-")
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.warehouse.dir", wh)
             .config("spark.sql.cbo.enabled", "true")
             .config("spark.sql.cbo.joinReorder.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    SF = "/root/testdata/sf0.01"
    for t in ("orders", "lineitem", "region"):
        spark.read.parquet(f"{{SF}}/{{t}}.parquet").write.mode(
            "overwrite").saveAsTable(f"cbo_{{t}}")
    for t in ("orders", "lineitem", "region"):
        spark.sql(
            f"ANALYZE TABLE cbo_{{t}} COMPUTE STATISTICS FOR ALL COLUMNS"
        )

    # stats really are in the catalog
    desc = spark.sql("DESCRIBE EXTENDED cbo_lineitem").collect()
    stats_row = [r for r in desc if r[0] == "Statistics"]
    assert stats_row and "rows" in stats_row[0][1], desc
    print("STATS_OK", stats_row[0][1])

    # a deliberately bad user order: the two big tables joined first,
    # the 5-row 'dim' (region keyed by a synthetic join key) last
    q = '''
        SELECT r.r_name, count(*) AS n
        FROM cbo_lineitem l
        JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
        JOIN cbo_region r ON o.o_custkey % 5 = r.r_regionkey
        GROUP BY r.r_name
    '''
    plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()

    # CBO's reorder decision is visible in the optimized logical plan:
    # the region relation must join BEFORE the lineitem relation joins
    # in (i.e. region appears deeper/earlier than in the written order,
    # which put it last).  Compare against a no-CBO control.
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    plan_ctl = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    print("CBO_PLAN_DIFFERS", plan != plan_ctl)

    # correctness is invariant either way
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    rows = sorted(tuple(r) for r in spark.sql(q).collect())
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    rows_ctl = sorted(tuple(r) for r in spark.sql(q).collect())
    assert rows == rows_ctl and rows, "reorder changed results"
    print("CBO_OK", len(rows))
    """
)


def test_cbo_statistics_and_join_reorder():
    r = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=_REPO)],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=600,
    )
    assert "STATS_OK" in r.stdout, (
        f"stdout={r.stdout[-2000:]}\nstderr={r.stderr[-2000:]}"
    )
    assert "CBO_OK" in r.stdout, r.stdout[-2000:]
    # the reorder itself: plans must differ between CBO on/off for the
    # deliberately mis-ordered star join
    assert "CBO_PLAN_DIFFERS True" in r.stdout, r.stdout[-2000:]


_Q9_PROBE = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.warehouse.dir",
                     tempfile.mkdtemp(prefix="cbo-q9-wh-"))
             .config("spark.sql.cbo.enabled", "true")
             .config("spark.sql.cbo.joinReorder.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from mincemeatpy_spark.tables import bootstrap_cbo_statistics
    bootstrap_cbo_statistics(spark, "/root/testdata/sf0.01")

    q = '''
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               sum(l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity) AS sum_profit
        FROM tpch_lineitem l
        JOIN tpch_orders o   ON l.l_orderkey = o.o_orderkey
        JOIN tpch_supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN tpch_nation n   ON s.s_nationkey = n.n_nationkey
        JOIN tpch_part p     ON l.l_partkey  = p.p_partkey
                                AND p.p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
    '''
    plan_on = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    plan_off = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    print("Q9_PLAN_DIFFERS", plan_on != plan_off)

    import re
    def rel_order(plan):
        seen = []
        for x in re.findall(r"tpch_(part|orders|supplier|nation|lineitem)",
                            plan):
            if x not in seen:
                seen.append(x)
        return seen
    # the user order leads lineitem-orders; with stats the optimizer
    # must NOT keep the big-x-big pair first
    print("Q9_OFF_ORDER", rel_order(plan_off)[:2])
    print("Q9_ON_REORDERED", rel_order(plan_on)[:2] != ["lineitem", "orders"])

    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    rows_on = sorted(tuple(r) for r in spark.sql(q).collect())
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    rows_off = sorted(tuple(r) for r in spark.sql(q).collect())
    # group keys exact; the profit SUM is an order-dependent float
    # (tests/test_engine_traps.py) and the join order IS what changed,
    # so compare it within relative tolerance
    keys_eq = [r[:2] for r in rows_on] == [r[:2] for r in rows_off]
    sums_eq = all(
        abs(a[2] - b[2]) <= 1e-9 * max(1.0, abs(a[2]))
        for a, b in zip(rows_on, rows_off)
    )
    print("Q9_ROWS_EQUAL", keys_eq and sums_eq and len(rows_on) > 0)
    """
)


def test_cbo_bootstrap_reorders_misordered_q9():
    """r8 judge task 7: the session/tables bootstrap
    (tables.bootstrap_cbo_statistics, flag $SPARK_GRAFT_CBO_STATS)
    feeds ANALYZE'd statistics to Catalyst, and a deliberately
    mis-ordered Q9 (lineitem x orders first, selective part dim last)
    gets re-planned — asserted as a plan diff with identical results.
    The sf1 wall-time delta is measured by probes/r9/cbo_q9_sf1.py."""
    r = subprocess.run(
        [sys.executable, "-c", _Q9_PROBE.format(repo=_REPO)],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=600,
    )
    out = r.stdout
    assert "Q9_PLAN_DIFFERS True" in out, (
        f"stdout={out[-2000:]}\nstderr={r.stderr[-2000:]}"
    )
    assert "Q9_OFF_ORDER ['lineitem', 'orders']" in out, out[-2000:]
    assert "Q9_ON_REORDERED True" in out, out[-2000:]
    assert "Q9_ROWS_EQUAL True" in out, out[-2000:]


_Q8_PROBE = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.warehouse.dir",
                     tempfile.mkdtemp(prefix="cbo-q8-wh-"))
             .config("spark.sql.cbo.enabled", "true")
             .config("spark.sql.cbo.joinReorder.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from mincemeatpy_spark.tables import bootstrap_cbo_statistics
    bootstrap_cbo_statistics(spark, "/root/testdata/sf0.01")

    # Q8's 8-table tree (the deepest in the suite) written in a
    # deliberately BAD order: the three biggest tables first
    # (lineitem x orders x customer), the selective part filter and
    # the region/nation dim chain LAST — a different topology from the
    # Q9 pin (two independent dim chains meeting at the fact + a
    # second nation role n2).
    q = '''
        SELECT year(o.o_orderdate) AS o_year,
               sum(CASE WHEN n1.n_name = 'NATION_5'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END)
               / sum(l.l_extendedprice * (1 - l.l_discount)) AS mkt_share
        FROM tpch_lineitem l
        JOIN tpch_orders o   ON o.o_orderkey = l.l_orderkey
        JOIN tpch_customer c ON c.c_custkey = o.o_custkey
        JOIN tpch_supplier s ON s.s_suppkey = l.l_suppkey
        JOIN tpch_nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN tpch_nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN tpch_region r   ON r.r_regionkey = n2.n_regionkey
                                AND r.r_name = 'AMERICA'
        JOIN tpch_part p     ON p.p_partkey = l.l_partkey
                                AND p.p_type = 'ECONOMY'
        GROUP BY o_year
    '''
    plan_on = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    plan_off = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    print("Q8_PLAN_DIFFERS", plan_on != plan_off)

    import re
    def rel_order(plan):
        seen = []
        for x in re.findall(
            r"tpch_(part|orders|supplier|nation|lineitem|customer|region)",
            plan,
        ):
            if x not in seen:
                seen.append(x)
        return seen
    print("Q8_OFF_ORDER", rel_order(plan_off)[:3])
    # with stats the optimizer must not keep the big-x-big-x-big
    # prefix the user wrote
    print(
        "Q8_ON_REORDERED",
        rel_order(plan_on)[:3] != ["lineitem", "orders", "customer"],
    )

    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    rows_on = sorted(tuple(r) for r in spark.sql(q).collect())
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    rows_off = sorted(tuple(r) for r in spark.sql(q).collect())
    keys_eq = [r[0] for r in rows_on] == [r[0] for r in rows_off]
    shares_eq = all(
        abs(a[1] - b[1]) <= 1e-9 * max(1.0, abs(a[1]))
        for a, b in zip(rows_on, rows_off)
    )
    print("Q8_ROWS_EQUAL", keys_eq and shares_eq and len(rows_on) > 0)
    """
)


def test_cbo_bootstrap_reorders_misordered_q8():
    """r9 judge task 8: a SECOND join topology pinned — Q8's 8-table
    tree (two nation roles, a region chain hanging off the customer
    side, and a selective part filter) written big-tables-first gets
    re-planned by the ANALYZE'd statistics, with identical results.
    Complements the Q9 pin (different star shape) and the synthetic
    star in test_cbo_statistics_and_join_reorder."""
    r = subprocess.run(
        [sys.executable, "-c", _Q8_PROBE.format(repo=_REPO)],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=600,
    )
    out = r.stdout
    assert "Q8_PLAN_DIFFERS True" in out, (
        f"stdout={out[-2000:]}\nstderr={r.stderr[-2000:]}"
    )
    assert "Q8_OFF_ORDER ['lineitem', 'orders', 'customer']" in out, out[-2000:]
    assert "Q8_ON_REORDERED True" in out, out[-2000:]
    assert "Q8_ROWS_EQUAL True" in out, out[-2000:]
