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
