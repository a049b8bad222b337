"""CBO follow-through (r8 judge task 7): does ANALYZE-driven join
reordering measurably improve a mis-ordered TPC-H Q9 at sf1?

Re-runnable:  python probes/r9/cbo_q9_sf1.py [sf_dir]

Protocol: one session per regime (CBO flags are plan-time), broadcast
autodetection DISABLED so join ORDER is the lever under test (the same
regime tests/test_cbo.py pins at sf0.01 — with broadcast on, AQE hides
order mistakes behind BroadcastHashJoins at these fixture sizes; at
100 TB the big-side joins are exactly the ones broadcast cannot save).
The query is Q9's star shape written in a deliberately BAD user order:
lineitem JOIN orders first (big x big), the selective %red% part dim
LAST.  With statistics, joinReorder moves the selective dims in front;
without, Catalyst keeps the user's order.  Results must be identical.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"

Q9_BAD_ORDER = """
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           sum(l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity) AS sum_profit
    FROM tpch_lineitem l
    JOIN tpch_orders o   ON l.l_orderkey = o.o_orderkey
    JOIN tpch_supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN tpch_nation n   ON s.s_nationkey = n.n_nationkey
    JOIN tpch_part p     ON l.l_partkey  = p.p_partkey
                            AND p.p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
"""


def run(reorder: bool):
    import tempfile

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName(f"cbo-q9-{reorder}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", str(reorder).lower())
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="cbo-q9-")
        )
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mincemeatpy_spark.tables import bootstrap_cbo_statistics

    t0 = time.perf_counter()
    bootstrap_cbo_statistics(spark, SF)
    t_analyze = time.perf_counter() - t0

    plan = spark.sql(Q9_BAD_ORDER)._jdf.queryExecution().optimizedPlan().toString()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.sql(Q9_BAD_ORDER).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    rows = sorted(tuple(r)[:2] for r in spark.sql(Q9_BAD_ORDER).collect())
    n = len(rows)
    spark.stop()
    return plan, sorted(times)[1], t_analyze, n, rows


if __name__ == "__main__":
    plan_off, t_off, _, n_off, rows_off = run(reorder=False)
    plan_on, t_on, t_an, n_on, rows_on = run(reorder=True)
    print(f"plan_differs={plan_on != plan_off}")
    print(f"groups_equal={rows_on == rows_off} n={n_on}")
    print(
        f"median_sec reorder_off={t_off:.2f} reorder_on={t_on:.2f} "
        f"speedup={t_off / t_on:.2f}x analyze_cost={t_an:.1f}s"
    )
    # where did the %red% part join land?
    for tag, plan in (("off", plan_off), ("on", plan_on)):
        order = [
            ln.count(" ") // 3
            for ln in plan.splitlines()
            if "tpch_part" in ln or "tpch_orders" in ln
        ]
        import re

        names = re.findall(r"tpch_(part|orders|supplier|nation|lineitem)", plan)
        seen = []
        for x in names:
            if x not in seen:
                seen.append(x)
        print(f"relation_order_{tag}={seen}")
