"""r14 probe (VERDICT r13 task 9): re-measure the r13 fan_out REVERTS
at sf1, where the fixture stops being a single row group.

r13 measured fan_out (round-robin parallelism repartition off a
single-row-group scan) a LOSS for tpch_q1 and wordcount at sf0.1 and
reverted it.  The helper is scale-adaptive: it no-ops when the scan
already carries >= default-parallelism row groups.  At sf1 the
generated fixtures may still be few-row-group files, so two questions:
(a) does the no-op branch engage? (b) if not, does the A/B flip?

Usage: python probes/r14/fanout_sf1_ab.py [k]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F

from mincemeatpy_spark.session import get_spark
from mincemeatpy_spark.tables import fan_out, t

SF1 = os.environ.get("SOAK_BIG_DIR", "/tmp/sfscale/sf1")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("fanout-sf1-ab")

    def q1(df):
        return (
            df.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.avg("l_discount").alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    def wc(df):
        return (
            df.select(F.explode(F.split("text", r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    li_plain = t(spark, SF1, "lineitem")
    li_fan = fan_out(spark, li_plain, SF1, name="lineitem")
    docs_plain = t(spark, SF1, "documents").select("text")
    docs_fan = fan_out(spark, docs_plain, SF1)

    # (a) does the no-op branch engage at sf1?
    for name, plain, fanned in [
        ("tpch_q1", li_plain, li_fan),
        ("wordcount", docs_plain, docs_fan),
    ]:
        noop = plain is fanned or (
            plain._jdf.queryExecution().analyzed().toString()
            == fanned._jdf.queryExecution().analyzed().toString()
        )
        print(f"{name}: fan_out no-op branch engaged = {noop}", flush=True)

    cases = {
        "tpch_q1_plain": lambda: q1(li_plain),
        "tpch_q1_fanout": lambda: q1(li_fan),
        "wordcount_plain": lambda: wc(docs_plain),
        "wordcount_fanout": lambda: wc(docs_fan),
    }
    # warmup
    q1(li_plain).write.format("noop").mode("overwrite").save()
    res = {n: [] for n in cases}
    for i in range(k):
        order = list(cases) if i % 2 == 0 else list(reversed(list(cases)))
        for name in order:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            cases[name]().write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            res[name].append(sec)
            print(f"{name:20s} {sec:7.3f}s", flush=True)
    for name, xs in res.items():
        print(
            f"{name}: median {statistics.median(xs):.3f} "
            f"trials={[round(x, 3) for x in xs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
