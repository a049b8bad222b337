import sys, time
sys.path.insert(0, "/root/repo")
from mincemeatpy_spark.session import get_spark
from mincemeatpy_spark.registry import load_all_queries

spark = get_spark("diag-seg")
qs = load_all_queries()
for sf in ["/root/testdata/sf0.1", "/tmp/sfscale/sf1"]:
    df = qs["dedup_segments_bulk"].fn(spark, sf)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    print(sf, f"{dt:.2f}s", "joins:", joins[:5], "exchanges:", plan.count("Exchange"))
