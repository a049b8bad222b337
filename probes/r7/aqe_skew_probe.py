"""Probe: make AQE's OptimizeSkewedJoin fire on a 50%-hot-key join at
sf0.1 and find the executed-plan marker to pin in tests."""
import time
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
j = (fact.join(orders, fact.jk == orders.o_orderkey)
     .groupBy("o_orderpriority")
     .agg(F.count(F.lit(1)).alias("n")))
t0 = time.time()
rows = j.collect()
print("rows", sorted((r.o_orderpriority, r.n) for r in rows), "t=%.2f" % (time.time()-t0))
plan = j._jdf.queryExecution().executedPlan().toString()
import re
for line in plan.splitlines():
    if "skew" in line.lower() or "AQEShuffleRead" in line:
        print("MARK:", line.strip()[:160])
print("---formatted---")
fp = j._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
for line in fp.splitlines():
    if "skew" in line.lower():
        print("FMT:", line.strip()[:160])
