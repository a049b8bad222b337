import sys
from pyspark.sql import SparkSession, functions as F

factor, thresh = sys.argv[1:3] if len(sys.argv) > 2 else ("2.0", "256KB")
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", factor)
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thresh)
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
n = len(j.collect())
print("rows:", n)
plan = j._jdf.queryExecution().executedPlan().toString()
print("isFinal:", "isFinalPlan=true" in plan)
for line in plan.splitlines():
    ll = line.lower()
    if "skew" in ll or "aqeshuffleread" in ll or "sortmergejoin" in ll:
        print("MARK:", line.strip()[:150])
