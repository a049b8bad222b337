import sys
from pyspark.sql import SparkSession, functions as F

mode = sys.argv[1]
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
jvm = spark._jvm
jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.sql.execution.adaptive.OptimizeSkewedJoin",
    jvm.org.apache.logging.log4j.Level.DEBUG)
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
if mode in ("repart", "both"):
    fact = fact.repartition(16)
if mode in ("fat", "both"):
    fact = fact.withColumn("pad", F.sha2(F.concat_ws("-", "l_orderkey", "l_linenumber"), 512))
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
print("rows:", len(j.collect()))
plan = j._jdf.queryExecution().executedPlan().toString()
marks = [l.strip()[:120] for l in plan.splitlines() if "skew" in l.lower() or "AQEShuffleRead" in l]
print("MODE", mode, marks)
