import time
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
# no downstream agg: pure join, then a count action
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
print("count:", j.count())
plan = j._jdf.queryExecution().executedPlan().toString()
print(plan[:4000])
