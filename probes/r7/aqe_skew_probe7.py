from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
print("rows:", len(j.collect()))

jvm = spark._jvm
env = jvm.org.apache.spark.SparkEnv.get()
tracker = env.mapOutputTracker()
# find shuffle ids
for sid in range(4):
    try:
        stats = tracker.getStatistics(spark._jsc.sc().shuffleManager() and None)  # not this way
    except Exception:
        pass
# use ShufflePartitionsUtil directly per shuffle id
util = jvm.org.apache.spark.sql.execution.adaptive.ShufflePartitionsUtil
for sid in range(4):
    try:
        # getMapSizesForReduceId is private; call createSkewPartitionSpecs for every reducer
        for rid in range(32):
            spec = util.createSkewPartitionSpecs(sid, rid, 32*1024, 0.2)
            if spec.isDefined():
                n = spec.get().size()
                if n > 1:
                    print(f"shuffle {sid} reducer {rid}: split into {n}")
    except Exception as e:
        print(f"shuffle {sid}: {str(e)[:100]}")
