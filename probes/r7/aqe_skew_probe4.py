from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
sc = spark.sparkContext
sc.setLogLevel("ERROR")
# targeted INFO on the AQE skew rule
jvm = spark._jvm
lg = jvm.org.apache.logging.log4j.core.config.Configurator
lg.setLevel("org.apache.spark.sql.execution.adaptive.OptimizeSkewedJoin",
            jvm.org.apache.logging.log4j.Level.DEBUG)
lg.setLevel("org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec",
            jvm.org.apache.logging.log4j.Level.DEBUG)

sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
print("rows:", len(j.collect()))
plan = j._jdf.queryExecution().executedPlan().toString()
for line in plan.splitlines():
    ll = line.lower()
    if "skew" in ll or "aqeshuffleread" in ll:
        print("MARK:", line.strip()[:150])
