from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
print("rows:", len(j.collect()))
qe = j._jdf.queryExecution()
plan = qe.executedPlan().toString()
for line in plan.splitlines():
    ll = line.lower()
    if "skew" in ll or "aqeshuffleread" in ll:
        print("MARK:", line.strip()[:150])
# walk the final plan for ShuffleQueryStageExec mapStats
sq = spark._jvm.org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
def walk(node, depth=0):
    name = node.getClass().getSimpleName()
    if name == "ShuffleQueryStageExec":
        ms = node.mapStats()
        if ms.isDefined():
            sizes = list(ms.get().bytesByPartitionId())
            nz = [s for s in sizes if s > 0]
            print("STAGE sizes: n=%d max=%d median~%d total=%d" % (
                len(nz), max(nz), sorted(nz)[len(nz)//2], sum(nz)))
    it = node.children().iterator()
    while it.hasNext():
        walk(it.next(), depth+1)
walk(qe.executedPlan())
