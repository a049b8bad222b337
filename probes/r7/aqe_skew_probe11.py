from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(f"{sf}/lineitem.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey"))).repartition(16)
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
print("rows:", len(j.collect()))
# count rows per jk partition expectation
print("jk=2 rows:", fact.filter(F.col("jk")==2).count())

jvm = spark._jvm
gw = spark.sparkContext._gateway
cls = jvm.java.lang.Class.forName("org.apache.spark.sql.execution.adaptive.ShufflePartitionsUtil$")
m = [mm for mm in cls.getDeclaredMethods() if "getMapSizesForReduceId" in mm.getName()][0]
m.setAccessible(True)
inst = cls.getField("MODULE$").get(None)
for sid in [0, 1, 2]:
    try:
        tot_by_r = []
        for rid in range(32):
            args = gw.new_array(jvm.java.lang.Object, 2)
            args[0] = jvm.java.lang.Integer(sid)
            args[1] = jvm.java.lang.Integer(rid)
            sizes = list(m.invoke(inst, args))
            tot_by_r.append((sum(sizes), len([s for s in sizes if s>0])))
        print(f"shuffle {sid}: nred={len(tot_by_r)} max={max(tot_by_r)} top3={sorted(tot_by_r, reverse=True)[:3]}")
    except Exception as e:
        print(f"shuffle {sid}: gone {str(e)[:60]}")
