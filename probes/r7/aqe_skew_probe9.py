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
fact = li.withColumn("jk", F.when(F.col("l_orderkey") % 2 == 0, F.lit(2)).otherwise(F.col("l_orderkey")))
j = fact.join(orders, fact.jk == orders.o_orderkey).select("o_orderpriority", "l_quantity")
print("rows:", len(j.collect()))

jvm = spark._jvm
gw = spark.sparkContext._gateway
cls = jvm.java.lang.Class.forName("org.apache.spark.sql.execution.adaptive.ShufflePartitionsUtil$")
m = [mm for mm in cls.getDeclaredMethods() if "getMapSizesForReduceId" in mm.getName()][0]
m.setAccessible(True)
inst = cls.getField("MODULE$").get(None)
for sid in [0, 1]:
    for rid in range(32):
        args = gw.new_array(jvm.java.lang.Object, 2)
        args[0] = jvm.java.lang.Integer(sid)
        args[1] = jvm.java.lang.Integer(rid)
        sizes = list(m.invoke(inst, args))
        if sum(sizes) > 200000:
            print(f"shuffle {sid} reducer {rid}: nmap={len(sizes)} sizes={sizes}")
