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
env = jvm.org.apache.spark.SparkEnv.get()
tracker = env.mapOutputTracker()
ss = tracker.shuffleStatuses()
it = ss.keysIterator() if hasattr(ss, 'keysIterator') else ss.keys().iterator()
while it.hasNext():
    sid = it.next()
    st = ss.apply(sid) if hasattr(ss, 'apply') else ss.get(sid)
    try:
        # MapOutputTrackerMaster.getStatistics needs a dep; use shuffleStatuses
        arr = st.withMapStatuses(jvm.java.util.function.Function.identity()) if False else None
    except Exception:
        pass
    print("shuffle", sid)
# simpler: per shuffle, per reducer mapsizes via convertMapStatuses? use getMapSizesByExecutorId
mos = jvm.org.apache.spark.sql.execution.adaptive.ShufflePartitionsUtil
import py4j
for sid in [0,1]:
    # reflectively call the private getMapSizesForReduceId
    cls = jvm.java.lang.Class.forName("org.apache.spark.sql.execution.adaptive.ShufflePartitionsUtil$")
    m = None
    for mm in cls.getDeclaredMethods():
        if "getMapSizesForReduceId" in mm.getName():
            m = mm
    m.setAccessible(True)
    inst = cls.getField("MODULE$").get(None)
    for rid in range(32):
        sizes = m.invoke(inst, jvm.java.lang.Integer(sid), jvm.java.lang.Integer(rid))
        pys = list(sizes)
        tot = sum(pys)
        if tot > 200000:
            print(f"shuffle {sid} reducer {rid}: nmap={len(pys)} sizes={pys}")
