import shutil, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from mincemeatpy_spark.streaming.stream_ops import events_stream

SF = "/root/testdata/sf0.001"
ck = "/tmp/probe_ss_ck"
shutil.rmtree(ck, ignore_errors=True)

agg = events_stream(spark, SF).groupBy("user_id").agg(
    F.count(F.lit(1)).alias("n"))
q = (agg.writeStream.outputMode("update").format("memory")
     .queryName("ssq").option("checkpointLocation", ck).start())
q.processAllAvailable(); q.stop()

st = spark.read.format("statestore").load(ck)
st.printSchema()
st.show(5, False)
print("rows:", st.count())
