import shutil, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from mincemeatpy_spark.streaming.stream_ops import (
    ensure_protobuf, events_stream, user_type_counts_mapstate)
assert ensure_protobuf(spark)

SF = "/root/testdata/sf0.001"
ck = "/tmp/probe_ss_tws_ck"
shutil.rmtree(ck, ignore_errors=True)

st = user_type_counts_mapstate(events_stream(spark, SF))
q = (st.writeStream.outputMode("update").format("noop")
     .option("checkpointLocation", ck).start())
q.processAllAvailable(); q.stop()

r = (spark.read.format("statestore")
     .option("stateVarName", "by_type").load(ck))
r.printSchema()
r.show(5, False)
print("rows:", r.count())
