"""Probe: transformWithStateInPandas initialState warm-start."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F, types as T

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from mincemeatpy_spark.streaming.stream_ops import ensure_protobuf, events_stream
assert ensure_protobuf(spark)
spark.conf.set(
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

SF = "/root/testdata/sf0.001"
from mincemeatpy_spark.tables import t as tbl
hist = (tbl(spark, SF, "events").filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n0")))

from pyspark.sql.streaming import StatefulProcessor
import pandas as pd

class Warm(StatefulProcessor):
    def init(self, handle):
        self._n = handle.getValueState("n", "n BIGINT")

    def handleInitialState(self, key, initialState, timerValues):
        self._n.update((int(initialState["n0"].iloc[0]),))

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    def close(self):
        pass

live = events_stream(spark, SF).filter(F.col("event_id") % 2 == 1)
out = live.groupBy("user_id").transformWithStateInPandas(
    statefulProcessor=Warm(),
    outputStructType=T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType())]),
    outputMode="Update",
    timeMode="None",
    initialState=hist.groupBy("user_id"),
)
q = (out.writeStream.outputMode("update").format("memory")
     .queryName("ws").start())
q.processAllAvailable(); q.stop()
got = {r.user_id: r.n for r in spark.sql(
    "select user_id, max(n) as n from ws group by user_id").collect()}
exact = {r.user_id: r.n for r in tbl(spark, SF, "events")
         .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
print("match:", got == exact, "| got", len(got), "exact", len(exact))
bad = {k: (got.get(k), exact[k]) for k in exact if got.get(k) != exact[k]}
print("bad:", dict(list(bad.items())[:5]))
