"""Probe: event-time timer firing semantics in transformWithStateInPandas."""
import os, shutil, sys, time
from datetime import datetime, timezone

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F, types as T

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from mincemeatpy_spark.streaming.stream_ops import ensure_protobuf
assert ensure_protobuf(spark)

def ts(h, m=0):
    return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

base = "/tmp/probe_timer_src"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
files = [
    # batch 0: user1/user2 early, anchor 12:00 (drives wm)
    [(1, ts(10, 0)), (2, ts(10, 40)), (99, ts(12, 0))],
    # batch 1: anchor 13:00; user2 gets a NEW event (resets its timer)
    [(2, ts(12, 50)), (99, ts(13, 0))],
    # batch 2: anchor 14:00
    [(99, ts(14, 0))],
]
for i, rows in enumerate(files):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/stage{i}")
    # publish with increasing mtimes
    import glob
    part = glob.glob(f"{base}/stage{i}/part-*.parquet")[0]
    dst = f"{base}/f{i}.parquet"
    shutil.copyfile(part, dst)
    t0 = 1_700_000_000 + i * 10
    os.utime(dst, (t0, t0))
    shutil.rmtree(f"{base}/stage{i}")

spark.conf.set(
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)

from pyspark.sql.streaming import StatefulProcessor

H_MS = 30 * 60 * 1000  # 30 min session horizon

class TimerProbe(StatefulProcessor):
    def init(self, handle):
        self.handle = handle
        self._last = handle.getValueState("last", "last_ms BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd
        mx = 0
        for pdf in rows:
            mx = max(mx, int(pdf["ts"].astype("int64").max() // 1_000_000))
        import pandas as pd
        prev = self._last.get()[0] if self._last.exists() else None
        if prev is not None:
            for t_ in self.handle.listTimers():
                self.handle.deleteTimer(t_)
        last = max(mx, prev or 0)
        self._last.update((last,))
        self.handle.registerTimer(last + H_MS)
        timers = list(self.handle.listTimers())
        # debug row: negative user_id, expiry = first registered timer
        yield pd.DataFrame({
            "user_id": [-key[0]],
            "expiry_ms": [timers[0] if timers else -1],
            "wm_ms": [timerValues.getCurrentWatermarkInMs()],
        })

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd
        yield pd.DataFrame({
            "user_id": [key[0]],
            "expiry_ms": [expiredTimerInfo.getExpiryTimeInMs()],
            "wm_ms": [timerValues.getCurrentWatermarkInMs()],
        })

    def close(self):
        pass

out_schema = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("expiry_ms", T.LongType()),
    T.StructField("wm_ms", T.LongType()),
])

raw = (spark.readStream.format("parquet")
       .schema("user_id long, ts timestamp")
       .option("maxFilesPerTrigger", "1")
       .load(base))
st = (raw.withWatermark("ts", "10 minutes")
      .groupBy("user_id")
      .transformWithStateInPandas(
          statefulProcessor=TimerProbe(),
          outputStructType=out_schema,
          outputMode="Append",
          timeMode="EventTime",
      ))
q = (st.writeStream.outputMode("append").format("memory")
     .queryName("tp").start())
q.processAllAvailable()
q.stop()

def fmt(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).strftime("%H:%M")

for r in sorted(spark.sql("select * from tp").collect(),
                key=lambda r: (r.user_id, r.expiry_ms)):
    print(f"user={r.user_id} expiry={fmt(r.expiry_ms)} wm_at_fire={fmt(r.wm_ms)}")
