"""Probe: does an event-time timer fire when wm == expiry exactly?

user1 timer at 10:30 (10:00 + 30m).  Anchors drive wm to exactly 10:30
in batch 2 (anchor 10:40, delay 10m), then 10:50 in batch 3.  If the
fire row shows wm_at_fire == 10:30 the rule is non-strict (wm >= expiry);
if 10:50, strict (wm > expiry).
"""
import os, shutil, sys, glob
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

base = "/tmp/probe_timer_bsrc"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
files = [
    [(1, ts(10, 0)), (99, ts(10, 20))],   # b0: timer1 -> 10:30; wm_next=10:10
    [(99, ts(10, 39))],                   # b1: wm during = 10:10; wm_next=10:29
    [(99, ts(10, 40))],                   # b2: wm during = 10:29; wm_next=10:30
    [(99, ts(11, 0))],                    # b3: wm during = 10:30 == expiry?
    [(99, ts(12, 0))],                    # b4: wm during = 10:50 > expiry
]
for i, rows in enumerate(files):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/stage{i}")
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

H_MS = 30 * 60 * 1000

class TimerProbe(StatefulProcessor):
    def init(self, handle):
        self.handle = handle
        self._last = handle.getValueState("last", "last_ms BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd
        mx = 0
        for pdf in rows:
            mx = max(mx, int(pdf["ts"].astype("int64").max() // 1_000_000))
        if key[0] == 1 and not self._last.exists():
            self._last.update((mx,))
            self.handle.registerTimer(mx + H_MS)
        yield pd.DataFrame({"user_id": [-key[0]], "expiry_ms": [mx],
                            "wm_ms": [timerValues.getCurrentWatermarkInMs()]})

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
     .queryName("tb").start())
q.processAllAvailable()
q.stop()

def fmt(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).strftime("%H:%M")

for r in sorted(spark.sql("select * from tb where user_id > 0").collect(),
                key=lambda r: (r.user_id, r.expiry_ms)):
    print(f"FIRE user={r.user_id} expiry={fmt(r.expiry_ms)} "
          f"wm_at_fire={fmt(r.wm_ms)}")
