"""Chained windowed aggs over the TIME-MONOTONE two-batch staging."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from mincemeatpy_spark.streaming.stream_ops import events_stream_timesplit

SF = "/root/testdata/sf0.001"
ev = events_stream_timesplit(spark, SF)
h1 = (ev.withWatermark("ts", "10 minutes")
      .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
      .agg(F.count(F.lit(1)).alias("n")))
h6 = (h1.groupBy(F.window(F.window_time("w"), "6 hours").alias("w6"),
                 "event_type")
      .agg(F.sum("n").alias("n6"), F.count(F.lit(1)).alias("ns")))
out = h6.select(F.col("w6.start").alias("w6_start"), "event_type", "n6", "ns")
q = (out.writeStream.outputMode("append").format("memory")
     .queryName("chain3").start())
q.processAllAvailable(); q.stop()
got = {(r.w6_start, r.event_type): (r.n6, r.ns)
       for r in spark.sql("select * from chain3").collect()}

import duckdb
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
rows = con.execute("""
 WITH wm AS (SELECT epoch_ms(max(ts)) - 600000 AS w_ms FROM events),
 h1 AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, event_type,
               count(*) AS n FROM events GROUP BY 1,2),
 h6 AS (SELECT time_bucket(INTERVAL '6 hours', w) AS w6, event_type,
               CAST(sum(n) AS BIGINT) AS n6, count(*) AS ns
        FROM h1 GROUP BY 1,2)
 SELECT w6, event_type, n6, ns FROM h6, wm
 WHERE epoch_ms(w6 + INTERVAL 6 HOUR) <= wm.w_ms
""").fetchall()
pred = {(r[0], r[1]): (r[2], r[3]) for r in rows}

missing = sorted(k for k in pred if k not in got)
extra = sorted(k for k in got if k not in pred)
diffval = sorted(k for k in got if k in pred and got[k] != pred[k])
print("pred:", len(pred), "got:", len(got))
print("missing:", missing[:5], "extra:", extra[:5], "diff:", diffval[:5])
print("MATCH" if not (missing or extra or diffval) else "MISMATCH")
