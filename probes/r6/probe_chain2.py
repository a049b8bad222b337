"""Measure the chained-agg emission rule against per-batch wm closed forms."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from mincemeatpy_spark.streaming.stream_ops import events_stream_multibatch

SF = "/root/testdata/sf0.001"
ev = events_stream_multibatch(spark, SF)
h1 = (ev.withWatermark("ts", "10 minutes")
      .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
      .agg(F.count(F.lit(1)).alias("n")))
h6 = (h1.groupBy(F.window(F.window_time("w"), "6 hours").alias("w6"),
                 "event_type")
      .agg(F.sum("n").alias("n6"), F.count(F.lit(1)).alias("ns")))
out = h6.select(F.col("w6.start").alias("w6_start"), "event_type", "n6", "ns")
q = (out.writeStream.outputMode("append").format("memory")
     .queryName("chain2").start())
q.processAllAvailable(); q.stop()
got = {(r.w6_start, r.event_type): (r.n6, r.ns)
       for r in spark.sql("select * from chain2").collect()}

import duckdb
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
rows = con.execute("""
 WITH h1 AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, event_type,
                    count(*) AS n FROM events GROUP BY 1,2),
      h6 AS (SELECT time_bucket(INTERVAL '6 hours', w) AS w6, event_type,
                    CAST(sum(n) AS BIGINT) AS n6, count(*) AS ns
             FROM h1 GROUP BY 1,2)
 SELECT w6, event_type, n6, ns FROM h6
""").fetchall()
exact = {(r[0], r[1]): (r[2], r[3]) for r in rows}

# batch maxima for wm closed forms
b = con.execute("""
 SELECT event_id % 3 AS g, max(ts) FROM events GROUP BY 1 ORDER BY 1
""").fetchall()
print("batch maxima:", b)

missing = sorted(k for k in exact if k not in got)
extra = sorted(k for k in got if k not in exact)
diffval = sorted(k for k in got if k in exact and got[k] != exact[k])
print("missing:", len(missing), "extra:", len(extra), "diffval:", len(diffval))
from collections import Counter
print("missing by w6:", Counter(k[0] for k in missing))
for k in diffval[:10]:
    print("DIFF", k, "got", got[k], "exact", exact[k])
print("max emitted w6:", max(k[0] for k in got))
