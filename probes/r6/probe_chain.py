"""Probe: chained windowed aggs (multiple stateful operators) in append mode."""
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
h6 = (h1.groupBy(F.window(F.window_time("w"), "6 hours").alias("w6"), "event_type")
      .agg(F.sum("n").alias("n6"), F.count(F.lit(1)).alias("n_subwindows")))
out = h6.select(F.col("w6.start").alias("w6_start"), "event_type", "n6",
                "n_subwindows")

q = (out.writeStream.outputMode("append").format("memory")
     .queryName("chain").start())
q.processAllAvailable(); q.stop()

res = spark.sql("select * from chain order by w6_start, event_type")
res.show(10, False)
print("rows:", res.count())

# ground truth for interpretation
import duckdb
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
print(con.execute("""
 WITH h1 AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, event_type,
                    count(*) AS n FROM events GROUP BY 1,2),
      h6 AS (SELECT time_bucket(INTERVAL '6 hours', w) AS w6, event_type,
                    sum(n) AS n6, count(*) AS ns FROM h1 GROUP BY 1,2)
 SELECT count(*), min(w6), max(w6) FROM h6
""").fetchall())
print(con.execute("SELECT max(ts) FROM events").fetchall())
