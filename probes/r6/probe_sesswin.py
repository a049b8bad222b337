import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# rows: (user, ts_sec, gap_sec). Boundary: event at t=100 with gap 10 -> end 110.
# next at exactly 110: merge or not?
rows = [
    (1, 100, 10), (1, 110, 10),          # boundary: touch exactly
    (2, 100, 10), (2, 109, 10),          # overlap: inside
    (3, 100, 10), (3, 111, 10),          # gap: beyond
    (4, 100, 30), (4, 120, 5), (4, 126, 5),  # long first gap covers later short
]
df = spark.createDataFrame(rows, "u int, s int, g int").select(
    "u", F.timestamp_seconds("s").alias("ts"),
    F.concat(F.col("g").cast("string"), F.lit(" seconds")).alias("gap"))
out = (df.groupBy("u", F.session_window("ts", F.col("gap")).alias("w"))
       .agg(F.count(F.lit(1)).alias("n"))
       .select("u", F.unix_timestamp("w.start").alias("st"),
               F.unix_timestamp("w.end").alias("en"), "n")
       .orderBy("u", "st"))
out.show(20, False)
