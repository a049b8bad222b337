import importlib.util, sys, time
import duckdb
from pyspark.sql import SparkSession

REVERSE = "--reverse" in sys.argv

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

sys.path.insert(0, "/root/repo")
from tests.oracle_utils import compare_to_oracle
qs, osql = mod.queries(), mod.oracle_sql()
names = sorted(qs, reverse=REVERSE)
ok = bad = 0
t0 = time.time()
for name in names:
    try:
        df = qs[name](spark, SF)
        if name in osql:
            compare_to_oracle(df, con, osql[name])
        else:
            df.count()
        ok += 1
        print("ok", name, flush=True)
    except Exception as e:
        bad += 1
        print("FAIL", name, repr(e)[:300], flush=True)
print(f"DONE ok={ok} fail={bad} total={len(names)} dir={'rev' if REVERSE else 'fwd'} {time.time()-t0:.0f}s")
