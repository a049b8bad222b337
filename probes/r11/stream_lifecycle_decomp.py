"""VERDICT r10 task 6: decompose stream_session_timer_e2e /
stream_session_timeout_gss_e2e wall time into per-query lifecycle
setup (RocksDB store + Python stateful-worker spin-up, fixed per
query) vs data work (rows processed, linear).

Method (the r8 crossover method): run each query at sf0.001 / sf0.01 /
sf0.1 (60x row spread) in ONE session, k trials each, then fit
t = setup + rate * rows by least squares over the medians.  The
intercept is the lifecycle floor; rate * rows(sf0.1) is the data
share at bench scale.

Run:  python probes/r11/stream_lifecycle_decomp.py
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from mincemeatpy_spark.registry import load_all_queries  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
K = 3
QUERIES = ["stream_session_timer_e2e", "stream_session_timeout_gss_e2e"]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all_queries()
    rows_at = {}
    for sf in SFS:
        rows_at[sf] = spark.read.parquet(f"{sf}/events.parquet").count()
    out = {"rows": rows_at, "queries": {}}
    for name in QUERIES:
        fn = qs[name].fn
        med = {}
        for sf in SFS:
            ts = []
            for _ in range(K):
                t0 = time.time()
                fn(spark, sf).count()
                ts.append(time.time() - t0)
            med[sf] = statistics.median(ts)
            print(f"{name} {sf}: {[round(t,2) for t in ts]}", flush=True)
        xs = [rows_at[sf] for sf in SFS]
        ys = [med[sf] for sf in SFS]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        rate = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        setup = my - rate * mx
        big = rows_at[SFS[-1]]
        out["queries"][name] = {
            "medians": {sf: round(med[sf], 3) for sf in SFS},
            "setup_s": round(setup, 3),
            "rate_us_per_row": round(rate * 1e6, 3),
            "data_share_sf0.1": round(rate * big / med[SFS[-1]], 3),
            "setup_share_sf0.1": round(setup / med[SFS[-1]], 3),
        }
    print("DECOMP " + json.dumps(out))


if __name__ == "__main__":
    main()
