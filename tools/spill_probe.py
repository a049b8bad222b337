"""Spill-to-disk survival probe (r7 judge task 2).

SURVEY §4.2 names spilling as a built-in the reference lacks — the
reference's TaskManager merges every reduce input in master RAM
(reference mincemeat.py:344-347), so working set > RAM is fatal.  Spark
external-sorts and spills; this probe PROVES it on this engine's own
queries instead of arguing it: run shuffle/sort/window-heavy queries in
a deliberately memory-starved session, assert each one (a) actually
spilled (memory+disk spill bytes from the AppStatusStore stage metrics)
and (b) still HASH-MATCHES its DuckDB oracle — correctness survives the
memory cliff, performance degrades gracefully.

Run it in a subprocess so the starved heap doesn't infect other work:

    SPARK_DRIVER_MEMORY=1g python tools/spill_probe.py \
        --sf-dir /tmp/sfscale/sf1 --fraction 0.15 --partitions 4 \
        window_lag_lead window_session tpch_q21_waiting_suppliers

(driver memory = executor memory in local mode, so it must be set via
the env var before the JVM starts).  Prints one JSON line per query
plus a SPILL_PROBE_OK / SPILL_PROBE_FAIL verdict.  The pytest wrapper
(tests/test_spill.py) drives a fast sf0.1 configuration; the sf1 run
above is the soak configuration recorded in NOTES_r08.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _spill_totals(sc) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all stages,
    read from the live AppStatusStore (works with the UI disabled)."""
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    mem = disk = 0
    it = stages.iterator()
    while it.hasNext():
        sd = it.next()
        mem += sd.memoryBytesSpilled()
        disk += sd.diskBytesSpilled()
    return mem, disk


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/tmp/sfscale/sf1")
    ap.add_argument("--fraction", default="0.15")
    ap.add_argument("--partitions", default="4")
    ap.add_argument("--cores", default="4")
    ap.add_argument(
        "--require-disk",
        action="store_true",
        help="also require diskBytesSpilled > 0 (not just memory spill)",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from mincemeatpy_spark.registry import load_all_queries
    from tests.oracle_utils import compare_to_oracle

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", args.partitions)
        # starve execution memory: this is the knob that turns "fits in
        # RAM" into "must spill" without changing any query
        .config("spark.memory.fraction", args.fraction)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = load_all_queries()
    ok = True
    for name in args.queries:
        q = qs[name]
        m0, d0 = _spill_totals(spark.sparkContext)
        t0 = time.perf_counter()
        df = q.fn(spark, args.sf_dir)
        err = None
        try:
            compare_to_oracle(df, con, q.oracle)
        except Exception as e:  # noqa: BLE001
            err = str(e)[:300]
            ok = False
        sec = round(time.perf_counter() - t0, 1)
        m1, d1 = _spill_totals(spark.sparkContext)
        rec = {
            "query": name,
            "sec": sec,
            "mem_spilled": m1 - m0,
            "disk_spilled": d1 - d0,
            "oracle_equal": err is None,
            "err": err,
        }
        spilled = rec["mem_spilled"] > 0 and (
            rec["disk_spilled"] > 0 or not args.require_disk
        )
        if not spilled:
            rec["err"] = rec["err"] or "query did not spill"
            ok = False
        print(json.dumps(rec), flush=True)
    print("SPILL_PROBE_OK" if ok else "SPILL_PROBE_FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
