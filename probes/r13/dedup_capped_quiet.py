"""VERDICT r12 task 3: settle the dedup_minhash_lsh_capped watch item
(driver r12 record 3.65 s vs same-round certified 2.088 s vs r11
1.99 s) with ONE dedicated probe-certified quiet burst at bench scale
(k=6, the established method).  A certified median <= ~2.2 s closes it
as a contended-window driver sample; a certified median drifting >1.3x
from r11's 1.99 s means a real regression to bisect (git log shows no
r12/r13 change to dedup.py's capped path).

Run:  python probes/r13/dedup_capped_quiet.py
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench as B  # noqa: E402
from mincemeatpy_spark.registry import load_all_queries  # noqa: E402
from mincemeatpy_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
K = 6


def main() -> None:
    floor = B._calibrate_probe_floor()
    spark = get_spark("probe-r13-dedup-capped")
    qs = load_all_queries()
    fn = qs["dedup_minhash_lsh_capped"].fn
    fn(spark, SF).write.format("noop").mode("overwrite").save()

    def run_once() -> float:
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    rec = B._measure_one(run_once, K)
    rec["probe_floor_calibration_ms"] = floor
    rec["warm_trials_median"] = round(
        statistics.median(rec["trials"][1:]), 3
    )
    out = "/root/repo/probes/r13/dedup_capped_quiet.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("median", "iqr", "best", "trials", "probe_ok",
                       "probe_floor_ms", "cpu_probe_ms_min",
                       "cpu_probe_ms_max")}, indent=1))
    print("->", out)


if __name__ == "__main__":
    main()
