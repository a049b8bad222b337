"""VERDICT r11 task 5: settle the pipeline_training_corpus committed-
median drift (1.69 -> 2.17 s over r10/r11 vs quietwin 1.505 s) the way
the suffix array was settled in r11 — ONE dedicated probe-stamped quiet
burst at bench scale.

Method: warm the session, then k=6 trials of the query at sf0.1 with
the bench's own host telemetry (fixed-work CPU probe + steal ticks)
around every trial.  A quiet-certified median <= ~1.7 s closes the
question as host noise; a quiet-certified median near 2.2 s would mean
a real regression to bisect.

Run:  python probes/r12/pipeline_corpus_quiet.py
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
    spark = get_spark("probe-r12-corpus")
    qs = load_all_queries()
    fn = qs["pipeline_training_corpus"].fn
    # warmup (codegen + page cache), not recorded
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
    out = "/root/repo/probes/r12/pipeline_corpus_quiet.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("median", "iqr", "best", "trials", "probe_ok",
                       "probe_floor_ms", "cpu_probe_ms_min",
                       "cpu_probe_ms_max")}, indent=1))
    print("->", out)


if __name__ == "__main__":
    main()
