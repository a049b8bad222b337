"""Quick A/B timing of named queries with the bench's methodology
(noop sink, local[$SPARK_GRAFT_CPUS], k trials, median) — for the r13
optimization round's inner loop.  NOT the driver contract; bench.py
remains the instrument of record.

Usage: python tools/time_queries.py [-k N] name [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    k = 3
    if args and args[0] == "-k":
        k = int(args[1])
        args = args[2:]

    from mincemeatpy_spark.registry import load_all_queries
    from mincemeatpy_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    queries = load_all_queries()
    # same warmup as bench.py
    queries["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    for name in args:
        q = queries[name]
        trials = []
        for _ in range(k):
            # r14: same trial isolation as bench.py — no cross-trial
            # reuse of cached intermediates via canonical-plan match.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
        med = statistics.median(trials)
        print(
            f"{med:8.3f}  {name}  trials="
            + ",".join(f"{t:.3f}" for t in trials),
            flush=True,
        )


if __name__ == "__main__":
    main()
