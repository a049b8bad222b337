"""r14 probe (VERDICT r13 task 7): shorten the BPE loop's SERIAL path.

The r13 negative result proved the 32 stats aggregates execute
concurrently at collection — the cost is NOT the parallel tail.  The
remaining serial path is the per-round truncate_eager: each round runs
a dedicated materialization job (window rewrite -> store blocks) driven
serially from Python, then the next round's broadcast-top job reads the
blocks.  Hypothesis: truncate_lazy keeps the same checkpoint chain but
defers every materialization into the consuming jobs (the broadcast
futures chain them), removing 32 Python-driven job barriers while the
computed work is identical.

A/B: interleaved same-session runs of bpe_train_32merges, eager vs
lazy-patched, noop sink, plus a value-hash equality check.

Usage: python probes/r14/bpe_lazy_checkpoint_ab.py [k]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import mincemeatpy_spark.text.analysis as A
from mincemeatpy_spark.lineage import truncate_eager, truncate_lazy
from mincemeatpy_spark.session import get_spark


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bpe-lazy-ab")

    def run(mode: str) -> float:
        A.truncate_eager = truncate_lazy if mode == "lazy" else truncate_eager
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        A.bpe_train_32merges(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # value equality first (cheap at sf0.01)
    sf_small = "/root/testdata/sf0.01"
    A.truncate_eager = truncate_eager
    rows_e = sorted(map(tuple, A.bpe_train_32merges(spark, sf_small).collect()))
    A.truncate_eager = truncate_lazy
    rows_l = sorted(map(tuple, A.bpe_train_32merges(spark, sf_small).collect()))
    A.truncate_eager = truncate_eager
    assert rows_e == rows_l, "lazy checkpointing changed the result!"
    print(f"value check: {len(rows_e)} rows identical at sf0.01", flush=True)

    # warmup
    run("eager")
    res: dict[str, list[float]] = {"eager": [], "lazy": []}
    for i in range(k):
        for mode in ("eager", "lazy") if i % 2 == 0 else ("lazy", "eager"):
            sec = run(mode)
            res[mode].append(sec)
            print(f"{mode:6s} {sec:7.2f}s", flush=True)
    A.truncate_eager = truncate_eager
    for mode, xs in res.items():
        print(
            f"{mode}: median {statistics.median(xs):.2f} "
            f"trials={[round(x, 2) for x in xs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
