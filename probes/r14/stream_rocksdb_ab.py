"""r14 probe (VERDICT r13 task 3): attack the streaming lifecycle floor
at the store-commit layer.

The r11 decomposition pinned a 7.5/4.2 s per-query intercept (Python
stateful-worker spin-up + RocksDB lifecycle + micro-batch barriers) for
the transformWithState e2e twins.  The store-count knob is exhausted
(8 -> 1 saved <0.7 s, r11).  Two documented RocksDB provider knobs
remain that change HOW MUCH WORK each per-batch store commit does,
without touching results:

  * changelogCheckpointing.enabled=true — commit appends a changelog
    instead of snapshotting the full store every batch (snapshots move
    to background maintenance).
  * trackTotalNumberOfRows=false — skips the per-put/merge get() that
    maintains the numRows metric.

Interleaved same-session A/B over the two tws e2e queries + the
applyInPandasWithState stateful query, k trials each, memory sink via
the queries' own run_to_completion path (same timing methodology as the
bench).  Values are asserted identical across arms.

Usage: python probes/r14/stream_rocksdb_ab.py [k]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from mincemeatpy_spark.registry import load_all_queries
from mincemeatpy_spark.session import get_spark

CONFS = {
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows": "false",
}
QUERIES = [
    "stream_user_stats_tws_e2e",
    "stream_session_timeout_gss_e2e",
    "stream_stateful_counts_e2e",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-rocksdb-ab")
    qs = load_all_queries()

    def set_arm(arm: str) -> None:
        for c, v in CONFS.items():
            if arm == "B":
                spark.conf.set(c, v)
            else:
                spark.conf.unset(c)

    def run(name: str, arm: str):
        set_arm(arm)
        t0 = time.perf_counter()
        df = qs[name].fn(spark, sf_dir)
        rows = sorted(map(tuple, df.collect()))
        return time.perf_counter() - t0, rows

    for name in QUERIES:
        # warmup + value check
        _, rows_a = run(name, "A")
        _, rows_b = run(name, "B")
        assert rows_a == rows_b, f"{name}: arm B changed the result!"
        res: dict[str, list[float]] = {"A": [], "B": []}
        for i in range(k):
            order = ("A", "B") if i % 2 == 0 else ("B", "A")
            for arm in order:
                sec, _ = run(name, arm)
                res[arm].append(sec)
                print(f"{name} {arm} {sec:7.2f}s", flush=True)
        for arm, xs in res.items():
            print(
                f"{name} {arm}: median {statistics.median(xs):.2f} "
                f"trials={[round(x, 2) for x in xs]}",
                flush=True,
            )
    set_arm("A")


if __name__ == "__main__":
    main()
