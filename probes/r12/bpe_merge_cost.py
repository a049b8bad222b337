"""VERDICT r11 task 6: per-merge cost of the BPE training loop at
realistic depth — is cost per merge flat (or amortizing) as merges
accumulate?

Method: in one warmed session, run _bpe_train_stats at iters = 1, 2,
4, 8, 16, 32 (k=2 each, best kept — the loop is deterministic; the
second trial removes codegen noise) and report marginal seconds per
merge between consecutive depths.  Flat-or-falling marginals mean a
production ~30k-merge train is merges x constant, i.e. the loop shape
is scale-correct in merge count; vocab-scale per-round work shrinks as
merges consume symbols, so marginals should mildly FALL.

Run:  python probes/r12/bpe_merge_cost.py [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from mincemeatpy_spark.session import get_spark  # noqa: E402
from mincemeatpy_spark.text.analysis import _bpe_train_stats  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DEPTHS = [1, 2, 4, 8, 16, 32]
K = 2


def main() -> None:
    spark = get_spark("probe-r12-bpe")
    # warm: codegen + wc aggregation path
    _bpe_train_stats(spark, SF, iters=1).write.format("noop").mode(
        "overwrite"
    ).save()
    best: dict[int, float] = {}
    for d in DEPTHS:
        ts = []
        for _ in range(K):
            t0 = time.perf_counter()
            _bpe_train_stats(spark, SF, iters=d).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        best[d] = round(min(ts), 3)
        print(f"iters={d:>2}  best={best[d]}s", flush=True)
    marg = {
        f"{a}->{b}": round((best[b] - best[a]) / (b - a), 3)
        for a, b in zip(DEPTHS, DEPTHS[1:])
    }
    rec = {"sf_dir": SF, "best_total_sec": best, "marginal_sec_per_merge": marg}
    out = "/root/repo/probes/r12/bpe_merge_cost.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(marg, indent=1))
    print("->", out)


if __name__ == "__main__":
    main()
