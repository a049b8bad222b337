"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes fully (noop sink — JVM-side materialization, no
driver collect) on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mincemeatpy_spark.registry import load_all_queries
from mincemeatpy_spark.session import get_spark

# Representative spread: scan+agg, joins (broadcast-heavy Q9 and
# decorrelated Q21 included), windows, text, dedup/LSH, similarity,
# sessionization, JSON, and the fused corpus-prep pipeline.
HEADLINE = [
    "wordcount",
    "tpch_q1_pricing_summary",
    "join_inner",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "join_asof",
    "window_running_sum",
    "window_session",
    "json_extract_agg",
    "dedup_minhash_lsh",
    "similarity_topk",
    "pipeline_training_corpus",
    "text_dup_ngram_fraction",
    "dedup_decontaminate",
    "bitmap_distinct_users",
]

# Heavy families added after the HEADLINE list froze (r5-r6).  HEADLINE
# stays untouched for cross-round comparability; these get their own
# wall-time guard so regressions in the new families are visible
# round-over-round (VERDICT r5 task 6).
EXTENDED = [
    "text_suffix_array",
    "similarity_ann_ivfpq",
    "bpe_train_3merges",
    "stream_restart_recovery_e2e",
    "dedup_minhash_lsh_capped",
    "stream_stream_full_outer_join_e2e",
    "multimodal_decode_audio_real",
    "stream_session_timer_e2e",
    "stream_chained_window_aggs_e2e",
    "lm_doc_score_kn",
    "stream_session_timeout_gss_e2e",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("mincemeatpy-bench")

    queries = load_all_queries()

    if "--all" in sys.argv:
        # Diagnostic mode: single-run timing of EVERY registered query,
        # slowest first (stderr table; not the driver's JSON contract).
        queries["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        times = {}
        for name, q in queries.items():
            t0 = time.perf_counter()
            try:
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[name] = round(time.perf_counter() - t0, 2)
            except Exception as ex:  # noqa: BLE001
                times[name] = f"ERROR {type(ex).__name__}"
        for name, sec in sorted(
            times.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9)
        ):
            print(f"{sec:>8}  {name}", file=sys.stderr)
        return

    # Warm up the JVM (classloading, codegen compiler) and the page cache
    # so per-query timings measure the queries, not startup.
    queries["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Best of 3 runs per query: the first run of a shape pays one-off JIT/
    # codegen compilation (seconds of C2 time on cold shapes), which is
    # startup cost, not query cost — a long-running cluster never repays
    # it.  Later runs measure the steady state we actually optimize; three
    # samples also ride out noisy-neighbor CPU contention on shared hosts
    # (observed 2x wall-clock swings between otherwise identical runs).
    def best_of(names: list[str], runs: int) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            q = queries[name]
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        return out

    timings = best_of(HEADLINE, 3)
    # Extended list rides along in the same JSON line (extra keys; the
    # headline metric/value stay the stable cross-round contract).
    # best-of-2: these are guards against structural regressions, not
    # the tuned headline — one repeat absorbs codegen compile.
    extended = {} if "--no-extended" in sys.argv else best_of(EXTENDED, 2)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extended": extended,
                "extended_total_sec": round(sum(extended.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
