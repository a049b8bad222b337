"""Partition-layout invariance: the engine's oracle-exactness story rests
on order-independent arithmetic (exact int64 accumulation, fixed-point
micro-units, bit-length logs).  These tests re-run the riskiest queries —
float-adjacent aggregates and sketch-with-exact-recount shapes — under
different shuffle/partition layouts and assert bit-identical results.
A plain float sum would fail these under layout change; every registered
query must not.
"""

from __future__ import annotations

import pytest


# r14 slow lane (VERDICT r13 task 2): shuffle-partition invariance sweep (~210 s); the default
# `pytest tests/` run must fit the driver verify window — run with
# --runslow or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow

from mincemeatpy_spark.registry import load_all_queries

QUERIES = load_all_queries()

# Queries whose correctness argument depends on order-independence:
# fixed-point sums, integer moment regression, Gram partials, per-
# partition sketches with exact recount, windowed fixed-point rollups.
_RISKIEST = [
    "tpch_q1_pricing_summary",
    "udaf_weighted_avg",
    "stats_regression",
    "events_twap",
    "events_chi2_ab",
    "embedding_pca_power",
    "embedding_outliers",
    "text_zipf_fit",
    "text_surprisal_bits",
    "word_heavy_hitters",
    "pareto_customer_revenue",
    "dedup_minhash_lsh",
    "corpus_shard_bybytes",
    "winsorize_clip",
    "impute_group_mean",
    "events_value_mad_outliers",
    "multimodal_phash_neardup",
    "window_session_capped",
    "dedup_embedding_cosine",
    "similarity_ann_pq",
    # round-4 two-phase window rewrites: the bucket prefix recipe must
    # be layout-invariant (offsets + intra-bucket windows recompose the
    # identical global order under any partitioning)
    "sessions_peak_concurrency",
    "customer_rfm_segments",
    "orders_gini_coefficient",
    "events_lateness_profile",
    "events_rolling_distinct_users",
    "dedup_semdedup_clusters",
    "search_hybrid_rrf",
    "kmeans_loop_2iter",
    "dedup_clusters_lsh",
    "dedup_bloom_prefilter",
    "contrastive_pairs_mining",
    "events_bot_regularity_filter",
    # round-4 carried-signature band joins + new ops
    "dedup_simhash_pairs",
    "dedup_containment_lsh",
    "dedup_incremental_lsh",
    "word_pmi_collocations",
    "dp_noisy_counts",
    "weighted_median_two_phase",
    "graph_kcore_peel",
    "events_alert_debounce",
    "embedding_label_separation",
    "embedding_knn_label_eval",
    "similarity_mmr_rerank",
    "text_lang_confusion",
    "text_winnowing_fingerprints",
    "text_winnowing_matches",
    "events_decay_engagement",
    "supplier_concentration_hhi",
    "events_ab_cuped",
    # round-5 additions: iterative min-distances, component-representative
    # window, md5-bucketed feature counts
    "graph_sssp_weighted",
    "dedup_cluster_representatives",
    "features_hashing_trick",
    "similarity_ann_ivfpq",
    "events_ewma_daily_counts",
    "corpus_select_token_budget",
    "word_countmin_sketch",
    "text_suffix_array",
    "events_bootstrap_ci",
    "bpe_train_3merges",
    "rag_chunk_index_retrieve",
    "similarity_ivfpq_recall",
    "graph_link_prediction_jaccard",
    "events_markov_eval_holdout",
    "graph_modularity",
    "ann_index_incremental_add",
    # round-8 additions: exact-integer-moment analytics whose floats
    # are single expressions (order-independence is the design claim),
    # the planted-skew segment twin's shuffle-hash first-instance rule,
    # and the two-phase quartile histogram
    "events_interarrival_burstiness",
    "graph_degree_assortativity",
    "dedup_segments_bulk_skewed",
    "market_basket_rules",
    "survival_at_risk_table",
    "features_woe_iv",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", _RISKIEST)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    q = QUERIES[name]
    baseline = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(q.fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(q.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline)
    assert a == b, f"{name}: result depends on shuffle partition count"


def test_heavy_hitters_invariant_to_input_layout(spark, sf_dir):
    """The Misra-Gries candidate pass runs per input partition; the exact
    recount must erase any layout dependence from the final answer."""
    from pyspark.sql import functions as F

    from mincemeatpy_spark.tables import t

    docs = t(spark, sf_dir, "documents").select("text")
    outs = []
    for n_parts in (1, 5, 23):
        # Re-run the operator body over an explicitly repartitioned input.
        import mincemeatpy_spark.text.analysis as ta

        src = docs.repartition(n_parts)
        # Reuse the registered query but on a layout-forced source via a
        # temp-view shim: simplest is to call the internal pieces again.
        import pandas as pd

        def mg_partition(pdfs, _k=ta._HH_K):
            counters = {}
            for pdf in pdfs:
                for text in pdf["text"]:
                    if not text:
                        continue
                    for w in text.split():
                        if w in counters:
                            counters[w] += 1
                        elif len(counters) < _k:
                            counters[w] = 1
                        else:
                            dead = [k for k, v in counters.items() if v == 1]
                            for k in counters:
                                counters[k] -= 1
                            for k in dead:
                                del counters[k]
            yield pd.DataFrame({"word": list(counters.keys())})

        candidates = src.mapInPandas(mg_partition, "word string").distinct()
        toks = src.select(F.explode(F.split("text", r"\s+")).alias("word")).where(
            F.col("word") != ""
        )
        tot = toks.agg(F.count(F.lit(1)).alias("n"))
        out = (
            toks.join(F.broadcast(candidates), "word", "left_semi")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
            .crossJoin(F.broadcast(tot))
            .filter(F.col("freq") * ta._HH_K > F.col("n"))
            .select("word", "freq")
        )
        outs.append(sorted(tuple(r) for r in out.collect()))
    assert outs[0] == outs[1] == outs[2]
