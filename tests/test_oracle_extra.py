"""Semantic assertions beyond engine agreement.

An oracle comparison only proves Spark and DuckDB agree — if a fixture
degenerates (e.g. a NULL-planting expression that never actually yields
NULL), both engines agree on the WRONG scenario and the advertised
semantics go untested.  These tests pin the scenario itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mincemeatpy_spark.registry import load_all_queries
from mincemeatpy_spark.tables import t

QUERIES = load_all_queries()


def test_not_in_null_list_actually_contains_nulls(spark, sf_dir):
    # The planted-NULL expression must really produce NULLs on the
    # fixture, and standard NOT IN semantics then force n_matched = 0.
    orders = t(spark, sf_dir, "orders")
    n_null = orders.filter(F.col("o_orderkey") % 100 == 0).count()
    assert n_null > 0, "fixture has no o_orderkey % 100 == 0 rows; trap unarmed"
    row = QUERIES["not_in_null_semantics"].fn(spark, sf_dir).collect()[0]
    assert row["n_matched"] == 0
    assert row["n_customers"] > 0


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    # Bloom filters may over-flag, never under-flag: every true duplicate
    # must be flagged, and the filter must actually flag something.
    row = QUERIES["dedup_bloom_prefilter"].fn(spark, sf_dir).collect()[0]
    assert row["n_flagged"] >= row["n_true_dups"]
    # flagged = (true dups flagged) + false positives; no false negatives
    # means the first term is exactly n_true_dups.
    assert row["n_flagged"] == row["n_true_dups"] + row["n_false_pos"]
    assert row["n_batch"] > 0


def test_warc_reader_invariant_to_split_count(spark, sf_dir):
    # The byte-range + magic-resync framing must assign every record to
    # exactly one partition for ANY split count — including splits that
    # land mid-header, mid-payload, and mid-magic.  Prime split counts
    # maximize odd boundary placements.
    from mincemeatpy_spark.sources.python_datasource import (
        _make_warc_source_class,
        _stage_warc,
    )

    fpath, maxrec = _stage_warc(spark, sf_dir)
    spark.dataSource.register(_make_warc_source_class())

    def rows(splits: int):
        df = (
            spark.read.format("mincemeat_warc")
            .option("path", fpath)
            .option("splits", str(splits))
            .option("maxrec", str(maxrec))
            .load()
        )
        return sorted(tuple(r) for r in df.collect())

    base = rows(1)  # single range = trivially correct framing
    assert len(base) == 500
    for s in (3, 7, 17, 64):
        assert rows(s) == base, f"splits={s} lost or duplicated records"


def test_modularity_structure_beats_random(spark, sf_dir):
    # The eval is only meaningful if the components partition actually
    # scores above the degree-null hash partition (same denominator, so
    # comparing numerators suffices).
    rows = {r["part"]: r for r in QUERIES["graph_modularity"].fn(spark, sf_dir).collect()}
    assert rows["components"]["q_num"] > rows["hash8"]["q_num"], (
        "components modularity does not beat the random partition — "
        "the fixture graph has no structure for the eval to detect"
    )


def test_lsh_hot_band_cap_degrades_gracefully(spark, tmp_path):
    """Synthetic hot-band fixture (VERDICT r5 task 5): 60 byte-identical
    boilerplate documents put 60 members into each of their 4 LSH
    buckets — past the 50-member cap, so ALL their O(60^2/2) pairs must
    be skipped (and accounted for), while a distinctive 2-doc duplicate
    pair in a cold bucket survives untouched."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rare = "a distinctive sentence about catalyst optimizers and shuffles"
    rows = (
        [(i, boiler, len(boiler)) for i in range(60)]
        + [(100, rare, len(rare)), (101, rare, len(rare))]
        + [(200, "totally unrelated third text with no duplicate partner here", 60)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = QUERIES["dedup_minhash_lsh_capped"].fn(spark, str(tmp_path)).collect()
    hot = set(range(60))
    assert out, "the cold duplicate pair must survive the cap"
    assert not [r for r in out if r.d1 in hot and r.d2 in hot], (
        "hot-bucket pairs must be skipped, not enumerated"
    )
    survivor = [r for r in out if (r.d1, r.d2) == (100, 101)]
    assert survivor and survivor[0].jaccard == 1.0
    # 4 hot buckets (one per band), each skipping C(60, 2) pairs.
    assert out[0].dropped_bands == 4
    assert out[0].pairs_skipped == 4 * (60 * 59 // 2)

    # The uncapped op on the same fixture WOULD enumerate the blowup —
    # the cap is doing real work, not vacuously passing.
    full = QUERIES["dedup_minhash_lsh"].fn(spark, str(tmp_path)).collect()
    assert len([r for r in full if r.d1 in hot and r.d2 in hot]) == 60 * 59 // 2
