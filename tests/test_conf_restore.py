"""Session-conf hygiene for the r8 streaming state-partition pinning.

run_to_completion pins spark.sql.shuffle.partitions (= state stores per
stateful operator per micro-batch) for the duration of a finite e2e
run.  The skill notes conf leakage as a real failure class — a leaked
pin would silently shrink every later batch query's parallelism by 4x.
This test runs a stateful streaming e2e through the shared session and
asserts the conf is byte-identical after, including when the stream
RAISES mid-run (the finally path).
"""

from __future__ import annotations

import pytest

from mincemeatpy_spark.registry import load_all_queries
from mincemeatpy_spark.streaming.stream_ops import _sized_state_partitions


def test_streaming_e2e_restores_shuffle_partitions(spark, sf_dir):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    q = load_all_queries()["stream_tumbling_counts_e2e"]
    q.fn(spark, sf_dir).collect()
    after = spark.conf.get("spark.sql.shuffle.partitions")
    assert after == before, f"conf leaked: {before} -> {after}"


def test_pin_restores_on_exception(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError, match="boom"):
        with _sized_state_partitions(spark):
            assert spark.conf.get("spark.sql.shuffle.partitions") != before
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_auto_state_partitions_sizing_rule(spark, sf_dir):
    """r8 judge task 5: the state-store count auto-sizes from the plan
    and the source parquet footers — floor 8 at test scale, scaled at
    ~1 store / 15k rows/batch for Python-stateful plans, clamped to the
    session's shuffle partitions, JVM-state plans stay at the floor."""
    import mincemeatpy_spark.streaming.stream_ops as so
    from pyspark.sql import functions as F

    ev = so.events_stream_timesplit(spark, sf_dir)

    # footer-based estimate: largest staged file's rows, no data scan
    rows = so._estimate_batch_rows(ev)
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert rows is not None and 0 < rows <= total

    # JVM-state plan (window agg): floor regardless of volume
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert so._auto_state_partitions(spark, agg) == 8

    # Python-stateful plan at test scale: under 15k rows/batch => floor
    gss = so.session_timeout_gss(ev)
    assert so._auto_state_partitions(spark, gss) == 8

    # the scaling arithmetic, with the estimate pinned to sf1-like
    # volume and a 32-partition session (save/restore)
    old_est = so._estimate_batch_rows
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        so._estimate_batch_rows = lambda df: 500_000
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        assert so._auto_state_partitions(spark, gss) == 32  # clamped hi
        so._estimate_batch_rows = lambda df: 150_000
        assert so._auto_state_partitions(spark, gss) == 10
        so._estimate_batch_rows = lambda df: 0
        assert so._auto_state_partitions(spark, gss) == 8
    finally:
        so._estimate_batch_rows = old_est
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    # explicit env still wins (the crossover tooling's pin)
    import os

    os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"] = "12"
    try:
        assert so._sized_state_partitions(spark, gss).n == 12
    finally:
        del os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"]
    assert so._sized_state_partitions(spark, gss).n == 8

def test_estimate_batch_rows_survives_corrupt_parquet(spark, sf_dir, tmp_path):
    """r9 ADVICE: a zero-byte or corrupt file matching *.parquet in a
    streaming source dir must degrade the estimate (skip the file /
    return None), never raise out of _auto_state_partitions."""
    import shutil

    import mincemeatpy_spark.streaming.stream_ops as so

    # a source dir with one good staged file and one zero-byte imposter
    src = tmp_path / "staged"
    src.mkdir()
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(100).coalesce(
        1
    ).write.parquet(str(src / "good"))
    good = next((src / "good").glob("*.parquet"))
    shutil.copy(good, src / "part-0000.parquet")
    shutil.rmtree(src / "good")
    (src / "part-0001.parquet").write_bytes(b"")  # zero-byte
    (src / "part-0002.parquet").write_bytes(b"not parquet at all")

    ev = (
        spark.readStream.schema(
            spark.read.parquet(str(src / "part-0000.parquet")).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    rows = so._estimate_batch_rows(ev)  # must not raise
    assert rows == 100  # the good footer counted, corrupt ones skipped

    # all-corrupt dir: estimate degrades to None => sizing floor
    bad = tmp_path / "allbad"
    bad.mkdir()
    (bad / "x.parquet").write_bytes(b"")
    ev2 = (
        spark.readStream.schema("v INT")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(bad))
    )
    assert so._estimate_batch_rows(ev2) is None
