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
