"""Structured Streaming: stream results must equal the batch twins on
the same fixture (event-time determinism), and the custom stateful
operator must hold state across the run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mincemeatpy_spark.streaming import stream_ops
from mincemeatpy_spark.streaming.windows_batch import window_tumbling, window_session
from mincemeatpy_spark.tables import t


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return stream_ops.events_stream(spark, sf_dir)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_is_actually_streaming(events):
    assert events.isStreaming


def test_tumbling_stream_equals_batch(spark, sf_dir, events):
    stream = stream_ops.run_to_completion(
        stream_ops.tumbling_counts_stream(events), "tumbling_out"
    )
    batch = window_tumbling(spark, sf_dir).select("w_start", "event_type", "n")
    assert _rows(stream, ["w_start", "event_type", "n"]) == _rows(
        batch, ["w_start", "event_type", "n"]
    )


def test_sliding_stream_equals_batch(spark, sf_dir, events):
    from mincemeatpy_spark.streaming.windows_batch import window_sliding

    stream = stream_ops.run_to_completion(
        stream_ops.sliding_counts_stream(events), "sliding_out"
    )
    batch = window_sliding(spark, sf_dir).select("w_start", "event_type", "n")
    assert _rows(stream, ["w_start", "event_type", "n"]) == _rows(
        batch, ["w_start", "event_type", "n"]
    )


def test_session_stream_equals_batch(spark, sf_dir, events):
    stream = stream_ops.run_to_completion(
        stream_ops.session_counts_stream(events), "session_out"
    )
    batch = window_session(spark, sf_dir).select("user_id", "s_start", "n")
    assert _rows(stream, ["user_id", "s_start", "n"]) == _rows(
        batch, ["user_id", "s_start", "n"]
    )


def test_stateful_running_counts(spark, sf_dir, events):
    out = stream_ops.run_to_completion(
        stream_ops.running_counts_stateful(events), "stateful_out", mode="update"
    )
    # update-mode memory sink keeps every emission; the final row per user
    # must equal the batch count.
    final = (
        out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        t(spark, sf_dir, "events").groupBy("user_id").count()
        .withColumnRenamed("count", "n_events")
    )
    assert _rows(final, ["user_id", "n_events"]) == _rows(batch, ["user_id", "n_events"])


def test_stream_static_join(spark, sf_dir, events):
    # Stream-static join: each micro-batch joins against the static dim
    # without shuffling the static side per batch.
    static_cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = events.join(static_cust, "user_id").groupBy("c_mktsegment").count()
    out = stream_ops.run_to_completion(joined, "stream_static_out", mode="complete")

    batch = (
        t(spark, sf_dir, "events")
        .join(static_cust, "user_id")
        .groupBy("c_mktsegment")
        .count()
    )
    assert _rows(out, ["c_mktsegment", "count"]) == _rows(batch, ["c_mktsegment", "count"])


def test_foreachbatch_sink(spark, events):
    # foreachBatch: the exactly-once escape hatch for arbitrary sinks —
    # here accumulating per-batch row counts driver-side.
    seen = []

    def sink(df, epoch_id):
        seen.append((epoch_id, df.count()))

    q = events.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(n for _, n in seen) == t(spark, stream_ops_sf_dir(), "events").count()


def stream_ops_sf_dir():
    from tests.conftest import SF_DIR

    return SF_DIR


def test_watermark_drops_late_data(spark, events):
    # A watermarked append-mode aggregation finalizes windows once the
    # watermark passes; with a finite source all windows close.  Checks
    # the watermark column is wired (plan contains EventTimeWatermark).
    agg = stream_ops.tumbling_counts_stream(events, watermark="5 minutes")
    assert "eventtimewatermark" in agg._jdf.queryExecution().analyzed().toString().lower()


def test_stream_stream_interval_join(spark, sf_dir, events):
    # Stream-stream join: both sides watermarked, time-banded condition
    # so click state is evictable; result must equal the batch twin.
    out = stream_ops.run_to_completion(
        stream_ops.click_purchase_join_stream(events),
        "stream_stream_out",
        mode="append",
    )
    from mincemeatpy_spark.registry import load_all_queries

    batch = load_all_queries()["join_click_purchase_window"].fn(spark, sf_dir)
    cols = ["user_id", "click_id", "click_ts", "purchase_ts", "purchase_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_streaming_dedup_with_watermark(spark, sf_dir, events):
    # State-store dedup: dropDuplicates on the event key under a
    # watermark (bounded state); must equal batch distinct-by-key.
    dedup = events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    out = stream_ops.run_to_completion(dedup, "stream_dedup_out", mode="append")
    n_stream = out.count()
    n_batch = t(spark, sf_dir, "events").select("event_id").distinct().count()
    assert n_stream == n_batch


def _has_protobuf() -> bool:
    # transformWithStateInPandas speaks protobuf to the JVM state server;
    # the pure-Python runtime dependency may be absent in this container.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf at runtime",
)
def test_transform_with_state_matches_batch(spark, sf_dir, events):
    # Spark 4 transformWithStateInPandas must reproduce the batch
    # aggregate exactly (fixed-point running sum, order-independent).
    out = stream_ops.run_to_completion(
        stream_ops.user_value_stats_tws(events), "tws_out", mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
        for r in out.collect()
    }
    batch = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 1e6).cast("bigint")).cast("double") / 1e6).alias("tv"),
            F.max("value").alias("mx"),
        )
    )
    want = {r["user_id"]: (r["n"], r["tv"], r["mx"]) for r in batch.collect()}
    assert got == want


def test_streaming_dedup_within_watermark(spark, sf_dir, events):
    # dropDuplicatesWithinWatermark (Spark 3.5): dedup keyed on the
    # content digest, keeping state only for the watermark horizon —
    # the streaming twin of exact corpus dedup where duplicates arrive
    # within a bounded delay.  The fixture's duplicates all fall inside
    # one horizon, so the result must equal batch distinct-by-key.
    dedup = events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    out = stream_ops.run_to_completion(dedup, "stream_dedup_wm_out", mode="append")
    n_batch = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert out.count() == n_batch


def test_streaming_corpus_ingest_matches_batch(spark, sf_dir):
    # Streaming quality gate + digest dedup must keep exactly one doc
    # per surviving digest, and only quality-passing docs — compared
    # against the same two stages computed in batch.  (Which duplicate
    # of a digest survives is arrival-order-dependent in both the
    # stream and the reference's model, so compare on digests.)
    out = stream_ops.run_to_completion(
        stream_ops.corpus_ingest_stream(stream_ops.documents_stream(spark, sf_dir)),
        "corpus_ingest_out",
        mode="append",
    )
    words = F.split(F.col("text"), r"\s+")
    batch = (
        t(spark, sf_dir, "documents")
        .withColumn("n_tokens", F.size(words))
        .withColumn(
            "uniq_ratio",
            F.size(F.array_distinct(words)).cast("double") / F.size(words),
        )
        .filter((F.col("n_tokens") >= 5) & (F.col("uniq_ratio") >= 0.3))
        .select(F.md5(F.col("text").cast("binary")).alias("fp"))
        .distinct()
    )
    assert sorted(r.fp for r in out.select("fp").collect()) == sorted(
        r.fp for r in batch.collect()
    )


def test_python_datasource_stream_equals_batch(spark):
    """The custom Python data source's micro-batch stream drains the same
    keyed corpus the batch reader plans — counts must agree exactly."""
    from mincemeatpy_spark.sources.python_datasource import (
        dict_source,
        dict_source_stream,
    )

    stream = stream_ops.run_to_completion(
        dict_source_stream(spark, n=500, batch=64)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt")),
        "pyds_out",
    )
    batch = (
        dict_source(spark, n=500)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _rows(stream, ["word", "cnt"]) == _rows(batch, ["word", "cnt"])


def test_attribution_stream_matches_batch(spark, sf_dir, events):
    # Streaming last-touch attribution (stateful, per-user click state)
    # aggregated by channel must equal the batch window-based operator.
    from mincemeatpy_spark.registry import load_all_queries
    from mincemeatpy_spark.streaming.stream_ops import (
        attribution_stream,
        run_to_completion,
    )

    per_purchase = run_to_completion(
        attribution_stream(events), "attr_stream", mode="append"
    )
    got = {
        tuple(r)
        for r in per_purchase.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in load_all_queries()["attribution_last_touch"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == want


def test_alert_debounce_source_is_single_batch(spark, sf_dir, events):
    """alert_debounce_stateful's run-length state is correct across
    micro-batches only if each user's events arrive in event-time order;
    the staged file source guarantees this trivially by delivering the
    whole fixture as ONE micro-batch (single staged file, no
    maxFilesPerTrigger).  Pin that assumption: if staging ever splits
    into multiple batches, this fails loudly instead of the e2e oracle
    passing flakily on accidental batch ordering."""
    from mincemeatpy_spark.streaming import stream_ops

    stream = stream_ops.alert_debounce_stateful(events)
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("alert_single_batch_probe")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
    finally:
        q.stop()
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) == 1, (
        f"staged events source produced {len(data_batches)} data batches; "
        "alert_debounce's cross-batch ordering assumption no longer holds"
    )


def test_multibatch_source_delivers_three_batches(spark, sf_dir):
    """events_stream_multibatch must actually produce three data
    micro-batches in file order — the whole point of the cross-batch
    e2e family; if staging or maxFilesPerTrigger ever collapses them,
    those queries degrade to single-batch tests silently."""
    from mincemeatpy_spark.streaming import stream_ops

    stream = stream_ops.events_stream_multibatch(spark, sf_dir)
    q = (
        stream.groupBy("event_type")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("multibatch_probe")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
    finally:
        q.stop()
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) == 3, f"expected 3 data batches, got {len(data_batches)}"


def test_late_drop_actually_drops(spark, sf_dir):
    """stream_late_drop_e2e's oracle encodes the drop rule — but the
    demo is vacuous unless rows are really dropped.  Assert the state
    operator's numRowsDroppedByWatermark is positive on this fixture
    (batch 2 carries rows far older than the established watermark)."""
    from mincemeatpy_spark.streaming import stream_ops

    agg = stream_ops.tumbling_counts_stream(
        stream_ops.events_stream_multibatch(spark, sf_dir), watermark="10 minutes"
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("late_drop_probe")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
    finally:
        q.stop()
    dropped = sum(
        o.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for o in p.get("stateOperators", [])
    )
    assert dropped > 0, "no rows were dropped by the watermark — vacuous demo"


def test_restart_recovery_actually_restarts(spark, sf_dir):
    """stream_restart_recovery_e2e is only a recovery proof if phase 1
    committed a real but PARTIAL prefix: the phase-1 memory table must
    hold exactly file 0's rows (1/3 of the corpus by event_id % 3), and
    the restarted query's final output must hold all of them."""
    from mincemeatpy_spark.registry import load_all_queries

    out = load_all_queries()["stream_restart_recovery_e2e"].fn(spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    phase1 = spark.sql(
        "SELECT sum(n) FROM stream_restart_recovery_sink_phase1"
    ).collect()[0][0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n_file0 = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % 3 == 0)
        .count()
    )
    assert total == n_events, "restarted query lost or duplicated rows"
    assert phase1 == n_file0, (
        "phase 1 did not commit exactly file 0 — the restart demo is "
        "not exercising cross-restart state recovery"
    )


# ---------------------------------------------------------------- r6: timers,
# state types, chained stateful, foreachBatch


def test_timesplit_staging_is_monotone_and_complete(spark, sf_dir):
    """events_stream_timesplit's two files must partition the fixture
    with batch 0 strictly before batch 1 in event time — the property
    every closed-form watermark oracle over this staging leans on."""
    from mincemeatpy_spark.streaming.stream_ops import (
        _multibatch_stage_dir,
        events_stream_timesplit,
    )

    events_stream_timesplit(spark, sf_dir)  # ensure staged
    stage = _multibatch_stage_dir(sf_dir, n_files=-2)
    b0 = spark.read.parquet(str(stage / "batch-000.parquet"))
    b1 = spark.read.parquet(str(stage / "batch-001.parquet"))
    mx0 = b0.agg(F.max("ts_us")).collect()[0][0]
    mn1 = b1.agg(F.min("ts_us")).collect()[0][0]
    assert mx0 < mn1, "time-split staging must be monotone"
    n_total = t(spark, sf_dir, "events").count()
    assert b0.count() + b1.count() == n_total
    assert b0.count() > 0 and b1.count() > 0


def test_session_timer_emits_each_session_once(spark, sf_dir):
    """Append-mode timer finalization must emit every session exactly
    once — the expiry guard makes in-line supersede + stale timer
    fire un-double-emittable, pinned here directly."""
    from mincemeatpy_spark.registry import load_all_queries

    df = load_all_queries()["stream_session_timer_e2e"].fn(spark, sf_dir)
    total = df.count()
    distinct = df.select("user_id", "start_us").distinct().count()
    assert total == distinct and total > 0


def test_foreachbatch_upsert_replay_is_idempotent(spark, sf_dir):
    """The exactly-once claim: re-running the whole merge cascade over
    pre-existing snapshot versions (a replay of every batch) must
    reproduce the identical snapshot."""
    import shutil

    from mincemeatpy_spark.registry import load_all_queries
    from mincemeatpy_spark.streaming.stream_ops import fixture_stage_dir

    fn = load_all_queries()["sink_foreachbatch_upsert"].fn
    first = sorted(tuple(r) for r in fn(spark, sf_dir).collect())

    base = fixture_stage_dir(sf_dir, "foreachbatch_upsert", "mincemeatpy_febu")
    # simulate a full replay: drop the done marker AND the streaming
    # checkpoint (so every batch re-fires) but KEEP the snapshot dirs
    (base / "_DONE").unlink()
    shutil.rmtree(base / "ck", ignore_errors=True)
    second = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    assert first == second


def test_chained_aggs_withhold_unclosed_windows(spark, sf_dir):
    """Non-vacuousness of the chained-agg emission rule: the append-mode
    output must be a strict subset of the batch 6-hour rollup (the
    final, unclosed windows are withheld)."""
    from mincemeatpy_spark.registry import load_all_queries

    emitted = load_all_queries()["stream_chained_window_aggs_e2e"].fn(
        spark, sf_dir
    )
    e = t(spark, sf_dir, "events")
    all_h6 = (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(F.window(F.col("w.start"), "6 hours").alias("w6"), "event_type")
        .agg(F.count(F.lit(1)).alias("ns"))
        .count()
    )
    n_emitted = emitted.count()
    assert 0 < n_emitted < all_h6


def test_mapstate_entries_merge_across_batches(spark, sf_dir):
    """MapState sub-key merge: the e2e result must equal the batch
    group-by (count only — the full fixed-point check is the oracle's
    job; this pins the state round-trip without duckdb)."""
    from mincemeatpy_spark.registry import load_all_queries

    got = load_all_queries()["stream_mapstate_counts_e2e"].fn(spark, sf_dir)
    batch = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = sorted(tuple(r) for r in got.select("user_id", "event_type", "n").collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert g == b
