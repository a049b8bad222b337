"""Event-time window operators (batch form, stream-equivalent).

The reference is strictly batch — one-shot job, no streaming of any kind
(reference mincemeat.py:294-297, 335-337; SURVEY.md §2b) — so this whole
family is capability the rebuild ADDS.  Each operator here is the batch
expression of a Structured Streaming aggregation; the streaming forms
(readStream + watermark + the same groupBy) live in
``streaming.stream_ops`` and are asserted equal to these in
tests/test_streaming.py.  That equality is the point: event-time windows
are deterministic functions of the data, not of arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mincemeatpy_spark.operators._util import decsum, oracle_decsum
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "window_tumbling",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts)                   AS w_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS w_end,
               event_type,
               count(*)                    AS n,
               {oracle_decsum('value')}    AS total
        FROM events
        GROUP BY 1, 2, 3
        """,
    category="streaming",
    doc="Tumbling 1-hour event-time windows: F.window(ts, '1 hour') — in "
    "streaming mode the identical groupBy runs incrementally with a "
    "watermark bounding state.",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), decsum(F.col("value")).alias("total"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "window_sliding",
    oracle="""
        SELECT w_start, event_type, count(*) AS n
        FROM (
            SELECT time_bucket(INTERVAL '15 minutes', ts)
                       - k * (INTERVAL '15 minutes') AS w_start,
                   event_type
            FROM events, (SELECT unnest(generate_series(0, 3)) AS k)
        )
        GROUP BY w_start, event_type
        """,
    category="streaming",
    doc="Sliding windows (1 h size / 15 min slide): every event lands in "
    "size/slide = 4 overlapping windows.  The oracle materializes the "
    "same replication explicitly — which is also exactly how Spark plans "
    "it (explode over window instances).",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


@register(
    "window_session",
    oracle=f"""
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM gaps
        )
        SELECT user_id,
               min(ts)                          AS s_start,
               max(ts) + INTERVAL 10 MINUTE     AS s_end,
               count(*)                         AS n,
               {oracle_decsum('value')}         AS total
        FROM sess
        GROUP BY user_id, sid
        """,
    category="streaming",
    doc="Session windows (10-min gap) per user via session_window() — the "
    "oracle is the classic gaps-and-islands encoding, proving the "
    "semantics: a session ends when the next event is >= gap away; "
    "session end = last event + gap.",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), decsum(F.col("value")).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
            "total",
        )
    )


@register(
    "stateful_user_stats",
    oracle="""
        SELECT user_id,
               count(*)                 AS n_events,
               min(ts)                  AS first_ts,
               max(ts)                  AS last_ts,
               max(value)               AS max_value,
               count(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY user_id
        """,
    category="streaming",
    doc="Arbitrary per-key stateful computation via applyInPandas (batch "
    "twin of applyInPandasWithState — same grouping, same per-key pandas "
    "frame; the streaming form in stream_ops adds a state handle and "
    "timeouts).",
)
def stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf.user_id.iloc[0]],
                "n_events": [len(pdf)],
                "first_ts": [pdf.ts.min()],
                "last_ts": [pdf.ts.max()],
                "max_value": [pdf.value.max()],
                "n_types": [pdf.event_type.nunique()],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        stats,
        schema="user_id long, n_events long, first_ts timestamp_ntz, "
        "last_ts timestamp_ntz, max_value double, n_types long",
    )


@register(
    "join_click_purchase_window",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               c.ts       AS click_ts,
               p.ts       AS purchase_ts,
               p.value    AS purchase_value
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >  c.ts
         AND p.ts <= c.ts + INTERVAL 10 MINUTE
        WHERE c.event_type = 'click'
          AND p.event_type = 'purchase'
        """,
    category="streaming",
    doc="Batch twin of the stream-stream interval join "
    "(stream_ops.click_purchase_join_stream): clicks paired with "
    "same-user purchases in the 10 minutes after — one equi-join on "
    "user_id with a time-band residual.  In streaming mode the same "
    "condition bounds join state so watermarks can evict old clicks; "
    "test_streaming asserts batch == stream on the fixture.",
)
def join_click_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("user_id", "click_id", "click_ts", "purchase_ts", "purchase_value")


@register(
    "stream_tumbling_counts_e2e",
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
               event_type,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
        """,
    category="streaming",
    doc="END-TO-END STREAMING under the correctness gate: the registered "
    "query builds a readStream file source over the events fixture, "
    "runs the watermarked tumbling-window aggregation through "
    "Structured Streaming's micro-batch engine to completion (memory "
    "sink, processAllAvailable), and returns the sink table — which "
    "must hash-match the DuckDB batch oracle exactly.  This promotes "
    "the stream==batch equality the test suite asserts into the "
    "driver-checked contract itself: event-time windows are functions "
    "of the data, not of arrival order or micro-batch boundaries.  "
    "Complete output mode emits every window, so the watermark bounds "
    "state without dropping fixture rows.",
)
def stream_tumbling_counts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        run_to_completion,
        tumbling_counts_stream,
    )

    out = run_to_completion(
        tumbling_counts_stream(events_stream(spark, sf_dir)),
        "stream_tumbling_e2e_sink",
    )
    return out.select("w_start", "event_type", "n")


@register(
    "stream_session_counts_e2e",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sid
            FROM gaps
        )
        SELECT user_id, min(ts) AS s_start, count(*) AS n
        FROM sess
        GROUP BY user_id, sid
        """,
    category="streaming",
    doc="END-TO-END STREAMING session windows under the correctness "
    "gate: readStream -> watermark -> session_window(10 min) per user "
    "through the micro-batch engine (complete mode, memory sink), "
    "hash-matched against the gaps-and-islands batch oracle.  Session "
    "windows are the hard case for stream==batch equality — the state "
    "store must merge partial sessions across micro-batches into "
    "exactly the sessions a batch scan derives.",
)
def stream_session_counts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        run_to_completion,
        session_counts_stream,
    )

    out = run_to_completion(
        session_counts_stream(events_stream(spark, sf_dir)),
        "stream_session_e2e_sink",
    )
    return out.select("user_id", "s_start", "n")


@register(
    "stream_stateful_counts_e2e",
    oracle="""
        SELECT user_id, count(*) AS n_events
        FROM events
        GROUP BY user_id
        """,
    category="streaming",
    doc="END-TO-END custom stateful streaming under the correctness "
    "gate: per-user running counts kept in the state store via "
    "applyInPandasWithState, driven through the micro-batch engine "
    "(update mode, memory sink).  Update mode emits one row per key "
    "per micro-batch in which the key changed; the running count is "
    "monotone, so max(n_events) per user is the final state and must "
    "equal the batch count exactly — the state handle accumulated "
    "every event exactly once, across arbitrary micro-batch "
    "boundaries.",
)
def stream_stateful_counts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        run_to_completion,
        running_counts_stateful,
    )

    out = run_to_completion(
        running_counts_stateful(events_stream(spark, sf_dir)),
        "stream_stateful_e2e_sink",
        mode="update",
    )
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


@register(
    "stream_multibatch_stateful_e2e",
    oracle="""
        SELECT user_id, count(*) AS n_events
        FROM events
        GROUP BY user_id
        """,
    category="streaming",
    doc="CROSS-BATCH stateful streaming under the correctness gate: the "
    "events fixture stages as THREE files delivered as three separate "
    "micro-batches (maxFilesPerTrigger=1, event_id % 3 split, mtime-"
    "ordered), so the per-user applyInPandasWithState counts MUST "
    "accumulate through the state store across real batch boundaries — "
    "unlike the single-batch e2e twins, a state handle that dropped or "
    "double-counted on merge would pass there and fail here.  Update "
    "mode emits per batch; the count is monotone, so max(n_events) per "
    "user is the final state and must equal the batch aggregate "
    "exactly.",
)
def stream_multibatch_stateful_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream_multibatch,
        run_to_completion,
        running_counts_stateful,
    )

    out = run_to_completion(
        running_counts_stateful(events_stream_multibatch(spark, sf_dir)),
        "stream_multibatch_stateful_sink",
        mode="update",
    )
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


@register(
    "stream_late_drop_e2e",
    oracle="""
        WITH g0 AS (SELECT ts, event_type FROM events WHERE event_id % 3 = 0),
             g1 AS (SELECT ts, event_type FROM events WHERE event_id % 3 = 1),
             g2 AS (SELECT ts, event_type FROM events WHERE event_id % 3 = 2),
             wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM g0),
             kept AS (
                 SELECT ts, event_type FROM g0
                 UNION ALL SELECT ts, event_type FROM g1
                 UNION ALL
                 SELECT g2.ts, g2.event_type
                 FROM g2, wm
                 WHERE time_bucket(INTERVAL '1 hour', g2.ts) + INTERVAL 1 HOUR
                       > wm.w
             )
        SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM kept
        GROUP BY 1, 2
        """,
    category="streaming",
    doc="WATERMARK LATE-DATA DROPPING, demonstrated and hash-matched: "
    "three mtime-ordered micro-batches (event_id % 3 split); a 10-min "
    "watermark on a 1-hour tumbling count.  Measured on this engine "
    "(NOTES_r05 'Watermark timing'): during batch N the late-event "
    "filter uses wm_late(N) = max ts of batches 0..N-2 minus the "
    "delay, while state eviction at the END of batch N uses "
    "wm_evict(N) = max of batches 0..N-1 minus the delay.  So batches "
    "0 and 1 are fully admitted and batch 2 drops exactly the rows "
    "whose window END is at or below max(batch0.ts) - 10min.  The "
    "oracle reproduces that rule in closed form over the same split, "
    "so the result differs from the naive batch aggregate by precisely "
    "the dropped rows — the stream==batch equality twins prove windows "
    "are arrival-order-independent; THIS query proves bounded state "
    "has the documented cost and nothing more.  No restart ambiguity: "
    "the state present when batch N starts was last evicted with "
    "wm_evict(N-1), which equals wm_late(N) — a kept late row "
    "(window end > wm_late(N)) therefore always finds its window "
    "state intact, so update-mode max(n) per window is the final "
    "count.",
)
def stream_late_drop_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream_multibatch,
        run_to_completion,
        tumbling_counts_stream,
    )

    out = run_to_completion(
        tumbling_counts_stream(
            events_stream_multibatch(spark, sf_dir), watermark="10 minutes"
        ),
        "stream_late_drop_sink",
        mode="update",
    )
    return out.groupBy("w_start", "event_type").agg(F.max("n").alias("n"))


@register(
    "stream_user_stats_tws_e2e",
    oracle="""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1000000 AS total_value,
               max(value) AS max_value
        FROM events
        GROUP BY user_id
        """,
    category="streaming",
    doc="END-TO-END Spark 4 stateful v2 (transformWithStateInPandas) "
    "under the correctness gate: per-user running stats held in typed "
    "ValueState on the RocksDB state store, driven through the "
    "micro-batch engine (update mode, memory sink).  The running sum "
    "accumulates integer micro-units (half-up per element, matching "
    "the oracle's floor(v*1e6 + 0.5)), so the final emission equals "
    "the batch fixed-point aggregate bit-for-bit regardless of "
    "micro-batch boundaries; n_events is monotone, so max-by-n per "
    "user selects the final state even if the source splits into "
    "multiple batches.  Runtime gate: the worker-side state client "
    "speaks protobuf to the JVM state server — ensure_protobuf() "
    "provisions the repo's pure-Python shim (driver sys.path + "
    "addPyFile for workers) when no pip-installed runtime exists, and "
    "the query raises a clear gate error only if neither is available.",
)
def stream_user_stats_tws_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_protobuf,
        events_stream,
        run_to_completion,
        user_value_stats_tws,
    )

    if not ensure_protobuf(spark):
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf; neither a "
            "pip-installed runtime nor the pbshim SDK backing is available"
        )
    out = run_to_completion(
        user_value_stats_tws(events_stream(spark, sf_dir)),
        "stream_tws_e2e_sink",
        mode="update",
    )
    final = F.max(
        F.struct("n_events", "total_value", "max_value")
    ).alias("s")
    return (
        out.groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_value").alias("total_value"),
            F.col("s.max_value").alias("max_value"),
        )
    )


def _ssjoin_oracle(null_clicks: bool, null_purchases: bool) -> str:
    """ONE source of truth for all four stream-stream join oracles, so
    the measured watermark rule cannot drift between join types.

    Measured emission rules (probes in NOTES_r05.md / NOTES_r06.md,
    Spark 4.1.2 StreamingSymmetricHashJoinExec, ms-boundary checked):

    - global watermark ``W = min(max click_ts, max purchase_ts) - delay``
      (each withWatermark column tracks its own max; the engine takes
      the min across inputs);
    - an unmatched CLICK emits its null-purchase row iff
      ``click_ts + horizon < W`` — STRICT (state removal is ``<``);
    - an unmatched PURCHASE emits its null-click row iff
      ``purchase_ts <= W`` — NON-strict (the purchase buffer's expiry
      derives from ``purchase_ts > click_ts``: a purchase at exactly W
      cannot meet any future click, whose event time is already >= W).

    ``null_clicks`` adds the unmatched-click branch (left/full outer);
    ``null_purchases`` the unmatched-purchase branch (right/full outer).
    """
    sql = """
        WITH wm AS (
            SELECT least(
                (SELECT max(ts) FROM events WHERE event_type = 'click'),
                (SELECT max(ts) FROM events WHERE event_type = 'purchase')
            ) - INTERVAL 1 HOUR AS w
        ),
        matched AS (
            SELECT c.user_id,
                   c.event_id AS click_id,
                   c.ts       AS click_ts,
                   p.ts       AS purchase_ts,
                   p.value    AS purchase_value
            FROM events c
            JOIN events p
              ON p.user_id = c.user_id
             AND p.ts >  c.ts
             AND p.ts <= c.ts + INTERVAL 10 MINUTE
            WHERE c.event_type = 'click'
              AND p.event_type = 'purchase'
        )
        SELECT * FROM matched"""
    if null_clicks:
        sql += """
        UNION ALL
        SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
               CAST(NULL AS TIMESTAMP) AS purchase_ts,
               CAST(NULL AS DOUBLE)    AS purchase_value
        FROM events c
        WHERE c.event_type = 'click'
          AND NOT EXISTS (
              SELECT 1 FROM events p
              WHERE p.event_type = 'purchase'
                AND p.user_id = c.user_id
                AND p.ts >  c.ts
                AND p.ts <= c.ts + INTERVAL 10 MINUTE)
          AND c.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm)"""
    if null_purchases:
        sql += """
        UNION ALL
        SELECT p.user_id,
               CAST(NULL AS BIGINT)    AS click_id,
               CAST(NULL AS TIMESTAMP) AS click_ts,
               p.ts AS purchase_ts, p.value AS purchase_value
        FROM events p
        WHERE p.event_type = 'purchase'
          AND NOT EXISTS (
              SELECT 1 FROM events c
              WHERE c.event_type = 'click'
                AND c.user_id = p.user_id
                AND p.ts >  c.ts
                AND p.ts <= c.ts + INTERVAL 10 MINUTE)
          AND p.ts <= (SELECT w FROM wm)"""
    return sql


@register(
    "stream_stream_join_e2e",
    oracle=_ssjoin_oracle(null_clicks=False, null_purchases=False),
    category="streaming",
    doc="END-TO-END stream-stream interval join under the correctness "
    "gate: both sides are watermarked streams over the same file "
    "source, the join condition time-bounds purchase relative to "
    "click so the state store can evict, and the append-mode memory "
    "sink must hash-match the batch self-join oracle row for row — "
    "the state buffered exactly the pairs the time band implies, no "
    "duplicates, no losses across micro-batches.",
)
def stream_stream_join_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        click_purchase_join_stream,
        events_stream,
        run_to_completion,
    )

    return run_to_completion(
        click_purchase_join_stream(events_stream(spark, sf_dir)),
        "stream_stream_join_e2e_sink",
        mode="append",
    )


@register(
    "stream_sliding_counts_e2e",
    oracle="""
        SELECT w_start, event_type, count(*) AS n
        FROM (
            SELECT time_bucket(INTERVAL '15 minutes', ts)
                       - k * (INTERVAL '15 minutes') AS w_start,
                   event_type
            FROM events, (SELECT unnest(generate_series(0, 3)) AS k)
        )
        GROUP BY w_start, event_type
        """,
    category="streaming",
    doc="END-TO-END sliding windows through the real micro-batch engine "
    "(1 h size / 15 min slide, watermarked, complete-mode memory "
    "sink): every event lands in 4 overlapping window instances whose "
    "state the engine maintains across micro-batches; the sink must "
    "hash-match the batch replication oracle exactly.  Completes the "
    "window-family e2e set (tumbling / sliding / session / stateful / "
    "stream-stream join all run the actual engine under the "
    "correctness gate).",
)
def stream_sliding_counts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        run_to_completion,
        sliding_counts_stream,
    )

    return run_to_completion(
        sliding_counts_stream(events_stream(spark, sf_dir)),
        "stream_sliding_e2e_sink",
    )


@register(
    "stream_dedup_e2e",
    oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
        """,
    category="streaming",
    doc="END-TO-END STREAMING DEDUP under the correctness gate: TWO "
    "file-source streams over the same events fixture union into one "
    "stream (every row arrives exactly twice — the planted duplication "
    "that makes the dedup observable), state-store dropDuplicates on "
    "event_id keeps one copy of each, and the per-type counts must "
    "hash-match the single-copy batch oracle — without the dedup every "
    "count doubles and the gate goes red.  Watermarked so the "
    "dedup+aggregate chain of stateful operators is planned; on the "
    "finite fixture no state evicts, and at production scale the "
    "within-watermark form bounds dedup state "
    "(test_streaming_dedup_within_watermark covers it).",
)
def stream_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        run_to_completion,
    )

    def side():
        return (
            events_stream(spark, sf_dir)
            .withWatermark("ts", "1 day")
            .select("ts", "event_id", "event_type")
        )

    dd = side().unionAll(side()).dropDuplicates(["event_id"])
    agg = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    out = run_to_completion(agg, "stream_dedup_e2e_sink")
    return out.select("event_type", "n")


def _alert_oracle() -> str:
    from mincemeatpy_spark.operators.behavioral import (
        _ALERT_MIN_RUN,
        _ALERT_THRESHOLD,
    )

    return f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN value > {_ALERT_THRESHOLD} THEN 1 ELSE 0 END AS f
            FROM events
        ),
        runs AS (
            SELECT user_id, ts, f,
                   row_number() OVER w
                   - sum(f) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS grp
            FROM flagged
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        episodes AS (
            SELECT user_id, grp, count(*) AS run_len, min(ts) AS run_start
            FROM runs WHERE f = 1
            GROUP BY user_id, grp
        ),
        alerts AS (
            SELECT user_id, run_len, run_start
            FROM episodes WHERE run_len >= {_ALERT_MIN_RUN}
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_alerts,
               CAST(max(run_len) AS BIGINT) AS longest_run,
               min(run_start) AS first_alert_ts
        FROM alerts
        GROUP BY user_id
        """


@register(
    "stream_alert_debounce_e2e",
    oracle=_alert_oracle(),
    category="streaming",
    doc="END-TO-END STATEFUL ALERTING under the correctness gate: the "
    "debounce state machine of events_alert_debounce (>=3 consecutive "
    "breaches = one alert episode) runs as applyInPandasWithState — "
    "per-user O(1) state: current run length, episode count, longest "
    "run, first alert start — through the real micro-batch engine "
    "(update mode, memory sink), and the collapsed per-user summary "
    "must hash-match the batch gaps-and-islands oracle.  This is the "
    "reference's per-key reducefn shape promoted to INCREMENTAL "
    "execution: the same answer, maintained as events arrive instead "
    "of recomputed from history.",
)
def stream_alert_debounce_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        alert_debounce_stateful,
        events_stream,
        run_to_completion,
    )

    out = run_to_completion(
        alert_debounce_stateful(events_stream(spark, sf_dir)),
        "stream_alert_debounce_sink",
        mode="update",
    )
    return out.groupBy("user_id").agg(
        F.max("n_alerts").alias("n_alerts"),
        F.max("longest_run").alias("longest_run"),
        F.min("first_alert_ts").alias("first_alert_ts"),
    )


@register(
    "stream_stream_left_outer_join_e2e",
    oracle=_ssjoin_oracle(null_clicks=True, null_purchases=False),
    category="streaming",
    doc="END-TO-END stream-stream LEFT OUTER join under the correctness "
    "gate — the join mode whose semantics only exist in streaming: an "
    "unmatched click emits its null-purchase row not when the batch "
    "ends but when the state store can PROVE no purchase can still "
    "arrive, i.e. when the global watermark passes the click's match "
    "horizon.  The oracle encodes the engine's exact emission rule, "
    "measured by probe (NOTES_r05.md): global watermark = min over "
    "BOTH inputs' event-time maxima minus the delay — so the "
    "max-click_ts row itself never expires, its own arrival pins the "
    "click-side watermark an hour behind it — and state removal is "
    "strictly click_ts + horizon < W.  Matched pairs must also "
    "hash-match the batch interval self-join row for row, so the gate "
    "checks buffering, matching, AND timeout emission across the "
    "append-mode micro-batch run.",
)
def stream_stream_left_outer_join_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        click_purchase_join_stream,
        events_stream,
        run_to_completion,
    )

    return run_to_completion(
        click_purchase_join_stream(events_stream(spark, sf_dir), how="leftOuter"),
        "stream_stream_loj_e2e_sink",
        mode="append",
    )


@register(
    "stream_stream_right_outer_join_e2e",
    oracle=_ssjoin_oracle(null_clicks=False, null_purchases=True),
    category="streaming",
    doc="END-TO-END stream-stream RIGHT OUTER join under the correctness "
    "gate — completes the outer-join matrix with the left-outer twin.  "
    "The purchase side's null-emission rule differs from the click "
    "side's in STRICTNESS, which is exactly why all four join types "
    "share one oracle helper (_ssjoin_oracle): an unmatched purchase "
    "emits its null-click row iff purchase_ts <= W (non-strict, "
    "measured at the millisecond boundary — the purchase buffer's "
    "expiry derives from purchase_ts > click_ts, so a purchase at "
    "exactly W cannot meet any future click), while an unmatched "
    "click's rule is the strict click_ts + horizon < W.  The output "
    "user_id coalesces both sides' keys so outer rows keep theirs.",
)
def stream_stream_right_outer_join_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        click_purchase_join_stream,
        events_stream,
        run_to_completion,
    )

    return run_to_completion(
        click_purchase_join_stream(events_stream(spark, sf_dir), how="rightOuter"),
        "stream_stream_roj_e2e_sink",
        mode="append",
    )


@register(
    "stream_stream_full_outer_join_e2e",
    oracle=_ssjoin_oracle(null_clicks=True, null_purchases=True),
    category="streaming",
    doc="END-TO-END stream-stream FULL OUTER join under the correctness "
    "gate: the union of both outer emission rules from one shared "
    "oracle helper — unmatched clicks at the strict click_ts + "
    "horizon < W, unmatched purchases at the non-strict purchase_ts "
    "<= W, matched pairs identical to the batch interval self-join.  "
    "One state store serves all three result classes; the hash gate "
    "proves the engine neither duplicates a matched row into an outer "
    "row nor drops an expiring one across micro-batches.",
)
def stream_stream_full_outer_join_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        click_purchase_join_stream,
        events_stream,
        run_to_completion,
    )

    return run_to_completion(
        click_purchase_join_stream(events_stream(spark, sf_dir), how="fullOuter"),
        "stream_stream_foj_e2e_sink",
        mode="append",
    )


@register(
    "stream_restart_recovery_e2e",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS micro_sum
        FROM events
        GROUP BY event_type
        """,
    category="streaming",
    doc="END-TO-END CHECKPOINT RECOVERY under the correctness gate: a "
    "complete-mode aggregate commits micro-batch 0, the query is "
    "STOPPED, two more files land, and a NEW query starts from the "
    "same checkpoint — its output equals the full-corpus aggregate "
    "only if the state store restored batch 0's partials across the "
    "restart (a fresh state would count the last two files alone, and "
    "the hash gate would go red).  Deterministic by construction: "
    "which files each phase sees is controlled by what exists in the "
    "source directory, not by stop() timing.  This is the engine-side "
    "half of the reference's fault-tolerance story (O11): the "
    "reference re-runs the whole job on worker death (mincemeat.py:"
    "317-333); Structured Streaming resumes from the last committed "
    "offset + state snapshot, reprocessing nothing.",
)
def stream_restart_recovery_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import run_with_restart

    return run_with_restart(spark, sf_dir, "stream_restart_recovery_sink")
