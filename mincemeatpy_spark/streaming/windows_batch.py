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


def _ssjoin_oracle(
    null_clicks: bool,
    null_purchases: bool,
    click_delay: str = "1 HOUR",
    purchase_delay: str | None = None,
) -> str:
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
    ``click_delay`` / ``purchase_delay`` parametrize per-side watermark
    delays: each input subtracts its OWN delay before the engine takes
    the min (probed with asymmetric 2h/30m delays at the boundary).
    """
    pd_ = purchase_delay or click_delay
    sql = f"""
        WITH wm AS (
            SELECT least(
                (SELECT max(ts) FROM events WHERE event_type = 'click')
                    - INTERVAL {click_delay},
                (SELECT max(ts) FROM events WHERE event_type = 'purchase')
                    - INTERVAL {pd_}
            ) AS w
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
    "stream_stream_join_asym_wm_e2e",
    oracle=_ssjoin_oracle(
        null_clicks=True,
        null_purchases=True,
        click_delay="2 HOUR",
        purchase_delay="30 MINUTE",
    ),
    category="streaming",
    doc="Full-outer stream-stream join with ASYMMETRIC watermark delays "
    "(clicks 2 h, purchases 30 min) — the production shape: a slow, "
    "late-arriving stream gets a long delay while a prompt one keeps "
    "state small.  Pins the global-watermark composition rule the "
    "symmetric queries cannot distinguish: each input subtracts its "
    "OWN delay before the engine takes the min across inputs, "
    "W = min(max click_ts - 2h, max purchase_ts - 30m) — probed at "
    "the boundary (NOTES_r06.md), not assumed — and both measured "
    "emission strictness rules carry over unchanged through the "
    "shared _ssjoin_oracle builder.  At 100 TB per-side delays are "
    "the state-size lever: purchase state evicts 4x sooner than a "
    "symmetric 2 h delay would allow.",
)
def stream_stream_join_asym_wm_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        click_purchase_join_stream,
        events_stream,
        run_to_completion,
    )

    return run_to_completion(
        click_purchase_join_stream(
            events_stream(spark, sf_dir),
            watermark="2 hours",
            how="fullOuter",
            purchase_watermark="30 minutes",
        ),
        "stream_stream_asym_e2e_sink",
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


@register(
    "stream_static_enrich_e2e",
    oracle="""
        SELECT n.n_name,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(e.value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS micro_sum
        FROM events e
        JOIN nation n ON n.n_nationkey = e.user_id % 25
        GROUP BY n.n_name
        """,
    category="streaming",
    doc="END-TO-END stream-static join under the correctness gate — the "
    "one join mode the matrix was missing: a STREAMING fact enriched "
    "by a BATCH dimension (the canonical lookup-join every production "
    "pipeline runs; the reference has no notion of it).  The static "
    "side needs no watermark and holds no join state — each "
    "micro-batch probes the broadcast dimension as a plain "
    "BroadcastHashJoin, so state is O(aggregate keys), not O(events) "
    "— and the complete-mode per-nation rollup must hash-match the "
    "batch join oracle exactly.  Value sums ride as floor-micro int64 "
    "(the restart-recovery convention) so the hash compare is exact.",
)
def stream_static_enrich_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        run_to_completion,
    )

    ev = events_stream(spark, sf_dir).withColumn(
        "nk", (F.col("user_id") % 25).cast("int")
    )
    dim = t(spark, sf_dir, "nation")
    agg = (
        ev.join(F.broadcast(dim), F.col("nk") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("micro_sum"),
        )
    )
    return run_to_completion(agg, "stream_static_enrich_sink", mode="complete")


_SESSION_FINALIZE_ORACLE = """
        WITH wm AS (
            SELECT CAST(epoch_us(max(ts)) // 1000 - 600000 AS BIGINT) AS w_ms
            FROM events
        ),
        lagd AS (
            SELECT user_id, epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS prev
            FROM events
        ),
        marks AS (
            SELECT user_id, us,
                   CASE WHEN prev IS NULL OR us - prev > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM lagd
        ),
        sid AS (
            SELECT user_id, us,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY us
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM marks
        ),
        sess AS (
            SELECT user_id, sid,
                   CAST(min(us) AS BIGINT) AS start_us,
                   CAST(max(us) AS BIGINT) AS end_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sid GROUP BY user_id, sid
        ),
        fin AS (
            SELECT s.*, max(sid) OVER (PARTITION BY user_id) AS last_sid
            FROM sess s
        )
        SELECT user_id, start_us, end_us, n_events
        FROM fin, wm
        WHERE sid < last_sid OR (end_us + 1800000000) // 1000 <= wm.w_ms
        """


@register(
    "stream_session_timer_e2e",
    oracle=_SESSION_FINALIZE_ORACLE,
    category="streaming",
    doc="EVENT-TIME TIMERS under the correctness gate: per-user 30-min "
    "sessions finalized by transformWithState timers — a session emits "
    "either when a later out-of-gap event supersedes it in-line, or "
    "when its registered timer (floor-ms of last event + gap) fires "
    "because the watermark proves the silence is permanent.  Driven "
    "through TWO time-monotone micro-batches (events_stream_timesplit) "
    "so batch-0 timers must survive the batch boundary in RocksDB and "
    "fire under batch 1's one-back watermark or the end-of-stream "
    "extra commit (wm = max ts - 10 min).  The emission set is closed-"
    "form: every non-final session, plus final sessions whose "
    "floor-ms(end + gap) <= floor-ms(max ts) - 600000 — non-strict at "
    "the boundary, as probed at the exact millisecond (NOTES_r06.md).  "
    "Append mode: each session exactly once, no update-mode dedup.  At "
    "100 TB state is O(open sessions) and timers evict it; the same "
    "processor runs unchanged on a Kafka source.",
)
def stream_session_timer_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_protobuf,
        events_stream_timesplit,
        run_to_completion,
        session_timeout_tws,
    )

    if not ensure_protobuf(spark):
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf; neither a "
            "pip-installed runtime nor the pbshim SDK backing is available"
        )
    return run_to_completion(
        session_timeout_tws(events_stream_timesplit(spark, sf_dir)),
        "stream_session_timer_sink",
        mode="append",
    )


@register(
    "stream_mapstate_counts_e2e",
    oracle="""
        SELECT user_id, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS micro_sum
        FROM events
        GROUP BY user_id, event_type
        """,
    category="streaming",
    doc="Stateful-v2 MAPSTATE under the correctness gate: per-user "
    "counts/sums sub-keyed by event type in a typed MapState, driven "
    "through THREE micro-batches (event_id % 3 staging) so map entries "
    "must merge read-modify-write across real batch boundaries in "
    "RocksDB.  Each batch touches only the sub-keys it saw and emits "
    "those entries (update mode); (n, micro_sum) grow monotonically "
    "per entry, so max-struct per (user, type) over the emissions is "
    "the final state and must hash-match the batch group-by exactly "
    "(value sums as half-up micros, the fixed-point convention).  "
    "MapState is the right shape for ragged sub-keys: state is O(user "
    "x observed types), and one hot sub-key rewrites one RocksDB row, "
    "not the whole map.",
)
def stream_mapstate_counts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_protobuf,
        events_stream_multibatch,
        run_to_completion,
        user_type_counts_mapstate,
    )

    if not ensure_protobuf(spark):
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf; neither a "
            "pip-installed runtime nor the pbshim SDK backing is available"
        )
    out = run_to_completion(
        user_type_counts_mapstate(events_stream_multibatch(spark, sf_dir)),
        "stream_mapstate_sink",
        mode="update",
    )
    fin = F.max(F.struct("n", "micro_sum")).alias("s")
    return (
        out.groupBy("user_id", "event_type")
        .agg(fin)
        .select(
            "user_id",
            "event_type",
            F.col("s.n").alias("n"),
            F.col("s.micro_sum").alias("micro_sum"),
        )
    )


@register(
    "stream_recent3_liststate_e2e",
    oracle="""
        WITH r AS (
            SELECT user_id, epoch_us(ts) AS us,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts) DESC) AS rk
            FROM events
        )
        SELECT user_id,
               CAST(coalesce(max(CASE WHEN rk = 1 THEN us END), -1)
                    AS BIGINT) AS t1_us,
               CAST(coalesce(max(CASE WHEN rk = 2 THEN us END), -1)
                    AS BIGINT) AS t2_us,
               CAST(coalesce(max(CASE WHEN rk = 3 THEN us END), -1)
                    AS BIGINT) AS t3_us
        FROM r GROUP BY user_id
        """,
    category="streaming",
    doc="Stateful-v2 LISTSTATE under the correctness gate: the 3 most-"
    "recent event times per user in a typed ListState, across THREE "
    "out-of-time-order micro-batches (event_id % 3 staging) — each "
    "batch merges arrivals with the stored list and put()s back the 3 "
    "largest, so the list must round-trip the state store intact "
    "between batches.  The emitted (t1 >= t2 >= t3, -1-padded) triple "
    "improves lexicographically batch-over-batch (top-3 of a growing "
    "set), so max-struct per user over update-mode emissions is the "
    "final state and equals the batch top-3 by construction.  Exact "
    "int64 micros end-to-end; ties cost nothing because equal ranks "
    "carry equal values.  State is O(k) per user — put() of a bounded "
    "list is the intended ListState shape.",
)
def stream_recent3_liststate_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_protobuf,
        events_stream_multibatch,
        recent3_liststate,
        run_to_completion,
    )

    if not ensure_protobuf(spark):
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf; neither a "
            "pip-installed runtime nor the pbshim SDK backing is available"
        )
    out = run_to_completion(
        recent3_liststate(events_stream_multibatch(spark, sf_dir)),
        "stream_recent3_sink",
        mode="update",
    )
    fin = F.max(F.struct("t1_us", "t2_us", "t3_us")).alias("s")
    return (
        out.groupBy("user_id")
        .agg(fin)
        .select(
            "user_id",
            F.col("s.t1_us").alias("t1_us"),
            F.col("s.t2_us").alias("t2_us"),
            F.col("s.t3_us").alias("t3_us"),
        )
    )


@register(
    "source_statestore_reader",
    oracle="""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY user_id
        """,
    category="source",
    doc="The STATE STORE as a batch SOURCE (Spark 4 statestore reader): "
    "run a per-user streaming count against a checkpoint, then "
    "spark.read.format('statestore').load(checkpoint) reads the "
    "operator's committed state as (key struct, value struct, "
    "partition_id) rows — the ops surface for state inspection, "
    "debugging a wedged stateful query, and state migration audits, "
    "with no special export path.  The projected (user_id, n) must "
    "hash-match the batch aggregate: what the store holds IS the "
    "aggregate.  The checkpoint stages once per fixture fingerprint "
    "(idempotent, like the stream stagings); the reader scans state "
    "files directly, one task per store partition — at scale that is "
    "a parallel read of RocksDB snapshots, no replay of the stream.",
)
def source_statestore_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        fixture_stage_dir,
    )

    # pin the provider for BOTH staging and reading: an earlier TWS
    # query in the same session flips the session-global providerClass
    # to RocksDB, and a checkpoint must be read with the provider that
    # wrote it regardless of session history
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )
    ck = fixture_stage_dir(sf_dir, "statestore_ck", "mincemeatpy_statestore_ck")
    marker = ck / "_DONE"
    if not marker.exists():
        shutil.rmtree(ck, ignore_errors=True)
        agg = (
            events_stream(spark, sf_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        from mincemeatpy_spark.streaming.stream_ops import (
            _drive_to_completion_with_retry,
        )

        _drive_to_completion_with_retry(
            spark,
            lambda: (
                agg.writeStream.outputMode("update")
                .format("noop")
                .option("checkpointLocation", str(ck))
                .start()
            ),
            "statestore_read_agg",
        )
        marker.touch()
    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_state_store_coordinator,
    )

    ensure_state_store_coordinator(spark)
    return (
        spark.read.format("statestore")
        .load(str(ck))
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("value.count").cast("bigint").alias("n"),
        )
    )


@register(
    "sink_foreachbatch_upsert",
    oracle="""
        SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_id, event_type,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micro_value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC)
                            AS rn
              FROM events)
        WHERE rn = 1
        """,
    category="source",
    doc="The foreachBatch SINK pattern under the correctness gate: a "
    "streaming change log merged batch-by-batch into a keyed parquet "
    "snapshot (SCD-1 latest-wins upsert) — THE production exit ramp "
    "from Structured Streaming into any batch-writable store.  Three "
    "micro-batches (event_id % 3 staging, so 'latest' keeps having to "
    "displace earlier winners); each merge is snapshot(N) = "
    "latest-per-user of (snapshot(N-1) UNION delta) — one distributed "
    "max_by shuffle per batch, versioned by batchId so a replayed "
    "batch deterministically rewrites the same version (the "
    "exactly-once recipe: idempotent-by-batchId writes).  The merge "
    "is associative, so the final snapshot equals the batch "
    "row_number()=1 compaction regardless of how events split across "
    "batches — hash-matched here.  At 100 TB the union side is the "
    "snapshot: partition it by key range and the merge prunes to "
    "touched partitions (MERGE INTO on a real lakehouse table), same "
    "plan shape.",
)
def sink_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream_multibatch,
        fixture_stage_dir,
    )

    # provider-pin invariant (enforced by tests/test_conf_invariants.py):
    # every function that persists a streaming checkpoint across sessions
    # via fixture_stage_dir pins its own stateStore provider, because the
    # session-global providerClass may have been flipped by an earlier TWS
    # query and a checkpoint must be resumed with the provider that wrote
    # it.  This stream is stateless (foreachBatch; the checkpoint holds
    # source offsets only) but carries the pin so the invariant is uniform.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )
    base = fixture_stage_dir(sf_dir, "foreachbatch_upsert", "mincemeatpy_febu")
    done = base / "_DONE"
    if not done.exists():
        shutil.rmtree(base, ignore_errors=True)
        base.mkdir(parents=True, exist_ok=True)

        def merge(bdf: DataFrame, bid: int) -> None:
            sp = bdf.sparkSession
            delta = bdf.select(
                "user_id",
                F.unix_micros("ts").alias("ts_us"),
                "event_id",
                "event_type",
                F.floor(F.col("value") * 1000000 + 0.5)
                .cast("bigint")
                .alias("micro_value"),
            )
            prev = base / f"snap_v{bid - 1}"
            if prev.exists():
                delta = delta.unionByName(sp.read.parquet(str(prev)))
            snap = (
                delta.groupBy("user_id")
                .agg(
                    F.max_by(
                        F.struct(
                            "ts_us", "event_id", "event_type", "micro_value"
                        ),
                        F.struct("ts_us", "event_id"),
                    ).alias("s")
                )
                .select(
                    "user_id",
                    "s.ts_us",
                    "s.event_id",
                    "s.event_type",
                    "s.micro_value",
                )
            )
            snap.write.mode("overwrite").parquet(str(base / f"snap_v{bid}"))

        from mincemeatpy_spark.streaming.stream_ops import (
            _drive_to_completion_with_retry,
        )

        _drive_to_completion_with_retry(
            spark,
            lambda: (
                events_stream_multibatch(spark, sf_dir)
                .writeStream.foreachBatch(merge)
                .option("checkpointLocation", str(base / "ck"))
                .start()
            ),
            "foreachbatch_merge",
        )
        done.touch()
    vs = sorted(int(p.name[6:]) for p in base.glob("snap_v*"))
    return spark.read.parquet(str(base / f"snap_v{vs[-1]}"))


@register(
    "stream_chained_window_aggs_e2e",
    oracle="""
        WITH wm AS (
            SELECT epoch_ms(max(ts)) - 600000 AS w_ms FROM events
        ),
        h1 AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS w, event_type,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        h6 AS (
            SELECT time_bucket(INTERVAL '6 hours', w) AS w6, event_type,
                   CAST(sum(n) AS BIGINT) AS n6,
                   CAST(count(*) AS BIGINT) AS n_subwindows
            FROM h1 GROUP BY 1, 2
        )
        SELECT w6 AS w6_start, event_type, n6, n_subwindows
        FROM h6, wm
        WHERE epoch_ms(w6 + INTERVAL 6 HOUR) <= wm.w_ms
        """,
    category="streaming",
    doc="MULTIPLE STATEFUL OPERATORS in one streaming query (Spark "
    "3.4+/4): a 1-hour tumbling count CHAINED into a 6-hour rollup "
    "via window(window_time(w)), both stateful, append mode — the "
    "hierarchical-rollup topology that previously required two "
    "queries and an intermediate topic.  Driven over the time-"
    "monotone two-batch staging, where the layered watermark rules "
    "collapse to one closed form (probed, MATCH at sf0.001: 473/473 "
    "rows hash-equal): an hourly window evicts from the first "
    "aggregate when the one-back wm passes its end, flows DIRECTLY "
    "into the second aggregate inside the same micro-batch (no "
    "re-buffering), survives the downstream late filter because the "
    "two-back wm lags eviction by exactly one batch on monotone "
    "data, and the 6-hour window emits once wm >= its end — so the "
    "final emission set is exactly {6h windows ending at or before "
    "floor_ms(max ts) - 10 min} with FULL batch counts.  On the "
    "out-of-order event_id%3 staging the same chain silently loses "
    "evicted-too-early sub-windows (probed: 79 missing + 182 "
    "diverged of 477) — the monotone staging is the point: chained "
    "stateful ops need near-ordered sources or generous delays.  At "
    "100 TB this replaces a two-job rollup pipeline with one plan, "
    "state bounded by wm at both levels.",
)
def stream_chained_window_aggs_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream_timesplit,
        run_to_completion,
    )

    h1 = (
        events_stream_timesplit(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h6 = (
        h1.groupBy(
            F.window(F.window_time("w"), "6 hours").alias("w6"), "event_type"
        )
        .agg(
            F.sum("n").cast("bigint").alias("n6"),
            F.count(F.lit(1)).cast("bigint").alias("n_subwindows"),
        )
        .select(
            F.col("w6.start").alias("w6_start"),
            "event_type",
            "n6",
            "n_subwindows",
        )
    )
    return run_to_completion(h6, "stream_chained_aggs_sink", mode="append")


@register(
    "stream_dedup_within_wm_e2e",
    oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
        """,
    category="streaming",
    doc="dropDuplicatesWithinWatermark under the correctness gate — the "
    "BOUNDED-STATE form of streaming dedup (stream_dedup_e2e's "
    "dropDuplicates keeps every key forever; this one evicts a key "
    "once the watermark passes its event time plus the delay, so "
    "state is O(keys per watermark window) at any stream length — "
    "the only dedup a year-long 100 TB stream can run).  The planted "
    "duplication is the same two-source union, and both copies of "
    "every row carry the same event time and arrive in the same "
    "micro-batch — well inside any delay — so the kept set is exactly "
    "one copy per event_id and the per-type counts hash-match the "
    "batch oracle; the semantic difference from dropDuplicates is "
    "pure state lifetime, which is the point.",
)
def stream_dedup_within_wm_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream,
        run_to_completion,
    )

    def side():
        return (
            events_stream(spark, sf_dir)
            .withWatermark("ts", "1 hour")
            .select("ts", "event_id", "event_type")
        )

    dd = side().unionAll(side()).dropDuplicatesWithinWatermark(["event_id"])
    agg = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    out = run_to_completion(agg, "stream_dedup_wm_e2e_sink")
    return out.select("event_type", "n")


@register(
    "stream_trigger_available_now_e2e",
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1, 2
        """,
    category="streaming",
    doc="Trigger.AvailableNow under the correctness gate: the query "
    "processes everything available AS MULTIPLE RATE-LIMITED "
    "MICRO-BATCHES (maxFilesPerTrigger=1 is honored, unlike the "
    "deprecated Trigger.Once) and then TERMINATES ON ITS OWN — the "
    "production backfill/catch-up trigger that lets one streaming "
    "query definition serve both the nightly batch refill and the "
    "continuous tail, with checkpoints compatible between runs.  "
    "Driven here over the three-file staging with awaitTermination() "
    "(no processAllAvailable — self-termination IS the feature); the "
    "complete-mode hourly counts must hash-match the batch aggregate "
    "exactly.",
)
def stream_trigger_available_now_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream_multibatch,
    )

    # no watermark: complete mode retains all window state, so the
    # out-of-order staging needs no late-data closed form here
    agg = (
        events_stream_multibatch(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_avnow_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM stream_avnow_sink")


@register(
    "source_statestore_tws_reader",
    oracle="""
        SELECT user_id, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS micro_sum
        FROM events
        GROUP BY user_id, event_type
        """,
    category="source",
    doc="The statestore reader over TYPED transformWithState state: "
    "after the MapState counters run against a checkpoint, "
    "spark.read.format('statestore').option('stateVarName', "
    "'by_type') reads the map entries back as (key struct, "
    "user_map_key struct, user_map_value struct) rows — one row per "
    "(grouping key, map sub-key), which is exactly the RocksDB "
    "column-family layout MapState promises (a hot sub-key is one "
    "row, not a serialized dict).  The projected "
    "(user_id, event_type, n, micro_sum) must hash-match the batch "
    "group-by: the committed state IS the aggregate.  Together with "
    "source_statestore_reader (built-in agg state) this certifies "
    "state inspection across both the SQL-aggregate and "
    "arbitrary-state operator families — the audit path a stateful "
    "pipeline at scale needs when a key goes wrong.",
)
def source_statestore_tws_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_protobuf,
        events_stream,
        fixture_stage_dir,
        user_type_counts_mapstate,
    )

    if not ensure_protobuf(spark):
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf; neither a "
            "pip-installed runtime nor the pbshim SDK backing is available"
        )
    # the batch reader replays the RocksDB changelog and would report
    # snapshot-upload lag to a StateStoreCoordinator that only streaming
    # queries stand up — disable the reporting for the read path
    spark.conf.set(
        "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag",
        "false",
    )
    # pin RocksDB for the READ path too: when the staged marker exists
    # in a fresh session, user_type_counts_mapstate (which normally
    # sets this) never runs, and the reader must still match the
    # provider that wrote the checkpoint
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    ck = fixture_stage_dir(
        sf_dir, "statestore_tws_ck", "mincemeatpy_statestore_ck"
    )
    marker = ck / "_DONE"
    if not marker.exists():
        shutil.rmtree(ck, ignore_errors=True)
        from mincemeatpy_spark.streaming.stream_ops import (
            _drive_to_completion_with_retry,
        )

        # transformWithState launches the extra Python state-server
        # worker — the site most exposed to the launch race.
        _drive_to_completion_with_retry(
            spark,
            lambda: (
                user_type_counts_mapstate(events_stream(spark, sf_dir))
                .writeStream.outputMode("update")
                .format("noop")
                .option("checkpointLocation", str(ck))
                .start()
            ),
            "mapstate_counts",
        )
        marker.touch()
    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_state_store_coordinator,
    )

    ensure_state_store_coordinator(spark)
    return (
        spark.read.format("statestore")
        .option("stateVarName", "by_type")
        .load(str(ck))
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("user_map_key.event_type").alias("event_type"),
            F.col("user_map_value.n").cast("bigint").alias("n"),
            F.col("user_map_value.micros").cast("bigint").alias("micro_sum"),
        )
    )


@register(
    "stream_initial_state_tws_e2e",
    oracle="""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS micro_sum
        FROM events
        GROUP BY user_id
        HAVING count(*) FILTER (WHERE event_id % 2 = 1) > 0
        """,
    category="streaming",
    doc="INITIAL STATE for transformWithState under the correctness "
    "gate: the historical half of the log (event_id % 2 = 0) is "
    "batch-aggregated and handed to the processor as initialState — "
    "handleInitialState seeds each key's ValueState ONCE before any "
    "input — and only the other half actually streams.  The final "
    "per-user (count, half-up micro sum) must hash-match the batch "
    "aggregate over the WHOLE log, which only happens if the seed "
    "landed exactly once per key and merged with live arrivals.  "
    "This is the state-bootstrap path a migrating pipeline needs at "
    "100 TB: day-one state comes from the warehouse table, not from "
    "replaying a year of log through the stream.  Update mode; "
    "(n, micro_sum) grows monotonically so max-struct per user "
    "selects the final emission.  Emission requires a LIVE input row (handleInitialState seeds state but update mode emits only from handleInputRows), so the oracle restricts to users with at least one odd-id event — on this fixture that is every user, but the contract holds at any fixture.",
)
def stream_initial_state_tws_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        ensure_protobuf,
        events_stream,
        run_to_completion,
        warmstart_counts_tws,
    )

    if not ensure_protobuf(spark):
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf; neither a "
            "pip-installed runtime nor the pbshim SDK backing is available"
        )
    hist = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(F.floor(F.col("value") * 1000000 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("micros0"),
        )
    )
    live = events_stream(spark, sf_dir).filter(F.col("event_id") % 2 == 1)
    out = run_to_completion(
        warmstart_counts_tws(live, hist),
        "stream_initstate_sink",
        mode="update",
    )
    fin = F.max(F.struct("n", "micro_sum")).alias("s")
    return (
        out.groupBy("user_id")
        .agg(fin)
        .select(
            "user_id",
            F.col("s.n").alias("n"),
            F.col("s.micro_sum").alias("micro_sum"),
        )
    )


@register(
    "stream_session_timeout_gss_e2e",
    oracle=_SESSION_FINALIZE_ORACLE,
    category="streaming",
    doc="The OLD arbitrary-state API's event-time timeouts "
    "(applyInPandasWithState + GroupStateTimeout.EventTimeTimeout, "
    "setTimeoutTimestamp/hasTimedOut) driving the SAME session-"
    "finalization machine as stream_session_timer_e2e — and sharing "
    "its oracle text verbatim (_SESSION_FINALIZE_ORACLE), so the two "
    "stateful APIs are pinned row-for-row equivalent: a pipeline "
    "migrating from flatMapGroupsWithState-era code to stateful v2 "
    "must see zero result drift.  Same time-monotone two-batch "
    "staging; a timed-out group is only invoked when it received no "
    "input that batch, so the supersede race the new API guards "
    "against cannot occur here by construction.  Emission rule "
    "boundary strictness is immaterial on this fixture (0 exact "
    "collisions at sf0.001/0.01, checked) — both APIs agree with the "
    "closed form.",
)
def stream_session_timeout_gss_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        events_stream_timesplit,
        run_to_completion,
        session_timeout_gss,
    )

    return run_to_completion(
        session_timeout_gss(events_stream_timesplit(spark, sf_dir)),
        "stream_session_gss_sink",
        mode="append",
    )


def _web_stream_oracle() -> str:
    from mincemeatpy_spark.text.html_extract import (
        _HTML_SYNTH_SQL,
        _oracle_extract_cte,
    )

    return f"""
        WITH {_oracle_extract_cte(
            f"SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM documents"
        )},
        j AS (
            SELECT d.source, e.body, e.n_words
            FROM extracted e JOIN documents d USING (doc_id)
            WHERE e.n_words > 0
        ),
        u AS (SELECT DISTINCT source, body, n_words FROM j)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS total_words
        FROM u GROUP BY source
        """


@register(
    "stream_web_extract_dedup_e2e",
    oracle=_web_stream_oracle(),
    category="streaming",
    doc="The r12 web-extraction path as CONTINUOUS INGEST under the "
    "correctness gate: TWO document streams over the same fixture "
    "union into one (every page arrives twice — the planted "
    "duplication that makes the dedup observable), each page is "
    "synthesized to HTML and extracted IN the stream (the same "
    "scan-side regexp/array codegen as text_html_extract — stateless, "
    "so the streaming plan is identical to batch), then state-store "
    "dropDuplicates on (source, sha256(body)) keeps one copy per "
    "distinct extracted body and the per-source doc/word totals must "
    "hash-match the batch-DISTINCT oracle — without the dedup every "
    "count doubles.  Dedup state is O(distinct digests), never "
    "O(stream): exactly how a crawler's landing directory ingests "
    "continuously at 100 TB instead of re-deduplicating per crawl.",
)
def stream_web_extract_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        documents_stream,
        run_to_completion,
    )
    from mincemeatpy_spark.text.html_extract import (
        _HTML_SYNTH_SQL,
        extract_text_cols,
    )

    def side():
        docs = documents_stream(spark, sf_dir).select(
            "doc_id", "source", F.expr(_HTML_SYNTH_SQL).alias("html")
        )
        cols = extract_text_cols(F.col("html"))
        return docs.select(
            "source",
            cols["body"].alias("body"),
            cols["n_words"].alias("n_words"),
        ).filter(F.col("n_words") > 0)

    dd = (
        side()
        .unionAll(side())
        .withColumn("body_sha", F.sha2(F.col("body"), 256))
        .dropDuplicates(["source", "body_sha"])
    )
    agg = dd.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
    out = run_to_completion(agg, "stream_web_extract_dedup_sink")
    return out.select("source", "n_docs", "total_words")


def _web_stream_classified_oracle() -> str:
    from mincemeatpy_spark.text.classifier import (
        _ORACLE_TRAIN_CTES,
        _oracle_feat_cte,
        _oracle_score_cte,
    )
    from mincemeatpy_spark.text.html_extract import (
        _HTML_SYNTH_SQL,
        _oracle_extract_cte,
    )

    return f"""
        WITH {_oracle_extract_cte(
            f"SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM documents"
        )},
        j AS (
            SELECT d.source, e.body, e.n_words
            FROM extracted e JOIN documents d USING (doc_id)
            WHERE e.n_words > 0
        ),
        u AS (SELECT DISTINCT source, body, n_words FROM j),
        bodies AS (SELECT DISTINCT body FROM u),
        {_ORACLE_TRAIN_CTES},
        {_oracle_feat_cte("body_feats", "bodies", "body", "body")},
        {_oracle_score_cte("clf_scored", "body_feats")}
        SELECT u.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(u.n_words) AS BIGINT) AS total_words,
               CAST(sum(s.score_scaled) AS BIGINT) AS sum_clf_scaled
        FROM u JOIN clf_scored s ON s.fid = u.body
        WHERE s.score_scaled >= 0
        GROUP BY u.source
        """


@register(
    "stream_web_classified_gate_e2e",
    oracle=_web_stream_classified_oracle(),
    category="streaming",
    doc="The learned quality gate SERVING in a stream — the production "
    "deployment shape for text_quality_classifier: weights train in "
    "BATCH before the stream starts (the bounded model artifact) and "
    "ship into the continuous ingest plan as a broadcast in-plan "
    "vector; pages stream in doubled (two unioned sides — the "
    "planted duplication), are synthesized/extracted in-stream "
    "(stateless codegen), state-store-dedup'd on (source, "
    "sha256(body)), and only THEN classifier-scored — the dedup-"
    "then-score commutation pipeline_web_corpus_classified "
    "establishes (identical bodies score identically), which in a "
    "stream also means the state store, not the model, absorbs the "
    "duplicate mass: each distinct body is featurized and scored "
    "exactly once across the stream's lifetime.  Model-kept docs "
    "roll into per-source doc/word/score totals that must hash-match "
    "the batch DISTINCT+score oracle.  Dedup state is O(distinct "
    "digests); scoring is stateless scan-side codegen between the "
    "two stateful operators.",
)
def stream_web_classified_gate_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mincemeatpy_spark.streaming.stream_ops import (
        documents_stream,
        run_to_completion,
    )
    from mincemeatpy_spark.text.classifier import (
        _BIGRAM_EXPR,
        _clf_weights,
        _feature_cols,
        _score_cols,
    )
    from mincemeatpy_spark.text.html_extract import (
        _HTML_SYNTH_SQL,
        extract_text_cols,
    )

    weights = _clf_weights(spark, sf_dir)  # batch-trained, pre-stream

    def side():
        docs = documents_stream(spark, sf_dir).select(
            "doc_id", "source", F.expr(_HTML_SYNTH_SQL).alias("html")
        )
        cols = extract_text_cols(F.col("html"))
        return docs.select(
            "source",
            cols["body"].alias("body"),
            cols["n_words"].alias("n_words"),
        ).filter(F.col("n_words") > 0)

    dd = (
        side()
        .unionAll(side())
        .withColumn("body_sha", F.sha2(F.col("body"), 256))
        .dropDuplicates(["source", "body_sha"])
    )
    featd = dd.select(
        "source", "n_words", _feature_cols(F.col("body")).alias("toks")
    ).select(
        "source",
        "n_words",
        F.concat(F.col("toks"), F.expr(_BIGRAM_EXPR)).alias("feats"),
    )
    sc = _score_cols(F.col("feats"), weights)
    kept = featd.select(
        "source", "n_words", sc["score_scaled"].alias("clf")
    ).filter(F.col("clf") >= 0)
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("clf").cast("bigint").alias("sum_clf_scaled"),
    )
    out = run_to_completion(agg, "stream_web_classified_gate_sink")
    return out.select("source", "n_docs", "total_words", "sum_clf_scaled")
