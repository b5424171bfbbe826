"""Streaming layer (SURVEY.md §2 K-rows).

The reference analog is tropology's continuous crawl loop — periodic
batches driven by the schedule query (``core.clj`` — reconstructed,
SURVEY.md §3.3).  Per the survey's batch-twin-first strategy, each
windowed aggregation is implemented twice:

* a **batch twin** registered in ``queries()`` with a full DuckDB
  oracle (this module's ``@register`` functions), and
* a **streaming builder** (``stream_*`` functions) applying the same
  logic to an unbounded DataFrame; pytest runs them with
  ``trigger(availableNow=True)`` and asserts equality with the twin
  (tests/test_streaming.py).

Scale posture: watermarks bound state exactly where tropology bounds
re-crawl recency; session windows use Spark's native session_window
state merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.functions.exact import sql_ts_str, ts_str
from tropology_spark.registry import register
from tropology_spark.sources.tables import load

_VAL_MICROS = "CAST(round(value * 1000000.0) AS BIGINT)"


def _tumbling_agg(df: DataFrame, window_expr) -> DataFrame:
    """Shared agg shape for K1/K2: count + micro-exact value sum."""
    micros = F.round(F.col("value") * 1000000.0).cast("long")
    return (
        df.groupBy(window_expr.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(micros) / F.lit(1000000.0), 6).alias("total_value"),
        )
        .select(
            ts_str(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_tumbling_1h",
    oracle=f"""
    SELECT {sql_ts_str("date_trunc('hour', ts)")} AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum({_VAL_MICROS}) AS DOUBLE) / 1000000.0, 6) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 batch twin — tumbling 1-hour windows.  Spark's window() is
    epoch-aligned half-open [start, start+1h), identical to
    date_trunc('hour')."""
    e = load(spark, sf_dir, "events")
    return _tumbling_agg(e, F.window("ts", "1 hour"))


@register(
    "stream_sliding_1h_30m",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
               AS window_start, event_type, value
      FROM events
    )
    SELECT {sql_ts_str('window_start')} AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum({_VAL_MICROS}) AS DOUBLE) / 1000000.0, 6) AS total_value
    FROM assigned
    GROUP BY window_start, event_type
    """,
)
def stream_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 batch twin — sliding 1h windows every 30m; each event belongs
    to exactly two windows (the oracle materializes both
    assignments)."""
    e = load(spark, sf_dir, "events")
    return _tumbling_agg(e, F.window("ts", "1 hour", "30 minutes"))


@register(
    "stream_sessionize_30m",
    oracle="""
    WITH secs AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, sec,
             CASE WHEN sec - lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
      FROM secs
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, sec,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
      FROM flagged
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           min(sec) AS session_start,
           max(sec) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def stream_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 batch twin — 30-minute-gap sessionization via the classic
    lag → gap flag → running sum pattern.  Timestamps are truncated to
    epoch seconds (identically in both engines) so gap arithmetic is
    pure integers."""
    e = load(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id", "event_id", sec.alias("sec"), "ts"
    ).withColumn(
        "new_session",
        F.when(
            (F.col("sec") - F.lag("sec").over(w_lag)).isNull()
            | ((F.col("sec") - F.lag("sec").over(w_lag)) > 1800),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w_run).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.min("sec").alias("session_start"),
        F.max("sec").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# Streaming builders (K1-K7) — applied to unbounded DataFrames in tests.
# --------------------------------------------------------------------------

def stream_tumbling(events: DataFrame) -> DataFrame:
    """K1 streaming side: identical logic over an unbounded source."""
    return _tumbling_agg(events, F.window("ts", "1 hour"))


def stream_sliding(events: DataFrame) -> DataFrame:
    """K2 streaming side."""
    return _tumbling_agg(events, F.window("ts", "1 hour", "30 minutes"))


def stream_sessions(events: DataFrame) -> DataFrame:
    """K3 streaming side: native session windows (30-min gap) with a
    watermark bounding state."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "n_events",
        )
    )


def stream_window_counts(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """M124 streaming side: watermarked tumbling per-type counts —
    append-mode streamable; the top-k rank over each CLOSED window is
    applied downstream (foreachBatch / the batch twin), because a rank
    inside an open window is not incrementally maintainable."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            ts_str(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def stream_watermark_tumbling(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """K4: tumbling agg with watermark — late rows beyond ``delay`` are
    dropped once the watermark passes (observable only in streaming;
    exercised with out-of-order micro-batches in tests)."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def stream_dedup(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """K5: exactly-once event stream via keyed dedup + watermark (the
    re-crawl idempotency analog)."""
    return events.withWatermark("ts", delay).dropDuplicates(["event_id"])


def stream_running_count(events: DataFrame) -> DataFrame:
    """K6: stateful running count per user (update-mode output; batch
    twin is win_running_sum's count shape)."""
    return events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))


def stream_stateful_crawl_scheduler(events: DataFrame) -> DataFrame:
    """K6+ — CUSTOM stateful operator via ``applyInPandasWithState``:
    the re-crawl scheduler as a per-user state machine (tropology's
    `next_update` backoff bookkeeping, SURVEY.md §3.3, as a stream).

    State per user = (n_events, last_sec).  Each micro-batch folds its
    rows into the state and emits the refreshed schedule row:
    ``next_update_sec = last_sec + min(3600 * n_events, 86400)`` — the
    linear-to-capped backoff shape.  This is the escape hatch for
    stateful logic Spark's built-in windows can't express (arbitrary
    per-key transition functions); state lives in the executor state
    store, bounded here by key cardinality (users), at scale by a
    timeout (GroupStateTimeout) — the watermark analog for custom
    state.  Arrow-batched: the Python transition cost is per GROUP per
    BATCH, not per row."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, n_events long, last_sec long, next_update_sec long"
    )
    state_schema = "n_events long, last_sec long"

    def update(key, pdfs, state):
        n, last = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            last = max(last, int(pdf["sec"].max()))
        state.update((n, last))
        backoff = min(3600 * n, 86400)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "last_sec": [last],
                "next_update_sec": [last + backoff],
            }
        )

    return (
        events.select("user_id", F.unix_timestamp("ts").alias("sec"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def stream_stateful_scheduler_tws(events: DataFrame) -> DataFrame:
    """K6+ twin on the NEWER stateful API (`transformWithStateInPandas`,
    Spark 4): the same per-user crawl-scheduler state machine as
    ``stream_stateful_crawl_scheduler``, expressed as a
    ``StatefulProcessor`` with an explicit named ValueState.

    The two APIs are semantically equivalent here (tests assert equal
    outputs); transformWithState adds what the scheduler would use
    next at scale — timers (emit a due-list WITHOUT waiting for the
    user's next event) and state TTL (drop users idle past the
    re-crawl horizon) — so this is the forward path, kept alongside
    the stable API.

    Env gate: the transformWithState streaming runner is a separate
    Python driver process that imports google.protobuf at init; where
    that package is broken the query crashes at start (SQLSTATE XXKST)
    — the parity test skips itself in that case and
    ``stream_stateful_crawl_scheduler`` remains the tested path."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("n_events", LongType(), False),
            StructField("last_sec", LongType(), False),
            StructField("next_update_sec", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_events", LongType(), False),
            StructField("last_sec", LongType(), False),
        ]
    )

    class SchedulerProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("sched", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, last = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                last = max(last, int(pdf["sec"].max()))
            self._state.update((n, last))
            backoff = min(3600 * n, 86400)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "last_sec": [last],
                    "next_update_sec": [last + backoff],
                }
            )

        def close(self) -> None:
            # StatefulProcessor requires close(); all state lives in
            # the store handle, so there is nothing to release here.
            pass

    return (
        events.select("user_id", F.unix_timestamp("ts").alias("sec"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SchedulerProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """K7: stream-static enrichment join (stream events ⋈ static dim).
    The static side is broadcast per micro-batch."""
    return events.join(
        F.broadcast(customer.select(F.col("c_custkey"), F.col("c_mktsegment"))),
        events.user_id == F.col("c_custkey"),
        "left",
    ).select(
        "event_id",
        "user_id",
        F.coalesce(F.col("c_mktsegment"), F.lit("unknown")).alias("segment"),
    )


# --------------------------------------------------------------------------
# K8 — stream-stream interval join
# --------------------------------------------------------------------------

_SSJOIN_LOOKBACK_SEC = 3600


@register(
    "stream_interval_join",
    oracle=f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS click_id, ts AS click_ts FROM events
          WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           CAST(count(*) AS BIGINT) AS n_clicks_prior_1h
    FROM p JOIN c
      ON c.user_id = p.user_id
     AND c.click_ts <= p.ts
     AND c.click_ts >= p.ts - INTERVAL {_SSJOIN_LOOKBACK_SEC} SECONDS
    GROUP BY p.event_id, p.user_id
    """,
)
def stream_interval_join(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """K8 batch twin — every (purchase, click-within-preceding-hour)
    pair per user, aggregated to a per-purchase click count.  The
    ALL-matches complement of M55's last-touch pick; in streaming form
    this is Spark's stream-stream inner join, where the time-bound
    condition is what lets both sides expire state (clicks older than
    the watermark + lookback can never match a future purchase).

    Scale: both sides pre-filter to their event subset and shuffle
    once on user_id; state per key is bounded by the 1-hour lookback ×
    click rate — the watermark contract, not a heuristic.

    ``events=`` substitutes the event frame — (event_id, user_id, ts,
    event_type) — for the weak-scaling probe (tools/scale_probes/
    streaming_scale.py, disjoint user populations); the driver
    contract never passes it."""
    ev = events if events is not None else load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("click_ts") <= F.col("ts"))
            & (
                F.col("click_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {_SSJOIN_LOOKBACK_SEC} SECONDS")
            ),
        )
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_prior_1h"))
    )


def stream_stream_interval_join(
    clicks: DataFrame, purchases: DataFrame, delay: str = "1 hour"
) -> DataFrame:
    """K8 streaming side — stream-stream inner join of two unbounded
    sources.  Both sides carry watermarks; the interval condition gives
    the state store an expiry bound (a click's join window closes once
    the purchase watermark passes click_ts + lookback).  Output is the
    matched pair stream in append mode; the test aggregates it and
    compares against the registered batch twin."""
    c = clicks.withWatermark("ts", delay).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", delay).select("event_id", "user_id", "ts")
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("ts"))
        & (
            F.col("click_ts")
            >= F.col("ts") - F.expr(f"INTERVAL {_SSJOIN_LOOKBACK_SEC} SECONDS")
        ),
    ).select("event_id", "user_id", "click_id")


# ---------------------------------------------------------------------------
# M113 — watermark late-drop as a declared deterministic replay (K4)
# ---------------------------------------------------------------------------

_LATE_DELAY_MIN = 10  # watermark delay (minutes), matches the K4 builder


@register(
    "stream_latedrop_1h",
    oracle=f"""
    WITH wm AS (
      SELECT event_id, ts, event_type,
             max(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS max_seen
      FROM events
    ),
    kept AS (
      SELECT * FROM wm
      WHERE max_seen IS NULL
         OR ts >= max_seen - INTERVAL {_LATE_DELAY_MIN} MINUTE
    )
    SELECT {sql_ts_str("date_trunc('hour', ts)")} AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM kept
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_latedrop_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M113 — K4's watermark late-drop semantics as a DECLARED query:
    replaying the event log in arrival order (event_id — the append
    sequence), a row is late iff its event time trails the
    high-watermark of everything that arrived strictly before it by
    more than the delay.  Survivors aggregate into the K1 tumbling
    windows.  This is the per-row-granularity watermark (streaming
    applies it per micro-batch, dropping a subset of these rows —
    the builder's behavior is pinned separately in
    tests/test_streaming.py); the declared twin makes the late-drop
    POLICY itself oracle-checkable.

    Scale: one global arrival-order running max — in production this
    is per-partition state (watermarks are maintained per source
    partition), so the single-ordering window here is the fixture
    framing, not the cluster plan."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy(F.pmod(F.col("event_id"), F.lit(1)))
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm = e.select(
        "event_id",
        "ts",
        "event_type",
        F.max("ts").over(w).alias("max_seen"),
    )
    kept = wm.filter(
        F.col("max_seen").isNull()
        | (F.col("ts") >= F.col("max_seen") - F.expr(f"INTERVAL {_LATE_DELAY_MIN} MINUTES"))
    )
    return (
        kept.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("win_start"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            ts_str(F.col("win_start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "stream_window_topk_1h",
    oracle=f"""
    WITH c AS (
      SELECT {sql_ts_str("date_trunc('hour', ts)")} AS window_start,
             event_type, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY window_start
                                       ORDER BY n_events DESC, event_type) AS rk
          FROM c) t
    WHERE rk <= 3
    """,
)
def stream_window_topk_1h(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M124 batch twin — top-3 event types per tumbling hour.  The
    streaming half is ``stream_window_counts`` (watermarked windowed
    counts, append mode); the rank runs over closed windows — exactly
    what a foreachBatch sink or this batch query computes.  Rank is on
    exact integer counts with the unique event_type tie-break (no float
    anywhere).  Scale: one shuffle on (window, type) with map-side
    combine, then a per-window rank over at most |event_types| rows.

    ``events=`` substitutes the event frame for the weak-scaling probe
    (tools/scale_probes/streaming_scale.py); the driver contract never
    passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    c = (
        e.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            ts_str(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return c.withColumn("rk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rk") <= 3
    )


@register(
    "stream_dedup_counts",
    oracle=f"""
    WITH d AS (
      SELECT event_type, min(ts) AS ts
      FROM events GROUP BY event_id, event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_unique_events,
           {sql_ts_str("min(ts)")} AS first_ts
    FROM d GROUP BY event_type
    """,
)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M132 — batch twin of the K5 streaming dedup (stream_dedup:
    watermarked dropDuplicates on event_id): unique-event counts per
    type after exactly-once dedup.  The fixture has no duplicate
    event_ids, so dedup-by-min-ts is deterministic regardless of which
    physical copy survives — and the oracle's group-then-count form is
    what a foreachBatch sink aggregates after the streaming dedup.
    Gives the K5 family a driver-checkable oracle row where it
    previously had only the harness test."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy("event_id", "event_type").agg(F.min("ts").alias("ts"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique_events"),
        ts_str(F.min("ts")).alias("first_ts"),
    )


@register(
    "stream_running_counts",
    oracle="""
    SELECT user_id, event_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS n_so_far
    FROM events
    """,
)
def stream_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M136 — batch twin of the K6 stateful running count
    (``stream_running_count``: per-user count in update mode): the full
    update-mode EMISSION HISTORY — one row per event carrying the
    count-so-far for its user at that point in event order (ts with the
    unique event_id tie-break).  The last row per user equals the K6
    builder's final state, which tests/test_streaming.py pins against
    the streaming run; this declared form makes the per-update
    trajectory itself oracle-checkable.  Scale: one hash partition by
    user plus an in-partition sort — the same state layout the
    streaming operator keeps, with no global ordering anywhere."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("n_so_far"),
    )


@register(
    "stream_static_join_counts",
    oracle="""
    SELECT coalesce(c.c_mktsegment, 'unknown') AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M137 — batch twin of the K7 stream-static enrichment join,
    built THROUGH the K7 builder itself (``stream_static_join`` on the
    batch frames — identical join, broadcast hint, and
    unknown-segment coalesce), then aggregated to per-segment event and
    distinct-user counts: what a foreachBatch sink would maintain from
    the enriched stream.  Gives K7 a driver-checkable oracle row where
    it previously had only the harness test.  Scale: the dim side is
    the explicit broadcast the streaming form re-ships per micro-batch;
    the agg is one map-side-combinable shuffle on segment."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    enriched = stream_static_join(e, c)
    return enriched.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def stream_sliding_distinct(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """K2+ — the STREAMING twin of M218 (`ts_sliding_distinct`):
    sliding 3h/1h DISTINCT users per event type, as a CHAINED stateful
    pipeline (two stateful operators in one query — supported since
    Spark 3.5 for time-window chains): stage 1 collapses each
    (type, window, user) to one row (the windowed per-user count —
    distinct state cannot subtract, so the slide replicates each
    observation into its 3 covering windows exactly like the batch
    rewrite's hour-offset explode), stage 2 counts the surviving
    users per (type, window).

    State contract: stage 1 holds ≤ 3 live windows per (type, user)
    and both stages expire with the watermark; append mode emits a
    window once the watermark passes its end.  Equality with the
    batch twin (same builder on a batch frame, restricted to
    watermark-closed windows) and the label-hour mapping onto the
    registered M218 query are pinned by tests/test_streaming.py."""
    w1 = (
        events.withWatermark("ts", delay)
        .groupBy(
            "event_type",
            F.window("ts", "3 hours", "1 hour").alias("window"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return w1.groupBy("event_type", "window").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users_3h")
    )


def stream_asof_tolerance(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """K8+ — the STREAMING twin of M217 (`join_asof_tolerance`): for
    each purchase, the same user's latest view no staler than 30
    minutes, as a stream-stream LEFT OUTER interval join (both sides
    watermarked; the outer side emits its null-padded row once the
    watermark proves no match can still arrive — the sentinel
    semantics of the batch op, produced by time instead of by a
    left join) CHAINED into a time-windowed max_by aggregation that
    picks the latest candidate per purchase (struct(v_ts, v_id) max —
    the batch op's exact tie-break).

    State contract: view state expires at watermark + 30 min (the
    interval bound — C9's unbounded as-of could never expire it),
    purchase groups close with their 1-hour window.  Equality with
    the registered M217 rows on watermark-closed windows is pinned by
    tests/test_streaming.py."""
    v = (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", delay)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("v_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", delay)
        .select(F.col("event_id").alias("purchase_id"), "user_id", "ts")
    )
    j = p.join(
        v,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("ts"))
        & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    return (
        j.groupBy(F.window("ts", "1 hour").alias("w"), "purchase_id", "user_id")
        .agg(F.max(F.struct(F.col("v_ts"), F.col("v_id"))).alias("best"))
        .select(
            "purchase_id",
            "user_id",
            F.col("best.v_ts").alias("last_view_ts"),
            F.col("best.v_id").alias("last_view_id"),
        )
    )
