"""Time-series operators (SURVEY.md §2.M M40, M57, M58) — resample +
gap-fill, batch sessionization, and exact EWMA smoothing over the
``events`` stream.

The windowed aggregations (K1-K3) report only buckets that contain
events; monitoring/teaching pipelines need the DENSE series — every
bucket in range, zero-filled where nothing happened (a dashboard gap
and a zero are different facts).  The classic spine pattern: generate
the complete bucket range, cross it with the key domain, left-join the
sparse aggregate.

Scale notes (§7.7): the spine is O(range/step × keys) — metadata-sized
next to the fact table, built with ``sequence``/``explode`` on the
driver-free path and broadcast into the join; the sparse aggregate is
the usual map-side-combinable groupBy.  The facts are scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.functions.exact import sql_ts_str, ts_str
from tropology_spark.registry import register
from tropology_spark.session import iter_materialize
from tropology_spark.sources.tables import load


@register(
    "ts_resample_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.bucket, k.event_type
      FROM (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
            FROM bounds) t,
           (SELECT DISTINCT event_type FROM events) k
    ),
    sparse AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT {sql_ts_str('s.bucket')} AS bucket, s.event_type,
           coalesce(sp.n_events, 0) AS n_events
    FROM spine s LEFT JOIN sparse sp
      ON s.bucket = sp.bucket AND s.event_type = sp.event_type
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M40 — dense hourly resample of the event stream per event type,
    zero-filling empty buckets.  The bucket spine spans
    [trunc(min ts), trunc(max ts)] inclusive — both engines build the
    identical closed range — and bucket keys are second-granularity
    strings (the K1 timestamp convention)."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    sparse = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        spine.join(sparse, ["bucket", "event_type"], "left")
        .select(
            ts_str(F.col("bucket")).alias("bucket"),
            "event_type",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# M57 — batch sessionization (the K3 session-window semantics, batch form)
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap, in µs

#: Shared oracle CTE chain ending in ``spans(user_id, sess_seq,
#: start_us, end_us, n_events)`` — the single SQL home of the M57
#: session arithmetic, composed by the M57 oracle and the staged
#: session-overlap join (the _minhash_bands_cte discipline).
SESS_SPANS_SQL = f"""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL
                       OR us - prev_us > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM t
    ),
    sess AS (
      SELECT user_id, us,
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM flagged
    ),
    spans AS (
      SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
             CAST(min(us) AS BIGINT) AS start_us,
             CAST(max(us) AS BIGINT) AS end_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, sess_seq
    )
"""


@register(
    "ts_sessionize",
    oracle=SESS_SPANS_SQL
    + """
    SELECT user_id, sess_seq, n_events,
           CAST(end_us - start_us AS BIGINT) AS duration_us
    FROM spans
    """,
)
def ts_sessionize(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M57 — gap-based sessionization in batch: a new session starts
    when a user is silent for more than 30 minutes; each session
    reports its event count and exact µs duration.  The batch twin of
    the K3 streaming session window (streaming/jobs.py), so the two
    surfaces can be reconciled.

    Determinism: all arithmetic is on exact µs integers (the loader's
    ns→µs contract); ordering ties break on the unique event_id.
    Scale: one shuffle on user_id covers the lag, the running sum and
    the final per-session aggregate — the window partitioning is
    reused across all three steps in a single stage.  ``events``
    substitutes a pre-built (user_id, event_id, ts) frame for the
    table scan (scale probes)."""
    spans = session_spans(spark, sf_dir, events=events)
    return spans.select(
        "user_id",
        "sess_seq",
        "n_events",
        (F.col("end_us") - F.col("start_us")).cast("bigint").alias("duration_us"),
    )


def session_spans(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """The M57 session arithmetic's single Spark home: per-session
    ``(user_id, sess_seq, start_us, end_us, n_events)`` — composed by
    the registered M57 query (duration = end − start) and the staged
    session-overlap join.  ``SESS_SPANS_SQL`` is its oracle twin."""
    ev = events if events is not None else load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = ev.select("user_id", "event_id", us.alias("us")).withColumn(
        "prev_us", F.lag("us").over(order)
    )
    flagged = t.withColumn(
        "new_sess",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_seq",
        F.sum("new_sess").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy(
        "user_id", F.col("sess_seq").cast("bigint").alias("sess_seq")
    ).agg(
        F.min("us").cast("bigint").alias("start_us"),
        F.max("us").cast("bigint").alias("end_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# M58 — EWMA smoothing with dyadic weights (exact integer arithmetic)
# ---------------------------------------------------------------------------

_EWMA_TAPS = 8  # alpha = 1/2, truncated to 8 lags


@register(
    "ts_ewma",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id, event_id,
           CAST({' + '.join(
               f"coalesce(lag(cents, {j}) OVER (PARTITION BY user_id "
               f"ORDER BY ts, event_id), 0) * {1 << (_EWMA_TAPS - 1 - j)}"
               for j in range(_EWMA_TAPS)
           )} AS BIGINT) AS ewma_x256
    FROM c
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M58 — exponentially-weighted moving average (alpha = 1/2) of the
    per-user event value, truncated to {t} taps.  Because the weights
    are dyadic (128, 64, …, 1 over cents integers) the whole smoothing
    is EXACT integer arithmetic scaled by 256 — the one EWMA a
    cross-engine hash gate can check bit-for-bit, sidestepping the
    float-recurrence order-dependence that makes general EWMA
    undeclarable under the exactness rules (functions/exact.py).

    Scale: one shuffle on user_id; all {t} lags share a single window
    ordering, so Spark evaluates them in one window stage."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    acc = F.lit(0)
    for j in range(_EWMA_TAPS):
        weight = 1 << (_EWMA_TAPS - 1 - j)
        acc = acc + F.coalesce(F.lag("cents", j).over(w), F.lit(0)) * weight
    return c.select("user_id", "event_id", acc.cast("bigint").alias("ewma_x256"))


# ---------------------------------------------------------------------------
# M68 — exact anomaly top-k (deviation from the per-group median)
# ---------------------------------------------------------------------------

_ANOMALY_TOPK = 5


@register(
    "ts_anomaly_topk",
    oracle=f"""
    WITH c AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ),
    med AS (
      SELECT event_type, cents AS median_cents
      FROM ranked WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT c.event_id, c.event_type, c.cents, m.median_cents,
             abs(c.cents - m.median_cents) AS deviation_cents
      FROM c JOIN med m USING (event_type)
    )
    SELECT event_id, event_type, cents, median_cents, deviation_cents,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY deviation_cents DESC, event_id) AS rk
          FROM dev) t
    WHERE rk <= {_ANOMALY_TOPK}
    """,
)
def ts_anomaly_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M68 — exact outlier detection: the {k} events per type whose
    value deviates most from the group's lower median (M59's exact
    order statistic).  Median-absolute-deviation scoring with every
    quantity an integer — the z-score's robust cousin, and the variant
    that is cross-engine hashable (a float stddev threshold is not,
    because a boundary-straddling score flips between engines).

    Scale: the medians are one windowed pass (or a two-pass histogram
    select at extreme group sizes — see agg_median_mode); they
    broadcast back onto the scan, and the top-k rank shuffles once on
    event_type."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        c.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("cents").alias("median_cents"))
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "cents",
        "median_cents",
        F.abs(F.col("cents") - F.col("median_cents")).alias("deviation_cents"),
    )
    wk = Window.partitionBy("event_type").orderBy(
        F.col("deviation_cents").desc(), F.col("event_id")
    )
    return dev.withColumn("rk", F.row_number().over(wk).cast("bigint")).filter(
        F.col("rk") <= _ANOMALY_TOPK
    )


# ---------------------------------------------------------------------------
# M69 — consecutive-sequence pattern match (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

_PATTERN = ("view", "click", "purchase")


@register(
    "ts_pattern_triples",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches
    FROM seq
    WHERE event_type = '{_PATTERN[0]}' AND t1 = '{_PATTERN[1]}'
      AND t2 = '{_PATTERN[2]}'
    GROUP BY user_id
    """,
)
def ts_pattern_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M69 — event-sequence pattern matching: per user, how many times
    the exact consecutive pattern {p} occurs in their timeline — the
    core of SQL-2016 MATCH_RECOGNIZE (which neither engine ships)
    expressed with lead() self-alignment: a row matches when it and
    its next two events spell the pattern.  Overlapping matches count
    (standard AFTER MATCH SKIP TO NEXT ROW semantics).

    Ordering uses the unique (ts, event_id); output is integer counts.
    Scale: one shuffle on user_id; both leads share one window
    ordering, and the filter + count collapse into the same stage —
    the pattern length extends by adding leads, not joins."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == _PATTERN[0])
            & (F.col("t1") == _PATTERN[1])
            & (F.col("t2") == _PATTERN[2])
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


# ---------------------------------------------------------------------------
# M72 — gaps-and-islands: maximal consecutive runs of one event type
# ---------------------------------------------------------------------------


@register(
    "ts_runs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rt
      FROM events
    )
    SELECT user_id, event_type,
           CAST(rn - rt AS BIGINT) AS run_key,
           CAST(count(*) AS BIGINT) AS run_len,
           CAST(min(event_id) AS BIGINT) AS first_event_id
    FROM seq
    GROUP BY user_id, event_type, rn - rt
    """,
)
def ts_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M72 — gaps-and-islands: every MAXIMAL run of consecutive
    same-type events per user, via the classic row_number-difference
    trick (rn over the timeline minus rn over the per-type subsequence
    is constant exactly within a consecutive run).  The value-change
    sibling of M57's time-gap sessionization: together they cover both
    standard island definitions.

    All keys are integers; ordering uses the unique (ts, event_id).
    Scale: both row_numbers and the final aggregate ride one user_id
    shuffle (the per-(user, type) window is a finer partitioning of
    the same exchange)."""
    ev = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.row_number().over(w_all).alias("rn"),
        F.row_number().over(w_typ).alias("rt"),
    )
    return (
        seq.groupBy(
            "user_id",
            "event_type",
            (F.col("rn") - F.col("rt")).cast("bigint").alias("run_key"),
        )
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# M74 — OHLC bars (open/high/low/close per hour)
# ---------------------------------------------------------------------------


@register(
    "ts_ohlc_hourly",
    oracle=f"""
    WITH c AS (
      SELECT date_trunc('hour', ts) AS bucket, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    rn AS (
      SELECT bucket, cents,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY ts, event_id) AS r_open,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY ts DESC, event_id DESC) AS r_close
      FROM c
    )
    SELECT {sql_ts_str('bucket')} AS bucket,
           CAST(max(CASE WHEN r_open = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN r_close = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT) AS n_events
    FROM rn GROUP BY bucket
    """,
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M74 — OHLC candlestick bars: per hour, the first (open), max
    (high), min (low) and last (close) event value in cents — the
    financial-rollup shape.  First/last are row_number picks over the
    unique (ts, event_id) ordering folded into the same aggregate as
    the min/max (conditional agg, no join).

    Scale: one shuffle on the bucket key; both row_number directions
    and the final aggregate share that partitioning, and bars are
    bounded by the time range, not the event count."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w_open = Window.partitionBy("bucket").orderBy("ts", "event_id")
    w_close = Window.partitionBy("bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = c.select(
        "bucket",
        "cents",
        F.row_number().over(w_open).alias("r_open"),
        F.row_number().over(w_close).alias("r_close"),
    )
    return rn.groupBy("bucket").agg(
        F.max(F.when(F.col("r_open") == 1, F.col("cents"))).cast("bigint").alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max(F.when(F.col("r_close") == 1, F.col("cents"))).cast("bigint").alias("close_cents"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        ts_str(F.col("bucket")).alias("bucket"),
        "open_cents",
        "high_cents",
        "low_cents",
        "close_cents",
        "n_events",
    )


# ---------------------------------------------------------------------------
# M88 — CUSUM changepoint detection (exact integer form)
# ---------------------------------------------------------------------------


@register(
    "ts_cusum_changepoint",
    oracle=f"""
    WITH c AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    seq AS (
      SELECT event_type, ts,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS i,
             sum(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS prefix,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(cents) OVER (PARTITION BY event_type) AS total
      FROM c
    ),
    scored AS (
      SELECT event_type, ts, i, n,
             CAST(n * prefix - i * total AS BIGINT) AS cusum_scaled
      FROM seq
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CAST(i AS BIGINT) AS cp_index,
           {sql_ts_str('ts')} AS cp_ts,
           cusum_scaled
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(cusum_scaled) DESC, i) AS rk
          FROM scored) t
    WHERE rk = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M88 — CUSUM changepoint per event type: the index where the
    cumulative deviation from the series mean peaks.  The textbook
    statistic max_i |prefix_i - i*mean| is float; multiplying through
    by n gives |n*prefix_i - i*total| — BIGINT-exact over cents, so
    the argmax is deterministic (unique (|score| desc, i) ordering).

    Scale: one shuffle on event_type, then two window passes over each
    sorted partition; per-key state is a running sum — the same shape
    Spark executes for any ranked window (SURVEY.md §2 E4)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type")
    seq = ev.select(
        "event_type",
        "ts",
        F.row_number().over(wo).alias("i"),
        F.sum("cents")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("prefix"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("cents").over(wp).alias("total"),
    )
    scored = seq.select(
        "event_type",
        "ts",
        "i",
        "n",
        (F.col("n") * F.col("prefix") - F.col("i") * F.col("total"))
        .cast("bigint")
        .alias("cusum_scaled"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("i")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("i").cast("bigint").alias("cp_index"),
            ts_str(F.col("ts")).alias("cp_ts"),
            "cusum_scaled",
        )
    )


# ---------------------------------------------------------------------------
# M98 — seasonal (day-of-week × hour) activity profile
# ---------------------------------------------------------------------------


@register(
    "ts_seasonal_profile",
    oracle="""
    SELECT event_type,
           CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    GROUP BY event_type, isodow(ts), hour(ts)
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M98 — the seasonality heatmap behind every ops dashboard:
    activity and value by (ISO weekday × hour-of-day) per event type.
    Spark's weekday() is Monday=0, DuckDB's isodow is Monday=1 — the
    +1 below aligns them; values sum as cents (the float invariant).

    Scale: a single map-side-combinable aggregate onto a 7×24×types
    result — the canonical low-cardinality rollup."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# M101 — autocorrelation terms at lags 1..3, integer-exact co-moments
# ---------------------------------------------------------------------------


@register(
    "ts_acf_terms",
    oracle="""
    WITH x AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
      FROM events
    ),
    lagd AS (
      SELECT event_type, c AS head,
             lag(c, 1) OVER w AS t1,
             lag(c, 2) OVER w AS t2,
             lag(c, 3) OVER w AS t3
      FROM x WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    u AS (
      SELECT event_type, 1 AS lag_k, head, t1 AS tail FROM lagd WHERE t1 IS NOT NULL
      UNION ALL
      SELECT event_type, 2, head, t2 FROM lagd WHERE t2 IS NOT NULL
      UNION ALL
      SELECT event_type, 3, head, t3 FROM lagd WHERE t3 IS NOT NULL
    ),
    t AS (
      SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(head * tail) AS BIGINT) AS s_xy,
             CAST(sum(head) AS BIGINT) AS s_h,
             CAST(sum(tail) AS BIGINT) AS s_t,
             CAST(sum(head * head) AS BIGINT) AS s_hh,
             CAST(sum(tail * tail) AS BIGINT) AS s_tt
      FROM u GROUP BY event_type, lag_k
    )
    SELECT event_type, lag_k, m, s_xy, s_h, s_t, s_hh, s_tt,
           (CAST(m AS DOUBLE) * s_xy - CAST(s_h AS DOUBLE) * s_t)
           / sqrt((CAST(m AS DOUBLE) * s_hh - CAST(s_h AS DOUBLE) * s_h)
                  * (CAST(m AS DOUBLE) * s_tt - CAST(s_t AS DOUBLE) * s_t))
             AS r
    FROM t
    """,
)
def ts_acf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M101 — sample autocorrelation of the per-type value series at
    lags 1..3: the dependence diagnostic run before any forecasting or
    sampling-rate decision.  Every co-moment is an exact BIGINT over
    integer cents (head/tail sums, cross and squared products — cents
    <= ~5.6e4, so even 1e8-row series stay under 2^63); r is ONE
    identical IEEE expression of those exact integers in both engines
    (the graph_assortativity_terms discipline), so the computed double
    is bit-identical — no rounded-value carrier.

    Scale: one shuffle on event_type for the lag window (per-series
    state is three trailing rows), then a map-side-combinable
    aggregate onto a types×3 result."""
    ev = load(spark, sf_dir, "events")
    c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagd = ev.select(
        "event_type",
        c.alias("head"),
        *[F.lag(c, k).over(w).alias(f"t{k}") for k in (1, 2, 3)],
    )
    parts = [
        lagd.filter(F.col(f"t{k}").isNotNull()).select(
            "event_type",
            F.lit(k).cast("bigint").alias("lag_k"),
            "head",
            F.col(f"t{k}").alias("tail"),
        )
        for k in (1, 2, 3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    t = u.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("head") * F.col("tail")).cast("bigint").alias("s_xy"),
        F.sum("head").cast("bigint").alias("s_h"),
        F.sum("tail").cast("bigint").alias("s_t"),
        F.sum(F.col("head") * F.col("head")).cast("bigint").alias("s_hh"),
        F.sum(F.col("tail") * F.col("tail")).cast("bigint").alias("s_tt"),
    )
    m_d = F.col("m").cast("double")
    sh_d = F.col("s_h").cast("double")
    st_d = F.col("s_t").cast("double")
    r = (m_d * F.col("s_xy") - sh_d * F.col("s_t")) / F.sqrt(
        (m_d * F.col("s_hh") - sh_d * F.col("s_h"))
        * (m_d * F.col("s_tt") - st_d * F.col("s_t"))
    )
    return t.select(
        "event_type", "lag_k", "m", "s_xy", "s_h", "s_t", "s_hh", "s_tt",
        r.alias("r"),
    )


# ---------------------------------------------------------------------------
# M109 — maximum drawdown (exact cents)
# ---------------------------------------------------------------------------


@register(
    "ts_drawdown",
    oracle=f"""
    WITH c AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    run AS (
      SELECT event_type, event_id, ts,
             sum(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM c
    ),
    dd AS (
      SELECT event_type, event_id, ts, cum,
             max(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS peak
      FROM run
    )
    SELECT event_type,
           CAST(peak - cum AS BIGINT) AS max_drawdown_cents,
           CAST(peak AS BIGINT) AS peak_cents,
           {sql_ts_str('ts')} AS trough_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY peak - cum DESC, ts, event_id) AS rk
          FROM dd) t
    WHERE rk = 1
    """,
)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M109 — maximum drawdown per event type: the deepest drop of the
    running cents total below its prior peak (the risk metric every
    monitoring/finance series wants).  Running sum and running max are
    both exact BIGINTs over cents; the argmax row is pinned by the
    unique (drawdown desc, ts, event_id) order, so the reported trough
    is deterministic across engines.

    Scale: one shuffle on event_type, two running-window passes and a
    rank — identical shape to the CUSUM statistic (M88)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.sum("cents").over(wo).alias("cum"),
    ).withColumn("peak", F.max("cum").over(wo))
    rk = Window.partitionBy("event_type").orderBy(
        (F.col("peak") - F.col("cum")).desc(), "ts", "event_id"
    )
    return (
        dd.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            (F.col("peak") - F.col("cum")).cast("bigint").alias("max_drawdown_cents"),
            F.col("peak").cast("bigint").alias("peak_cents"),
            ts_str(F.col("ts")).alias("trough_ts"),
        )
    )


# ---------------------------------------------------------------------------
# M110 — winsorization at exact rank-picked percentiles
# ---------------------------------------------------------------------------


@register(
    "ts_winsorize",
    oracle="""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, event_id, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ),
    cuts AS (
      SELECT event_type,
             min(CASE WHEN rn = (n + 99) // 100 THEN cents END) AS lo,
             min(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_type, r.event_id, r.cents,
           CAST(least(greatest(r.cents, c.lo), c.hi) AS BIGINT) AS winsorized_cents,
           CAST(c.lo AS BIGINT) AS lo_cents, CAST(c.hi AS BIGINT) AS hi_cents
    FROM ranked r JOIN cuts c ON r.event_type = c.event_type
    """,
)
def ts_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M110 — outlier clamping at exact discrete percentiles: every
    value is clamped into [p01, p99] of its event type, where the
    cutoffs are the ACTUAL cents values at integer ranks ceil(n/100)
    and ceil(99n/100) (percentile_disc semantics — no interpolation,
    so no float drift; ties broken by event_id make the rank pick
    unique in both engines).

    Scale: one shuffle on event_type for the rank window; the
    two-value-per-group cutoff table broadcasts back onto the rows —
    the standard robust-scaling preprocessing step before training."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    lo_rank = F.floor((F.col("n") + 99) / 100)
    hi_rank = F.floor((99 * F.col("n") + 99) / 100)
    cuts = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("cents"))).alias("lo"),
        F.min(F.when(F.col("rn") == hi_rank, F.col("cents"))).alias("hi"),
    )
    return (
        ranked.join(F.broadcast(cuts), "event_type")
        .select(
            "event_type",
            "event_id",
            "cents",
            F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
            .cast("bigint")
            .alias("winsorized_cents"),
            F.col("lo").cast("bigint").alias("lo_cents"),
            F.col("hi").cast("bigint").alias("hi_cents"),
        )
    )


# ---------------------------------------------------------------------------
# M133 — symbolic sequence encoding (SAX-style, integer quartile bands)
# ---------------------------------------------------------------------------


@register(
    "ts_sax_symbols",
    oracle=f"""
    WITH b AS (
      SELECT user_id, event_id, ts, value,
             ntile(4) OVER (PARTITION BY user_id
                            ORDER BY value, event_id) AS band
      FROM events
    )
    SELECT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           string_agg(CAST(band AS VARCHAR), '' ORDER BY ts, event_id)
             AS symbols,
           CAST(count(*) AS BIGINT) AS n_events
    FROM b GROUP BY user_id, date_trunc('day', ts)
    """,
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M133 — SAX-style symbolic encoding of each user's value stream:
    per-user quartile band (ntile over the EXACT unique ordering
    (value, event_id) — integer ranks, no float z-score, so the
    alphabet is engine-portable), then per (user, day) the bands
    concatenated in time order into a symbol word.  Downstream,
    symbol words feed motif mining / anomaly grep with plain string
    ops.  Both engines implement standard SQL ntile (front-loaded
    remainder), and the unique tie-break makes every band assignment
    deterministic.  Scale: one window shuffle on user_id, one
    (user, day) agg — the words are per-day short; no explosion."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    b = e.withColumn(
        "band",
        F.ntile(4).over(
            Window.partitionBy("user_id").orderBy(F.col("value"), F.col("event_id"))
        ),
    )
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("band")))
    )
    return (
        b.groupBy("user_id", day.alias("day"))
        .agg(
            F.array_join(
                F.transform(ordered, lambda r: r["band"].cast("string")), ""
            ).alias("symbols"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# M144 — cross-series correlation terms (exact integer co-moments)
# ---------------------------------------------------------------------------


@register(
    "ts_corr_terms",
    oracle="""
    WITH h AS (SELECT DISTINCT date_trunc('hour', ts) AS hr FROM events),
    t AS (SELECT DISTINCT event_type FROM events),
    c AS (SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n
          FROM events GROUP BY 1, 2),
    g AS (
      SELECT h.hr, t.event_type, coalesce(c.n, 0) AS n
      FROM h CROSS JOIN t
      LEFT JOIN c ON c.hr = h.hr AND c.event_type = t.event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(a.n) AS BIGINT) AS sum_x,
           CAST(sum(b.n) AS BIGINT) AS sum_y,
           CAST(sum(a.n * b.n) AS BIGINT) AS sum_xy,
           CAST(sum(a.n * a.n) AS BIGINT) AS sum_x2,
           CAST(sum(b.n * b.n) AS BIGINT) AS sum_y2
    FROM g a JOIN g b ON a.hr = b.hr AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def ts_corr_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M144 — cross-series Pearson correlation TERMS between every
    event-type pair's hourly volumes: n, Σx, Σy, Σxy, Σx², Σy² as
    exact integers (the M79 co-moment discipline — the one float
    division happens at the consumer).  Zero-filled on the dense hour
    spine (M40's pattern): absent-hour zeros are load-bearing for
    correlation, not cosmetic.  The co-movement matrix behind
    anomaly attribution ("clicks and errors spike together?").
    Scale: the hourly rollup is one map-side-combinable shuffle; the
    dense grid is |hours|×|types| (metadata-sized) and the pair join
    runs on the tiny type dimension per hour — nothing touches raw
    events twice."""
    e = load(spark, sf_dir, "events")
    # DOUBLE-REFERENCE RULE: c feeds three branches (hour spine, type
    # dim, left join) and g feeds both self-join sides — checkpoint
    # each so the events scan runs ONCE and the metadata-sized grid is
    # not re-derived per branch.
    c = iter_materialize(
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hr"), F.col("event_type")
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    h = c.select("hr").distinct()
    t = c.select("event_type").distinct()
    g = iter_materialize(
        h.crossJoin(F.broadcast(t))
        .join(c, ["hr", "event_type"], "left")
        .select("hr", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )
    a = g.select(
        F.col("hr"), F.col("event_type").alias("type_a"), F.col("n").alias("x")
    )
    b = g.select(
        F.col("hr").alias("hr_b"),
        F.col("event_type").alias("type_b"),
        F.col("n").alias("y"),
    )
    return (
        a.join(b, (F.col("hr") == F.col("hr_b")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("x").cast("bigint").alias("sum_x"),
            F.sum("y").cast("bigint").alias("sum_y"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_x2"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_y2"),
        )
    )


# ---------------------------------------------------------------------------
# M155 — strict local peaks in the hourly series
# ---------------------------------------------------------------------------


@register(
    "ts_peak_hours",
    oracle=f"""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, hr, n,
             lag(n) OVER w AS prev_n,
             lead(n) OVER w AS next_n
      FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    )
    SELECT event_type,
           {sql_ts_str('hr')} AS hour,
           CAST(n AS BIGINT) AS n_events,
           CAST(prev_n AS BIGINT) AS prev_n,
           CAST(next_n AS BIGINT) AS next_n
    FROM x
    WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
      AND n > prev_n AND n > next_n
    """,
)
def ts_peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M155 — STRICT local maxima of each event type's hourly volume
    (n > both neighbors in bucket order; series endpoints excluded):
    the peak-detection primitive under alerting and capacity review,
    complementing M68's deviation top-k (global outliers) with local
    shape.  All integers; the bucket sequence orders uniquely so
    lag/lead are deterministic.  NOTE the gap semantics, pinned by the
    oracle: neighbors are adjacent OBSERVED buckets, not wall-clock
    hours — compose with M40's gap-fill when empty hours should count
    as zero-valued neighbors.  Scale: one map-side-combinable rollup,
    then lag/lead inside each type's partition — no self-join."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    x = c.select(
        "event_type",
        "hr",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    return (
        x.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
        )
        .select(
            "event_type",
            ts_str(F.col("hr")).alias("hour"),
            F.col("n").cast("bigint").alias("n_events"),
            F.col("prev_n").cast("bigint").alias("prev_n"),
            F.col("next_n").cast("bigint").alias("next_n"),
        )
    )


# ---------------------------------------------------------------------------
# M163 — per-session revenue rollup (M57's sessions + micros money)
# ---------------------------------------------------------------------------


@register(
    "ts_session_revenue",
    oracle="""
    WITH secs AS (
      SELECT user_id, event_id, event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN sec - lag(sec) OVER w IS NULL
                       OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
      FROM secs
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 1000000.0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS revenue_micros
    FROM sess GROUP BY user_id, session_idx
    """,
)
def ts_session_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M163 — revenue per SESSION: M57's 30-minute-gap sessionization
    (identical lag → flag → running-sum pipeline, integer seconds)
    rolled up to per-session event count, duration, and µs-exact
    purchase revenue.  Session-level monetization is the unit a
    product review prices ("what is a session worth"), and the
    composition pins that the sessionizer and the money discipline
    work together.  Scale: the M57 plan (one user-partitioned window
    pass) plus the same final groupBy — no new shuffle keys."""
    e = load(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id", "event_id", "event_type", "value", sec.alias("sec"), "ts"
    ).withColumn(
        "new_s",
        F.when(
            (F.col("sec") - F.lag("sec").over(w_lag)).isNull()
            | ((F.col("sec") - F.lag("sec").over(w_lag)) > 1800),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_idx", F.sum("new_s").over(w_run).cast("bigint")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("sec") - F.min("sec")).cast("bigint").alias("duration_sec"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 1000000.0).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("bigint")
        .alias("revenue_micros"),
    )


# ---------------------------------------------------------------------------
# M165 — week-over-week deltas (exact integers, no ratio)
# ---------------------------------------------------------------------------


@register(
    "ts_wow_delta",
    oracle="""
    WITH w AS (
      SELECT event_type,
             CAST((CAST(ts AS DATE) - DATE '2020-01-01') // 7 AS BIGINT) AS week,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, week, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      FROM w
    )
    SELECT event_type,
           CAST(week AS BIGINT) AS week,
           CAST(n AS BIGINT) AS n_events,
           CAST(prev_n AS BIGINT) AS prev_events,
           CAST(n - prev_n AS BIGINT) AS delta
    FROM x WHERE prev_n IS NOT NULL
    """,
)
def ts_wow_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M165 — week-over-week volume deltas per event type (M52's
    integer-week arithmetic; first observed week dropped — no prior).
    Deltas stay RAW integers; the pct-change ratio is deliberately NOT
    emitted because it can be negative and integer division's
    floor-vs-trunc disagreement on negatives (CLAUDE.md round-5 rule)
    would need a shift for zero analytical gain — the consumer divides.
    NOTE the gap semantics (M155's rule): `prev` is the previous
    OBSERVED week.  Scale: one rollup + one lag inside each type's
    partition."""
    e = load(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2020-01-01").cast("date")) / 7
    ).cast("bigint")
    w = e.groupBy(F.col("event_type"), week.alias("week")).agg(
        F.count(F.lit(1)).alias("n")
    )
    win = Window.partitionBy("event_type").orderBy("week")
    x = w.withColumn("prev_n", F.lag("n").over(win))
    return x.filter(F.col("prev_n").isNotNull()).select(
        "event_type",
        F.col("week").cast("bigint").alias("week"),
        F.col("n").cast("bigint").alias("n_events"),
        F.col("prev_n").cast("bigint").alias("prev_events"),
        (F.col("n") - F.col("prev_n")).cast("bigint").alias("delta"),
    )


# ---------------------------------------------------------------------------
# M171 — burst detection (hourly volume vs trailing-24h baseline)
# ---------------------------------------------------------------------------


@register(
    "ts_burst_hours",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, hour, cnt,
             CAST(sum(cnt) OVER tw AS BIGINT) AS trail_sum,
             CAST(count(*) OVER tw AS BIGINT) AS trail_hours
      FROM h
      WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    r AS (
      SELECT event_type, hour, cnt, trail_sum,
             CAST((1000000 * cnt * 24) // trail_sum AS BIGINT) AS burst_ppm,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY (1000000 * cnt * 24) // trail_sum DESC, hour
             ) AS rn
      FROM w WHERE trail_hours = 24
    )
    SELECT event_type, hour, cnt, trail_sum, burst_ppm
    FROM r WHERE rn <= 5
    """,
)
def ts_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M171 — burst detection: for each event type, the 5 hours whose
    volume most exceeds their OWN trailing-24h baseline, scored as
    burst_ppm = (10⁶·cnt·24) div trailing_sum (ratio of the hour to
    the trailing hourly mean, in ppm — all quantities positive
    integers, so DuckDB ``//`` and Spark ``div`` agree).  Hours with
    an incomplete trailing window (fewer than 24 observed hours, i.e.
    the stream head or a data gap) are excluded rather than scored
    against a partial baseline — the M155 gap-semantics rule.

    The hour key is integer ``epoch_us div 3600·10⁶`` so the trailing
    window is a RANGE frame over an integer axis — gaps inside the
    frame shrink the observed-hour count and are detected exactly.

    Scale: the events scan collapses to O(types × hours) immediately
    (map-side combine); both the RANGE frame and the per-type top-5
    rank live inside the event_type partition — one shuffle end to
    end, partitions of ~hours rows."""
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tw = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(-24, -1)
    )
    w = h.select(
        "event_type", "hour", "cnt",
        F.sum("cnt").over(tw).cast("bigint").alias("trail_sum"),
        F.count(F.lit(1)).over(tw).cast("bigint").alias("trail_hours"),
    ).filter(F.col("trail_hours") == 24)
    scored = w.withColumn(
        "burst_ppm",
        F.expr("(1000000 * cnt * 24) div trail_sum").cast("bigint"),
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.desc("burst_ppm"), F.asc("hour")
    )
    return (
        scored.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") <= 5)
        .select("event_type", "hour", "cnt", "trail_sum", "burst_ppm")
    )


# ---------------------------------------------------------------------------
# M181 — coverage-gap report (islands of MISSING hours per stream)
# ---------------------------------------------------------------------------


@register(
    "ts_gap_report",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour
      FROM events
    ),
    g AS (
      SELECT event_type, hour,
             lag(hour) OVER (PARTITION BY event_type ORDER BY hour) AS prev
      FROM h
    )
    SELECT event_type,
           CAST(prev + 1 AS BIGINT) AS gap_start,
           CAST(hour - 1 AS BIGINT) AS gap_end,
           CAST(hour - prev - 1 AS BIGINT) AS gap_hours
    FROM g WHERE prev IS NOT NULL AND hour - prev > 1
    """,
)
def ts_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M181 — the complement of M40: where gapfill papers over missing
    hours, this REPORTS them — per event type, every maximal run of
    hours with zero events (start, end, length), the data-freshness /
    ingest-outage table an ops dashboard renders.  M170's
    gaps-and-islands trick inverted: a single lag() over the observed
    hours finds the island BOUNDARIES, so the missing runs are never
    materialized as rows (no dense spine, unlike M40) — a 3-year gap
    is one row, not 26k spine rows.

    Hour = integer epoch_us div 3600·10⁶ (the M171 axis).  Scale: the
    events scan collapses to distinct (type, hour) immediately; the
    lag lives inside the type partition — one shuffle, then
    O(types × hours) rows."""
    e = load(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("hour"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hour")
    g = h.withColumn("prev", F.lag("hour").over(w))
    return g.filter(
        F.col("prev").isNotNull() & (F.col("hour") - F.col("prev") > 1)
    ).select(
        "event_type",
        (F.col("prev") + 1).cast("bigint").alias("gap_start"),
        (F.col("hour") - 1).cast("bigint").alias("gap_end"),
        (F.col("hour") - F.col("prev") - 1).cast("bigint").alias("gap_hours"),
    )


# ---------------------------------------------------------------------------
# M191 — interval union (merged activity coverage per user)
# ---------------------------------------------------------------------------

_COVER_US = 900 * 1_000_000  # each event covers [ts, ts + 15 min)


@register(
    "ts_coverage_union",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_COVER_US} AS e
      FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             CAST(sum(CASE WHEN prev_max IS NULL OR s > prev_max
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      FROM m
    ),
    u AS (
      SELECT user_id, island,
             CAST(max(e) - min(s) AS BIGINT) AS len_us
      FROM isl GROUP BY user_id, island
    ),
    cov AS (
      SELECT user_id,
             CAST(sum(len_us) AS BIGINT) AS covered_us,
             CAST(count(*) AS BIGINT) AS n_islands
      FROM u GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, covered_us, n_islands
    FROM cov ORDER BY covered_us DESC, user_id LIMIT 20
    """,
)
def ts_coverage_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M191 — interval-union coverage: each event covers a 15-minute
    window; overlapping windows merge, and each user reports total
    covered µs and merged-interval count (top-20 by coverage) — the
    classic interval-union problem (uptime from heartbeats, ad
    exposure from impressions), an interval-algebra shape the
    registry lacked.  Merging is the sweep-line trick: an interval
    starts a new island iff its start exceeds the running max of all
    PRIOR interval ends (cummax over the in-partition sweep order),
    then island ids are a running sum of the start flags — the M57
    session machinery generalized to OVERLAPPING spans.

    All arithmetic is exact µs integers; ordering ties break on (s,
    e) which is unique enough here because equal (user, s, e) rows
    merge into the same island regardless of order — the flag and
    cummax are order-insensitive within ties.  Scale: one shuffle on
    user_id; cummax, island sum, and both rollups share the
    partition."""
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + _COVER_US).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "e")
    m = iv.withColumn(
        "prev_max",
        F.max("e").over(order.rowsBetween(Window.unboundedPreceding, -1)),
    )
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1
            ).otherwise(0)
        )
        .over(order.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    u = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).cast("bigint").alias("len_us")
    )
    cov = u.groupBy("user_id").agg(
        F.sum("len_us").cast("bigint").alias("covered_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
    )
    return (
        cov.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "covered_us",
            "n_islands",
        )
        .orderBy(F.desc("covered_us"), F.asc("user_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# M195 — rolling 24h exact median of hourly volume (robust baseline)
# ---------------------------------------------------------------------------


@register(
    "ts_rolling_median",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour, cnt,
           CAST(2 * median(cnt) OVER tw AS BIGINT) AS med2x,
           CAST(count(*) OVER tw AS BIGINT) AS n_obs
    FROM h
    WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                  RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
    """,
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M195 — trailing-24h exact MEDIAN of hourly event volume per
    type: the robust baseline a monitoring pipeline prefers over the
    trailing mean (M171's burst denominator) because one spike hour
    cannot drag it.  The hour key is integer ``epoch_us div 3600·10⁶``
    so the trailing window is a RANGE frame over an integer axis (the
    M171 rule — calendar gaps shrink ``n_obs``, never misalign the
    frame).

    Cross-engine exactness: the median of BIGINT counts is either an
    integer or an integer + ½ (both engines interpolate the midpoint
    at even cardinality), so ``2·median`` is an exact integer — the
    med2x carrier, the same doubling trick as M59's median family.

    Scale: events collapse to O(types × hours) map-side; the RANGE
    frame lives inside the event_type partition — one shuffle, and the
    per-row frame holds ≤ 24 integers, so the exact in-frame
    percentile is O(1) per row regardless of corpus size."""
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tw = (
        Window.partitionBy("event_type").orderBy("hour").rangeBetween(-23, 0)
    )
    return h.select(
        "event_type", "hour", "cnt",
        (2 * F.expr("percentile(cnt, 0.5)").over(tw)).cast("bigint")
        .alias("med2x"),
        F.count(F.lit(1)).over(tw).cast("bigint").alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# M196 — exact order→ship latency quantiles by counting (bounded domain)
# ---------------------------------------------------------------------------


@register(
    "ts_ship_latency_quantiles",
    oracle="""
    WITH g AS (
      SELECT o.o_orderpriority,
             CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                  AS BIGINT) AS lat_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    c AS (
      SELECT o_orderpriority, lat_days, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY 1, 2
    ),
    w AS (
      SELECT o_orderpriority, lat_days, cnt,
             CAST(sum(cnt) OVER (PARTITION BY o_orderpriority
                                 ORDER BY lat_days) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY o_orderpriority)
                  AS BIGINT) AS n
      FROM c
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_items,
           CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN lat_days END)
                AS BIGINT) AS p50_days,
           CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN lat_days END)
                AS BIGINT) AS p90_days,
           CAST(max(lat_days) AS BIGINT) AS max_days
    FROM w GROUP BY o_orderpriority
    """,
)
def ts_ship_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M196 — exact (discrete) p50/p90 of order→ship latency per
    priority class, computed by COUNTING over the bounded integer
    domain instead of sorting: latency in whole days is a value in a
    ~130-wide range, so per-(priority, day) counts + a cumulative sum
    over that bounded axis locate the exact rank-``ceil(p·n)`` value
    — the scale-safe way to get exact quantiles when the domain is
    bounded (sorting 100 TB of rows is not; counting 130 cells is).
    Rank arithmetic is pure integers: p50 rank = (n+1) div 2 (lower
    median), p90 rank = (9n+9) div 10 = ceil(0.9·n) — all positive,
    so DuckDB ``//`` and Spark ``div`` agree.

    Scale: the lineitem→orders join shuffles on the natural orderkey;
    everything after collapses to O(priorities × days) rows — the
    cumulative window's partitions are ≤ ~130 rows by DOMAIN, not by
    data size, the same bounded-cardinality exemption as the vocab
    ranks (CLAUDE.md round-6 rule)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    g = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("lat_days"),
    )
    c = g.groupBy("o_orderpriority", "lat_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.partitionBy("o_orderpriority").orderBy("lat_days")
    wn = Window.partitionBy("o_orderpriority")
    w = c.select(
        "o_orderpriority", "lat_days", "cnt",
        F.sum("cnt").over(wc).cast("bigint").alias("cum"),
        F.sum("cnt").over(wn).cast("bigint").alias("n"),
    )
    return w.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_items"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("lat_days"))
        )
        .cast("bigint")
        .alias("p50_days"),
        F.min(
            F.when(F.col("cum") >= F.expr("(9 * n + 9) div 10"), F.col("lat_days"))
        )
        .cast("bigint")
        .alias("p90_days"),
        F.max("lat_days").cast("bigint").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# M203 — seasonal-naive forecast error (MASE-style baseline audit)
# ---------------------------------------------------------------------------


@register(
    "ts_seasonal_naive_error",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT cur.event_type,
             abs(cur.cnt - wk.cnt) AS e_seasonal,
             abs(cur.cnt - pv.cnt) AS e_naive
      FROM h cur
      JOIN h wk ON wk.event_type = cur.event_type
               AND wk.hour = cur.hour - 168
      JOIN h pv ON pv.event_type = cur.event_type
               AND pv.hour = cur.hour - 1
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(e_seasonal) AS BIGINT) AS sae_seasonal,
           CAST(sum(e_naive) AS BIGINT) AS sae_naive,
           CAST(CASE WHEN sum(e_naive) = 0 THEN NULL
                     ELSE (1000000 * sum(e_seasonal)) // sum(e_naive)
                END AS BIGINT) AS mase_ppm
    FROM j GROUP BY event_type
    """,
)
def ts_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M203 — the forecast-baseline audit: per event type, the
    absolute error of the SEASONAL-naive forecast (this hour = the
    same hour last week) against the error of the plain naive
    forecast (this hour = the previous hour) — the MASE denominator
    convention (Hyndman & Koehler 2006), as an integer ratio in ppm.
    mase_ppm < 10⁶ means weekly seasonality is real and a model
    should exploit it; the scoped hours are those with BOTH reference
    observations (calendar gaps self-exclude via the equi-joins — the
    M155/M171 incomplete-baseline rule).

    Both references are EQUI-joins on (type, hour−k), not row-lags:
    a row-based lag silently crosses gaps (the hour before a 3-day
    outage is not "the previous hour"), while the integer-hour key
    makes the offset exact.  The hourly rollup is referenced by all
    three join branches, so it is checkpointed first (the
    DOUBLE-REFERENCE RULE).

    Scale: events collapse to O(types × hours) map-side; the two
    self-equi-joins shuffle only that rollup; the final rollup is
    5 keys."""
    e = load(spark, sf_dir, "events")
    h = iter_materialize(
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("hour"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cur = h.alias("cur")
    wk = h.select(
        F.col("event_type").alias("w_type"),
        (F.col("hour") + 168).alias("w_hour"),
        F.col("cnt").alias("w_cnt"),
    )
    pv = h.select(
        F.col("event_type").alias("p_type"),
        (F.col("hour") + 1).alias("p_hour"),
        F.col("cnt").alias("p_cnt"),
    )
    j = (
        cur.join(
            wk,
            (F.col("cur.event_type") == F.col("w_type"))
            & (F.col("cur.hour") == F.col("w_hour")),
        )
        .join(
            pv,
            (F.col("cur.event_type") == F.col("p_type"))
            & (F.col("cur.hour") == F.col("p_hour")),
        )
        .select(
            F.col("cur.event_type").alias("event_type"),
            F.abs(F.col("cur.cnt") - F.col("w_cnt")).alias("e_seasonal"),
            F.abs(F.col("cur.cnt") - F.col("p_cnt")).alias("e_naive"),
        )
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("e_seasonal").cast("bigint").alias("sae_seasonal"),
        F.sum("e_naive").cast("bigint").alias("sae_naive"),
        # A constant series (tiny fixtures) has sae_naive = 0 — the
        # ratio is undefined there, NULL in both engines (never a
        # divide-by-zero under ANSI).
        F.expr(
            "CASE WHEN sum(e_naive) = 0 THEN NULL"
            " ELSE (1000000 * sum(e_seasonal)) div sum(e_naive) END"
        )
        .cast("bigint")
        .alias("mase_ppm"),
    )


# ---------------------------------------------------------------------------
# M206 — MAD-based robust outlier hours (median absolute deviation)
# ---------------------------------------------------------------------------


@register(
    "ts_outlier_mad",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, CAST(2 * median(cnt) AS BIGINT) AS med2x
      FROM h GROUP BY event_type
    ),
    d AS (
      SELECT h.event_type, h.cnt,
             abs(2 * h.cnt - m.med2x) AS dev2x
      FROM h JOIN m ON h.event_type = m.event_type
    ),
    md AS (
      SELECT event_type, CAST(2 * median(dev2x) AS BIGINT) AS mad4x
      FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(max(m.med2x) AS BIGINT) AS med2x,
           CAST(max(md.mad4x) AS BIGINT) AS mad4x,
           CAST(sum(CASE WHEN 2 * d.dev2x > 3 * md.mad4x
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d
    JOIN m ON d.event_type = m.event_type
    JOIN md ON d.event_type = md.event_type
    GROUP BY d.event_type
    """,
)
def ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M206 — robust outlier detection on hourly volume: an hour is an
    outlier when its deviation from the per-type MEDIAN exceeds 3×
    the MEDIAN ABSOLUTE DEVIATION — the robust-statistics standard
    (Hampel) that, unlike M68's z-scores, no single spike can mask by
    inflating its own threshold.

    Everything stays integer by double-doubling: med2x = 2·median
    (exact — midpoint interpolation of BIGINTs, the M195 carrier),
    dev2x = |2·cnt − med2x| (integer), mad4x = 2·median(dev2x), and
    the test |x−med| > 3·MAD becomes 2·dev2x > 3·mad4x — both sides
    exact BIGINTs, no epsilon anywhere.

    Scale: events collapse map-side to O(types × hours); the hourly
    rollup is referenced by both median passes and the final join, so
    it is checkpointed once (DOUBLE-REFERENCE RULE); the per-type
    median tables are 5 rows and broadcast back.  Exact medians of
    the ROLLUP (bounded rows per type) — never of raw events."""
    e = load(spark, sf_dir, "events")
    h = iter_materialize(
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("hour"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    m = h.groupBy("event_type").agg(
        (2 * F.expr("percentile(cnt, 0.5)")).cast("bigint").alias("med2x")
    )
    d = h.join(F.broadcast(m), "event_type").select(
        "event_type",
        "cnt",
        "med2x",
        F.abs(2 * F.col("cnt") - F.col("med2x")).alias("dev2x"),
    )
    md = d.groupBy(F.col("event_type").alias("md_type")).agg(
        (2 * F.expr("percentile(dev2x, 0.5)")).cast("bigint").alias("mad4x")
    )
    j = d.join(F.broadcast(md), d.event_type == md.md_type)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.max("med2x").cast("bigint").alias("med2x"),
        F.max("mad4x").cast("bigint").alias("mad4x"),
        F.sum(
            F.when(2 * F.col("dev2x") > 3 * F.col("mad4x"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# M218 — sliding-window distinct users (3h window, 1h step)
# ---------------------------------------------------------------------------


@register(
    "ts_sliding_distinct",
    oracle="""
    WITH uh AS (
      SELECT DISTINCT event_type, user_id,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour
      FROM events
    ),
    sl AS (
      SELECT event_type, user_id, hour + o AS whour
      FROM uh, (SELECT unnest([0, 1, 2]) AS o) os
    ),
    c AS (
      SELECT event_type, whour,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_3h
      FROM sl GROUP BY 1, 2
    ),
    obs AS (SELECT DISTINCT event_type, hour FROM uh)
    SELECT c.event_type, CAST(obs.hour AS BIGINT) AS hour, c.n_users_3h
    FROM c JOIN obs ON c.event_type = obs.event_type AND c.whour = obs.hour
    """,
)
def ts_sliding_distinct(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M218 — per event type and observed hour, the DISTINCT users
    active in the trailing 3-hour window [h-2, h] — the sliding-window
    distinct primitive (K2's batch twin one level up: K2 slides a
    COUNT, this slides a COUNT DISTINCT, which no window frame can
    express because distinct state does not subtract).

    The rewrite is the bounded hour-offset EXPLODE: each distinct
    (type, user, hour) observation is replicated to the 3 window
    end-hours it can serve (h, h+1, h+2), turning the sliding window
    into a plain groupBy-distinct on the window key — the M197 move
    (explode the bounded side, equi-join the rest).  Emitted rows are
    restricted to OBSERVED (type, hour) pairs, so a window never
    reports past the end of a stream or inside a gap (M155/M181 gap
    semantics).

    Scale: the events scan collapses to distinct (type, user, hour)
    immediately (map-side partial distinct); the explode is a fixed
    x3; the distinct count is one more hash shuffle on (type, whour).
    No window function at all, so nothing single-partition — and the
    same shape extends to any window/step ratio W/S by exploding
    ceil(W/S) offsets.  The observation frame feeds both the slide
    and the observed-hours semi side — checkpointed once
    (DOUBLE-REFERENCE RULE).  ``events`` substitutes a pre-built
    (event_type, user_id, ts) frame for the table scan (scale
    probes)."""
    e = events if events is not None else load(spark, sf_dir, "events")
    uh = iter_materialize(
        e.select(
            "event_type",
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("hour"),
        ).distinct()
    )
    sl = uh.select(
        "event_type",
        "user_id",
        "hour",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("o"),
    ).select(
        "event_type", "user_id", (F.col("hour") + F.col("o")).alias("whour")
    )
    c = sl.groupBy("event_type", "whour").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users_3h")
    )
    obs = uh.select(F.col("event_type").alias("o_type"), "hour").distinct()
    return c.join(
        obs,
        (c.event_type == obs.o_type) & (c.whour == obs.hour),
    ).select("event_type", F.col("hour").cast("bigint").alias("hour"), "n_users_3h")


# ---------------------------------------------------------------------------
# M230 ts_double_smooth — Brown's double exponential smoothing (dyadic taps)
# ---------------------------------------------------------------------------

_DS_TAPS = 4  # alpha = 1/2 truncated to 4 lags per pass; scale 16 per pass


def _ds_oracle() -> str:
    lag1 = " + ".join(
        f"coalesce(lag(cents, {j}) OVER w, 0) * {1 << (_DS_TAPS - 1 - j)}"
        for j in range(_DS_TAPS)
    )
    lag2 = " + ".join(
        f"coalesce(lag(s1, {j}) OVER w2, 0) * {1 << (_DS_TAPS - 1 - j)}"
        for j in range(_DS_TAPS)
    )
    return f"""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    s1t AS (
      SELECT user_id, event_id, ts, CAST({lag1} AS BIGINT) AS s1
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, s1 AS s1_x16,
           CAST({lag2} AS BIGINT) AS s2_x256,
           CAST(16 * s1 - ({lag2}) AS BIGINT) AS trend_x256
    FROM s1t WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("ts_double_smooth", oracle=_ds_oracle())
def ts_double_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M230 — Brown's DOUBLE exponential smoothing with the
    M58 dyadic-taps trick applied twice: the second pass smooths the
    first pass's output, and the Brown TREND term b_t = S' − S''
    (alpha = 1/2) falls out as the exact integer 16·s1 − s2 =
    256·(S' − S'') (scales x16 and x256; the LEVEL a_t = 2·S' − S''
    is the other Brown term, recoverable as 32·s1 − s2) — the
    forecasting primitive (level + trend) as portable integer
    arithmetic, where a float recurrence could never cross the engine
    hash gate (functions/exact.py).

    Scale: both passes share ONE (user) partitioning — Spark plans
    the two window stages with a single shuffle; taps are fixed, so
    per-row cost is O(taps)."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s1 = F.lit(0)
    for j in range(_DS_TAPS):
        s1 = s1 + F.coalesce(F.lag("cents", j).over(w), F.lit(0)) * (
            1 << (_DS_TAPS - 1 - j)
        )
    t1 = c.select("user_id", "event_id", "ts", s1.cast("bigint").alias("s1"))
    s2 = F.lit(0)
    for j in range(_DS_TAPS):
        s2 = s2 + F.coalesce(F.lag("s1", j).over(w), F.lit(0)) * (
            1 << (_DS_TAPS - 1 - j)
        )
    return t1.select(
        "user_id",
        F.col("event_id"),
        F.col("s1").alias("s1_x16"),
        s2.cast("bigint").alias("s2_x256"),
        (16 * F.col("s1") - s2).cast("bigint").alias("trend_x256"),
    )


# ---------------------------------------------------------------------------
# M234 ts_xcorr_lagged_terms — lagged cross-correlation terms
# ---------------------------------------------------------------------------

_XCORR_MAX_LAG = 3


@register(
    "ts_xcorr_lagged_terms",
    oracle=f"""
    WITH hrs AS (
      SELECT DISTINCT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h
      FROM events
    ),
    c AS (
      SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    gx AS (SELECT hrs.h, coalesce(c.n, 0) AS x FROM hrs LEFT JOIN c USING (h)),
    gy AS (SELECT hrs.h, coalesce(p.n, 0) AS y FROM hrs LEFT JOIN p USING (h)),
    l AS (SELECT unnest(generate_series(0, {_XCORR_MAX_LAG})) AS lag),
    j AS (
      SELECT l.lag, gx.x, gy.y
      FROM l JOIN gy ON TRUE
      JOIN gx ON gx.h = gy.h - l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_x2,
           CAST(sum(y * y) AS BIGINT) AS sum_y2
    FROM j GROUP BY lag
    """,
)
def ts_xcorr_lagged_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M234 — LAGGED cross-correlation terms between the
    click and purchase hourly series: for each lead k = 0..3, the
    exact integer Pearson terms of (clicks at h−k, purchases at h) —
    M144's co-moment discipline extended along the lag axis, the
    "do clicks lead purchases, and by how many hours" probe.  Lag
    references are EQUI-joins on the integer hour key against the
    zero-filled observed-hour spine (never row-lags — the M203 gap
    rule; spine hours with no clicks/purchases are load-bearing
    zeros), restricted to hours where BOTH lagged positions lie on
    the spine.

    Scale: the scan collapses to two O(hours) series; the lag axis is
    a fixed ×4 explode on the probe side joined by hour (the M197
    move); terms combine map-side per lag.  The spine and both
    series derive from one events pass each and are referenced once
    per join side — the spine frame is checkpointed (three
    references: gx, gy, and its own distinct build).  At extreme
    scale the Σx² terms approach BIGINT range (hourly counts ~1e9
    square to 1e18); the escalation is the Gini DECIMAL(38,0)/HUGEINT
    wide-integer finale rule (CLAUDE.md)."""
    e = load(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) div 3600000000").cast("bigint")
    hrs = iter_materialize(e.select(hour.alias("h")).distinct())

    def series(ev_type: str, col: str) -> DataFrame:
        s = (
            e.filter(F.col("event_type") == ev_type)
            .groupBy(hour.alias("h"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        return hrs.join(s, "h", "left").select(
            "h", F.coalesce(F.col("n"), F.lit(0)).alias(col)
        )

    gx = series("click", "x")
    gy = series("purchase", "y")
    lagged = gy.select(
        "h",
        "y",
        F.explode(
            F.array(*[F.lit(k) for k in range(_XCORR_MAX_LAG + 1)])
        ).alias("lag"),
    ).select("lag", "y", (F.col("h") - F.col("lag")).alias("xh"))
    j = lagged.join(gx, lagged.xh == gx.h)
    return j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_y2"),
    ).select(
        F.col("lag").cast("bigint").alias("lag"),
        "n_hours", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2",
    )


# ---------------------------------------------------------------------------
# M236 ts_open_orders_sweep — interval concurrency via the sweep line
# ---------------------------------------------------------------------------


@register(
    "ts_open_orders_sweep",
    oracle="""
    WITH iv AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS od,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               AS sd
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    d AS (
      SELECT od AS day, CAST(count(*) AS BIGINT) AS n_opened,
             CAST(0 AS BIGINT) AS n_shipped
      FROM iv GROUP BY od
      UNION ALL
      SELECT sd AS day, CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
      FROM iv GROUP BY sd
    ),
    g AS (
      SELECT CAST(day AS BIGINT) AS day,
             CAST(sum(n_opened) AS BIGINT) AS n_opened,
             CAST(sum(n_shipped) AS BIGINT) AS n_shipped
      FROM d GROUP BY day
    )
    SELECT day, n_opened, n_shipped,
           CAST(sum(n_opened - n_shipped) OVER (ORDER BY day) AS BIGINT)
             AS open_after
    FROM g
    """,
)
def ts_open_orders_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M236 — INTERVAL CONCURRENCY by sweep line: each order
    line is an interval [order day, ship day]; +1/−1 deltas at the
    endpoints and one cumulative sum give the open-order-line backlog
    after every CHANGE day — the classic answer to "how many
    intervals are active at time t" that needs neither an interval
    self-join (quadratic) nor a dense day spine (M181's no-spine
    rule: between change days the backlog is constant, so change
    points are the complete answer).  A line counts as open through
    its ship day (−1 takes effect the day after, because open_after
    is the post-change value of that day).

    Scale: one equi-join (order→line), collapse to O(distinct days)
    delta rows with map-side combine, and one prefix sum over the
    bounded DAY DOMAIN on the pmod constant key (the M196
    bounded-domain argument).  The sweep is how 100 TB of intervals
    becomes thousands of delta rows before any window runs."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    epoch = F.lit("1970-01-01").cast("date")
    iv = o.join(l, o.o_orderkey == l.l_orderkey).select(
        F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("od"),
        F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("sd"),
    )
    opened = iv.groupBy(F.col("od").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_opened"),
        F.lit(0).cast("bigint").alias("n_shipped"),
    )
    shipped = iv.groupBy(F.col("sd").alias("day")).agg(
        F.lit(0).cast("bigint").alias("n_opened"),
        F.count(F.lit(1)).cast("bigint").alias("n_shipped"),
    )
    g = (
        opened.unionByName(shipped)
        .groupBy("day")
        .agg(
            F.sum("n_opened").cast("bigint").alias("n_opened"),
            F.sum("n_shipped").cast("bigint").alias("n_shipped"),
        )
    )
    w = Window.partitionBy(F.pmod(F.col("day"), F.lit(1))).orderBy("day")
    return g.select(
        F.col("day").cast("bigint").alias("day"),
        "n_opened",
        "n_shipped",
        F.sum(F.col("n_opened") - F.col("n_shipped"))
        .over(w)
        .cast("bigint")
        .alias("open_after"),
    )


# ---------------------------------------------------------------------------
# M248 ts_haar_volatility — 2-level Haar multi-resolution volatility
# ---------------------------------------------------------------------------


@register(
    "ts_haar_volatility",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    grid AS (
      SELECT day, h FROM days,
           (SELECT unnest(generate_series(0, 23)) AS h)
    ),
    cnt AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT grid.day, grid.h, coalesce(cnt.n, 0) AS x
      FROM grid LEFT JOIN cnt ON grid.day = cnt.day AND grid.h = cnt.h
    ),
    l1 AS (
      SELECT day, h // 2 AS j,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN h % 2 = 0 THEN x ELSE -x END) AS BIGINT) AS d1
      FROM x GROUP BY day, h // 2
    ),
    l2 AS (
      SELECT day, j // 2 AS j2,
             CAST(sum(CASE WHEN j % 2 = 0 THEN s1 ELSE -s1 END) AS BIGINT) AS d2
      FROM l1 GROUP BY day, j // 2
    ),
    tot AS (SELECT day, CAST(sum(x) AS BIGINT) AS total FROM x GROUP BY day),
    a1 AS (SELECT day, CAST(sum(abs(d1)) AS BIGINT) AS sad1 FROM l1 GROUP BY day),
    a2 AS (SELECT day, CAST(sum(abs(d2)) AS BIGINT) AS sad2 FROM l2 GROUP BY day)
    SELECT tot.day, total, sad1, sad2
    FROM tot JOIN a1 ON tot.day = a1.day JOIN a2 ON tot.day = a2.day
    """,
)
def ts_haar_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M248 — 2-level HAAR wavelet volatility of the daily
    activity curve: each observed day's 24 zero-filled hourly counts
    decompose into 12 level-1 and 6 level-2 detail coefficients
    (pairwise differences at 2 h and 4 h scales); the per-day sums of
    |d1| and |d2| separate fast churn (hour-to-hour spikes) from slow
    shape (morning/evening ramps) — multi-resolution analysis as pure
    integer arithmetic, where an FFT never crosses the engine hash
    gate.  Zero-filled on the bounded 24-hour domain per OBSERVED day
    (missing hours are load-bearing zeros; absent days are not
    invented — the M203/M181 gap rules).

    Scale: the transform is hierarchical aggregation — groupBy(day,
    h div 2) then (day, j div 2) then (day), every stage map-side
    combinable on the same day-keyed partitioning; no window, no
    join wider than the ×24 bounded grid explode."""
    e = load(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000").cast("bigint")
    hour = F.expr("unix_micros(ts) div 3600000000 % 24").cast("bigint")
    cnt = e.groupBy(day.alias("day"), hour.alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    days = e.select(day.alias("day")).distinct()
    grid = days.select(
        "day", F.explode(F.expr("sequence(0L, 23L)")).alias("h")
    )
    x = iter_materialize(
        grid.join(cnt, ["day", "h"], "left").select(
            "day", "h", F.coalesce(F.col("n"), F.lit(0)).alias("x")
        )
    )  # three references below: l1, the per-day total, and via l1 -> l2
    l1 = x.groupBy("day", F.expr("h div 2").alias("j")).agg(
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(
            F.when(F.col("h") % 2 == 0, F.col("x")).otherwise(-F.col("x"))
        ).cast("bigint").alias("d1"),
    )
    l1 = iter_materialize(l1)  # feeds l2 AND the sad1 rollup
    l2 = l1.groupBy("day", F.expr("j div 2").alias("j2")).agg(
        F.sum(
            F.when(F.col("j") % 2 == 0, F.col("s1")).otherwise(-F.col("s1"))
        ).cast("bigint").alias("d2"),
    )
    sad1 = l1.groupBy("day").agg(
        F.sum(F.abs(F.col("d1"))).cast("bigint").alias("sad1")
    )
    sad2 = l2.groupBy("day").agg(
        F.sum(F.abs(F.col("d2"))).cast("bigint").alias("sad2")
    )
    total = x.groupBy("day").agg(F.sum("x").cast("bigint").alias("total"))
    return (
        total.join(sad1, "day").join(sad2, "day")
        .select("day", "total", "sad1", "sad2")
    )


# ---------------------------------------------------------------------------
# M274 ts_motif_counts — SAX motif mining on the registered symbol words
# ---------------------------------------------------------------------------

from tropology_spark.registry import ORACLES as _TS_ORACLES  # noqa: E402

_MOTIF_W = 4  # motif width (symbols)
_MOTIF_TOP = 20

_MOTIF_ORACLE = f"""
    WITH sax AS ({_TS_ORACLES["ts_sax_symbols"]}),
    p AS (
      SELECT user_id, substring(symbols, i, {_MOTIF_W}) AS motif
      FROM sax, (SELECT unnest(generate_series(1, 4096)) AS i) s
      WHERE i <= len(symbols) - {_MOTIF_W - 1}
    )
    SELECT motif, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM p GROUP BY motif
    ORDER BY n_occ DESC, motif
    LIMIT {_MOTIF_TOP}
"""


@register("ts_motif_counts", oracle=_MOTIF_ORACLE)
def ts_motif_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M274 — SAX motif mining composed on the registered
    ts_sax_symbols words: every sliding width-{w} symbol window of
    every (user, day) word, counted corpus-wide, top-{t} motifs by
    (occurrences DESC, motif) — the classic symbolic motif-discovery
    step that runs on SAX output (Lin et al. 2003).  Spark side calls
    the registered query function; the oracle composes its oracle
    verbatim (the dedup_lsh_recall composition rule).

    Position enumeration is capped at 4096 on BOTH sides (the Spark
    sequence end is least(len−{wm1}, 4096)) — the relational-
    enumeration cap discipline; a day-word is one symbol per event, so
    the cap binds only past 4099 events/user/day.  The sequence is
    guarded against the descending-sequence trap (len < {w} → empty
    array).  Scale: word lengths are bounded by events/user/day, so
    the explode is linear in events; the motif agg is map-side
    combinable on a ≤4^{w}-value key domain."""
    sax = ts_sax_symbols(spark, sf_dir)
    pos = sax.select(
        "user_id",
        F.explode(
            F.when(
                F.length("symbols") >= _MOTIF_W,
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.length("symbols") - (_MOTIF_W - 1), F.lit(4096)
                    ),
                ),
            )  # len < width → NULL array → explode yields no rows
        ).alias("i"),
        "symbols",
    ).select(
        "user_id",
        F.expr(f"substring(symbols, i, {_MOTIF_W})").alias("motif"),
    )
    return (
        pos.groupBy("motif")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_occ"), F.asc("motif"))
        .limit(_MOTIF_TOP)
    )


ts_motif_counts.__doc__ = ts_motif_counts.__doc__.format(
    w=_MOTIF_W, t=_MOTIF_TOP, wm1=_MOTIF_W - 1
)


# ---------------------------------------------------------------------------
# M281 ts_theilsen_micro — Theil-Sen robust slope (shifted floor-div slopes)
# ---------------------------------------------------------------------------

_TS_BIG = 10**12  # shift making every slope numerator non-negative

_THEILSEN_ORACLE = f"""
    WITH e AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
               + hour(ts) AS h
      FROM events
    ),
    c AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY event_type, h),
    p AS (
      SELECT a.event_type,
             ((b.n - a.n) * 1000000 + {_TS_BIG} * (b.h - a.h))
               // (b.h - a.h) - {_TS_BIG} AS smicro
      FROM c a JOIN c b
        ON a.event_type = b.event_type AND a.h < b.h
    ),
    g AS (SELECT event_type, smicro, CAST(count(*) AS BIGINT) AS cnt
          FROM p GROUP BY event_type, smicro),
    w AS (SELECT event_type, smicro, cnt,
                 CAST(sum(cnt) OVER (PARTITION BY event_type
                                     ORDER BY smicro) AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_pairs
          FROM g)
    SELECT event_type, n_pairs,
           CAST(min(CASE WHEN cum >= (n_pairs + 1) // 2 THEN smicro END)
                AS BIGINT) AS slope_micro,
           CAST(min(smicro) AS BIGINT) AS min_smicro,
           CAST(max(smicro) AS BIGINT) AS max_smicro
    FROM w GROUP BY event_type, n_pairs
"""


@register("ts_theilsen_micro", oracle=_THEILSEN_ORACLE)
def ts_theilsen_micro(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M281 — Theil-Sen robust trend per event type over the hourly
    count series: the median of all pairwise slopes (up to 29% outlier
    breakdown vs OLS's zero; the robust companion to the M254
    analytics_ols_terms).  Slopes are carried as micro-slopes
    floor(10⁶·Δn/Δh) made ENGINE-EXACT by the +shift identity
    (dy·10⁶ + BIG·dx) div dx − BIG with BIG = 10¹² ≥ |dy|·10⁶ (the
    sim_cluster_cohesion shift rule: the shifted numerator is
    non-negative so truncation == flooring, and (a + k·dx) div dx =
    a floor-div dx + k exactly); the per-type median is the lower
    counting median over per-value counts (the bounded-domain
    counting-quantile rule — never a corpus sort), safe while hourly
    counts stay under 10⁶ (fixture max ~10²; document before lifting).

    Scale: the hourly rollup is map-side combinable; the pair join is
    per-type over the HOURLY series (bounded by the time span, not
    the event count — 720 points/month → 259k pairs regardless of
    corpus size), and the median windows partition by event_type.
    ``events=`` overrides the events frame (weak-scaling probe kwarg —
    tools/scale_probes/theilsen_scale.py tests exactly the
    span-bounded claim; the driver contract never passes it)."""
    epoch = F.lit("1970-01-01").cast("date")
    if events is None:
        events = load(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), epoch) * 24
            + F.hour(F.col("ts"))
        ).alias("h"),
    )
    c = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = c.select(
        F.col("event_type").alias("et"),
        F.col("h").alias("ha"),
        F.col("n").alias("na"),
    )
    p = (
        a.join(
            c,
            (F.col("et") == F.col("event_type")) & (F.col("ha") < F.col("h")),
        )
        .select(
            "event_type",
            F.expr(
                f"((n - na) * 1000000 + {_TS_BIG}L * (h - ha))"
                f" div (h - ha) - {_TS_BIG}L"
            ).alias("smicro"),
        )
    )
    g = p.groupBy("event_type", "smicro").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = Window.partitionBy("event_type").orderBy("smicro")
    w_all = Window.partitionBy("event_type")
    w = g.select(
        "event_type",
        "smicro",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n_pairs"),
    )
    return w.groupBy("event_type", "n_pairs").agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n_pairs + 1) div 2"), F.col("smicro")
            )
        )
        .cast("bigint")
        .alias("slope_micro"),
        F.min("smicro").cast("bigint").alias("min_smicro"),
        F.max("smicro").cast("bigint").alias("max_smicro"),
    )


# ---------------------------------------------------------------------------
# ts_walsh_spectrum — 8-point Walsh-Hadamard transform of daily activity (M286)
# ---------------------------------------------------------------------------


@register(
    "ts_walsh_spectrum",
    oracle="""
    WITH b AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST((epoch_us(ts) // 10800000000) % 8 AS BIGINT) AS i,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT d.day, s.i
      FROM (SELECT DISTINCT day FROM b) d,
           (SELECT unnest(generate_series(0, 7)) AS i) s
    ),
    z AS (SELECT spine.day, spine.i, coalesce(b.c, 0) AS c
          FROM spine LEFT JOIN b ON spine.day = b.day AND spine.i = b.i),
    sgn AS (
      SELECT i.i, j.j,
             CAST(1 - 2 * (bit_count(i.i & j.j) % 2) AS BIGINT) AS sg
      FROM (SELECT unnest(generate_series(0, 7)) AS i) i,
           (SELECT unnest(generate_series(0, 7)) AS j) j
    )
    SELECT z.day, CAST(sgn.j AS BIGINT) AS j,
           CAST(sum(sgn.sg * z.c) AS BIGINT) AS w
    FROM z JOIN sgn ON z.i = sgn.i
    GROUP BY z.day, sgn.j
    """,
)
def ts_walsh_spectrum(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M286 — the full 8-point WALSH-HADAMARD spectrum of each
    day's 3-hour activity profile: w_j = Σ_i (−1)^popcount(i AND j)·c_i
    over the zero-filled 8-bucket day — j=0 is the day total, the
    single-bit rows j ∈ {1,2,4} are the three dyadic scales (M248's
    Haar details), and the composite rows are the cross-scale
    interactions Haar cannot see.  Every coefficient is an exact
    SIGNED sum of counts — multi-resolution analysis as pure integer
    hierarchical aggregation, no floats, no recursion.

    Scale: events collapse map-side to the (day, bucket) table; the
    ×8 transform rides a broadcast 64-row sign matrix over the
    bounded day axis — one shuffle total.  The sign is
    1 − 2·(bit_count(i&j) mod 2): identical branch-free arithmetic in
    both engines.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    b = e.groupBy(
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
        F.expr("(unix_micros(ts) div 10800000000) % 8").cast("bigint").alias("i"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    days = b.select("day").distinct()
    spine = days.select(
        "day", F.explode(F.expr("sequence(0L, 7L)")).alias("i")
    )
    z = spine.join(b, ["day", "i"], "left").select(
        "day", "i", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    sgn = spark.createDataFrame(
        [
            (i, j, 1 - 2 * (bin(i & j).count("1") % 2))
            for i in range(8)
            for j in range(8)
        ],
        "i long, j long, sg long",
    )
    return (
        z.join(F.broadcast(sgn), "i")
        .groupBy("day", "j")
        .agg(F.sum(F.col("sg") * F.col("c")).cast("bigint").alias("w"))
        .select("day", F.col("j").cast("bigint").alias("j"), "w")
    )


# ---------------------------------------------------------------------------
# ts_spearman_terms — Spearman rank correlation via integer doubled midranks
# (M288)
# ---------------------------------------------------------------------------

_SPEAR_ORACLE = """
    WITH e AS (
      SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    cx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY x),
    wx AS (SELECT x, (sum(cnt) OVER (ORDER BY x) - cnt + 1)
                     + sum(cnt) OVER (ORDER BY x) AS u2 FROM cx),
    cy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY y),
    wy AS (SELECT y, (sum(cnt) OVER (ORDER BY y) - cnt + 1)
                     + sum(cnt) OVER (ORDER BY y) AS v2 FROM cy),
    r AS (SELECT wx.u2 AS u, wy.v2 AS v
          FROM e JOIN wx ON e.x = wx.x JOIN wy ON e.y = wy.y)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(u) AS BIGINT) AS su,
           CAST(sum(v) AS BIGINT) AS sv,
           CAST(sum(u * v) AS BIGINT) AS suv,
           CAST(sum(u * u) AS BIGINT) AS su2,
           CAST(sum(v * v) AS BIGINT) AS sv2,
           CAST(CAST(count(*) AS HUGEINT) * sum(u * v)
                - CAST(sum(u) AS HUGEINT) * sum(v) AS BIGINT) AS rho_num,
           CAST(CAST(count(*) AS HUGEINT) * sum(u * u)
                - CAST(sum(u) AS HUGEINT) * sum(u) AS BIGINT) AS den_x,
           CAST(CAST(count(*) AS HUGEINT) * sum(v * v)
                - CAST(sum(v) AS HUGEINT) * sum(v) AS BIGINT) AS den_y
    FROM r
"""


@register("ts_spearman_terms", oracle=_SPEAR_ORACLE)
def ts_spearman_terms(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M288 — SPEARMAN rank-correlation terms between hourly
    click and purchase counts, via integer DOUBLED MIDRANKS: on the
    union spine of observed hours (zero-filled per side), each axis's
    value gets 2·midrank = (cum − cnt + 1) + cum — always integral,
    the analytics_mannwhitney discipline applied to the CORRELATION
    family (Pearson on ranks = Spearman; M144 is Pearson on raw
    values, which outliers dominate — rank correlation is the robust
    complement a metrics pipeline wants for heavy-tailed counts).
    Emitted: n, Σu, Σv, Σuv, Σu², Σv² plus the assembled rho numerator
    n·Σuv − Σu·Σv and the two denominator factors (HUGEINT/
    DECIMAL(38,0) products, M192 rule) — the float sqrt happens
    client-side (*_terms discipline).

    Scale: events collapse map-side to the bounded O(hours) table;
    midranks ride pmod-constant-key windows over the bounded count-
    value axes; one final 1-row rollup."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hc = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )

    def midrank2(df: DataFrame, col: str, out: str) -> DataFrame:
        c = df.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        w = (
            Window.partitionBy(F.pmod(F.col(col), F.lit(1)))
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return c.select(
            col,
            (
                (F.sum("cnt").over(w) - F.col("cnt") + 1) + F.sum("cnt").over(w)
            ).alias(out),
        )

    r = hc.join(midrank2(hc, "x", "u"), "x").join(midrank2(hc, "y", "v"), "y")
    agg = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("u") * F.col("v")).cast("bigint").alias("suv"),
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("su2"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sv2"),
    )
    return agg.select(
        "n", "su", "sv", "suv", "su2", "sv2",
        F.expr("CAST(n AS DECIMAL(38,0)) * suv - CAST(su AS DECIMAL(38,0)) * sv")
        .cast("bigint")
        .alias("rho_num"),
        F.expr("CAST(n AS DECIMAL(38,0)) * su2 - CAST(su AS DECIMAL(38,0)) * su")
        .cast("bigint")
        .alias("den_x"),
        F.expr("CAST(n AS DECIMAL(38,0)) * sv2 - CAST(sv AS DECIMAL(38,0)) * sv")
        .cast("bigint")
        .alias("den_y"),
    )


# ---------------------------------------------------------------------------
# ts_hurst_rs_terms — rescaled-range (R/S) terms over dyadic window scales
# ---------------------------------------------------------------------------

_HURST_WS = (8, 16)


@register(
    "ts_hurst_rs_terms",
    oracle=f"""
    WITH e AS (
      SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    mm AS (SELECT CAST(min(h) AS BIGINT) AS h0,
                  CAST(max(h) AS BIGINT) AS hmax FROM e),
    spine AS (
      SELECT h0 + s.i AS h, h0, hmax
      FROM mm, (SELECT unnest(generate_series(0, 4096)) AS i) s
      WHERE h0 + s.i <= hmax
    ),
    z AS (SELECT spine.h, spine.h0, spine.hmax, coalesce(e.x, 0) AS x
          FROM spine LEFT JOIN e ON spine.h = e.h),
    ws AS (SELECT unnest([{", ".join(str(w) for w in _HURST_WS)}]) AS w),
    win AS (
      SELECT ws.w, z.h, z.x,
             (z.h - z.h0) // ws.w AS idx
      FROM z CROSS JOIN ws
      WHERE z.h - z.h0
            < ws.w * ((least(z.hmax, z.h0 + 4096) - z.h0 + 1) // ws.w)
    ),
    dev AS (
      SELECT w, idx, x,
             w * sum(x) OVER (PARTITION BY w, idx ORDER BY h)
               - row_number() OVER (PARTITION BY w, idx ORDER BY h)
                 * sum(x) OVER (PARTITION BY w, idx) AS d
      FROM win
    ),
    per AS (
      SELECT w, idx,
             CAST(max(d) - min(d) AS BIGINT) AS r_xw,
             CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
               AS s2num,
             CAST(sum(x) AS BIGINT) AS total
      FROM dev GROUP BY w, idx
    )
    SELECT CAST(w AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(r_xw) AS BIGINT) AS sum_r_xw,
           CAST(sum(s2num) AS BIGINT) AS sum_s2num,
           CAST(sum(total) AS BIGINT) AS sum_x
    FROM per GROUP BY w
    """,
)
def ts_hurst_rs_terms(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M300 — RESCALED-RANGE (Hurst R/S) terms at the dyadic
    window scales w ∈ 8/16 hours: the zero-filled hourly count series
    is cut into complete w-windows; within each, the mean-adjusted
    cumulative deviation at position k is carried ×w as the exact
    integer w·cum_k − k·total (the M192 scale-lift — the float mean
    never materializes), R·w = max − min of those deviations (the
    k = w anchor is exactly 0, so the range always brackets zero), and
    the variance numerator w·Σx² − (Σx)² rides along — per scale the
    summed R and S² terms whose client-side log-log slope is the Hurst
    exponent (H > 1/2 = long-range dependence, the question every
    capacity model asks of arrival series; M101's ACF sees only fixed
    lags — R/S sees the scaling law).

    Scale: events collapse map-side to the bounded O(hours) table; the
    spine is one bounded sequence explode (4096 cap, the oracle-
    enumeration rule); the deviations ride REAL (w, window) partition
    keys; everything after is map-side combinable.  The
    complete-window bound clamps hmax to the spine cap —
    least(hmax, h0 + 4096) — on BOTH sides (ADVICE r14: the uncapped
    bound admitted a truncated < w-row trailing window once the span
    exceeded the 4096-hour spine; parity held because both engines
    truncated identically, but the documented complete-w-windows
    semantics did not).

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e0 = events if events is not None else load(spark, sf_dir, "events")
    e = e0.groupBy(
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    mm = e.agg(
        F.min("h").cast("bigint").alias("h0"),
        F.max("h").cast("bigint").alias("hmax"),
    )
    spine = mm.select(
        "h0",
        "hmax",
        F.explode(
            F.expr("sequence(0L, least(hmax - h0, 4096L))")
        ).alias("i"),
    ).select((F.col("h0") + F.col("i")).alias("h"), "h0", "hmax")
    z = spine.join(e, "h", "left").select(
        "h", "h0", "hmax", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    ws = spark.createDataFrame([(w,) for w in _HURST_WS], "w long")
    win = (
        z.crossJoin(F.broadcast(ws))
        .filter(
            F.col("h") - F.col("h0")
            < F.col("w")
            * F.expr("(least(hmax, h0 + 4096) - h0 + 1) div w")
        )
        .select("w", "h", "x", F.expr("(h - h0) div w").alias("idx"))
    )
    wp = Window.partitionBy("w", "idx")
    wo = wp.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    dev = win.select(
        "w",
        "idx",
        "x",
        (
            F.col("w") * F.sum("x").over(wo)
            - F.row_number().over(wp.orderBy("h")) * F.sum("x").over(wp)
        ).alias("d"),
    )
    per = dev.groupBy("w", "idx").agg(
        (F.max("d") - F.min("d")).cast("bigint").alias("r_xw"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        )
        .cast("bigint")
        .alias("s2num"),
        F.sum("x").cast("bigint").alias("total"),
    )
    return per.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("r_xw").cast("bigint").alias("sum_r_xw"),
        F.sum("s2num").cast("bigint").alias("sum_s2num"),
        F.sum("total").cast("bigint").alias("sum_x"),
    ).select(
        F.col("w").cast("bigint").alias("w"),
        "n_windows",
        "sum_r_xw",
        "sum_s2num",
        "sum_x",
    )


# ---------------------------------------------------------------------------
# ts_record_hours — running-record (prefix-maximum) audit per event type
# ---------------------------------------------------------------------------

_RECORD_ORACLE = """
    WITH e AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
               + hour(ts) AS h
      FROM events
    ),
    c AS (SELECT event_type, CAST(h AS BIGINT) AS h,
                 CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY event_type, h),
    w AS (SELECT event_type, h, n,
                 max(n) OVER (PARTITION BY event_type ORDER BY h
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prevmax
          FROM c),
    r AS (SELECT event_type, h, n,
                 CASE WHEN prevmax IS NULL OR n > prevmax THEN 1 ELSE 0 END
                   AS is_rec
          FROM w)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(is_rec) AS BIGINT) AS n_records,
           CAST(max(CASE WHEN is_rec = 1 THEN h END) AS BIGINT)
             AS last_record_h,
           CAST(max(n) AS BIGINT) AS max_n
    FROM r GROUP BY event_type
"""


@register("ts_record_hours", oracle=_RECORD_ORACLE)
def ts_record_hours(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M306 — Record statistics over the hourly count series per event type:
    a RECORD hour strictly exceeds every earlier hour's count (the
    first observed hour is a record by convention); emits hours
    observed, record count, the last record's hour, and the all-time
    maximum.  Record counts are the classic drift detector from
    extreme-value theory — an i.i.d. stationary series produces only
    ~ln(n) records ever (~7 for a month of hours), so a record count
    far above that, or a recent last_record_h, is a trending/shifted
    load signal no mean-based monitor shows this cheaply.

    Exact integers end to end: the prefix maximum is a plain
    ROWS-bounded window max on the real event_type partition key,
    records compare BIGINTs (strict >), and ties with the running
    maximum correctly do NOT count as records.  Scale: the corpus
    collapses to the O(types × hours) hourly rollup before the window
    (the ts family discipline).  ``events=`` overrides the events
    frame (the hypothesis property suite injects arbitrary series and
    pins equality with the pure-Python prefix-maxima recompute; the
    driver contract never passes it)."""
    if events is None:
        events = load(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        (
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            * 24
            + F.hour(F.col("ts"))
        )
        .cast("bigint")
        .alias("h"),
    )
    c = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = c.select(
        "event_type",
        "h",
        "n",
        F.when(
            F.max("n").over(w_prev).isNull()
            | (F.col("n") > F.max("n").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("is_rec"),
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("is_rec").cast("bigint").alias("n_records"),
        F.max(F.when(F.col("is_rec") == 1, F.col("h")))
        .cast("bigint")
        .alias("last_record_h"),
        F.max("n").cast("bigint").alias("max_n"),
    )


# ---------------------------------------------------------------------------
# ts_paa_lb_audit — PAA lower-bound admissibility (GEMINI) audit
# ---------------------------------------------------------------------------

_PAA_SEG = 3  # hours per segment (24h day -> 8 segments)

_PAA_ORACLE = f"""
    WITH e AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             hour(ts) AS h
      FROM events
    ),
    c AS (SELECT event_type, CAST(day AS BIGINT) AS day, h,
                 CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY event_type, day, h),
    dd AS (SELECT DISTINCT event_type, day FROM c),
    pr AS (SELECT a.event_type, a.day AS day_a, b.day AS day_b
           FROM dd a JOIN dd b
             ON a.event_type = b.event_type AND b.day = a.day + 1),
    hx0 AS (
      SELECT pr.event_type, pr.day_a, pr.day_b, s.h
      FROM pr CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) s
    ),
    hx AS (
      SELECT hx0.event_type, hx0.day_a, hx0.day_b, hx0.h,
             coalesce(ca.n, 0) - coalesce(cb.n, 0) AS dx
      FROM hx0
      LEFT JOIN c ca ON ca.event_type = hx0.event_type
                    AND ca.day = hx0.day_a AND ca.h = hx0.h
      LEFT JOIN c cb ON cb.event_type = hx0.event_type
                    AND cb.day = hx0.day_b AND cb.h = hx0.h
    ),
    seg AS (
      SELECT event_type, day_a, day_b, h // {_PAA_SEG} AS s,
             CAST(sum(dx) AS BIGINT) AS dss,
             CAST(sum(dx * dx) AS BIGINT) AS dx2
      FROM hx GROUP BY event_type, day_a, day_b, h // {_PAA_SEG}
    ),
    agg AS (
      SELECT event_type, day_a, day_b,
             CAST(sum(dss * dss) AS BIGINT) AS lb3,
             CAST({_PAA_SEG} * sum(dx2) AS BIGINT) AS true3
      FROM seg GROUP BY event_type, day_a, day_b
    )
    SELECT event_type, day_a, day_b, lb3, true3,
           CAST(true3 - lb3 AS BIGINT) AS slack,
           CAST(CASE WHEN true3 = 0 THEN 1000000
                     ELSE (1000000 * lb3) // true3 END AS BIGINT)
             AS tight_ppm
    FROM agg
"""


@register("ts_paa_lb_audit", oracle=_PAA_ORACLE)
def ts_paa_lb_audit(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M313 — PAA lower-bound ADMISSIBILITY audit — the GEMINI
    guarantee that makes PAA/SAX retrieval correct (Keogh et al.: the
    Piecewise-Aggregate distance never exceeds the true Euclidean
    distance, so index-level pruning can never produce false
    dismissals): for every consecutive-day pair of hourly profiles
    per event type, the exact integer carriers lb3 = Σ_seg (ΔSS)² and
    true3 = 3·Σ_h (Δx)² — Cauchy-Schwarz per 3-hour segment gives
    lb3 ≤ true3 ALWAYS, and tight_ppm = (10⁶·lb3) div true3 measures
    how much pruning power the 8-segment sketch keeps (the empirical
    companion to ts_sax_symbols/ts_motif_counts: SAX mining is only
    sound because this bound holds).

    All-integer: hour profiles zero-filled over the bounded 0..23
    spine (explode of a literal sequence per pair — the hx frame is
    |pairs|×24), segment sums ΔSS are BIGINTs, both distance carriers
    scale by 3 so no division appears before the final guarded ppm
    (both-zero profiles → defined as 10⁶: the bound is tight).
    Scale: the corpus collapses to the O(types × days × 24) hourly
    rollup; pairs join on the integer day key (the gappy-axis
    equi-join rule — a missing day produces no pair, never a wrong
    lag).  ``events=`` overrides the events frame (the property suite
    injects arbitrary profiles and pins lb3 ≤ true3 plus equality
    with the pure recompute; an identical-profiles injection pins the
    true3 = 0 → tight_ppm = 10⁶ guard branch the fixture cannot
    reach)."""
    if events is None:
        events = load(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day"),
        F.hour(F.col("ts")).alias("h"),
    )
    c = e.groupBy("event_type", "day", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    dd = c.select("event_type", "day").distinct()
    pr = dd.alias("a").join(
        dd.alias("b"),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") == F.col("a.day") + 1),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.day").alias("day_a"),
        F.col("b.day").alias("day_b"),
    )
    hx = (
        pr.select(
            "event_type",
            "day_a",
            "day_b",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"),
        )
        .join(
            c.select(
                F.col("event_type").alias("et_a"),
                F.col("day").alias("da"),
                F.col("h").alias("ha"),
                F.col("n").alias("na"),
            ),
            (F.col("event_type") == F.col("et_a"))
            & (F.col("day_a") == F.col("da"))
            & (F.col("h") == F.col("ha")),
            "left",
        )
        .join(
            c.select(
                F.col("event_type").alias("et_b"),
                F.col("day").alias("db"),
                F.col("h").alias("hb"),
                F.col("n").alias("nb"),
            ),
            (F.col("event_type") == F.col("et_b"))
            & (F.col("day_b") == F.col("db"))
            & (F.col("h") == F.col("hb")),
            "left",
        )
        .select(
            "event_type",
            "day_a",
            "day_b",
            "h",
            (F.coalesce(F.col("na"), F.lit(0)) - F.coalesce(F.col("nb"), F.lit(0)))
            .alias("dx"),
        )
    )
    seg = hx.groupBy(
        "event_type", "day_a", "day_b", F.expr(f"h div {_PAA_SEG}").alias("s")
    ).agg(
        F.sum("dx").cast("bigint").alias("dss"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("dx2"),
    )
    agg = seg.groupBy("event_type", "day_a", "day_b").agg(
        F.sum(F.col("dss") * F.col("dss")).cast("bigint").alias("lb3"),
        (F.lit(_PAA_SEG) * F.sum("dx2")).cast("bigint").alias("true3"),
    )
    return agg.select(
        "event_type",
        "day_a",
        "day_b",
        "lb3",
        "true3",
        (F.col("true3") - F.col("lb3")).cast("bigint").alias("slack"),
        F.expr(
            "CAST(CASE WHEN true3 = 0 THEN 1000000"
            " ELSE (1000000 * lb3) div true3 END AS BIGINT)"
        ).alias("tight_ppm"),
    )


# ---------------------------------------------------------------------------
# ts_triangle_downsample (M321) — largest-triangle decimation, bucket anchors
# ---------------------------------------------------------------------------

_LT_BUCKET_H = 6  # hours per bucket


@register(
    "ts_triangle_downsample",
    oracle=f"""
    WITH hc AS (
      SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    hb AS (SELECT h, c, h // {_LT_BUCKET_H} AS b FROM hc),
    bs AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(h) AS BIGINT) AS sh,
                  CAST(sum(c) AS BIGINT) AS sc
           FROM hb GROUP BY b),
    a AS (
      SELECT hb.b, hb.h, hb.c,
             abs((hb.h * p.n - p.sh) * (nx.sc * p.n - p.sc * nx.n)
                 - (nx.sh * p.n - p.sh * nx.n) * (hb.c * p.n - p.sc))
               AS area2
      FROM hb
      JOIN bs p ON p.b = hb.b - 1
      JOIN bs nx ON nx.b = hb.b + 1
    )
    SELECT b AS bucket, h, c, CAST(area2 AS BIGINT) AS area2
    FROM (SELECT *, row_number() OVER (PARTITION BY b
                                       ORDER BY area2 DESC, h) AS rk16
          FROM a) t
    WHERE rk16 = 1
    """,
)
def ts_triangle_downsample(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M321 — LARGEST-TRIANGLE downsampling of the hourly activity
    series (the LTTB family, fixed-anchor variant: anchors are the
    PREVIOUS and NEXT buckets' mean points, so every bucket's pick is
    independent — the sequential previously-selected-point dependency
    of classic LTTB is gone and the operator parallelizes per
    bucket): within each {w}-hour bucket, keep the point whose
    triangle against the neighbor-bucket means has the largest area —
    the visually-dominant point a dashboard decimates to.

    Exact: the doubled area is cleared of the two mean divisions by
    P·N (both bucket populations), giving a pure integer
    |cross-product| with a (area DESC, h) unique tie-break.  First and
    last buckets (and gap-adjacent ones) have no neighbor row and
    drop out of the equi-joins — the interior-bucket semantics.
    Scale: one hourly rollup, one bounded bucket rollup, two
    broadcast-size equi-joins, one per-bucket (real key) window.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hc = e.groupBy(
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    hb = hc.select("h", "c", F.expr(f"h div {_LT_BUCKET_H}").alias("b"))
    bs = hb.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("h").cast("bigint").alias("sh"),
        F.sum("c").cast("bigint").alias("sc"),
    )
    p = bs.select(
        (F.col("b") + 1).alias("b"),
        F.col("n").alias("pn"),
        F.col("sh").alias("psh"),
        F.col("sc").alias("psc"),
    )
    nx = bs.select(
        (F.col("b") - 1).alias("b"),
        F.col("n").alias("nn"),
        F.col("sh").alias("nsh"),
        F.col("sc").alias("nsc"),
    )
    a = (
        hb.join(p, "b")
        .join(nx, "b")
        .select(
            "b",
            "h",
            "c",
            F.abs(
                (F.col("h") * F.col("pn") - F.col("psh"))
                * (F.col("nsc") * F.col("pn") - F.col("psc") * F.col("nn"))
                - (F.col("nsh") * F.col("pn") - F.col("psh") * F.col("nn"))
                * (F.col("c") * F.col("pn") - F.col("psc"))
            ).alias("area2"),
        )
    )
    w = Window.partitionBy("b").orderBy(F.desc("area2"), F.asc("h"))
    return (
        a.withColumn("rk16", F.row_number().over(w))
        .filter(F.col("rk16") == 1)
        .select(
            F.col("b").alias("bucket"),
            "h",
            "c",
            F.col("area2").cast("bigint").alias("area2"),
        )
    )


ts_triangle_downsample.__doc__ = ts_triangle_downsample.__doc__.format(
    w=_LT_BUCKET_H
)


# ---------------------------------------------------------------------------
# ts_local_maxima (M326) — strict per-type daily local maxima with sharpness
# ---------------------------------------------------------------------------


@register(
    "ts_local_maxima",
    oracle="""
    WITH dc AS (
      SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT m.event_type, m.d AS day, m.c,
           p.c AS prev_c, n.c AS next_c,
           CAST(2 * m.c - p.c - n.c AS BIGINT) AS sharp2
    FROM dc m
    JOIN dc p ON p.event_type = m.event_type AND p.d = m.d - 1
    JOIN dc n ON n.event_type = m.event_type AND n.d = m.d + 1
    WHERE m.c > p.c AND m.c > n.c
    """,
)
def ts_local_maxima(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M326 — strict LOCAL MAXIMA of the per-type daily activity
    series (consecutive-day triples only: a day qualifies iff both
    calendar neighbors have rows for the type and it strictly exceeds
    both — gap- and boundary-adjacent days drop out of the equi-joins,
    the ts_seasonal_naive_error rule that row-lags silently violate),
    with the discrete-Laplacian sharpness 2c − c_prev − c_next — the
    peak-detection primitive under burst/campaign attribution (M171
    flags level bursts against a global threshold; this finds SHAPE —
    days that stick up from their immediate neighborhood, at any
    level).

    Scale: events collapse map-side to the O(types × days) table;
    the neighbor tests are two self equi-joins on the integer day
    key — broadcastable, no windows, no inequality joins.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    dc = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    p = dc.select(
        "event_type", (F.col("d") + 1).alias("d"), F.col("c").alias("prev_c")
    )
    n = dc.select(
        "event_type", (F.col("d") - 1).alias("d"), F.col("c").alias("next_c")
    )
    return (
        dc.join(p, ["event_type", "d"])
        .join(n, ["event_type", "d"])
        .filter((F.col("c") > F.col("prev_c")) & (F.col("c") > F.col("next_c")))
        .select(
            "event_type",
            F.col("d").alias("day"),
            "c",
            "prev_c",
            "next_c",
            (2 * F.col("c") - F.col("prev_c") - F.col("next_c"))
            .cast("bigint")
            .alias("sharp2"),
        )
    )


# ---------------------------------------------------------------------------
# ts_dominant_period — argmax over hour-axis lags of the exact ACF score
# ---------------------------------------------------------------------------

_DP_MIN_LAG = 2
_DP_MAX_LAG = 48
_DP_MIN_OVERLAP = 24  # >= a day of co-present hours per (type, lag)


@register(
    "ts_dominant_period",
    oracle=f"""
    WITH hc AS (
      SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    lagd AS (
      SELECT a.event_type, l.lag_k, a.c AS head, b.c AS tail
      FROM hc a
      JOIN (SELECT unnest(generate_series({_DP_MIN_LAG}, {_DP_MAX_LAG}))
              AS lag_k) l ON true
      JOIN hc b ON b.event_type = a.event_type AND b.h = a.h - l.lag_k
    ),
    t AS (
      SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(head * tail) AS BIGINT) AS s_xy,
             CAST(sum(head) AS BIGINT) AS s_h,
             CAST(sum(tail) AS BIGINT) AS s_t,
             CAST(sum(head * head) AS BIGINT) AS s_hh,
             CAST(sum(tail * tail) AS BIGINT) AS s_tt
      FROM lagd GROUP BY 1, 2
    ),
    sc AS (
      SELECT event_type, lag_k, m,
             CAST(m * s_xy - s_h * s_t AS BIGINT) AS num,
             CAST(m * s_hh - s_h * s_h AS BIGINT) AS dh,
             CAST(m * s_tt - s_t * s_t AS BIGINT) AS dt
      FROM t WHERE m >= {_DP_MIN_OVERLAP}
    ),
    v AS (
      SELECT event_type, lag_k, m, num, dh, dt,
             CAST((1000000000 * CAST(num AS HUGEINT) * num)
                  // (CAST(dh AS HUGEINT) * dt) AS BIGINT) AS score_ppb
      FROM sc WHERE num > 0 AND dh > 0 AND dt > 0
    )
    SELECT event_type, CAST(lag_k AS BIGINT) AS best_lag, m, num, dh, dt,
           score_ppb
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY score_ppb DESC, lag_k) AS rk17
          FROM v) z
    WHERE rk17 = 1
    """,
)
def ts_dominant_period(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M332 — the DOMINANT PERIOD of each type's hourly activity
    series: over calendar-hour lags 2..48, the lag maximizing the
    exact integer autocorrelation score — the periodicity detector
    (expect ~24 for anything diurnal) that decides resampling rates
    and seasonal-model windows.  M101 carries the ACF terms at row
    lags 1..3; this searches the PERIOD axis, on the hour key, with
    equi-joined lags (the ts_seasonal_naive_error gap rule — row-lags
    silently cross gaps) and only co-present hour pairs.

    Exact argmax without floats: corr²'s denominators cleared —
    score_ppb = 10⁹·num² div (dh·dt) with num = m·Σxy − ΣxΣy > 0
    (positive-correlation lags only; squaring would otherwise lose
    the sign), dh/dt the variance numerators, everything BIGINT with
    the one division in DECIMAL(38,0)/HUGEINT.  Overlap gate m ≥ 24
    (a day of co-present hours) keeps boundary lags from winning on
    tiny overlaps.  Headroom: 10⁹·num² at sf0.1 is ~10²⁹ — two more
    decades fit; past that the carrier drops to ppm.  Tie-break
    (score DESC, lag) is unique.  Scale: events collapse map-side to
    O(types × hours); the ×47 lag axis explodes THAT table, never the
    corpus; one per-type window on a real key.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hc = iter_materialize(  # head AND tail sides — DOUBLE-REFERENCE
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    head = hc.select(
        "event_type",
        "h",
        F.col("c").alias("head"),
        F.explode(
            F.array(
                *[F.lit(k) for k in range(_DP_MIN_LAG, _DP_MAX_LAG + 1)]
            )
        ).alias("lag_k"),
    )
    # Rename BOTH tail-side keys: head/tail share the checkpointed
    # frame's attribute ids, and an un-renamed event_type would build
    # a trivially-true self-comparison (WARN Column at plan time).
    tail = hc.select(
        F.col("event_type").alias("et_t"),
        F.col("h").alias("ht"),
        F.col("c").alias("tail"),
    )
    lagd = head.join(
        tail,
        (F.col("et_t") == head.event_type)
        & (F.col("ht") == head.h - head.lag_k),
    ).select(head.event_type, "lag_k", "head", "tail")
    t = lagd.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("head") * F.col("tail")).cast("bigint").alias("s_xy"),
        F.sum("head").cast("bigint").alias("s_h"),
        F.sum("tail").cast("bigint").alias("s_t"),
        F.sum(F.col("head") * F.col("head")).cast("bigint").alias("s_hh"),
        F.sum(F.col("tail") * F.col("tail")).cast("bigint").alias("s_tt"),
    )
    sc = t.filter(F.col("m") >= _DP_MIN_OVERLAP).select(
        "event_type",
        F.col("lag_k").cast("bigint").alias("lag_k"),
        "m",
        (F.col("m") * F.col("s_xy") - F.col("s_h") * F.col("s_t"))
        .cast("bigint")
        .alias("num"),
        (F.col("m") * F.col("s_hh") - F.col("s_h") * F.col("s_h"))
        .cast("bigint")
        .alias("dh"),
        (F.col("m") * F.col("s_tt") - F.col("s_t") * F.col("s_t"))
        .cast("bigint")
        .alias("dt"),
    )
    v = sc.filter(
        (F.col("num") > 0) & (F.col("dh") > 0) & (F.col("dt") > 0)
    ).withColumn(
        "score_ppb",
        F.expr(
            "CAST((1000000000 * CAST(num AS DECIMAL(38,0)) * num)"
            " div (CAST(dh AS DECIMAL(38,0)) * dt) AS BIGINT)"
        ),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("score_ppb").desc(), F.col("lag_k")
    )
    return (
        v.withColumn("rk17", F.row_number().over(w))
        .filter(F.col("rk17") == 1)
        .select(
            "event_type",
            F.col("lag_k").alias("best_lag"),
            "m",
            "num",
            "dh",
            "dt",
            "score_ppb",
        )
    )


# ---------------------------------------------------------------------------
# M338 ts_leadlag_matrix — pairwise lead-lag matrix over event types
# ---------------------------------------------------------------------------

_LL_MAX_LAG = 6


@register(
    "ts_leadlag_matrix",
    oracle=f"""
    WITH hrs AS (
      SELECT DISTINCT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h
      FROM events
    ),
    ty AS (SELECT DISTINCT event_type AS t FROM events),
    cnt AS (
      SELECT event_type AS t, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    z AS (
      SELECT ty.t, hrs.h, coalesce(cnt.c, 0) AS c
      FROM ty CROSS JOIN hrs
      LEFT JOIN cnt ON cnt.t = ty.t AND cnt.h = hrs.h
    ),
    j AS (
      SELECT x.t AS tx, y.t AS ty, l.lag_k, x.c AS xv, y.c AS yv
      FROM z y
      JOIN (SELECT unnest(generate_series(0, {_LL_MAX_LAG})) AS lag_k) l
        ON true
      JOIN z x ON x.h = y.h - l.lag_k AND x.t <> y.t
    ),
    t AS (
      SELECT tx, ty, CAST(lag_k AS BIGINT) AS lag_k,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(xv * yv) AS BIGINT) AS s_xy,
             CAST(sum(xv) AS BIGINT) AS s_x,
             CAST(sum(yv) AS BIGINT) AS s_y,
             CAST(sum(xv * xv) AS BIGINT) AS s_xx,
             CAST(sum(yv * yv) AS BIGINT) AS s_yy
      FROM j GROUP BY 1, 2, 3
    ),
    sc AS (
      SELECT tx, ty, lag_k, m,
             CAST(m * s_xy - s_x * s_y AS BIGINT) AS num,
             CAST(m * s_xx - s_x * s_x AS BIGINT) AS dh,
             CAST(m * s_yy - s_y * s_y AS BIGINT) AS dt
      FROM t
    ),
    v AS (
      SELECT tx, ty, lag_k, m, num, dh, dt,
             CAST((1000000000 * CAST(num AS HUGEINT) * num)
                  // (CAST(dh AS HUGEINT) * dt) AS BIGINT) AS score_ppb
      FROM sc WHERE num > 0 AND dh > 0 AND dt > 0
    )
    SELECT tx AS type_x, ty AS type_y, CAST(lag_k AS BIGINT) AS best_lag,
           m, num, dh, dt, score_ppb
    FROM (SELECT *, row_number() OVER (PARTITION BY tx, ty
                                       ORDER BY score_ppb DESC, lag_k) AS rk18
          FROM v) q
    WHERE rk18 = 1
    """,
)
def ts_leadlag_matrix(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M338 — the pairwise LEAD-LAG matrix: for every ordered
    pair of event types (x leads, y follows), the hour lag 0..6
    maximizing the exact integer cross-correlation score — the
    causal-screening matrix behind funnel design and alerting
    dependencies (M234 carries the terms for ONE pair at lags 0..3;
    this searches every pair and reports only the argmax).  Series
    are ZERO-FILLED on the observed-hour spine (the M234 rule —
    absent hours are load-bearing zeros for cross-type comparison,
    unlike the single-series period search where co-presence is the
    contract), so the matrix is symmetric-complete: a pair drops out
    only if no lag has positive correlation.

    Exact argmax without floats: the domper score (10⁹·num² div
    (dh·dt), num > 0 only) with the (score DESC, lag) unique
    tie-break.  Scale: one map-side rollup to O(types × hours), a ×7
    lag explode on THAT table, one window on the real (tx, ty) key.
    The zero-filled long frame feeds both join sides —
    DOUBLE-REFERENCE RULE.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) div 3600000000").cast("bigint")
    hrs = e.select(hour.alias("h")).distinct()
    ty = e.select(F.col("event_type").alias("t")).distinct()
    cnt = e.groupBy(
        F.col("event_type").alias("t"), hour.alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    z = iter_materialize(  # x AND y sides — DOUBLE-REFERENCE RULE
        ty.crossJoin(hrs)
        .join(cnt, ["t", "h"], "left")
        .select("t", "h", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    y = z.select(
        F.col("t").alias("ty"),
        "h",
        F.col("c").alias("yv"),
        F.explode(
            F.array(*[F.lit(k) for k in range(_LL_MAX_LAG + 1)])
        ).alias("lag_k"),
    )
    x = z.select(F.col("t").alias("tx"), F.col("h").alias("hx"), F.col("c").alias("xv"))
    j = y.join(
        x,
        (F.col("hx") == F.col("h") - F.col("lag_k"))
        & (F.col("tx") != F.col("ty")),
    )
    t = j.groupBy("tx", "ty", "lag_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("xv") * F.col("yv")).cast("bigint").alias("s_xy"),
        F.sum("xv").cast("bigint").alias("s_x"),
        F.sum("yv").cast("bigint").alias("s_y"),
        F.sum(F.col("xv") * F.col("xv")).cast("bigint").alias("s_xx"),
        F.sum(F.col("yv") * F.col("yv")).cast("bigint").alias("s_yy"),
    )
    sc = t.select(
        "tx",
        "ty",
        F.col("lag_k").cast("bigint").alias("lag_k"),
        "m",
        (F.col("m") * F.col("s_xy") - F.col("s_x") * F.col("s_y"))
        .cast("bigint")
        .alias("num"),
        (F.col("m") * F.col("s_xx") - F.col("s_x") * F.col("s_x"))
        .cast("bigint")
        .alias("dh"),
        (F.col("m") * F.col("s_yy") - F.col("s_y") * F.col("s_y"))
        .cast("bigint")
        .alias("dt"),
    )
    v = sc.filter(
        (F.col("num") > 0) & (F.col("dh") > 0) & (F.col("dt") > 0)
    ).withColumn(
        "score_ppb",
        F.expr(
            "CAST((1000000000 * CAST(num AS DECIMAL(38,0)) * num)"
            " div (CAST(dh AS DECIMAL(38,0)) * dt) AS BIGINT)"
        ),
    )
    w = Window.partitionBy("tx", "ty").orderBy(
        F.col("score_ppb").desc(), F.col("lag_k")
    )
    return (
        v.withColumn("rk18", F.row_number().over(w))
        .filter(F.col("rk18") == 1)
        .select(
            F.col("tx").alias("type_x"),
            F.col("ty").alias("type_y"),
            F.col("lag_k").alias("best_lag"),
            "m",
            "num",
            "dh",
            "dt",
            "score_ppb",
        )
    )


# ---------------------------------------------------------------------------
# M341 ts_seasonal_anova_terms — hour-of-day ANOVA decomposition terms
# ---------------------------------------------------------------------------


@register(
    "ts_seasonal_anova_terms",
    oracle="""
    WITH hc AS (
      SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(h % 24 AS BIGINT) AS hod,
           CAST(count(*) AS BIGINT) AS n_k,
           CAST(sum(c) AS BIGINT) AS s_k,
           CAST(sum(c * c) AS BIGINT) AS ssq_k,
           CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS BIGINT)
             AS within_num
    FROM hc GROUP BY event_type, h % 24
    """,
)
def ts_seasonal_anova_terms(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M341 — the seasonal ANOVA decomposition's integer
    inputs: per (type, hour-of-day) over the hourly activity series,
    the group size, sum, sum of squares and the CLEARED within-group
    scatter n_k·Σc² − (Σc)² ≡ n_k·Σ(c − μ_k)² — from which the
    seasonal-strength statistic F_s = 1 − SS_within/SS_total (the STL
    diagnostic that says how much of the variance the daily cycle
    explains) assembles client-side as ratios of exact integers (the
    *_terms discipline: the final division never enters the hash
    gate).  Observed hours only (the gap rule — a missing hour is
    absence of evidence here, unlike the zero-filled cross-type
    comparison).

    Headroom (ADVICE r18): within_num's intermediates n_k·Σc² and
    (Σc)² are formed on DECIMAL(38,0) carriers — the oracle's
    un-cast DuckDB sums are HUGEINT-wide until its final BIGINT cast,
    so a LongType Spark product would have asymmetrically less
    headroom (the widen-before-sum rule's product sibling).  Both
    engines now bind only at the final BIGINT cast; with c ≤ 10⁶/h
    and n_k ≤ 10⁵ observed hours per cell the products stay under
    10¹⁷ ≪ 2⁶³ anyway at every supported scale.

    Scale: two nested map-side rollups (events → hourly counts →
    24-row-per-type terms); no joins, no windows.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hc = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return hc.groupBy(
        "event_type", (F.col("h") % 24).cast("bigint").alias("hod")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("c").cast("bigint").alias("s_k"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq_k"),
        F.expr(
            "CAST((count(1) * sum(CAST(c AS DECIMAL(38,0)) * c)"
            " - sum(CAST(c AS DECIMAL(38,0))) * sum(CAST(c AS DECIMAL(38,0))))"
            " AS BIGINT)"
        ).alias("within_num"),
    )


# ---------------------------------------------------------------------------
# M348 ts_discord_days — nearest-neighbor distance between daily profiles
# ---------------------------------------------------------------------------


@register(
    "ts_discord_days",
    oracle="""
    WITH dc AS (
      SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    days AS (SELECT DISTINCT event_type, d FROM dc),
    spine AS (
      SELECT days.event_type, days.d, h.hod
      FROM days, (SELECT unnest(generate_series(0, 23)) AS hod) h
    ),
    z AS (
      SELECT spine.event_type, spine.d, spine.hod, coalesce(dc.c, 0) AS c
      FROM spine
      LEFT JOIN dc ON dc.event_type = spine.event_type AND dc.d = spine.d
                  AND dc.hod = spine.hod
    ),
    pd AS (
      SELECT a.event_type, a.d AS da, b.d AS db,
             CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2
      FROM z a JOIN z b
        ON a.event_type = b.event_type AND a.hod = b.hod AND a.d <> b.d
      GROUP BY 1, 2, 3
    )
    SELECT event_type, da AS day, db AS nn_day, d2 AS min_d2
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type, da
                                       ORDER BY d2, db) AS rk19
          FROM pd) t
    WHERE rk19 = 1
    """,
)
def ts_discord_days(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """SURVEY §2.M M348 — DISCORD detection on daily profiles: per
    (type, day), the exact squared L2 distance to the NEAREST other
    day of the same type over zero-filled 24-hour count vectors — the
    matrix-profile primitive (a day is anomalous not because it
    crosses a threshold but because NO other day looks like it: the
    max of this min-distance column is the discord).  M68 ranks hours
    against a global level; this compares SHAPES of whole days.

    Exact integers throughout; (d2, nn_day) tie-break unique.  Oracle
    caveat (pinned by the staged test at staging): the DuckDB hod
    spine must stay a SUBQUERY inside the comma-cross — a LEFT JOIN
    written directly onto the comma-cross throws "Non-inner join on
    correlated columns".  Scale: the corpus collapses map-side to
    O(types × days × 24); the pair stage is bounded by days² per type
    — the TIME-SPAN-bounded cost (the PAA/domper argument), never
    event volume; zero-filled hod spine via a 24-literal explode.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    dc = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
        F.expr("(unix_micros(ts) div 3600000000) % 24").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    days = dc.select("event_type", "d").distinct()
    z = iter_materialize(  # both pair sides — DOUBLE-REFERENCE RULE
        days.select(
            "event_type",
            "d",
            F.explode(F.array(*[F.lit(h) for h in range(24)])).alias("hod"),
        )
        .join(dc, ["event_type", "d", "hod"], "left")
        .select(
            "event_type", "d", "hod", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    a = z.select("event_type", F.col("d").alias("da"), "hod", F.col("c").alias("ca"))
    b = z.select(
        "event_type", F.col("d").alias("db"), "hod", F.col("c").alias("cb")
    )
    pd = (
        a.join(b, ["event_type", "hod"])
        .filter(F.col("da") != F.col("db"))
        .groupBy("event_type", "da", "db")
        .agg(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            .cast("bigint")
            .alias("d2")
        )
    )
    w = Window.partitionBy("event_type", "da").orderBy(F.col("d2"), F.col("db"))
    return (
        pd.withColumn("rk19", F.row_number().over(w))
        .filter(F.col("rk19") == 1)
        .select(
            "event_type",
            F.col("da").alias("day"),
            F.col("db").alias("nn_day"),
            F.col("d2").alias("min_d2"),
        )
    )


# ---------------------------------------------------------------------------
# M349 ts_linear_interpolate — exact interpolation at missing hours
# ---------------------------------------------------------------------------


@register(
    "ts_linear_interpolate",
    oracle="""
    WITH hv AS (
      SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    nxt AS (
      SELECT event_type, h AS h1, v AS v1,
             lead(h) OVER (PARTITION BY event_type ORDER BY h) AS h2,
             lead(v) OVER (PARTITION BY event_type ORDER BY h) AS v2
      FROM hv
    ),
    gaps AS (SELECT * FROM nxt WHERE h2 IS NOT NULL AND h2 > h1 + 1),
    g AS (
      SELECT event_type, h1, h2, v1, v2,
             unnest(generate_series(h1 + 1, h2 - 1)) AS h
      FROM gaps
    )
    SELECT event_type, CAST(h AS BIGINT) AS h,
           CAST(h1 AS BIGINT) AS prev_h, CAST(h2 AS BIGINT) AS next_h,
           CAST(v1 AS BIGINT) AS v_prev, CAST(v2 AS BIGINT) AS v_next,
           CAST((1000 * (v1 * (h2 - h) + v2 * (h - h1))) // (h2 - h1)
                AS BIGINT) AS interp_milli
    FROM g
    """,
)
def ts_linear_interpolate(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """SURVEY §2.M M349 — exact LINEAR INTERPOLATION of the hourly
    count series at MISSING hours: for every gap between consecutive
    observed hours of a type, the rational
    (v1·(h2−h) + v2·(h−h1)) / (h2−h1) at each absent hour, carried
    ×1000 as one non-negative integral division — the resampling
    primitive between M40's zero-fill and a model-based impute
    (dashboards draw this line; feature pipelines feed it to models).

    The ROW-LEAD here is the semantics, not the gap bug: the M203
    rule forbids row-lags that SILENTLY cross gaps when the formula
    means calendar neighbors — this operator's entire purpose is to
    bridge the gap between consecutive OBSERVED points, so lead() over
    the observed hour sequence is the specified pairing.  Scale: the
    corpus collapses to O(types × hours); the per-gap explode is
    bounded by the span; one per-type window on the real key.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hv = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    w = Window.partitionBy("event_type").orderBy("h")
    nxt = hv.select(
        "event_type",
        F.col("h").alias("h1"),
        F.col("v").alias("v1"),
        F.lead("h").over(w).alias("h2"),
        F.lead("v").over(w).alias("v2"),
    )
    gaps = nxt.filter(F.col("h2").isNotNull() & (F.col("h2") > F.col("h1") + 1))
    g = gaps.select(
        "event_type",
        "h1",
        "h2",
        "v1",
        "v2",
        F.explode(F.expr("sequence(h1 + 1, h2 - 1)")).alias("h"),
    )
    return g.select(
        "event_type",
        F.col("h").cast("bigint").alias("h"),
        F.col("h1").cast("bigint").alias("prev_h"),
        F.col("h2").cast("bigint").alias("next_h"),
        F.col("v1").cast("bigint").alias("v_prev"),
        F.col("v2").cast("bigint").alias("v_next"),
        F.expr("(1000 * (v1 * (h2 - h) + v2 * (h - h1))) div (h2 - h1)")
        .cast("bigint")
        .alias("interp_milli"),
    )
