"""Event-analytics operators (SURVEY.md §2.M M51-M52) — funnel and
cohort-retention analysis over the ``events`` stream.

The reference's analytics surface is link-structure queries; a
production events table adds the two classic product-analytics shapes:
ordered multi-step funnels (how many users progressed signup → click →
purchase, each step strictly after the previous) and cohort retention
(of the users who first appeared in week W, how many were active in
week W+k).

Determinism: every number is a count; time arithmetic is integer days
since a fixed epoch divided by 7 (no engine week-truncation rules),
and the step ordering compares the µs-exact event timestamps that
``sources.tables.load`` normalizes identically to DuckDB.

Scale notes (SURVEY.md §7.7): both operators aggregate per-user first
— the shuffle is O(users), not O(events), and partial aggregation
combines map-side.  The funnel's per-step mins are one conditional
aggregation over a single scan; retention joins two user-keyed
aggregates on the already-shuffled key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tropology_spark.registry import register
from tropology_spark.sources.tables import load

_FUNNEL_STEPS = ("signup", "click", "purchase")
_EPOCH = "2020-01-01"
_MAX_OFFSET = 8  # retention horizon in weeks


@register(
    "analytics_funnel",
    oracle=f"""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
           WHERE e.event_type = '{_FUNNEL_STEPS[1]}' GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
           WHERE e.event_type = '{_FUNNEL_STEPS[2]}' GROUP BY e.user_id)
    SELECT CAST(1 AS BIGINT) AS step, '{_FUNNEL_STEPS[0]}' AS event_type,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, '{_FUNNEL_STEPS[1]}', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, '{_FUNNEL_STEPS[2]}', CAST((SELECT count(*) FROM s3) AS BIGINT)
    """,
)
def analytics_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M51 — ordered funnel: users who did signup, then click strictly
    after their first signup, then purchase strictly after that first
    qualifying click (first-touch semantics at every step, the
    standard product-analytics definition).

    Each step is a per-user min over one event type, joined back on
    the user key — after the first groupBy everything stays on the
    O(users) side.  At 100 TB the three per-step aggregates collapse
    into one scan (conditional min) and the step joins are
    co-partitioned on user_id."""
    ev = load(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def row(step: int, name: str, src: DataFrame) -> DataFrame:
        return src.agg(
            F.lit(step).cast("bigint").alias("step"),
            F.lit(name).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        row(1, _FUNNEL_STEPS[0], s1)
        .unionByName(row(2, _FUNNEL_STEPS[1], s2))
        .unionByName(row(3, _FUNNEL_STEPS[2], s3))
    )


@register(
    "analytics_retention",
    oracle=f"""
    WITH wk AS (
      SELECT user_id,
             CAST((CAST(ts AS DATE) - DATE '{_EPOCH}') // 7 AS BIGINT) AS week
      FROM events
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, week FROM wk)
    SELECT c.cohort_week,
           CAST(a.week - c.cohort_week AS BIGINT) AS week_offset,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users
    FROM cohort c
    JOIN active a ON a.user_id = c.user_id
    WHERE a.week - c.cohort_week BETWEEN 0 AND {_MAX_OFFSET}
    GROUP BY 1, 2
    """,
)
def analytics_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M52 — cohort retention: users are cohorted by the week of their
    first event and counted in every later week they were active, up
    to {h} weeks out — the triangle a retention dashboard renders.

    Week = integer days since a fixed epoch, floor-divided by 7: no
    date_trunc('week'), whose week-start convention is an engine
    policy, just integer arithmetic both engines share.  The events
    scan reduces to (user, week) pairs immediately (distinct →
    map-side combine); cohort and activity then join co-partitioned
    on user_id, so the only O(events) stage is the first projection."""
    ev = load(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date")) / 7
    ).cast("bigint")
    wk = ev.select("user_id", week.alias("week"))
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = wk.distinct()
    off = F.col("week") - F.col("cohort_week")
    return (
        cohort.join(active, "user_id")
        .filter((off >= 0) & (off <= _MAX_OFFSET))
        .groupBy("cohort_week", off.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
