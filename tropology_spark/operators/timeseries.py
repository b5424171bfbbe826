"""Time-series operators (SURVEY.md §2.M M40) — resample + gap-fill
over the ``events`` stream.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tropology_spark.functions.exact import sql_ts_str, ts_str
from tropology_spark.registry import register
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
