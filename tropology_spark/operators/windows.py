"""Window functions (SURVEY.md §2 E-rows).

Reference analogs: per-category link rankings and cumulative crawl
stats in the tropology API layer.  Determinism rule (§7.4): every
window ORDER BY ends in a unique tie-break key (event_id / p_partkey /
o_orderkey); rank/dense_rank demonstrate tie semantics by ordering on
the value alone while the row *selection* always uses the unique
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.functions.exact import ts_str, sql_ts_str
from tropology_spark.registry import register
from tropology_spark.sources.tables import load


@register(
    "win_rank",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER
               (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn,
             CAST(rank() OVER
               (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS rnk,
             CAST(dense_rank() OVER
               (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS drnk
      FROM part) t
    WHERE rn <= 5
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — row_number/rank/dense_rank ("top pages by incoming links
    per category")."""
    p = load(spark, sf_dir, "part")
    w_unique = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    w_ties = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w_unique).cast("bigint").alias("rn"),
            F.rank().over(w_ties).cast("bigint").alias("rnk"),
            F.dense_rank().over(w_ties).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "win_lag_gap",
    oracle=f"""
    SELECT user_id, event_id,
           {sql_ts_str('ts')} AS ts_s,
           coalesce({sql_ts_str("lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")},
                    'none') AS prev_ts_s
    FROM events
    """,
)
def win_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — lag: previous event per user (inter-event gap input for
    sessionization)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        ts_str(F.col("ts")).alias("ts_s"),
        F.coalesce(ts_str(F.lag("ts").over(w)), F.lit("none")).alias("prev_ts_s"),
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(
             CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) OVER w AS DOUBLE)
               / 1000000.0 / count(*) OVER w, 6) AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — 7-row moving average, micro-unit exact (order-independent
    across engines; see functions/exact.py)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    micros = F.round(F.col("value") * 1000000.0).cast("long")
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(micros).over(w) / F.lit(1000000.0) / F.count(F.lit(1)).over(w), 6
        ).alias("mov_avg"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT user_id, event_id,
           round(
             CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 1000000.0, 6) AS run_sum
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — running total (cumulative crawl counts), micro-unit
    exact."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    micros = F.round(F.col("value") * 1000000.0).cast("long")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum(micros).over(w) / F.lit(1000000.0), 6).alias("run_sum"),
    )


@register(
    "win_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — ntile / percent_rank / cume_dist.  The unique ordering
    makes the rank-ratio doubles exact integer divisions →
    deterministic across engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — first/last value with an explicit full frame (latest crawl
    state per page)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
    ).distinct()


@register(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS BIGINT) AS rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part) t
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — top-k per group ("N most-linked tropes per work")."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_range_1h",
    oracle="""
    WITH secs AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
    )
    SELECT user_id, event_id,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM secs
    """,
)
def win_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame: events per user in the trailing hour
    — the frame is bounded by the ORDER BY *value* (epoch seconds), not
    a row count, so ties and gaps behave identically in both engines.
    The rate-limiting / burst-detection shape."""
    e = load(spark, sf_dir, "events")
    secs = e.select("user_id", "event_id", F.unix_timestamp("ts").alias("sec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return secs.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
    )


# ---------------------------------------------------------------------------
# M76 — Pareto / ABC classification (cumulative-share banding)
# ---------------------------------------------------------------------------


@register(
    "win_pareto_abc",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, o_orderkey, cents,
             sum(cents) OVER (PARTITION BY o_orderpriority
                              ORDER BY cents DESC, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             sum(cents) OVER (PARTITION BY o_orderpriority) AS total_cents
      FROM c
    )
    SELECT o_orderpriority, o_orderkey, cents,
           CAST(cum_cents AS BIGINT) AS cum_cents,
           CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
                WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r
    """,
)
def win_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M76 — Pareto/ABC analysis: within each priority, orders sorted
    by value get a running revenue share and an A/B/C band (first 80%,
    next 15%, tail).  The band test is integer cross-multiplication
    (`cum·5 <= total·4`), never a float share — exact at every
    boundary in both engines.

    Scale: the running sum partitions on the banding key; a GLOBAL
    Pareto needs two passes (per-partition totals, then prefix-offset
    broadcast) — the range-partitioned prefix-sum shape, not a
    single-partition window."""
    o = load(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w_run = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("cents").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("o_orderpriority")
    r = c.select(
        "o_orderpriority",
        "o_orderkey",
        "cents",
        F.sum("cents").over(w_run).cast("bigint").alias("cum_cents"),
        F.sum("cents").over(w_tot).alias("total_cents"),
    )
    abc = (
        F.when(F.col("cum_cents") * 5 <= F.col("total_cents") * 4, "A")
        .when(F.col("cum_cents") * 20 <= F.col("total_cents") * 19, "B")
        .otherwise("C")
    )
    return r.select(
        "o_orderpriority", "o_orderkey", "cents", "cum_cents", abc.alias("abc_class")
    )


# ---------------------------------------------------------------------------
# M154 — top-k WITH TIES (rank-based cut, the WITH TIES SQL surface)
# ---------------------------------------------------------------------------


@register(
    "topk_with_ties",
    oracle="""
    WITH c AS (
      SELECT p_brand, p_type,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY p_brand, p_type
    )
    SELECT p_brand, p_type, n_parts, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, rank() OVER (PARTITION BY p_brand
                                 ORDER BY n_parts DESC) AS rnk
          FROM c) t
    WHERE rnk <= 2
    """,
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M154 — per-group top-k WITH TIES: the FETCH FIRST k WITH TIES /
    rank()-cut semantics, deliberately DISTINCT from E7's row_number
    cut — here every part type tied at the boundary count survives, so
    the result set is value-determined (no tie-break needed, and none
    is used: equal counts are genuinely equal rows).  Emitting the
    rank itself keeps the tie structure visible and the hash exact.
    Scale: count rollup with map-side combine, then a per-brand rank
    over the few part types each brand has."""
    p = load(spark, sf_dir, "part")
    c = p.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("n_parts").desc())
    return c.withColumn("rnk", F.rank().over(w).cast("bigint")).filter(
        F.col("rnk") <= 2
    )
