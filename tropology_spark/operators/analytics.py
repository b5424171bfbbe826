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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.plans.global_order import global_row_number, ntile_expr
from tropology_spark.registry import register
from tropology_spark.session import iter_materialize
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


@register(
    "analytics_rolling_wau",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '{_EPOCH}' AS BIGINT) AS day,
             user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def analytics_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M54 — 7-day rolling active users per day: the sliding DISTINCT
    aggregate no SQL window frame can express (COUNT(DISTINCT) over
    RANGE is unsupported in both engines), built instead as a range
    join of the day spine against per-day distinct users — the C8
    range-join shape applied to the K2 sliding-window semantics.

    Days are integers since a fixed epoch (no truncation policy).  The
    events scan reduces to distinct (day, user) pairs first — O(days ×
    users) rows, metadata-sized next to the fact table — and the day
    spine side of the range join is tiny → broadcast; at 100 TB this
    stays one scan plus a broadcast-range join, never a self-join of
    raw events."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date")).cast(
        "bigint"
    )
    du = ev.select(day.alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    u = du.select(F.col("day").alias("u_day"), "user_id")
    return (
        F.broadcast(days)
        .join(u, (F.col("u_day") >= F.col("day") - 6) & (F.col("u_day") <= F.col("day")))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


_ATTR_WINDOW_SEC = 3600  # attribution lookback


@register(
    "analytics_attribution",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click'),
    m AS (
      SELECT p.user_id, p.event_id, p.cents, c.click_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
      FROM p JOIN c
        ON c.user_id = p.user_id
       AND c.click_ts <= p.ts
       AND c.click_ts >= p.ts - INTERVAL {_ATTR_WINDOW_SEC} SECONDS
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_attributed,
           CAST(sum(cents) AS BIGINT) AS attributed_cents,
           CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks_credited
    FROM m WHERE rn = 1
    GROUP BY user_id
    """,
)
def analytics_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M55 — last-touch attribution: each purchase is credited to the
    user's most recent click within the preceding hour (the C9 as-of
    join shape pointed backwards), and credited revenue is summed
    per user.

    Money follows the cents-integer discipline (functions/exact.py):
    per-row round-to-cents then integer sum — immune to summation
    order across engines and partitionings.  The as-of match uses the
    unique (click_ts, click_id) tie-break.  Both sides reduce to the
    user's event subsets before the range join, which is partitioned
    on user_id — co-located at scale, never a cross of raw events."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    m = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("ts"))
        & (F.col("click_ts") >= F.col("ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_SEC} SECONDS")),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    return (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
            F.countDistinct("click_id").alias("n_clicks_credited"),
        )
    )


# ---------------------------------------------------------------------------
# M53 — end-to-end curation pipeline (composition of the M-stages)
# ---------------------------------------------------------------------------

_REP_MAX = 0.2  # max duplicate-bigram ratio (text_repetition's signal)


@register(
    "pipeline_curation_e2e",
    oracle=f"""
    WITH gate AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               percent_rank() OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS pr
        FROM documents
      ) WHERE pr >= 0.05 AND pr <= 0.95
    ),
    g AS (
      SELECT doc_id, l[i] || ' ' || l[i+1] AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    ),
    rep AS (
      SELECT doc_id FROM (
        SELECT doc_id, count(*) AS n_bigrams, count(DISTINCT bg) AS n_unique
        FROM g GROUP BY doc_id
      ) WHERE CAST(n_bigrams - n_unique AS DOUBLE) / n_bigrams <= {_REP_MAX}
    ),
    tok AS (
      SELECT DISTINCT doc_id, substring(text, 1, 40) AS pfx,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    siz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM tok a
      JOIN tok b ON a.token = b.token AND a.pfx = b.pfx AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN siz sa ON doc_a = sa.doc_id
      JOIN siz sb ON doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    ),
    es AS (SELECT doc_a AS s, doc_b AS d FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs
           UNION ALL SELECT doc_id, doc_id FROM documents),
    l0 AS (SELECT doc_id, doc_id AS lbl FROM documents),
    l1 AS (SELECT e.d AS doc_id, min(l.lbl) AS lbl FROM es e
           JOIN l0 l ON l.doc_id = e.s GROUP BY e.d),
    l2 AS (SELECT e.d AS doc_id, min(l.lbl) AS lbl FROM es e
           JOIN l1 l ON l.doc_id = e.s GROUP BY e.d),
    l3 AS (SELECT e.d AS doc_id, min(l.lbl) AS lbl FROM es e
           JOIN l2 l ON l.doc_id = e.s GROUP BY e.d),
    canon AS (SELECT doc_id FROM l3 WHERE doc_id = lbl),
    kept AS (
      SELECT d.doc_id, d.lang, d.source,
             len(string_split(d.text, ' ')) AS n_tokens
      FROM documents d
      JOIN gate USING (doc_id)
      JOIN rep USING (doc_id)
      JOIN canon USING (doc_id)
    )
    SELECT d.lang, d.source,
           CAST(count(*) AS BIGINT) AS n_docs_in,
           CAST(count(k.doc_id) AS BIGINT) AS n_docs_kept,
           CAST(coalesce(sum(k.n_tokens), 0) AS BIGINT) AS sum_tokens_kept
    FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
    GROUP BY 1, 2
    """,
)
def pipeline_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M53 — the curation stages COMPOSED: a document survives iff it
    passes the per-lang length band (M44), has duplicate-bigram ratio
    <= {r} (M28's signal as a filter), and is its near-dup cluster's
    canonical representative (M24).  Reported as per-(lang, source)
    yield — docs in, docs kept, kept token budget — the table a data
    lead reads before a training run.

    Built by composing the registered stage builders directly (each
    returns a DataFrame; Catalyst fuses the semi-joins into one plan),
    so the e2e query cannot drift from the stages it summarizes.  The
    unrounded exact-integer ratios are compared to thresholds only —
    both engines evaluate the identical IEEE division."""
    from tropology_spark import QUERIES

    d = load(spark, sf_dir, "documents")
    gate = QUERIES["text_length_gate"](spark, sf_dir).select("doc_id")
    rep_src = QUERIES["text_repetition"](spark, sf_dir)
    rep = rep_src.filter(
        (F.col("n_bigrams") - F.col("n_unique")).cast("double") / F.col("n_bigrams")
        <= _REP_MAX
    ).select("doc_id")
    canon = (
        QUERIES["dedup_cluster_canonical"](spark, sf_dir)
        .filter(F.col("is_kept") == 1)
        .select("doc_id")
    )
    kept = (
        d.join(gate, "doc_id")
        .join(rep, "doc_id")
        .join(canon, "doc_id")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
    )
    return (
        d.select("doc_id", "lang", "source")
        .join(kept, "doc_id", "left")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_in"),
            F.count("n_tokens").alias("n_docs_kept"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("sum_tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# M96 — first-order Markov transition matrix over event streams
# ---------------------------------------------------------------------------


@register(
    "analytics_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    outs AS (
      SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_out FROM trans
      GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.n, o.n_out,
           CAST(t.n AS DOUBLE) / o.n_out AS p
    FROM trans t JOIN outs o USING (prev_type)
    """,
)
def analytics_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M96 — the first-order behavior model: for each (prev, next)
    event-type pair, the transition count and row-normalized
    probability over per-user event sequences.  The sequence-model
    summary (user-journey simulation, synthetic-session generation,
    anomaly baselines).  Counts are exact; p is ONE division of two
    exact BIGINTs — bit-identical in both engines.

    Scale: one shuffle on user_id for the lag window (per-user state
    is one row), then a map-side-combinable pair count; the row-
    normalizer is an event-type-cardinality broadcast."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    outs = trans.groupBy("prev_type").agg(
        F.sum("n").cast("bigint").alias("n_out")
    )
    return trans.join(F.broadcast(outs), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        "n_out",
        (F.col("n").cast("double") / F.col("n_out")).alias("p"),
    )


# ---------------------------------------------------------------------------
# M105 — new vs returning users per day + cumulative distinct users
# ---------------------------------------------------------------------------


@register(
    "analytics_new_vs_returning",
    oracle=f"""
    WITH d AS (
      SELECT user_id,
             CAST(CAST(ts AS DATE) - DATE '{_EPOCH}' AS BIGINT) AS day
      FROM events
    ),
    fu AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id),
    du AS (SELECT DISTINCT user_id, day FROM d),
    per AS (
      SELECT du.day,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN du.day = fu.first_day THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN du.day > fu.first_day THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returning
      FROM du JOIN fu USING (user_id)
      GROUP BY du.day
    )
    SELECT day, n_active, n_new, n_returning,
           CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM per
    """,
)
def analytics_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M105 — daily new-vs-returning split plus the cumulative distinct
    user count: the growth-accounting table.  The running COUNT(DISTINCT
    ... ) OVER that no engine supports is re-expressed exactly via the
    first-occurrence trick — a user is "new" on min(day), and the
    cumulative distinct total is the running sum of daily news.

    All counts exact; days are integers since a fixed epoch (no
    truncation policy).  Scale: events reduce to distinct (user, day)
    immediately (map-side combinable), first-day is one more user-keyed
    aggregate joined co-partitioned, and the running sum acts on the
    O(days) result — the only O(events) stage is the first projection."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date")).cast(
        "bigint"
    )
    d = ev.select("user_id", day.alias("day"))
    fu = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    du = d.distinct()
    per = (
        du.join(fu, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_returning"),
        )
    )
    w = (
        Window.partitionBy(F.pmod(F.col("day"), F.lit(1)))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.select(
        "day",
        "n_active",
        "n_new",
        "n_returning",
        F.sum("n_new").over(w).cast("bigint").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# M117 — A/B experiment lift accounting
# ---------------------------------------------------------------------------


@register(
    "analytics_ab_lift",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT user_id,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant
      FROM u
    ),
    conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT v.variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(conv.user_id) AS BIGINT) AS n_converted,
           round(CAST(count(conv.user_id) AS DOUBLE) / count(*), 6)
             AS conversion_rate
    FROM v LEFT JOIN conv ON v.user_id = conv.user_id
    GROUP BY v.variant
    """,
)
def analytics_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M117 — A/B experiment accounting: users deterministically
    hash-split into variants (md5 first hex digit < '8' ≈ 50/50 — the
    reproducible assignment every experimentation platform uses so a
    user sees one variant forever), conversion = any purchase event.
    Counts are exact integers; the rate is one final division of
    exact ints rounded to 6 dp.

    Scale: distinct-user and converter sets are both user-keyed
    aggregates (map-side combinable); the variant is a pure hash of
    the key, so assignment needs no lookup table and no shuffle of
    its own."""
    ev = load(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    v = u.withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        ).otherwise("B"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("cuid"))
        .distinct()
    )
    return (
        v.join(conv, v.user_id == F.col("cuid"), "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.count("cuid").cast("bigint").alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.round(F.col("n_converted").cast("double") / F.col("n_users"), 6),
        )
    )


# ---------------------------------------------------------------------------
# M139 — cohort revenue matrix (the money twin of M52's retention counts)
# ---------------------------------------------------------------------------


@register(
    "analytics_cohort_revenue",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             CAST((CAST(ts AS DATE) - DATE '{_EPOCH}') // 7 AS BIGINT) AS week,
             CAST(round(value * 1000000.0) AS BIGINT) AS vm
      FROM events WHERE event_type = 'purchase'
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM p GROUP BY user_id)
    SELECT c.cohort_week,
           CAST(p.week - c.cohort_week AS BIGINT) AS week_offset,
           CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_buyers,
           CAST(sum(p.vm) AS BIGINT) AS revenue_micros
    FROM cohort c
    JOIN p ON p.user_id = c.user_id
    WHERE p.week - c.cohort_week BETWEEN 0 AND {_MAX_OFFSET}
    GROUP BY 1, 2
    """,
)
def analytics_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M139 — cohort REVENUE matrix: users cohorted by first-purchase
    week (M52's integer week arithmetic — days since a fixed epoch
    floor-divided by 7, no engine week-truncation policy), each later
    week's purchase revenue summed µs-exactly (value × 1e6 as BIGINT,
    the K1 micros discipline — no float carrier anywhere).  The LTV
    build-up curve a growth dashboard draws next to M52's retention
    triangle.  Scale: the events scan reduces immediately to
    (user, week, micros) purchase rows; cohort assignment and the
    matrix join are both user-keyed — O(purchases) shuffle once, then
    co-partitioned joins, the M52 plan with one extra summed column."""
    ev = load(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date")) / 7
    ).cast("bigint")
    vm = F.round(F.col("value") * 1000000.0).cast("long")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", week.alias("week"), vm.alias("vm")
    )
    cohort = p.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    off = F.col("week") - F.col("cohort_week")
    return (
        cohort.join(p, "user_id")
        .filter((off >= 0) & (off <= _MAX_OFFSET))
        .groupBy("cohort_week", off.alias("week_offset"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
            F.sum("vm").cast("bigint").alias("revenue_micros"),
        )
    )


# ---------------------------------------------------------------------------
# M140 — DAU/MAU stickiness terms (two sliding-distinct widths at once)
# ---------------------------------------------------------------------------


@register(
    "analytics_stickiness_terms",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '{_EPOCH}' AS BIGINT) AS day,
             user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
                AS BIGINT) AS dau,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 29 AND d.day
    GROUP BY d.day
    """,
)
def analytics_stickiness_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M140 — DAU and 30-day MAU per day, the two integer terms of the
    stickiness KPI (DAU/MAU), emitted exactly (the consumer divides
    once — the M70 integer-pair discipline).  Day = integer days since
    the fixed epoch (M52/M54 arithmetic).  Both sliding DISTINCTs come
    from ONE day-range join pass: the daily term is the same distinct
    counted under an equality flag, so adding DAU costs no second
    scan.  Scale: the events stream reduces to distinct (day, user)
    immediately (map-side combine); the 30× day fan-out is bounded by
    the window width, and at 100 TB each day keeps a mergeable KMV/
    bitmap user sketch (D4/M97) so the window union is sketch merges,
    not raw re-joins — this exact query is that path's oracle-scale
    reference."""
    ev = load(spark, sf_dir, "events")
    day = (
        F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date"))
        .cast("bigint")
        .alias("day")
    )
    du = ev.select(day, "user_id").distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    return (
        F.broadcast(days)
        .join(du, (F.col("day") >= F.col("d") - 29) & (F.col("day") <= F.col("d")))
        .groupBy(F.col("d").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("d"), F.col("user_id"))
            )
            .cast("bigint")
            .alias("dau"),
            F.countDistinct("user_id").cast("bigint").alias("mau"),
        )
    )


# ---------------------------------------------------------------------------
# M150 — time-to-convert distribution (signup → first purchase)
# ---------------------------------------------------------------------------


@register(
    "analytics_time_to_convert",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN s ON s.user_id = e.user_id AND e.ts > s.t_signup
          WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    d AS (SELECT s.user_id,
                 CAST(floor(epoch(p.t_purchase)) - floor(epoch(s.t_signup))
                      AS BIGINT) AS sec
          FROM s JOIN p ON s.user_id = p.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(sec) AS BIGINT) AS min_sec,
           round(median(sec), 4) AS p50_sec,
           round(quantile_cont(sec, 0.9), 4) AS p90_sec,
           CAST(max(sec) AS BIGINT) AS max_sec
    FROM d
    """,
)
def analytics_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M150 — conversion-latency distribution: per user, seconds from
    first signup to first STRICTLY LATER purchase (M51's step-ordering
    rule), summarized as count / min / interpolated p50+p90 / max.
    Timestamps truncate to epoch seconds before differencing (the M57
    integer discipline); the two quantiles follow M11's proven
    convention (both engines interpolate at (n-1)·q, 4-dp rounding
    absorbs last-ulp drift).  Scale: two conditional per-user min
    aggregates on the user-partitioned stream, then one scalar
    aggregate over O(users) rows — the funnel plan plus a quantile."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    d = s.join(p, "user_id").select(
        (
            F.floor(F.unix_timestamp("t_purchase"))
            - F.floor(F.unix_timestamp("t_signup"))
        )
        .cast("bigint")
        .alias("sec")
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("sec").cast("bigint").alias("min_sec"),
        F.round(F.median("sec"), 4).alias("p50_sec"),
        F.round(F.percentile("sec", 0.9), 4).alias("p90_sec"),
        F.max("sec").cast("bigint").alias("max_sec"),
    )


# ---------------------------------------------------------------------------
# M153 — user-activity histogram (power-law audit for the events stream)
# ---------------------------------------------------------------------------


@register(
    "analytics_activity_histogram",
    oracle="""
    WITH a AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    SELECT CAST(floor(log2(n)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(n) AS BIGINT) AS min_events,
           CAST(max(n) AS BIGINT) AS max_events,
           CAST(sum(n) AS BIGINT) AS sum_events
    FROM a GROUP BY 1
    """,
)
def analytics_activity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M153 — per-user activity distribution in power-of-two buckets
    (M114's degree-histogram audit applied to the events stream): the
    skew table that decides whether user-keyed jobs need salting
    (M89) or a celebrity split (M119's cap philosophy) before scaling.
    floor(log2) on exact integer counts is engine-identical (powers of
    two are exact in IEEE log2).  Scale: one user-keyed count with
    map-side combine, then a ~20-key rollup."""
    ev = load(spark, sf_dir, "events")
    a = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        a.groupBy(F.floor(F.log2(F.col("n"))).cast("bigint").alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("n").cast("bigint").alias("min_events"),
            F.max("n").cast("bigint").alias("max_events"),
            F.sum("n").cast("bigint").alias("sum_events"),
        )
    )


# ---------------------------------------------------------------------------
# M157 — RFM segmentation (recency / frequency / monetary quartiles)
# ---------------------------------------------------------------------------


@register(
    "analytics_rfm_segments",
    oracle="""
    WITH mx AS (SELECT max(ts) AS t_ref FROM events),
    u AS (
      SELECT user_id,
             CAST(floor(epoch((SELECT t_ref FROM mx))) - floor(epoch(max(ts)))
                  AS BIGINT) AS recency_sec,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 1000000.0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS monetary_micros
      FROM events GROUP BY user_id
    ),
    q AS (
      SELECT user_id,
             ntile(4) OVER (ORDER BY recency_sec, user_id) AS r_quartile,
             ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
             ntile(4) OVER (ORDER BY monetary_micros DESC, user_id) AS m_quartile
      FROM u
    )
    SELECT CAST(r_quartile AS BIGINT) AS r_quartile,
           CAST(f_quartile AS BIGINT) AS f_quartile,
           CAST(m_quartile AS BIGINT) AS m_quartile,
           CAST(count(*) AS BIGINT) AS n_users
    FROM q GROUP BY 1, 2, 3
    """,
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M157 — RFM segmentation: per user, recency (seconds before the
    corpus max timestamp, integer-truncated), frequency (events), and
    monetary (purchase micros, exact) → quartile each with ntile over
    a UNIQUE ordering (metric + user_id tie-break, the E5/M133 ntile
    discipline — partitioning can never flip an assignment) → user
    counts per (R,F,M) cell.  The classic growth-marketing cut, and a
    deliberate stress of three ntiles over different orderings of one
    frame.  Scale: one user-keyed agg (map-side combine), then three
    RANGE-PARTITIONED rank passes (plans/global_order.py) with the
    tile computed arithmetically from rank + group total
    (ntile_expr) — at 100 TB users are billions and the old triple
    ``ntile(4) OVER (ORDER BY ...)`` was three single-partition total
    orders; now each pass is a balanced range shuffle plus a broadcast
    offsets join.  The reference timestamp is a broadcast scalar, not
    a driver collect."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("t_ref"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            (
                F.floor(F.unix_timestamp(F.first("t_ref")))
                - F.floor(F.unix_timestamp(F.max("ts")))
            )
            .cast("bigint")
            .alias("recency_sec"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 1000000.0).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("bigint")
            .alias("monetary_micros"),
        )
    )
    q = u
    for rank_col, tile, order in (
        ("__r_rank", "r_quartile", ["recency_sec", "user_id"]),
        ("__f_rank", "f_quartile", [F.col("frequency").desc(), "user_id"]),
        ("__m_rank", "m_quartile", [F.col("monetary_micros").desc(), "user_id"]),
    ):
        q = global_row_number(q, order, out=rank_col, total_col="__n")
        q = q.withColumn(
            tile, ntile_expr(F.col(rank_col), F.col("__n"), 4)
        ).drop(rank_col, "__n")
    return q.groupBy(
        F.col("r_quartile").cast("bigint").alias("r_quartile"),
        F.col("f_quartile").cast("bigint").alias("f_quartile"),
        F.col("m_quartile").cast("bigint").alias("m_quartile"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


# ---------------------------------------------------------------------------
# M168 — MAU via mergeable per-day KMV sketches, with built-in audit
# ---------------------------------------------------------------------------

_MAU_K = 64


@register(
    "analytics_mau_kmv_audit",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '{_EPOCH}' AS BIGINT) AS day,
             user_id,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ),
    sk AS (
      SELECT day, h FROM (
        SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
        FROM (SELECT DISTINCT day, h FROM du) t
      ) r WHERE rn <= {_MAU_K}
    ),
    days AS (SELECT DISTINCT day FROM du),
    winh AS (
      SELECT d.day, s.h
      FROM days d JOIN sk s ON s.day BETWEEN d.day - 29 AND d.day
      GROUP BY d.day, s.h
    ),
    r2 AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
           FROM winh),
    p AS (SELECT day, count(*) AS n_h,
                 max(CASE WHEN rn = {_MAU_K} THEN h END) AS mk
          FROM r2 GROUP BY day),
    est AS (
      SELECT day,
             CAST(CASE WHEN n_h >= {_MAU_K}
                       THEN ({_MAU_K - 1} * 4294967296) // (mk + 1)
                       ELSE n_h END AS BIGINT) AS mau_kmv
      FROM p
    ),
    ex AS (
      SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau_exact
      FROM days d JOIN du u ON u.day BETWEEN d.day - 29 AND d.day
      GROUP BY d.day
    )
    SELECT ex.day, ex.mau_exact, est.mau_kmv,
           CAST((1000000 * abs(est.mau_kmv - ex.mau_exact)) // ex.mau_exact
                AS BIGINT) AS err_ppm
    FROM ex JOIN est ON ex.day = est.day
    """,
)
def analytics_mau_kmv_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M168 — M140's declared SCALE PATH as code: 30-day MAU from
    MERGEABLE per-day KMV sketches (k smallest distinct md5-low-32
    hashes per day; window MAU = KMV estimate over the union of the 30
    day-sketches), with the exact sliding distinct joined alongside
    and the relative error as integer ppm — the sketch ships with its
    own trust table (the M161 discipline).

    The merge is EXACT, not approximate-on-approximate: any hash among
    the window's global k minima is necessarily within its own day's k
    minima, so merging day-sketches reproduces the raw-window KMV
    bit-for-bit — that provable property is why per-day sketches (k
    integers each) can replace the 30× raw fan-out at 100 TB.  Scale:
    the sketch side touches O(days·k) integers after one distinct
    pass; only the audit's exact side re-joins raw (day, user) rows,
    and at scale it runs on a sampled day subset."""
    ev = load(spark, sf_dir, "events")
    day = (
        F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date"))
        .cast("bigint")
        .alias("day")
    )
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    du = ev.select(day, "user_id", h).distinct()
    dh = du.select("day", "h").distinct()
    sk = (
        dh.withColumn(
            "rn", F.row_number().over(Window.partitionBy("day").orderBy("h"))
        )
        .filter(F.col("rn") <= _MAU_K)
        .select("day", "h")
    )
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    winh = (
        F.broadcast(days)
        .join(sk, (F.col("day") >= F.col("d") - 29) & (F.col("day") <= F.col("d")))
        .select(F.col("d"), "h")
        .distinct()
    )
    p = (
        winh.withColumn(
            "rn", F.row_number().over(Window.partitionBy("d").orderBy("h"))
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.max(F.when(F.col("rn") == _MAU_K, F.col("h"))).alias("mk"),
        )
    )
    est = p.select(
        F.col("d"),
        F.when(
            F.col("n_h") >= _MAU_K,
            F.expr(f"({_MAU_K - 1} * 4294967296) div (mk + 1)"),
        )
        .otherwise(F.col("n_h"))
        .cast("bigint")
        .alias("mau_kmv"),
    )
    ex = (
        F.broadcast(days)
        .join(
            du.select("day", "user_id"),
            (F.col("day") >= F.col("d") - 29) & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau_exact"))
    )
    return (
        ex.join(est, "d")
        .select(
            F.col("d").alias("day"),
            "mau_exact",
            "mau_kmv",
            F.expr("(1000000 * abs(mau_kmv - mau_exact)) div mau_exact")
            .cast("bigint")
            .alias("err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# M170 — daily activity streaks (gaps-and-islands)
# ---------------------------------------------------------------------------


@register(
    "analytics_dau_streaks",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '{_EPOCH}' AS BIGINT) AS day
      FROM events
    ),
    r AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM d
    ),
    s AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      FROM r GROUP BY user_id, grp
    ),
    u AS (
      SELECT user_id,
             CAST(max(len) AS BIGINT) AS best_streak,
             CAST(count(*) AS BIGINT) AS n_streaks,
             CAST(sum(len) AS BIGINT) AS active_days
      FROM s GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, best_streak, n_streaks,
           active_days
    FROM u ORDER BY best_streak DESC, user_id LIMIT 20
    """,
)
def analytics_dau_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M170 — longest consecutive-day activity streak per user, the
    classic gaps-and-islands shape the registry lacked: a user's
    distinct active days fall into islands wherever ``day -
    row_number()`` (both monotone in day) is constant, so one
    user-partitioned window + two integer aggregates yield best
    streak, island count, and total active days.  Top-20 by (streak
    DESC, user_id) — the unique-key rank discipline.

    Determinism: day = integer days since the fixed epoch (the M52
    idiom — no engine week/date-trunc conventions), every output an
    exact BIGINT.  Scale: the events scan reduces to distinct (user,
    day) pairs immediately (map-side combine); the island window and
    both rollups all live inside the user_id partition — one shuffle
    total — and the top-20 is Spark's TakeOrdered, never a global
    single-partition window (the plans/global_order.py rule)."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date"))
        .cast("bigint")
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.withColumn("grp", F.col("day") - F.row_number().over(w))
    s = r.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    u = s.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("best_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("len").cast("bigint").alias("active_days"),
    )
    return u.orderBy(F.desc("best_streak"), F.asc("user_id")).limit(20)


# ---------------------------------------------------------------------------
# M173 — market-basket part pairs (bounded within-order co-occurrence)
# ---------------------------------------------------------------------------


@register(
    "analytics_basket_pairs",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
    supp AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS supp
             FROM b GROUP BY l_partkey),
    p AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_both,
           sa.supp AS supp_a, sb.supp AS supp_b,
           CAST((1000000 * n_both * n.n_orders) // (sa.supp * sb.supp)
                AS BIGINT) AS lift_ppm
    FROM p
    JOIN supp sa ON sa.l_partkey = part_a
    JOIN supp sb ON sb.l_partkey = part_b
    CROSS JOIN n
    WHERE n_both >= 3
    ORDER BY n_both DESC, part_a, part_b LIMIT 20
    """,
)
def analytics_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M173 — market-basket co-occurrence: part pairs bought together
    in the same order, with support counts and an integer-ppm lift
    score ((10⁶·n_both·n_orders) div (supp_a·supp_b) — all positive,
    so DuckDB ``//`` and Spark ``div`` agree; the CLAUDE.md
    integer-division rule).  Top-20 by (n_both DESC, part_a, part_b).

    Scale — why this does NOT need the celebrity toolkit: the pair
    explosion is bounded by ORDER size (≤13 distinct parts per order
    in this fixture, ≤7 lineitems in TPC-H), not by part popularity,
    so per-order pair generation is O(orders·C(13,2)) worst-case.
    The plan exploits that: one shuffle groups baskets per order,
    pairs are generated IN-PARTITION from the sorted bounded array
    (no self-join re-shuffle of the (order, part) table), and the
    part-keyed support table (O(parts)) broadcasts onto the pair
    aggregate.  The oracle keeps the declarative self-join — clarity
    over scale is the right trade for DuckDB at sf0.01."""
    l = load(spark, sf_dir, "lineitem")
    # ONE wide shuffle builds the baskets (collect_set dedups parts
    # within the order — no separate distinct pass); every other frame
    # derives from it, so the shared frames are materialized per the
    # DOUBLE-REFERENCE RULE (CLAUDE.md): basket feeds pairs + support
    # + the order count, supp feeds both broadcast enrichments.
    basket = iter_materialize(
        l.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("parts")
        )
    )
    n = basket.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    supp = iter_materialize(
        basket.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supp"))
    )
    pairs = basket.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    pc = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_both")
    )
    res = (
        pc.filter(F.col("n_both") >= 3)
        .join(
            F.broadcast(supp.withColumnRenamed("supp", "supp_a")),
            F.col("part_a") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .join(
            F.broadcast(supp.withColumnRenamed("supp", "supp_b")),
            F.col("part_b") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "n_both", "supp_a", "supp_b",
            F.expr("(1000000 * n_both * n_orders) div (supp_a * supp_b)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )
    return res.orderBy(F.desc("n_both"), F.asc("part_a"), F.asc("part_b")).limit(20)


# ---------------------------------------------------------------------------
# M186 — event-type audience overlap (bounded per-user type baskets)
# ---------------------------------------------------------------------------


@register(
    "analytics_event_type_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
           FROM tu GROUP BY event_type),
    pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           sa.n_users AS users_a, sb.n_users AS users_b,
           CAST((1000000 * n_both)
                // (sa.n_users + sb.n_users - n_both) AS BIGINT) AS jaccard_ppm
    FROM pair
    JOIN sz sa ON sa.event_type = type_a
    JOIN sz sb ON sb.event_type = type_b
    """,
)
def analytics_event_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M186 — audience overlap between event types: per type pair, the
    users active in both, with set sizes and integer-ppm Jaccard —
    the feature-adoption overlap matrix a product dashboard renders.

    Scale — the M173 bounded-basket plan, not the oracle's self-join:
    a user's distinct type set is bounded by the TYPE VOCABULARY
    (5 here, rarely more than dozens anywhere), so pairs are generated
    in-partition from each user's sorted type array after ONE shuffle
    on user_id; type-level audience sizes (O(types)) broadcast onto
    the C(types,2)-row result.  Nothing in the plan is
    O(users × users)."""
    ev = load(spark, sf_dir, "events")
    basket = iter_materialize(
        ev.groupBy("user_id").agg(
            F.sort_array(F.collect_set("event_type")).alias("types")
        )
    )
    sz = basket.select(F.explode("types").alias("event_type")).groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    pairs = basket.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (x, i) -> "
                "transform(slice(types, i + 2, size(types)), "
                "y -> struct(x AS type_a, y AS type_b))))"
            )
        ).alias("p")
    ).select("p.type_a", "p.type_b")
    pair = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_both")
    )
    return (
        pair.join(
            F.broadcast(sz.withColumnRenamed("n_users", "users_a")),
            F.col("type_a") == F.col("event_type"),
        )
        .drop("event_type")
        .join(
            F.broadcast(sz.withColumnRenamed("n_users", "users_b")),
            F.col("type_b") == F.col("event_type"),
        )
        .drop("event_type")
        .select(
            "type_a", "type_b", "n_both", "users_a", "users_b",
            F.expr("(1000000 * n_both) div (users_a + users_b - n_both)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# M192 — Gini concentration of customer spend (exact integer Lorenz terms)
# ---------------------------------------------------------------------------


@register(
    "analytics_gini_spend",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT spend_cents,
             CAST(row_number() OVER (ORDER BY spend_cents, o_custkey)
                  AS BIGINT) AS pos
      FROM s
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(spend_cents) AS BIGINT) AS total_cents,
             CAST(sum(pos * spend_cents) AS BIGINT) AS s1
      FROM r
    )
    SELECT n_customers, total_cents,
           CAST((1000000 * (2 * CAST(s1 AS HUGEINT)
                            - (n_customers + 1) * CAST(total_cents AS HUGEINT)))
                // (CAST(n_customers AS HUGEINT) * total_cents)
                AS BIGINT) AS gini_ppm
    FROM a
    """,
)
def analytics_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M192 — Gini coefficient of customer lifetime spend, the
    revenue-concentration number every marketplace health report
    carries, computed from the exact integer Lorenz identity
    G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) over spend ranked
    ascending with the unique (spend, custkey) tie-break.  Spend is
    cent-integer (the functions/exact.py discipline), every term an
    exact BIGINT, and the numerator is non-negative for an ascending
    rank — so DuckDB ``//`` and Spark ``div`` agree (the
    sim_cluster_cohesion sign rule, satisfied by construction).

    The global rank comes from plans/global_order.py's two-pass
    range-partitioned prefix-sum — never a single-partition window
    (the oracle keeps the one-window form; bit-equality of the two is
    what the parity check proves).  Scale: one user-keyed rollup
    (map-side combinable), one range shuffle for the rank, and the
    final Σ i·x_i is a partial-aggregate reduction to a single row —
    no stage holds more than a partition of (pos, spend) pairs."""
    o = load(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_cents")
    )
    r = global_row_number(s, ["spend_cents", "o_custkey"], out="pos")
    a = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("spend_cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("pos") * F.col("spend_cents")).cast("bigint").alias("s1"),
    )
    # The single-row finale exceeds BIGINT (10⁶ · Σ i·x_i), so both
    # engines compute it in wide integers: DECIMAL(38,0) here, HUGEINT
    # in the oracle — `div` on decimals is exact integral division.
    return a.select(
        "n_customers",
        "total_cents",
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0))"
            " * (2 * CAST(s1 AS DECIMAL(38,0))"
            "    - (n_customers + 1) * CAST(total_cents AS DECIMAL(38,0))))"
            " div (CAST(n_customers AS DECIMAL(38,0)) * total_cents)"
        )
        .cast("bigint")
        .alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# M193 — inter-order gap histogram (repeat-purchase cadence)
# ---------------------------------------------------------------------------


@register(
    "analytics_order_gap_histogram",
    oracle="""
    WITH d AS (
      SELECT o_custkey,
             CAST(CAST(o_orderdate AS DATE) - DATE '2020-01-01' AS BIGINT)
               AS day,
             o_orderkey
      FROM orders
    ),
    g AS (
      SELECT day - lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey) AS gap
      FROM d
    ),
    b AS (
      SELECT CASE WHEN gap <= 7 THEN '0-7'
                  WHEN gap <= 30 THEN '08-30'
                  WHEN gap <= 90 THEN '31-90'
                  ELSE '91+' END AS bucket,
             gap
      FROM g WHERE gap IS NOT NULL
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_days,
           CAST(max(gap) AS BIGINT) AS max_days,
           CAST(sum(gap) AS BIGINT) AS sum_days
    FROM b GROUP BY bucket
    """,
)
def analytics_order_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M193 — repeat-purchase cadence: the distribution of day gaps
    between a customer's consecutive orders, bucketed into the weekly/
    monthly/quarterly bands a lifecycle-marketing report uses.  Day =
    integer days since the fixed epoch (the M170/M52 idiom — no engine
    date-trunc conventions); consecutive = lag over the
    unique (day, orderkey) order; buckets labelled so string sort
    equals band order.

    Scale: one customer-partitioned lag window (orders shuffle once on
    custkey, partitions of per-customer order lists), then a 4-key
    rollup with map-side combine.  No global window, no join."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date"))
        .cast("bigint")
        .alias("day"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    g = d.select((F.col("day") - F.lag("day").over(w)).alias("gap")).filter(
        F.col("gap").isNotNull()
    )
    b = g.select(
        F.when(F.col("gap") <= 7, "0-7")
        .when(F.col("gap") <= 30, "08-30")
        .when(F.col("gap") <= 90, "31-90")
        .otherwise("91+")
        .alias("bucket"),
        "gap",
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("gap").cast("bigint").alias("min_days"),
        F.max("gap").cast("bigint").alias("max_days"),
        F.sum("gap").cast("bigint").alias("sum_days"),
    )


# ---------------------------------------------------------------------------
# M194 — top in-session event-type paths (behavioral trigrams)
# ---------------------------------------------------------------------------


@register(
    "analytics_session_paths",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(sum(new_s) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT) AS sess
      FROM o
    ),
    t AS (
      SELECT lag(event_type, 2) OVER w2 AS t1,
             lag(event_type, 1) OVER w2 AS t2,
             event_type AS t3
      FROM s
      WINDOW w2 AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
    )
    SELECT t1 || '>' || t2 || '>' || t3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM t WHERE t1 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """,
)
def analytics_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M194 — the top-20 three-step behavioral paths (event-type
    trigrams) inside 30-minute-gap sessions — the "what do users
    actually do in a sitting" table behind funnel design.  Sessions
    are gap islands (the M57 rule: a session breaks when the gap
    strictly exceeds 1800 s, exact µs integers); within-session order
    is the unique (ts, event_id); paths shorter than 3 contribute
    nothing (lag(2) NULL filter).

    Scale: both windows and the running session counter live in the
    user_id partition (one shuffle of events on user_id — the second
    window's (user, sess) partition is a refinement of the first, so
    Spark reuses the partitioning and only re-sorts); path counts
    combine map-side and the top-20 is TakeOrdered, never a global
    window."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    prev_us = F.lag(us).over(w)
    o = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(prev_us.isNull() | (us - prev_us > 1800000000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    s = o.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum("new_s").over(w).cast("bigint").alias("sess"),
    )
    w2 = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    t = s.select(
        F.lag("event_type", 2).over(w2).alias("t1"),
        F.lag("event_type", 1).over(w2).alias("t2"),
        F.col("event_type").alias("t3"),
    )
    return (
        t.filter(F.col("t1").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# M207 — cumulative audience reach per event type
# ---------------------------------------------------------------------------


@register(
    "analytics_cumulative_reach",
    oracle=f"""
    WITH f AS (
      SELECT event_type, user_id,
             CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS first_day
      FROM events GROUP BY 1, 2
    ),
    n AS (
      SELECT event_type, first_day AS day,
             CAST(count(*) AS BIGINT) AS n_new
      FROM f GROUP BY 1, 2
    )
    SELECT event_type, day, n_new,
           CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS cum_reach
    FROM n
    """,
)
def analytics_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M207 — the cumulative-reach curve: per event type and day, how
    many users have EVER used the feature by that day — the running
    distinct-user count that naive SQL writes as a distinct-aggregate
    window (unbounded state, re-counting every prefix).  The classic
    first-touch decomposition makes it exact and cheap: a user joins
    the curve exactly once, on their FIRST day, so cumulative distinct
    = prefix-sum of first-day counts.

    Day = integer ``epoch_us div 86400·10⁶``; counts and prefix sums
    are exact BIGINTs.

    Scale: the (type, user) min-day rollup combines map-side (events
    never shuffle raw); daily new-user counts are O(types × days); the
    prefix window partitions by type over the calendar axis — bounded
    by TIME, not data (the CLAUDE.md bounded-cardinality exemption),
    and at a billion users the curve table is still types × days."""
    e = load(spark, sf_dir, "events")
    f = e.groupBy("event_type", "user_id").agg(
        F.min(F.expr("unix_micros(ts) div 86400000000"))
        .cast("bigint")
        .alias("first_day")
    )
    n = f.groupBy("event_type", F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return n.select(
        "event_type", "day", "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cum_reach"),
    )


# ---------------------------------------------------------------------------
# M210 — Lorenz deciles of customer spend (who carries the revenue)
# ---------------------------------------------------------------------------


@register(
    "analytics_spend_deciles",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT spend_cents,
             ntile(10) OVER (ORDER BY spend_cents, o_custkey) AS decile
      FROM s
    ),
    d AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(spend_cents) AS BIGINT) AS spend_cents
      FROM r GROUP BY decile
    ),
    t AS (
      SELECT *, CAST(sum(spend_cents) OVER () AS BIGINT) AS total,
             CAST(sum(spend_cents) OVER (ORDER BY decile) AS BIGINT) AS cum
      FROM d
    )
    SELECT decile, n_customers, spend_cents,
           CAST((1000000 * spend_cents) // total AS BIGINT) AS share_ppm,
           CAST((1000000 * cum) // total AS BIGINT) AS cum_share_ppm
    FROM t
    """,
)
def analytics_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M210 — the Lorenz table behind M192's single Gini number: spend
    share and cumulative share per customer DECILE (ranked ascending
    by cent-integer spend, unique (spend, custkey) tie-break) — the
    "top 10% of customers carry X% of revenue" readout.  cum_share at
    decile 10 is 10⁶ by construction; the gap between the diagonal
    and cum_share IS the Lorenz area M192 integrates.

    Deciles come from plans/global_order.py (two-pass range-
    partitioned rank + exact integer ntile; the oracle keeps the
    single-window ntile — bit-equality is the parity claim, the M177
    pattern).  After the 10-row rollup, the total/cumulative windows
    use the non-foldable constant partition key (the global_order.py
    bounded-axis idiom) so no partition-less WindowExec appears.

    Scale: one user rollup + one range shuffle; everything after the
    decile assignment is 10 rows."""
    o = load(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_cents")
    )
    r = global_row_number(
        s, ["spend_cents", "o_custkey"], out="pos", total_col="tot"
    )
    dec = r.withColumn("decile", ntile_expr(F.col("pos"), F.col("tot"), 10))
    d = dec.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("spend_cents").cast("bigint").alias("spend_cents"),
    )
    k = F.pmod(F.col("decile"), F.lit(1))
    wt = Window.partitionBy(k)
    wc = Window.partitionBy(k).orderBy("decile")
    t = d.select(
        "decile", "n_customers", "spend_cents",
        F.sum("spend_cents").over(wt).cast("bigint").alias("total"),
        F.sum("spend_cents").over(wc).cast("bigint").alias("cum"),
    )
    return t.select(
        "decile", "n_customers", "spend_cents",
        F.expr("(1000000 * spend_cents) div total").cast("bigint")
        .alias("share_ppm"),
        F.expr("(1000000 * cum) div total").cast("bigint")
        .alias("cum_share_ppm"),
    )


# ---------------------------------------------------------------------------
# M229 analytics_survival_curve — cohort retention survival table
# ---------------------------------------------------------------------------


@register(
    "analytics_survival_curve",
    oracle="""
    WITH span AS (
      SELECT o_custkey,
             CAST(min(datediff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE))) // 7 AS BIGINT)
               AS first_w,
             CAST(max(datediff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE))) // 7 AS BIGINT)
               AS last_w
      FROM orders GROUP BY o_custkey
    ),
    h AS (
      SELECT first_w AS cohort_week, last_w - first_w AS offset_w,
             CAST(count(*) AS BIGINT) AS n
      FROM span GROUP BY 1, 2
    )
    SELECT cohort_week, CAST(offset_w AS BIGINT) AS k,
           CAST(sum(n) OVER (PARTITION BY cohort_week ORDER BY offset_w
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS n_surviving
    FROM h
    """,
)
def analytics_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M229 — the cohort SURVIVAL table: for each first-order
    week cohort and observed lifetime offset k (weeks), how many
    customers' activity span lasted AT LEAST k weeks (last order ≥
    first + k) — M52 retention's cumulative complement, the curve a
    churn analysis plots.  Survival at k is the reverse cumulative of
    the lifetime histogram, so the corpus collapses to per-customer
    (first, last) in one aggregate and the curve is a window over the
    bounded (cohort, offset) grid — emitted at OBSERVED offsets (the
    M155 gap rule: no dense spine).

    Scale: one shuffle to (customer) for the span, one rollup to the
    (cohort, offset) grid, one partitioned window over ≤ observed-
    offset rows per cohort.  All integers (epoch-day div 7 week
    buckets — the M193 date idiom; o_orderdate is TIMESTAMP_NTZ, so
    unix_micros would not even resolve)."""
    o = load(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    span = o.select("o_custkey", day.alias("d")).groupBy("o_custkey").agg(
        F.expr("min(d) div 7").cast("bigint").alias("first_w"),
        F.expr("max(d) div 7").cast("bigint").alias("last_w"),
    )
    h = span.groupBy(
        F.col("first_w").alias("cohort_week"),
        (F.col("last_w") - F.col("first_w")).alias("offset_w"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("offset_w")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return h.select(
        "cohort_week",
        F.col("offset_w").cast("bigint").alias("k"),
        F.sum("n").over(w).cast("bigint").alias("n_surviving"),
    )


# ---------------------------------------------------------------------------
# M233 analytics_winback_counts — reactivation after dormancy
# ---------------------------------------------------------------------------

_WINBACK_GAP_DAYS = 3  # a return after >= 2 full dormant days
# (fixture activity is dense: max observed gap is 3/4/6 days at
# sf0.001/0.01/0.1 — a 7-day threshold would be trivially empty at
# every scale, which is no evidence at all)


@register(
    "analytics_winback_counts",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    g AS (
      SELECT user_id, day,
             day - lag(day) OVER (PARTITION BY user_id ORDER BY day) AS gap
      FROM d
    ),
    u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN gap >= {_WINBACK_GAP_DAYS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_winbacks,
             CAST(max(gap) AS BIGINT) AS max_gap_days,
             CAST(count(*) AS BIGINT) AS n_active_days
      FROM g GROUP BY user_id
    )
    SELECT user_id, n_winbacks, max_gap_days, n_active_days
    FROM u WHERE n_winbacks > 0
    ORDER BY n_winbacks DESC, user_id LIMIT 20
    """,
)
def analytics_winback_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M233 — WINBACK detection: per user, how many times they
    returned after ≥ 2 full dormant days (active-day gap ≥ 3), with
    their longest dormancy and active-day count — the re-engagement
    complement of M170's streaks (streaks measure persistence,
    winbacks measure recovery; both read the same per-user day lag).
    Top-20 returners by (n_winbacks DESC, user_id).

    Scale: the events scan collapses to distinct (user, day)
    immediately; one user-partitioned lag + rollup — a single
    shuffle; TakeOrdered finale."""
    e = load(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn("gap", F.col("day") - F.lag("day").over(w))
    u = g.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("gap") >= _WINBACK_GAP_DAYS, 1).otherwise(0)
        ).cast("bigint").alias("n_winbacks"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_active_days"),
    )
    return (
        u.filter(F.col("n_winbacks") > 0)
        .orderBy(F.desc("n_winbacks"), F.asc("user_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# M239 analytics_window_funnel — conversion window bound on the funnel
# ---------------------------------------------------------------------------

_WF_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h conversion window, exact µs


def _window_funnel_oracle() -> str:
    a, b, c = _FUNNEL_STEPS
    return f"""
    WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = '{a}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
           JOIN s1 ON s1.user_id = e.user_id
            AND epoch_us(e.ts) > s1.t1
            AND epoch_us(e.ts) <= s1.t1 + {_WF_WINDOW_US}
           WHERE e.event_type = '{b}' GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
           JOIN s2 ON s2.user_id = e.user_id AND epoch_us(e.ts) > s2.t2
           JOIN s1 ON s1.user_id = e.user_id
            AND epoch_us(e.ts) <= s1.t1 + {_WF_WINDOW_US}
           WHERE e.event_type = '{c}' GROUP BY e.user_id)
    SELECT CAST(1 AS BIGINT) AS step, '{a}' AS event_type,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, '{b}', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, '{c}', CAST((SELECT count(*) FROM s3) AS BIGINT)
    """


@register("analytics_window_funnel", oracle=_window_funnel_oracle())
def analytics_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M239 — the WINDOWED funnel (ClickHouse's windowFunnel
    semantics): M51's ordered first-touch chain with a CONVERSION
    WINDOW — every later step must land within 24 h of the user's
    first step-1 event, the form campaign attribution actually uses
    (an unbounded funnel credits conversions months later).  Same
    first-touch/strictly-after rules as M51, same three-row output
    shape, so the two funnels diff directly into "conversions lost to
    the window" (the window genuinely bites on the fixture:
    150/65/15 vs M51's 150/150/150 at sf0.01).

    Scale: identical plan family to M51 — per-step per-user
    conditional mins joined on the user key; the window bound rides
    the existing join predicates, adding no shuffle.  All arithmetic
    on exact µs integers."""
    a, b, c = _FUNNEL_STEPS
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    s1 = (
        ev.filter(F.col("event_type") == a)
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == b)
        .join(s1, "user_id")
        .filter(
            (F.col("us") > F.col("t1"))
            & (F.col("us") <= F.col("t1") + _WF_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == c)
        .join(s2, "user_id")
        .filter(
            (F.col("us") > F.col("t2"))
            & (F.col("us") <= F.col("t1") + _WF_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def row(step: int, et: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(step).cast("bigint").alias("step"),
            F.lit(et).alias("event_type"),
            "n_users",
        )

    return row(1, a, s1).unionByName(row(2, b, s2)).unionByName(row(3, c, s3))


# ---------------------------------------------------------------------------
# M242 analytics_value_band_migration — spend-band transition matrix
# ---------------------------------------------------------------------------

_BAND_SPLIT_DATE = "1998-01-01"  # era boundary (order span is 1995..2001)


@register(
    "analytics_value_band_migration",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '{_BAND_SPLIT_DATE}'
                  THEN 0 ELSE 1 END AS era,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ),
    banded AS (
      SELECT o_custkey, era,
             CASE WHEN cents >= 100000000 THEN 'high'
                  WHEN cents >= 30000000 THEN 'mid'
                  ELSE 'low' END AS band
      FROM spend
    ),
    m AS (
      SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
             coalesce(a.band, 'none') AS band_h1,
             coalesce(b.band, 'none') AS band_h2
      FROM (SELECT * FROM banded WHERE era = 0) a
      FULL OUTER JOIN (SELECT * FROM banded WHERE era = 1) b
        ON a.o_custkey = b.o_custkey
    )
    SELECT band_h1, band_h2, CAST(count(*) AS BIGINT) AS n_customers
    FROM m GROUP BY 1, 2
    """,
)
def analytics_value_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M242 — customer SPEND-BAND MIGRATION between the two
    halves of the order history (split at 1998-01-01): each customer's
    total spend per era is banded low/mid/high on exact cents
    thresholds, and the (band_h1, band_h2) transition matrix counts
    who moved where — 'none' rows are the acquisition/churn margins
    (the full outer join IS the churn detector).  The economics twin
    of M96's event-type Markov matrix and the temporal complement of
    M157's static RFM segments.

    Determinism: cents-integer sums (the exact.py money rule), string
    bands from integer thresholds, full outer join on the customer
    key.  Scale: one shuffle to (customer, era) — two rows per
    customer — then a ≤16-cell rollup with map-side combine; at
    100 TB the banding thresholds would come from the M210 decile
    table instead of constants."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit(_BAND_SPLIT_DATE).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("era"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    band = (
        F.when(F.col("cents") >= 100000000, "high")
        .when(F.col("cents") >= 30000000, "mid")
        .otherwise("low")
    )
    banded = spend.select("o_custkey", "era", band.alias("band"))
    a = banded.filter(F.col("era") == 0).select(
        F.col("o_custkey").alias("c_a"), F.col("band").alias("band_h1")
    )
    b = banded.filter(F.col("era") == 1).select(
        F.col("o_custkey").alias("c_b"), F.col("band").alias("band_h2")
    )
    m = a.join(b, a.c_a == b.c_b, "full_outer").select(
        F.coalesce(F.col("band_h1"), F.lit("none")).alias("band_h1"),
        F.coalesce(F.col("band_h2"), F.lit("none")).alias("band_h2"),
    )
    return m.groupBy("band_h1", "band_h2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# M250 analytics_chisq_priority_era — chi-square independence terms
# ---------------------------------------------------------------------------

_CHISQ_SPLIT_DATE = "1998-01-01"  # reuse the M242 era boundary


@register(
    "analytics_chisq_priority_era",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority AS priority,
             CASE WHEN o_orderdate < TIMESTAMP '{_CHISQ_SPLIT_DATE}'
                  THEN 0 ELSE 1 END AS era,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT priority, CAST(sum(n) AS BIGINT) AS row_total
           FROM c GROUP BY 1),
    ct AS (SELECT era, CAST(sum(n) AS BIGINT) AS col_total FROM c GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
    SELECT c.priority, CAST(c.era AS BIGINT) AS era, c.n, row_total, col_total,
           CAST(c.n * n_total - row_total * col_total AS BIGINT) AS dev_num,
           CAST((1000000
                 * CAST(c.n * n_total - row_total * col_total AS HUGEINT)
                 * CAST(c.n * n_total - row_total * col_total AS HUGEINT))
                // (CAST(row_total AS HUGEINT) * col_total * n_total)
                AS BIGINT) AS chi_ppm
    FROM c JOIN rt ON c.priority = rt.priority
           JOIN ct ON c.era = ct.era
           CROSS JOIN tot
    """,
)
def analytics_chisq_priority_era(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M250 — CHI-SQUARE INDEPENDENCE terms for the (order
    priority × era) contingency table: per cell the observed count,
    margins, the exact deviation numerator O·N − RT·CT, and the
    scaled cell contribution 10⁶·dev²/(RT·CT·N) — the independence
    test every mix-shift dashboard runs ("did the priority mix change
    between the eras"), with every carrier an exact integer.  dev² is
    computed in HUGEINT / DECIMAL(38,0) (the M192 wide-integer finale
    rule: at 100 TB O·N ~ 1e9·1e12 squares far past BIGINT); the
    quotient is non-negative over a non-negative denominator, so
    floor and trunc agree.

    Scale: the corpus collapses to the ≤ |priorities|×2 cell table in
    one map-side-combinable pass; margins and the total are rollups
    of the CELL table (never re-scans); everything after is
    broadcast-sized arithmetic."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.when(
            F.col("o_orderdate") < F.lit(_CHISQ_SPLIT_DATE).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("era"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    c = iter_materialize(c)  # referenced by rt, ct, tot and the finale
    rt = c.groupBy("priority").agg(F.sum("n").cast("bigint").alias("row_total"))
    ct = c.groupBy("era").agg(F.sum("n").cast("bigint").alias("col_total"))
    tot = c.agg(F.sum("n").cast("bigint").alias("n_total"))
    dev = "(n * n_total - row_total * col_total)"
    return (
        c.join(F.broadcast(rt), "priority")
        .join(F.broadcast(ct), "era")
        .crossJoin(F.broadcast(tot))
        .select(
            "priority",
            F.col("era").cast("bigint").alias("era"),
            "n",
            "row_total",
            "col_total",
            F.expr(dev).cast("bigint").alias("dev_num"),
            F.expr(
                f"(CAST(1000000 AS DECIMAL(38,0))"
                f" * CAST({dev} AS DECIMAL(38,0))"
                f" * CAST({dev} AS DECIMAL(38,0)))"
                f" div (CAST(row_total AS DECIMAL(38,0)) * col_total * n_total)"
            )
            .cast("bigint")
            .alias("chi_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# M254 analytics_ols_terms — exact OLS slope terms (price elasticity shape)
# ---------------------------------------------------------------------------


@register(
    "analytics_ols_terms",
    oracle="""
    WITH xy AS (
      SELECT p.p_brand AS brand,
             CAST(l.l_quantity AS BIGINT) AS x,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    m AS (
      SELECT brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM xy GROUP BY brand
    )
    SELECT brand, n, sx, sy, sxy, sxx,
           CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                AS BIGINT) AS slope_num,
           CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                AS BIGINT) AS slope_den
    FROM m
    """,
)
def analytics_ols_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M254 — exact OLS REGRESSION-SLOPE terms per brand for
    (quantity, line price): n, Σx, Σy, Σxy, Σx² plus the slope's
    numerator n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² — the
    price-elasticity regression every pricing dashboard fits, emitted
    as the exact integer co-moment terms (the M144/M234 "terms"
    discipline: the float division happens client-side; the hash gate
    carries only integers).  The num/den products are computed in
    DECIMAL(38,0)/HUGEINT (M192 wide-integer rule — at 100 TB
    n·Σxy ~ 1e9·1e15 is far past BIGINT) with the final cast to BIGINT
    safe at every fixture scale (≤ ~3e17 at sf0.1).

    Scale: one lineitem pass with a broadcast part join collapses to
    O(brands) rows; everything after is per-row arithmetic.  No
    window, no second scan — slope sign analysis avoids the
    negative-numerator integer-division trap entirely by never
    dividing."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    p = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    m = (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
    )
    return m.select(
        "brand", "n", "sx", "sy", "sxy", "sxx",
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
        )
        .cast("bigint")
        .alias("slope_num"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
        )
        .cast("bigint")
        .alias("slope_den"),
    )


# ---------------------------------------------------------------------------
# M276 analytics_poisson_bootstrap — deterministic single-pass bootstrap
# ---------------------------------------------------------------------------

_BOOT_B = 8  # resamples

#: Dyadic Poisson(1) weight table over h % 8: P(0)=P(1)=3/8,
#: P(2)=P(3)=1/8 — EXACT unit mean (0·3+1·3+2+3 = 8), the truncated
#: dyadic approximation of Poisson(1) (true p₀=p₁≈.368, p₂≈.184,
#: p₃≈.061).  A dyadic table keeps the weight a pure integer CASE on
#: the hash residue — no float thresholds anywhere.
_BOOT_W_SQL = (
    "CASE WHEN {h} % 8 <= 2 THEN 0 WHEN {h} % 8 <= 5 THEN 1"
    " WHEN {h} % 8 = 6 THEN 2 ELSE 3 END"
)

_BOOT_ORACLE = f"""
    WITH o AS (SELECT o_orderkey,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    r AS (
      SELECT b.b, o.o_orderkey, o.cents,
             ('0x' || substring(md5(CAST(b.b AS STRING) || '-'
                                    || CAST(o.o_orderkey AS STRING)), 1, 8))
               ::BIGINT AS h
      FROM o CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b)
                          b),
    w AS (SELECT b, cents, {_BOOT_W_SQL.format(h="h")} AS m FROM r),
    agg AS (SELECT CAST(b AS BIGINT) AS resample,
                   CAST(sum(m) AS BIGINT) AS n_eff,
                   CAST(sum(m * cents) AS BIGINT) AS sum_cents
            FROM w GROUP BY b),
    full_s AS (SELECT CAST(count(*) AS BIGINT) AS n_full,
                      CAST(sum(cents) AS BIGINT) AS cents_full
               FROM o)
    SELECT resample, n_eff, sum_cents,
           CAST((1000 * sum_cents) // n_eff AS BIGINT) AS milli_mean,
           CAST((1000 * cents_full) // n_full AS BIGINT) AS milli_mean_full
    FROM agg CROSS JOIN full_s
"""


@register("analytics_poisson_bootstrap", oracle=_BOOT_ORACLE)
def analytics_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M276 — deterministic single-pass Poisson bootstrap of the mean
    order value: the bootstrap that actually runs at 100 TB (Chamandy
    et al.'s Poisson bootstrap: every row draws an independent
    ~Poisson(1) multiplicity per resample, so ONE scan serves all B
    resamples and each partition emits B partial sums; no resample
    materialization, no sampling pass per replicate).  Randomness is
    the md5-low-32 of (resample, orderkey) — deterministic,
    partition-invariant, reproducible cross-engine — mapped through an
    exact-unit-mean dyadic weight table (P(0)=P(1)=3/8, P(2)=P(3)=1/8
    on the hash residue; no float thresholds).  Emits per resample the
    effective count, the weighted cents sum, and the milli-cent mean,
    with the full-sample milli-mean attached for the spread-vs-truth
    read — the min/max across the 8 resamples IS the CI estimate a
    downstream consumer derives.

    All-integer: cents carriers, non-negative integer division both
    sides (1000·sum_cents ≤ 3·10³·n·maxcents — BIGINT-safe to ~10⁸
    orders on this price range; the wide-integer rule applies past
    that).  The 1-row full-sample attach is a deliberate scalar
    crossJoin (BNLJ-allowlisted)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    r = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             F.lit(_BOOT_B - 1).cast("bigint"))).alias("b"),
    ).select(
        "b",
        "cents",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit("-"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    w = r.select("b", "cents", F.expr(_BOOT_W_SQL.format(h="h")).alias("m"))
    agg = w.groupBy("b").agg(
        F.sum("m").cast("bigint").alias("n_eff"),
        F.sum(F.col("m") * F.col("cents")).cast("bigint").alias("sum_cents"),
    )
    full_s = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full"),
        F.sum("cents").cast("bigint").alias("cents_full"),
    )
    return agg.crossJoin(F.broadcast(full_s)).select(
        F.col("b").cast("bigint").alias("resample"),
        "n_eff",
        "sum_cents",
        F.expr("CAST((1000 * sum_cents) div n_eff AS BIGINT)").alias(
            "milli_mean"
        ),
        F.expr("CAST((1000 * cents_full) div n_full AS BIGINT)").alias(
            "milli_mean_full"
        ),
    )


# ---------------------------------------------------------------------------
# M279 analytics_cuped_terms — CUPED variance-reduction co-moment terms
# ---------------------------------------------------------------------------

_CUPED_ORACLE = """
    WITH e AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    b AS (SELECT (min(d) + max(d)) // 2 AS bd FROM e),
    u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN d <= bd THEN cents ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN d > bd THEN cents ELSE 0 END) AS BIGINT) AS y
      FROM e CROSS JOIN b GROUP BY user_id
    ),
    v AS (
      SELECT user_id, x, y,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant
      FROM u
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_x2,
           CAST(sum(y * y) AS BIGINT) AS sum_y2
    FROM v GROUP BY variant
"""


@register("analytics_cuped_terms", oracle=_CUPED_ORACLE)
def analytics_cuped_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M279 — CUPED variance-reduction TERMS for the hash-split
    experiment (Deng et al. 2013 — the standard pre-period covariate
    adjustment every experimentation platform runs): per user, x =
    pre-period spend cents and y = experiment-period spend cents (the
    boundary is the DATA-DERIVED midpoint (min_day + max_day) div 2 on
    the epoch-day axis — regeneration-robust, non-negative division,
    never a wall-clock literal); per variant the exact integer
    co-moments (n, Σx, Σy, Σxy, Σx², Σy²) from which a consumer
    computes θ = cov(x,y)/var(x) and the CUPED-adjusted lift.  The
    *_terms discipline: the final ratios are floats, so the engine
    emits their exact integer inputs (ts_corr_terms' rule applied to
    the experimentation pipeline).  Variant assignment reuses
    analytics_ab_lift's md5 first-hex split verbatim.

    Scale: one events pass + a 1-row boundary attach (deliberate
    scalar crossJoin, BNLJ-allowlisted) + a user-level agg + a 2-group
    rollup — every aggregate map-side combinable."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    b = e.agg(F.expr("(min(d) + max(d)) div 2").alias("bd"))
    u = (
        e.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("bd"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("d") > F.col("bd"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    v = u.withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        ).otherwise("B"),
    )
    return v.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_y2"),
    )


# ---------------------------------------------------------------------------
# M280 analytics_mannwhitney_terms — Mann-Whitney U via doubled midranks
# ---------------------------------------------------------------------------

_MW_ORACLE = """
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT s,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS is_a
      FROM u
    ),
    c AS (SELECT s,
                 CAST(sum(is_a) AS BIGINT) AS ca,
                 CAST(sum(1 - is_a) AS BIGINT) AS cb,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM v GROUP BY s),
    w AS (SELECT s, ca, cb, cnt,
                 CAST(sum(cnt) OVER (ORDER BY s) AS BIGINT) AS cum
          FROM c),
    m AS (SELECT ca, cb, (cum - cnt + 1) + cum AS twomr FROM w),
    agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                   CAST(sum(cb) AS BIGINT) AS n_b,
                   CAST(sum(ca * twomr) AS BIGINT) AS r2_a,
                   CAST(sum(cb * twomr) AS BIGINT) AS r2_b
            FROM m)
    SELECT 'A' AS variant, n_a AS n_users, r2_a AS rank2_sum,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2
    FROM agg
    UNION ALL
    SELECT 'B', n_b, r2_b, CAST(r2_b - n_b * (n_b + 1) AS BIGINT)
    FROM agg
"""


@register("analytics_mannwhitney_terms", oracle=_MW_ORACLE)
def analytics_mannwhitney_terms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """M280 — Mann-Whitney U terms for the hash-split experiment over
    per-user spend: the NONPARAMETRIC lift test (rank-based, no
    normality assumption; the robust companion to analytics_ab_lift's
    rates, analytics_cuped_terms' co-moments, and the Poisson
    bootstrap's resampling).  Everything is integer-exact: ties take
    the midrank, and 2·midrank = lo + hi (first + last rank of the tie
    group) is always integral, so the engine carries DOUBLED rank sums
    and the doubled statistic u2 = Σ2mr − n(n+1) ≡ 2U — the consumer
    checks u2_A + u2_B = 2·n_A·n_B (the twin pins this identity) and
    normalizes by 2·n_A·n_B for the rank-biserial effect size.

    The cumulative rank window runs over the DISTINCT spend values —
    the bounded-cardinality single-axis window family (the merged-KS
    support rule), kept off the partition-less-WindowExec path via the
    non-foldable constant partition key.  All other stages are
    map-side-combinable aggs."""
    u = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").cast("bigint").alias("s"))
    )
    v = u.select(
        "s",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", 1
        )
        .otherwise(0)
        .alias("is_a"),
    )
    c = v.groupBy("s").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("cb"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    const_part = F.pmod(F.col("s"), F.lit(1))  # non-foldable constant
    w_cum = Window.partitionBy(const_part).orderBy("s")
    w = c.select(
        "ca",
        "cb",
        "cnt",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
    )
    m = w.select(
        "ca", "cb", ((F.col("cum") - F.col("cnt") + 1) + F.col("cum")).alias("twomr")
    )
    agg = m.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.col("ca") * F.col("twomr")).cast("bigint").alias("r2_a"),
        F.sum(F.col("cb") * F.col("twomr")).cast("bigint").alias("r2_b"),
    )
    return agg.select(
        F.expr(
            "stack(2, 'A', n_a, r2_a, CAST(r2_a - n_a * (n_a + 1) AS BIGINT),"
            " 'B', n_b, r2_b, CAST(r2_b - n_b * (n_b + 1) AS BIGINT))"
            " AS (variant, n_users, rank2_sum, u2)"
        )
    )


# ---------------------------------------------------------------------------
# analytics_did_terms — difference-in-differences cell terms (M289)
# ---------------------------------------------------------------------------

_DID_BIG = 1_000_000_000  # shift constant for the signed integral division

_DID_ORACLE = f"""
    WITH o AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS t
      FROM orders
    ),
    b AS (SELECT (min(d) + max(d)) // 2 AS bd FROM o),
    c AS (
      SELECT t, CASE WHEN d > bd THEN 1 ELSE 0 END AS p,
             cents
      FROM o CROSS JOIN b
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN t = 0 AND p = 0 THEN cents ELSE 0 END) AS BIGINT) AS s00,
             CAST(sum(CASE WHEN t = 0 AND p = 1 THEN cents ELSE 0 END) AS BIGINT) AS s01,
             CAST(sum(CASE WHEN t = 1 AND p = 0 THEN cents ELSE 0 END) AS BIGINT) AS s10,
             CAST(sum(CASE WHEN t = 1 AND p = 1 THEN cents ELSE 0 END) AS BIGINT) AS s11
      FROM c
    )
    SELECT n00, n01, n10, n11, s00, s01, s10, s11,
           CAST((((CAST(s11 AS HUGEINT) * n10 - CAST(s10 AS HUGEINT) * n11)
                    * n01 * n00
                  - (CAST(s01 AS HUGEINT) * n00 - CAST(s00 AS HUGEINT) * n01)
                    * n11 * n10)
                 + CAST({_DID_BIG} AS HUGEINT)
                   * (CAST(n11 AS HUGEINT) * n10 * n01 * n00))
                // (CAST(n11 AS HUGEINT) * n10 * n01 * n00)
                - {_DID_BIG} AS BIGINT) AS did_cents
    FROM cells
"""


@register("analytics_did_terms", oracle=_DID_ORACLE)
def analytics_did_terms(
    spark: SparkSession, sf_dir: str, orders: DataFrame | None = None
) -> DataFrame:
    """M289 — DIFFERENCE-IN-DIFFERENCES terms on the order
    history: treatment = the deterministic md5-first-hex customer
    split (analytics_ab_lift's rule), period = the data-derived
    epoch-day midpoint (the CUPED boundary rule — regeneration-robust,
    never a wall-clock literal); the 2×2 (treatment, post) cells emit
    exact counts and cents sums, plus the assembled DiD effect
    (mean11 − mean10) − (mean01 − mean00) in CENTS as one exact
    integral division — numerator and denominator are HUGEINT/
    DECIMAL(38,0) products (M192 rule), and the possibly-NEGATIVE
    numerator goes through the +BIG·den shift identity
    ((num + BIG·den) div den − BIG, the ts_theilsen rule) so DuckDB's
    floor and Spark's truncation agree.  The causal-estimator
    complement of analytics_cuped_terms (CUPED adjusts variance;
    DiD removes the time trend).

    Scale: one orders pass + a 1-row boundary attach (deliberate
    scalar crossJoin, BNLJ-allowlisted) + one 1-row
    conditional rollup — everything map-side combinable.

    ``orders=`` substitutes the order frame (the shift-constant audit
    injects adversarial negative-numerator corpora through it; the
    driver contract never passes it)."""
    o0 = orders if orders is not None else load(spark, sf_dir, "orders")
    o = o0.select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) < "8", 1
        )
        .otherwise(0)
        .alias("t"),
    )
    b = o.agg(F.expr("(min(d) + max(d)) div 2").alias("bd"))
    c = o.crossJoin(F.broadcast(b)).select(
        "t", F.when(F.col("d") > F.col("bd"), 1).otherwise(0).alias("p"), "cents"
    )

    def cell(tv: int, pv: int, expr, name: str):
        return (
            F.sum(F.when((F.col("t") == tv) & (F.col("p") == pv), expr).otherwise(0))
            .cast("bigint")
            .alias(name)
        )

    cells = c.agg(
        cell(0, 0, F.lit(1), "n00"),
        cell(0, 1, F.lit(1), "n01"),
        cell(1, 0, F.lit(1), "n10"),
        cell(1, 1, F.lit(1), "n11"),
        cell(0, 0, F.col("cents"), "s00"),
        cell(0, 1, F.col("cents"), "s01"),
        cell(1, 0, F.col("cents"), "s10"),
        cell(1, 1, F.col("cents"), "s11"),
    )
    num = (
        "((CAST(s11 AS DECIMAL(38,0)) * n10 - CAST(s10 AS DECIMAL(38,0)) * n11)"
        " * n01 * n00"
        " - (CAST(s01 AS DECIMAL(38,0)) * n00 - CAST(s00 AS DECIMAL(38,0)) * n01)"
        " * n11 * n10)"
    )
    den = "(CAST(n11 AS DECIMAL(38,0)) * n10 * n01 * n00)"
    return cells.select(
        "n00", "n01", "n10", "n11", "s00", "s01", "s10", "s11",
        F.expr(
            f"CAST(({num} + CAST({_DID_BIG} AS DECIMAL(38,0)) * {den})"
            f" div {den} - {_DID_BIG} AS BIGINT)"
        ).alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# analytics_srm_audit — per-cohort sample-ratio-mismatch guardrail
# ---------------------------------------------------------------------------

_SRM_ORACLE = """
    WITH e AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      FROM events
    ),
    u AS (SELECT user_id, CAST(min(d) AS BIGINT) AS d0
          FROM e GROUP BY user_id),
    v AS (
      SELECT d0,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS is_a
      FROM u
    )
    SELECT d0 AS cohort_day,
           CAST(sum(is_a) AS BIGINT) AS n_a,
           CAST(sum(1 - is_a) AS BIGINT) AS n_b,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(is_a) - sum(1 - is_a) AS BIGINT) AS dev,
           CAST((1000 * (sum(is_a) - sum(1 - is_a))
                      * (sum(is_a) - sum(1 - is_a))) // count(*)
                AS BIGINT) AS chisq_milli
    FROM v GROUP BY d0
"""


@register("analytics_srm_audit", oracle=_SRM_ORACLE)
def analytics_srm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M301 — Sample-ratio-mismatch guardrail for the md5 hash split, per
    signup cohort (first-event day): n_A, n_B, the signed deviation
    d = n_A − n_B, and the exact milli-χ² against the expected 50/50
    — χ² = (n_A − n/2)²/(n/2) + (n_B − n/2)²/(n/2) = d²/n, carried as
    (1000·d²) div n (d² non-negative → div//floor agree).  SRM is the
    FIRST check every experimentation platform runs before reading a
    lift number (a mismatched split invalidates the experiment); the
    per-cohort-day breakdown is the production monitoring shape —
    one corrupted assignment day shows as one bad row, not a diluted
    global statistic.  Companion to analytics_ab_lift (rates), CUPED
    (variance reduction) and Mann-Whitney (nonparametric): this one
    validates the DENOMINATORS those tests trust.

    Scale: two map-side-combinable aggs (per-user min-day, per-cohort
    counts) — no joins, no windows, corpus collapses to O(days)."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    )
    u = e.groupBy("user_id").agg(F.min("d").cast("bigint").alias("d0"))
    v = u.select(
        "d0",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", 1
        )
        .otherwise(0)
        .alias("is_a"),
    )
    return v.groupBy(F.col("d0").alias("cohort_day")).agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.sum("is_a") - F.sum(F.lit(1) - F.col("is_a")))
        .cast("bigint")
        .alias("dev"),
        F.expr(
            "CAST((1000 * (sum(is_a) - sum(1 - is_a))"
            " * (sum(is_a) - sum(1 - is_a))) div count(*) AS BIGINT)"
        ).alias("chisq_milli"),
    )


# ---------------------------------------------------------------------------
# analytics_sequential_counts — cumulative per-day conversion (peeking audit)
# ---------------------------------------------------------------------------

_SEQ_ORACLE = """
    WITH e AS (
      SELECT user_id, event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      FROM events
    ),
    u AS (SELECT user_id, CAST(min(d) AS BIGINT) AS d0,
                 CAST(min(CASE WHEN event_type = 'purchase' THEN d END)
                      AS BIGINT) AS fp
          FROM e GROUP BY user_id),
    v AS (SELECT *,
                 CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                      THEN 'A' ELSE 'B' END AS variant
          FROM u),
    days AS (SELECT DISTINCT CAST(d AS BIGINT) AS day FROM e),
    spine AS (SELECT day, variant
              FROM days, unnest(['A', 'B']) AS t(variant)),
    nu AS (SELECT variant, d0 AS day, CAST(count(*) AS BIGINT) AS new_users
           FROM v GROUP BY variant, d0),
    nc AS (SELECT variant, fp AS day, CAST(count(*) AS BIGINT) AS new_conv
           FROM v WHERE fp IS NOT NULL GROUP BY variant, fp),
    j AS (SELECT s.day, s.variant,
                 coalesce(nu.new_users, 0) AS new_users,
                 coalesce(nc.new_conv, 0) AS new_conv
          FROM spine s
          LEFT JOIN nu ON s.day = nu.day AND s.variant = nu.variant
          LEFT JOIN nc ON s.day = nc.day AND s.variant = nc.variant),
    c AS (SELECT day, variant,
                 CAST(sum(new_users) OVER (PARTITION BY variant
                                           ORDER BY day) AS BIGINT)
                   AS cum_users,
                 CAST(sum(new_conv) OVER (PARTITION BY variant
                                          ORDER BY day) AS BIGINT)
                   AS cum_converted
          FROM j)
    SELECT day, variant, cum_users, cum_converted,
           CAST(CASE WHEN cum_users = 0 THEN 0
                     ELSE (1000000 * cum_converted) // cum_users END
                AS BIGINT) AS conv_ppm
    FROM c
"""


@register("analytics_sequential_counts", oracle=_SEQ_ORACLE)
def analytics_sequential_counts(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """M307 — The sequential-testing (peeking) audit trail for the hash-split
    experiment: per (day, variant) the CUMULATIVE user count (first
    event ≤ day) and cumulative converters (first 'purchase' ≤ day),
    with the running conversion rate in ppm — exactly the
    day-by-day table an always-valid-inference / mSPRT monitor
    consumes, and what an honest experiment readout shows instead of
    the single end-date number (peeking at interim rates without
    sequential correction is the classic false-positive factory; the
    audit trail is how you detect it happened).  Completes the
    experimentation family: SRM validates denominators, ab_lift /
    CUPED / Mann-Whitney read the end state, this one exposes the
    whole path.

    Integer-exact: epoch-day axis, first-event/first-purchase days
    from one user rollup, zero-filled via the (days × 2 variants)
    spine (explode of a 2-literal array, never a join), cumulative
    windows on the REAL variant partition key, ppm division guarded
    at cum_users = 0 (a variant with no users yet).  Scale: the
    corpus collapses to O(users) then O(days × 2).

    ``events=`` substitutes the events frame (the zero-users-guard pin
    injects a late-arriving variant through it; the driver contract
    never passes it)."""
    e = (events if events is not None else load(spark, sf_dir, "events")).select(
        "user_id",
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    )
    u = e.groupBy("user_id").agg(
        F.min("d").cast("bigint").alias("d0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("d")))
        .cast("bigint")
        .alias("fp"),
    )
    v = u.withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        ).otherwise("B"),
    )
    days = e.select(F.col("d").cast("bigint").alias("day")).distinct()
    spine = days.select(
        "day", F.explode(F.array(F.lit("A"), F.lit("B"))).alias("variant")
    )
    nu = v.groupBy("variant", F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    nc = (
        v.filter(F.col("fp").isNotNull())
        .groupBy("variant", F.col("fp").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_conv"))
    )
    j = (
        spine.join(nu, ["day", "variant"], "left")
        .join(nc, ["day", "variant"], "left")
        .select(
            "day",
            "variant",
            F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
            F.coalesce(F.col("new_conv"), F.lit(0)).alias("new_conv"),
        )
    )
    w_cum = Window.partitionBy("variant").orderBy("day")
    c = j.select(
        "day",
        "variant",
        F.sum("new_users").over(w_cum).cast("bigint").alias("cum_users"),
        F.sum("new_conv").over(w_cum).cast("bigint").alias("cum_converted"),
    )
    return c.select(
        "day",
        "variant",
        "cum_users",
        "cum_converted",
        F.expr(
            "CAST(CASE WHEN cum_users = 0 THEN 0"
            " ELSE (1000000 * cum_converted) div cum_users END AS BIGINT)"
        ).alias("conv_ppm"),
    )


# ---------------------------------------------------------------------------
# analytics_beta_posterior_terms — Bayesian conversion terms, Beta(1,1) prior
# ---------------------------------------------------------------------------

_BETA_ORACLE = """
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT converted,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant
      FROM u
    ),
    t AS (
      SELECT variant,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_conv
      FROM v GROUP BY variant
    )
    SELECT variant, n_users, n_conv,
           CAST(n_conv + 1 AS BIGINT) AS a,
           CAST(n_users - n_conv + 1 AS BIGINT) AS b,
           CAST((1000000 * n_conv) // n_users AS BIGINT) AS mle_ppm,
           CAST((1000000 * (n_conv + 1)) // (n_users + 2) AS BIGINT)
             AS post_mean_ppm,
           CAST((CAST(1000000000 AS HUGEINT)
                 * (n_conv + 1) * (n_users - n_conv + 1))
                // (CAST(n_users + 2 AS HUGEINT) * (n_users + 2)
                    * (n_users + 3)) AS BIGINT) AS post_var_ppb
    FROM t
"""


@register("analytics_beta_posterior_terms", oracle=_BETA_ORACLE)
def analytics_beta_posterior_terms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """M311 — Bayesian conversion terms for the hash-split experiment
    under the uniform Beta(1,1) prior: per variant the exact posterior
    Beta(a, b) parameters (a = conversions + 1, b = failures + 1),
    the MLE and posterior-mean rates in ppm, and the posterior
    VARIANCE in ppb — the numbers a Thompson-sampling allocator or a
    "probability B beats A" readout consumes (the Bayesian companion
    to the frequentist family: ab_lift rates, CUPED, Mann-Whitney,
    the sequential trail, SRM).

    Integer-exact: posterior mean (10⁶·a) div (a+b) and variance
    10⁹·a·b div ((a+b)²·(a+b+1)) — the variance numerator exceeds
    BIGINT past ~3·10⁵ users, so both engines compute it in wide
    integers (DECIMAL(38,0) / HUGEINT, the wide-integer finale rule)
    and the quotient (≤ 2.5·10⁸ — the Beta variance bound 1/4 in ppb)
    casts back exactly.  Scale: one events pass + two
    map-side-combinable rollups — the corpus collapses to 2 rows."""
    u = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("c"),
        )
        .groupBy("user_id")
        .agg(F.max("c").alias("converted"))
    )
    v = u.select(
        "converted",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        )
        .otherwise("B")
        .alias("variant"),
    )
    t = v.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    return t.select(
        "variant",
        "n_users",
        "n_conv",
        (F.col("n_conv") + 1).cast("bigint").alias("a"),
        (F.col("n_users") - F.col("n_conv") + 1).cast("bigint").alias("b"),
        F.expr("CAST((1000000 * n_conv) div n_users AS BIGINT)").alias(
            "mle_ppm"
        ),
        F.expr(
            "CAST((1000000 * (n_conv + 1)) div (n_users + 2) AS BIGINT)"
        ).alias("post_mean_ppm"),
        F.expr(
            "CAST((CAST(1000000000 AS DECIMAL(38,0))"
            " * (n_conv + 1) * (n_users - n_conv + 1))"
            " div (CAST(n_users + 2 AS DECIMAL(38,0)) * (n_users + 2)"
            "      * (n_users + 3)) AS BIGINT)"
        ).alias("post_var_ppb"),
    )


# ---------------------------------------------------------------------------
# analytics_benford_audit (M319) — first-significant-digit profile vs Benford
# ---------------------------------------------------------------------------

#: Benford P(d) = log10(1 + 1/d) rounded to ppm — data-independent
#: published constants (they sum to exactly 1,000,000 at this
#: rounding), embedded as literals in BOTH engines.
_BENFORD_PPM = (
    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
    (6, 66947), (7, 57992), (8, 51153), (9, 45757),
)


@register(
    "analytics_benford_audit",
    oracle=f"""
    WITH o AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
            FROM o GROUP BY digit),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM o),
    bf(digit, benford_ppm) AS (VALUES
      {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM)})
    SELECT CAST(bf.digit AS BIGINT) AS digit,
           CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(CASE WHEN n.nt = 0 THEN NULL ELSE
                (1000000 * coalesce(obs.n_obs, 0)) // n.nt END AS BIGINT)
             AS obs_ppm,
           CAST(bf.benford_ppm AS BIGINT) AS benford_ppm,
           CAST(CASE WHEN n.nt = 0 THEN NULL ELSE
                (1000000 * coalesce(obs.n_obs, 0)) // n.nt
                - bf.benford_ppm END AS BIGINT) AS dev_ppm
    FROM bf LEFT JOIN obs ON bf.digit = obs.digit
    CROSS JOIN n
    """,
)
def analytics_benford_audit(
    spark: SparkSession, sf_dir: str, orders: DataFrame | None = None
) -> DataFrame:
    """M319 — BENFORD'S-LAW first-digit audit of order totals (in
    cents, so the digit extraction is exact integer string work): per
    leading digit 1-9, the observed count, observed ppm, the published
    Benford expectation P(d) = log10(1+1/d) as fixed ppm constants
    (data-independent literals in both engines — the ln/log10
    transcendentals never enter the hash gate), and the signed
    deviation — the forensic-accounting / synthetic-data screen every
    financial pipeline runs (invented amounts are Benford-deviant;
    so are unit-price × round-quantity artifacts, which is exactly
    what this fixture exposes).

    Scale: one map-side-combinable digit rollup; the 9-row spine
    zero-fills absent digits and carries the corpus total on the
    bounded digit axis (pmod-constant-key window — no scalar attach).

    Population rule (BOTH engines): only rows with cents ≥ 1 —
    Benford's law is defined for positive magnitudes, and the filter
    keeps the two denominators structurally identical (without it the
    oracle's count(*) would include zero/negative/NULL totals the
    Spark spine join drops, and a negative total's '-' first char
    would fail the BIGINT cast).  The fixture has no such totals —
    values unchanged; the rule exists for the ``orders=`` probe
    surface.

    ``orders=`` substitutes the order frame for probes (the
    absent-digit zero-fill injection); the driver contract never
    passes it."""
    if orders is None:
        orders = load(spark, sf_dir, "orders")
    o = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
        )
        .filter(F.col("cents") >= 1)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("bigint")
            .alias("digit")
        )
    )
    obs = o.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    bf = spark.createDataFrame(list(_BENFORD_PPM), "digit long, benford_ppm long")
    w = Window.partitionBy(F.pmod(F.col("digit"), F.lit(1)))
    full = (
        bf.join(obs, "digit", "left")
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint"))
        .withColumn("nt", F.sum("n_obs").over(w).cast("bigint"))
    )
    return full.select(
        F.col("digit").cast("bigint").alias("digit"),
        "n_obs",
        F.expr("CASE WHEN nt = 0 THEN NULL ELSE (1000000 * n_obs) div nt END")
        .cast("bigint")
        .alias("obs_ppm"),
        F.col("benford_ppm").cast("bigint").alias("benford_ppm"),
        F.expr(
            "CASE WHEN nt = 0 THEN NULL"
            " ELSE (1000000 * n_obs) div nt - benford_ppm END"
        )
        .cast("bigint")
        .alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# analytics_lehr_sample_size — the experiment-design sample-size terms
# ---------------------------------------------------------------------------

_LEHR_A = "1-URGENT"
_LEHR_B = "5-LOW"
#: Shift for the signed mean gap carrier (1000·dnum + BIG·(na·nb)) div
#: (na·nb) − BIG with dnum = s1a·nb − s1b·na.  Domain bound:
#: |1000·dnum| ≤ 1000·max_cents·na·nb, and the order-price domain is
#: scale-FREE (the TPC-H price formula — max_cents ~ 5·10⁷), so
#: BIG ≥ 1000·max_cents ≈ 5·10¹⁰; held at ≥ 10× headroom.  The r13
#: lesson lives here: the first draft's 10⁹ was TOO SMALL for a
#: cents-scale mean gap and both engines truncated identically —
#: only the floor twin caught it.
_LEHR_BIG = 10**12


@register(
    "analytics_lehr_sample_size",
    oracle=f"""
    WITH x AS (
      SELECT CASE WHEN o_orderpriority = '{_LEHR_A}' THEN 1 ELSE 0 END AS ia,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
      WHERE o_orderpriority IN ('{_LEHR_A}', '{_LEHR_B}')
    ),
    s AS (
      SELECT CAST(sum(ia) AS BIGINT) AS na,
             CAST(sum(1 - ia) AS BIGINT) AS nb,
             CAST(sum(ia * c) AS BIGINT) AS s1a,
             CAST(sum((1 - ia) * c) AS BIGINT) AS s1b,
             sum(CAST(ia AS HUGEINT) * c * c) AS s2a,
             sum(CAST(1 - ia AS HUGEINT) * c * c) AS s2b
      FROM x
    ),
    d AS (
      SELECT na, nb, s1a, s1b,
             CAST(CASE WHEN na = 0 THEN NULL ELSE
                  (na * s2a - CAST(s1a AS HUGEINT) * s1a) // na END AS BIGINT)
               AS ssa,
             CAST(CASE WHEN nb = 0 THEN NULL ELSE
                  (nb * s2b - CAST(s1b AS HUGEINT) * s1b) // nb END AS BIGINT)
               AS ssb,
             CAST(s1a AS HUGEINT) * nb - CAST(s1b AS HUGEINT) * na AS dnum,
             nb * (na * s2a - CAST(s1a AS HUGEINT) * s1a)
               + na * (nb * s2b - CAST(s1b AS HUGEINT) * s1b) AS ssnum
      FROM s
    )
    SELECT na, nb,
           CAST(CASE WHEN na = 0 THEN NULL ELSE s1a // na END AS BIGINT)
             AS mean_a_cents,
           CAST(CASE WHEN nb = 0 THEN NULL ELSE s1b // nb END AS BIGINT)
             AS mean_b_cents,
           ssa, ssb,
           CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE
                (1000 * dnum + CAST({_LEHR_BIG} AS HUGEINT) * (na * nb))
                // (na * nb) - {_LEHR_BIG} END AS BIGINT) AS gap_milli_cents,
           CAST(CASE WHEN dnum = 0 OR na = 0 OR nb = 0 OR na + nb = 2
                     THEN NULL
                     ELSE (16 * (ssnum // ((na + nb - 2) * na * nb))
                             * (CAST(na AS HUGEINT) * nb) * (na * nb)
                           + dnum * dnum - 1)
                          // (dnum * dnum) END AS BIGINT)
             AS n_lehr
    FROM d
    """,
)
def analytics_lehr_sample_size(
    spark: SparkSession, sf_dir: str, orders: DataFrame | None = None
) -> DataFrame:
    """M337 — the EXPERIMENT-DESIGN terms between the URGENT and LOW
    order-priority cohorts: per-cohort counts, floor means, the exact
    centered sum-of-squares carriers Σ(x−μ)² (the M15/m2c
    discipline), the signed mean gap in milli-cents (+BIG shift), and
    LEHR'S RULE n = 16·s²/d² — the per-arm sample size for 80% power
    at α=0.05 — in TWO exact integral steps: the pooled variance is
    FLOORED to integer cents² first (s2p = SSnum div ((na+nb−2)·na·nb)
    with SSnum the pooled-SS numerator over the common na·nb
    denominator — a < 1-cents² loss against a ~10¹³ cents² value),
    then n = ⌈16·s2p·(na·nb)²/D²⌉ with D = s1a·nb − s1b·na the
    cleared mean gap.  The number every A/B platform quotes before
    launching; a near-zero observed gap correctly yields an
    astronomically large n — that IS the answer (you cannot power a
    test for an effect this small).

    Exactness: x⁴-free (only x² enters), intermediates in
    DECIMAL(38,0)/HUGEINT.  The two-step form exists because the
    fully-cleared single division 16·SSnum·na·nb overflows: MEASURED
    1.63·10³⁸ at sf0.1 > Decimal(38) — the staged slate's single-
    division headroom claim was wrong by six decades and the sf0.1
    bench caught it at activation; the two-step numerator
    16·s2p·(na·nb)² is ~1.6·10³² at sf0.1 (~10³⁶ at sf1).  D = 0
    yields NULL (no detectable direction); degenerate cohorts guard
    the same way in both engines — an empty cohort NULLs its mean/SS
    plus the gap and n, and na = nb = 1 NULLs n (zero pooled degrees
    of freedom) — reachable only through ``orders=``, injection-
    pinned.  Scale: ONE map-side-combinable conditional aggregate
    over the two cohorts; a 1-row finale with no joins at all.

    ``orders=`` substitutes the order frame for probes (the shift
    audit injects a negative non-divisible gap numerator); the driver
    contract never passes it."""
    o = orders if orders is not None else load(spark, sf_dir, "orders")
    o = o.filter(F.col("o_orderpriority").isin(_LEHR_A, _LEHR_B))
    x = o.select(
        F.when(F.col("o_orderpriority") == _LEHR_A, 1).otherwise(0).alias("ia"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    s = x.agg(
        F.sum("ia").cast("bigint").alias("na"),
        F.sum(F.lit(1) - F.col("ia")).cast("bigint").alias("nb"),
        F.sum(F.col("ia") * F.col("c")).cast("bigint").alias("s1a"),
        F.sum((F.lit(1) - F.col("ia")) * F.col("c")).cast("bigint").alias("s1b"),
        F.sum(F.expr("CAST(ia AS DECIMAL(38,0)) * c * c")).alias("s2a"),
        F.sum(F.expr("CAST(1 - ia AS DECIMAL(38,0)) * c * c")).alias("s2b"),
    )
    d = s.select(
        "na",
        "nb",
        "s1a",
        "s1b",
        F.expr(
            "CAST(CASE WHEN na = 0 THEN NULL ELSE"
            " (na * s2a - CAST(s1a AS DECIMAL(38,0)) * s1a) div na"
            " END AS BIGINT)"
        ).alias("ssa"),
        F.expr(
            "CAST(CASE WHEN nb = 0 THEN NULL ELSE"
            " (nb * s2b - CAST(s1b AS DECIMAL(38,0)) * s1b) div nb"
            " END AS BIGINT)"
        ).alias("ssb"),
        F.expr(
            "CAST(s1a AS DECIMAL(38,0)) * nb - CAST(s1b AS DECIMAL(38,0)) * na"
        ).alias("dnum"),
        F.expr(
            "nb * (na * s2a - CAST(s1a AS DECIMAL(38,0)) * s1a)"
            " + na * (nb * s2b - CAST(s1b AS DECIMAL(38,0)) * s1b)"
        ).alias("ssnum"),
    )
    return d.select(
        "na",
        "nb",
        F.expr(
            "CAST(CASE WHEN na = 0 THEN NULL ELSE s1a div na END AS BIGINT)"
        ).alias("mean_a_cents"),
        F.expr(
            "CAST(CASE WHEN nb = 0 THEN NULL ELSE s1b div nb END AS BIGINT)"
        ).alias("mean_b_cents"),
        "ssa",
        "ssb",
        F.expr(
            f"CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE"
            f" (1000 * dnum + CAST({_LEHR_BIG} AS DECIMAL(38,0))"
            f" * (na * nb)) div (na * nb) - {_LEHR_BIG} END AS BIGINT)"
        ).alias("gap_milli_cents"),
        F.expr(
            "CAST(CASE WHEN dnum = 0 OR na = 0 OR nb = 0 OR na + nb = 2"
            " THEN NULL"
            " ELSE (16 * (ssnum div ((na + nb - 2) * na * nb))"
            "         * (CAST(na AS DECIMAL(38,0)) * nb) * (na * nb)"
            "       + dnum * dnum - 1)"
            "      div (dnum * dnum) END AS BIGINT)"
        ).alias("n_lehr"),
    )


# ---------------------------------------------------------------------------
# M339 analytics_permutation_rank — deterministic permutation test of the gap
# ---------------------------------------------------------------------------

_PR_A = "1-URGENT"
_PR_B = "5-LOW"
_PR_PERMS = 8
_PR_BIG = 10**12  # gap shift constant — the r17 Lehr lesson: sized
# from the domain bound (cents < 10^8, so |1000*dnum| << BIG*na*nb)


@register(
    "analytics_permutation_rank",
    oracle=f"""
    WITH x AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '{_PR_A}' THEN 1 ELSE 0 END AS true_a,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
      WHERE o_orderpriority IN ('{_PR_A}', '{_PR_B}')
    ),
    lab AS (
      SELECT p.j, x.c,
             CASE WHEN p.j = 0 THEN x.true_a
                  WHEN substring(md5(CAST(x.o_orderkey AS VARCHAR)
                                     || '_' || CAST(p.j AS VARCHAR)), 1, 1)
                       < '8' THEN 1 ELSE 0 END AS ia
      FROM x CROSS JOIN
           (SELECT unnest(generate_series(0, {_PR_PERMS})) AS j) p
    ),
    s AS (
      SELECT CAST(j AS BIGINT) AS perm_id,
             CAST(sum(ia) AS BIGINT) AS na,
             CAST(sum(1 - ia) AS BIGINT) AS nb,
             CAST(sum(ia * c) AS BIGINT) AS s1a,
             CAST(sum((1 - ia) * c) AS BIGINT) AS s1b
      FROM lab GROUP BY j
    ),
    g AS (
      SELECT perm_id, na, nb,
             CASE WHEN na * nb = 0 THEN NULL ELSE
             CAST((1000 * (CAST(s1a AS HUGEINT) * nb - CAST(s1b AS HUGEINT) * na)
                   + CAST({_PR_BIG} AS HUGEINT) * (na * nb))
                  // (na * nb) - {_PR_BIG} AS BIGINT) END AS gap_milli
      FROM s
    ),
    o AS (
      SELECT *, max(CASE WHEN perm_id = 0 THEN abs(gap_milli) END) OVER ()
               AS obs_abs
      FROM g
    )
    SELECT perm_id, na, nb, gap_milli,
           CAST(abs(gap_milli) AS BIGINT) AS abs_gap_milli,
           CAST(CASE WHEN abs(gap_milli) >= obs_abs THEN 1 ELSE 0 END
                AS BIGINT) AS ge_obs
    FROM o
    """,
)
def analytics_permutation_rank(
    spark: SparkSession, sf_dir: str, orders: DataFrame | None = None
) -> DataFrame:
    """M339 — a deterministic PERMUTATION TEST of the
    URGENT-vs-LOW mean-value gap: 8 md5 relabelings of the order rows
    (perm j assigns variant by the first hex digit of
    md5(orderkey_j) — the poisson-bootstrap coin discipline) next to
    the observed labeling (perm 0), each with its exact shifted-floor
    mean gap in milli-cents, the absolute gap, and the ge_obs flag —
    #{{j : |gap_j| ≥ |gap_0|}} / (P+1) IS the exact finite-sample
    permutation p-value (numerator visible in the output, obs row
    included so the p-value is never 0 — the standard +1 correction).
    No distributional assumption, no transcendentals: this is the
    inference companion to analytics_lehr_sample_size (M337) —
    Lehr sizes the test, this one runs it.

    Degenerate-cohort guard (probe-kwarg guard rule): a labeling that
    puts every row in one cohort has no mean gap — gap_milli is NULL
    when na·nb = 0 in BOTH engines (abs_gap NULL, ge_obs 0 via CASE
    NULL semantics); unreachable on the fixture, injection-pinned in
    tests/test_r18_twins.py.

    Scale: the ×9 permutation axis rides an explode on the order rows
    (one scan), the per-perm rollup is map-side combinable, and the
    observed-gap attach is a window over the 9-row axis keyed by the
    pmod constant-partition idiom.  Gap shift constant 10¹² — sized
    from the cents domain bound.

    ``orders=`` substitutes the order frame for probes; the driver
    contract never passes it."""
    o = orders if orders is not None else load(spark, sf_dir, "orders")
    o = o.filter(F.col("o_orderpriority").isin(_PR_A, _PR_B))
    x = o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == _PR_A, 1).otherwise(0).alias("true_a"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    lab = x.select(
        "o_orderkey",
        "true_a",
        "c",
        F.explode(
            F.array(*[F.lit(j) for j in range(_PR_PERMS + 1)])
        ).alias("j"),
    ).select(
        "j",
        "c",
        F.when(F.col("j") == 0, F.col("true_a"))
        .otherwise(
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("o_orderkey").cast("string"),
                            F.lit("_"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
                < "8",
                1,
            ).otherwise(0)
        )
        .alias("ia"),
    )
    s = lab.groupBy("j").agg(
        F.sum("ia").cast("bigint").alias("na"),
        F.sum(F.lit(1) - F.col("ia")).cast("bigint").alias("nb"),
        F.sum(F.col("ia") * F.col("c")).cast("bigint").alias("s1a"),
        F.sum((F.lit(1) - F.col("ia")) * F.col("c")).cast("bigint").alias("s1b"),
    )
    g = s.select(
        F.col("j").cast("bigint").alias("perm_id"),
        "na",
        "nb",
        F.expr(
            f"CASE WHEN na * nb = 0 THEN NULL ELSE"
            f" CAST((1000 * (CAST(s1a AS DECIMAL(38,0)) * nb"
            f" - CAST(s1b AS DECIMAL(38,0)) * na)"
            f" + CAST({_PR_BIG} AS DECIMAL(38,0)) * (na * nb))"
            f" div (na * nb) - {_PR_BIG} AS BIGINT) END"
        ).alias("gap_milli"),
    )
    w = Window.partitionBy(F.pmod(F.col("perm_id"), F.lit(1)))
    return g.withColumn(
        "obs_abs", F.max(F.when(F.col("perm_id") == 0, F.abs(F.col("gap_milli")))).over(w)
    ).select(
        "perm_id",
        "na",
        "nb",
        "gap_milli",
        F.abs(F.col("gap_milli")).cast("bigint").alias("abs_gap_milli"),
        F.when(F.abs(F.col("gap_milli")) >= F.col("obs_abs"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("ge_obs"),
    )


# ---------------------------------------------------------------------------
# M343 analytics_qte_deciles — quantile treatment effects via grouped rank
# ---------------------------------------------------------------------------


@register(
    "analytics_qte_deciles",
    oracle="""
    WITH x AS (
      SELECT o_orderkey,
             CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    r AS (
      SELECT variant, c,
             row_number() OVER (PARTITION BY variant
                                ORDER BY c, o_orderkey) AS pos,
             count(*) OVER (PARTITION BY variant) AS n
      FROM x
    ),
    tgt AS (
      SELECT r.variant, d.d, r.c
      FROM r JOIN (SELECT unnest(generate_series(1, 9)) AS d) d
        ON r.pos = (d.d * (r.n + 1)) // 10
    )
    SELECT CAST(d AS BIGINT) AS decile,
           CAST(max(CASE WHEN variant = 'A' THEN c END) AS BIGINT)
             AS val_a_cents,
           CAST(max(CASE WHEN variant = 'B' THEN c END) AS BIGINT)
             AS val_b_cents,
           CAST(max(CASE WHEN variant = 'B' THEN c END)
                - max(CASE WHEN variant = 'A' THEN c END) AS BIGINT)
             AS qte_cents
    FROM tgt GROUP BY d
    """,
)
def analytics_qte_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M343 — QUANTILE TREATMENT EFFECTS: the nine decile
    boundaries of order value per md5-split variant, joined into a
    decile-gap table (B − A in exact signed cents, NO division) —
    the distributional A/B readout that catches what the mean hides
    (a treatment that helps small orders and hurts large ones nets to
    zero in analytics_ab_lift; it shows as opposite-sign QTEs here).
    Boundary rank = (d·(n+1)) div 10 — the M196 lower counting
    quantile, positive so both engines' division agrees.

    Scale: per-variant ranks ride the GROUPED two-pass global rank
    (plans/global_order.py group_cols — range-partitioned, a variant
    can span many partitions, no single-partition window); the decile
    targets join on the exact (variant, pos) key; the 9-row pivot is
    a bounded rollup."""
    o = load(spark, sf_dir, "orders")
    x = o.select(
        "o_orderkey",
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) < "8",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    r = global_row_number(
        x,
        [F.col("c").asc(), F.col("o_orderkey").asc()],
        group_cols=["variant"],
        out="pos",
        total_col="n",
    )
    tgt = (
        r.select(
            "variant",
            "c",
            "pos",
            "n",
            F.explode(F.array(*[F.lit(d) for d in range(1, 10)])).alias("d"),
        )
        .filter(F.col("pos") == F.expr("(d * (n + 1)) div 10"))
    )
    return tgt.groupBy(F.col("d").cast("bigint").alias("decile")).agg(
        F.max(F.when(F.col("variant") == "A", F.col("c")))
        .cast("bigint")
        .alias("val_a_cents"),
        F.max(F.when(F.col("variant") == "B", F.col("c")))
        .cast("bigint")
        .alias("val_b_cents"),
        (
            F.max(F.when(F.col("variant") == "B", F.col("c")))
            - F.max(F.when(F.col("variant") == "A", F.col("c")))
        )
        .cast("bigint")
        .alias("qte_cents"),
    )


# ---------------------------------------------------------------------------
# M347 analytics_ta_depth_curve — Fagin Threshold-Algorithm early-stop audit
# ---------------------------------------------------------------------------

_TA_K = 5
_TA_W = 100_000  # cents weight per order in the monotone combined score
_TA_DEPTHS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


@register(
    "analytics_ta_depth_curve",
    oracle=f"""
    WITH base AS (
      SELECT c.c_custkey AS k,
             CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                  AS BIGINT) AS spend,
             CAST(count(o.o_orderkey) AS BIGINT) AS nord
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ),
    r AS (
      SELECT k, spend, nord,
             CAST(spend + {_TA_W} * nord AS BIGINT) AS score,
             row_number() OVER (ORDER BY spend DESC, k) AS rx,
             row_number() OVER (ORDER BY nord DESC, k) AS ry
      FROM base
    ),
    grid AS (SELECT unnest([{", ".join(str(p) for p in _TA_DEPTHS)}]) AS p),
    thr AS (
      SELECT grid.p,
             CAST(x.spend + {_TA_W} * y.nord AS BIGINT) AS t_threshold
      FROM grid JOIN r x ON x.rx = grid.p JOIN r y ON y.ry = grid.p
    ),
    seen AS (
      SELECT grid.p, r.score,
             row_number() OVER (PARTITION BY grid.p
                                ORDER BY r.score DESC, r.k) AS rk18
      FROM grid JOIN r ON least(r.rx, r.ry) <= grid.p
    ),
    kth AS (
      SELECT p, CAST(max(CASE WHEN rk18 = {_TA_K} THEN score END) AS BIGINT)
               AS kth_seen_score,
             CAST(count(*) AS BIGINT) AS n_seen
      FROM seen GROUP BY p
    )
    SELECT CAST(thr.p AS BIGINT) AS depth, thr.t_threshold,
           kth.kth_seen_score, kth.n_seen,
           CAST(CASE WHEN kth.kth_seen_score >= thr.t_threshold THEN 1
                     ELSE 0 END AS BIGINT) AS stopped
    FROM thr JOIN kth ON thr.p = kth.p
    """,
)
def analytics_ta_depth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M347 — FAGIN'S THRESHOLD ALGORITHM depth curve: two
    ranked attribute lists over customers (total spend in cents;
    order count weighted $1000 each — a fixed monotone linear score),
    and at probe depths 1..512 (powers of two) the TA threshold
    T(p) = x_value@p + w·y_value@p next to the k=5-th best COMBINED
    score among customers already SEEN (entered at min(rank_x,
    rank_y) ≤ p) — stopped = 1 once the k-th seen score meets the
    threshold, the classic top-k early-termination certificate.  The
    depth where `stopped` flips is how much of each ranked list a
    rank-aware engine must actually read — the audit behind every
    "don't scan the whole index for top-k" plan.  Depths past the
    list length drop out of BOTH engines — the rank-p rows don't
    exist (fixture-reachable at sf0.001, where 256/512 > 150
    customers; pinned in tests/test_r18_twins.py).

    Exactness: all-integer scores and thresholds; unique tie-breaks
    by custkey everywhere.  Scale: both global ranks ride the
    two-pass range-partitioned rank; the per-depth membership is an
    EXPLODE of each row to its eligible grid depths (a filtered
    literal array — no inequality join, no BNLJ); per-depth windows
    key on the real depth column.  Σ eligible rows ≤ 2·Σ grid depths
    — bounded by the grid, not the corpus."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    base = (
        c.join(o, "k", "left")
        .groupBy("k")
        .agg(
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("spend"),
            F.count("cents").cast("bigint").alias("nord"),
        )
    )
    rx = global_row_number(base, [F.col("spend").desc(), F.col("k").asc()], out="rx")
    r = iter_materialize(  # feeds thresholds AND the seen explode
        global_row_number(
            rx, [F.col("nord").desc(), F.col("k").asc()], out="ry"
        ).withColumn(
            "score", (F.col("spend") + F.lit(_TA_W) * F.col("nord")).cast("bigint")
        )
    )
    grid = F.array(*[F.lit(p) for p in _TA_DEPTHS])
    xv = r.filter(F.col("rx").isin(list(_TA_DEPTHS))).select(
        F.col("rx").alias("p"), F.col("spend").alias("x_at")
    )
    yv = r.filter(F.col("ry").isin(list(_TA_DEPTHS))).select(
        F.col("ry").alias("p"), F.col("nord").alias("y_at")
    )
    thr = xv.join(yv, "p").select(
        "p",
        (F.col("x_at") + F.lit(_TA_W) * F.col("y_at"))
        .cast("bigint")
        .alias("t_threshold"),
    )
    seen = r.select(
        "k",
        "score",
        F.explode(
            F.filter(grid, lambda g: g >= F.least(F.col("rx"), F.col("ry")))
        ).alias("p"),
    )
    wp = Window.partitionBy("p").orderBy(F.col("score").desc(), F.col("k"))
    kth = (
        seen.withColumn("rk18", F.row_number().over(wp))
        .groupBy("p")
        .agg(
            F.max(F.when(F.col("rk18") == _TA_K, F.col("score")))
            .cast("bigint")
            .alias("kth_seen_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_seen"),
        )
    )
    return thr.join(kth, "p").select(
        F.col("p").cast("bigint").alias("depth"),
        "t_threshold",
        "kth_seen_score",
        "n_seen",
        F.when(F.col("kth_seen_score") >= F.col("t_threshold"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("stopped"),
    )


# ---------------------------------------------------------------------------
# M355 analytics_price_elasticity_terms — per-brand OLS slope terms
# ---------------------------------------------------------------------------


@register(
    "analytics_price_elasticity_terms",
    oracle="""
    WITH pq AS (
      SELECT p.p_brand AS brand,
             CAST(round(p.p_retailprice * 100) AS BIGINT) AS x,
             CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS y
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey, p.p_retailprice
    )
    SELECT brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(x) AS BIGINT) AS s_x,
           CAST(sum(y) AS BIGINT) AS s_y,
           CAST(sum(x * y) AS BIGINT) AS s_xy,
           CAST(sum(x * x) AS BIGINT) AS s_xx,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
             AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
             AS slope_den
    FROM pq GROUP BY brand
    """,
)
def analytics_price_elasticity_terms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SURVEY §2.M M355 — per-brand PRICE-ELASTICITY slope terms: for
    each brand, the exact OLS terms of total demanded quantity (y) on
    retail price in cents (x) across that brand's parts — slope_num =
    nΣxy − ΣxΣy (SIGNED: demand curves slope down, the numerator
    carries the sign with NO division anywhere — the M254 discipline
    made group-wise), slope_den = nΣx² − (Σx)² ≥ 0.  The elasticity
    read every pricing team wants per product family; the per-brand
    slope is slope_num/slope_den client-side.

    Scale: lineitem collapses map-side onto parts (one join keyed by
    partkey), then a |brands|-row rollup of the co-moments — all
    map-side combinable.  Headroom: x ≤ 2·10⁵ cents, y ≤ 10⁴ per
    part, n ≤ parts/brand — every term orders of magnitude inside
    BIGINT through 100× replication."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", F.round(F.col("l_quantity")).cast("bigint").alias("q")
    )
    pq = (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_partkey", "brand", "x")
        .agg(F.sum("q").cast("bigint").alias("y"))
    )
    return pq.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("x").cast("bigint").alias("s_x"),
        F.sum("y").cast("bigint").alias("s_y"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("s_xy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s_xx"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        )
        .cast("bigint")
        .alias("slope_num"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        )
        .cast("bigint")
        .alias("slope_den"),
    )


# ---------------------------------------------------------------------------
# M357 analytics_gini_by_month — the M192 Lorenz identity as a trend
# ---------------------------------------------------------------------------


@register(
    "analytics_gini_by_month",
    oracle="""
    WITH s AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS mk,
             o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT mk, spend_cents,
             CAST(row_number() OVER (PARTITION BY mk
                                     ORDER BY spend_cents, o_custkey)
                  AS BIGINT) AS pos
      FROM s
    ),
    a AS (
      SELECT mk, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(spend_cents) AS BIGINT) AS total_cents,
             CAST(sum(pos * spend_cents) AS BIGINT) AS s1
      FROM r GROUP BY mk
    )
    SELECT mk AS month_key, n_customers, total_cents,
           CAST((1000000 * (2 * CAST(s1 AS HUGEINT)
                            - (n_customers + 1) * CAST(total_cents AS HUGEINT)))
                // (CAST(n_customers AS HUGEINT) * total_cents)
                AS BIGINT) AS gini_ppm
    FROM a
    """,
)
def analytics_gini_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.M M357 — the M192 Lorenz-identity GINI per order
    month: inequality of per-customer monthly spend as a TREND (month
    key = year·100 + month, pure integer both engines), G = (2·Σ i·x_i
    − (n+1)·Σx_i) / (n·Σx_i) over each month's ascending spend rank
    with the unique (spend, custkey) tie-break — concentration
    drifting up month-over-month is the marketplace-health alarm the
    single M192 scalar cannot ring.

    Scale: the per-month ranks ride the GROUPED two-pass global rank
    (group_cols=["mk"] — months are range-partitioned together with
    the order keys, so one month can span many partitions; never a
    per-month single-partition window), then a |months|-row finale in
    DECIMAL(38,0)/HUGEINT (the wide-integer rule)."""
    o = load(spark, sf_dir, "orders")
    s = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("mk"),
        "o_custkey",
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_cents")
    )
    r = global_row_number(
        s,
        [F.col("spend_cents").asc(), F.col("o_custkey").asc()],
        group_cols=["mk"],
        out="pos",
    )
    a = r.groupBy("mk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("spend_cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("pos") * F.col("spend_cents")).cast("bigint").alias("s1"),
    )
    return a.select(
        F.col("mk").alias("month_key"),
        "n_customers",
        "total_cents",
        F.expr(
            "CAST((1000000 * (2 * CAST(s1 AS DECIMAL(38,0))"
            " - (n_customers + 1) * CAST(total_cents AS DECIMAL(38,0))))"
            " div (CAST(n_customers AS DECIMAL(38,0)) * total_cents)"
            " AS BIGINT)"
        ).alias("gini_ppm"),
    )
