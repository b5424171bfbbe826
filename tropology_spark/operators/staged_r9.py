"""STAGED round-9 operators — implemented and parity-tested, NOT yet
registered.

The driver hash-checks the first 50 registry entries per round, and the
round-8 window is exactly budgeted (_R8_NEW + the final 44 stale
refreshes — see ``tropology_spark/__init__.py``), so these cannot enter
``QUERIES`` this round without evicting a queue slot the round-7
verdict ordered spent on freshness.  They live here with the SAME
(fn, oracle) contract the registry uses; round 9 activates each by
moving it into its home module with ``@register`` + the five-fold
lockstep (CLAUDE.md).  Until then tests/test_staged_r9.py runs the
full driver-replica comparison over ``STAGED`` at both verification
scales, so activation is a mechanical move, not a build.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.sources.tables import load

#: name -> (query_fn, oracle_sql); the registry contract, unregistered.
STAGED: dict = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# fn_tz_day_profile — timezone-aware local-hour profile (DST-correct)
# ---------------------------------------------------------------------------

_TZ = "America/New_York"


@_stage(
    "fn_tz_day_profile",
    oracle=f"""
    SELECT event_type,
           strftime(timezone('{_TZ}', timezone('UTC', ts)), '%H') AS local_hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def fn_tz_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the tz-correct hour-of-day activity profile
    (event counts + distinct users per type and LOCAL hour), the form
    every "when are users active" dashboard actually needs: civil
    time, DST-correct, not UTC buckets.  Cross-engine rule (verified
    live in round 8 across both 2024 DST edges and under a non-UTC
    DuckDB session TZ): Spark ``convert_timezone('UTC', tz, ts)`` ==
    DuckDB ``timezone(tz, timezone('UTC', ts))`` — the double-
    timezone() oracle form pins the naive→UTC interpretation and
    returns a naive local, independent of the session TimeZone (the
    single TIMESTAMPTZ cast reads the session TZ; never use it).

    Scale: pure scan-side projection to a 24-value key, one map-side-
    combinable rollup with a distinct partial — no window, no join."""
    e = load(spark, sf_dir, "events")
    local_hour = F.date_format(
        F.expr(f"convert_timezone('UTC', '{_TZ}', ts)"), "HH"
    )
    return e.groupBy("event_type", local_hour.alias("local_hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# text_bpe_vocab4 — four unrolled BPE merge rounds (M221 extended)
# ---------------------------------------------------------------------------

_BPE4_ROUNDS = 4
_BPE4_TOP = 10


def _bpe4_oracle() -> str:
    """Chained M221 CTEs: counts -> top-1 -> chr(r)-sentinel merge,
    four times; sentinels display as the digits '1'..'4' (absent from
    the fixture alphabet of space + lowercase letters)."""
    parts = [
        """
    WITH m0 AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    """
    ]
    for r in range(1, _BPE4_ROUNDS + 1):
        parts.append(f"""
    , p{r} AS (
      SELECT substring(token, i, 2) AS pair
      FROM m{r - 1}, (SELECT unnest(generate_series(1, 256)) AS i) g{r}
      WHERE i <= len(token) - 1
    ),
    c{r} AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p{r} GROUP BY 1),
    t{r} AS (SELECT pair FROM c{r} ORDER BY n DESC, pair LIMIT 1),
    m{r} AS (SELECT replace(token, (SELECT pair FROM t{r}), chr({r})) AS token
             FROM m{r - 1})
    """)
    disp = "pair"
    for r in range(1, _BPE4_ROUNDS + 1):
        disp = f"replace({disp}, chr({r}), '{r}')"
    ranked = "\n      UNION ALL ".join(
        f"SELECT {r} AS merge_round, pair, n,"
        f" row_number() OVER (ORDER BY n DESC, pair) AS rn FROM c{r}"
        for r in range(1, _BPE4_ROUNDS + 1)
    )
    parts.append(f"""
    , ranked AS (
      {ranked}
    )
    SELECT CAST(merge_round AS BIGINT) AS merge_round, {disp} AS pair, n,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_BPE4_TOP}
    """)
    return "".join(parts)


@_stage("text_bpe_vocab4", oracle=_bpe4_oracle())
def text_bpe_vocab4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — M221 extended to FOUR unrolled BPE merge rounds:
    each round counts adjacent symbol pairs, merges the (count DESC,
    pair) winner everywhere via the chr(r) sentinel (the round-8
    verified left-to-right non-overlapping ``replace``), and re-counts
    — the first four rows of a BPE vocabulary build, with each round's
    top-{t} candidate table emitted.  Sentinels surface as digits
    '1'..'4' (collision-free against the letters-only fixture
    alphabet; injective, unlike a shared '*').

    Scale: per round one linear explode+count on a bounded key and a
    1-row broadcast winner — the production BPE recurrence is k
    iterations of exactly this; each count table feeds its rank AND
    the winner, so each is checkpointed (DOUBLE-REFERENCE RULE),
    while the token frames chain linearly (single reference each)."""
    from tropology_spark.session import iter_materialize

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))

    def pair_counts(frame: DataFrame) -> DataFrame:
        return (
            frame.filter(F.length("token") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(token) - 1),"
                        " i -> substring(token, i, 2))"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    w = Window.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
        F.desc("n"), F.asc("pair")
    )
    disp_sql = "pair"
    for r in range(1, _BPE4_ROUNDS + 1):
        disp_sql = f"replace({disp_sql}, char({r}), '{r}')"

    cur = toks
    ranked_parts: list[DataFrame] = []
    for r in range(1, _BPE4_ROUNDS + 1):
        c = iter_materialize(pair_counts(cur))
        ranked_parts.append(
            c.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= _BPE4_TOP)
            .select(
                F.lit(r).cast("bigint").alias("merge_round"),
                F.expr(disp_sql).alias("pair"),
                "n",
                "rn",
            )
        )
        top = (
            c.orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .select(F.col("pair").alias("mpair"))
        )
        cur = cur.crossJoin(F.broadcast(top)).select(
            F.expr(f"replace(token, mpair, char({r}))").alias("token")
        )
    out = ranked_parts[0]
    for p in ranked_parts[1:]:
        out = out.unionByName(p)
    return out


text_bpe_vocab4.__doc__ = text_bpe_vocab4.__doc__.format(t=_BPE4_TOP)


# ---------------------------------------------------------------------------
# join_skyline_pareto — 2-D skyline (cheapest-for-the-size frontier)
# ---------------------------------------------------------------------------


@_stage(
    "join_skyline_pareto",
    oracle="""
    WITH pc AS (
      SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT p_partkey, cents, size
    FROM pc x
    WHERE NOT EXISTS (
      SELECT 1 FROM pc d
      WHERE d.cents <= x.cents AND d.size >= x.size
        AND (d.cents < x.cents OR d.size > x.size)
    )
    """,
)
def join_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the 2-D SKYLINE (Pareto frontier): parts not
    dominated on (price ↓, size ↑) — "no other part is both cheaper
    and at least as large" — the classic multi-criteria shortlist
    operator.  The oracle keeps the declarative NOT EXISTS dominance
    (quadratic, oracle-scale only); the Spark side is the linear
    sweep: collapse to the per-price max size (one hash aggregate),
    take the running max over strictly cheaper prices on the price
    axis, and a row survives iff it beats every cheaper price's best
    size AND is its own price's best.  Equal (cents, size) twins are
    all kept (neither dominates — the strictness clause).

    Scale: the quadratic dominance check becomes one map-side-
    combinable rollup to the DISTINCT-PRICE axis + one bounded-axis
    running max on the pmod constant key (the price grid is a bounded
    DOMAIN — the M196 counting-quantile argument) + one broadcast-
    sized join back.  No self-join at any size."""
    from tropology_spark.session import iter_materialize

    pc = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    g = iter_materialize(
        pc.groupBy("cents").agg(F.max("size").alias("gmax"))
    )
    rw = (
        Window.partitionBy(F.pmod(F.col("cents"), F.lit(1)))
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # rows preceding in cents order = strictly cheaper prices (g has
    # one row per cents, so ROWS and RANGE agree).
    frontier = g.select(
        "cents",
        "gmax",
        F.max("gmax").over(rw).alias("cheaper_best"),
    )
    return (
        pc.join(F.broadcast(frontier), "cents")
        .filter(
            (F.col("cheaper_best").isNull() | (F.col("cheaper_best") < F.col("size")))
            & (F.col("size") == F.col("gmax"))
        )
        .select("p_partkey", "cents", "size")
    )


# ---------------------------------------------------------------------------
# analytics_survival_curve — cohort retention survival table
# ---------------------------------------------------------------------------


@_stage(
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
    """Staged M-row — the cohort SURVIVAL table: for each first-order
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
# ts_double_smooth — Brown's double exponential smoothing (dyadic taps)
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


@_stage("ts_double_smooth", oracle=_ds_oracle())
def ts_double_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — Brown's DOUBLE exponential smoothing with the
    M58 dyadic-taps trick applied twice: the second pass smooths the
    first pass's output, and the Brown trend term 2·S' − S'' falls out
    as the exact integer 16·s1 − s2 (scales x16 and x256) — the
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
# graph_closure_rate_capped — global clustering coefficient terms
# ---------------------------------------------------------------------------


def _closure_oracle() -> str:
    from tropology_spark.operators.graph_motifs import _CAPPED_PROJ_CTE

    return (
        _CAPPED_PROJ_CTE
        + """
    , und AS (SELECT u, v FROM proj0 UNION ALL SELECT v, u FROM proj0),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
    wed AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
    tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM proj0 e1
      JOIN proj0 e2 ON e2.u = e1.v
      JOIN proj0 e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri)
    SELECT n_triangles, n_wedges,
           CAST(CASE WHEN n_wedges = 0 THEN NULL
                     ELSE (1000000 * 3 * n_triangles) // n_wedges END
                AS BIGINT) AS closure_ppm
    FROM t CROSS JOIN wed
    """
    )


@_stage("graph_closure_rate_capped", oracle=_closure_oracle())
def graph_closure_rate_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the GLOBAL clustering coefficient of the
    hub-capped co-purchase projection: 3·triangles / wedges in ppm,
    with the raw terms alongside (the single number the per-node M70/
    M135 tables roll up to; transitivity, the graph-cohesion KPI).
    Composed, not copied: the oracle extends ``_CAPPED_PROJ_CTE``
    (the single SQL home of the M120/M204/M213 projection arithmetic)
    and the Spark side reads the session-shared
    ``copurchase_projection`` view.

    Scale: the projection is the dominant cost and is already hub-
    capped + session-materialized; wedges are one degree rollup
    (Σ C(d,2) — integers), triangles one oriented 3-branch join over
    the materialized edge list; the finale is a 1-row cross of two
    scalars (guarded NULL on a wedge-free graph — the ADVICE r6
    degenerate-denominator rule)."""
    from tropology_spark.operators.graph_motifs import _HUB_CAP, copurchase_projection

    proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    und = proj.select("u", "v").unionAll(
        proj.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    wed = deg.agg(
        F.expr("sum(d * (d - 1) div 2)").cast("bigint").alias("n_wedges")
    )
    e1 = proj
    e2 = proj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = proj.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        e1.join(e2, "v")
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return tri.crossJoin(F.broadcast(wed)).select(
        "n_triangles",
        "n_wedges",
        F.expr(
            "CASE WHEN n_wedges = 0 THEN NULL"
            " ELSE (1000000 * 3 * n_triangles) div n_wedges END"
        )
        .cast("bigint")
        .alias("closure_ppm"),
    )


# ---------------------------------------------------------------------------
# sim_rrf_fusion — reciprocal-rank fusion of the cosine and L2 top-k
# ---------------------------------------------------------------------------

_RRF_K = 60


def _rrf_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH cg AS ({ORACLES['sim_topk_cosine']}),
    lg AS ({ORACLES['sim_topk_l2']}),
    cr AS (SELECT vec_id,
                  row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk
           FROM cg),
    lr AS (SELECT vec_id,
                  row_number() OVER (ORDER BY d2_micro, vec_id) AS rk
           FROM lg),
    u AS (SELECT * FROM cr UNION ALL SELECT * FROM lr),
    s AS (SELECT vec_id,
                 CAST(sum(1000000000 // ({_RRF_K} + rk)) AS BIGINT) AS rrf_nano,
                 CAST(count(*) AS BIGINT) AS n_lists
          FROM u GROUP BY vec_id)
    SELECT vec_id, rrf_nano, n_lists,
           CAST(row_number() OVER (ORDER BY rrf_nano DESC, vec_id) AS BIGINT)
             AS rn
    FROM s
    """


@_stage("sim_rrf_fusion", oracle=_rrf_oracle())
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — RECIPROCAL-RANK FUSION of the two exact
    retrieval lists (J8 cosine, M151 squared-L2) for the query
    vector: score = Σ 1/(60+rank) over the lists a vector appears in
    — the standard zero-tuning hybrid-retrieval combiner.  Each term
    is the exact integer ``10⁹ div (60+rank)`` (positive — DuckDB
    ``//`` and Spark ``div`` agree), so the fused score crosses the
    engine hash gate bit-for-bit where the textbook float sum could
    not.  Composed, not copied: both input lists come from the
    REGISTERED queries / ORACLES verbatim.

    Scale: the inputs are top-k lists (k rows each) — everything
    after retrieval is broadcast-sized; rank windows ride the pmod
    constant key over ≤ k rows."""
    from tropology_spark.registry import QUERIES

    c = QUERIES["sim_topk_cosine"](spark, sf_dir)
    l2 = QUERIES["sim_topk_l2"](spark, sf_dir)
    ck = F.pmod(F.col("vec_id"), F.lit(1))
    cr = c.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(ck).orderBy(F.desc("cosine"), F.asc("vec_id"))
        ),
    ).select("vec_id", "rk")
    lr = l2.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(ck).orderBy(F.asc("d2_micro"), F.asc("vec_id"))
        ),
    ).select("vec_id", "rk")
    s = (
        cr.unionByName(lr)
        .groupBy("vec_id")
        .agg(
            F.expr(f"sum(1000000000 div ({_RRF_K} + rk))")
            .cast("bigint")
            .alias("rrf_nano"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
    )
    return s.withColumn(
        "rn",
        F.row_number()
        .over(
            Window.partitionBy(ck).orderBy(F.desc("rrf_nano"), F.asc("vec_id"))
        )
        .cast("bigint"),
    )


# ---------------------------------------------------------------------------
# analytics_winback_counts — reactivation after dormancy
# ---------------------------------------------------------------------------

_WINBACK_GAP_DAYS = 3  # a return after >= 2 full dormant days
# (fixture activity is dense: max observed gap is 3/4/6 days at
# sf0.001/0.01/0.1 — a 7-day threshold would be trivially empty at
# every scale, which is no evidence at all)


@_stage(
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
    """Staged M-row — WINBACK detection: per user, how many times they
    returned after ≥ 2 full dormant days (active-day gap ≥ {g}), with
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


analytics_winback_counts.__doc__ = analytics_winback_counts.__doc__.format(
    g=_WINBACK_GAP_DAYS
)


# ---------------------------------------------------------------------------
# ts_xcorr_lagged_terms — lagged cross-correlation terms (click→purchase)
# ---------------------------------------------------------------------------

_XCORR_MAX_LAG = 3


@_stage(
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
    """Staged M-row — LAGGED cross-correlation terms between the
    click and purchase hourly series: for each lead k = 0..{k}, the
    exact integer Pearson terms of (clicks at h−k, purchases at h) —
    M144's co-moment discipline extended along the lag axis, the
    "do clicks lead purchases, and by how many hours" probe.  Lag
    references are EQUI-joins on the integer hour key against the
    zero-filled observed-hour spine (never row-lags — the M203 gap
    rule; spine hours with no clicks/purchases are load-bearing
    zeros), restricted to hours where BOTH lagged positions lie on
    the spine.

    Scale: the scan collapses to two O(hours) series; the lag axis is
    a fixed ×{k1} explode on the probe side joined by hour (the M197
    move); terms combine map-side per lag.  The spine and both
    series derive from one events pass each and are referenced once
    per join side — the spine frame is checkpointed (three
    references: gx, gy, and its own distinct build).  At extreme
    scale the Σx² terms approach BIGINT range (hourly counts ~1e9
    square to 1e18); the activation-time escalation is the Gini
    DECIMAL(38,0)/HUGEINT wide-integer finale rule (CLAUDE.md)."""
    from tropology_spark.session import iter_materialize

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


ts_xcorr_lagged_terms.__doc__ = ts_xcorr_lagged_terms.__doc__.format(
    k=_XCORR_MAX_LAG, k1=_XCORR_MAX_LAG + 1
)


# ---------------------------------------------------------------------------
# mm_tiering_plan — chunk-store tier assignment from reference counts
# ---------------------------------------------------------------------------


def _tiering_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH man AS ({ORACLES['mm_chunk_manifest']}),
    r AS (
      SELECT chunk_md5,
             CAST(count(*) AS BIGINT) AS refs,
             CAST(max(chunk_bytes) AS BIGINT) AS chunk_bytes
      FROM man GROUP BY 1
    )
    SELECT chunk_md5, refs, chunk_bytes,
           CASE WHEN refs >= 3 THEN 'hot'
                WHEN refs = 2 THEN 'warm'
                ELSE 'cold' END AS tier,
           CAST((refs - 1) * chunk_bytes AS BIGINT) AS saved_bytes
    FROM r
    """


@_stage("mm_tiering_plan", oracle=_tiering_oracle())
def mm_tiering_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the STORAGE-TIERING plan of the content-
    addressed chunk store: per unique chunk digest, its reference
    count, size, tier assignment (hot ≥ 3 refs / warm = 2 / cold
    unique — the cache-placement decision M209's max_refcount summary
    hints at, materialized per chunk), and the bytes content-
    addressing saves on it.  Identical content implies identical
    size, so max(chunk_bytes) per digest is exact.

    Composed, not copied: the oracle wraps ORACLES['mm_chunk_
    manifest'] verbatim and the Spark side runs the REGISTERED M185
    query.  Scale: one map-side-combinable rollup on the 16-byte
    digest; payloads reduced to digests long before this runs (the
    multimodal family invariant)."""
    from tropology_spark.registry import QUERIES

    man = QUERIES["mm_chunk_manifest"](spark, sf_dir)
    r = man.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).cast("bigint").alias("refs"),
        F.max("chunk_bytes").cast("bigint").alias("chunk_bytes"),
    )
    return r.select(
        "chunk_md5",
        "refs",
        "chunk_bytes",
        F.when(F.col("refs") >= 3, "hot")
        .when(F.col("refs") == 2, "warm")
        .otherwise("cold")
        .alias("tier"),
        ((F.col("refs") - 1) * F.col("chunk_bytes"))
        .cast("bigint")
        .alias("saved_bytes"),
    )


# ---------------------------------------------------------------------------
# ts_open_orders_sweep — interval concurrency via the sweep line
# ---------------------------------------------------------------------------


@_stage(
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
    """Staged M-row — INTERVAL CONCURRENCY by sweep line: each order
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
# pipeline_dataset_diff — corpus version diff (added/removed/changed)
# ---------------------------------------------------------------------------


@_stage(
    "pipeline_dataset_diff",
    oracle="""
    WITH va AS (
      SELECT doc_id, md5(text) AS h, len(text) AS n_chars
      FROM documents WHERE doc_id % 17 <> 3
    ),
    vb AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 19 = 0 THEN text || ' zchanged'
                      ELSE text END) AS h,
             len(CASE WHEN doc_id % 19 = 0 THEN text || ' zchanged'
                      ELSE text END) AS n_chars
      FROM documents WHERE doc_id % 13 <> 5
    ),
    j AS (
      SELECT coalesce(va.doc_id, vb.doc_id) AS doc_id,
             CASE WHEN va.doc_id IS NULL THEN 'added'
                  WHEN vb.doc_id IS NULL THEN 'removed'
                  WHEN va.h <> vb.h THEN 'changed'
                  ELSE 'unchanged' END AS status,
             coalesce(vb.n_chars, va.n_chars) AS n_chars
      FROM va FULL OUTER JOIN vb ON va.doc_id = vb.doc_id
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM j GROUP BY status
    """,
)
def pipeline_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the DATASET-VERSION DIFF every corpus release
    pipeline publishes: added / removed / changed / unchanged document
    counts (+ character volume) between two versions, classified by a
    full outer join on doc_id with content-hash comparison — the
    data-versioning read-side of M49's CDC apply.  Versions are
    derived deterministically from the fixture (A drops doc_id%17=3,
    B drops %13=5 and edits %19=0) so both engines diff the same pair;
    a production caller passes two real snapshots.

    Scale: content reduces to md5 scan-side (the J1 move), so the
    full outer join shuffles 16-byte hashes + ids, never text; the
    classification is a projection and the rollup is 4 keys with
    map-side combine."""
    d = load(spark, sf_dir, "documents")
    va = d.filter(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        F.md5(F.col("text")).alias("h_a"),
        F.length("text").cast("bigint").alias("chars_a"),
    )
    btext = F.when(
        F.col("doc_id") % 19 == 0, F.concat(F.col("text"), F.lit(" zchanged"))
    ).otherwise(F.col("text"))
    vb = d.filter(F.col("doc_id") % 13 != 5).select(
        F.col("doc_id").alias("b_id"),
        F.md5(btext).alias("h_b"),
        F.length(btext).cast("bigint").alias("chars_b"),
    )
    j = va.join(vb, va.doc_id == vb.b_id, "full_outer").select(
        F.when(F.col("doc_id").isNull(), "added")
        .when(F.col("b_id").isNull(), "removed")
        .when(F.col("h_a") != F.col("h_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce(F.col("chars_b"), F.col("chars_a")).alias("n_chars"),
    )
    return j.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# join_session_overlap — concurrent-session pairs (interval-overlap join)
# ---------------------------------------------------------------------------

_OVL_BUCKET_US = 3_600_000_000  # 1-hour overlap-join buckets, exact µs


def _session_overlap_oracle() -> str:
    from tropology_spark.operators.timeseries import SESS_SPANS_SQL

    return (
        SESS_SPANS_SQL
        + f"""
    , b AS (
      SELECT user_id, sess_seq, start_us, end_us,
             unnest(generate_series(start_us // {_OVL_BUCKET_US},
                                    end_us // {_OVL_BUCKET_US})) AS bk
      FROM spans
    ),
    cand AS (
      SELECT DISTINCT a.user_id AS user_a, a.sess_seq AS seq_a,
                      c.user_id AS user_b, c.sess_seq AS seq_b
      FROM b a JOIN b c
        ON a.bk = c.bk AND a.user_id < c.user_id
       AND a.start_us <= c.end_us AND c.start_us <= a.end_us
    )
    SELECT user_a, user_b, CAST(count(*) AS BIGINT) AS n_overlaps
    FROM cand GROUP BY 1, 2
    ORDER BY n_overlaps DESC, user_a, user_b LIMIT 20
    """
    )


@_stage("join_session_overlap", oracle=_session_overlap_oracle())
def join_session_overlap(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the INTERVAL-OVERLAP JOIN, completing the
    temporal-join family (as-of C9/M131/M158/M217 answer "latest
    before", band M197 "all within a distance", this answers "which
    intervals were ACTIVE AT THE SAME TIME"): pairs of sessions from
    different users whose [start, end] spans intersect, rolled up to
    the top-20 most-concurrent user pairs — the co-presence relation
    behind fraud rings, shared-device detection and co-viewing.

    The rewrite is the M197 move on INTERVALS: each span explodes to
    the 1-hour buckets it covers, candidates meet in shared buckets
    (two overlapping intervals always share the bucket of the later
    start), the exact intersect predicate prunes, and DISTINCT
    collapses multi-bucket meetings — candidate cost is bounded by
    CONCURRENCY per bucket, never by corpus size, where the declared
    inequality join would be a quadratic nested loop.

    Composed, not copied: spans come from ``session_spans`` /
    ``SESS_SPANS_SQL`` — the M57 arithmetic's single home (refactored
    out of ts_sessionize for exactly this reuse).  The span frame
    feeds both join sides — checkpointed once (DOUBLE-REFERENCE
    RULE).  Span-to-bucket fan-out is bounded by session duration
    (gap-bounded sessions are short) — the generate_series is over
    per-row bucket ranges, identical in both engines."""
    from tropology_spark.operators.timeseries import session_spans
    from tropology_spark.session import iter_materialize

    spans = iter_materialize(session_spans(spark, sf_dir, events=events))
    b = spans.select(
        "user_id",
        "sess_seq",
        "start_us",
        "end_us",
        F.explode(
            F.expr(
                f"sequence(start_us div {_OVL_BUCKET_US},"
                f" end_us div {_OVL_BUCKET_US})"
            )
        ).alias("bk"),
    )
    a, c = b.alias("a"), b.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.bk") == F.col("c.bk"))
            & (F.col("a.user_id") < F.col("c.user_id"))
            & (F.col("a.start_us") <= F.col("c.end_us"))
            & (F.col("c.start_us") <= F.col("a.end_us")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.sess_seq").alias("seq_a"),
            F.col("c.user_id").alias("user_b"),
            F.col("c.sess_seq").alias("seq_b"),
        )
        .distinct()
    )
    return (
        cand.groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlaps"))
        .orderBy(F.desc("n_overlaps"), F.asc("user_a"), F.asc("user_b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# analytics_window_funnel — conversion window bound on the ordered funnel
# ---------------------------------------------------------------------------

_WF_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h conversion window, exact µs


def _window_funnel_oracle() -> str:
    from tropology_spark.operators.analytics import _FUNNEL_STEPS

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


@_stage("analytics_window_funnel", oracle=_window_funnel_oracle())
def analytics_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the WINDOWED funnel (ClickHouse's windowFunnel
    semantics): M51's ordered first-touch chain with a CONVERSION
    WINDOW — every later step must land within 24 h of the user's
    first step-1 event, the form campaign attribution actually uses
    (an unbounded funnel credits conversions months later).  Same
    first-touch/strictly-after rules as M51, same three-row output
    shape, so the two funnels diff directly into "conversions lost to
    the window".

    Scale: identical plan family to M51 — per-step per-user
    conditional mins joined on the user key; the window bound rides
    the existing join predicates, adding no shuffle.  All arithmetic
    on exact µs integers."""
    from tropology_spark.operators.analytics import _FUNNEL_STEPS

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
# text_lang_confusion — language-ID confusion matrix (model eval)
# ---------------------------------------------------------------------------


def _lang_confusion_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH pred AS ({ORACLES['text_langid_nb']}),
    c AS (
      SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT true_lang, pred_lang, n,
           CAST(sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS n_true,
           CAST((1000000 * n) //
                sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS share_ppm
    FROM c
    """


@_stage("text_lang_confusion", oracle=_lang_confusion_oracle())
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the CONFUSION MATRIX of the M3 language
    identifier against the stored labels: (true, predicted) counts
    with the per-true-language total and row share in ppm — the
    model-evaluation table every classifier in the pipeline needs
    (diagonal = per-language recall; off-diagonal = which languages
    the n-gram model confuses).  The repo's recall-audit discipline
    (sim_ann_recall et al.) applied to the TEXT family's model.

    Composed, not copied: the oracle wraps ORACLES['text_langid_nb']
    verbatim and the Spark side runs the registered M3 query.

    Scale: the expensive part is the classifier itself (already
    bounded — M3's n×L score join); the matrix is an L² rollup with
    map-side combine and an L-partitioned window.  ppm is positive-
    integer div (cross-engine exact)."""
    from tropology_spark.registry import QUERIES

    pred = QUERIES["text_langid_nb"](spark, sf_dir)
    c = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("true_lang")
    return c.select(
        "true_lang",
        "pred_lang",
        "n",
        F.sum("n").over(w).cast("bigint").alias("n_true"),
        F.expr("(1000000 * n) div (sum(n) OVER (PARTITION BY true_lang))")
        .cast("bigint")
        .alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# sim_recall_at_k_curve — recall@{1,3,5,10} of the IVF search
# ---------------------------------------------------------------------------

_RECALL_KS = (1, 3, 5, 10)


def _recall_curve_oracle() -> str:
    from tropology_spark.registry import ORACLES

    ks = ", ".join(str(k) for k in _RECALL_KS)
    return f"""
    WITH exact AS ({ORACLES['sim_topk_cosine']}),
    approx AS ({ORACLES['sim_ivf_topk']}),
    er AS (SELECT vec_id,
                  row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk
           FROM exact),
    ar AS (SELECT vec_id,
                  row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk
           FROM approx),
    ks AS (SELECT unnest([{ks}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(count(ar.vec_id) AS BIGINT) AS n_hits,
           CAST((1000000 * count(ar.vec_id)) // ks.k AS BIGINT) AS recall_ppm
    FROM ks
    LEFT JOIN er ON er.rk <= ks.k
    LEFT JOIN ar ON ar.vec_id = er.vec_id AND ar.rk <= ks.k
    GROUP BY ks.k
    """


@_stage("sim_recall_at_k_curve", oracle=_recall_curve_oracle())
def sim_recall_at_k_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the recall CURVE of the IVF search against the
    brute-force ground truth: recall@k for k in {1,3,5,10} — M112's
    single-number audit widened to the curve an index-tuning session
    actually reads (recall@1 tells you about the top hit, recall@10
    about the candidate pool; probes/cells are tuned to the k the
    product serves).  Hit = ground-truth rank ≤ k AND found by the
    index within its own top k.

    Composed, not copied: both lists are the REGISTERED queries /
    ORACLES verbatim; ranks derive from each list's own (cosine DESC,
    vec_id) order.  Scale: the retrievals dominate (already audited);
    the curve is arithmetic over two ≤10-row lists — every join here
    is broadcast-trivial, windows ride the pmod key."""
    from tropology_spark.registry import QUERIES

    exact = QUERIES["sim_topk_cosine"](spark, sf_dir)
    approx = QUERIES["sim_ivf_topk"](spark, sf_dir)
    ck = F.pmod(F.col("vec_id"), F.lit(1))
    rw = Window.partitionBy(ck).orderBy(F.desc("cosine"), F.asc("vec_id"))
    er = exact.select("vec_id", F.row_number().over(rw).alias("rk"))
    ar = approx.select(
        F.col("vec_id").alias("a_id"), F.row_number().over(rw).alias("a_rk")
    )
    ks = spark.createDataFrame([(k,) for k in _RECALL_KS], "k long")
    pairs = er.crossJoin(F.broadcast(ks)).filter(F.col("rk") <= F.col("k"))
    hits = pairs.join(
        F.broadcast(ar),
        (F.col("a_id") == F.col("vec_id")) & (F.col("a_rk") <= F.col("k")),
        "left",
    )
    return hits.groupBy("k").agg(
        F.count(F.col("a_id")).cast("bigint").alias("n_hits"),
        F.expr("(1000000 * count(a_id)) div k").cast("bigint").alias("recall_ppm"),
    ).select(F.col("k").cast("bigint").alias("k"), "n_hits", "recall_ppm")


# ---------------------------------------------------------------------------
# analytics_value_band_migration — spend-band transition matrix
# ---------------------------------------------------------------------------

_BAND_SPLIT_DATE = "1998-01-01"  # era boundary (order span is 1995..2001)


@_stage(
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
    """Staged M-row — customer SPEND-BAND MIGRATION between the two
    halves of the order history (split at {d}): each customer's total
    spend per era is banded low/mid/high on exact cents thresholds,
    and the (band_h1, band_h2) transition matrix counts who moved
    where — 'none' rows are the acquisition/churn margins (the full
    outer join IS the churn detector).  The economics twin of M96's
    event-type Markov matrix and the temporal complement of M157's
    static RFM segments.

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


analytics_value_band_migration.__doc__ = (
    analytics_value_band_migration.__doc__.format(d=_BAND_SPLIT_DATE)
)
