"""STAGED round-18 operators — implemented and parity-tested, NOT yet
registered (the round-8..17 staging pattern, eighth application).

The round-13 window executed and the round-14..17 slates are already
banked, so these bodies target ROUND 18.  Same (fn, oracle) contract
as the registry; activation is the mechanical move + five-fold
lockstep.  tests/test_staged_r18.py runs the driver-replica compare at
both verification scales, Python twins for the formula-bearing ops,
hypothesis property suites on the exact staged paths, the
partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- ts_leadlag_matrix — pairwise lead-lag matrix over the five event
  types: for every ordered type pair, the hour lag 0..6 maximizing
  the exact integer cross-correlation score (who leads whom — the
  causal-screening matrix M234 samples at one pair).
- analytics_permutation_rank — a deterministic 8-permutation test of
  the URGENT-vs-LOW mean gap: md5 relabelings, per-permutation gap,
  and the observed gap's rank among them — exact finite-sample
  inference with no distributional assumptions (the
  poisson-bootstrap discipline applied to hypothesis testing).
- text_source_tv_matrix — exact total-variation distance between
  every source pair's token distributions in ppm — the pairwise
  drift matrix (M94 ranks tokens within one source; this compares
  sources to each other).
- ts_seasonal_anova_terms — per (type, hour-of-day): the exact ANOVA
  terms n, Σc, Σc² and the cleared within-group scatter n·Σc² −
  (Σc)² — the seasonal-strength decomposition's integer inputs.
- graph_degree_quantiles — exact p50/p90/p99/max of both degree
  distributions via per-value counts + a cumulative window over the
  DEGREE axis (the M196 bounded-domain counting-quantile idiom; a
  degree histogram is always value-bounded) — the skew numbers that
  size every celebrity cap.
- analytics_qte_deciles — quantile treatment effects: per-variant
  decile boundaries of order value through the grouped two-pass
  global rank, joined into a 9-row decile-gap table (distributional
  A/B readouts, not just the mean).
- pipeline_kanon_curve — k-anonymity violations vs generalization
  width (acctbal bucket 1000/2000/4000 dollars): classes, below-k
  classes and rows at risk per width — at-risk rows NEST as buckets
  coarsen (merged classes only gain population), twin-pinned.
- join_session_overlap_duration — total overlapping MICROSECONDS per
  user pair over the M238 bucket-candidate machinery (M238 counts
  co-active session pairs; this measures co-active TIME).
- sim_label_scatter_terms — per-label within-cluster scatter carriers
  n·Σ|v|² − Σ_pos S_pos² in µ² (the ANOVA-on-embeddings terms behind
  Calinski-Harabasz; M148's cohesion is a rounded cosine — these are
  exact integers).
- analytics_ta_depth_curve — Fagin's Threshold Algorithm depth curve:
  at probe depths 1..512 (powers of two), the TA threshold from the
  two ranked attribute lists (spend, order count) and whether the
  top-5 already seen beats it — the classic top-k early-termination
  audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.session import iter_materialize
from tropology_spark.sources.tables import load

#: name -> (query_fn, oracle_sql); the registry contract, unregistered.
STAGED: dict = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# ts_leadlag_matrix — pairwise lead-lag matrix over event types
# ---------------------------------------------------------------------------

_LL_MAX_LAG = 6


@_stage(
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
    """Staged M-row — the pairwise LEAD-LAG matrix: for every ordered
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
# analytics_permutation_rank — deterministic permutation test of the mean gap
# ---------------------------------------------------------------------------

_PR_A = "1-URGENT"
_PR_B = "5-LOW"
_PR_PERMS = 8
_PR_BIG = 10**12  # gap shift constant — the r17 Lehr lesson: sized
# from the domain bound (cents < 10^8, so |1000*dnum| << BIG*na*nb)


@_stage(
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
             CAST((1000 * (CAST(s1a AS HUGEINT) * nb - CAST(s1b AS HUGEINT) * na)
                   + CAST({_PR_BIG} AS HUGEINT) * (na * nb))
                  // (na * nb) - {_PR_BIG} AS BIGINT) AS gap_milli
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
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged M-row — a deterministic PERMUTATION TEST of the
    URGENT-vs-LOW mean-value gap: 8 md5 relabelings of the order rows
    (perm j assigns variant by the first hex digit of
    md5(orderkey_j) — the poisson-bootstrap coin discipline) next to
    the observed labeling (perm 0), each with its exact shifted-floor
    mean gap in milli-cents, the absolute gap, and the ge_obs flag —
    #{{j : |gap_j| ≥ |gap_0|}} / (P+1) IS the exact finite-sample
    permutation p-value (numerator visible in the output, obs row
    included so the p-value is never 0 — the standard +1 correction).
    No distributional assumption, no transcendentals: this is the
    inference companion to analytics_lehr_sample_size (r17 slate) —
    Lehr sizes the test, this one runs it.

    Scale: the ×9 permutation axis rides an explode on the order rows
    (one scan), the per-perm rollup is map-side combinable, and the
    observed-gap attach is a pmod-free window over the 9-row axis
    keyed by the constant-partition idiom upstream (the 9-row frame's
    OVER () lives in the oracle; the Spark side uses the pmod window).
    Gap shift constant 10¹² — sized from the cents domain bound."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_PR_A, _PR_B)
    )
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
            f"CAST((1000 * (CAST(s1a AS DECIMAL(38,0)) * nb"
            f" - CAST(s1b AS DECIMAL(38,0)) * na)"
            f" + CAST({_PR_BIG} AS DECIMAL(38,0)) * (na * nb))"
            f" div (na * nb) - {_PR_BIG} AS BIGINT)"
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
# text_source_tv_matrix — pairwise total-variation drift matrix
# ---------------------------------------------------------------------------


@_stage(
    "text_source_tv_matrix",
    oracle="""
    WITH per AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents)
      GROUP BY source, token
    ),
    srcs AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM per
             GROUP BY source),
    vocab AS (SELECT DISTINCT token FROM per),
    z AS (
      SELECT srcs.source, srcs.nt, vocab.token, coalesce(per.n, 0) AS c
      FROM srcs CROSS JOIN vocab
      LEFT JOIN per ON per.source = srcs.source AND per.token = vocab.token
    ),
    pair AS (
      SELECT a.source AS src_a, b.source AS src_b,
             any_value(a.nt) AS na, any_value(b.nt) AS nb,
             sum(abs(CAST(a.c AS HUGEINT) * b.nt
                     - CAST(b.c AS HUGEINT) * a.nt)) AS sad
      FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, CAST(na AS BIGINT) AS n_tokens_a,
           CAST(nb AS BIGINT) AS n_tokens_b,
           CAST((1000000 * sad) // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT)
             AS tv_ppm
    FROM pair
    """,
)
def text_source_tv_matrix(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the pairwise TOTAL-VARIATION drift matrix: for
    every source pair, TV(p, q) = ½·Σ_tokens |p_t − q_t| over the
    unigram distributions, as the exact rational
    (10⁶·Σ|c_a·N_b − c_b·N_a|) div (2·N_a·N_b) — the
    distribution-distance every ingest monitor wants between corpus
    slices, with no logarithms (KL/JS are transcendental; TV is the
    exact member of the divergence family, and bounds JS via
    Pinsker's cousin).  M94 ranks over-represented tokens WITHIN a
    source; this compares sources TO EACH OTHER — 190 numbers that
    say which ingest streams are interchangeable.

    The zero-filled (source × vocab) long frame feeds both pair sides
    — DOUBLE-REFERENCE RULE.  Scale: the corpus collapses to the
    (source, token) counts once; the pair stage is bounded by
    |sources|² · |vocab| — source counts are curated-small, and a
    100 TB deployment caps the vocab axis exactly like the 4096
    oracle-enumeration discipline caps positions.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    per = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    srcs = per.groupBy("source").agg(F.sum("n").cast("bigint").alias("nt"))
    vocab = per.select("token").distinct()
    z = iter_materialize(  # both pair sides — DOUBLE-REFERENCE RULE
        srcs.crossJoin(vocab)
        .join(per, ["source", "token"], "left")
        .select(
            "source", "nt", "token", F.coalesce(F.col("n"), F.lit(0)).alias("c")
        )
    )
    a = z.select(
        F.col("source").alias("src_a"),
        F.col("nt").alias("na"),
        "token",
        F.col("c").alias("ca"),
    )
    b = z.select(
        F.col("source").alias("src_b"),
        F.col("nt").alias("nb"),
        F.col("token").alias("tb"),
        F.col("c").alias("cb"),
    )
    pair = (
        a.join(b, (F.col("token") == F.col("tb")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
            F.sum(
                F.abs(
                    F.expr("CAST(ca AS DECIMAL(38,0)) * nb")
                    - F.expr("CAST(cb AS DECIMAL(38,0)) * na")
                )
            ).alias("sad"),
        )
    )
    return pair.select(
        "src_a",
        "src_b",
        F.col("na").cast("bigint").alias("n_tokens_a"),
        F.col("nb").cast("bigint").alias("n_tokens_b"),
        F.expr(
            "CAST((1000000 * sad) div (2 * CAST(na AS DECIMAL(38,0)) * nb)"
            " AS BIGINT)"
        ).alias("tv_ppm"),
    )


# ---------------------------------------------------------------------------
# ts_seasonal_anova_terms — hour-of-day ANOVA decomposition terms
# ---------------------------------------------------------------------------


@_stage(
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
    """Staged M-row — the seasonal ANOVA decomposition's integer
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

    Scale: two nested map-side rollups (events → hourly counts →
    24-row-per-type terms); no joins, no windows."""
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
        (
            F.count(F.lit(1)) * F.sum(F.col("c") * F.col("c"))
            - F.sum("c") * F.sum("c")
        )
        .cast("bigint")
        .alias("within_num"),
    )


# ---------------------------------------------------------------------------
# graph_degree_quantiles — exact degree-distribution quantiles per side
# ---------------------------------------------------------------------------


def _degree_quantiles_oracle() -> str:
    from tropology_spark.operators.graph import _EDGES_CTE

    return (
        _EDGES_CTE
        + """
    , deg AS (
      SELECT 'customer' AS side, src AS node, CAST(count(*) AS BIGINT) AS d
      FROM edges GROUP BY src
      UNION ALL
      SELECT 'part', dst, CAST(count(*) AS BIGINT) FROM edges GROUP BY dst
    ),
    vc AS (SELECT side, d, CAST(count(*) AS BIGINT) AS cnt
           FROM deg GROUP BY side, d),
    cum AS (
      SELECT side, d, cnt,
             CAST(sum(cnt) OVER (PARTITION BY side ORDER BY d) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER (PARTITION BY side) AS BIGINT) AS n
      FROM vc
    )
    SELECT side, CAST(any_value(n) AS BIGINT) AS n_nodes,
           CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS BIGINT)
             AS p50,
           CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN d END) AS BIGINT)
             AS p90,
           CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN d END)
                AS BIGINT) AS p99,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM cum GROUP BY side
    """
    )


@_stage("graph_degree_quantiles", oracle=_degree_quantiles_oracle())
def graph_degree_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — exact p50/p90/p99/max of BOTH degree
    distributions (customer out-degree, part in-degree) — the skew
    summary that sizes every celebrity-capping decision (the
    _HUB_CAP = 32 constant, the copair caps, the salting thresholds
    all price against exactly these numbers; M114 ships the full
    histogram, this ships the four planning points).

    The M196 bounded-domain counting-quantile idiom on the DEGREE
    axis: per-(side, degree) counts + ONE cumulative window over the
    value axis (real side key), then rank-threshold picks p50 =
    value at ceil(n/2), p90 at ceil(0.9n), p99 at ceil(0.99n) — never
    a corpus sort; a degree histogram is value-bounded by max-degree
    regardless of node count.  Composed: the edge set is the
    registered I1 single home (Spark: graph.edges; oracle:
    _EDGES_CTE)."""
    from tropology_spark.operators.graph import edges

    e = edges(spark, sf_dir)
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .select(F.lit("customer").alias("side"), "d")
        .unionByName(
            e.groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
            .select(F.lit("part").alias("side"), "d")
        )
    )
    vc = deg.groupBy("side", "d").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    ws = Window.partitionBy("side")
    cum = vc.select(
        "side",
        "d",
        F.sum("cnt").over(ws.orderBy("d")).cast("bigint").alias("cum"),
        F.sum("cnt").over(ws).cast("bigint").alias("n"),
    )
    return cum.groupBy("side").agg(
        F.first("n").cast("bigint").alias("n_nodes"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("d")))
        .cast("bigint")
        .alias("p50"),
        F.min(F.when(F.col("cum") >= F.expr("(9 * n + 9) div 10"), F.col("d")))
        .cast("bigint")
        .alias("p90"),
        F.min(F.when(F.col("cum") >= F.expr("(99 * n + 99) div 100"), F.col("d")))
        .cast("bigint")
        .alias("p99"),
        F.max("d").cast("bigint").alias("max_degree"),
    )


# ---------------------------------------------------------------------------
# analytics_qte_deciles — quantile treatment effects via grouped global rank
# ---------------------------------------------------------------------------


@_stage(
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
    """Staged M-row — QUANTILE TREATMENT EFFECTS: the nine decile
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
    from tropology_spark.plans.global_order import global_row_number

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
# pipeline_kanon_curve — k-anonymity risk vs generalization width
# ---------------------------------------------------------------------------

_KC_WIDTHS = (100_000, 200_000, 400_000)  # acctbal bucket widths, cents
_KC_SHIFT = 10_000_000  # acctbal >= -$1000; multiple of every width,
# so the +shift keeps buckets NESTING across widths AND makes the
# numerator non-negative (div//floor trap on negative balances)
_KC_K = 5


@_stage(
    "pipeline_kanon_curve",
    oracle=f"""
    WITH b AS (
      SELECT w.w, c_nationkey AS nat,
             (CAST(round(c_acctbal * 100) AS BIGINT) + {_KC_SHIFT}) // w.w
               AS bucket
      FROM customer,
           (SELECT unnest([{", ".join(str(w) for w in _KC_WIDTHS)}]) AS w) w
    ),
    cls AS (
      SELECT w, nat, bucket, CAST(count(*) AS BIGINT) AS n_rows
      FROM b GROUP BY 1, 2, 3
    )
    SELECT CAST(w AS BIGINT) AS width_cents,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN n_rows < {_KC_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k,
           CAST(sum(CASE WHEN n_rows < {_KC_K} THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
           CAST((1000000 * sum(CASE WHEN n_rows < {_KC_K} THEN n_rows
                                    ELSE 0 END)) // sum(n_rows) AS BIGINT)
             AS risk_ppm
    FROM cls GROUP BY w
    """,
)
def pipeline_kanon_curve(
    spark: SparkSession, sf_dir: str, customers: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the K-ANONYMITY GENERALIZATION curve: re-run the
    M115 below-k audit at account-balance bucket widths $1000 / $2000
    / $4000 over the QI (nationkey, balance bucket) and report classes,
    below-k classes and ROWS AT RISK per width — the
    generalization-vs-utility trade every privacy release tunes (M115
    audits ONE fixed QI; this prices the knob).  The at-risk row sets
    NEST as buckets coarsen — a merged class only gains population, so
    a below-k class at width 4W implies every constituent W-class was
    below k (twin-pinned containment); the +shift constant is a
    multiple of every width, preserving the nesting AND keeping the
    bucket numerator non-negative (balances go to −$1000: the
    div//floor trap).

    Scale: one scan; the ×3 width axis explodes the customer rows;
    class rollups are map-side combinable.

    ``customers=`` substitutes the customer frame for probes; the
    driver contract never passes it."""
    c = customers if customers is not None else load(spark, sf_dir, "customer")
    b = c.select(
        F.col("c_nationkey").alias("nat"),
        (F.round(F.col("c_acctbal") * 100).cast("bigint") + _KC_SHIFT).alias(
            "cents_sh"
        ),
        F.explode(F.array(*[F.lit(w) for w in _KC_WIDTHS])).alias("w"),
    ).select("w", "nat", F.expr("cents_sh div w").alias("bucket"))
    cls = b.groupBy("w", "nat", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    return cls.groupBy(F.col("w").cast("bigint").alias("width_cents")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("n_rows") < _KC_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_below_k"),
        F.sum(F.when(F.col("n_rows") < _KC_K, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.expr(
            f"CAST((1000000 * sum(CASE WHEN n_rows < {_KC_K} THEN n_rows"
            f" ELSE 0 END)) div sum(n_rows) AS BIGINT)"
        ).alias("risk_ppm"),
    )


# ---------------------------------------------------------------------------
# join_session_overlap_duration — co-active TIME per user pair
# ---------------------------------------------------------------------------

_OVD_BUCKET_US = 3_600_000_000  # the M238 1-hour candidate buckets


def _overlap_duration_oracle() -> str:
    from tropology_spark.operators.timeseries import SESS_SPANS_SQL

    return (
        SESS_SPANS_SQL
        + f"""
    , b AS (
      SELECT user_id, sess_seq, start_us, end_us,
             unnest(generate_series(start_us // {_OVD_BUCKET_US},
                                    end_us // {_OVD_BUCKET_US})) AS bk
      FROM spans
    ),
    cand AS (
      SELECT DISTINCT a.user_id AS user_a, a.sess_seq AS seq_a,
                      c.user_id AS user_b, c.sess_seq AS seq_b,
                      least(a.end_us, c.end_us)
                        - greatest(a.start_us, c.start_us) AS ovl_us
      FROM b a JOIN b c
        ON a.bk = c.bk AND a.user_id < c.user_id
       AND a.start_us <= c.end_us AND c.start_us <= a.end_us
    )
    SELECT user_a, user_b, CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(ovl_us) AS BIGINT) AS total_ovl_us
    FROM cand GROUP BY 1, 2
    ORDER BY total_ovl_us DESC, user_a, user_b LIMIT 20
    """
    )


@_stage("join_session_overlap_duration", oracle=_overlap_duration_oracle())
def join_session_overlap_duration(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — co-active TIME per user pair: the M238 interval
    join re-aggregated over exact overlap MICROSECONDS
    (least(end) − greatest(start), non-negative under the intersect
    predicate), top-20 pairs by total co-active time — M238 counts
    co-active session PAIRS; duration is the fraud/shared-device
    signal that a thousand one-microsecond touches cannot fake.

    Composed, not copied: spans from the session_spans /
    SESS_SPANS_SQL single home; the SAME 1-hour bucket candidate
    machinery (two overlapping intervals share the later start's
    bucket; DISTINCT collapses multi-bucket meetings, the overlap
    length riding the candidate row as a derived column).  Scale: the
    span frame is checkpointed once (both join sides), candidate cost
    bounded by per-bucket concurrency.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    from tropology_spark.operators.timeseries import session_spans

    spans = iter_materialize(session_spans(spark, sf_dir, events=events))
    b = spans.select(
        "user_id",
        "sess_seq",
        "start_us",
        "end_us",
        F.explode(
            F.expr(
                f"sequence(start_us div {_OVD_BUCKET_US},"
                f" end_us div {_OVD_BUCKET_US})"
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
            (
                F.least(F.col("a.end_us"), F.col("c.end_us"))
                - F.greatest(F.col("a.start_us"), F.col("c.start_us"))
            ).alias("ovl_us"),
        )
        .distinct()
    )
    return (
        cand.groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
            F.sum("ovl_us").cast("bigint").alias("total_ovl_us"),
        )
        .orderBy(F.desc("total_ovl_us"), F.asc("user_a"), F.asc("user_b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# sim_label_scatter_terms — exact within-label scatter carriers
# ---------------------------------------------------------------------------


def _label_scatter_oracle() -> str:
    from tropology_spark.operators.similarity import _EX_CTE

    return (
        _EX_CTE
        + """,
    exm AS (
      SELECT vec_id, label, pos, CAST(round(val * 1000000) AS BIGINT) AS vm
      FROM ex
    ),
    pp AS (
      SELECT label, pos, CAST(sum(vm) AS BIGINT) AS s_pos,
             CAST(sum(vm * vm) AS BIGINT) AS ssq_pos,
             CAST(count(*) AS BIGINT) AS cnt_pos
      FROM exm GROUP BY label, pos
    ),
    t AS (
      SELECT label,
             CAST(sum(cnt_pos) // 64 AS BIGINT) AS n,
             CAST(sum(ssq_pos) AS HUGEINT) AS ssq,
             sum(CAST(s_pos AS HUGEINT) * s_pos) AS s2
      FROM pp GROUP BY label
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n_vecs,
           CAST(ssq AS BIGINT) AS ssq_u2,
           CAST(s2 AS BIGINT) AS s2_u2,
           CAST(n * ssq - s2 AS BIGINT) AS within_num,
           CAST(ssq // n AS BIGINT) AS mean_norm2_u2
    FROM t
    """
    )


@_stage("sim_label_scatter_terms", oracle=_label_scatter_oracle())
def sim_label_scatter_terms(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — exact WITHIN-LABEL scatter carriers per label:
    n·Σ|v|² − |Σv|² ≡ n²·Var-like scatter in µ² (the Gram identity
    per group — the r16 anisotropy machinery partitioned by label),
    plus the raw Σ|v|² and |Σv|² terms and the mean norm² — the
    integer inputs of Calinski-Harabasz / silhouette-style cluster
    quality (M148's cohesion is a ROUNDED cosine to the centroid;
    these are exact integers that survive the hash gate, the *_terms
    discipline).  within_num ≥ 0 by Cauchy-Schwarz — twin-pinned.

    Headroom: |Σv|² per (label, pos) is (Σvm)² ≤ (n·10⁶)² only if
    every member saturates a component; unit-norm embeddings bound
    typical |vm| at ~10⁶/√64, and the HUGEINT/DECIMAL(38,0) carriers
    hold to n ~ 10¹⁰ per label regardless.  Scale: one scan to the
    (label, pos) partials — map-side combinable, zero joins.

    ``e=`` substitutes the embedding frame for probes; the driver
    contract never passes it."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    exm = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos0", "val"),
    ).select(
        "label",
        F.round(F.col("val").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("vm"),
        (F.col("pos0") + 1).alias("pos"),
    )
    pp = exm.groupBy("label", "pos").agg(
        F.sum("vm").cast("bigint").alias("s_pos"),
        F.sum(F.col("vm") * F.col("vm")).cast("bigint").alias("ssq_pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt_pos"),
    )
    t = pp.groupBy("label").agg(
        F.expr("sum(cnt_pos) div 64").cast("bigint").alias("n"),
        F.sum("ssq_pos").cast("decimal(38,0)").alias("ssq"),
        F.sum(F.expr("CAST(s_pos AS DECIMAL(38,0)) * s_pos")).alias("s2"),
    )
    return t.select(
        F.col("label").cast("bigint").alias("label"),
        F.col("n").alias("n_vecs"),
        F.col("ssq").cast("bigint").alias("ssq_u2"),
        F.col("s2").cast("bigint").alias("s2_u2"),
        F.expr("CAST(n * ssq - s2 AS BIGINT)").alias("within_num"),
        F.expr("CAST(ssq div n AS BIGINT)").alias("mean_norm2_u2"),
    )


# ---------------------------------------------------------------------------
# analytics_ta_depth_curve — Fagin Threshold-Algorithm early-stop audit
# ---------------------------------------------------------------------------

_TA_K = 5
_TA_W = 100_000  # cents weight per order in the monotone combined score
_TA_DEPTHS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


@_stage(
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
    """Staged M-row — FAGIN'S THRESHOLD ALGORITHM depth curve: two
    ranked attribute lists over customers (total spend in cents;
    order count weighted $1000 each — a fixed monotone linear score),
    and at probe depths 1..512 (powers of two) the TA threshold
    T(p) = x_value@p + w·y_value@p next to the k=5-th best COMBINED
    score among customers already SEEN (entered at min(rank_x,
    rank_y) ≤ p) — stopped = 1 once the k-th seen score meets the
    threshold, the classic top-k early-termination certificate.  The
    depth where `stopped` flips is how much of each ranked list a
    rank-aware engine must actually read — the audit behind every
    "don't scan the whole index for top-k" plan.

    Exactness: all-integer scores and thresholds; unique tie-breaks
    by custkey everywhere.  Scale: both global ranks ride the
    two-pass range-partitioned rank; the per-depth membership is an
    EXPLODE of each row to its eligible grid depths (a filtered
    literal array — no inequality join, no BNLJ); per-depth windows
    key on the real depth column.  Σ eligible rows ≤ 2·Σ grid depths
    — bounded by the grid, not the corpus."""
    from tropology_spark.plans.global_order import global_row_number

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
