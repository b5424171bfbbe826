"""STAGED round-14 operators — implemented and parity-tested, NOT yet
registered (the staging pattern's sixth application).

The round-12 and round-13 windows are already fully budgeted by the
staged_r12/staged_r13 slates plus the r05/r06 freshness queues
(CLAUDE.md), so these bodies target ROUND 14.  Same (fn, oracle)
contract as the registry; activation is the mechanical move +
five-fold lockstep.  tests/test_staged_r14.py runs the driver-replica
compare at both verification scales, Python twins, the
partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- agg_exp_decay_counts — exponentially time-decayed activity with an
  exact DYADIC decay carrier (x4096 div 2^age_days) — the
  freshness-weighted popularity signal, map-side mergeable.
- text_burstiness_terms — per-token Fano-factor terms (n_days, Σc,
  Σc²) over the zero-filled daily axis for the corpus' top tokens —
  the burst detector's exact inputs.
- pipeline_cascade_marginals — the dedup CASCADE economics: marginal
  flags per stage under the fixed exact→minhash→simhash→ngram order
  (composes the four registered flag sets; M269's Venn tells WHICH
  methods overlap, this tells what each stage still CONTRIBUTES).
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
# agg_exp_decay_counts — dyadic exponentially-decayed activity
# ---------------------------------------------------------------------------

#: Half-life = 7 days; the decay weight is the exact dyadic rational
#: 4096 div 2^(age_days div 7), zero past 12 half-lives (2^12 = 4096).
_DECAY_SCALE = 4096
_DECAY_HL_DAYS = 7


@_stage(
    "agg_exp_decay_counts",
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    mx AS (SELECT CAST(max(day) AS BIGINT) AS dmax FROM e),
    w AS (
      SELECT event_type,
             CASE WHEN (mx.dmax - day) // {_DECAY_HL_DAYS} >= 12 THEN 0
                  ELSE {_DECAY_SCALE}
                       // (1 << CAST((mx.dmax - day) // {_DECAY_HL_DAYS}
                                     AS INTEGER))
             END AS wt
      FROM e CROSS JOIN mx
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(wt) AS BIGINT) AS decayed_x4096,
           CAST(sum(wt) // count(*) AS BIGINT) AS mean_weight_x4096
    FROM w GROUP BY event_type
    """,
)
def agg_exp_decay_counts(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — exponentially TIME-DECAYED activity per event
    type: each event contributes the exact dyadic weight
    4096 div 2^(age_in_half_lives) (half-life 7 days, age measured
    from the corpus' max day — data-derived, regeneration-robust;
    weights past 12 half-lives are exactly 0) — the freshness-weighted
    popularity signal every trending/ranking surface maintains, with
    the decay carried as an INTEGER dyadic rational instead of the
    usual float exp() (the M58/M230 dyadic-taps discipline applied to
    the aggregation family).  Emitted: raw count, the ×4096 decayed
    mass, and the mean weight — a consumer divides by 4096 exactly.

    Scale: the decayed sum is a plain map-side-combinable SUM (each
    row's weight depends only on its own age) — the property that
    makes dyadic decay deployable where exp() scores would need a
    re-normalization pass; one shuffle on the type key.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e0 = events if events is not None else load(spark, sf_dir, "events")
    e = e0.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
    )
    w = Window.partitionBy(F.pmod(F.col("day"), F.lit(1)))
    x = e.select(
        "event_type",
        "day",
        F.max("day").over(w).cast("bigint").alias("dmax"),
    ).select(
        "event_type",
        F.expr(
            f"CASE WHEN (dmax - day) div {_DECAY_HL_DAYS} >= 12 THEN 0"
            f" ELSE {_DECAY_SCALE} div shiftleft(1L,"
            f" CAST((dmax - day) div {_DECAY_HL_DAYS} AS INT)) END"
        )
        .cast("bigint")
        .alias("wt"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("wt").cast("bigint").alias("decayed_x4096"),
    ).select(
        "event_type",
        "n_events",
        "decayed_x4096",
        F.expr("decayed_x4096 div n_events")
        .cast("bigint")
        .alias("mean_weight_x4096"),
    )


# ---------------------------------------------------------------------------
# text_burstiness_terms — per-token Fano-factor terms on the daily axis
# ---------------------------------------------------------------------------

_BURST_TOPK = 30


@_stage(
    "text_burstiness_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 29 AS day, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    t AS (SELECT day, token FROM tok WHERE token <> ''),
    tot AS (SELECT token, CAST(count(*) AS BIGINT) AS total
            FROM t GROUP BY token),
    top AS (SELECT token, total FROM (
              SELECT token, total,
                     row_number() OVER (ORDER BY total DESC, token) AS rk
              FROM tot) x WHERE rk <= {_BURST_TOPK}),
    dc AS (SELECT t.token, t.day, CAST(count(*) AS BIGINT) AS c
           FROM t JOIN top ON t.token = top.token
           GROUP BY t.token, t.day),
    terms AS (
      SELECT token,
             CAST(count(*) AS BIGINT) AS n_active_days,
             CAST(sum(c) AS BIGINT) AS sum_c,
             CAST(sum(c * c) AS BIGINT) AS sum_c2
      FROM dc GROUP BY token
    )
    SELECT terms.token, top.total, terms.n_active_days,
           terms.sum_c2,
           CAST(29 * terms.sum_c2 - top.total * top.total AS BIGINT)
             AS var_num_x29
    FROM terms JOIN top ON terms.token = top.token
    """,
)
def text_burstiness_terms(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — token BURSTINESS terms: for the corpus' top-{k}
    tokens, the exact inputs of the Fano factor (variance-to-mean of
    per-day counts over the FULL 29-day axis, zero-filled days
    included): total count, active-day count, Σc² and the assembled
    population-variance numerator 29·Σc² − total² (σ²·29² = that; the
    day axis is the deterministic doc_id % 29 spread — documents carry
    no timestamp, so the fixture's ingestion-day proxy is the id
    residue, the M26-style deterministic assignment).  A bursty token
    (template spam, event-driven vocab) has var ≫ mean; a uniform
    token has var ≈ mean — the signal a drift monitor thresholds,
    emitted as integers (*_terms discipline; absent days contribute
    exactly via the algebra — no domain-completion join, the
    mm_payload_uniformity trick on the time axis).

    Scale: tokenize once; the top-k cut bounds everything downstream
    (the per-(token, day) rollup joins a {k}-row broadcast); the rank
    rides a pmod-constant-key window over the bounded token-total
    axis.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    t = d.select(
        (F.col("doc_id") % 29).alias("day"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tot = t.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    top = (
        tot.orderBy(F.desc("total"), F.asc("token"))
        .limit(_BURST_TOPK)
    )
    dc = (
        t.join(F.broadcast(top.select("token")), "token")
        .groupBy("token", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    terms = dc.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_days"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    return terms.join(F.broadcast(top), "token").select(
        "token",
        "total",
        "n_active_days",
        "sum_c2",
        (29 * F.col("sum_c2") - F.col("total") * F.col("total"))
        .cast("bigint")
        .alias("var_num_x29"),
    )


# ---------------------------------------------------------------------------
# pipeline_cascade_marginals — dedup cascade marginal contributions
# ---------------------------------------------------------------------------

_CASCADE = ("exact", "minhash", "simhash", "ngram")


def _cascade_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return """
    WITH ex AS ({ex}),
    mh AS ({mh}),
    sh AS ({sh}),
    ng AS ({ng}),
    flags AS (
      SELECT 1 AS stage, d.doc_id
      FROM documents d JOIN ex
        ON md5(d.text) = ex.text_hash AND d.doc_id > ex.keep_doc_id
      UNION ALL SELECT 2, doc_b FROM mh
      UNION ALL SELECT 3, doc_b FROM sh
      UNION ALL SELECT 4, doc_b FROM ng
    ),
    first_stage AS (
      SELECT doc_id, CAST(min(stage) AS BIGINT) AS stage
      FROM flags GROUP BY doc_id
    ),
    axis AS (SELECT unnest(generate_series(1, 4)) AS stage),
    per AS (
      SELECT axis.stage,
             CAST(coalesce(f.n_flagged, 0) AS BIGINT) AS n_flagged,
             CAST(coalesce(m.n_marginal, 0) AS BIGINT) AS n_marginal
      FROM axis
      LEFT JOIN (SELECT stage, count(DISTINCT doc_id) AS n_flagged
                 FROM flags GROUP BY stage) f ON axis.stage = f.stage
      LEFT JOIN (SELECT stage, count(*) AS n_marginal
                 FROM first_stage GROUP BY stage) m ON axis.stage = m.stage
    )
    SELECT CAST(stage AS BIGINT) AS stage,
           CASE stage WHEN 1 THEN 'exact' WHEN 2 THEN 'minhash'
                      WHEN 3 THEN 'simhash' ELSE 'ngram' END AS method,
           n_flagged, n_marginal,
           CAST(sum(n_marginal) OVER (ORDER BY stage) AS BIGINT)
             AS cum_removed
    FROM per
    """.format(
        ex=ORACLES["dedup_exact"],
        mh=ORACLES["dedup_minhash_lsh"],
        sh=ORACLES["dedup_simhash"],
        ng=ORACLES["dedup_ngram_jaccard"],
    )


@_stage("pipeline_cascade_marginals", oracle=_cascade_oracle())
def pipeline_cascade_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the dedup CASCADE economics under the production
    order exact → MinHash → SimHash → n-gram: per stage, the raw flag
    count AND the MARGINAL contribution (docs first flagged at that
    stage — what the stage still removes AFTER everything cheaper ran)
    plus the cumulative removal — the table that justifies (or kills)
    each stage of a 100 TB dedup budget.  M269's Venn says which
    methods OVERLAP; the cascade view is order-aware: a method with
    large flags but zero marginal is pure cost.  All four stage rows
    are ALWAYS emitted (LEFT joins from the stage axis — the
    threshold-curve rule; at sf0.001 the fixture has no exact dups
    and stage 1 legitimately reads 0/0).

    Composed, not copied: all four flag sets come from the REGISTERED
    pipelines — QUERIES on the Spark side (sharing the session's band
    and signature caches), ORACLES verbatim on the DuckDB side (the
    M269/dedup_lsh_recall rule); drop-side convention identical to
    M269 (larger id of a pair; non-representative copies for exact).
    Scale: every underlying method is banded/blocked; the overlay
    adds one union + a doc-keyed min-stage rollup + a 4-row window."""
    from tropology_spark.registry import QUERIES

    docs = load(spark, sf_dir, "documents")
    ex = QUERIES["dedup_exact"](spark, sf_dir)
    flagged = docs.join(
        ex,
        (F.md5(F.col("text")) == F.col("text_hash"))
        & (F.col("doc_id") > F.col("keep_doc_id")),
    ).select(F.lit(1).alias("stage"), "doc_id")
    for stage, qname in (
        (2, "dedup_minhash_lsh"),
        (3, "dedup_simhash"),
        (4, "dedup_ngram_jaccard"),
    ):
        flagged = flagged.unionAll(
            QUERIES[qname](spark, sf_dir).select(
                F.lit(stage).alias("stage"), F.col("doc_b").alias("doc_id")
            )
        )
    from tropology_spark.session import iter_materialize

    flagged = iter_materialize(
        flagged.distinct()
    )  # referenced by the per-stage count AND the min-stage rollup
    per_stage = flagged.groupBy("stage").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_flagged")
    )
    first = flagged.groupBy("doc_id").agg(
        F.min("stage").cast("bigint").alias("stage")
    )
    marg = first.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_marginal")
    )
    axis = spark.range(1, len(_CASCADE) + 1).select(
        F.col("id").cast("int").alias("stage")
    )
    w = (
        Window.partitionBy(F.pmod(F.col("stage"), F.lit(1)))
        .orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    method = (
        F.when(F.col("stage") == 1, "exact")
        .when(F.col("stage") == 2, "minhash")
        .when(F.col("stage") == 3, "simhash")
        .otherwise("ngram")
    )
    return (
        axis.join(per_stage, "stage", "left")
        .join(marg, "stage", "left")
        .withColumn("n_flagged", F.coalesce(F.col("n_flagged"), F.lit(0)))
        .withColumn("n_marginal", F.coalesce(F.col("n_marginal"), F.lit(0)))
        .select(
            F.col("stage").cast("bigint").alias("stage"),
            method.alias("method"),
            F.col("n_flagged").cast("bigint").alias("n_flagged"),
            F.col("n_marginal").cast("bigint").alias("n_marginal"),
            F.sum("n_marginal").over(w).cast("bigint").alias("cum_removed"),
        )
    )


# ---------------------------------------------------------------------------
# ts_hurst_rs_terms — rescaled-range (R/S) terms over dyadic window scales
# ---------------------------------------------------------------------------

_HURST_WS = (8, 16)


@_stage(
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
      WHERE z.h - z.h0 < ws.w * ((z.hmax - z.h0 + 1) // ws.w)
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
    """Staged M-row — RESCALED-RANGE (Hurst R/S) terms at the dyadic
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
    keys; everything after is map-side combinable.

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
            < F.col("w") * F.expr("(hmax - h0 + 1) div w")
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


@_stage("analytics_srm_audit", oracle=_SRM_ORACLE)
def analytics_srm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the md5 hash split, per
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
# agg_bloom_fpr_curve — Bloom false-positive rate vs bits-per-key
# ---------------------------------------------------------------------------

_BLOOM_BPKS = (8, 16, 32)

_BLOOM_FPR_ORACLE = f"""
    WITH mem AS (SELECT DISTINCT o_custkey AS k FROM orders),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM mem),
    cfg AS (SELECT CAST(unnest([{", ".join(str(b) for b in _BLOOM_BPKS)}]) AS BIGINT) AS bpk),
    mh AS (SELECT k,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h1,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS h2
           FROM mem),
    bits AS (
      SELECT DISTINCT cfg.bpk,
             (mh.h1 + j.j * mh.h2) % (cfg.bpk * nm.n_members) AS pos
      FROM mh CROSS JOIN nm CROSS JOIN cfg, unnest([0, 1]) AS j(j)
    ),
    nonm AS (SELECT c_custkey + 1000000000 AS k FROM customer),
    ph AS (SELECT k,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h1,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS h2
           FROM nonm),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nonmembers FROM nonm),
    pp AS (
      SELECT cfg.bpk, ph.k,
             (ph.h1 + j.j * ph.h2) % (cfg.bpk * nm.n_members) AS pos
      FROM ph CROSS JOIN nm CROSS JOIN cfg, unnest([0, 1]) AS j(j)
    ),
    hit AS (SELECT pp.bpk, pp.k, CAST(count(*) AS BIGINT) AS n_hit
            FROM pp JOIN bits ON pp.bpk = bits.bpk AND pp.pos = bits.pos
            GROUP BY pp.bpk, pp.k),
    fp AS (SELECT bpk, CAST(count(*) AS BIGINT) AS n_fp
           FROM hit WHERE n_hit = 2 GROUP BY bpk)
    SELECT cfg.bpk AS bits_per_key, nm.n_members, tot.n_nonmembers,
           CAST(coalesce(fp.n_fp, 0) AS BIGINT) AS n_fp,
           CAST((1000000 * coalesce(fp.n_fp, 0)) // tot.n_nonmembers
                AS BIGINT) AS fpr_ppm
    FROM cfg LEFT JOIN fp ON cfg.bpk = fp.bpk
    CROSS JOIN nm CROSS JOIN tot
"""


@_stage("agg_bloom_fpr_curve", oracle=_BLOOM_FPR_ORACLE)
def agg_bloom_fpr_curve(
    spark: SparkSession,
    sf_dir: str,
    mem: DataFrame | None = None,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Bloom-filter false-positive-rate curve vs bits-per-key — the
    SIZING axis of the approximate-membership family (M174 audits ONE
    fixed 4096-bit/3-hash dedup filter; this measures the FPR a
    deployment buys at m/n ∈ {8, 16, 32} bits per key, the number that
    decides the filter's memory budget at 100 TB).  Members = custkeys
    with orders; probes = the customer keys shifted by 10⁹ — a
    DISJOINT key space, so every probe is a non-member by construction
    (scale-robust: at sf0.001 every customer has orders, so an
    anti-join probe set would be empty).  A false positive is a probe
    whose both hash positions (k = 2: h1 mod m, (h1+h2) mod m over
    the md5-low/high-32 halves — the Kirsch-Mitzenmacher
    double-hashing scheme) land on set bits.
    Emits per config the member/probe counts, false positives, and
    fpr_ppm = (10⁶·n_fp) div n_nonmembers — all integers, md5-only
    randomness, every config row always emitted (LEFT join from the
    config spine).

    Scale: the bit table is a distinct-agg over members ×2 positions
    ×|configs| (map-side combinable); the probe is an equi-join on
    (config, position).  The 1-row member-count attach (the modulus)
    is a deliberate scalar crossJoin — BNLJ-allowlist at activation.
    ``mem=``/``probes=`` override the member/probe key frames (one
    ``k`` column each; weak-scaling probe kwargs —
    tools/scale_probes/bloomfpr_scale.py, which measures the claim
    that FPR at fixed bits-per-key is SCALE-FREE; the driver contract
    never passes them)."""
    from tropology_spark.session import iter_materialize

    # mem feeds the count AND the hash pass; the 1-row count feeds the
    # bit table, the probe positions, and the final attach — both are
    # multi-referenced, so both checkpoint (the double-reference rule).
    if mem is None:
        mem = (
            load(spark, sf_dir, "orders")
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )
    mem = iter_materialize(mem)
    nm = iter_materialize(
        mem.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    )

    def hashes(df):
        md5s = F.md5(F.col("k").cast("string"))
        return df.select(
            "k",
            F.conv(F.substring(md5s, 1, 8), 16, 10).cast("bigint").alias("h1"),
            F.conv(F.substring(md5s, 9, 8), 16, 10).cast("bigint").alias("h2"),
        )

    cfg_arr = F.array(*[F.lit(b).cast("bigint") for b in _BLOOM_BPKS])
    j_arr = F.array(F.lit(0).cast("bigint"), F.lit(1).cast("bigint"))
    mh = hashes(mem).crossJoin(F.broadcast(nm))
    bits = (
        mh.select(
            "h1",
            "h2",
            "n_members",
            F.explode(cfg_arr).alias("bpk"),
        )
        .select(
            "bpk",
            "h1",
            "h2",
            "n_members",
            F.explode(j_arr).alias("j"),
        )
        .select(
            "bpk",
            F.expr("(h1 + j * h2) % (bpk * n_members)").alias("pos"),
        )
        .distinct()
    )
    if probes is None:
        probes = load(spark, sf_dir, "customer").select(
            (F.col("c_custkey") + 1000000000).alias("k")
        )
    nonm = hashes(probes)
    tot = nonm.agg(F.count(F.lit(1)).cast("bigint").alias("n_nonmembers"))
    pp = (
        nonm.crossJoin(F.broadcast(nm))
        .select("k", "h1", "h2", "n_members", F.explode(cfg_arr).alias("bpk"))
        .select("k", "bpk", "h1", "h2", "n_members", F.explode(j_arr).alias("j"))
        .select("bpk", "k", F.expr("(h1 + j * h2) % (bpk * n_members)").alias("pos"))
    )
    hit = pp.join(bits, ["bpk", "pos"]).groupBy("bpk", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    fp = (
        hit.filter(F.col("n_hit") == 2)
        .groupBy("bpk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fp"))
    )
    cfg = spark.createDataFrame(
        [(b,) for b in _BLOOM_BPKS], "bits_per_key long"
    )
    return (
        cfg.join(fp, cfg.bits_per_key == fp.bpk, "left")
        .crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(tot))
        .select(
            "bits_per_key",
            "n_members",
            "n_nonmembers",
            F.coalesce(F.col("n_fp"), F.lit(0)).cast("bigint").alias("n_fp"),
            F.expr(
                "CAST((1000000 * coalesce(n_fp, 0L)) div n_nonmembers AS BIGINT)"
            ).alias("fpr_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# text_continuation_terms — Kneser-Ney continuation-count inputs
# ---------------------------------------------------------------------------

_CONT_TOP = 20

_CONT_ORACLE = f"""
    WITH pr AS (
      SELECT l[i] AS tok, l[i + 1] AS nxt
      FROM (SELECT string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    ),
    bc AS (SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c
           FROM pr GROUP BY tok, nxt),
    agg AS (SELECT tok,
                   CAST(sum(c) AS BIGINT) AS n_bigrams,
                   CAST(count(*) AS BIGINT) AS n_continuations,
                   CAST(sum(c * (c - 1)) AS BIGINT) AS simpson_num
            FROM bc GROUP BY tok),
    top AS (SELECT *, row_number() OVER (ORDER BY n_bigrams DESC, tok)
                        AS rk_c
            FROM agg)
    SELECT tok AS token, n_bigrams, n_continuations, simpson_num,
           CAST(rk_c AS BIGINT) AS rk
    FROM top WHERE rk_c <= {_CONT_TOP}
"""


@_stage("text_continuation_terms", oracle=_CONT_ORACLE)
def text_continuation_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation-count inputs for the {t} most frequent
    bigram left-contexts: per token, total bigram occurrences Σc,
    distinct continuations (the KN continuation count — how many
    DIFFERENT words follow), and the continuation concentration
    Σc(c−1) (the Simpson numerator over the follower distribution;
    with Σc it yields the repeat-follower probability).  These are
    exactly the integer statistics a backoff language model — and a
    data-quality pipeline judging formulaic text — derives smoothing
    weights from: high Σc with low continuations = boilerplate
    contexts.  The *_terms discipline: the KN discount ratio is a
    float, so its exact integer inputs ship instead.

    Pair generation is the J6 zip_with-slice idiom (scan-local, no
    position explode on the Spark side; the oracle enumerates
    positions with the standard 4096 cap).  Scale: one tokenize pass,
    two map-side-combinable aggs on (tok, nxt) then (tok); the top-{t}
    cut ranks an already-aggregated vocabulary table."""
    d = load(spark, sf_dir, "documents")
    toked = d.select(F.split(F.col("text"), " ").alias("t"))
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("tok"), y.alias("nxt")),
    )
    pr = toked.select(F.explode(pairs).alias("p")).select("p.tok", "p.nxt")
    bc = pr.groupBy("tok", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = bc.groupBy("tok").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_continuations"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("simpson_num"),
    )
    top = agg.orderBy(F.desc("n_bigrams"), F.asc("tok")).limit(_CONT_TOP)
    w = Window.partitionBy(F.pmod(F.length("tok"), F.lit(1))).orderBy(
        F.desc("n_bigrams"), F.asc("tok")
    )
    return top.select(
        F.col("tok").alias("token"),
        "n_bigrams",
        "n_continuations",
        "simpson_num",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


text_continuation_terms.__doc__ = text_continuation_terms.__doc__.format(
    t=_CONT_TOP
)


# ---------------------------------------------------------------------------
# pipeline_truncation_loss_curve — token loss vs context length
# ---------------------------------------------------------------------------

_TRUNC_LENS = (128, 256, 512)

_TRUNC_ORACLE = f"""
    WITH tok AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                   AS n_tokens
                 FROM documents),
    h AS (SELECT n_tokens, CAST(count(*) AS BIGINT) AS n_docs
          FROM tok GROUP BY n_tokens),
    cfg AS (SELECT CAST(unnest([{", ".join(str(n) for n in _TRUNC_LENS)}]) AS BIGINT)
                     AS max_len)
    SELECT cfg.max_len,
           CAST(sum(CASE WHEN h.n_tokens > cfg.max_len THEN h.n_docs
                         ELSE 0 END) AS BIGINT) AS n_docs_over,
           CAST(sum(CASE WHEN h.n_tokens > cfg.max_len
                         THEN (h.n_tokens - cfg.max_len) * h.n_docs
                         ELSE 0 END) AS BIGINT) AS tokens_lost,
           CAST(sum(h.n_tokens * h.n_docs) AS BIGINT) AS tokens_total,
           CAST((1000000 * sum(CASE WHEN h.n_tokens > cfg.max_len
                                    THEN (h.n_tokens - cfg.max_len) * h.n_docs
                                    ELSE 0 END))
                // sum(h.n_tokens * h.n_docs) AS BIGINT) AS loss_ppm
    FROM h CROSS JOIN cfg GROUP BY cfg.max_len
"""


@_stage("pipeline_truncation_loss_curve", oracle=_TRUNC_ORACLE)
def pipeline_truncation_loss_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Context-length budgeting curve: the exact token loss at
    max-length {lens} — documents over the limit, tokens truncated,
    and loss_ppm = (10⁶·lost) div total per setting.  This is the
    first number a training-data pipeline reads when choosing a
    context length (M108 budgets a corpus DOWN to a token target;
    this measures what each TRUNCATION point costs), and the curve
    shape tells whether the corpus is truncation-bound or
    padding-bound.

    Scale discipline: the corpus collapses to the LENGTH HISTOGRAM
    first (bounded by distinct lengths — the bounded-domain counting
    rule), and the ×{k} config axis explodes the histogram, never the
    corpus; every aggregate map-side combinable, integer-exact
    (non-negative numerators)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
    )
    h = tok.groupBy("n_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    cfg_arr = F.array(*[F.lit(n).cast("bigint") for n in _TRUNC_LENS])
    x = h.select("n_tokens", "n_docs", F.explode(cfg_arr).alias("max_len"))
    return x.groupBy("max_len").agg(
        F.sum(
            F.when(F.col("n_tokens") > F.col("max_len"), F.col("n_docs")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_docs_over"),
        F.sum(
            F.when(
                F.col("n_tokens") > F.col("max_len"),
                (F.col("n_tokens") - F.col("max_len")) * F.col("n_docs"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tokens_lost"),
        F.sum(F.col("n_tokens") * F.col("n_docs"))
        .cast("bigint")
        .alias("tokens_total"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN n_tokens > max_len"
            " THEN (n_tokens - max_len) * n_docs ELSE 0 END))"
            " div sum(n_tokens * n_docs) AS BIGINT)"
        ).alias("loss_ppm"),
    )


pipeline_truncation_loss_curve.__doc__ = (
    pipeline_truncation_loss_curve.__doc__.format(
        lens="/".join(str(n) for n in _TRUNC_LENS), k=len(_TRUNC_LENS)
    )
)


# ---------------------------------------------------------------------------
# sim_quantizer_drift — Lloyd-round reassignment audit (index maintenance)
# ---------------------------------------------------------------------------

from tropology_spark.operators.similarity import (  # noqa: E402
    _EX_CTE as _SIM_EX_CTE,
    _LLOYD_SQL_ITER,
    as_double,
    lloyd_rounds,
    norm,
)

_DRIFT_ORACLE = (
    _SIM_EX_CTE
    + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
    + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
    + """
    , lab AS (SELECT vec_id, CAST(label AS BIGINT) AS cell0 FROM embeddings),
    mv AS (SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell1, l.cell0
           FROM assign1 a JOIN lab l ON a.vec_id = l.vec_id),
    aft AS (SELECT cell1 AS cell, CAST(count(*) AS BIGINT) AS n_after,
                   CAST(sum(CASE WHEN cell1 = cell0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_stayed
            FROM mv GROUP BY cell1),
    bef AS (SELECT cell0 AS cell, CAST(count(*) AS BIGINT) AS n_before
            FROM lab GROUP BY cell0)
    SELECT CAST(coalesce(aft.cell, bef.cell) AS BIGINT) AS cell,
           CAST(coalesce(bef.n_before, 0) AS BIGINT) AS n_before,
           CAST(coalesce(aft.n_after, 0) AS BIGINT) AS n_after,
           CAST(coalesce(aft.n_stayed, 0) AS BIGINT) AS n_stayed,
           CAST(coalesce(aft.n_after, 0) - coalesce(aft.n_stayed, 0)
                AS BIGINT) AS n_arrived,
           CAST(CASE WHEN coalesce(aft.n_after, 0) = 0 THEN 0
                     ELSE (1000000 * (aft.n_after - aft.n_stayed))
                          // aft.n_after END AS BIGINT) AS arrived_ppm
    FROM aft FULL OUTER JOIN bef ON aft.cell = bef.cell
    """
)


@_stage("sim_quantizer_drift", oracle=_DRIFT_ORACLE)
def sim_quantizer_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer-drift audit — one Lloyd refinement round over the
    label-seeded coarse cells (the registered sim_ivf_topk's exact
    training step) compared against the seed assignment: per cell the
    before/after occupancy, how many vectors stayed, how many arrived,
    and the arrival fraction in ppm.  This is the INDEX-MAINTENANCE
    signal a 100 TB vector deployment monitors: when fresh data's
    reassignment fraction rises, the saved IVF/IVF+PQ artifacts
    (ivf_write_index / ivfpq_write_index) are due for a retrain —
    the audit that tells you WHEN to rebuild, next to the recall
    curves that tell you what rebuild buys.

    Cells are compared on the same 6-dp-rounded cosine ranking the
    registered IVF family pins ((ccos DESC, cell) unique tie-break);
    all emitted columns are BIGINTs, the ppm guard keeps emptied
    cells at 0, and the full-outer merge emits cells present on
    EITHER side (a cell can empty out — that row is the drift
    signal).  Scale: one Lloyd round (k-row broadcast centroids) +
    two map-side rollups + a cell-keyed full join — no pairwise
    stage anywhere."""
    ev = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("cell0"),
            as_double(F.col("embedding")).alias("emb"),
        )
        .withColumn("nv", norm(F.col("emb")))
    )
    assign0 = ev.select("vec_id", F.col("cell0").alias("cell"))
    _, assign1 = lloyd_rounds(
        ev.select("vec_id", "emb", "nv"), assign0, 1
    )
    mv = assign1.select(
        "vec_id", F.col("cell").cast("bigint").alias("cell1")
    ).join(ev.select("vec_id", "cell0"), "vec_id")
    aft = mv.groupBy(F.col("cell1").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after"),
        F.sum(F.when(F.col("cell1") == F.col("cell0"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stayed"),
    )
    bef = ev.groupBy(F.col("cell0").alias("b_cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    j = aft.join(bef, aft.cell == F.col("b_cell"), "full_outer")
    return j.select(
        F.coalesce(F.col("cell"), F.col("b_cell")).cast("bigint").alias("cell"),
        F.coalesce(F.col("n_before"), F.lit(0)).cast("bigint").alias("n_before"),
        F.coalesce(F.col("n_after"), F.lit(0)).cast("bigint").alias("n_after"),
        F.coalesce(F.col("n_stayed"), F.lit(0)).cast("bigint").alias("n_stayed"),
        (
            F.coalesce(F.col("n_after"), F.lit(0))
            - F.coalesce(F.col("n_stayed"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_arrived"),
        F.expr(
            "CAST(CASE WHEN coalesce(n_after, 0L) = 0 THEN 0"
            " ELSE (1000000 * (n_after - n_stayed)) div n_after END AS BIGINT)"
        ).alias("arrived_ppm"),
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


@_stage("ts_record_hours", oracle=_RECORD_ORACLE)
def ts_record_hours(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Record statistics over the hourly count series per event type:
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


@_stage("analytics_sequential_counts", oracle=_SEQ_ORACLE)
def analytics_sequential_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sequential-testing (peeking) audit trail for the hash-split
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
    corpus collapses to O(users) then O(days × 2)."""
    e = load(spark, sf_dir, "events").select(
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
# graph_degree_gini — attention concentration over trope in-degrees
# ---------------------------------------------------------------------------

from tropology_spark.operators.graph import _EDGES_CTE  # noqa: E402
from tropology_spark.plans.global_order import global_row_number  # noqa: E402
from tropology_spark.sources.tables import edges  # noqa: E402

_DEG_GINI_ORACLE = (
    _EDGES_CTE
    + """
    , deg AS (SELECT dst, CAST(count(*) AS BIGINT) AS degree
              FROM edges GROUP BY dst),
    r AS (SELECT degree,
                 CAST(row_number() OVER (ORDER BY degree, dst) AS BIGINT)
                   AS pos
          FROM deg),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                 CAST(sum(degree) AS BIGINT) AS total_degree,
                 CAST(sum(pos * degree) AS BIGINT) AS s1
          FROM r)
    SELECT n_nodes, total_degree,
           CAST((1000000 * (2 * CAST(s1 AS HUGEINT)
                            - (n_nodes + 1) * CAST(total_degree AS HUGEINT)))
                // (CAST(n_nodes AS HUGEINT) * total_degree)
                AS BIGINT) AS gini_ppm
    FROM a
    """
)


@_stage("graph_degree_gini", oracle=_DEG_GINI_ORACLE)
def graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the trope in-degree distribution — the
    attention-concentration number for the link graph (the scalar
    companion to M249's rich-club terms and M114's degree histogram:
    one inequality index instead of a curve).  Degree inequality is
    what decides whether the celebrity-capping machinery
    (capped_copair / twohop_capped) matters at all on a given corpus
    — a near-uniform graph (gini → 0) never needs it, a hub-dominated
    one (gini → 1) always does, so this IS the audit that sizes the
    cap.

    The exact integer Lorenz identity from M192 reused verbatim:
    G = (2·Σ i·x_i − (n+1)·Σx_i)/(n·Σx_i) over degrees ranked
    ascending with the unique (degree, dst) tie-break; the global
    rank is the two-pass range-partitioned prefix sum
    (plans/global_order.py — never a single-partition window), and
    the one-row finale runs in DECIMAL(38,0)/HUGEINT per the
    wide-integer rule."""
    deg = (
        edges(spark, sf_dir)
        .groupBy("dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    r = global_row_number(deg, ["degree", "dst"], out="pos")
    a = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("degree").cast("bigint").alias("total_degree"),
        F.sum(F.col("pos") * F.col("degree")).cast("bigint").alias("s1"),
    )
    return a.select(
        "n_nodes",
        "total_degree",
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0))"
            " * (2 * CAST(s1 AS DECIMAL(38,0))"
            "    - (n_nodes + 1) * CAST(total_degree AS DECIMAL(38,0))))"
            " div (CAST(n_nodes AS DECIMAL(38,0)) * total_degree)"
        )
        .cast("bigint")
        .alias("gini_ppm"),
    )
