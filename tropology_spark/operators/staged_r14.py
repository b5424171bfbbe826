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
