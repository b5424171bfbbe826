"""STAGED round-11 operators — implemented and parity-tested, NOT yet
registered (the round-8/round-9 staging pattern, third application).

The round-10 driver window is exactly budgeted (_R10_NEW +
_R10_STALE_R03 + _R10_STALE_R04 — see ``tropology_spark/
__init__.py``), and the window test requires every never-sampled query
to sit INSIDE the first 50, so new registrations are blocked until
round 11 re-budgets the window.  These ops live here with the SAME
(fn, oracle) contract the registry uses; round 11 activates each by
moving it into its home module with ``@register`` + the five-fold
lockstep (CLAUDE.md).  Until then tests/test_staged_r11.py runs the
full driver-replica comparison over ``STAGED`` at both verification
scales, plus Python twins for the formula-bearing ops and a
partitioning-invariance probe.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).
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
# pipeline_quota_sample — largest-remainder (Hare) quota allocation
# ---------------------------------------------------------------------------

_QUOTA_BUDGET = 1000


@_stage(
    "pipeline_quota_sample",
    oracle=f"""
    WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM s),
    q AS (SELECT source, n_docs,
                 CAST(({_QUOTA_BUDGET} * n_docs) // total AS BIGINT) AS base_quota,
                 CAST(({_QUOTA_BUDGET} * n_docs) % total AS BIGINT) AS rem
          FROM s CROSS JOIN t),
    k AS (SELECT CAST({_QUOTA_BUDGET} - sum(base_quota) AS BIGINT) AS seats
          FROM q),
    r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q)
    SELECT source, n_docs, base_quota, rem,
           CAST(CASE WHEN rk <= seats THEN 1 ELSE 0 END AS BIGINT) AS extra,
           CAST(base_quota + CASE WHEN rk <= seats THEN 1 ELSE 0 END AS BIGINT)
             AS quota
    FROM r CROSS JOIN k
    """,
)
def pipeline_quota_sample(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — LARGEST-REMAINDER (Hare) quota allocation: split
    a fixed sample budget of {n} documents across sources proportional
    to their counts — base = floor(N·n_s/T) per source, then the
    leftover seats go to the largest fractional remainders (tie-break
    by source name) — the apportionment rule every fixed-budget
    eval-set / human-annotation draw uses, with the classic guarantee
    Σ quota = N exactly (floor-only allocation under-fills; naive
    rounding over- or under-fills).  All integer arithmetic: remainders
    compare as exact integers because every source shares the
    denominator T.

    Scale: the corpus collapses to O(sources) rows in one map-side-
    combinable pass; the total, the remainder rank, and the leftover
    seat count all ride pmod-constant-key windows over the bounded
    source axis — no scalar-attach join, no second corpus scan.

    ``docs=`` substitutes the document frame — (source,) suffices —
    for the Hare-invariant property test; the driver contract never
    passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = Window.partitionBy(F.pmod(F.length("source"), F.lit(1)))
    q = s.select(
        "source",
        "n_docs",
        F.sum("n_docs").over(w).cast("bigint").alias("total"),
    ).select(
        "source",
        "n_docs",
        F.expr(f"({_QUOTA_BUDGET} * n_docs) div total")
        .cast("bigint")
        .alias("base_quota"),
        (F.lit(_QUOTA_BUDGET) * F.col("n_docs") % F.col("total"))
        .cast("bigint")
        .alias("rem"),
    )
    wr = w.orderBy(F.desc("rem"), F.asc("source"))
    r = q.select(
        "source",
        "n_docs",
        "base_quota",
        "rem",
        F.row_number().over(wr).alias("rk"),
        (F.lit(_QUOTA_BUDGET) - F.sum("base_quota").over(w))
        .cast("bigint")
        .alias("seats"),
    )
    extra = F.when(F.col("rk") <= F.col("seats"), 1).otherwise(0)
    return r.select(
        "source",
        "n_docs",
        "base_quota",
        "rem",
        extra.cast("bigint").alias("extra"),
        (F.col("base_quota") + extra).cast("bigint").alias("quota"),
    )


pipeline_quota_sample.__doc__ = pipeline_quota_sample.__doc__.format(
    n=_QUOTA_BUDGET
)


# ---------------------------------------------------------------------------
# analytics_ols_terms — exact OLS slope terms (price elasticity shape)
# ---------------------------------------------------------------------------


@_stage(
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
    """Staged M-row — exact OLS REGRESSION-SLOPE terms per brand for
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
# pipeline_rolling_cv_folds — rolling-origin time-series CV audit
# ---------------------------------------------------------------------------

_CV_FOLDS = 3
_CV_STEP_DAYS = 7


@_stage(
    "pipeline_rolling_cv_folds",
    oracle=f"""
    WITH dc AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT CAST(min(day) AS BIGINT) AS d0 FROM dc),
    f AS (SELECT unnest(generate_series(1, {_CV_FOLDS})) AS fold)
    SELECT CAST(f.fold AS BIGINT) AS fold,
           CAST(d0.d0 + {_CV_STEP_DAYS} * f.fold - 1 AS BIGINT) AS train_end_day,
           CAST(coalesce(sum(CASE WHEN dc.day < d0.d0 + {_CV_STEP_DAYS} * f.fold
                                  THEN dc.n END), 0) AS BIGINT) AS n_train,
           CAST(coalesce(sum(CASE WHEN dc.day >= d0.d0 + {_CV_STEP_DAYS} * f.fold
                                   AND dc.day < d0.d0 + {_CV_STEP_DAYS} * (f.fold + 1)
                                  THEN dc.n END), 0) AS BIGINT) AS n_val
    FROM f CROSS JOIN d0 CROSS JOIN dc
    GROUP BY f.fold, d0.d0
    """,
)
def pipeline_rolling_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — ROLLING-ORIGIN cross-validation folds over the
    event stream: for fold f ∈ 1..{k}, train = everything before
    origin + {s}·f days, validation = the next {s}-day window — the
    only CV scheme that respects time's arrow (random K-fold leaks the
    future into training; the M215 PIT-leakage audit's prevention
    counterpart).  Per fold: the training cutoff day and exact
    train/validation event counts; by construction train(f) ⊇
    train(f−1) + val(f−1) — the expanding-window property a
    forecasting eval harness asserts before trusting fold metrics.

    Scale: events collapse to the bounded O(days) count table first;
    the ×{k} fold explode rides that table, never the event stream;
    the origin day is a pmod-constant-key window min over the same
    bounded axis — one corpus pass total."""
    e = load(spark, sf_dir, "events")
    dc = e.groupBy(
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy(F.pmod(F.col("day"), F.lit(1)))
    folds = F.explode(
        F.expr(f"sequence(1L, {_CV_FOLDS}L)")
    ).alias("fold")
    x = dc.select(
        "day", "n", F.min("day").over(w).cast("bigint").alias("d0")
    ).select("day", "n", "d0", folds)
    cut = F.col("d0") + _CV_STEP_DAYS * F.col("fold")
    return (
        x.groupBy("fold", "d0")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("day") < cut, F.col("n"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_train"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("day") >= cut)
                        & (F.col("day") < cut + _CV_STEP_DAYS),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_val"),
        )
        .select(
            F.col("fold").cast("bigint").alias("fold"),
            (F.col("d0") + _CV_STEP_DAYS * F.col("fold") - 1)
            .cast("bigint")
            .alias("train_end_day"),
            "n_train",
            "n_val",
        )
    )


pipeline_rolling_cv_folds.__doc__ = pipeline_rolling_cv_folds.__doc__.format(
    k=_CV_FOLDS, s=_CV_STEP_DAYS
)


# ---------------------------------------------------------------------------
# sim_bq_hamming_topk — binary-quantization retrieval (sign bits + Hamming)
# ---------------------------------------------------------------------------

# Single home of the BQ constants + pack arithmetic is similarity.py
# (bq_signatures_frame / BQ_CAND / BQ_K) — shared with the saved-index
# pair bq_write_index / bq_topk_from_index and the weak-scaling probe.
from tropology_spark.operators.similarity import BQ_CAND as _BQ_CAND
from tropology_spark.operators.similarity import BQ_K as _BQ_K


def _bq_oracle() -> str:
    from tropology_spark.operators.similarity import _EX_CTE, QUERY_VEC_ID

    return (
        _EX_CTE
        + f"""
    , sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN pos <= 32 AND val >= 0
                           THEN (CAST(1 AS BIGINT) << CAST(pos - 1 AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN pos > 32 AND val >= 0
                           THEN (CAST(1 AS BIGINT) << CAST(pos - 33 AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS h1
      FROM ex GROUP BY vec_id
    ),
    q AS (SELECT h0 AS q0, h1 AS q1 FROM sig WHERE vec_id = {QUERY_VEC_ID}),
    hd AS (
      SELECT s.vec_id,
             CAST(bit_count(xor(s.h0, q.q0))
                  + bit_count(xor(s.h1, q.q1)) AS BIGINT) AS hamming
      FROM sig s CROSS JOIN q
      WHERE s.vec_id <> {QUERY_VEC_ID}
    ),
    cand AS (SELECT vec_id, hamming FROM (
               SELECT *, row_number() OVER (ORDER BY hamming, vec_id) AS rb1
               FROM hd) t WHERE rb1 <= {_BQ_CAND}),
    qv AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id, sum(e.val * qv.val) AS dp
          FROM ex e JOIN qv ON e.pos = qv.pos
          JOIN cand c ON c.vec_id = e.vec_id
          GROUP BY e.vec_id)
    SELECT d.vec_id, cand.hamming,
           round(d.dp / (n1.nv * n2.nv), 6) AS cosine
    FROM d JOIN cand ON d.vec_id = cand.vec_id
    JOIN nrm n1 ON d.vec_id = n1.vec_id
    JOIN nrm n2 ON n2.vec_id = {QUERY_VEC_ID}
    ORDER BY cosine DESC, d.vec_id
    LIMIT {_BQ_K}
    """
    )


@_stage("sim_bq_hamming_topk", oracle=_bq_oracle())
def sim_bq_hamming_topk(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — BINARY-QUANTIZATION retrieval: each 64-dim
    vector collapses to its SIGN BITS packed into two BIGINTs (64
    bits/vector — the 64x compression every vector store's BQ tier
    ships), candidates come from Hamming distance (two XOR+popcount
    ops — the cheapest distance computable), and the top {c} rerank
    exactly by cosine, top {k} emitted — the third member of the
    compressed-retrieval family (IVF cells M7, PQ codes M104, sign
    bits here), and the only one whose scan distance is branch-free
    integer ops.

    Integer-exact end-to-end until the declared cosine rerank; the
    Hamming scan carries only BIGINTs.  Scale: the signature table is
    16 bytes/vector; the scan is corpus-linear with a 2-word working
    set per row (at 100 TB: written bucketed, read columnar, SIMD
    popcount in the JVM); the rerank touches {c} raw vectors by key —
    point lookups, never a scan.

    ``e=`` substitutes the embeddings frame — (vec_id, embedding) —
    for the weak-scaling probe (tools/scale_probes/bq_scale.py); the
    driver contract never passes it."""
    from tropology_spark.operators.similarity import (
        QUERY_VEC_ID,
        bq_signatures_frame,
        dot,
    )
    from tropology_spark.session import iter_materialize

    e = e if e is not None else load(spark, sf_dir, "embeddings")
    sig = iter_materialize(
        bq_signatures_frame(e, with_vectors=True)
    )  # referenced by the query row AND the corpus scan
    q = sig.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("h0").alias("q0"),
        F.col("h1").alias("q1"),
        F.col("emb").alias("qemb"),
        F.col("nv").alias("nq"),
    )
    cand = (
        sig.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.expr("CAST(bit_count(h0 ^ q0) + bit_count(h1 ^ q1) AS BIGINT)")
            .alias("hamming"),
            F.round(
                dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6
            ).alias("cosine"),
        )
        .orderBy("hamming", "vec_id")
        .limit(_BQ_CAND)
    )
    return cand.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(_BQ_K).select(
        "vec_id", "hamming", "cosine"
    )


sim_bq_hamming_topk.__doc__ = sim_bq_hamming_topk.__doc__.format(
    c=_BQ_CAND, k=_BQ_K
)


# ---------------------------------------------------------------------------
# dedup_threshold_curve — near-dup pair counts across cosine thresholds
# ---------------------------------------------------------------------------

_CURVE_T_PPM = (400000, 600000, 800000)


def _threshold_curve_oracle() -> str:
    from tropology_spark.registry import ORACLES

    ts = ", ".join(str(t) for t in _CURVE_T_PPM)
    return f"""
    WITH pairs AS ({ORACLES['dedup_embedding_cosine']}),
    ts AS (SELECT unnest([{ts}]) AS t_ppm),
    pe AS (SELECT ts.t_ppm, p.vec_a, p.vec_b
           FROM pairs p JOIN ts ON round(p.cosine * 1000000) >= ts.t_ppm),
    np AS (SELECT t_ppm, CAST(count(*) AS BIGINT) AS n_pairs
           FROM pe GROUP BY t_ppm),
    du AS (SELECT t_ppm, vec_a AS d FROM pe
           UNION SELECT t_ppm, vec_b FROM pe),
    nd AS (SELECT t_ppm, CAST(count(*) AS BIGINT) AS n_docs
           FROM du GROUP BY t_ppm)
    SELECT CAST(ts.t_ppm AS BIGINT) AS t_ppm,
           CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs
    FROM ts LEFT JOIN np ON ts.t_ppm = np.t_ppm
            LEFT JOIN nd ON ts.t_ppm = nd.t_ppm
    """


@_stage("dedup_threshold_curve", oracle=_threshold_curve_oracle())
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the NEAR-DUP THRESHOLD CURVE: pair and
    affected-document counts at cosine ≥ 0.4/0.6/0.8 over the
    quantizer-cell-blocked pair set — the tuning audit every dedup
    rollout runs before picking its cutoff (too low deletes distinct
    content; too high ships duplicates; this table IS that tradeoff).
    Thresholds compare as exact integers (round(cosine·10⁶) vs ppm).
    All three threshold rows are always emitted (LEFT joins from the
    threshold axis).

    Composed, not copied: the oracle wraps ORACLES
    ['dedup_embedding_cosine'] verbatim and the Spark side runs the
    registered M2 query (the _J2_ORACLE rule); the pair set reuses the
    session-shared quantizer blocking, so the curve costs one pair
    pass + bounded rollups."""
    from tropology_spark.registry import QUERIES
    from tropology_spark.session import iter_materialize

    pairs = QUERIES["dedup_embedding_cosine"](spark, sf_dir)
    ts = spark.createDataFrame([(t,) for t in _CURVE_T_PPM], "t_ppm long")
    pe = iter_materialize(
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(F.col("cosine") * 1000000).cast("bigint").alias("c_ppm"),
        )
        .crossJoin(F.broadcast(ts))
        .filter(F.col("c_ppm") >= F.col("t_ppm"))
        .select("t_ppm", "vec_a", "vec_b")
    )  # referenced by the pair rollup AND the doc-union rollup
    np_ = pe.groupBy("t_ppm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    du = (
        pe.select("t_ppm", F.col("vec_a").alias("d"))
        .union(pe.select("t_ppm", F.col("vec_b").alias("d")))
        .distinct()
    )
    nd = du.groupBy("t_ppm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        ts.join(np_, "t_ppm", "left")
        .join(nd, "t_ppm", "left")
        .select(
            F.col("t_ppm").cast("bigint").alias("t_ppm"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# agg_weighted_median — exact lower weighted median (integer compare only)
# ---------------------------------------------------------------------------


@_stage(
    "agg_weighted_median",
    oracle="""
    WITH ow AS (
      SELECT o.o_orderpriority AS priority,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2, o.o_orderkey
    ),
    v AS (SELECT priority, cents, CAST(sum(w) AS BIGINT) AS w
          FROM ow GROUP BY 1, 2),
    c AS (SELECT priority, cents, w,
                 CAST(sum(w) OVER (PARTITION BY priority ORDER BY cents)
                      AS BIGINT) AS cw,
                 CAST(sum(w) OVER (PARTITION BY priority) AS BIGINT) AS wt
          FROM v)
    SELECT priority, w_total, wmedian_cents FROM (
      SELECT priority, wt AS w_total, cents AS wmedian_cents,
             row_number() OVER (PARTITION BY priority ORDER BY cents) AS rm1
      FROM c WHERE 2 * cw >= wt) t
    WHERE rm1 = 1
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — exact LOWER WEIGHTED MEDIAN of order price per
    priority, weighted by the order's line-item count: the smallest
    cents value whose cumulative weight reaches half the total
    (2·cumw ≥ W — integer compare only, no halving, no midpoint, so
    the result is always an OBSERVED value and crosses the engine
    hash gate with zero float carriers; the med2x doubling trick is
    unnecessary because the lower-median definition never averages).
    The weighted complement of M59's unweighted median — "the price
    of the median SHIPPED LINE, not the median order".

    Scale: orders collapse to the per-(priority, cents) weight table
    (two map-side-combinable rollups); the cumulative runs per
    priority — a real partition key, no constant-key window; the
    winner is one rank filter."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    ow = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("priority", "cents", "o_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    v = ow.groupBy("priority", "cents").agg(
        F.sum("w").cast("bigint").alias("w")
    )
    wp = Window.partitionBy("priority")
    c = v.select(
        "priority",
        "cents",
        "w",
        F.sum("w")
        .over(wp.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cw"),
        F.sum("w").over(wp).cast("bigint").alias("wt"),
    )
    r = (
        c.filter(2 * F.col("cw") >= F.col("wt"))
        .withColumn("rm1", F.row_number().over(wp.orderBy("cents")))
        .filter(F.col("rm1") == 1)
    )
    return r.select(
        "priority",
        F.col("wt").alias("w_total"),
        F.col("cents").alias("wmedian_cents"),
    )


# ---------------------------------------------------------------------------
# text_winnowing_fingerprints — MOSS winnowing selection density
# ---------------------------------------------------------------------------

_WIN_W = 4  # window of consecutive k-gram hashes


def winnowing_selected(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """The winnowing SELECTION frame ``(doc_id, n_grams, mh)`` —
    distinct trigram hashes that are the minimum of some full
    {w}-window — the single home of the window-min arithmetic, shared
    by the staged rollup and the containment-guarantee property test
    (``docs=`` substitutes a (doc_id, text) frame).  The window min is
    computed over ALL gram rows BEFORE the full-window filter — the
    subquery-order rule the oracle pins."""
    from tropology_spark.operators.pipeline_ops import word_ngrams

    d = docs if docs is not None else load(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.posexplode(word_ngrams(F.split(F.col("text"), " "), 3)).alias(
            "pos0", "gram"
        ),
        (F.size(F.split(F.col("text"), " ")) - 2).alias("n_grams"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("i"),
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, _WIN_W - 1)
    wm = g.select("doc_id", "n_grams", "i", F.min("h").over(w).alias("mh"))
    return (
        wm.filter(F.col("i") + (_WIN_W - 1) <= F.col("n_grams"))
        .select("doc_id", "n_grams", "mh")
        .distinct()
    )


winnowing_selected.__doc__ = winnowing_selected.__doc__.format(w=_WIN_W)


@_stage(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, i,
             ('0x' || substring(md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2]),
                                1, 8))::BIGINT AS h,
             len(l) - 2 AS n_grams
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 2
    ),
    wm AS (
      SELECT doc_id, n_grams, i,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {_WIN_W - 1} FOLLOWING) AS mh
      FROM g
    ),
    sel AS (SELECT DISTINCT doc_id, n_grams, mh
            FROM wm WHERE i + {_WIN_W - 1} <= n_grams)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST((1000000 * count(*)) // n_grams AS BIGINT) AS density_ppm
    FROM sel GROUP BY doc_id, n_grams
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — WINNOWING fingerprint selection (the MOSS
    algorithm): per document, the distinct trigram hashes that are the
    minimum of some {w}-wide sliding window over the hash sequence —
    the local-sampling guarantee that any shared run of ≥ k+w−1 tokens
    between two documents shares at least one SELECTED fingerprint, at
    ~2/(w+1) storage of the full shingle set.  M6's rolling-hash
    fingerprint samples globally (mod-p); winnowing samples LOCALLY,
    which is what makes it the plagiarism/overlap detector of record.
    Emitted per doc: gram count, selected count, selection density ppm
    (docs shorter than k+w−1 tokens have no full window and are
    absent — both engines agree by construction).

    Scale: one shingle explode; the window min runs per-document
    (real partition key) over a frame of {w} rows; the DISTINCT
    collapse and rollup are map-side combinable.  The window-min
    MUST be computed before the full-window filter (filtering first
    would remove the tail rows from the frame — the staging lesson
    pinned in the oracle's subquery order)."""
    sel = winnowing_selected(spark, sf_dir)
    return sel.groupBy("doc_id", "n_grams").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.expr("(1000000 * count(1)) div n_grams")
        .cast("bigint")
        .alias("density_ppm"),
    ).select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        "n_selected",
        "density_ppm",
    )


# ---------------------------------------------------------------------------
# mm_cdc_chunking — content-defined chunk boundaries (rolling-hash CDC)
# ---------------------------------------------------------------------------

_CDC_WIN_BYTES = 8
_CDC_MOD = 64


def cdc_boundary_positions(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """The CDC boundary-position frame ``(doc_id, n_bytes, p, bound)``
    — one row per rolling-window start byte, bound = 1 where the
    window hash declares a chunk boundary — the single home of the
    window-hash arithmetic, shared by the staged rollup and the
    shift-resistance property test (``docs=`` substitutes a (doc_id,
    text) frame)."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    hx = d.select(
        "doc_id",
        F.hex(F.encode(F.col("text"), "UTF-8")).alias("hs"),
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("n_bytes"),
    )
    pos = hx.select(
        "doc_id",
        "n_bytes",
        "hs",
        F.explode(
            F.when(
                F.col("n_bytes") >= _CDC_WIN_BYTES,
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.col("n_bytes") - (_CDC_WIN_BYTES - 1), F.lit(4096)
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("p"),
    )
    bound = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.expr(
                        f"substring(hs, CAST(2 * p - 1 AS INT),"
                        f" {2 * _CDC_WIN_BYTES})"
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % _CDC_MOD
        == 0,
        1,
    ).otherwise(0)
    return pos.select("doc_id", "n_bytes", "p", bound.alias("bound"))



@_stage(
    "mm_cdc_chunking",
    oracle=f"""
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS hs,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    b AS (
      SELECT hx.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN
                    ('0x' || substring(md5(substring(hs, 2 * p - 1,
                                                     {2 * _CDC_WIN_BYTES})),
                                       1, 4))::BIGINT % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_bound
      FROM hx, (SELECT unnest(generate_series(1, 4096)) AS p)
      WHERE p <= n_bytes - {_CDC_WIN_BYTES - 1}
      GROUP BY hx.doc_id
    )
    SELECT hx.doc_id, n_bytes,
           CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(n_bound, 0) AS BIGINT) AS n_bound,
           CAST(coalesce(n_bound, 0) + 1 AS BIGINT) AS n_chunks,
           CAST((100 * n_bytes) // (coalesce(n_bound, 0) + 1) AS BIGINT)
             AS avg_chunk_x100
    FROM hx LEFT JOIN b ON hx.doc_id = b.doc_id
    """,
)
def mm_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — CONTENT-DEFINED CHUNKING boundaries: a chunk
    boundary wherever the rolling {w}-byte window's hash ≡ 0 mod {m}
    (expected chunk ≈ {m} bytes) — the Rabin/FastCDC splitting rule
    every dedup store (restic/borg/LBFS lineage) uses instead of
    M185's fixed grid, because insertions shift fixed-grid chunk
    contents globally but re-align content-defined boundaries within
    one window.  Per asset: window count, boundary count, chunk count
    and average chunk size ×100 (exact integer div).  The window hash
    follows the established discipline: md5 of the HEX encoding at
    doubled offsets (byte-aligned; DuckDB md5 is VARCHAR-only —
    mm_chunk_manifest's rule), low-16-bits mod {m}.  Assets shorter
    than {w} bytes have zero windows and one chunk (LEFT JOIN keeps
    them; the byte axis is enumerated at the 4096 cap).

    Scale: the boundary test is per-position map-only work over the
    payload scan — no shuffle until the per-asset rollup, which is
    map-side combinable; payloads never shuffle (only (doc_id,
    position-window) projections do)."""
    d = load(spark, sf_dir, "documents")
    sizes = d.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("n_bytes"),
    )
    b = (
        cdc_boundary_positions(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum("bound").cast("bigint").alias("n_bound"),
        )
    )
    return (
        sizes.join(b, "doc_id", "left")
        .select(
            "doc_id",
            "n_bytes",
            F.coalesce(F.col("n_windows"), F.lit(0))
            .cast("bigint")
            .alias("n_windows"),
            F.coalesce(F.col("n_bound"), F.lit(0))
            .cast("bigint")
            .alias("n_bound"),
            (F.coalesce(F.col("n_bound"), F.lit(0)) + 1)
            .cast("bigint")
            .alias("n_chunks"),
            F.expr(
                "(100 * n_bytes) div (coalesce(n_bound, 0) + 1)"
            )
            .cast("bigint")
            .alias("avg_chunk_x100"),
        )
    )


mm_cdc_chunking.__doc__ = mm_cdc_chunking.__doc__.format(
    w=_CDC_WIN_BYTES, m=_CDC_MOD
)


# ---------------------------------------------------------------------------
# dedup_cluster3 — 3-round min-label clusters over the LSH candidate graph
# ---------------------------------------------------------------------------


#: One synchronous min-label round as SQL — the single home of the
#: propagation step, shared by the dedup_cluster3 oracle (over the J3
#: LSH graph) and the mm_phash_clusters oracle (over the M99 pHash
#: graph).  Expects CTEs ``und(u, v)`` (both edge directions) and
#: ``l{p}(doc_id, lbl)`` in scope.
_MINLABEL_STEP_SQL = """
    l{n} AS (
      SELECT l{p}.doc_id,
             least(l{p}.lbl, coalesce(min(nb.lbl), l{p}.lbl)) AS lbl
      FROM l{p} LEFT JOIN und ON und.u = l{p}.doc_id
                LEFT JOIN l{p} nb ON nb.doc_id = und.v
      GROUP BY l{p}.doc_id, l{p}.lbl
    )"""


def _minlabel_steps_sql(rounds: int = 3) -> str:
    return ",".join(
        _MINLABEL_STEP_SQL.format(n=n, p=n - 1) for n in range(1, rounds + 1)
    )


def minlabel_rounds(lab: DataFrame, und: DataFrame, rounds: int = 3) -> DataFrame:
    """``rounds`` synchronous min-label propagation steps over an
    undirected edge list ``und(u, v)`` starting from ``lab(doc_id,
    lbl)`` — the Spark twin of :func:`_minlabel_steps_sql` and the
    single home of the propagation arithmetic (dedup_cluster3 and
    mm_phash_clusters differ only in the candidate graph).  Each
    round's label vector is checkpointed (the DOUBLE-REFERENCE rule:
    round k feeds round k+1 as both the self and the neighbor
    side)."""
    from tropology_spark.session import iter_materialize

    for _ in range(rounds):
        nb = lab.select(F.col("doc_id").alias("v"), F.col("lbl").alias("nlbl"))
        lab = iter_materialize(
            lab.join(und, lab.doc_id == und.u, "left")
            .join(nb, "v", "left")
            .groupBy("doc_id", "lbl")
            .agg(F.min("nlbl").alias("mnl"))
            .select(
                "doc_id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("mnl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
    return lab


def _cluster3_oracle() -> str:
    from tropology_spark.operators.dedup import _minhash_bands_cte

    return (
        _minhash_bands_cte()
        + """
    , cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.doc_id < b.doc_id
    ),
    und AS (SELECT doc_a AS u, doc_b AS v FROM cand
            UNION ALL SELECT doc_b, doc_a FROM cand),
    l0 AS (SELECT doc_id, doc_id AS lbl FROM documents),"""
        + _minlabel_steps_sql(3)
        + """
    SELECT doc_id, CAST(lbl AS BIGINT) AS label3 FROM l3
    """
    )


@_stage("dedup_cluster3", oracle=_cluster3_oracle())
def dedup_cluster3(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — near-dup CLUSTER ASSIGNMENT by 3-round min-label
    propagation over the J3 MinHash-LSH candidate graph: every doc
    starts as its own label; each round takes the min over itself and
    its LSH neighbors — after 3 rounds every doc in a candidate
    component of diameter ≤ 3 carries the component's minimum doc_id,
    the cluster representative a dedup DROP stage keys on (J3 emits
    PAIRS; production needs the transitive grouping — pairs (a,b),
    (b,c) must drop against ONE keeper, not two).  The bounded-round
    unroll is the M130/I8 discipline: exact in both engines, no
    iterate-to-fixpoint in the oracle, and diameter > 3 components
    (rare for near-dup graphs, which are dense cliques by
    construction) converge in the registered CC operator (M8) —
    documented stepping-stone semantics.

    Composed, not copied: the oracle extends _minhash_bands_cte (the
    J3/M211 single home) and the Spark side reads the session-shared
    minhash_bands_materialized through minhash_candidate_pairs.
    Scale: each round is one shuffle on the doc key; the label vector
    is checkpointed per round (the DOUBLE-REFERENCE rule: round k
    feeds round k+1 as both the self and the neighbor side).

    ``docs=`` substitutes the document frame — (doc_id, text) — for
    the weak-scaling probe (tools/scale_probes/cluster3_scale.py, via
    minhash_bands_frame); the driver contract never passes it."""
    from tropology_spark.operators.dedup import (
        minhash_bands_frame,
        minhash_bands_materialized,
        minhash_candidate_pairs,
    )
    from tropology_spark.session import iter_materialize

    bands = (
        minhash_bands_frame(spark, sf_dir, docs=docs)
        if docs is not None
        else minhash_bands_materialized(spark, sf_dir)
    )
    pairs = minhash_candidate_pairs(bands)
    und = iter_materialize(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionAll(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
    )  # referenced by all three rounds
    lab = (
        docs if docs is not None else load(spark, sf_dir, "documents")
    ).select("doc_id", F.col("doc_id").alias("lbl"))
    lab = minlabel_rounds(lab, und, 3)
    return lab.select("doc_id", F.col("lbl").cast("bigint").alias("label3"))


# ---------------------------------------------------------------------------
# graph_path_counts3 — exact path counts from a seed set (PPR numerator)
# ---------------------------------------------------------------------------

_PATH_SEEDS = 3


@_stage(
    "graph_path_counts3",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    seeds AS (SELECT src FROM (
                SELECT src, row_number() OVER (ORDER BY d DESC, src) AS rs1
                FROM deg) t
              WHERE rs1 <= {_PATH_SEEDS}),
    p1 AS (SELECT e.dst AS node, CAST(count(*) AS BIGINT) AS n_paths
           FROM edges e JOIN seeds s ON e.src = s.src GROUP BY e.dst),
    p2 AS (SELECT e2.src AS node, CAST(sum(p1.n_paths) AS BIGINT) AS n_paths
           FROM p1 JOIN edges e2 ON e2.dst = p1.node GROUP BY e2.src),
    p3 AS (SELECT e3.dst AS node, CAST(sum(p2.n_paths) AS BIGINT) AS n_paths
           FROM p2 JOIN edges e3 ON e3.src = p2.node GROUP BY e3.dst)
    SELECT CAST(1 AS BIGINT) AS hop, node, n_paths FROM p1
    UNION ALL SELECT CAST(2 AS BIGINT), node, n_paths FROM p2
    UNION ALL SELECT CAST(3 AS BIGINT), node, n_paths FROM p3
    """,
)
def graph_path_counts3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — exact PATH COUNTS from a deterministic seed set
    (the {s} highest-out-degree works, degree-desc/key-asc tie-break):
    per node, the number of distinct length-1/2/3 paths from any seed,
    alternating work→trope→work→trope on the bipartite edge list —
    the exact-integer numerator of personalized PageRank (PPR mass at
    hop h = path counts weighted by damping^h / degree products; the
    COUNTS cross the engine hash gate where the float masses never
    would — I8's accepted-risk carrier avoided entirely).  Paths may
    revisit nodes (pure path semantics, the standard A^h definition).

    Scale: each hop is one equi-join against the shared edge view +
    one map-side-combinable rollup — the A^h·x sparse mat-vec shape;
    per-hop frontiers are checkpointed (each feeds the next hop AND
    the output union).  Counts are BIGINT-exact: ≤ seeds·maxdeg³ ~
    1e12 at 100 TB, far inside the carrier."""
    from tropology_spark.sources.tables import edges_materialized
    from tropology_spark.session import iter_materialize

    e = edges_materialized(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    seeds = (
        deg.orderBy(F.desc("d"), F.asc("src"))
        .limit(_PATH_SEEDS)
        .select("src")
    )
    p1 = iter_materialize(
        e.join(F.broadcast(seeds), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
    e2 = e.select(F.col("src").alias("node2"), F.col("dst").alias("node"))
    p2 = iter_materialize(
        p1.join(e2, "node")
        .groupBy(F.col("node2").alias("node"))
        .agg(F.sum("n_paths").cast("bigint").alias("n_paths"))
    )
    e3 = e.select(F.col("src").alias("node"), F.col("dst").alias("node3"))
    p3 = (
        p2.join(e3, "node")
        .groupBy(F.col("node3").alias("node"))
        .agg(F.sum("n_paths").cast("bigint").alias("n_paths"))
    )
    hop = lambda n, df: df.select(  # noqa: E731
        F.lit(n).cast("bigint").alias("hop"), "node", "n_paths"
    )
    return hop(1, p1).unionByName(hop(2, p2)).unionByName(hop(3, p3))


graph_path_counts3.__doc__ = graph_path_counts3.__doc__.format(s=_PATH_SEEDS)


# ---------------------------------------------------------------------------
# sim_ivf_probe_curve — recall vs n_probe (the other IVF tuning axis)
# ---------------------------------------------------------------------------

_PROBE_NPS = (1, 2, 4)
_PROBE_K = 10


def _probe_curve_oracle() -> str:
    from tropology_spark.operators.similarity import (
        _EX_CTE,
        _LLOYD_SQL_ITER,
        QUERY_VEC_ID,
    )
    from tropology_spark.registry import ORACLES

    nps = ", ".join(str(n) for n in _PROBE_NPS)
    return (
        _EX_CTE
        + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
        + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
        + f"""
    , assign AS (SELECT * FROM assign1),
    pr AS (SELECT tcell, row_number() OVER (ORDER BY ccos DESC, tcell) AS rnp
           FROM vc1 WHERE vec_id = {QUERY_VEC_ID}),
    nps AS (SELECT unnest([{nps}]) AS np),
    cand AS (SELECT nps.np, a.vec_id FROM assign a
             JOIN pr ON a.cell = pr.tcell
             JOIN nps ON pr.rnp <= nps.np
             WHERE a.vec_id <> {QUERY_VEC_ID}),
    q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT c.np, e.vec_id, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          JOIN cand c ON e.vec_id = c.vec_id
          GROUP BY c.np, e.vec_id),
    cos AS (SELECT d.np, d.vec_id, round(d.dp / (n1.nv * n2.nv), 6) AS cosine
            FROM d JOIN nrm n1 ON d.vec_id = n1.vec_id
            CROSS JOIN (SELECT nv FROM nrm
                        WHERE vec_id = {QUERY_VEC_ID}) n2),
    appr AS (SELECT np, vec_id FROM (
               SELECT *, row_number() OVER (PARTITION BY np
                                            ORDER BY cosine DESC, vec_id) AS ra1
               FROM cos) t WHERE ra1 <= {_PROBE_K}),
    truth AS (SELECT vec_id FROM ({ORACLES['sim_topk_cosine']}) t)
    SELECT CAST(nps.np AS BIGINT) AS n_probe,
           CAST(count(truth.vec_id) AS BIGINT) AS n_hits,
           CAST((1000000 * count(truth.vec_id)) // {_PROBE_K} AS BIGINT)
             AS recall_ppm
    FROM nps LEFT JOIN appr ON appr.np = nps.np
             LEFT JOIN truth ON appr.vec_id = truth.vec_id
    GROUP BY nps.np
    """
    )


@_stage("sim_ivf_probe_curve", oracle=_probe_curve_oracle())
def sim_ivf_probe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the IVF recall-vs-N_PROBE curve: recall@{k} of
    the one-round IVF search probing 1/2/4 cells, against the J8
    brute-force truth — M241 tunes the k axis, this tunes the OTHER
    knob an IVF deployment has (probes = the scan-fraction dial:
    n_probe/cells of the corpus read per query; the curve says what
    recall each setting buys).  Hit = index top-{k} ∩ truth top-{k}.

    Composed, not copied: the oracle re-derives the inverted file
    through the SAME _LLOYD_SQL_ITER prefix the registered sim_ivf_
    topk oracle uses and wraps ORACLES['sim_topk_cosine'] for truth;
    the Spark side runs the registered ivf_topk helper per probe
    setting (the M241 single-home rule).  Scale: ×|probes| retrievals
    (each already audited); the curve arithmetic is broadcast-trivial;
    every threshold row always emitted (LEFT joins)."""
    from tropology_spark.operators.similarity import QUERY_VEC_ID, ivf_topk
    from tropology_spark.registry import QUERIES
    from tropology_spark.session import iter_materialize

    truth = iter_materialize(
        QUERIES["sim_topk_cosine"](spark, sf_dir).select(
            F.col("vec_id").alias("t_id")
        )
    )  # referenced once per probe branch
    e = load(spark, sf_dir, "embeddings")
    branches = [
        ivf_topk(e, QUERY_VEC_ID, n_probe=np, k=_PROBE_K).select(
            F.lit(np).cast("bigint").alias("n_probe"), "vec_id"
        )
        for np in _PROBE_NPS
    ]
    appr = branches[0]
    for b in branches[1:]:
        appr = appr.unionByName(b)
    nps = spark.createDataFrame([(n,) for n in _PROBE_NPS], "n_probe long")
    hits = (
        appr.join(F.broadcast(truth), appr.vec_id == F.col("t_id"), "left")
        .groupBy("n_probe")
        .agg(F.count(F.col("t_id")).cast("bigint").alias("n_hits"))
    )
    return nps.join(hits, "n_probe", "left").select(
        F.col("n_probe").cast("bigint").alias("n_probe"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        F.expr(f"(1000000 * coalesce(n_hits, 0)) div {_PROBE_K}")
        .cast("bigint")
        .alias("recall_ppm"),
    )


sim_ivf_probe_curve.__doc__ = sim_ivf_probe_curve.__doc__.format(k=_PROBE_K)


# ---------------------------------------------------------------------------
# dedup_band_curve — LSH (bands x rows) tuning curve from ONE signature pass
# ---------------------------------------------------------------------------

_BAND_CURVE_RS = (2, 4, 8)


def _band_curve_oracle() -> str:
    from tropology_spark.operators.dedup import _band_rows_cte, _minhash_sig_cte
    from tropology_spark.registry import ORACLES

    parts = [
        "WITH truth AS (SELECT doc_a, doc_b FROM ({j2}) t)".format(
            j2=ORACLES["dedup_jaccard_pairs"]
        ),
        _minhash_sig_cte(prefix=","),
    ]
    rows = []
    for r in _BAND_CURVE_RS:
        parts.append(_band_rows_cte(r, f"bands{r}"))
        parts.append(
            f""",
    cand{r} AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands{r} a JOIN bands{r} b
                 ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id),
    hit{r} AS (SELECT doc_a, doc_b FROM truth
               INTERSECT SELECT doc_a, doc_b FROM cand{r})"""
        )
        rows.append(
            f"""SELECT CAST({r} AS BIGINT) AS band_rows,
           CAST({16 // r} AS BIGINT) AS n_bands,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM cand{r}) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM hit{r}) AS BIGINT) AS n_hit,
           round(CAST((SELECT count(*) FROM hit{r}) AS DOUBLE)
                 / greatest((SELECT count(*) FROM truth), 1), 6) AS recall,
           round(CAST((SELECT count(*) FROM hit{r}) AS DOUBLE)
                 / greatest((SELECT count(*) FROM cand{r}), 1), 6) AS precision"""
        )
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(rows)


@_stage("dedup_band_curve", oracle=_band_curve_oracle())
def dedup_band_curve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the LSH BAND-CONFIGURATION tuning curve: from
    the SAME 16 min-hash signatures, evaluate the three (bands x rows)
    groupings 8x2 / 4x4 / 2x8 against the exact prefix-blocked Jaccard
    truth (J2, threshold 0.5) and report candidate volume, hits,
    recall and precision per configuration — the (b, r) axis of the
    S-curve P(candidate) = 1 - (1 - J^r)^b that M126 fixes at the
    registered 4x4 and the n_probe axis of M-ivf_probe_curve covers
    for IVF.  Fewer rows per band (r=2) recalls aggressively at the
    cost of candidate volume; r=8 is near-exact-match only.  The
    tuning table IS how an operator picks a config before committing
    a 100 TB LSH pass.

    Composed, not copied: the truth branch runs the registered J2
    pipeline; the signature pass is minhash_sigs_frame (the J3/M211
    single home, computed ONCE and checkpointed — only the cheap band
    regrouping runs per config); the candidate join is
    minhash_candidate_pairs, the exact registered path.  Counts are
    exact BIGINTs; the two ratios divide identical integers in both
    engines and are rounded once (the M126 discipline).  Scale: the
    signature pass dominates and is shared; each config adds one
    band-bucket equi-join, never an all-pairs product.

    ``docs=`` substitutes the document frame for weak-scaling probes;
    the driver contract never passes it."""
    from tropology_spark import QUERIES
    from tropology_spark.operators.dedup import (
        bands_from_sigs,
        jaccard_pairs,
        minhash_candidate_pairs,
        minhash_sigs_frame,
    )
    from tropology_spark.session import iter_materialize

    truth = iter_materialize(
        (
            jaccard_pairs(docs, block_width=40)
            if docs is not None
            else QUERIES["dedup_jaccard_pairs"](spark, sf_dir)
        ).select("doc_a", "doc_b")
    )
    sigs = iter_materialize(minhash_sigs_frame(spark, sf_dir, docs=docs))
    out = None
    for r in _BAND_CURVE_RS:
        cand = iter_materialize(
            minhash_candidate_pairs(bands_from_sigs(sigs, band_rows=r))
        )
        hit = truth.intersect(cand)
        n_true = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        n_hit = hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
        row = (
            n_true.crossJoin(n_cand)
            .crossJoin(n_hit)
            .select(
                F.lit(r).cast("bigint").alias("band_rows"),
                F.lit(16 // r).cast("bigint").alias("n_bands"),
                "n_true",
                "n_candidates",
                "n_hit",
                F.round(
                    F.col("n_hit").cast("double")
                    / F.greatest(F.col("n_true"), F.lit(1)),
                    6,
                ).alias("recall"),
                F.round(
                    F.col("n_hit").cast("double")
                    / F.greatest(F.col("n_candidates"), F.lit(1)),
                    6,
                ).alias("precision"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("band_rows")


# ---------------------------------------------------------------------------
# mm_payload_uniformity — chi-square-vs-uniform byte profile per payload
# ---------------------------------------------------------------------------

_HEX_DIGITS = "0123456789ABCDEF"


def _uniformity_terms_sql() -> str:
    """Σ over the 16 hex digits of (16·count − L)² where L =
    length(hx) — counts come from length-difference after replace(),
    so absent digits contribute L² with no enumeration at all."""
    # The deviation is lifted to BIGINT BEFORE squaring: length() is
    # 32-bit in Spark and the 16-term sum of squares exceeds INT range
    # from ~2 KB payloads (ANSI Spark raises where DuckDB widens).
    dev = (
        "(16 * CAST(length(hx) - length(replace(hx, '{d}', '')) AS BIGINT)"
        " - length(hx))"
    )
    return " + ".join(f"{dev.format(d=d)} * {dev.format(d=d)}" for d in _HEX_DIGITS)


@_stage(
    "mm_payload_uniformity",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             hex(encode(text)) AS hx
      FROM documents
      WHERE octet_length(encode(text)) > 0
    )
    SELECT media_id, n_bytes,
           CAST({_uniformity_terms_sql()} AS BIGINT) AS dev2_sum,
           CAST(1000 * ({_uniformity_terms_sql()}) AS BIGINT)
             // (16 * length(hx)) AS chisq_milli
    FROM m
    """,
)
def mm_payload_uniformity(spark, sf_dir: str) -> DataFrame:
    """Staged M-row — BYTE-UNIFORMITY profile per payload: the exact
    chi-square-vs-uniform statistic over the 16 hex digits of the
    payload's hex encoding, the standard compressed/encrypted-asset
    detector (already-compressed payloads score near the df=15
    expectation ~15 000 milli; text/structured assets score orders of
    magnitude higher) — the triage a media pipeline runs BEFORE
    spending codec or compression work, on the same hex substrate as
    M185/M199.

    Integer-exact with no enumeration: each digit count is
    length(hx) − length(replace(hx, d, '')) — 16 scalar expressions
    per row, identical in both engines — and absent digits fall out
    of the algebra ((16·0 − L)² = L²) instead of needing a
    domain-completion join.  dev2_sum = Σ(16·c_d − L)² = 16L·χ²;
    chisq_milli = 1000·dev2_sum div (16L) is the exact milli-χ²
    (non-negative numerator: DuckDB // and Spark div agree).  BIGINT
    bound: dev2_sum ≤ 240·L², so the 1000× carrier is exact for
    payloads up to ~3 MB — beyond that, switch the carrier to
    DECIMAL(38,0)/HUGEINT per the wide-integer finale rule.
    Scale: a pure scan-side projection — no shuffle, no explode, no
    payload movement."""
    from tropology_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    m = docs.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("n_bytes"),
        F.hex(F.encode(F.col("text"), "UTF-8")).alias("hx"),
    ).filter(F.col("n_bytes") > 0)
    terms = _uniformity_terms_sql()
    return m.select(
        "media_id",
        "n_bytes",
        F.expr(f"CAST({terms} AS BIGINT)").alias("dev2_sum"),
        F.expr(f"CAST(1000 * ({terms}) AS BIGINT) div (16 * length(hx))")
        .cast("bigint")
        .alias("chisq_milli"),
    )


# ---------------------------------------------------------------------------
# mm_phash_clusters — visual near-dup clusters over the M99 pHash graph
# ---------------------------------------------------------------------------


def _phash_clusters_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return (
        """
    WITH cand AS (SELECT id_a AS doc_a, id_b AS doc_b FROM ({ph}) p),
    und AS (SELECT doc_a AS u, doc_b AS v FROM cand
            UNION ALL SELECT doc_b, doc_a FROM cand),
    l0 AS (SELECT doc_id, doc_id AS lbl FROM documents),""".format(
            ph=ORACLES["mm_phash_hamming"]
        )
        + _minlabel_steps_sql(3)
        + """
    , siz AS (SELECT lbl, count(*) AS n FROM l3 GROUP BY lbl)
    SELECT l3.doc_id, CAST(l3.lbl AS BIGINT) AS phash_cluster,
           CAST(siz.n AS BIGINT) AS cluster_size
    FROM l3 JOIN siz ON l3.lbl = siz.lbl
    """
    )


@_stage("mm_phash_clusters", oracle=_phash_clusters_oracle())
def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — VISUAL near-dup cluster assignment: 3-round
    min-label propagation over the M99 perceptual-hash Hamming graph
    (banded LSH candidates at distance ≤ 3), emitting every asset's
    cluster representative AND its cluster size — M99 emits PAIRS;
    a media dedup DROP stage needs the transitive grouping plus the
    size (keep 1 per cluster ⇒ drop budget = Σ(size − 1)), exactly
    the dedup_cluster3 argument applied to the multimodal corpus.

    Composed, not copied: the candidate graph is the registered
    mm_phash_hamming pipeline (oracle composed verbatim); the
    propagation is minlabel_rounds / _minlabel_steps_sql — the SAME
    single-home arithmetic dedup_cluster3 uses, differing only in the
    input graph.  Scale: the pair graph is banded (never all-pairs;
    band width grows with log2(n) at corpus scale — the M99 note);
    each round is one shuffle on the asset key; the label vector is
    checkpointed per round (DOUBLE-REFERENCE rule), and the size
    rollup is one map-side-combinable groupBy.  Unlike the LSH
    near-clique components, pHash band chains can exceed diameter 3 —
    partial labels after the bounded unroll are the documented
    stepping-stone semantics (full convergence = the registered M8
    operator), and the twin pins exact 3-hop-ball convergence."""
    from tropology_spark import QUERIES
    from tropology_spark.session import iter_materialize
    from tropology_spark.sources.tables import load

    pairs = QUERIES["mm_phash_hamming"](spark, sf_dir).select("id_a", "id_b")
    und = iter_materialize(
        pairs.select(
            F.col("id_a").alias("u"), F.col("id_b").alias("v")
        ).unionAll(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    )  # referenced by all three rounds
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("lbl")
    )
    lab = minlabel_rounds(lab, und, 3)
    siz = lab.groupBy("lbl").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return lab.join(siz, "lbl").select(
        "doc_id",
        F.col("lbl").cast("bigint").alias("phash_cluster"),
        F.col("n").alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# agg_hll_audit — HyperLogLog register audit with an exact dyadic estimate
# ---------------------------------------------------------------------------

#: HLL geometry: b = 4 bucket bits (one md5 hex digit) -> m = 16
#: registers; rho is measured over the NEXT 32 hash bits (8 hex
#: chars), so rho in [1, 33] and an empty register carries 0.
_HLL_M = 16
#: alpha_16 = 0.673 carried as a /1000 fixed point, and the whole raw
#: estimate kept integral: E = alpha*m^2 / sum(2^-rho_j).  With
#: S = sum_j 2^(33 - M_j) (an integer, since M_j <= 33) the estimate
#: is exactly (673 * m^2 * 2^33) div (1000 * S) — a dyadic-rational
#: carrier, no float anywhere (the KMV-estimate discipline applied to
#: HLL's harmonic mean).
_HLL_NUM = 673 * _HLL_M * _HLL_M * (1 << 33)


@_stage(
    "agg_hll_audit",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority,
             ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1))::BIGINT
               AS bucket,
             ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 2, 8))::BIGINT
               AS w
      FROM orders),
    regs AS (
      SELECT o_orderpriority, bucket,
             max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS m
      FROM h GROUP BY o_orderpriority, bucket),
    spine AS (
      SELECT g.o_orderpriority, s.b AS bucket
      FROM (SELECT DISTINCT o_orderpriority FROM orders) g,
           (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS b) s),
    full_regs AS (
      SELECT spine.o_orderpriority, spine.bucket, coalesce(regs.m, 0) AS m0
      FROM spine LEFT JOIN regs
        ON spine.o_orderpriority = regs.o_orderpriority
       AND spine.bucket = regs.bucket),
    agg AS (
      SELECT o_orderpriority,
             CAST(sum(1::BIGINT << (33 - m0)) AS BIGINT) AS s_carrier,
             CAST(sum(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty
      FROM full_regs GROUP BY o_orderpriority),
    ex AS (SELECT o_orderpriority,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
           FROM orders GROUP BY o_orderpriority),
    est AS (
      SELECT agg.o_orderpriority, ex.n_exact, agg.v_empty, agg.s_carrier,
             CAST({_HLL_NUM} // (1000 * agg.s_carrier) AS BIGINT) AS hll_est
      FROM agg JOIN ex ON agg.o_orderpriority = ex.o_orderpriority)
    SELECT o_orderpriority, n_exact, v_empty, s_carrier, hll_est,
           CAST((1000000 * hll_est) // n_exact AS BIGINT) AS ratio_ppm
    FROM est
    """,
)
def agg_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — HyperLogLog distinct-count audit, the one
    canonical mergeable sketch the family (KMV M138/M161/M214, bitmap
    M97, CMS M128, quantile M175) did not yet cover: per order
    priority, the m=16 max-rho register vector summarized to its
    dyadic harmonic-sum carrier, the raw HLL estimate, and the
    estimate/exact ratio in ppm.

    All integer arithmetic end to end: bucket = first md5 hex digit,
    rho = 33 - bit_length of the next 32 hash bits (length(bin(w)) —
    both engines agree exactly), registers max-merge, and the
    harmonic mean is carried as S = sum 2^(33-M_j) so the alpha*m^2/S
    estimate is one integral division (no float, no engine libm — the
    cross-engine float rule).  Empty registers enter as M_j = 0 via a
    16-slot spine (explode of a bounded literal sequence, no join
    blowup), exactly the standard-HLL convention, and v_empty is
    emitted so a consumer can see when the linear-counting regime
    (many empty registers) applies.

    Scale: register max-merge is map-side combinable (the entire point
    of HLL at 100 TB — per-partition partials are 16 bytes and merge
    associatively, vs D3's expand-mode raw-key reshuffle); one shuffle
    on (group, bucket), one on group; the exact side exists only
    because this is an AUDIT."""
    o = load(spark, sf_dir, "orders")
    md = F.md5(F.col("o_custkey").cast("string"))
    h = o.select(
        "o_orderpriority",
        F.conv(F.substring(md, 1, 1), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring(md, 2, 8), 16, 10).cast("bigint").alias("w"),
        "o_custkey",
    )
    regs = h.groupBy("o_orderpriority", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(33)).otherwise(
                F.lit(33) - F.length(F.bin("w"))
            )
        ).alias("m")
    )
    spine = (
        o.select("o_orderpriority")
        .distinct()
        .select(
            "o_orderpriority",
            F.expr(f"explode(sequence(0L, {_HLL_M - 1}L))").alias("bucket"),
        )
    )
    full = spine.join(regs, ["o_orderpriority", "bucket"], "left").withColumn(
        "m0", F.coalesce(F.col("m"), F.lit(0))
    )
    agg = full.groupBy("o_orderpriority").agg(
        F.sum(F.expr("shiftleft(1L, CAST(33 - m0 AS INT))"))
        .cast("bigint")
        .alias("s_carrier"),
        F.sum(F.when(F.col("m0") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v_empty"),
    )
    ex = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_exact")
    )
    return (
        agg.join(ex, "o_orderpriority")
        .withColumn(
            "hll_est",
            F.expr(f"CAST({_HLL_NUM} div (1000 * s_carrier) AS BIGINT)"),
        )
        .withColumn(
            "ratio_ppm",
            F.expr("CAST((1000000 * hll_est) div n_exact AS BIGINT)"),
        )
        .select(
            "o_orderpriority", "n_exact", "v_empty", "s_carrier",
            "hll_est", "ratio_ppm",
        )
    )


# ---------------------------------------------------------------------------
# text_simpson_concentration — exact-integer lexical concentration
# ---------------------------------------------------------------------------


@_stage(
    "text_simpson_concentration",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    c AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
          FROM tok WHERE token <> '' GROUP BY doc_id, token),
    per AS (SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(c * (c - 1)) AS BIGINT) AS s2
            FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct, s2,
           CAST(CASE WHEN n_tokens >= 2
                     THEN (1000000 * s2) // (n_tokens * (n_tokens - 1))
                     ELSE 0 END AS BIGINT) AS simpson_ppm
    FROM per
    """,
)
def text_simpson_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — per-document Simpson concentration (unbiased
    token collision probability sum c_i(c_i-1) / N(N-1), in ppm): the
    exact-integer lexical-diversity quality signal.  Complements M5
    (plain token counts) and M28 (bigram repetition): Simpson reacts
    to a skewed unigram DISTRIBUTION (one token dominating) that both
    of those miss — the classic low-quality signature of keyword-spam
    and template pages — and 1/Simpson is the effective vocabulary
    size filter pipelines threshold on.

    The unbiased (sampling-without-replacement) form keeps the whole
    statistic in BIGINT: numerator and denominator are integer
    products, one ppm-scaled integral division at the end (DuckDB //
    and Spark div agree — both operands non-negative).  The s2 carrier
    is emitted so downstream can re-derive any rescaling exactly.

    Scale: tokenize -> per-(doc,token) count (map-side combinable) ->
    per-doc rollup; two shuffles on doc-keyed rows, no joins, no
    windows — embarrassingly parallel over documents."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    c = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    per = c.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("s2"),
    )
    return per.select(
        "doc_id", "n_tokens", "n_distinct", "s2",
        F.expr(
            "CAST(CASE WHEN n_tokens >= 2 THEN (1000000 * s2)"
            " div (n_tokens * (n_tokens - 1)) ELSE 0 END AS BIGINT)"
        ).alias("simpson_ppm"),
    )


# ---------------------------------------------------------------------------
# dedup_method_overlap — cross-method dedup Venn profile (composed)
# ---------------------------------------------------------------------------


def _method_overlap_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return """
    WITH ex AS ({ex}),
    mh AS ({mh}),
    sh AS ({sh}),
    ng AS ({ng}),
    flags AS (
      SELECT 'exact' AS method, d.doc_id
      FROM documents d JOIN ex
        ON md5(d.text) = ex.text_hash AND d.doc_id > ex.keep_doc_id
      UNION ALL SELECT 'minhash', doc_b FROM mh
      UNION ALL SELECT 'simhash', doc_b FROM sh
      UNION ALL SELECT 'ngram', doc_b FROM ng
    ),
    bm AS (
      SELECT doc_id,
             max(CASE WHEN method = 'exact' THEN 1 ELSE 0 END) AS f_exact,
             max(CASE WHEN method = 'minhash' THEN 1 ELSE 0 END) AS f_minhash,
             max(CASE WHEN method = 'simhash' THEN 1 ELSE 0 END) AS f_simhash,
             max(CASE WHEN method = 'ngram' THEN 1 ELSE 0 END) AS f_ngram
      FROM flags GROUP BY doc_id)
    SELECT CAST(f_exact AS BIGINT) AS f_exact,
           CAST(f_minhash AS BIGINT) AS f_minhash,
           CAST(f_simhash AS BIGINT) AS f_simhash,
           CAST(f_ngram AS BIGINT) AS f_ngram,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM bm GROUP BY f_exact, f_minhash, f_simhash, f_ngram
    """.format(
        ex=ORACLES["dedup_exact"],
        mh=ORACLES["dedup_minhash_lsh"],
        sh=ORACLES["dedup_simhash"],
        ng=ORACLES["dedup_ngram_jaccard"],
    )


@_stage("dedup_method_overlap", oracle=_method_overlap_oracle())
def dedup_method_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — which dedup families flag which documents: the
    per-doc drop-side flag under each of the four text methods (exact
    md5, MinHash-LSH candidates, SimHash Hamming<=6, trigram Jaccard
    >=0.4) rolled up to the full Venn combination profile (flag
    bitmap -> doc count + min doc id anchor).  The audit a curation
    team runs before ordering a cascade: a method whose flags are a
    subset of a cheaper method's is redundant; the exclusive cells
    are each stage's marginal contribution.

    Composed, not copied: all four flag sets come from the REGISTERED
    pipelines — QUERIES on the Spark side (sharing the session's
    minhash-band and simhash signature caches), ORACLES verbatim on
    the DuckDB side (the dedup_lsh_recall rule).  Drop-side
    convention: a doc is flagged if it is the LARGER id of a candidate
    pair (keep-smallest), and for exact groups every non-representative
    copy.

    Scale: every underlying method is banded/blocked (never
    all-pairs); the overlay adds one union + two doc-keyed
    map-side-combinable groupBys — the profile itself is O(2^4)
    rows."""
    from tropology_spark import QUERIES

    docs = load(spark, sf_dir, "documents")
    ex = QUERIES["dedup_exact"](spark, sf_dir)
    exact_flagged = docs.join(
        ex,
        (F.md5(F.col("text")) == F.col("text_hash"))
        & (F.col("doc_id") > F.col("keep_doc_id")),
    ).select(F.lit("exact").alias("method"), "doc_id")
    flagged = exact_flagged
    for method, qname in (
        ("minhash", "dedup_minhash_lsh"),
        ("simhash", "dedup_simhash"),
        ("ngram", "dedup_ngram_jaccard"),
    ):
        flagged = flagged.unionAll(
            QUERIES[qname](spark, sf_dir).select(
                F.lit(method).alias("method"), F.col("doc_b").alias("doc_id")
            )
        )
    bm = flagged.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("method") == m, 1).otherwise(0)).alias(f"f_{m}")
            for m in ("exact", "minhash", "simhash", "ngram")
        ]
    )
    return bm.groupBy(
        *[F.col(f"f_{m}").cast("bigint").alias(f"f_{m}")
          for m in ("exact", "minhash", "simhash", "ngram")]
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )
