"""STAGED round-20 operators — implemented and parity-tested, NOT yet
registered (the round-8..19 staging pattern, tenth application).

The round-13 window executed and the round-14..19 slates are already
banked; these NINE bodies target ROUND 20 — the final round's
activation bank, completing the staged roadmap.  Same (fn, oracle)
contract as the registry; activation is the mechanical move +
five-fold lockstep.  tests/test_staged_r20.py runs the driver-replica
compare at both verification scales, Python twins for the
formula-bearing ops, hypothesis property suites on the exact staged
paths, the partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- dedup_simhash_hd_curve — near-dup pair and flagged-doc counts at
  Hamming thresholds 2/4/6 from the ONE registered M1 pair pass
  (thresholds nest — the curve-over-prefix rule on the distance
  axis): the precision knob every SimHash deployment tunes.
- mm_phash_hd_curve — the same threshold curve on the M99 perceptual
  hash over binary payloads (the multimodal cousin).
- pipeline_token_budget_curve — kept docs / used tokens at per-source
  budgets 125/500/2000 from ONE cumulative pass over the SAME
  md5-shuffle order M108 pins (kept sets nest with the budget).
- ts_changepoint_split — the exact best single split of each type's
  daily series by the cleared between-group variance argmax (the
  binary-segmentation primitive; M88's CUSUM flags a threshold
  crossing, this finds the OPTIMAL breakpoint).
- analytics_simpson_flip_audit — per-nation mean-gap signs vs the
  pooled sign (the Simpson's-paradox screen: strata disagreeing with
  the pooled readout are the aggregation trap).
- agg_quantile_sample_curve — sampled p50/p90 of ship latency at md5
  row-sample moduli 1/4/16 vs the full truth — quantiles survive row
  sampling approximately where distinct counts (r17 curve) do not:
  the two curves together are the "what can be sampled" cheat sheet.
- dedup_prefix_key_curve — exact-dup detection under prefix-hash keys
  of length 64/256/1024 chars vs the full-text truth: groups, flagged
  docs and FALSE MERGES per length (the cheap-key economics; flag
  sets nest as prefixes shorten).
- dedup_cluster_size_hist — the cluster-size histogram of the M261
  near-dup families (how big do dup families get — the report a
  dedup rollout ships first).
- ts_dow_anova_terms — day-of-week ANOVA decomposition integers over
  daily counts (the weekly-seasonality companion of the r18
  hour-of-day terms).
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
# dedup_simhash_hd_curve — pair/doc counts vs Hamming threshold
# ---------------------------------------------------------------------------

_SHC_TS = (2, 4, 6)


def _simhash_hd_oracle() -> str:
    from tropology_spark.registry import ORACLES

    ts = ", ".join(str(t) for t in _SHC_TS)
    return f"""
    WITH pairs AS MATERIALIZED ({ORACLES["dedup_simhash"]}),
    pt AS (
      SELECT t.t, pairs.doc_a, pairs.doc_b
      FROM pairs JOIN (SELECT unnest([{ts}]) AS t) t
        ON pairs.hamming <= t.t
    ),
    fl AS (
      SELECT t, doc_a AS doc_id FROM pt
      UNION SELECT t, doc_b FROM pt
    )
    SELECT CAST(pt.t AS BIGINT) AS hd_max,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(any_value(f.n_flagged) AS BIGINT) AS n_docs_flagged
    FROM pt JOIN (SELECT t, CAST(count(*) AS BIGINT) AS n_flagged
                  FROM fl GROUP BY t) f ON f.t = pt.t
    GROUP BY pt.t
    """


@_stage("dedup_simhash_hd_curve", oracle=_simhash_hd_oracle())
def dedup_simhash_hd_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged M-row — the SimHash HAMMING-THRESHOLD curve: near-dup
    pair counts and distinct flagged-document counts at distance
    thresholds 2/4/6, all derived from the ONE registered M1 pair
    pass (M1 emits every banded pair at hamming ≤ 6, so every curve
    point is a FILTER of the same frame — the curve-over-prefix rule
    on the distance axis; thresholds nest, twin-pinned) — the
    precision-vs-recall knob a SimHash dedup deployment tunes, next
    to the MinHash (b,r) curve M264 and the k curve (r16 slate).

    Composed, not copied: QUERIES['dedup_simhash'] IS the pair frame
    (checkpointed once — the pair rollup AND the flagged-doc distinct
    both read it); the oracle wraps ORACLES['dedup_simhash'] AS
    MATERIALIZED.  Scale: bounded by the M1 candidate set; the ×3
    threshold axis rides an explode on the pair rows."""
    from tropology_spark.registry import QUERIES

    pairs = iter_materialize(QUERIES["dedup_simhash"](spark, sf_dir))
    pt = pairs.select(
        "doc_a",
        "doc_b",
        "hamming",
        F.explode(F.array(*[F.lit(t) for t in _SHC_TS])).alias("t"),
    ).filter(F.col("hamming") <= F.col("t"))
    np = pt.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    fl = (
        pt.select("t", F.col("doc_a").alias("doc_id"))
        .unionByName(pt.select("t", F.col("doc_b").alias("doc_id")))
        .distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_flagged"))
    )
    return np.join(fl, "t").select(
        F.col("t").cast("bigint").alias("hd_max"), "n_pairs", "n_docs_flagged"
    )


# ---------------------------------------------------------------------------
# mm_phash_hd_curve — the threshold curve on the perceptual hash
# ---------------------------------------------------------------------------

_PHC_TS = (2, 4, 6)


def _phash_hd_oracle() -> str:
    from tropology_spark.registry import ORACLES

    ts = ", ".join(str(t) for t in _PHC_TS)
    return f"""
    WITH pairs AS MATERIALIZED ({ORACLES["mm_phash_hamming"]}),
    pt AS (
      SELECT t.t, pairs.id_a, pairs.id_b
      FROM pairs JOIN (SELECT unnest([{ts}]) AS t) t
        ON pairs.hamming <= t.t
    ),
    fl AS (
      SELECT t, id_a AS doc_id FROM pt
      UNION SELECT t, id_b FROM pt
    )
    SELECT CAST(pt.t AS BIGINT) AS hd_max,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(any_value(f.n_flagged) AS BIGINT) AS n_docs_flagged
    FROM pt JOIN (SELECT t, CAST(count(*) AS BIGINT) AS n_flagged
                  FROM fl GROUP BY t) f ON f.t = pt.t
    GROUP BY pt.t
    """


@_stage("mm_phash_hd_curve", oracle=_phash_hd_oracle())
def mm_phash_hd_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the PERCEPTUAL-HASH threshold curve: the
    dedup_simhash_hd_curve construction applied to M99's pHash pair
    frame over binary payloads — near-dup media pair and flagged-item
    counts at Hamming 2/4/6 from one banded pass (thresholds nest).
    Together with the SimHash curve this prices the text and media
    dedup knobs with the same ruler.

    Composed, not copied: QUERIES['mm_phash_hamming'] checkpointed
    once; the oracle wraps ORACLES['mm_phash_hamming'] AS
    MATERIALIZED.  Scale: bounded by the M99 banded candidate set."""
    from tropology_spark.registry import QUERIES

    pairs = iter_materialize(QUERIES["mm_phash_hamming"](spark, sf_dir))
    pt = pairs.select(
        "id_a",
        "id_b",
        "hamming",
        F.explode(F.array(*[F.lit(t) for t in _PHC_TS])).alias("t"),
    ).filter(F.col("hamming") <= F.col("t"))
    np = pt.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    fl = (
        pt.select("t", F.col("id_a").alias("doc_id"))
        .unionByName(pt.select("t", F.col("id_b").alias("doc_id")))
        .distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_flagged"))
    )
    return np.join(fl, "t").select(
        F.col("t").cast("bigint").alias("hd_max"), "n_pairs", "n_docs_flagged"
    )


# ---------------------------------------------------------------------------
# dedup_cluster_size_hist — near-dup family size distribution
# ---------------------------------------------------------------------------


def _cluster_size_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH cl AS MATERIALIZED ({ORACLES["dedup_cluster3"]}),
    sz AS (SELECT label3, CAST(count(*) AS BIGINT) AS size FROM cl
           GROUP BY label3)
    SELECT size AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(size * count(*) AS BIGINT) AS n_docs,
           CAST(min(label3) AS BIGINT) AS first_label
    FROM sz GROUP BY size
    """


@_stage("dedup_cluster_size_hist", oracle=_cluster_size_oracle())
def dedup_cluster_size_hist(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the near-dup FAMILY-SIZE histogram: cluster
    sizes of the M261 3-round min-label assignment rolled up to (size,
    number of clusters, docs covered) — the first report every dedup
    rollout ships (size-1 clusters are unique docs; the mass in
    size ≥ 2 families is the dedup savings; a giant family is a
    boilerplate template to whitelist).

    Composed, not copied: QUERIES['dedup_cluster3'] IS the assignment
    (its propagation already rides iter_materialize); the oracle
    wraps ORACLES['dedup_cluster3'] AS MATERIALIZED.  Scale: two
    map-side rollups over the assignment frame.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    from tropology_spark.registry import QUERIES

    cl = QUERIES["dedup_cluster3"](spark, sf_dir, docs=docs)
    sz = cl.groupBy("label3").agg(F.count(F.lit(1)).cast("bigint").alias("size"))
    return sz.groupBy(F.col("size").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.first("size") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
        F.min("label3").cast("bigint").alias("first_label"),
    )


# ---------------------------------------------------------------------------
# ts_dow_anova_terms — day-of-week ANOVA decomposition terms
# ---------------------------------------------------------------------------


@_stage(
    "ts_dow_anova_terms",
    oracle="""
    WITH dc AS (
      SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(d % 7 AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_k,
           CAST(sum(c) AS BIGINT) AS s_k,
           CAST(sum(c * c) AS BIGINT) AS ssq_k,
           CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS BIGINT)
             AS within_num
    FROM dc GROUP BY event_type, d % 7
    """,
)
def ts_dow_anova_terms(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — DAY-OF-WEEK ANOVA decomposition integers over
    the daily activity series: per (type, dow) the group size, sum,
    sum of squares and the cleared within-group scatter — the weekly-
    seasonality strength inputs, completing the r18 hour-of-day terms
    one level up the calendar (dow = epoch-day mod 7, so dow 0 is
    Thursday — a fixed deterministic labeling in both engines, which
    is all a strength statistic needs).  Observed days only (the gap
    rule).

    Headroom (the ADVICE-r18 sibling fix, applied in-bank):
    within_num's products are formed on DECIMAL(38,0) carriers so the
    Spark side matches the oracle's HUGEINT-wide intermediates — both
    engines bind only at the final BIGINT cast (the widen-before-sum
    rule's product form, same as the activated M341).

    Scale: two nested map-side rollups; no joins, no windows.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    dc = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return dc.groupBy(
        "event_type", (F.col("d") % 7).cast("bigint").alias("dow")
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
# analytics_simpson_flip_audit — stratum signs vs the pooled sign
# ---------------------------------------------------------------------------


@_stage(
    "analytics_simpson_flip_audit",
    oracle="""
    WITH x AS (
      SELECT c.c_nationkey AS nat,
             CASE WHEN substring(md5(CAST(o.o_custkey AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ia,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    s AS (
      SELECT nat,
             CAST(sum(ia) AS BIGINT) AS na,
             CAST(sum(1 - ia) AS BIGINT) AS nb,
             CAST(sum(ia * cents) AS BIGINT) AS s1a,
             CAST(sum((1 - ia) * cents) AS BIGINT) AS s1b
      FROM x GROUP BY nat
    ),
    g AS (
      SELECT nat, na, nb,
             CAST(s1a AS HUGEINT) * nb - CAST(s1b AS HUGEINT) * na AS dnum,
             sum(CAST(s1a AS HUGEINT)) OVER () AS ta,
             sum(CAST(s1b AS HUGEINT)) OVER () AS tb,
             sum(na) OVER () AS tna,
             sum(nb) OVER () AS tnb
      FROM s
    )
    SELECT CAST(nat AS BIGINT) AS nationkey, na, nb,
           CAST(dnum AS BIGINT) AS dnum,
           CAST(sign(dnum) AS BIGINT) AS stratum_sign,
           CAST(sign(ta * tnb - tb * tna) AS BIGINT) AS pooled_sign,
           CAST(CASE WHEN sign(dnum) = sign(ta * tnb - tb * tna)
                     THEN 1 ELSE 0 END AS BIGINT) AS agrees
    FROM g
    """,
)
def analytics_simpson_flip_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged M-row — the SIMPSON'S-PARADOX screen: per customer
    nation, the SIGN of the md5-split mean-value gap (carried as the
    division-free cross-multiplied numerator s1a·nb − s1b·na — exact
    and signed) next to the POOLED sign over all nations, with the
    agreement flag — strata that disagree with the pooled readout are
    the aggregation trap every experiment review must check before
    shipping a pooled conclusion (the pooled gap can flip against
    every stratum when group sizes confound).

    Division-free throughout: comparing means is comparing
    cross-products, so no gap is ever divided and no shift constant
    is needed.  Scale: one join onto the customer dim (broadcastable),
    one |nations|-row rollup, pooled terms via the pmod-free OVER ()
    in the oracle and the pmod-constant window on the Spark side."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("nat")
    )
    x = o.join(F.broadcast(c), "o_custkey").select(
        "nat",
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) < "8", 1
        )
        .otherwise(0)
        .alias("ia"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    s = x.groupBy("nat").agg(
        F.sum("ia").cast("bigint").alias("na"),
        F.sum(F.lit(1) - F.col("ia")).cast("bigint").alias("nb"),
        F.sum(F.col("ia") * F.col("cents")).cast("bigint").alias("s1a"),
        F.sum((F.lit(1) - F.col("ia")) * F.col("cents"))
        .cast("bigint")
        .alias("s1b"),
    )
    w = Window.partitionBy(F.pmod(F.col("nat"), F.lit(1)))
    g = s.select(
        "nat",
        "na",
        "nb",
        F.expr(
            "CAST(s1a AS DECIMAL(38,0)) * nb - CAST(s1b AS DECIMAL(38,0)) * na"
        ).alias("dnum"),
        F.sum(F.expr("CAST(s1a AS DECIMAL(38,0))")).over(w).alias("ta"),
        F.sum(F.expr("CAST(s1b AS DECIMAL(38,0))")).over(w).alias("tb"),
        F.sum("na").over(w).alias("tna"),
        F.sum("nb").over(w).alias("tnb"),
    )
    return g.select(
        F.col("nat").cast("bigint").alias("nationkey"),
        "na",
        "nb",
        F.col("dnum").cast("bigint").alias("dnum"),
        F.signum(F.col("dnum")).cast("bigint").alias("stratum_sign"),
        F.signum(F.col("ta") * F.col("tnb") - F.col("tb") * F.col("tna"))
        .cast("bigint")
        .alias("pooled_sign"),
        F.when(
            F.signum(F.col("dnum"))
            == F.signum(F.col("ta") * F.col("tnb") - F.col("tb") * F.col("tna")),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("agrees"),
    )


# ---------------------------------------------------------------------------
# agg_quantile_sample_curve — sampled quantile error vs sample rate
# ---------------------------------------------------------------------------

_QSC_MODS = (1, 4, 16)


@_stage(
    "agg_quantile_sample_curve",
    oracle=f"""
    WITH g AS (
      SELECT CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                  AS BIGINT) AS lat_days,
             ('0x' || substring(md5(CAST(l.l_orderkey AS VARCHAR) || '_'
                                    || CAST(l.l_linenumber AS VARCHAR)), 1, 8))
               ::BIGINT AS hk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sm AS (
      SELECT s.s, g.lat_days
      FROM g JOIN (SELECT unnest([{", ".join(str(s) for s in _QSC_MODS)}]) AS s) s
        ON g.hk % s.s = 0
    ),
    c AS (SELECT s, lat_days, CAST(count(*) AS BIGINT) AS cnt
          FROM sm GROUP BY 1, 2),
    w AS (
      SELECT s, lat_days, cnt,
             CAST(sum(cnt) OVER (PARTITION BY s ORDER BY lat_days) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER (PARTITION BY s) AS BIGINT) AS n
      FROM c
    ),
    q AS (
      SELECT CAST(s AS BIGINT) AS s, CAST(any_value(n) AS BIGINT) AS n_rows,
             CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN lat_days END)
                  AS BIGINT) AS p50,
             CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN lat_days END)
                  AS BIGINT) AS p90
      FROM w GROUP BY s
    )
    SELECT s, n_rows, p50, p90,
           CAST(p50 - max(CASE WHEN s = 1 THEN p50 END) OVER () AS BIGINT)
             AS err50_days,
           CAST(p90 - max(CASE WHEN s = 1 THEN p90 END) OVER () AS BIGINT)
             AS err90_days
    FROM q
    """,
)
def agg_quantile_sample_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged M-row — the SAMPLED-QUANTILE error curve: exact p50/p90
    of ship latency computed on md5 row samples at moduli 1/4/16
    (nested samples — the r17 distinct-curve discipline) next to the
    full truth, with signed errors in whole days (differences of
    exact rank picks, NO division) — the companion lesson to
    agg_distinct_sample_curve: quantiles of a well-populated
    distribution survive row sampling approximately, distinct counts
    do not; the two curves together are the planner's
    what-can-be-sampled cheat sheet.

    Quantiles via the M196 bounded-domain counting idiom per sample
    (the latency domain is ~130 values; the cumulative window rides
    the real (s) key).  Scale: one join + one hash pass; the ×3
    modulus axis explodes rows into per-sample counts — map-side
    combinable."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    g = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("lat_days"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("l_orderkey").cast("string"),
                        F.lit("_"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hk"),
    )
    sm = g.select(
        "lat_days",
        "hk",
        F.explode(F.array(*[F.lit(s) for s in _QSC_MODS])).alias("s"),
    ).filter(F.col("hk") % F.col("s") == 0)
    c = sm.groupBy("s", "lat_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ws = Window.partitionBy("s")
    wq = c.select(
        "s",
        "lat_days",
        F.sum("cnt").over(ws.orderBy("lat_days")).cast("bigint").alias("cum"),
        F.sum("cnt").over(ws).cast("bigint").alias("n"),
    )
    q = wq.groupBy(F.col("s").cast("bigint").alias("s")).agg(
        F.first("n").cast("bigint").alias("n_rows"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("lat_days")))
        .cast("bigint")
        .alias("p50"),
        F.min(
            F.when(F.col("cum") >= F.expr("(9 * n + 9) div 10"), F.col("lat_days"))
        )
        .cast("bigint")
        .alias("p90"),
    )
    wt = Window.partitionBy(F.pmod(F.col("s"), F.lit(1)))
    return q.select(
        "s",
        "n_rows",
        "p50",
        "p90",
        (F.col("p50") - F.max(F.when(F.col("s") == 1, F.col("p50"))).over(wt))
        .cast("bigint")
        .alias("err50_days"),
        (F.col("p90") - F.max(F.when(F.col("s") == 1, F.col("p90"))).over(wt))
        .cast("bigint")
        .alias("err90_days"),
    )


# ---------------------------------------------------------------------------
# pipeline_token_budget_curve — kept mass vs per-source budget
# ---------------------------------------------------------------------------

_TBC_BUDGETS = (125, 500, 2000)  # M108's 500 is the middle point


def _budget_curve_oracle() -> str:
    from tropology_spark.registry import ORACLES

    bs = ", ".join(str(b) for b in _TBC_BUDGETS)
    return f"""
    WITH tb AS MATERIALIZED ({ORACLES["pipeline_token_budget"]}),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM tb),
    per AS (
      SELECT b.b,
             CAST(count(CASE WHEN tb.cum_tokens <= b.b THEN 1 END) AS BIGINT)
               AS n_docs_kept,
             CAST(coalesce(sum(CASE WHEN tb.cum_tokens <= b.b
                                    THEN tb.n_tokens END), 0) AS BIGINT)
               AS tokens_used
      FROM tb CROSS JOIN (SELECT unnest([{bs}]) AS b) b
      GROUP BY b.b
    )
    SELECT CAST(per.b AS BIGINT) AS budget, per.n_docs_kept, per.tokens_used,
           tot.total_tokens,
           CAST((1000000 * per.tokens_used) // tot.total_tokens AS BIGINT)
             AS kept_ppm
    FROM per CROSS JOIN tot
    """


@_stage("pipeline_token_budget_curve", oracle=_budget_curve_oracle())
def pipeline_token_budget_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Staged M-row — the TOKEN-BUDGET curve: kept documents and used
    tokens at per-source budgets 125/500/2000 (M108's fixed 500 is
    the middle point), all derived from the ONE registered cumulative
    pass — the kept set at a smaller budget is a PREFIX of the kept
    set at a larger one under the SAME pinned md5-shuffle order (the
    curve-over-prefix rule on the budget axis, twin-pinned nesting),
    so pricing the training-mix size costs nothing beyond the rollup.

    Composed, not copied: QUERIES['pipeline_token_budget'] IS the
    cumulative frame (checkpointed once — the per-budget rollup AND
    the corpus total read it); the oracle wraps
    ORACLES['pipeline_token_budget'] AS MATERIALIZED.  The ×3 budget
    axis rides an explode on the cumulative rows; the 1-row corpus
    total attaches via the pmod-constant window (no scalar cross on
    the Spark side)."""
    from tropology_spark.registry import QUERIES

    tb = iter_materialize(QUERIES["pipeline_token_budget"](spark, sf_dir))
    per = (
        tb.select(
            "n_tokens",
            "cum_tokens",
            F.explode(F.array(*[F.lit(b) for b in _TBC_BUDGETS])).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.count(F.when(F.col("cum_tokens") <= F.col("b"), 1))
            .cast("bigint")
            .alias("n_docs_kept"),
            F.coalesce(
                F.sum(
                    F.when(F.col("cum_tokens") <= F.col("b"), F.col("n_tokens"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tokens_used"),
            F.sum("n_tokens").cast("bigint").alias("grp_tokens"),
        )
    )
    w = Window.partitionBy(F.pmod(F.col("b"), F.lit(1)))
    return per.withColumn(
        "total_tokens", F.max("grp_tokens").over(w).cast("bigint")
    ).select(
        F.col("b").cast("bigint").alias("budget"),
        "n_docs_kept",
        "tokens_used",
        "total_tokens",
        F.expr("(1000000 * tokens_used) div total_tokens")
        .cast("bigint")
        .alias("kept_ppm"),
    )


# ---------------------------------------------------------------------------
# ts_changepoint_split — exact best single split of the daily series
# ---------------------------------------------------------------------------


@_stage(
    "ts_changepoint_split",
    oracle="""
    WITH dc AS (
      SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, d, c,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                  AS BIGINT) AS n1,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY d)
                  AS BIGINT) AS s1,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS t
      FROM dc
    ),
    sc AS (
      SELECT event_type, d AS split_day, n1, n - n1 AS n2, s1, t - s1 AS s2,
             CAST((1000000 * (CAST(s1 AS HUGEINT) * (n - n1)
                              - CAST(t - s1 AS HUGEINT) * n1)
                           * (CAST(s1 AS HUGEINT) * (n - n1)
                              - CAST(t - s1 AS HUGEINT) * n1))
                  // (CAST(n1 AS HUGEINT) * (n - n1)) AS BIGINT) AS score
      FROM cum WHERE n1 < n
    )
    SELECT event_type, split_day, n1 AS n_left, n2 AS n_right,
           s1 AS sum_left, s2 AS sum_right, score
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY score DESC, split_day)
                      AS rk20
          FROM sc) t
    WHERE rk20 = 1
    """,
)
def ts_changepoint_split(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the exact BEST SINGLE SPLIT of each type's daily
    count series (binary segmentation's first step): over every
    candidate boundary day, maximize the cleared between-group
    variance (S1·n2 − S2·n1)² / (n1·n2) — the split minimizing total
    within-SSE, since SS_total is split-invariant.  M88's CUSUM flags
    a threshold crossing as it streams; this finds the OPTIMAL
    breakpoint in batch — the pair every changepoint pipeline runs
    (CUSUM to alarm, exact split to localize).

    Exact argmax: the score is one integral division of DECIMAL/
    HUGEINT carriers ×10⁶ with the (score DESC, day) unique
    tie-break; numerators are squared (non-negative), denominators
    positive — no shift needed.  Scale: the corpus collapses to
    O(types × days); ONE cumulative window per type (real key) yields
    every candidate split's terms; headroom (10⁶·(S·n)²) ≈ 10³⁰ at
    sf0.1, four decades inside DECIMAL(38,0).

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    dc = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("d")
    cum = dc.select(
        "event_type",
        "d",
        F.row_number().over(wo).cast("bigint").alias("n1"),
        F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("s1"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n"),
        F.sum("c").over(wt).cast("bigint").alias("t"),
    )
    sc = cum.filter(F.col("n1") < F.col("n")).select(
        "event_type",
        F.col("d").alias("split_day"),
        F.col("n1").alias("n_left"),
        (F.col("n") - F.col("n1")).cast("bigint").alias("n_right"),
        F.col("s1").alias("sum_left"),
        (F.col("t") - F.col("s1")).cast("bigint").alias("sum_right"),
        F.expr(
            "CAST((1000000 * (CAST(s1 AS DECIMAL(38,0)) * (n - n1)"
            "                 - CAST(t - s1 AS DECIMAL(38,0)) * n1)"
            "              * (CAST(s1 AS DECIMAL(38,0)) * (n - n1)"
            "                 - CAST(t - s1 AS DECIMAL(38,0)) * n1))"
            " div (CAST(n1 AS DECIMAL(38,0)) * (n - n1)) AS BIGINT)"
        ).alias("score"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("score").desc(), F.col("split_day")
    )
    return (
        sc.withColumn("rk20", F.row_number().over(w))
        .filter(F.col("rk20") == 1)
        .drop("rk20")
    )


# ---------------------------------------------------------------------------
# dedup_prefix_key_curve — cheap-key dedup economics vs prefix length
# ---------------------------------------------------------------------------

_PKC_LENS = (64, 256, 1024)


@_stage(
    "dedup_prefix_key_curve",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, md5(text) AS hfull,
             {", ".join(f"md5(substring(text, 1, {L})) AS h{L}" for L in _PKC_LENS)}
      FROM documents
    ),
    fdup AS (
      SELECT doc_id, hfull,
             CASE WHEN count(*) OVER (PARTITION BY hfull) > 1 THEN 1 ELSE 0
               END AS full_dup
      FROM h
    ),
    lng AS (
      {" UNION ALL ".join(f"SELECT doc_id, {L} AS len, h{L} AS k FROM h" for L in _PKC_LENS)}
    ),
    pf AS (
      SELECT doc_id, len, k,
             CASE WHEN count(*) OVER (PARTITION BY len, k) > 1 THEN 1 ELSE 0
               END AS pfx_dup
      FROM lng
    ),
    j AS (
      SELECT pf.len, pf.k, pf.pfx_dup, fdup.full_dup
      FROM pf JOIN fdup ON pf.doc_id = fdup.doc_id
    )
    SELECT CAST(len AS BIGINT) AS prefix_len,
           CAST(count(DISTINCT k) AS BIGINT) AS n_groups,
           CAST(sum(pfx_dup) AS BIGINT) AS n_dup_docs,
           CAST(sum(CASE WHEN pfx_dup = 1 AND full_dup = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_merged,
           CAST((1000000 * sum(CASE WHEN pfx_dup = 1 AND full_dup = 0
                                    THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS false_ppm
    FROM j GROUP BY len
    """,
)
def dedup_prefix_key_curve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the CHEAP-KEY dedup economics curve: exact-dup
    detection keyed by md5 of the first 64/256/1024 characters vs the
    full-text truth — per length, the group count, docs flagged
    duplicate, and FALSE MERGES (flagged under the prefix, unique
    under the full text; there are NO false splits: a full-text dup
    pair shares every prefix).  Prefix keys are what a 100 TB exact
    dedup actually hashes first — this curve prices the shortcut:
    flag sets NEST as prefixes shorten (coarser keys only merge more,
    twin-pinned), so the false-merge column is the cost of each
    cheaper tier and a prefix pass is a sound PRE-FILTER for the
    full-hash confirm.

    Scale: ONE scan computes all four hashes; the ×3 length axis
    explodes the per-doc hash row; group flags are per-(len, key)
    window counts on real keys.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.md5("text").alias("hfull"),
        *[
            F.md5(F.substring(F.col("text"), 1, L)).alias(f"h{L}")
            for L in _PKC_LENS
        ],
    )
    wf = Window.partitionBy("hfull")
    fdup = h.select(
        "doc_id",
        F.when(F.count(F.lit(1)).over(wf) > 1, 1).otherwise(0).alias("full_dup"),
    )
    lng = None
    for L in _PKC_LENS:
        part = h.select(
            "doc_id", F.lit(L).alias("len"), F.col(f"h{L}").alias("k")
        )
        lng = part if lng is None else lng.unionByName(part)
    wp = Window.partitionBy("len", "k")
    pf = lng.select(
        "doc_id",
        "len",
        "k",
        F.when(F.count(F.lit(1)).over(wp) > 1, 1).otherwise(0).alias("pfx_dup"),
    )
    j = pf.join(fdup, "doc_id")
    return j.groupBy(F.col("len").cast("bigint").alias("prefix_len")).agg(
        F.countDistinct("k").cast("bigint").alias("n_groups"),
        F.sum("pfx_dup").cast("bigint").alias("n_dup_docs"),
        F.sum(
            F.when((F.col("pfx_dup") == 1) & (F.col("full_dup") == 0), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_false_merged"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN pfx_dup = 1 AND full_dup = 0"
            " THEN 1 ELSE 0 END)) div count(*) AS BIGINT)"
        ).alias("false_ppm"),
    )
