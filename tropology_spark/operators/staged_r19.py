"""STAGED round-19 operators — implemented and parity-tested, NOT yet
registered (the round-8..18 staging pattern, ninth application).

The round-13 window executed and the round-14..18 slates are already
banked, so these bodies target ROUND 19.  Same (fn, oracle) contract
as the registry; activation is the mechanical move + five-fold
lockstep.  tests/test_staged_r19.py runs the driver-replica compare at
both verification scales, Python twins for the formula-bearing ops,
hypothesis property suites on the exact staged paths, the
partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- ts_discord_days — per (type, day) the exact L2 distance to its
  NEAREST other day profile (zero-filled 24-hour vectors) — the
  matrix-profile/discord primitive: the day whose nearest neighbor is
  farthest is the anomaly no threshold rule catches.
- ts_linear_interpolate — exact rational linear interpolation of the
  hourly count series at MISSING hours (the one place a row-lead IS
  the semantics: bridging the gap between consecutive observed hours
  is the point, not an accident).
- pipeline_loo_source_impact — leave-one-source-out deltas of the
  corpus mean document length — the data-valuation screen (which
  ingest stream moves the corpus statistics).
- agg_log2_value_histogram — power-of-two (HDR-style) histogram of
  order values via bit_length buckets — the log-scale summary every
  latency/value monitor ships at scale.
- sim_knn_hubness — the in-degree distribution of the registered kNN
  graph — hubness, the intrinsic-dimensionality pathology that
  motivates mutual-kNN (r17 slate).
- dedup_moss_pairs — document pairs sharing ≥ 2 winnowing
  fingerprints with containment ppm — MOSS itself, composed on the
  winnowing_selected single home.
- graph_katz3_score — truncated Katz centrality 16·p1 + 4·p2 + p3
  (β = 1/4 dyadic, exact integers) over the M262 seed path counts —
  top-20 influence ranking with hop-discounted reach.
- analytics_price_elasticity_terms — per-brand OLS slope terms of
  demanded quantity on retail price (the group-wise extension of
  M254's global OLS; signed numerators, zero divisions).
- pipeline_sample_bias_audit — md5 1/16 row-sample means vs full
  means per source — the sampling-bias audit run before trusting any
  sampled dashboard.
- analytics_gini_by_month — the M192 Lorenz-identity Gini per order
  month through the GROUPED two-pass rank — inequality as a trend,
  not a scalar.
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
# ts_discord_days — nearest-neighbor distance between daily profiles
# ---------------------------------------------------------------------------


@_stage(
    "ts_discord_days",
    oracle="""
    WITH dc AS (
      SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    days AS (SELECT DISTINCT event_type, d FROM dc),
    spine AS (
      SELECT days.event_type, days.d, h.hod
      FROM days, (SELECT unnest(generate_series(0, 23)) AS hod) h
    ),
    z AS (
      SELECT spine.event_type, spine.d, spine.hod, coalesce(dc.c, 0) AS c
      FROM spine
      LEFT JOIN dc ON dc.event_type = spine.event_type AND dc.d = spine.d
                  AND dc.hod = spine.hod
    ),
    pd AS (
      SELECT a.event_type, a.d AS da, b.d AS db,
             CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2
      FROM z a JOIN z b
        ON a.event_type = b.event_type AND a.hod = b.hod AND a.d <> b.d
      GROUP BY 1, 2, 3
    )
    SELECT event_type, da AS day, db AS nn_day, d2 AS min_d2
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type, da
                                       ORDER BY d2, db) AS rk19
          FROM pd) t
    WHERE rk19 = 1
    """,
)
def ts_discord_days(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — DISCORD detection on daily profiles: per (type,
    day), the exact squared L2 distance to the NEAREST other day of
    the same type over zero-filled 24-hour count vectors — the
    matrix-profile primitive (a day is anomalous not because it
    crosses a threshold but because NO other day looks like it: the
    max of this min-distance column is the discord).  M68 ranks hours
    against a global level; this compares SHAPES of whole days.

    Exact integers throughout; (d2, nn_day) tie-break unique.  Scale:
    the corpus collapses map-side to O(types × days × 24); the pair
    stage is bounded by days² per type — the TIME-SPAN-bounded cost
    (the PAA/domper argument), never event volume; zero-filled hod
    spine via a 24-literal explode.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    dc = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
        F.expr("(unix_micros(ts) div 3600000000) % 24").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    days = dc.select("event_type", "d").distinct()
    z = iter_materialize(  # both pair sides — DOUBLE-REFERENCE RULE
        days.select(
            "event_type",
            "d",
            F.explode(F.array(*[F.lit(h) for h in range(24)])).alias("hod"),
        )
        .join(dc, ["event_type", "d", "hod"], "left")
        .select(
            "event_type", "d", "hod", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    a = z.select("event_type", F.col("d").alias("da"), "hod", F.col("c").alias("ca"))
    b = z.select(
        "event_type", F.col("d").alias("db"), "hod", F.col("c").alias("cb")
    )
    pd = (
        a.join(b, ["event_type", "hod"])
        .filter(F.col("da") != F.col("db"))
        .groupBy("event_type", "da", "db")
        .agg(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            .cast("bigint")
            .alias("d2")
        )
    )
    w = Window.partitionBy("event_type", "da").orderBy(F.col("d2"), F.col("db"))
    return (
        pd.withColumn("rk19", F.row_number().over(w))
        .filter(F.col("rk19") == 1)
        .select(
            "event_type",
            F.col("da").alias("day"),
            F.col("db").alias("nn_day"),
            F.col("d2").alias("min_d2"),
        )
    )


# ---------------------------------------------------------------------------
# ts_linear_interpolate — exact interpolation at missing hours
# ---------------------------------------------------------------------------


@_stage(
    "ts_linear_interpolate",
    oracle="""
    WITH hv AS (
      SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    nxt AS (
      SELECT event_type, h AS h1, v AS v1,
             lead(h) OVER (PARTITION BY event_type ORDER BY h) AS h2,
             lead(v) OVER (PARTITION BY event_type ORDER BY h) AS v2
      FROM hv
    ),
    gaps AS (SELECT * FROM nxt WHERE h2 IS NOT NULL AND h2 > h1 + 1),
    g AS (
      SELECT event_type, h1, h2, v1, v2,
             unnest(generate_series(h1 + 1, h2 - 1)) AS h
      FROM gaps
    )
    SELECT event_type, CAST(h AS BIGINT) AS h,
           CAST(h1 AS BIGINT) AS prev_h, CAST(h2 AS BIGINT) AS next_h,
           CAST(v1 AS BIGINT) AS v_prev, CAST(v2 AS BIGINT) AS v_next,
           CAST((1000 * (v1 * (h2 - h) + v2 * (h - h1))) // (h2 - h1)
                AS BIGINT) AS interp_milli
    FROM g
    """,
)
def ts_linear_interpolate(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — exact LINEAR INTERPOLATION of the hourly count
    series at MISSING hours: for every gap between consecutive
    observed hours of a type, the rational
    (v1·(h2−h) + v2·(h−h1)) / (h2−h1) at each absent hour, carried
    ×1000 as one non-negative integral division — the resampling
    primitive between M40's zero-fill and a model-based impute
    (dashboards draw this line; feature pipelines feed it to models).

    The ROW-LEAD here is the semantics, not the gap bug: the M203
    rule forbids row-lags that SILENTLY cross gaps when the formula
    means calendar neighbors — this operator's entire purpose is to
    bridge the gap between consecutive OBSERVED points, so lead() over
    the observed hour sequence is the specified pairing.  Scale: the
    corpus collapses to O(types × hours); the per-gap explode is
    bounded by the span; one per-type window on the real key.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hv = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    w = Window.partitionBy("event_type").orderBy("h")
    nxt = hv.select(
        "event_type",
        F.col("h").alias("h1"),
        F.col("v").alias("v1"),
        F.lead("h").over(w).alias("h2"),
        F.lead("v").over(w).alias("v2"),
    )
    gaps = nxt.filter(F.col("h2").isNotNull() & (F.col("h2") > F.col("h1") + 1))
    g = gaps.select(
        "event_type",
        "h1",
        "h2",
        "v1",
        "v2",
        F.explode(F.expr("sequence(h1 + 1, h2 - 1)")).alias("h"),
    )
    return g.select(
        "event_type",
        F.col("h").cast("bigint").alias("h"),
        F.col("h1").cast("bigint").alias("prev_h"),
        F.col("h2").cast("bigint").alias("next_h"),
        F.col("v1").cast("bigint").alias("v_prev"),
        F.col("v2").cast("bigint").alias("v_next"),
        F.expr("(1000 * (v1 * (h2 - h) + v2 * (h - h1))) div (h2 - h1)")
        .cast("bigint")
        .alias("interp_milli"),
    )


# ---------------------------------------------------------------------------
# pipeline_loo_source_impact — leave-one-source-out corpus statistics
# ---------------------------------------------------------------------------


@_stage(
    "pipeline_loo_source_impact",
    oracle="""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT source, n_docs, n_tokens,
             CAST(sum(n_docs) OVER () AS BIGINT) AS nn,
             CAST(sum(n_tokens) OVER () AS BIGINT) AS tt
      FROM per
    )
    SELECT source, n_docs, n_tokens,
           CAST((1000 * tt) // nn AS BIGINT) AS full_mean_milli,
           CAST((1000 * (tt - n_tokens)) // (nn - n_docs) AS BIGINT)
             AS loo_mean_milli,
           CAST((1000 * (tt - n_tokens)) // (nn - n_docs)
                - (1000 * tt) // nn AS BIGINT) AS delta_milli
    FROM t
    """,
)
def pipeline_loo_source_impact(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — LEAVE-ONE-SOURCE-OUT impact on the corpus mean
    document length (milli-tokens): per source, the corpus mean with
    that source REMOVED next to the full mean and the signed delta —
    the cheapest data-valuation screen (a source whose removal moves
    the corpus statistic is the one to audit first; the Shapley-style
    full attribution starts from exactly these marginal deltas).
    delta is a DIFFERENCE OF TWO EXACT FLOORS — each floor is
    deterministic in both engines, so the difference is too (no
    signed division anywhere).

    Scale: one token-count scan collapsing to |sources| rows; the
    totals ride the pmod-constant window on the bounded source axis.
    The LOO arithmetic is pure subtraction from the totals — removal
    never rescans the corpus.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = Window.partitionBy(F.pmod(F.col("n_docs"), F.lit(1)))
    t = per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.sum("n_docs").over(w).cast("bigint").alias("nn"),
        F.sum("n_tokens").over(w).cast("bigint").alias("tt"),
    )
    return t.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("(1000 * tt) div nn").cast("bigint").alias("full_mean_milli"),
        F.expr("(1000 * (tt - n_tokens)) div (nn - n_docs)")
        .cast("bigint")
        .alias("loo_mean_milli"),
        (
            F.expr("(1000 * (tt - n_tokens)) div (nn - n_docs)")
            - F.expr("(1000 * tt) div nn")
        )
        .cast("bigint")
        .alias("delta_milli"),
    )


# ---------------------------------------------------------------------------
# agg_log2_value_histogram — HDR-style power-of-two value histogram
# ---------------------------------------------------------------------------


@_stage(
    "agg_log2_value_histogram",
    oracle="""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(length(bin(cents)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM c GROUP BY 1
    """,
)
def agg_log2_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — the POWER-OF-TWO (HDR-style) histogram of order
    values: bucket = bit_length of the cents amount (the M267
    length(bin(x)) idiom — both engines agree bit-for-bit on positive
    BIGINTs), with count, min, max and sum per bucket — the log-scale
    value summary every monitoring stack ships because a linear
    histogram can't hold nine orders of magnitude (latencies, bytes,
    revenues) in bounded rows.  ~2× relative error per bucket by
    construction, ≤ 63 rows ever.

    Scale: ONE map-side-combinable rollup; the bucket function is a
    pure JVM expression.  This is the cheap first look before the
    exact counting quantiles (M196 idiom) are run on a chosen
    sub-range."""
    o = load(spark, sf_dir, "orders")
    c = o.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    return c.groupBy(
        F.length(F.bin(F.col("cents"))).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# sim_knn_hubness — in-degree distribution of the kNN graph
# ---------------------------------------------------------------------------


def _knn_hubness_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH knn AS MATERIALIZED ({ORACLES["sim_knn_join"]}),
    ind AS (
      SELECT e.vec_id,
             CAST(coalesce(k.c, 0) AS BIGINT) AS in_degree
      FROM embeddings e
      LEFT JOIN (SELECT neighbor_id, CAST(count(*) AS BIGINT) AS c
                 FROM knn GROUP BY neighbor_id) k
        ON k.neighbor_id = e.vec_id
    )
    SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS first_vec
    FROM ind GROUP BY in_degree
    """


@_stage("sim_knn_hubness", oracle=_knn_hubness_oracle())
def sim_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — HUBNESS of the registered kNN graph: the
    in-degree distribution of J9's cell-blocked top-3 neighbor
    relation, zero-in-degree vectors included (the corpus spine LEFT
    joins the neighbor counts) — the intrinsic-dimensionality
    pathology meter: in high-dimensional spaces a few vectors appear
    in EVERYONE'S top-k (hubs) while many appear in no one's
    (anti-hubs), which silently degrades retrieval and is exactly why
    mutual-kNN (r17 slate) filters one-directional neighbors.  A
    healthy distribution concentrates near k; a hub-heavy tail says
    re-normalize or re-embed.

    Composed, not copied: QUERIES['sim_knn_join'] IS the edge frame;
    the oracle wraps ORACLES['sim_knn_join'] AS MATERIALIZED (the
    DuckDB inlining trap).  Scale: the rollup touches the O(3n) kNN
    result and the vector spine — never pairs."""
    from tropology_spark.registry import QUERIES

    knn = QUERIES["sim_knn_join"](spark, sf_dir)
    e = load(spark, sf_dir, "embeddings").select("vec_id")
    ind = e.join(
        knn.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        ),
        "vec_id",
        "left",
    ).select(
        "vec_id", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("in_degree")
    )
    return ind.groupBy("in_degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("vec_id").cast("bigint").alias("first_vec"),
    )


# ---------------------------------------------------------------------------
# dedup_moss_pairs — winnowing-fingerprint pair detection (MOSS)
# ---------------------------------------------------------------------------

_MOSS_MIN_SHARED = 2


def _moss_oracle() -> str:
    from tropology_spark.operators.text import _WINNOW_SEL_CTE

    return (
        _WINNOW_SEL_CTE
        + f""",
    ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sel
           FROM sel GROUP BY doc_id),
    pr AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sel a JOIN sel b ON a.mh = b.mh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {_MOSS_MIN_SHARED}
    )
    SELECT pr.doc_a, pr.doc_b, pr.n_shared,
           na.n_sel AS n_sel_a, nb.n_sel AS n_sel_b,
           CAST((1000000 * pr.n_shared) // least(na.n_sel, nb.n_sel)
                AS BIGINT) AS cont_ppm
    FROM pr JOIN ns na ON na.doc_id = pr.doc_a
            JOIN ns nb ON nb.doc_id = pr.doc_b
    """
    )


@_stage("dedup_moss_pairs", oracle=_moss_oracle())
def dedup_moss_pairs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — MOSS itself: document pairs sharing ≥ 2
    winnowing fingerprints, with the shared count and containment ppm
    (shared / the smaller selected set) — the plagiarism/overlap
    detector of record, now as the PAIR stage on top of M259's
    selection (M259 measures selection density per doc; M125 measures
    span fraction per doc; this is the cross-document join the
    winnowing guarantee exists FOR: any shared run of ≥ k+w−1 tokens
    shares a selected fingerprint, so true overlaps cannot be
    missed).

    Composed, not copied: the Spark side reuses ``winnowing_selected``
    (checkpointed once — it feeds both join sides AND the per-doc
    size rollup); the oracle splices the factored ``_WINNOW_SEL_CTE``
    (verified byte-identical to the registered M259 prefix at the
    factoring commit).  Scale: candidates meet on the shared
    fingerprint key — the LSH band-join economics, never all-pairs;
    the ≥ 2 gate prunes singleton-hash coincidences.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    from tropology_spark.operators.text import winnowing_selected

    sel = iter_materialize(winnowing_selected(spark, sf_dir, docs=docs))
    ns = sel.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sel"))
    a = sel.select(F.col("doc_id").alias("doc_a"), "mh")
    b = sel.select(F.col("doc_id").alias("doc_b"), F.col("mh").alias("mhb"))
    pr = (
        a.join(b, (F.col("mh") == F.col("mhb")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= _MOSS_MIN_SHARED)
    )
    na = ns.select(F.col("doc_id").alias("doc_a"), F.col("n_sel").alias("n_sel_a"))
    nb = ns.select(F.col("doc_id").alias("doc_b"), F.col("n_sel").alias("n_sel_b"))
    return (
        pr.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_sel_a",
            "n_sel_b",
            F.expr("(1000000 * n_shared) div least(n_sel_a, n_sel_b)")
            .cast("bigint")
            .alias("cont_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# graph_katz3_score — dyadic truncated Katz centrality over seed paths
# ---------------------------------------------------------------------------


def _katz3_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH pc AS MATERIALIZED ({ORACLES["graph_path_counts3"]})
    SELECT node,
           CAST(sum(CASE hop WHEN 1 THEN 16 * n_paths
                             WHEN 2 THEN 4 * n_paths
                             ELSE n_paths END) AS BIGINT) AS katz_x64,
           CAST(coalesce(sum(CASE WHEN hop = 1 THEN n_paths END), 0)
                AS BIGINT) AS p1,
           CAST(coalesce(sum(CASE WHEN hop = 2 THEN n_paths END), 0)
                AS BIGINT) AS p2,
           CAST(coalesce(sum(CASE WHEN hop = 3 THEN n_paths END), 0)
                AS BIGINT) AS p3
    FROM pc GROUP BY node
    ORDER BY katz_x64 DESC, node LIMIT 20
    """


@_stage("graph_katz3_score", oracle=_katz3_oracle())
def graph_katz3_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — truncated KATZ centrality from the M262 seed
    set: katz_x64 = 16·p1 + 4·p2 + p3, the hop-discounted path count
    with attenuation β = 1/4 carried ×4³ so every term is an exact
    integer (the dyadic-weight discipline of agg_exp_decay_counts) —
    top-20 nodes by discounted reachability from the hubs, the
    influence ranking that, unlike raw reach, cannot be dominated by
    a long tail of barely-reachable nodes.

    Composed, not copied: QUERIES['graph_path_counts3'] IS the input
    (its unrolled A^h propagation already rides iter_materialize);
    the oracle wraps ORACLES['graph_path_counts3'] AS MATERIALIZED
    (the DuckDB inlining trap).  Scale: a 3-row-per-node rollup over
    the existing frame + one bounded top-20 sort-limit."""
    from tropology_spark.registry import QUERIES

    pc = QUERIES["graph_path_counts3"](spark, sf_dir)
    agg = pc.groupBy("node").agg(
        F.sum(
            F.when(F.col("hop") == 1, 16 * F.col("n_paths"))
            .when(F.col("hop") == 2, 4 * F.col("n_paths"))
            .otherwise(F.col("n_paths"))
        )
        .cast("bigint")
        .alias("katz_x64"),
        F.coalesce(F.sum(F.when(F.col("hop") == 1, F.col("n_paths"))), F.lit(0))
        .cast("bigint")
        .alias("p1"),
        F.coalesce(F.sum(F.when(F.col("hop") == 2, F.col("n_paths"))), F.lit(0))
        .cast("bigint")
        .alias("p2"),
        F.coalesce(F.sum(F.when(F.col("hop") == 3, F.col("n_paths"))), F.lit(0))
        .cast("bigint")
        .alias("p3"),
    )
    return agg.select("node", "katz_x64", "p1", "p2", "p3").orderBy(
        F.desc("katz_x64"), F.asc("node")
    ).limit(20)


# ---------------------------------------------------------------------------
# analytics_price_elasticity_terms — per-brand OLS slope terms
# ---------------------------------------------------------------------------


@_stage(
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
    """Staged M-row — per-brand PRICE-ELASTICITY slope terms: for each
    brand, the exact OLS terms of total demanded quantity (y) on
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
# pipeline_sample_bias_audit — sampled vs full statistics per source
# ---------------------------------------------------------------------------

_SB_MOD = 16


@_stage(
    "pipeline_sample_bias_audit",
    oracle=f"""
    WITH d AS (
      SELECT source, len(string_split(text, ' ')) AS tok,
             CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % {_SB_MOD} = 0 THEN 1 ELSE 0 END AS samp
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_full,
           CAST(sum(samp) AS BIGINT) AS n_sample,
           CAST((1000 * sum(tok)) // count(*) AS BIGINT) AS full_mean_milli,
           CAST(CASE WHEN sum(samp) = 0 THEN NULL
                     ELSE (1000 * sum(samp * tok)) // sum(samp) END AS BIGINT)
             AS sample_mean_milli,
           CAST(CASE WHEN sum(samp) = 0 THEN NULL
                     ELSE (1000 * sum(samp * tok)) // sum(samp)
                          - (1000 * sum(tok)) // count(*) END AS BIGINT)
             AS bias_milli
    FROM d GROUP BY source
    """,
)
def pipeline_sample_bias_audit(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — SAMPLING-BIAS audit: per source, the mean
    document length of the deterministic 1/16 md5 row sample next to
    the full-corpus mean and the signed bias (a difference of two
    exact floors) — the check run before trusting any sampled
    dashboard: md5 sampling is unbiased in EXPECTATION, but a small
    per-source sample can sit far from its stratum mean, and this
    audit puts the realized gap on the table (sources whose sample is
    EMPTY report NULL — absence of evidence, loudly).

    Scale: one scan with the sample flag as a computed column — the
    audit costs nothing beyond the rollup it grades; the same pattern
    prices any md5-mod sampling rate.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tok"),
        F.when(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % _SB_MOD
            == 0,
            1,
        )
        .otherwise(0)
        .alias("samp"),
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full"),
        F.sum("samp").cast("bigint").alias("n_sample"),
        F.expr("(1000 * sum(tok)) div count(*)")
        .cast("bigint")
        .alias("full_mean_milli"),
        F.expr(
            "CASE WHEN sum(samp) = 0 THEN NULL"
            " ELSE (1000 * sum(samp * tok)) div sum(samp) END"
        )
        .cast("bigint")
        .alias("sample_mean_milli"),
        F.expr(
            "CASE WHEN sum(samp) = 0 THEN NULL"
            " ELSE (1000 * sum(samp * tok)) div sum(samp)"
            "      - (1000 * sum(tok)) div count(*) END"
        )
        .cast("bigint")
        .alias("bias_milli"),
    )


# ---------------------------------------------------------------------------
# analytics_gini_by_month — the M192 Lorenz identity as a trend
# ---------------------------------------------------------------------------


@_stage(
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
    """Staged M-row — the M192 Lorenz-identity GINI per order month:
    inequality of per-customer monthly spend as a TREND (month key =
    year·100 + month, pure integer both engines), G = (2·Σ i·x_i −
    (n+1)·Σx_i) / (n·Σx_i) over each month's ascending spend rank
    with the unique (spend, custkey) tie-break — concentration
    drifting up month-over-month is the marketplace-health alarm the
    single M192 scalar cannot ring.

    Scale: the per-month ranks ride the GROUPED two-pass global rank
    (group_cols=["mk"] — months are range-partitioned together with
    the order keys, so one month can span many partitions; never a
    per-month single-partition window), then a |months|-row finale in
    DECIMAL(38,0)/HUGEINT (the wide-integer rule)."""
    from tropology_spark.plans.global_order import global_row_number

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
