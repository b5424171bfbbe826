"""STAGED round-15 operators — implemented and parity-tested, NOT yet
registered (the staging pattern's seventh application).

The round-13 and round-14 windows are already fully budgeted by the
staged_r13/staged_r14 slates plus the r05/r06/r07 freshness queues
(CLAUDE.md), so these bodies target ROUND 15.  Same (fn, oracle)
contract as the registry; activation is the mechanical move +
five-fold lockstep.  tests/test_staged_r15.py runs the driver-replica
compare at both verification scales, Python twins, the
partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation) — the
connecting theme is TUNING CURVES for the engine's own machinery
(after the CMS-width / bloom-bpk / LSH-band / IVF-probe precedents)
plus the remaining exact-integer analytics terms:
- agg_hll_m_curve — HLL error vs register count m ∈ {16, 64, 256}
  (the sketch-memory sizing axis) from ONE hash pass.
- mm_cdc_size_curve — CDC chunk-size economics vs boundary modulus
  {32, 64, 128} from ONE window-hash pass (power-of-two moduli nest).
- analytics_beta_posterior_terms — Beta(1,1) conversion posterior
  integer terms per variant (posterior mean / variance carriers).
- text_winnowing_w_curve — winnowing selection density vs window w
  ∈ {2, 4, 8}; selections provably NEST across w (property suite).
- ts_paa_lb_audit — the GEMINI lower-bounding admissibility audit:
  PAA distance vs true distance on consecutive-day hour profiles.
- graph_core_profile — bounded k-core survivors vs k ∈ {5, 25, 50}
  (the degeneracy profile; survivor sets nest across k).
- pipeline_contamination_ngram_curve — contamination rate vs shingle
  width n ∈ {2, 3, 4} (the decontamination discrimination axis).
- sim_dim_variance_profile — per-dimension variance terms of the
  embedding corpus (the matryoshka/PCA prefix-dimension evidence).
- agg_join_size_ams — AGMS join-cardinality estimation audit (the
  optimizer question; agg_ams_f2 is its self-join special case).
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
# agg_hll_m_curve — HLL error vs register count (the sketch sizing axis)
# ---------------------------------------------------------------------------

#: (m, alpha_milli, b8_divisor): bucket = first-byte div (256/m), so
#: every register count reads the SAME md5 pass; alpha constants from
#: Flajolet et al. (0.673 / 0.709 / 0.7213/(1+1.079/256) ~ 0.718).
_HLL_MS = ((16, 673, 16), (64, 709, 4), (256, 718, 1))


def _hll_curve_oracle() -> str:
    cfg_rows = ", ".join(f"({m}, {a}, {dv})" for m, a, dv in _HLL_MS)
    return f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2))::BIGINT
               AS b8,
             ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 3, 8))::BIGINT
               AS w
      FROM orders),
    cfg AS (SELECT CAST(m AS BIGINT) AS m, CAST(am AS BIGINT) AS am,
                   CAST(dv AS BIGINT) AS dv
            FROM (VALUES {cfg_rows}) t(m, am, dv)),
    regs AS (
      SELECT cfg.m, h.b8 // cfg.dv AS bucket,
             max(CASE WHEN h.w = 0 THEN 33 ELSE 33 - length(bin(h.w)) END)
               AS mj
      FROM h CROSS JOIN cfg GROUP BY cfg.m, h.b8 // cfg.dv),
    spine AS (SELECT cfg.m, cfg.am, s.b AS bucket
              FROM cfg, unnest(generate_series(0, cfg.m - 1)) AS s(b)),
    full_regs AS (
      SELECT spine.m, spine.am, spine.bucket, coalesce(regs.mj, 0) AS m0
      FROM spine LEFT JOIN regs
        ON spine.m = regs.m AND spine.bucket = regs.bucket),
    agg AS (
      SELECT m, am,
             CAST(sum(1::BIGINT << (33 - m0)) AS BIGINT) AS s_carrier,
             CAST(sum(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_empty
      FROM full_regs GROUP BY m, am),
    ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
           FROM orders)
    SELECT agg.m, ex.n_exact, agg.v_empty, agg.s_carrier,
           CAST((agg.am * agg.m * agg.m * (1::BIGINT << 33))
                // (1000 * agg.s_carrier) AS BIGINT) AS hll_est,
           CAST((1000000 * ((agg.am * agg.m * agg.m * (1::BIGINT << 33))
                            // (1000 * agg.s_carrier)))
                // ex.n_exact AS BIGINT) AS ratio_ppm
    FROM agg CROSS JOIN ex
    """


@_stage("agg_hll_m_curve", oracle=_hll_curve_oracle())
def agg_hll_m_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL accuracy vs REGISTER COUNT m ∈ {16, 64, 256} — the sketch
    sizing axis the fixed-m M267 audit cannot show (HLL's standard
    error is ~1.04/√m, so 16→256 registers buys a 4× error cut for a
    16× memory cost; this curve measures the actual trade on the
    data).  Completes the sketch-tuning-curve family: CMS width
    (r13), bloom bits-per-key (r14), LSH bands (M264), IVF probes
    (M263) — every approximate structure in the engine now ships
    with its sizing curve.

    ONE md5 pass serves every m: bucket = first-byte div (256/m)
    (power-of-two register counts nest on the same 8 bucket bits —
    the curve-over-prefix discipline applied to a sketch), rho = 33 −
    bit_length of the NEXT 32 bits (disjoint from the bucket bits,
    unlike M267's m=16 layout — documented difference), registers
    max-merge per (m, bucket), empty registers zero-filled from the
    per-m spine.  The estimate keeps the M267 dyadic-rational carrier
    exactly: est = (α_milli·m²·2³³) div (1000·S) with
    S = Σ 2^(33−M_j) — max value 718·256²·2³³ ≈ 4·10¹⁷ < 2⁶³.

    Scale: the register table is ≤ 336 rows total; the map-side
    register max-merge is the whole point of HLL at 100 TB.  The
    1-row exact attach is a deliberate scalar crossJoin
    (BNLJ-allowlist at activation); the config axis EXPLODES the hash
    rows (never a join)."""
    o = load(spark, sf_dir, "orders")
    md = F.md5(F.col("o_custkey").cast("string"))
    h = o.select(
        F.conv(F.substring(md, 1, 2), 16, 10).cast("bigint").alias("b8"),
        F.conv(F.substring(md, 3, 8), 16, 10).cast("bigint").alias("w"),
    )
    cfg_arr = F.array(
        *[
            F.struct(
                F.lit(m).cast("bigint").alias("m"),
                F.lit(a).cast("bigint").alias("am"),
                F.lit(dv).cast("bigint").alias("dv"),
            )
            for m, a, dv in _HLL_MS
        ]
    )
    hx = h.select("b8", "w", F.explode(cfg_arr).alias("c")).select(
        "b8", "w", "c.m", "c.am", "c.dv"
    )
    regs = hx.groupBy("m", F.expr("b8 div dv").alias("bucket")).agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(33)).otherwise(
                F.lit(33) - F.length(F.bin("w"))
            )
        ).alias("mj")
    )
    cfg = spark.createDataFrame(
        [(m, a) for m, a, _ in _HLL_MS], "m long, am long"
    )
    spine = cfg.select(
        "m",
        "am",
        F.explode(F.expr("sequence(0L, m - 1)")).alias("bucket"),
    )
    full = spine.join(regs, ["m", "bucket"], "left").withColumn(
        "m0", F.coalesce(F.col("mj"), F.lit(0))
    )
    agg = full.groupBy("m", "am").agg(
        F.sum(F.expr("shiftleft(1L, CAST(33 - m0 AS INT))"))
        .cast("bigint")
        .alias("s_carrier"),
        F.sum(F.when(F.col("m0") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v_empty"),
    )
    ex = o.agg(F.countDistinct("o_custkey").cast("bigint").alias("n_exact"))
    return (
        agg.crossJoin(F.broadcast(ex))
        .withColumn(
            "hll_est",
            F.expr(
                "CAST((am * m * m * shiftleft(1L, 33))"
                " div (1000 * s_carrier) AS BIGINT)"
            ),
        )
        .select(
            "m",
            "n_exact",
            "v_empty",
            "s_carrier",
            "hll_est",
            F.expr("CAST((1000000 * hll_est) div n_exact AS BIGINT)").alias(
                "ratio_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# mm_cdc_size_curve — CDC chunk-size economics vs boundary modulus
# ---------------------------------------------------------------------------

from tropology_spark.operators.multimodal import (  # noqa: E402
    _CDC_WIN_BYTES,
    cdc_hash_positions,
)

_CDC_MODS = (32, 64, 128)


def _cdc_curve_oracle() -> str:
    mods = ", ".join(str(m) for m in _CDC_MODS)
    return f"""
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS hs,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n_bytes, i AS p,
             ('0x' || substring(md5(substring(hs, CAST(2 * i - 1 AS INT),
                                              {2 * _CDC_WIN_BYTES})),
                                1, 4))::BIGINT AS h16
      FROM hx, (SELECT unnest(generate_series(1, 4096)) AS i) s
      WHERE n_bytes >= {_CDC_WIN_BYTES}
        AND i <= least(n_bytes - {_CDC_WIN_BYTES - 1}, 4096)
    ),
    cfg AS (SELECT CAST(unnest([{mods}]) AS BIGINT) AS mod),
    starts AS (
      SELECT DISTINCT cfg.mod, pos.doc_id, pos.p
      FROM pos CROSS JOIN cfg
      WHERE pos.h16 % cfg.mod = 0
      UNION
      SELECT cfg.mod, d.doc_id, 1 AS p
      FROM (SELECT doc_id FROM documents) d CROSS JOIN cfg
    ),
    per AS (SELECT mod, CAST(count(*) AS BIGINT) AS n_chunks
            FROM starts GROUP BY mod),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CAST(octet_length(encode(text)) AS BIGINT))
                        AS BIGINT) AS total_bytes
            FROM documents)
    SELECT per.mod, tot.n_docs, tot.total_bytes, per.n_chunks,
           CAST((1000 * tot.total_bytes) // per.n_chunks AS BIGINT)
             AS mean_chunk_milli_bytes
    FROM per CROSS JOIN tot
    """


@_stage("mm_cdc_size_curve", oracle=_cdc_curve_oracle())
def mm_cdc_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC chunk-size economics vs the boundary modulus ∈ {32, 64,
    128} — the content-defined-chunking TUNING axis (expected chunk
    size ≈ modulus bytes under a uniform window hash; smaller chunks
    dedup better but cost more metadata — this curve measures the
    actual size the corpus produces at each setting, next to M260's
    fixed-64 production rule).

    ONE window-hash pass serves every modulus: the single-home
    :func:`cdc_hash_positions` emits the 16-bit window hash itself
    and power-of-two moduli NEST (h % 128 = 0 ⇒ h % 64 = 0 ⇒
    h % 32 = 0) — the curve-over-prefix rule's hash analog, so the
    config axis is a flag derivation, never a re-hash.  A chunk
    start is position 1 (every document, including those shorter
    than the window) plus every boundary position — the r13
    mm_cdc_dedup_stats extent convention ({{1}} ∪ bounds, distinct).
    mean_chunk_milli_bytes = (1000·total_bytes) div n_chunks — exact
    non-negative division.

    Scale: the boundary scan is the M260 map-only pass (one md5 per
    byte position); the per-mod rollup is map-side combinable; the
    1-row corpus-totals attach is a deliberate scalar crossJoin
    (BNLJ-allowlist at activation)."""
    pos = cdc_hash_positions(spark, sf_dir)
    mod_arr = F.array(*[F.lit(m).cast("bigint") for m in _CDC_MODS])
    bounds = (
        pos.select("doc_id", "p", "h16", F.explode(mod_arr).alias("mod"))
        .filter(F.col("h16") % F.col("mod") == 0)
        .select("mod", "doc_id", "p")
    )
    d = load(spark, sf_dir, "documents")
    first = d.select(
        "doc_id", F.explode(mod_arr).alias("mod"), F.lit(1).cast("bigint").alias("p")
    ).select("mod", "doc_id", "p")
    starts = bounds.union(first).distinct()
    per = starts.groupBy("mod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint"))
        .cast("bigint")
        .alias("total_bytes"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "mod",
        "n_docs",
        "total_bytes",
        "n_chunks",
        F.expr("CAST((1000 * total_bytes) div n_chunks AS BIGINT)").alias(
            "mean_chunk_milli_bytes"
        ),
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


@_stage("analytics_beta_posterior_terms", oracle=_BETA_ORACLE)
def analytics_beta_posterior_terms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bayesian conversion terms for the hash-split experiment under
    the uniform Beta(1,1) prior: per variant the exact posterior
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
    casts back exactly.  Scale: one events pass + two map-side-combinable
    rollups — the corpus collapses to 2 rows."""
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
# text_winnowing_w_curve — selection density vs winnowing window size
# ---------------------------------------------------------------------------

from tropology_spark.operators.text import winnowing_selected  # noqa: E402

_WIN_WS = (2, 4, 8)


def _winnow_curve_oracle() -> str:
    parts = []
    for w in _WIN_WS:
        parts.append(
            f"""
    SELECT CAST({w} AS BIGINT) AS w,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_sel) AS BIGINT) AS n_selected,
           CAST((1000000 * sum(n_sel)) // sum(n_grams) AS BIGINT)
             AS density_ppm
    FROM (
      SELECT doc_id, any_value(n_grams) AS n_grams,
             CAST(count(*) AS BIGINT) AS n_sel
      FROM (
        SELECT DISTINCT doc_id, n_grams, mh FROM (
          SELECT doc_id, n_grams, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW
                              AND {w - 1} FOLLOWING) AS mh
          FROM (
            SELECT doc_id, i,
                   ('0x' || substring(md5(l[i] || ' ' || l[i+1] || ' '
                                          || l[i+2]), 1, 8))::BIGINT AS h,
                   len(l) - 2 AS n_grams
            FROM (SELECT doc_id, string_split(text, ' ') AS l
                  FROM documents),
                 (SELECT unnest(generate_series(1, 4096)) AS i)
            WHERE i <= len(l) - 2
          ) g
        ) wm WHERE i + {w - 1} <= n_grams
      ) sel GROUP BY doc_id
    ) per
    """
        )
    return " UNION ALL ".join(parts)


@_stage("text_winnowing_w_curve", oracle=_winnow_curve_oracle())
def text_winnowing_w_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing selection DENSITY vs window size w ∈ {2, 4, 8} — the
    fingerprint-budget tuning axis (MOSS's guarantee threshold t =
    w + k − 1 grows with w while expected density falls as 2/(w+1):
    this curve measures the actual storage/guarantee trade on the
    corpus, next to M259's fixed-4 production rule).

    Each point runs the single-home :func:`winnowing_selected` at its
    w — deliberately ×|ws| window passes (window minima at different
    w do NOT derive from each other by filtering... but the SELECTED
    SETS NEST: the min of a w₂-window is also the min of the
    w₁-subwindow containing its argmin for w₁ ≤ w₂, so
    Selected(8) ⊆ Selected(4) ⊆ Selected(2) — the property suite
    pins the containment on arbitrary injected corpora, which also
    forces density monotone non-increasing in w).  Corpus rollup per
    w: covered docs, their gram total, selected fingerprints, density
    ppm.  Scale: each pass is the M259 shape (per-doc windows, no
    global window); the curve is 3 rows."""
    out = None
    for w in _WIN_WS:
        sel = winnowing_selected(spark, sf_dir, w=w)
        per = sel.groupBy("doc_id").agg(
            F.first("n_grams").alias("n_grams"),
            F.count(F.lit(1)).cast("bigint").alias("n_sel"),
        )
        row = per.agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("total_grams"),
            F.sum("n_sel").cast("bigint").alias("n_selected"),
        ).select(
            F.lit(w).cast("bigint").alias("w"),
            "n_docs",
            "total_grams",
            "n_selected",
            F.expr(
                "CAST((1000000 * n_selected) div total_grams AS BIGINT)"
            ).alias("density_ppm"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# ts_paa_lb_audit — PAA lower-bound admissibility (GEMINI) audit
# ---------------------------------------------------------------------------

_PAA_SEG = 3  # hours per segment (24h day -> 8 segments)

_PAA_ORACLE = f"""
    WITH e AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             hour(ts) AS h
      FROM events
    ),
    c AS (SELECT event_type, CAST(day AS BIGINT) AS day, h,
                 CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY event_type, day, h),
    dd AS (SELECT DISTINCT event_type, day FROM c),
    pr AS (SELECT a.event_type, a.day AS day_a, b.day AS day_b
           FROM dd a JOIN dd b
             ON a.event_type = b.event_type AND b.day = a.day + 1),
    hx0 AS (
      SELECT pr.event_type, pr.day_a, pr.day_b, s.h
      FROM pr CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) s
    ),
    hx AS (
      SELECT hx0.event_type, hx0.day_a, hx0.day_b, hx0.h,
             coalesce(ca.n, 0) - coalesce(cb.n, 0) AS dx
      FROM hx0
      LEFT JOIN c ca ON ca.event_type = hx0.event_type
                    AND ca.day = hx0.day_a AND ca.h = hx0.h
      LEFT JOIN c cb ON cb.event_type = hx0.event_type
                    AND cb.day = hx0.day_b AND cb.h = hx0.h
    ),
    seg AS (
      SELECT event_type, day_a, day_b, h // {_PAA_SEG} AS s,
             CAST(sum(dx) AS BIGINT) AS dss,
             CAST(sum(dx * dx) AS BIGINT) AS dx2
      FROM hx GROUP BY event_type, day_a, day_b, h // {_PAA_SEG}
    ),
    agg AS (
      SELECT event_type, day_a, day_b,
             CAST(sum(dss * dss) AS BIGINT) AS lb3,
             CAST({_PAA_SEG} * sum(dx2) AS BIGINT) AS true3
      FROM seg GROUP BY event_type, day_a, day_b
    )
    SELECT event_type, day_a, day_b, lb3, true3,
           CAST(true3 - lb3 AS BIGINT) AS slack,
           CAST(CASE WHEN true3 = 0 THEN 1000000
                     ELSE (1000000 * lb3) // true3 END AS BIGINT)
             AS tight_ppm
    FROM agg
"""


@_stage("ts_paa_lb_audit", oracle=_PAA_ORACLE)
def ts_paa_lb_audit(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """PAA lower-bound ADMISSIBILITY audit — the GEMINI guarantee that
    makes PAA/SAX retrieval correct (Keogh et al.: the
    Piecewise-Aggregate distance never exceeds the true Euclidean
    distance, so index-level pruning can never produce false
    dismissals): for every consecutive-day pair of hourly profiles
    per event type, the exact integer carriers lb3 = Σ_seg (ΔSS)² and
    true3 = 3·Σ_h (Δx)² — Cauchy-Schwarz per 3-hour segment gives
    lb3 ≤ true3 ALWAYS, and tight_ppm = (10⁶·lb3) div true3 measures
    how much pruning power the 8-segment sketch keeps (the empirical
    companion to ts_sax_symbols/ts_motif_counts: SAX mining is only
    sound because this bound holds).

    All-integer: hour profiles zero-filled over the bounded 0..23
    spine (explode of a literal sequence per pair — the hx frame is
    |pairs|×24), segment sums ΔSS are BIGINTs, both distance carriers
    scale by 3 so no division appears before the final guarded ppm
    (both-zero profiles → defined as 10⁶: the bound is tight).
    Scale: the corpus collapses to the O(types × days × 24) hourly
    rollup; pairs join on the integer day key (the gappy-axis
    equi-join rule — a missing day produces no pair, never a wrong
    lag).  ``events=`` overrides the events frame (the property suite
    injects arbitrary profiles and pins lb3 ≤ true3 plus equality
    with the pure recompute)."""
    if events is None:
        events = load(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day"),
        F.hour(F.col("ts")).alias("h"),
    )
    c = e.groupBy("event_type", "day", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    dd = c.select("event_type", "day").distinct()
    pr = dd.alias("a").join(
        dd.alias("b"),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") == F.col("a.day") + 1),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.day").alias("day_a"),
        F.col("b.day").alias("day_b"),
    )
    hx = (
        pr.select(
            "event_type",
            "day_a",
            "day_b",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"),
        )
        .join(
            c.select(
                F.col("event_type").alias("et_a"),
                F.col("day").alias("da"),
                F.col("h").alias("ha"),
                F.col("n").alias("na"),
            ),
            (F.col("event_type") == F.col("et_a"))
            & (F.col("day_a") == F.col("da"))
            & (F.col("h") == F.col("ha")),
            "left",
        )
        .join(
            c.select(
                F.col("event_type").alias("et_b"),
                F.col("day").alias("db"),
                F.col("h").alias("hb"),
                F.col("n").alias("nb"),
            ),
            (F.col("event_type") == F.col("et_b"))
            & (F.col("day_b") == F.col("db"))
            & (F.col("h") == F.col("hb")),
            "left",
        )
        .select(
            "event_type",
            "day_a",
            "day_b",
            "h",
            (F.coalesce(F.col("na"), F.lit(0)) - F.coalesce(F.col("nb"), F.lit(0)))
            .alias("dx"),
        )
    )
    seg = hx.groupBy(
        "event_type", "day_a", "day_b", F.expr(f"h div {_PAA_SEG}").alias("s")
    ).agg(
        F.sum("dx").cast("bigint").alias("dss"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("dx2"),
    )
    agg = seg.groupBy("event_type", "day_a", "day_b").agg(
        F.sum(F.col("dss") * F.col("dss")).cast("bigint").alias("lb3"),
        (F.lit(_PAA_SEG) * F.sum("dx2")).cast("bigint").alias("true3"),
    )
    return agg.select(
        "event_type",
        "day_a",
        "day_b",
        "lb3",
        "true3",
        (F.col("true3") - F.col("lb3")).cast("bigint").alias("slack"),
        F.expr(
            "CAST(CASE WHEN true3 = 0 THEN 1000000"
            " ELSE (1000000 * lb3) div true3 END AS BIGINT)"
        ).alias("tight_ppm"),
    )


# ---------------------------------------------------------------------------
# graph_core_profile — bounded k-core survivors vs k (degeneracy profile)
# ---------------------------------------------------------------------------

from tropology_spark.operators.graph import (  # noqa: E402
    _EDGES_CTE,
    bi_materialized,
    kcore_peel,
)

_CORE_KS = (5, 25, 50)
_CORE_ROUNDS = 3


def _core_chain_sql(k: int) -> str:
    out = f"d0_{k} AS (SELECT a, count(*) AS deg FROM ue GROUP BY a),\n"
    out += f"    k0_{k} AS (SELECT a FROM d0_{k} WHERE deg >= {k}),\n"
    out += (
        f"    e1_{k} AS (SELECT ue.a, ue.b FROM ue"
        f" JOIN k0_{k} x ON ue.a = x.a JOIN k0_{k} y ON ue.b = y.a),\n"
    )
    for r in (1, 2):
        out += (
            f"    d{r}_{k} AS (SELECT a, count(*) AS deg FROM e{r}_{k}"
            f" GROUP BY a),\n"
        )
        out += f"    k{r}_{k} AS (SELECT a FROM d{r}_{k} WHERE deg >= {k}),\n"
        out += (
            f"    e{r + 1}_{k} AS (SELECT e{r}_{k}.a, e{r}_{k}.b FROM e{r}_{k}"
            f" JOIN k{r}_{k} x ON e{r}_{k}.a = x.a"
            f" JOIN k{r}_{k} y ON e{r}_{k}.b = y.a),\n"
        )
    return out.rstrip().rstrip(",")


def _core_profile_oracle() -> str:
    chains = ",\n    ".join(_core_chain_sql(k) for k in _CORE_KS)
    finals = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS k,"
        f" CAST(count(DISTINCT a) AS BIGINT) AS n_core_nodes,"
        f" CAST(count(*) // 2 AS BIGINT) AS n_core_edges FROM e3_{k}"
        for k in _CORE_KS
    )
    return (
        _EDGES_CTE
        + f"""
    , ue AS (
      SELECT 'c:' || CAST(src AS VARCHAR) AS a, 'p:' || CAST(dst AS VARCHAR) AS b
      FROM edges
      UNION ALL
      SELECT 'p:' || CAST(dst AS VARCHAR), 'c:' || CAST(src AS VARCHAR)
      FROM edges
    ),
    {chains}
    {finals}
    """
    )


@_stage("graph_core_profile", oracle=_core_profile_oracle())
def graph_core_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEGENERACY PROFILE — surviving nodes and edges of the
    3-round k-core peel at k ∈ {5, 25, 50}: where the registered
    graph_kcore (M91) extracts the one k=25 core, this curve shows
    how the dense backbone collapses as the threshold rises — the
    number that picks k in the first place, and (with
    graph_degree_gini) the audit that decides whether hub-capping
    machinery matters on a corpus.

    Each point runs the single-home :func:`kcore_peel` (factored out
    of the registered M91 body — identical per-round arithmetic and
    checkpoint discipline).  Peels at different k are NOT derivable
    from each other by filtering (induced degrees change), so the
    curve deliberately runs ×|ks| bounded peels — but the SURVIVOR
    SETS NEST (core_50 ⊆ core_25 ⊆ core_5, by round-wise induction on
    the keep sets), so the twin pins n_core_nodes and n_core_edges
    monotone non-increasing in k.  Scale: each peel round is a
    degree agg + two semi joins on key-partitioned shuffles; the
    curve output is 3 rows."""
    ue = bi_materialized(spark, sf_dir).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    out = None
    for k in _CORE_KS:
        cur = kcore_peel(ue, k, _CORE_ROUNDS)
        row = cur.agg(
            F.countDistinct("a").cast("bigint").alias("n_core_nodes"),
            F.expr("CAST(count(*) div 2 AS BIGINT)").alias("n_core_edges"),
        ).select(
            F.lit(k).cast("bigint").alias("k"), "n_core_nodes", "n_core_edges"
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# pipeline_contamination_ngram_curve — contamination vs shingle width
# ---------------------------------------------------------------------------

from tropology_spark.operators.pipeline_ops import (  # noqa: E402
    _CONTAM_EVAL_MOD,
    word_ngrams,
)

_CONTAM_NS = (2, 3, 4)


def _contam_curve_oracle() -> str:
    parts = []
    for n in _CONTAM_NS:
        parts.append(
            f"""
    SELECT CAST({n} AS BIGINT) AS n,
           (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents
            WHERE doc_id % {_CONTAM_EVAL_MOD} <> 0) AS n_train_docs,
           CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS n_flagged,
           CAST(count(DISTINCT (tr.doc_id, ev.doc_id)) AS BIGINT) AS n_pairs,
           CAST((1000000 * count(DISTINCT tr.doc_id))
                // (SELECT count(DISTINCT doc_id) FROM documents
                    WHERE doc_id % {_CONTAM_EVAL_MOD} <> 0) AS BIGINT)
             AS flagged_ppm
    FROM (
      SELECT DISTINCT doc_id,
             array_to_string(l[i:i+{n - 1}], ' ') AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - {n - 1}
    ) tr
    JOIN (
      SELECT DISTINCT doc_id,
             array_to_string(l[i:i+{n - 1}], ' ') AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
            WHERE doc_id % {_CONTAM_EVAL_MOD} = 0),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - {n - 1}
    ) ev ON tr.token = ev.token
    WHERE tr.doc_id % {_CONTAM_EVAL_MOD} <> 0
    """
        )
    return " UNION ALL ".join(parts)


@_stage("pipeline_contamination_ngram_curve", oracle=_contam_curve_oracle())
def pipeline_contamination_ngram_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contamination rate vs SHINGLE WIDTH n ∈ {2, 3, 4} — the
    decontamination DISCRIMINATION axis: short shingles flag the
    whole corpus (collision noise — at n=2 nearly every training doc
    shares a bigram with the benchmark), long ones miss paraphrases;
    the curve shows the cliff and is how a pipeline picks the width
    the registered M25 fixes at 4.  Per width: training docs flagged
    (≥1 shared n-gram with the doc_id%97 benchmark split), distinct
    (train, eval) pairs hit, and the flagged fraction in ppm.

    Each point is one tokenize pass at its width (shingle sets at
    different n do NOT derive from each other) — ×|ns| corpus-linear
    scans, the same deliberate cost class as the winnowing curve;
    at 100 TB the eval side stays tiny and broadcasts, so each pass
    is exactly M25's one-scan shape.  flagged_ppm divides by the
    total training-doc count (a 1-row attach).  The twin pins the
    monotone containment flagged(n+1) ⊆ flagged(n) (an (n+1)-gram
    match contains an n-gram match)."""
    from tropology_spark.session import iter_materialize

    d = load(spark, sf_dir, "documents")
    # the 1-row train count is referenced once per curve point — the
    # double-reference rule (each bare reference re-scans documents).
    n_train = iter_materialize(
        d.filter(F.col("doc_id") % _CONTAM_EVAL_MOD != 0).agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_train_docs")
        )
    )
    out = None
    for n in _CONTAM_NS:
        tok = d.select(
            "doc_id",
            F.explode(
                F.array_distinct(word_ngrams(F.split(F.col("text"), " "), n))
            ).alias("token"),
        )
        ev = tok.filter(F.col("doc_id") % _CONTAM_EVAL_MOD == 0).select(
            F.col("doc_id").alias("eval_id"), F.col("token").alias("ev_token")
        )
        tr = tok.filter(F.col("doc_id") % _CONTAM_EVAL_MOD != 0)
        j = tr.join(F.broadcast(ev), tr.token == ev.ev_token)
        row = (
            j.agg(
                F.countDistinct("doc_id").cast("bigint").alias("n_flagged"),
                F.countDistinct("doc_id", "eval_id")
                .cast("bigint")
                .alias("n_pairs"),
            )
            .crossJoin(F.broadcast(n_train))
            .select(
                F.lit(n).cast("bigint").alias("n"),
                "n_train_docs",
                "n_flagged",
                "n_pairs",
                F.expr(
                    "CAST((1000000 * n_flagged) div n_train_docs AS BIGINT)"
                ).alias("flagged_ppm"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# sim_dim_variance_profile — per-dimension variance terms of the corpus
# ---------------------------------------------------------------------------

from tropology_spark.operators.similarity import (  # noqa: E402
    _SQ8_EX_CTE,
    _pq_exm,
)

_DIMVAR_ORACLE = (
    _SQ8_EX_CTE
    + """
    , st AS (
      SELECT pos,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(vm) AS BIGINT) AS sum_vm,
             CAST(sum(vm * vm) AS BIGINT) AS sum_vm2
      FROM ex GROUP BY pos
    ),
    v AS (
      SELECT pos, n_vecs, sum_vm, sum_vm2,
             CAST(CAST(n_vecs AS HUGEINT) * sum_vm2
                  - CAST(sum_vm AS HUGEINT) * sum_vm AS BIGINT) AS var_num
      FROM st
    )
    SELECT pos, n_vecs, sum_vm, sum_vm2, var_num,
           CAST(row_number() OVER (ORDER BY var_num DESC, pos) AS BIGINT)
             AS rk
    FROM v
"""
)


@_stage("sim_dim_variance_profile", oracle=_DIMVAR_ORACLE)
def sim_dim_variance_profile(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """Per-DIMENSION variance terms of the embedding corpus — n, Σvm,
    Σvm² on the micro-unit carrier plus the exact population-variance
    numerator n·Σvm² − (Σvm)² and the variance rank: the evidence
    behind every prefix-dimension decision (matryoshka truncation
    M252 keeps the FIRST dims; this profile shows whether the first
    dims actually carry the variance, and is the integer input a
    PCA/OPQ rotation decision reads).  The *_terms discipline: the
    variance itself divides by n², so its exact integer numerator
    ships instead.

    var_num is computed in wide integers (DECIMAL(38,0)/HUGEINT —
    n·Σvm² ≈ n²·(6·10⁵)² passes BIGINT at ~2.5·10³ vectors… the
    FIXTURE's 2·10³ stays under, but a regenerated or scaled corpus
    would not, so the wide-integer rule applies unconditionally) and
    the result casts back to BIGINT while n ≤ ~10⁷ (docstring bound;
    past that, normalize first).  The rank window rides the pmod
    constant key over the 64-row dimension table.  Scale: ONE
    map-side-combinable agg over the exploded (pos, vm) projection —
    corpus-linear, no joins; the profile is d rows.  ``e=`` overrides
    the embeddings frame (probe kwarg)."""
    if e is None:
        e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ex = _pq_exm(e)
    st = ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("vm").cast("bigint").alias("sum_vm"),
        F.sum(F.col("vm") * F.col("vm")).cast("bigint").alias("sum_vm2"),
    )
    v = st.select(
        "pos",
        "n_vecs",
        "sum_vm",
        "sum_vm2",
        F.expr(
            "CAST(CAST(n_vecs AS DECIMAL(38,0)) * sum_vm2"
            " - CAST(sum_vm AS DECIMAL(38,0)) * sum_vm AS BIGINT)"
        ).alias("var_num"),
    )
    w = Window.partitionBy(F.pmod(F.col("pos"), F.lit(1))).orderBy(
        F.desc("var_num"), F.asc("pos")
    )
    return v.select(
        "pos",
        "n_vecs",
        "sum_vm",
        "sum_vm2",
        "var_num",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# agg_join_size_ams — AGMS join-cardinality estimate vs exact join size
# ---------------------------------------------------------------------------

from tropology_spark.operators.aggregates import (  # noqa: E402
    _AMS_SIGN_SQL,
)

_JSZ_QTY = 25  # the filtered side: lineitem rows with l_quantity > 25


def _join_size_oracle() -> str:
    sa = ", ".join(
        f"CAST(sum({sql}) AS BIGINT) AS sa{j}"
        for j, sql in enumerate(_AMS_SIGN_SQL)
    )
    sb = ", ".join(
        f"CAST(sum(CASE WHEN fb = 1 THEN {sql.replace('THEN 1 ELSE -1', 'THEN 1 ELSE -1')} ELSE 0 END) AS BIGINT) AS sb{j}"
        for j, sql in enumerate(_AMS_SIGN_SQL)
    )
    u = " UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS sketch_id, sa{j} AS sa, sb{j} AS sb"
        f" FROM s"
        for j in range(8)
    )
    return f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(l_partkey AS STRING)), 1, 8))::BIGINT
               AS h,
             CASE WHEN l_quantity > {_JSZ_QTY} THEN 1 ELSE 0 END AS fb
      FROM lineitem
    ),
    s AS (SELECT {sa}, {sb} FROM h),
    u AS ({u}),
    ex AS (
      SELECT CAST(sum(a.ca * b.cb) AS BIGINT) AS j_exact
      FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS ca
            FROM lineitem GROUP BY l_partkey) a
      JOIN (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cb
            FROM lineitem WHERE l_quantity > {_JSZ_QTY}
            GROUP BY l_partkey) b
        ON a.l_partkey = b.l_partkey
    )
    SELECT u.sketch_id, u.sa, u.sb,
           CAST(u.sa * u.sb AS BIGINT) AS est,
           ex.j_exact,
           CAST(u.sa * u.sb - ex.j_exact AS BIGINT) AS diff
    FROM u CROSS JOIN ex
    """


@_stage("agg_join_size_ams", oracle=_join_size_oracle())
def agg_join_size_ams(
    spark: SparkSession, sf_dir: str, li: DataFrame | None = None
) -> DataFrame:
    """AGMS JOIN-CARDINALITY estimation audit — the Alon-Gibbons-
    Matias-Szegedy result that the dot product of two independent
    ±1-sign sketches is an unbiased estimator of the join size
    Σ_k a_k·b_k: here side A = the full lineitem part-key stream and
    side B = the ``l_quantity > {q}`` slice, so the estimate answers
    the cardinality question a cost-based optimizer asks before
    picking a join strategy ("how many rows survive this filtered
    join?") — the r12 agg_ams_f2 is exactly the SELF-join special
    case of this sketch.  Eight independent estimates est_j =
    SA_j·SB_j ship next to the exact join size and the SIGNED error
    diff = est − exact (no division anywhere — signed integer
    division is the div//floor trap, so the consumer takes the
    median-of-8 and normalizes; the twin pins the exact values).

    Sign hashes reuse the aggregates.py _AMS_SIGN_SQL single home
    (same md5-low-32 base hash, same multiplier family — the two
    sketches for A and B use the SAME hash per sketch id, which is
    what makes E[SA·SB] = Σ a_k·b_k).  Scale: BOTH sketch vectors
    come from ONE lineitem scan (SB_j is the fb-masked partial of the
    same pass) — 16 map-side-combinable partial sums per partition;
    the exact branch (two groupBys + an equi-join) exists only
    because this is the audit.  The 1-row exact attach is a
    deliberate scalar crossJoin (BNLJ-allowlist at activation).
    ``li=`` overrides the lineitem frame — (l_partkey, l_quantity)
    (probe/property kwarg; the driver contract never passes it)."""
    if li is None:
        li = load(spark, sf_dir, "lineitem")
    rows = li.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
        F.when(F.col("l_quantity") > _JSZ_QTY, 1).otherwise(0).alias("fb"),
        "l_partkey",
    )
    s = rows.agg(
        *(
            [
                F.sum(F.expr(sql)).cast("bigint").alias(f"sa{j}")
                for j, sql in enumerate(_AMS_SIGN_SQL)
            ]
            + [
                F.sum(
                    F.when(F.col("fb") == 1, F.expr(sql)).otherwise(0)
                )
                .cast("bigint")
                .alias(f"sb{j}")
                for j, sql in enumerate(_AMS_SIGN_SQL)
            ]
        )
    )
    stack_args = ", ".join(f"{j}L, sa{j}, sb{j}" for j in range(8))
    u = s.select(
        F.expr(f"stack(8, {stack_args}) AS (sketch_id, sa, sb)")
    )
    a = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("ca")
    )
    b = (
        li.filter(F.col("l_quantity") > _JSZ_QTY)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    )
    ex = (
        a.join(b, "l_partkey")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("j_exact"))
    )
    return u.crossJoin(F.broadcast(ex)).select(
        F.col("sketch_id").cast("bigint").alias("sketch_id"),
        "sa",
        "sb",
        (F.col("sa") * F.col("sb")).cast("bigint").alias("est"),
        "j_exact",
        (F.col("sa") * F.col("sb") - F.col("j_exact"))
        .cast("bigint")
        .alias("diff"),
    )


agg_join_size_ams.__doc__ = agg_join_size_ams.__doc__.format(q=_JSZ_QTY)
