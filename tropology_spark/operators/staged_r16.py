"""STAGED round-16 operators — implemented and parity-tested, NOT yet
registered (the round-8..12 staging pattern, sixth application).

The round-13 window executed (14 activations + 5 r05 + 31 r06) and the
round-14/15 slates are already banked, so these bodies target ROUND
16.  Same (fn, oracle) contract as the registry; activation is the
mechanical move + five-fold lockstep.  tests/test_staged_r16.py runs
the driver-replica compare at both verification scales, Python twins
for the formula-bearing ops, two hypothesis property suites on the
exact staged paths, the partitioning-invariance probe, and the plan
sweep (NO BroadcastNestedLoopJoin anywhere in this slate — every
bounded axis rides an explode or an equi-join, a first).

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- sim_anisotropy_terms — the embedding-anisotropy diagnostic
  (mean pairwise dot vs mean norm², Ethayarajh): Σ_pairs dot =
  |Σv|² − Σ|v|² makes the all-pairs quantity ONE-PASS.
- analytics_benford_audit — first-significant-digit profile of order
  totals vs the Benford ppm constants (the fraud/data-quality screen).
- pipeline_consistent_hash_moves — mod-rehash vs consistent-ring
  reassignment audit at n_shards 8→9 (the data-placement argument:
  ~8/9 of keys move under mod, ~1/9 under the ring, and every
  ring-moved key lands on the NEW shard).
- ts_triangle_downsample — largest-triangle downsampling (LTOB with
  fixed bucket-mean anchors): per 6h bucket the visually-dominant
  point by exact integer doubled-areas — the dashboard decimation
  operator.
- pipeline_ldiversity_audit — l-diversity per quasi-identifier group
  (distinct sensitive values; the privacy gate k-anonymity M115 does
  not check: a uniform group of size ≥ k still leaks its attribute).
- graph_wedge_sample_closure — closure rate on md5-sampled wedges at
  1/4/16 sampling moduli vs the full M231 truth (the approximate
  triangle-counting audit; power-of-two moduli NEST).
- dedup_minhash_k_curve — MinHash estimator error at k ∈ 8/16 from
  ONE signature pass (the k axis M284 fixes at 16; the first 8 perms
  are a PREFIX of the 16 — the curve-over-prefix rule).
- sim_pq_k_curve — PQ distortion vs codebook size k ∈ 2/4/8 from ONE
  encode pass (codes 1..2 ⊂ 1..4 ⊂ 1..8, so distortion is provably
  non-increasing in k; n_zero == k is the built-in anchor).
- ts_local_maxima — strict local maxima over consecutive-day triples
  per event type, with the discrete-Laplacian sharpness 2c − cp − cn.
- agg_higher_moments_terms — exact power sums Σq..Σq⁴ per return flag
  plus the assembled central-moment carriers Σ(x−μ)²/³/⁴ as single
  integral divisions (skewness/kurtosis inputs, the *_terms
  discipline extended past M15's variance).
"""

from __future__ import annotations

import hashlib

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
# sim_anisotropy_terms — one-pass embedding anisotropy diagnostic
# ---------------------------------------------------------------------------

# Shift constants for the two signed integral divisions, sized from
# DOMAIN BOUNDS (the r17 Lehr lesson — never size a shift by habit):
# |mean pair dot| <= mean norm^2 <= 64e12 u^2 (components cap at 1e6),
# so the pair carrier shifts by 1e14; |ani| <= 1e6 ppm by
# Cauchy-Schwarz, so the ppm carrier shifts by 1e7.  (The original
# shared 1e9 was too small for anti-aligned corpora — both engines
# truncated identically so parity couldn't see it; the Gram-identity
# hypothesis suite caught it.)
_ANI_BIG_PAIR = 10**14
_ANI_BIG_PPM = 10**7


@_stage(
    "sim_anisotropy_terms",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s
    ),
    exm AS (
      SELECT vec_id, pos, CAST(round(val * 1000000) AS BIGINT) AS vm FROM ex
    ),
    per_pos AS (
      SELECT pos,
             CAST(sum(vm) AS BIGINT) AS s_pos,
             CAST(sum(vm * vm) AS BIGINT) AS ssq_pos,
             CAST(count(*) AS BIGINT) AS cnt_pos
      FROM exm GROUP BY pos
    ),
    tot AS (
      SELECT CAST(sum(cnt_pos) // 64 AS BIGINT) AS n,
             CAST(sum(ssq_pos) AS HUGEINT) AS sn2,
             sum(CAST(s_pos AS HUGEINT) * s_pos) AS gram
      FROM per_pos
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           CAST(sn2 AS BIGINT) AS sum_norm2_u2,
           CAST(sn2 // n AS BIGINT) AS mean_norm2_u2,
           CAST(gram // n AS BIGINT) AS gram_div_n,
           CAST((gram - sn2 + CAST({_ANI_BIG_PAIR} AS HUGEINT) * (n * (n - 1)))
                // (n * (n - 1)) - {_ANI_BIG_PAIR} AS BIGINT) AS mean_pair_dot_u2,
           CAST((1000000 * (gram - sn2)
                 + CAST({_ANI_BIG_PPM} AS HUGEINT) * ((n - 1) * sn2))
                // ((n - 1) * sn2) - {_ANI_BIG_PPM} AS BIGINT) AS ani_ppm
    FROM tot
    """,
)
def sim_anisotropy_terms(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — embedding ANISOTROPY terms (Ethayarajh's
    diagnostic; an isotropic embedding space has mean pairwise cosine
    ≈ 0, a collapsed one ≈ 1 — the single number that says whether
    cosine similarity is still informative before any retrieval tier
    is tuned): mean pairwise dot (µ-unit², over ALL n(n−1) ordered
    pairs) and its ratio to the mean squared norm in ppm.  The
    all-pairs sum NEVER materializes pairs — the Gram identity
    Σ_{{i≠j}} <vi,vj> = |Σvi|² − Σ|vi|² turns it into per-dimension
    component sums: one scan, one 64-row rollup, zero joins.

    All integer: vm micro-carriers, gram/sn2 in HUGEINT/DECIMAL(38,0)
    (M192 rule), and the two signed ratios through the +BIG·den shift
    identity (floor == truncate).  Scale: the per-pos partial is
    map-side combinable — the 100 TB cost is exactly one corpus scan,
    which is why this is THE cheap drift probe to run before the
    O(n·k) quantizer retrain (sim_quantizer_drift, r14 slate).

    ``e=`` substitutes the embedding frame for probes; the driver
    contract never passes it."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    exm = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos0", "val")
    ).select(
        "vec_id",
        F.round(F.col("val").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("vm"),
        (F.col("pos0") + 1).alias("pos"),
    )
    per_pos = exm.groupBy("pos").agg(
        F.sum("vm").cast("bigint").alias("s_pos"),
        F.sum(F.col("vm") * F.col("vm")).cast("bigint").alias("ssq_pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt_pos"),
    )
    tot = per_pos.agg(
        F.expr("sum(cnt_pos) div 64").cast("bigint").alias("n"),
        F.sum("ssq_pos").cast("decimal(38,0)").alias("sn2"),
        F.sum(F.expr("CAST(s_pos AS DECIMAL(38,0)) * s_pos")).alias("gram"),
    )
    return tot.select(
        F.col("n").alias("n_vectors"),
        F.col("sn2").cast("bigint").alias("sum_norm2_u2"),
        F.expr("CAST(sn2 div n AS BIGINT)").alias("mean_norm2_u2"),
        F.expr("CAST(gram div n AS BIGINT)").alias("gram_div_n"),
        F.expr(
            f"CAST((gram - sn2 + CAST({_ANI_BIG_PAIR} AS DECIMAL(38,0))"
            f" * (n * (n - 1))) div (n * (n - 1)) - {_ANI_BIG_PAIR} AS BIGINT)"
        ).alias("mean_pair_dot_u2"),
        F.expr(
            f"CAST((1000000 * (gram - sn2) + CAST({_ANI_BIG_PPM} AS DECIMAL(38,0))"
            f" * ((n - 1) * sn2)) div ((n - 1) * sn2) - {_ANI_BIG_PPM} AS BIGINT)"
        ).alias("ani_ppm"),
    )


# ---------------------------------------------------------------------------
# analytics_benford_audit — first-significant-digit profile vs Benford
# ---------------------------------------------------------------------------

#: Benford P(d) = log10(1 + 1/d) rounded to ppm — data-independent
#: published constants (they sum to exactly 1,000,000 at this
#: rounding), embedded as literals in BOTH engines.
_BENFORD_PPM = (
    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
    (6, 66947), (7, 57992), (8, 51153), (9, 45757),
)


@_stage(
    "analytics_benford_audit",
    oracle=f"""
    WITH o AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
            FROM o GROUP BY digit),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM o),
    bf(digit, benford_ppm) AS (VALUES
      {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM)})
    SELECT CAST(bf.digit AS BIGINT) AS digit,
           CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs,
           CAST((1000000 * coalesce(obs.n_obs, 0)) // n.nt AS BIGINT)
             AS obs_ppm,
           CAST(bf.benford_ppm AS BIGINT) AS benford_ppm,
           CAST((1000000 * coalesce(obs.n_obs, 0)) // n.nt
                - bf.benford_ppm AS BIGINT) AS dev_ppm
    FROM bf LEFT JOIN obs ON bf.digit = obs.digit
    CROSS JOIN n
    """,
)
def analytics_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — BENFORD'S-LAW first-digit audit of order totals
    (in cents, so the digit extraction is exact integer string work):
    per leading digit 1-9, the observed count, observed ppm, the
    published Benford expectation P(d) = log10(1+1/d) as fixed ppm
    constants (data-independent literals in both engines — the ln/
    log10 transcendentals never enter the hash gate), and the signed
    deviation — the forensic-accounting / synthetic-data screen every
    financial pipeline runs (invented amounts are Benford-deviant;
    so are unit-price × round-quantity artifacts, which is exactly
    what this fixture exposes).

    Scale: one map-side-combinable digit rollup; the 9-row spine
    zero-fills absent digits and carries the corpus total on the
    bounded digit axis (pmod-constant-key window — no scalar
    attach)."""
    o = load(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
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
        F.expr("(1000000 * n_obs) div nt").cast("bigint").alias("obs_ppm"),
        F.col("benford_ppm").cast("bigint").alias("benford_ppm"),
        (
            F.expr("(1000000 * n_obs) div nt") - F.col("benford_ppm")
        )
        .cast("bigint")
        .alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# pipeline_consistent_hash_moves — mod vs ring reassignment at 8 -> 9 shards
# ---------------------------------------------------------------------------

from tropology_spark.operators.pipeline_ops import (  # noqa: E402
    _CH_MOD,
    _CH_VNODES,
    _RING8,
    _RING9,
    ring_assign,
)


def _ch_oracle() -> str:
    r8 = ", ".join(f"({s}, {r})" for s, _v, r in _RING8)
    r9 = ", ".join(f"({s}, {r})" for s, _v, r in _RING9)
    assign = """
      SELECT h.doc_id,
             (SELECT shard FROM {ring} rp
              ORDER BY (rp.r - h.h + {m}) % {m}, rp.shard, rp.r
              LIMIT 1) AS a
      FROM h"""
    return f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ),
    ring8(shard, r) AS (VALUES {r8}),
    ring9(shard, r) AS (VALUES {r9}),
    a8 AS ({assign.format(ring="ring8", m=_CH_MOD)}),
    a9 AS ({assign.format(ring="ring9", m=_CH_MOD)}),
    per AS (
      SELECT h.doc_id,
             h.h % 8 AS m8, h.h % 9 AS m9,
             a8.a AS r8a, a9.a AS r9a
      FROM h JOIN a8 ON h.doc_id = a8.doc_id
             JOIN a9 ON h.doc_id = a9.doc_id
    )
    SELECT method, n_keys, n_moved,
           CAST((1000000 * n_moved) // n_keys AS BIGINT) AS moved_ppm,
           n_to_new
    FROM (
      SELECT 'mod' AS method,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN m8 <> m9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved,
             CAST(sum(CASE WHEN m8 <> m9 AND m9 = 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_to_new
      FROM per
      UNION ALL
      SELECT 'ring',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN r8a <> r9a THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN r8a <> r9a AND r9a = 8 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM per
    ) t
    """


@_stage("pipeline_consistent_hash_moves", oracle=_ch_oracle())
def pipeline_consistent_hash_moves(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — CONSISTENT-HASHING reassignment audit: grow the
    shard count 8 → 9 and count, per placement scheme, how many keys
    MOVE — mod hashing reassigns ~8/9 of the corpus (every residue
    shifts), the consistent ring (4 virtual nodes per shard, md5 ring
    positions, successor assignment) reassigns ~1/(n+1), and EVERY
    ring-moved key lands on the NEW shard (n_moved == n_to_new for
    'ring' — the structural guarantee, twin-pinned; under mod it is a
    ~1/9 coincidence).  This is the shuffle-economics argument for
    ring-partitioned layouts at 100 TB: re-sharding cost is
    proportional to 1/n of the data, not all of it.

    Determinism: key hash = md5-low-32 of doc_id; ring positions are
    import-time md5 literals embedded in BOTH engines (the _CMS_ROWS
    constant discipline — the twin re-derives them with hashlib).
    Scale: the ring is a 36-row broadcast riding an EXPLODE on the key
    rows (no BNLJ); assignment is one per-key min-struct aggregation —
    map-side combinable.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    per = (
        h.select(
            "doc_id",
            (F.col("h") % 8).alias("m8"),
            (F.col("h") % 9).alias("m9"),
        )
        .join(ring_assign(h, _RING8, "r8a"), "doc_id")
        .join(ring_assign(h, _RING9, "r9a"), "doc_id")
    )

    def row(method: str, old: str, new: str) -> DataFrame:
        return per.agg(
            F.lit(method).alias("method"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col(old) != F.col(new), 1).otherwise(0))
            .cast("bigint")
            .alias("n_moved"),
            F.sum(
                F.when((F.col(old) != F.col(new)) & (F.col(new) == 8), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_to_new"),
        ).select(
            "method",
            "n_keys",
            "n_moved",
            F.expr("(1000000 * n_moved) div n_keys").cast("bigint").alias("moved_ppm"),
            "n_to_new",
        )

    return row("mod", "m8", "m9").unionByName(row("ring", "r8a", "r9a"))


# ---------------------------------------------------------------------------
# ts_triangle_downsample — largest-triangle decimation with bucket anchors
# ---------------------------------------------------------------------------

_LT_BUCKET_H = 6  # hours per bucket


@_stage(
    "ts_triangle_downsample",
    oracle=f"""
    WITH hc AS (
      SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    hb AS (SELECT h, c, h // {_LT_BUCKET_H} AS b FROM hc),
    bs AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(h) AS BIGINT) AS sh,
                  CAST(sum(c) AS BIGINT) AS sc
           FROM hb GROUP BY b),
    a AS (
      SELECT hb.b, hb.h, hb.c,
             abs((hb.h * p.n - p.sh) * (nx.sc * p.n - p.sc * nx.n)
                 - (nx.sh * p.n - p.sh * nx.n) * (hb.c * p.n - p.sc))
               AS area2
      FROM hb
      JOIN bs p ON p.b = hb.b - 1
      JOIN bs nx ON nx.b = hb.b + 1
    )
    SELECT b AS bucket, h, c, CAST(area2 AS BIGINT) AS area2
    FROM (SELECT *, row_number() OVER (PARTITION BY b
                                       ORDER BY area2 DESC, h) AS rk16
          FROM a) t
    WHERE rk16 = 1
    """,
)
def ts_triangle_downsample(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — LARGEST-TRIANGLE downsampling of the hourly
    activity series (the LTTB family, fixed-anchor variant: anchors
    are the PREVIOUS and NEXT buckets' mean points, so every bucket's
    pick is independent — the sequential previously-selected-point
    dependency of classic LTTB is gone and the operator parallelizes
    per bucket): within each {w}-hour bucket, keep the point whose
    triangle against the neighbor-bucket means has the largest area —
    the visually-dominant point a dashboard decimates to.

    Exact: the doubled area is cleared of the two mean divisions by
    P·N (both bucket populations), giving a pure integer
    |cross-product| with a (area DESC, h) unique tie-break.  First and
    last buckets (and gap-adjacent ones) have no neighbor row and
    drop out of the equi-joins — the interior-bucket semantics.
    Scale: one hourly rollup, one bounded bucket rollup, two
    broadcast-size equi-joins, one per-bucket (real key) window.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hc = e.groupBy(
        F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    hb = hc.select("h", "c", F.expr(f"h div {_LT_BUCKET_H}").alias("b"))
    bs = hb.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("h").cast("bigint").alias("sh"),
        F.sum("c").cast("bigint").alias("sc"),
    )
    p = bs.select(
        (F.col("b") + 1).alias("b"),
        F.col("n").alias("pn"),
        F.col("sh").alias("psh"),
        F.col("sc").alias("psc"),
    )
    nx = bs.select(
        (F.col("b") - 1).alias("b"),
        F.col("n").alias("nn"),
        F.col("sh").alias("nsh"),
        F.col("sc").alias("nsc"),
    )
    a = (
        hb.join(p, "b")
        .join(nx, "b")
        .select(
            "b",
            "h",
            "c",
            F.abs(
                (F.col("h") * F.col("pn") - F.col("psh"))
                * (F.col("nsc") * F.col("pn") - F.col("psc") * F.col("nn"))
                - (F.col("nsh") * F.col("pn") - F.col("psh") * F.col("nn"))
                * (F.col("c") * F.col("pn") - F.col("psc"))
            ).alias("area2"),
        )
    )
    w = Window.partitionBy("b").orderBy(F.desc("area2"), F.asc("h"))
    return (
        a.withColumn("rk16", F.row_number().over(w))
        .filter(F.col("rk16") == 1)
        .select(
            F.col("b").alias("bucket"),
            "h",
            "c",
            F.col("area2").cast("bigint").alias("area2"),
        )
    )


ts_triangle_downsample.__doc__ = ts_triangle_downsample.__doc__.format(
    w=_LT_BUCKET_H
)


# ---------------------------------------------------------------------------
# pipeline_ldiversity_audit — l-diversity per quasi-identifier group
# ---------------------------------------------------------------------------

_LDIV_BUCKET = 200  # n_chars generalization width (the QI coarsening)


@_stage(
    "pipeline_ldiversity_audit",
    oracle=f"""
    SELECT source,
           CAST(n_chars // {_LDIV_BUCKET} AS BIGINT) AS size_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT lang) AS BIGINT) AS l_distinct,
           CAST(CASE WHEN count(DISTINCT lang) < 2 THEN 1 ELSE 0 END AS BIGINT)
             AS below_l2,
           CAST(CASE WHEN count(DISTINCT lang) < 3 THEN 1 ELSE 0 END AS BIGINT)
             AS below_l3
    FROM documents
    GROUP BY source, n_chars // {_LDIV_BUCKET}
    """,
)
def pipeline_ldiversity_audit(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — L-DIVERSITY audit over the quasi-identifier
    tuple (source, generalized length bucket) with ``lang`` as the
    sensitive attribute: per equivalence class, the row count AND the
    number of DISTINCT sensitive values, plus the l<2 / l<3 violation
    flags — the privacy gate k-anonymity (M115) cannot express: a
    class of 1,000 rows that all share one language still discloses
    the attribute of every member (the homogeneity attack
    Machanavajjhala et al. named l-diversity to stop).  Release rule:
    suppress or re-generalize every below-l class before the corpus
    ships.

    Scale: one aggregate keyed by the QI tuple; count(DISTINCT) over
    the bounded sensitive domain is a partial-agg-friendly shuffle of
    (QI, lang) projections; the violation list is |distinct QI| rows.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    g = d.groupBy(
        "source",
        F.expr(f"n_chars div {_LDIV_BUCKET}").cast("bigint").alias("size_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("lang").cast("bigint").alias("l_distinct"),
    )
    return g.select(
        "source",
        "size_bucket",
        "n_rows",
        "l_distinct",
        F.when(F.col("l_distinct") < 2, 1).otherwise(0).cast("bigint").alias(
            "below_l2"
        ),
        F.when(F.col("l_distinct") < 3, 1).otherwise(0).cast("bigint").alias(
            "below_l3"
        ),
    )


# ---------------------------------------------------------------------------
# graph_wedge_sample_closure — closure rate on md5-sampled wedges
# ---------------------------------------------------------------------------

_WS_MODS = (1, 4, 16)


def _wedge_sample_oracle() -> str:
    from tropology_spark.operators.graph_motifs import _CAPPED_PROJ_CTE

    mods = ", ".join(str(s) for s in _WS_MODS)
    return (
        _CAPPED_PROJ_CTE
        + f"""
    , und AS (SELECT u AS x, v AS y FROM proj0
              UNION ALL SELECT v, u FROM proj0),
    wed AS (
      SELECT a.x, a.y AS u, b.y AS w,
             ('0x' || substring(md5(CAST(a.x AS VARCHAR) || '_'
                  || CAST(a.y AS VARCHAR) || '_'
                  || CAST(b.y AS VARCHAR)), 1, 8))::BIGINT AS hk
      FROM und a JOIN und b ON a.x = b.x AND a.y < b.y
    ),
    wc AS (
      SELECT wed.*, CASE WHEN p.u IS NULL THEN 0 ELSE 1 END AS closed
      FROM wed LEFT JOIN proj0 p ON p.u = wed.u AND p.v = wed.w
    ),
    per AS (
      SELECT s.s,
             CAST(count(*) AS BIGINT) AS n_wedges,
             CAST(sum(closed) AS BIGINT) AS n_closed
      FROM wc JOIN (SELECT unnest([{mods}]) AS s) s ON wc.hk % s.s = 0
      GROUP BY s.s
    )
    SELECT CAST(s AS BIGINT) AS s, n_wedges, n_closed,
           CAST(CASE WHEN n_wedges = 0 THEN NULL
                     ELSE (1000000 * n_closed) // n_wedges END AS BIGINT)
             AS closure_ppm,
           CAST(CASE WHEN n_wedges = 0 THEN NULL
                     ELSE (1000000 * n_closed) // n_wedges
                          - max(CASE WHEN s = 1 THEN
                                  (1000000 * n_closed) // n_wedges END)
                              OVER () END AS BIGINT) AS dev_ppm
    FROM per
    """
    )


@_stage("graph_wedge_sample_closure", oracle=_wedge_sample_oracle())
def graph_wedge_sample_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — WEDGE-SAMPLED closure rate (the approximate
    triangle-counting audit, Seshadhri et al.): enumerate the capped
    projection's wedges, sample them by the deterministic md5 key at
    moduli s ∈ 1/4/16 (power-of-two moduli NEST: the s=16 sample is a
    subset of the s=4 sample — twin-pinned containment), and report
    per modulus the sampled wedge count, closed count, closure ppm and
    the signed deviation from the full (s=1) truth — exactly M231's
    global clustering coefficient, estimated from 1/s of the work.
    At 100 TB wedge enumeration is THE cost (Σ C(d,2)); this measures
    what sampling buys and what it costs in accuracy, on the same
    hub-capped projection the exact ops run.

    Composed, not copied: the Spark side reads the session-shared
    copurchase_projection view; the oracle extends _CAPPED_PROJ_CTE
    (the M120/M204/M213/M231 single home).  The ×3 modulus axis rides
    an explode on the wedge rows; the closed test is one LEFT
    equi-join against the projection — no BNLJ anywhere."""
    from tropology_spark.operators.graph_motifs import (
        _HUB_CAP,
        copurchase_projection,
    )

    proj = copurchase_projection(spark, sf_dir, hub_cap=_HUB_CAP)
    und = proj.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        proj.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    a = und.select("x", F.col("y").alias("wu"))
    b = und.select("x", F.col("y").alias("ww"))
    wed = (
        a.join(b, "x")
        .filter(F.col("wu") < F.col("ww"))
        .select(
            "x",
            "wu",
            "ww",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws("_", F.col("x"), F.col("wu"), F.col("ww"))
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
    )
    pr = proj.select(F.col("u").alias("wu"), F.col("v").alias("ww"), F.lit(1).alias("cl"))
    wc = wed.join(pr, ["wu", "ww"], "left").select(
        "hk", F.coalesce(F.col("cl"), F.lit(0)).alias("closed")
    )
    per = (
        wc.select(
            "hk",
            "closed",
            F.explode(F.array(*[F.lit(s) for s in _WS_MODS])).alias("s"),
        )
        .filter(F.col("hk") % F.col("s") == 0)
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
            F.sum("closed").cast("bigint").alias("n_closed"),
        )
    )
    w = Window.partitionBy(F.pmod(F.col("s"), F.lit(1)))
    rate = F.expr(
        "CASE WHEN n_wedges = 0 THEN NULL"
        " ELSE (1000000 * n_closed) div n_wedges END"
    )
    return per.select(
        F.col("s").cast("bigint").alias("s"),
        "n_wedges",
        "n_closed",
        rate.cast("bigint").alias("closure_ppm"),
    ).select(
        "s",
        "n_wedges",
        "n_closed",
        "closure_ppm",
        (
            F.col("closure_ppm")
            - F.max(F.when(F.col("s") == 1, F.col("closure_ppm"))).over(w)
        )
        .cast("bigint")
        .alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# dedup_minhash_k_curve — MinHash estimator error vs k from ONE signature pass
# ---------------------------------------------------------------------------


def _minhash_k_oracle() -> str:
    from tropology_spark.operators.dedup import (
        _MH_PERMS,
        _band_rows_cte,
        _minhash_sig_cte,
    )

    agree8 = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    agree16 = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
        for i in range(len(_MH_PERMS))
    )
    return (
        _minhash_sig_cte()
        + _band_rows_cte()
        + f"""
    , cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    agr AS (
      SELECT c.doc_a, c.doc_b,
             CAST({agree8} AS BIGINT) AS agree8,
             CAST({agree16} AS BIGINT) AS agree16
      FROM cand c JOIN sig a ON a.doc_id = c.doc_a
                  JOIN sig b ON b.doc_id = c.doc_b
    ),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    itr AS (
      SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.token = sa.token
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT agr.doc_a, agr.doc_b, agr.agree8, agr.agree16,
             CAST((1000000 * coalesce(itr.inter, 0))
                  // (za.n + zb.n - coalesce(itr.inter, 0)) AS BIGINT) AS jac_ppm
      FROM agr
      JOIN sz za ON za.doc_id = agr.doc_a
      JOIN sz zb ON zb.doc_id = agr.doc_b
      LEFT JOIN itr ON itr.doc_a = agr.doc_a AND itr.doc_b = agr.doc_b
    ),
    ks AS (
      SELECT 8 AS k, abs(125000 * agree8 - jac_ppm) AS aerr FROM pairs
      UNION ALL
      SELECT 16, abs(62500 * agree16 - jac_ppm) FROM pairs
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN aerr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(sum(aerr) AS BIGINT) AS sum_abs_err_ppm,
           CAST(max(aerr) AS BIGINT) AS max_abs_err_ppm
    FROM ks GROUP BY k
    """
    )


@_stage("dedup_minhash_k_curve", oracle=_minhash_k_oracle())
def dedup_minhash_k_curve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the MinHash K tuning curve: per-pair estimator
    error at k = 8 (the FIRST 8 permutations — a strict prefix of the
    16, so one signature pass serves both points: the curve-over-
    prefix rule) vs k = 16, aggregated over the J3 candidate pairs as
    n_pairs / exactly-estimated count / total and worst |est − exact|
    ppm — the memory-accuracy axis (err ~ 1/√k) that M284 fixes at
    k=16, completing the family: M264 tunes (b,r), this tunes k.

    Composed, not copied: the per-pair agree16/exact-Jaccard base IS
    the registered dedup_minhash_estimate_error frame (QUERIES
    composition, the dedup_lsh_recall rule); only the prefix agreement
    agree8 is joined on from the shared minhash_sigs_frame.  Scale:
    everything is bounded by the banded candidate set; the k axis is
    a ×2 explode on the pair rows.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    from tropology_spark.operators.dedup import minhash_sigs_frame
    from tropology_spark.registry import QUERIES

    base = QUERIES["dedup_minhash_estimate_error"](spark, sf_dir, docs=docs)
    sigs = minhash_sigs_frame(spark, sf_dir, docs=docs)
    a = sigs.alias("a")
    b = sigs.alias("b")
    agree8 = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(8)
    )
    pairs = (
        base.join(a, base.doc_a == F.col("a.doc_id"))
        .join(b, base.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "jac_ppm",
            F.col("agree").alias("agree16"),
            agree8.cast("bigint").alias("agree8"),
        )
    )
    ks = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(8).cast("bigint").alias("k"),
                    F.abs(F.lit(125000) * F.col("agree8") - F.col("jac_ppm"))
                    .cast("bigint")
                    .alias("aerr"),
                ),
                F.struct(
                    F.lit(16).cast("bigint").alias("k"),
                    F.abs(F.lit(62500) * F.col("agree16") - F.col("jac_ppm"))
                    .cast("bigint")
                    .alias("aerr"),
                ),
            )
        ).alias("r")
    ).select("r.k", "r.aerr")
    return ks.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("aerr") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.sum("aerr").cast("bigint").alias("sum_abs_err_ppm"),
        F.max("aerr").cast("bigint").alias("max_abs_err_ppm"),
    )


# ---------------------------------------------------------------------------
# sim_pq_k_curve — PQ distortion vs codebook size from ONE encode pass
# ---------------------------------------------------------------------------

_PQK_KS = (2, 4, 8)


def _pq_k_oracle() -> str:
    from tropology_spark.operators.similarity import _EX_CTE, _PQ_ENC_CTE

    sel = " UNION ALL ".join(
        f"SELECT vec_id, {k} AS k, sum(m{k}) AS qerr FROM best GROUP BY vec_id"
        for k in _PQK_KS
    )
    mins = ", ".join(
        f"min(CASE WHEN code <= {k} THEN d2 END) AS m{k}" for k in _PQK_KS
    )
    return (
        _EX_CTE
        + _PQ_ENC_CTE
        + f""",
    best AS (SELECT vec_id, s, {mins} FROM enc0 GROUP BY vec_id, s),
    q AS ({sel})
    SELECT CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN qerr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(sum(qerr) AS BIGINT) AS sum_qerr,
           CAST(sum(qerr) // count(*) AS BIGINT) AS mean_qerr,
           CAST(max(qerr) AS BIGINT) AS max_qerr
    FROM q GROUP BY k
    """
    )


@_stage("sim_pq_k_curve", oracle=_pq_k_oracle())
def sim_pq_k_curve(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the PQ CODEBOOK-SIZE tuning curve: total / mean
    / worst self-ADC distortion at k ∈ 2/4/8 codebook entries per
    subspace, from ONE encode pass (the code sets nest — codes 1..2 ⊂
    1..4 ⊂ 1..8 — so the per-(vector, subspace) minimum at every k is
    a conditional min over the SAME enc0 table: the curve-over-prefix
    rule on the code axis).  Distortion is provably non-increasing in
    k (min over a superset — twin-pinned monotone), and n_zero == k is
    the built-in anchor (exactly the k codebook vectors reconstruct
    exactly).  M294 histograms the distortion AT k=8; this is the
    memory-vs-distortion axis a PQ deployment sizes by — the third
    index tuning curve after IVF n_probe (M263) and LSH (b,r) (M264).

    Composed, not copied: the Spark side reuses the registered
    _pq_exm/_pq_sub/_pq_cb/_pq_enc0 helpers; the oracle splices the
    shared _PQ_ENC_CTE (the M104 single home).  Scale: one bounded
    (n × subspaces × 8) encode table, one conditional-min rollup, a
    ×3 explode on the per-vector rows — map-side combinable
    throughout.

    ``e=`` substitutes the embedding frame for probes; the driver
    contract never passes it."""
    from tropology_spark.operators.similarity import (
        _pq_cb,
        _pq_enc0,
        _pq_exm,
        _pq_sub,
    )

    if e is None:
        e = load(spark, sf_dir, "embeddings")
    sub = _pq_sub(_pq_exm(e))
    enc0 = _pq_enc0(sub, _pq_cb(sub))
    best = enc0.groupBy("vec_id", "s").agg(
        *[
            F.min(F.when(F.col("code") <= k, F.col("d2"))).alias(f"m{k}")
            for k in _PQK_KS
        ]
    )
    q = best.groupBy("vec_id").agg(
        *[F.sum(f"m{k}").cast("bigint").alias(f"q{k}") for k in _PQK_KS]
    )
    ks = q.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("bigint").alias("k"),
                        F.col(f"q{k}").alias("qerr"),
                    )
                    for k in _PQK_KS
                ]
            )
        ).alias("r")
    ).select("r.k", "r.qerr")
    return ks.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.when(F.col("qerr") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.sum("qerr").cast("bigint").alias("sum_qerr"),
        F.expr("sum(qerr) div count(*)").cast("bigint").alias("mean_qerr"),
        F.max("qerr").cast("bigint").alias("max_qerr"),
    )


# ---------------------------------------------------------------------------
# ts_local_maxima — strict per-type daily local maxima with sharpness
# ---------------------------------------------------------------------------


@_stage(
    "ts_local_maxima",
    oracle="""
    WITH dc AS (
      SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT m.event_type, m.d AS day, m.c,
           p.c AS prev_c, n.c AS next_c,
           CAST(2 * m.c - p.c - n.c AS BIGINT) AS sharp2
    FROM dc m
    JOIN dc p ON p.event_type = m.event_type AND p.d = m.d - 1
    JOIN dc n ON n.event_type = m.event_type AND n.d = m.d + 1
    WHERE m.c > p.c AND m.c > n.c
    """,
)
def ts_local_maxima(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — strict LOCAL MAXIMA of the per-type daily
    activity series (consecutive-day triples only: a day qualifies iff
    both calendar neighbors have rows for the type and it strictly
    exceeds both — gap- and boundary-adjacent days drop out of the
    equi-joins, the ts_seasonal_naive_error rule that row-lags
    silently violate), with the discrete-Laplacian sharpness
    2c − c_prev − c_next — the peak-detection primitive under
    burst/campaign attribution (M171 flags level bursts against a
    global threshold; this finds SHAPE — days that stick up from
    their immediate neighborhood, at any level).

    Scale: events collapse map-side to the O(types × days) table;
    the neighbor tests are two self equi-joins on the integer day
    key — broadcastable, no windows, no inequality joins.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    dc = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    p = dc.select(
        "event_type", (F.col("d") + 1).alias("d"), F.col("c").alias("prev_c")
    )
    n = dc.select(
        "event_type", (F.col("d") - 1).alias("d"), F.col("c").alias("next_c")
    )
    return (
        dc.join(p, ["event_type", "d"])
        .join(n, ["event_type", "d"])
        .filter((F.col("c") > F.col("prev_c")) & (F.col("c") > F.col("next_c")))
        .select(
            "event_type",
            F.col("d").alias("day"),
            "c",
            "prev_c",
            "next_c",
            (2 * F.col("c") - F.col("prev_c") - F.col("next_c"))
            .cast("bigint")
            .alias("sharp2"),
        )
    )


# ---------------------------------------------------------------------------
# agg_higher_moments_terms — exact power sums + central-moment carriers
# ---------------------------------------------------------------------------

_HM_BIG = 10**13  # shift for the signed m3 division, sized from the
# domain bound |sum (x-mu)^3| <= n*50^3 (quantity <= 50): covers n to
# ~10^7 group rows (the r17 Lehr lesson -- domain bound, not habit)


@_stage(
    "agg_higher_moments_terms",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS x
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2,
             CAST(sum(x * x * x) AS BIGINT) AS s3,
             CAST(sum(x * x * x * x) AS BIGINT) AS s4
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, s1, s2, s3, s4,
           CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) // n
                AS BIGINT) AS m2c,
           CAST((CAST(n AS HUGEINT) * n * s3
                 - 3 * CAST(n AS HUGEINT) * s1 * s2
                 + 2 * CAST(s1 AS HUGEINT) * s1 * s1
                 + CAST({_HM_BIG} AS HUGEINT) * (CAST(n AS HUGEINT) * n))
                // (CAST(n AS HUGEINT) * n) - {_HM_BIG} AS BIGINT) AS m3c,
           CAST((CAST(n AS HUGEINT) * n * n * s4
                 - 4 * CAST(n AS HUGEINT) * n * s1 * s3
                 + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
                 - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1)
                // (CAST(n AS HUGEINT) * n * n) AS BIGINT) AS m4c
    FROM s
    """,
)
def agg_higher_moments_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — HIGHER-MOMENT terms of line quantity per return
    flag: the exact power sums n, Σx, Σx², Σx³, Σx⁴ (quantity is an
    integral 1..50 domain — the safe axis for fourth powers) plus the
    assembled CENTRAL-moment carriers as single integral divisions:
    m2c = (nΣx² − (Σx)²) div n ≡ ⌊Σ(x−μ)²⌋, m3c = (n²Σx³ − 3nΣxΣx² +
    2(Σx)³) div n² ≡ ⌊Σ(x−μ)³⌋ (SIGNED numerator → the +BIG·den shift
    identity), m4c likewise at n³ (provably non-negative, plain
    floor).  Skewness and kurtosis — the distribution-SHAPE monitors
    a data-quality pipeline tracks beyond M15's mean/variance — are
    client-side ratios of these exact integers (*_terms discipline:
    the fractional powers stay outside the hash gate).

    Intermediates ride HUGEINT/DECIMAL(38,0) (M192 rule); the
    documented headroom bound is (Σx)⁴ < 10³⁸ — holds through a 100×
    corpus replication of sf0.1 (Σx ≈ 7.5e9 → 3.2e39 exceeds it at
    ~100×; group-level sums in this fixture are 1000× below the
    ceiling).  Scale: ONE map-side-combinable aggregate — power sums
    are the canonical mergeable statistic (M187's audit shape)."""
    q = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
    )
    s = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("bigint").alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
        .cast("bigint")
        .alias("s4"),
    )
    return s.select(
        "l_returnflag", "n", "s1", "s2", "s3", "s4",
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)"
            " div n AS BIGINT)"
        ).alias("m2c"),
        F.expr(
            f"CAST((CAST(n AS DECIMAL(38,0)) * n * s3"
            f" - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2"
            f" + 2 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1"
            f" + CAST({_HM_BIG} AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n))"
            f" div (CAST(n AS DECIMAL(38,0)) * n) - {_HM_BIG} AS BIGINT)"
        ).alias("m3c"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * n * n * s4"
            " - 4 * CAST(n AS DECIMAL(38,0)) * n * s1 * s3"
            " + 6 * CAST(n AS DECIMAL(38,0)) * s1 * s1 * s2"
            " - 3 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1 * s1)"
            " div (CAST(n AS DECIMAL(38,0)) * n * n) AS BIGINT)"
        ).alias("m4c"),
    )
