"""STAGED round-13 operators — implemented and parity-tested, NOT yet
registered (the round-8/9/10/11 staging pattern, fifth application).

The round-12 window is already fully budgeted (the 13 staged_r12
activations + the 37 oldest r05 rows — CLAUDE.md "Round-12 window"),
so these bodies target ROUND 13.  Same (fn, oracle) contract as the
registry; activation is the mechanical move + five-fold lockstep.
tests/test_staged_r13.py runs the driver-replica compare at both
verification scales, Python twins for the formula-bearing ops, the
partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- text_heaps_curve — Heaps'-law vocabulary-growth audit at corpus
  prefixes (the scaling diagnostic every tokenizer budget starts from).
- dedup_minhash_estimate_error — signature-agreement Jaccard estimate
  vs the exact shingle Jaccard per LSH candidate pair (the estimator-
  quality audit completing the J3/M126/M264 family).
- sim_hnsw_levels — geometric HNSW level assignment audit (the
  hierarchy half of the r12 greedy layer-0 search).
- ts_walsh_spectrum — full 8-point Walsh-Hadamard transform of each
  day's 3-hour activity profile (extends M248's 2-level Haar to the
  complete multi-resolution basis, exact signed integers).
- mm_cdc_dedup_stats — content-addressed dedup over the M260 CDC
  chunks per source (the bytes-saved argument FOR content-defined
  chunking, vs M209's fixed grid).
- ts_spearman_terms — Spearman rank-correlation co-moment terms via
  integer DOUBLED midranks (the M-mannwhitney discipline applied to
  the correlation family).
- analytics_did_terms — difference-in-differences cell terms with a
  data-derived era boundary and a deterministic hash-parity treatment
  assignment; the DiD numerator/denominator in DECIMAL(38,0)/HUGEINT.
- pipeline_ldp_freq_audit — k-randomized-response local-DP frequency
  release with deterministic md5 coins and the exact debias carrier
  3·t̂ = 8c − n (no division, signed BIGINT).
- join_feature_window — per-purchase 24h windowed view/click counts
  (the feature-store window-aggregate materialization; M197 bucketed
  band equi-join, oracle keeps the raw inequality).
- graph_ball2_sizes — exact 1/2-hop ball sizes for the top-degree
  seeds (the ANF point values, integer-exact).
- pipeline_importance_weights — uniform-target mixture reweighting
  with exact ppm weights + ESS terms per source.
- sim_pq_distortion — per-vector PQ reconstruction error (self-ADC)
  histogram over the registered _pq_* helpers (the quantization-
  distortion audit the PQ tier is tuned by).
- agg_cms_width_curve — Count-Min error vs width at w ∈ 8/16/32 from
  the registered M128 hash constants (the sketch family's tuning
  curve; overcount provably non-increasing in width — 8 | 16 | 32
  grid refinement).
- graph_reach2_hll_audit — HyperBall audited: the M267 HLL register
  trick on each seed's 2-hop frontier vs the exact ball size (the
  at-scale ANF estimator next to its truth).
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
# text_heaps_curve — Heaps'-law vocabulary growth at corpus prefixes
# ---------------------------------------------------------------------------

_HEAPS_PCTS = (25, 50, 100)


@_stage(
    "text_heaps_curve",
    oracle=f"""
    WITH dmax AS (SELECT CAST(max(doc_id) AS BIGINT) AS dm FROM documents),
    pcts AS (SELECT unnest([{", ".join(str(p) for p in _HEAPS_PCTS)}]) AS pct),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents),
    t AS (SELECT doc_id, token FROM tok WHERE token <> '')
    SELECT CAST(pcts.pct AS BIGINT) AS pct,
           CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT t.token) AS BIGINT) AS n_vocab,
           CAST((1000000 * count(DISTINCT t.token)) // count(*) AS BIGINT)
             AS vocab_per_mtoken
    FROM pcts CROSS JOIN dmax
    JOIN t ON t.doc_id <= (pcts.pct * dmax.dm) // 100
    GROUP BY pcts.pct
    """,
)
def text_heaps_curve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — HEAPS'-LAW vocabulary growth: total tokens,
    distinct vocabulary and vocab-per-million-tokens at the 25% / 50%
    / 100% corpus prefixes (by doc_id order — the ingestion axis).
    V(n) ~ K·n^beta with beta < 1 is the sublinear law every tokenizer
    vocab budget and every dedup-capacity plan starts from; the curve
    makes the exponent VISIBLE as exact integers (the density column
    falling with the prefix is the sublinearity), with no
    transcendental fit inside the hash gate — the *_terms discipline.

    Scale: one tokenize pass; the bounded ×3 prefix explode rides the
    token rows with a filter (never three corpus scans); the prefix
    cut is data-derived (max doc_id via a pmod-constant-key window —
    regeneration-robust, no literal ids).  The distinct-vocab rollup
    is the one real shuffle, keyed by (pct, token).

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.pmod(F.col("doc_id"), F.lit(1)))
    base = d.select(
        "doc_id",
        "text",
        F.max("doc_id").over(w).cast("bigint").alias("dm"),
    )
    pcts = F.explode(
        F.array(*[F.lit(p) for p in _HEAPS_PCTS])
    ).alias("pct")
    t = (
        base.select("doc_id", "text", "dm", pcts)
        .filter(F.col("doc_id") <= F.expr("(pct * dm) div 100"))
        .select(
            "pct", "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    return (
        t.groupBy("pct")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("token").cast("bigint").alias("n_vocab"),
        )
        .select(
            F.col("pct").cast("bigint").alias("pct"),
            "n_docs",
            "n_tokens",
            "n_vocab",
            F.expr("(1000000 * n_vocab) div n_tokens")
            .cast("bigint")
            .alias("vocab_per_mtoken"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_minhash_estimate_error — signature-agreement estimate vs exact Jaccard
# ---------------------------------------------------------------------------


def _minhash_est_oracle() -> str:
    from tropology_spark.operators.dedup import (
        _MH_PERMS,
        _band_rows_cte,
        _minhash_sig_cte,
    )

    agree = " + ".join(
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
             CAST({agree} AS BIGINT) AS agree
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
    )
    SELECT agr.doc_a, agr.doc_b, agr.agree,
           CAST(62500 * agr.agree AS BIGINT) AS est_ppm,
           CAST((1000000 * coalesce(itr.inter, 0))
                // (za.n + zb.n - coalesce(itr.inter, 0)) AS BIGINT) AS jac_ppm,
           CAST(abs(62500 * agr.agree
                    - (1000000 * coalesce(itr.inter, 0))
                      // (za.n + zb.n - coalesce(itr.inter, 0))) AS BIGINT)
             AS err_ppm
    FROM agr
    JOIN sz za ON za.doc_id = agr.doc_a
    JOIN sz zb ON zb.doc_id = agr.doc_b
    LEFT JOIN itr ON itr.doc_a = agr.doc_a AND itr.doc_b = agr.doc_b
    """
    )


@_stage("dedup_minhash_estimate_error", oracle=_minhash_est_oracle())
def dedup_minhash_estimate_error(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the MinHash ESTIMATOR-QUALITY audit: for every
    J3 LSH candidate pair, the signature agreement count (matching
    positions of the 16 min-hashes), the Jaccard estimate it implies
    (est_ppm = 10⁶·agree/16 = 62500·agree — exact, the divisor is a
    power-of-two factor of 10⁶), the EXACT bigram-shingle Jaccard
    (inter/union over the same shingle space the signatures sample),
    and |est − exact| — the per-pair error the 1/√k theory bounds at
    ~25% for k=16.  M126 audits the LSH BLOCKING (recall of the band
    join); this audits the ESTIMATOR itself — the two failure modes a
    MinHash deployment tunes independently.

    Composed, not copied: candidates come from the registered
    minhash_candidate_pairs over the session-shared band view; the
    signatures are minhash_sigs_frame (the J3 single home).  Scale:
    the agreement join touches only candidate pairs (banded, never
    all-pairs); the exact-Jaccard side joins shingle rows on the
    SAME bounded pair set.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    from tropology_spark.operators.dedup import (
        _MH_PERMS,
        minhash_bands_frame,
        minhash_bands_materialized,
        minhash_candidate_pairs,
        minhash_sigs_frame,
    )
    from tropology_spark.session import iter_materialize

    bands = (
        minhash_bands_frame(spark, sf_dir, docs=docs)
        if docs is not None
        else minhash_bands_materialized(spark, sf_dir)
    )
    cand = iter_materialize(minhash_candidate_pairs(bands))
    sigs = minhash_sigs_frame(spark, sf_dir, docs=docs)
    a = sigs.alias("a")
    b = sigs.alias("b")
    agree_expr = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(len(_MH_PERMS))
    )
    agr = (
        cand.join(a, cand.doc_a == F.col("a.doc_id"))
        .join(b, cand.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", agree_expr.cast("bigint").alias("agree"))
    )
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    )
    sh = iter_materialize(
        d.select("doc_id", F.explode(shingles).alias("token"))
    )  # referenced by the size rollup AND both intersection sides
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "token")
    sb = sh.select(F.col("doc_id").alias("db"), F.col("token").alias("tb"))
    itr = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("db")) & (F.col("token") == F.col("tb")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    za = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    out = (
        agr.join(za, "doc_a")
        .join(zb, "doc_b")
        .join(itr, ["doc_a", "doc_b"], "left")
        .withColumn("inter0", F.coalesce(F.col("inter"), F.lit(0)))
        .withColumn("est_ppm", (F.lit(62500) * F.col("agree")).cast("bigint"))
        .withColumn(
            "jac_ppm",
            F.expr("(1000000 * inter0) div (na + nb - inter0)").cast("bigint"),
        )
    )
    return out.select(
        "doc_a",
        "doc_b",
        "agree",
        "est_ppm",
        "jac_ppm",
        F.abs(F.col("est_ppm") - F.col("jac_ppm")).cast("bigint").alias("err_ppm"),
    )


# ---------------------------------------------------------------------------
# sim_hnsw_levels — geometric HNSW level-assignment audit
# ---------------------------------------------------------------------------

_HNSW_MAX_LEVEL = 4


@_stage(
    "sim_hnsw_levels",
    oracle=f"""
    WITH h AS (
      SELECT vec_id,
             ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS w
      FROM embeddings),
    lv AS (
      SELECT vec_id,
             CASE WHEN w % 16 = 0 THEN 4
                  WHEN w % 8 = 0 THEN 3
                  WHEN w % 4 = 0 THEN 2
                  WHEN w % 2 = 0 THEN 1
                  ELSE 0 END AS level
      FROM h),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM lv),
    spine AS (SELECT unnest(generate_series(0, {_HNSW_MAX_LEVEL})) AS level),
    cnt AS (SELECT level, CAST(count(*) AS BIGINT) AS n_nodes
            FROM lv GROUP BY level)
    SELECT CAST(spine.level AS BIGINT) AS level,
           CAST(coalesce(cnt.n_nodes, 0) AS BIGINT) AS n_nodes,
           CAST(sum(coalesce(cnt.n_nodes, 0))
                  OVER (ORDER BY spine.level DESC) AS BIGINT) AS n_cum,
           CAST((1000000 * sum(coalesce(cnt.n_nodes, 0))
                             OVER (ORDER BY spine.level DESC)
                 * (1 << spine.level)) // n.nt AS BIGINT) AS geo_ratio_ppm
    FROM spine LEFT JOIN cnt ON spine.level = cnt.level
    CROSS JOIN n
    """,
)
def sim_hnsw_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — HNSW LEVEL-ASSIGNMENT audit: the geometric layer
    draw (P(level ≥ ℓ) = 2^−ℓ, capped at {L}) realized
    DETERMINISTICALLY from the md5-low-32 of each vec_id (level =
    trailing-zero count, the I7/M43 reproducibility discipline —
    rand() would unpin the hash gate), rolled up to per-level node
    counts, the cumulative layer occupancy, and the occupancy-vs-
    geometric-expectation ratio in ppm (10⁶·n_cum·2^ℓ/n — exactly 10⁶
    ×(observed/expected), one integral division).  The hierarchy half
    of the r12 staged greedy layer-0 search: together they are the
    HNSW story — this op audits the LAYER CAPACITY an index build
    would allocate before any graph is wired.

    Scale: one scan projecting two BIGINTs per vector, one bounded
    rollup; the spine/window ride the 5-row level axis (the
    bounded-domain counting idiom).  All integers; the trailing-zero
    test is a CASE chain over power-of-two moduli — identical
    arithmetic in both engines, no ctz builtin needed."""
    e = load(spark, sf_dir, "embeddings")
    w = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    lv = e.select(
        F.when(w % 16 == 0, 4)
        .when(w % 8 == 0, 3)
        .when(w % 4 == 0, 2)
        .when(w % 2 == 0, 1)
        .otherwise(0)
        .alias("level")
    )
    cnt = lv.groupBy("level").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    spine = spark.range(_HNSW_MAX_LEVEL + 1).select(F.col("id").alias("level"))
    ww = Window.partitionBy(F.pmod(F.col("level"), F.lit(1))).orderBy(
        F.desc("level")
    ).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(F.pmod(F.col("level"), F.lit(1)))
    full = spine.join(cnt, "level", "left").select(
        "level", F.coalesce(F.col("n_nodes"), F.lit(0)).cast("bigint").alias("n_nodes")
    )
    return full.select(
        F.col("level").cast("bigint").alias("level"),
        "n_nodes",
        F.sum("n_nodes").over(ww).cast("bigint").alias("n_cum"),
        F.expr(
            "(1000000 * sum(n_nodes) OVER (PARTITION BY pmod(level, 1)"
            " ORDER BY level DESC ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " CURRENT ROW) * shiftleft(1L, CAST(level AS INT)))"
        )
        .cast("bigint")
        .alias("num"),
        F.sum("n_nodes").over(wt).cast("bigint").alias("nt"),
    ).select(
        "level",
        "n_nodes",
        "n_cum",
        F.expr("num div nt").cast("bigint").alias("geo_ratio_ppm"),
    )


sim_hnsw_levels.__doc__ = sim_hnsw_levels.__doc__.format(L=_HNSW_MAX_LEVEL)


# ---------------------------------------------------------------------------
# ts_walsh_spectrum — 8-point Walsh-Hadamard transform of daily activity
# ---------------------------------------------------------------------------


@_stage(
    "ts_walsh_spectrum",
    oracle="""
    WITH b AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST((epoch_us(ts) // 10800000000) % 8 AS BIGINT) AS i,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT d.day, s.i
      FROM (SELECT DISTINCT day FROM b) d,
           (SELECT unnest(generate_series(0, 7)) AS i) s
    ),
    z AS (SELECT spine.day, spine.i, coalesce(b.c, 0) AS c
          FROM spine LEFT JOIN b ON spine.day = b.day AND spine.i = b.i),
    sgn AS (
      SELECT i.i, j.j,
             CAST(1 - 2 * (bit_count(i.i & j.j) % 2) AS BIGINT) AS sg
      FROM (SELECT unnest(generate_series(0, 7)) AS i) i,
           (SELECT unnest(generate_series(0, 7)) AS j) j
    )
    SELECT z.day, CAST(sgn.j AS BIGINT) AS j,
           CAST(sum(sgn.sg * z.c) AS BIGINT) AS w
    FROM z JOIN sgn ON z.i = sgn.i
    GROUP BY z.day, sgn.j
    """,
)
def ts_walsh_spectrum(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the full 8-point WALSH-HADAMARD spectrum of each
    day's 3-hour activity profile: w_j = Σ_i (−1)^popcount(i AND j)·c_i
    over the zero-filled 8-bucket day — j=0 is the day total, the
    single-bit rows j ∈ {{1,2,4}} are the three dyadic scales (M248's
    Haar details), and the composite rows are the cross-scale
    interactions Haar cannot see.  Every coefficient is an exact
    SIGNED sum of counts — multi-resolution analysis as pure integer
    hierarchical aggregation, no floats, no recursion.

    Scale: events collapse map-side to the (day, bucket) table; the
    ×8 transform rides a broadcast 64-row sign matrix over the
    bounded day axis — one shuffle total.  The sign is
    1 − 2·(bit_count(i&j) mod 2): identical branch-free arithmetic in
    both engines.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    b = e.groupBy(
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
        F.expr("(unix_micros(ts) div 10800000000) % 8").cast("bigint").alias("i"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    days = b.select("day").distinct()
    spine = days.select(
        "day", F.explode(F.expr("sequence(0L, 7L)")).alias("i")
    )
    z = spine.join(b, ["day", "i"], "left").select(
        "day", "i", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    sgn = spark.createDataFrame(
        [
            (i, j, 1 - 2 * (bin(i & j).count("1") % 2))
            for i in range(8)
            for j in range(8)
        ],
        "i long, j long, sg long",
    )
    return (
        z.join(F.broadcast(sgn), "i")
        .groupBy("day", "j")
        .agg(F.sum(F.col("sg") * F.col("c")).cast("bigint").alias("w"))
        .select("day", F.col("j").cast("bigint").alias("j"), "w")
    )


# ---------------------------------------------------------------------------
# mm_cdc_dedup_stats — content-addressed dedup over the M260 CDC chunks
# ---------------------------------------------------------------------------


@_stage(
    "mm_cdc_dedup_stats",
    oracle="""
    WITH hx AS (
      SELECT doc_id, source, hex(encode(text)) AS hs,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
      WHERE octet_length(encode(text)) > 0
    ),
    bpos AS (
      SELECT hx.doc_id, p
      FROM hx, (SELECT unnest(generate_series(1, 4096)) AS p)
      WHERE p <= n_bytes - 7
        AND ('0x' || substring(md5(substring(hs, 2 * p - 1, 16)),
                               1, 4))::BIGINT % 64 = 0
    ),
    cuts AS (
      SELECT doc_id, p FROM bpos
      UNION SELECT doc_id, 1 FROM hx
    ),
    ext AS (
      SELECT doc_id, p AS st,
             coalesce(lead(p) OVER (PARTITION BY doc_id ORDER BY p),
                      (SELECT n_bytes + 1 FROM hx h WHERE h.doc_id = cuts.doc_id))
               AS en
      FROM cuts
    ),
    ch AS (
      SELECT hx.source,
             md5(substring(hx.hs, CAST(2 * ext.st - 1 AS INTEGER),
                           CAST(2 * (ext.en - ext.st) AS INTEGER))) AS dg,
             CAST(ext.en - ext.st AS BIGINT) AS cb
      FROM ext JOIN hx ON ext.doc_id = hx.doc_id
    ),
    per AS (
      SELECT source, dg, CAST(count(*) AS BIGINT) AS refs,
             CAST(max(cb) AS BIGINT) AS cb
      FROM ch GROUP BY source, dg
    )
    SELECT source,
           CAST(sum(refs) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(refs * cb) AS BIGINT) AS bytes_total,
           CAST(sum(cb) AS BIGINT) AS bytes_unique,
           CAST((1000000 * (sum(refs * cb) - sum(cb))) // sum(refs * cb)
                AS BIGINT) AS saved_ppm
    FROM per GROUP BY source
    """,
)
def mm_cdc_dedup_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — content-addressed DEDUP over the M260
    content-defined chunks, per source: chunk count, unique-digest
    count, raw vs deduplicated bytes, and the bytes-saved ppm — the
    quantitative argument FOR content-defined chunking (M209 measures
    the same economics over M185's FIXED grid; insertions recut a
    fixed grid globally but re-align CDC boundaries, so the CDC tier
    saves strictly more on near-duplicate corpora).  Chunk extents are
    the gaps between the M260 boundary positions ({{1}} ∪ bounds →
    lead() per doc → [start, next)); the digest is md5 of the HEX
    substring at doubled offsets (the mm_chunk_manifest discipline).

    Composed, not copied (Spark side): boundary positions come from
    the registered cdc_boundary_positions helper — the M260 single
    home; the oracle re-derives them with the same window-hash formula
    the M260 oracle pins.  Scale: boundary detection is map-only over
    the payload scan; extents ride a per-doc (real key) lead window;
    the digest rollup shuffles (source, digest) projections — payloads
    never shuffle.

    ``docs=`` substitutes a (doc_id, source, text) frame for the
    weak-scaling probe (tools/scale_probes/cdc_scale.py); the driver
    contract never passes it."""
    from tropology_spark.operators.multimodal import cdc_boundary_positions
    from tropology_spark.session import iter_materialize

    d = docs if docs is not None else load(spark, sf_dir, "documents")
    hx = iter_materialize(
        d.select(
            "doc_id",
            "source",
            F.hex(F.encode(F.col("text"), "UTF-8")).alias("hs"),
            F.octet_length(F.encode(F.col("text"), "UTF-8"))
            .cast("bigint")
            .alias("n_bytes"),
        ).filter(F.col("n_bytes") > 0)
    )  # referenced by the cut sentinel union AND the chunk-slice join
    bounds = (
        cdc_boundary_positions(spark, sf_dir, docs=docs)
        .filter(F.col("bound") == 1)
        .select("doc_id", "p")
    )
    cuts = bounds.union(hx.select("doc_id", F.lit(1).alias("p"))).distinct()
    wd = Window.partitionBy("doc_id").orderBy("p")
    ext = cuts.select(
        "doc_id", F.col("p").alias("st"), F.lead("p").over(wd).alias("en0")
    )
    ch = ext.join(hx, "doc_id").select(
        "source",
        F.md5(
            F.expr(
                "substring(hs, CAST(2 * st - 1 AS INT),"
                " CAST(2 * (coalesce(en0, n_bytes + 1) - st) AS INT))"
            )
        ).alias("dg"),
        (F.coalesce(F.col("en0"), F.col("n_bytes") + 1) - F.col("st"))
        .cast("bigint")
        .alias("cb"),
    )
    per = ch.groupBy("source", "dg").agg(
        F.count(F.lit(1)).cast("bigint").alias("refs"),
        F.max("cb").cast("bigint").alias("cb"),
    )
    return per.groupBy("source").agg(
        F.sum("refs").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.sum(F.col("refs") * F.col("cb")).cast("bigint").alias("bytes_total"),
        F.sum("cb").cast("bigint").alias("bytes_unique"),
    ).select(
        "source",
        "n_chunks",
        "n_unique",
        "bytes_total",
        "bytes_unique",
        F.expr(
            "(1000000 * (bytes_total - bytes_unique)) div bytes_total"
        )
        .cast("bigint")
        .alias("saved_ppm"),
    )


# ---------------------------------------------------------------------------
# ts_spearman_terms — Spearman rank correlation via integer doubled midranks
# ---------------------------------------------------------------------------

_SPEAR_ORACLE = """
    WITH e AS (
      SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    cx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY x),
    wx AS (SELECT x, (sum(cnt) OVER (ORDER BY x) - cnt + 1)
                     + sum(cnt) OVER (ORDER BY x) AS u2 FROM cx),
    cy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY y),
    wy AS (SELECT y, (sum(cnt) OVER (ORDER BY y) - cnt + 1)
                     + sum(cnt) OVER (ORDER BY y) AS v2 FROM cy),
    r AS (SELECT wx.u2 AS u, wy.v2 AS v
          FROM e JOIN wx ON e.x = wx.x JOIN wy ON e.y = wy.y)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(u) AS BIGINT) AS su,
           CAST(sum(v) AS BIGINT) AS sv,
           CAST(sum(u * v) AS BIGINT) AS suv,
           CAST(sum(u * u) AS BIGINT) AS su2,
           CAST(sum(v * v) AS BIGINT) AS sv2,
           CAST(CAST(count(*) AS HUGEINT) * sum(u * v)
                - CAST(sum(u) AS HUGEINT) * sum(v) AS BIGINT) AS rho_num,
           CAST(CAST(count(*) AS HUGEINT) * sum(u * u)
                - CAST(sum(u) AS HUGEINT) * sum(u) AS BIGINT) AS den_x,
           CAST(CAST(count(*) AS HUGEINT) * sum(v * v)
                - CAST(sum(v) AS HUGEINT) * sum(v) AS BIGINT) AS den_y
    FROM r
"""


@_stage("ts_spearman_terms", oracle=_SPEAR_ORACLE)
def ts_spearman_terms(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — SPEARMAN rank-correlation terms between hourly
    click and purchase counts, via integer DOUBLED MIDRANKS: on the
    union spine of observed hours (zero-filled per side), each axis's
    value gets 2·midrank = (cum − cnt + 1) + cum — always integral,
    the analytics_mannwhitney discipline applied to the CORRELATION
    family (Pearson on ranks = Spearman; M144 is Pearson on raw
    values, which outliers dominate — rank correlation is the robust
    complement a metrics pipeline wants for heavy-tailed counts).
    Emitted: n, Σu, Σv, Σuv, Σu², Σv² plus the assembled rho numerator
    n·Σuv − Σu·Σv and the two denominator factors (HUGEINT/
    DECIMAL(38,0) products, M192 rule) — the float sqrt happens
    client-side (*_terms discipline).

    Scale: events collapse map-side to the bounded O(hours) table;
    midranks ride pmod-constant-key windows over the bounded count-
    value axes; one final 1-row rollup."""
    e = events if events is not None else load(spark, sf_dir, "events")
    hc = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.expr("unix_micros(ts) div 3600000000").cast("bigint").alias("h")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )

    def midrank2(df: DataFrame, col: str, out: str) -> DataFrame:
        c = df.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        w = (
            Window.partitionBy(F.pmod(F.col(col), F.lit(1)))
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return c.select(
            col,
            (
                (F.sum("cnt").over(w) - F.col("cnt") + 1) + F.sum("cnt").over(w)
            ).alias(out),
        )

    r = hc.join(midrank2(hc, "x", "u"), "x").join(midrank2(hc, "y", "v"), "y")
    agg = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("u") * F.col("v")).cast("bigint").alias("suv"),
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("su2"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sv2"),
    )
    return agg.select(
        "n", "su", "sv", "suv", "su2", "sv2",
        F.expr("CAST(n AS DECIMAL(38,0)) * suv - CAST(su AS DECIMAL(38,0)) * sv")
        .cast("bigint")
        .alias("rho_num"),
        F.expr("CAST(n AS DECIMAL(38,0)) * su2 - CAST(su AS DECIMAL(38,0)) * su")
        .cast("bigint")
        .alias("den_x"),
        F.expr("CAST(n AS DECIMAL(38,0)) * sv2 - CAST(sv AS DECIMAL(38,0)) * sv")
        .cast("bigint")
        .alias("den_y"),
    )


# ---------------------------------------------------------------------------
# analytics_did_terms — difference-in-differences cell terms
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


@_stage("analytics_did_terms", oracle=_DID_ORACLE)
def analytics_did_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — DIFFERENCE-IN-DIFFERENCES terms on the order
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
    scalar crossJoin, BNLJ-allowlisted at activation) + one 1-row
    conditional rollup — everything map-side combinable."""
    o = load(spark, sf_dir, "orders").select(
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
# pipeline_ldp_freq_audit — k-randomized-response local-DP frequency release
# ---------------------------------------------------------------------------

_LDP_ORACLE = """
    WITH tt AS (
      SELECT event_type AS tname,
             row_number() OVER (ORDER BY event_type) - 1 AS idx
      FROM (SELECT DISTINCT event_type FROM events)
    ),
    e AS (
      SELECT ev.event_type AS true_type, tt.idx AS i,
             CASE WHEN substring(md5(CAST(ev.event_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS keep,
             ('0x' || substring(md5(CAST(ev.event_id AS VARCHAR)), 2, 1))::BIGINT
               % 4 AS j
      FROM events ev JOIN tt ON ev.event_type = tt.tname
    ),
    rep AS (
      SELECT e.true_type,
             CASE WHEN e.keep = 1 THEN e.true_type ELSE t2.tname END AS rep_type
      FROM e LEFT JOIN tt t2
        ON t2.idx = e.j + CASE WHEN e.j >= e.i THEN 1 ELSE 0 END
    ),
    tc AS (SELECT true_type AS event_type, CAST(count(*) AS BIGINT) AS true_n
           FROM rep GROUP BY true_type),
    rc AS (SELECT rep_type AS event_type, CAST(count(*) AS BIGINT) AS reported_n
           FROM rep GROUP BY rep_type),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM rep)
    SELECT tc.event_type, tc.true_n,
           CAST(coalesce(rc.reported_n, 0) AS BIGINT) AS reported_n,
           CAST(8 * coalesce(rc.reported_n, 0) - n.nt AS BIGINT) AS t3_est,
           CAST(8 * coalesce(rc.reported_n, 0) - n.nt - 3 * tc.true_n AS BIGINT)
             AS err3
    FROM tc LEFT JOIN rc ON tc.event_type = rc.event_type
    CROSS JOIN n
    """


@_stage("pipeline_ldp_freq_audit", oracle=_LDP_ORACLE)
def pipeline_ldp_freq_audit(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — k-RANDOMIZED-RESPONSE local-DP frequency release
    (Warner's mechanism, the local-privacy primitive every telemetry
    pipeline that cannot see raw values runs): each event reports its
    TRUE type with p = 1/2, else one of the other k−1 = 4 types
    uniformly — both coins DETERMINISTIC md5 hex digits of event_id
    (the I7/M43 reproducibility discipline; real deployments use a
    private RNG, the audit needs replayability), the replacement
    picked by alphabetical index arithmetic j + (j ≥ i) so both
    engines choose identically.  Per type: true count, reported
    (perturbed) count, and the exact debias carrier
    t3_est = 8·c − n ≡ 3·t̂ (from c = t/2 + (n−t)/8 — NO division, a
    SIGNED BIGINT) plus err3 = t3_est − 3·true — the utility-loss
    audit (ε = ln(p·(k−1)/(1−p)) = ln 4 here) a privacy review signs
    off on.

    Scale: one events pass (the ×1 tt join is a broadcast against the
    bounded type table), two map-side-combinable rollups, a 1-row
    total via the bounded-axis window."""
    e = events if events is not None else load(spark, sf_dir, "events")
    tt = (
        e.select("event_type")
        .distinct()
        .select(
            F.col("event_type").alias("tname"),
            (
                F.row_number().over(
                    Window.partitionBy(
                        F.pmod(F.length("event_type"), F.lit(1))
                    ).orderBy("event_type")
                )
                - 1
            ).alias("idx"),
        )
    )
    md = F.md5(F.col("event_id").cast("string"))
    ev = e.select(
        F.col("event_type").alias("true_type"),
        F.when(F.substring(md, 1, 1) < "8", 1).otherwise(0).alias("keep"),
        (F.conv(F.substring(md, 2, 1), 16, 10).cast("bigint") % 4).alias("j"),
    ).join(
        F.broadcast(tt.select(F.col("tname").alias("true_type"), F.col("idx").alias("i"))),
        "true_type",
    )
    t2 = tt.select(F.col("tname").alias("alt_type"), F.col("idx").alias("idx2"))
    rep = ev.join(
        F.broadcast(t2),
        F.col("idx2")
        == F.col("j") + F.when(F.col("j") >= F.col("i"), 1).otherwise(0),
        "left",
    ).select(
        "true_type",
        F.when(F.col("keep") == 1, F.col("true_type"))
        .otherwise(F.col("alt_type"))
        .alias("rep_type"),
    )
    tc = rep.groupBy(F.col("true_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    rc = rep.groupBy(F.col("rep_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("reported_n")
    )
    w = Window.partitionBy(F.pmod(F.length("event_type"), F.lit(1)))
    out = (
        tc.join(rc, "event_type", "left")
        .withColumn("reported_n", F.coalesce(F.col("reported_n"), F.lit(0)))
        .withColumn("nt", F.sum("true_n").over(w).cast("bigint"))
    )
    return out.select(
        "event_type",
        "true_n",
        F.col("reported_n").cast("bigint").alias("reported_n"),
        (8 * F.col("reported_n") - F.col("nt")).cast("bigint").alias("t3_est"),
        (8 * F.col("reported_n") - F.col("nt") - 3 * F.col("true_n"))
        .cast("bigint")
        .alias("err3"),
    )


# ---------------------------------------------------------------------------
# join_feature_window — per-purchase 24h windowed activity counts
# ---------------------------------------------------------------------------

_FW_WIN_US = 86_400_000_000  # 24 h in microseconds == the bucket width


@_stage(
    "join_feature_window",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, event_type, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('view', 'click')
    )
    SELECT p.event_id, p.user_id,
           CAST(coalesce(sum(CASE WHEN v.event_type = 'view' THEN 1 END), 0)
                AS BIGINT) AS n_views_24h,
           CAST(coalesce(sum(CASE WHEN v.event_type = 'click' THEN 1 END), 0)
                AS BIGINT) AS n_clicks_24h
    FROM p LEFT JOIN v
      ON v.user_id = p.user_id
     AND v.us >= p.us - {_FW_WIN_US}
     AND v.us < p.us
    GROUP BY p.event_id, p.user_id
    """,
)
def join_feature_window(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the FEATURE-WINDOW join: for every purchase,
    the user's view and click counts in the preceding 24 hours — the
    windowed-aggregate feature materialization every feature store
    backfills (M217 fetches the LATEST in-tolerance row; training
    features are usually window AGGREGATES, this shape).  Every
    purchase is emitted (LEFT join semantics — zero-activity
    purchases carry 0s, exactly what the model sees).

    Spark side is the M197 bucket idiom on the time axis: both sides
    key by the 24h bucket (bucket width == window length), purchases
    probe (b, b−1), the exact microsecond band filters after — an
    EQUI-join in which each true pair meets exactly once; the oracle
    keeps the raw inequality join.  Scale: one shuffle on (user,
    bucket) each side; state per key is bounded by the 24h activity
    rate — the same contract the streaming interval join (K8) keeps.

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    e = events if events is not None else load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts)").alias("pus"),
    )
    v = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("vtype"),
        F.expr("unix_micros(ts)").alias("vus"),
        F.expr(f"unix_micros(ts) div {_FW_WIN_US}").alias("vb"),
    )
    probe = p.select(
        "event_id",
        "user_id",
        "pus",
        F.explode(
            F.array(
                F.expr(f"pus div {_FW_WIN_US}"),
                F.expr(f"pus div {_FW_WIN_US} - 1"),
            )
        ).alias("vb"),
    )
    hits = (
        probe.join(v, ["user_id", "vb"])
        .filter(
            (F.col("vus") >= F.col("pus") - _FW_WIN_US)
            & (F.col("vus") < F.col("pus"))
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.sum(F.when(F.col("vtype") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("n_views_24h"),
            F.sum(F.when(F.col("vtype") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("n_clicks_24h"),
        )
    )
    return (
        p.select("event_id", "user_id")
        .join(hits, ["event_id", "user_id"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n_views_24h"), F.lit(0))
            .cast("bigint")
            .alias("n_views_24h"),
            F.coalesce(F.col("n_clicks_24h"), F.lit(0))
            .cast("bigint")
            .alias("n_clicks_24h"),
        )
    )


# ---------------------------------------------------------------------------
# graph_ball2_sizes — exact 1/2-hop ball sizes for the top-degree seeds
# ---------------------------------------------------------------------------

_BALL_SEEDS = 3


@_stage(
    "graph_ball2_sizes",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    seeds AS (SELECT src FROM (
                SELECT src, row_number() OVER (ORDER BY d DESC, src) AS rs1
                FROM deg) t
              WHERE rs1 <= {_BALL_SEEDS}),
    b1 AS (SELECT DISTINCT s.src AS seed, e.dst
           FROM seeds s JOIN edges e ON e.src = s.src),
    b2 AS (SELECT DISTINCT b1.seed, e2.src AS w
           FROM b1 JOIN edges e2 ON e2.dst = b1.dst
           WHERE e2.src <> b1.seed)
    SELECT b1c.seed, b1c.n_ball1, b2c.n_ball2
    FROM (SELECT seed, CAST(count(*) AS BIGINT) AS n_ball1
          FROM b1 GROUP BY seed) b1c
    JOIN (SELECT seed, CAST(count(*) AS BIGINT) AS n_ball2
          FROM b2 GROUP BY seed) b2c
      ON b1c.seed = b2c.seed
    """,
)
def graph_ball2_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — exact NEIGHBORHOOD-FUNCTION point values: for
    the {s} highest-out-degree works (graph_path_counts3's seed rule),
    |ball(seed, 1)| = its distinct tropes and |ball(seed, 2)| = the
    distinct OTHER works sharing any trope — the first two points of
    the ANF curve N(v, h) that reachability/influence analyses
    estimate with sketches at scale; exact DISTINCT counts here (M262
    counts PATHS — multiplicities; this counts the reached SET, the
    other half of the A^h story).

    Scale: the seed set is bounded (broadcast); hop 1 is one
    broadcast-semi join; hop 2 is one equi-join back on the shared
    edge view + a distinct rollup keyed by (seed, work).  At 100 TB
    the per-seed frontier is the only growing state — the exact-ANF
    shape; corpus-wide N(h) needs the HLL register trick (M267) on
    the frontier, the documented scale path."""
    from tropology_spark.session import iter_materialize
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    seeds = deg.orderBy(F.desc("d"), F.asc("src")).limit(_BALL_SEEDS).select("src")
    b1 = iter_materialize(
        e.join(F.broadcast(seeds), "src").select(
            F.col("src").alias("seed"), "dst"
        ).distinct()
    )  # referenced by the hop-1 count AND the hop-2 expansion
    e2 = e.select(F.col("src").alias("w"), "dst")
    b2 = (
        b1.join(e2, "dst")
        .filter(F.col("w") != F.col("seed"))
        .select("seed", "w")
        .distinct()
    )
    b1c = b1.groupBy("seed").agg(F.count(F.lit(1)).cast("bigint").alias("n_ball1"))
    b2c = b2.groupBy("seed").agg(F.count(F.lit(1)).cast("bigint").alias("n_ball2"))
    return b1c.join(b2c, "seed")


graph_ball2_sizes.__doc__ = graph_ball2_sizes.__doc__.format(s=_BALL_SEEDS)


# ---------------------------------------------------------------------------
# pipeline_importance_weights — uniform-target mixture reweighting
# ---------------------------------------------------------------------------


@_stage(
    "pipeline_importance_weights",
    oracle="""
    WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS k FROM s)
    SELECT source, n_docs,
           CAST((1000000 * total) // (k * n_docs) AS BIGINT) AS w_ppm,
           CAST(n_docs * ((1000000 * total) // (k * n_docs)) AS BIGINT)
             AS contrib_w,
           CAST(n_docs * ((1000000 * total) // (k * n_docs))
                       * ((1000000 * total) // (k * n_docs)) AS BIGINT)
             AS contrib_w2
    FROM s CROSS JOIN t
    """,
)
def pipeline_importance_weights(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — IMPORTANCE REWEIGHTING to a uniform source mix:
    per source, the exact ppm weight w = (T/k)/n_s (the ratio that
    makes every source contribute equally in expectation — the
    domain-reweighting primitive behind every data-mixture retrain,
    M87's weights applied as per-EXAMPLE importance factors), plus the
    ESS terms n_s·w and n_s·w² whose client-side ratio (Σw)²/Σw² is
    Kish's effective sample size — the number that says how much the
    reweighting costs in variance before anyone trains.

    All integer: w_ppm = (10⁶·T) div (k·n_s) (non-negative integral
    division, both engines agree), and the ESS contributions reuse the
    w_ppm integer verbatim so the audit is self-consistent.  Scale:
    the corpus collapses to O(sources) in one map-side-combinable
    pass; totals ride pmod-constant-key windows on the bounded source
    axis.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy(F.pmod(F.length("source"), F.lit(1)))
    out = s.select(
        "source",
        "n_docs",
        F.sum("n_docs").over(w).cast("bigint").alias("total"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
    ).withColumn(
        "w_ppm",
        F.expr("(1000000 * total) div (k * n_docs)").cast("bigint"),
    )
    return out.select(
        "source",
        "n_docs",
        "w_ppm",
        (F.col("n_docs") * F.col("w_ppm")).cast("bigint").alias("contrib_w"),
        (F.col("n_docs") * F.col("w_ppm") * F.col("w_ppm"))
        .cast("bigint")
        .alias("contrib_w2"),
    )


# ---------------------------------------------------------------------------
# sim_pq_distortion — per-vector PQ reconstruction-error histogram
# ---------------------------------------------------------------------------

_PQD_BUCKET = 10_000_000_000  # 1e10 in the micro-unit² distance domain


def _pq_distortion_oracle() -> str:
    from tropology_spark.operators.similarity import _EX_CTE, _PQ_ENC_CTE

    return (
        _EX_CTE
        + _PQ_ENC_CTE
        + f""",
    best AS (SELECT vec_id, s, min(d2) AS bd2 FROM enc0 GROUP BY vec_id, s),
    q AS (SELECT vec_id, CAST(sum(bd2) AS BIGINT) AS qerr
          FROM best GROUP BY vec_id)
    SELECT CAST(qerr // {_PQD_BUCKET} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(qerr) AS BIGINT) AS min_qerr,
           CAST(max(qerr) AS BIGINT) AS max_qerr,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM q GROUP BY 1
    """
    )


@_stage("sim_pq_distortion", oracle=_pq_distortion_oracle())
def sim_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — PQ QUANTIZATION-DISTORTION histogram: every
    vector's reconstruction error under the M104 codebook (self-ADC =
    Σ over subspaces of the minimum squared distance to any code —
    exactly the error the ADC scan substitutes for the true distance),
    bucketed at 10¹⁰ micro-unit² — the audit that says whether the
    codebook fits the corpus BEFORE recall degrades (codebook vectors
    1..8 land in bucket 0 at distortion 0 by construction — the
    built-in sanity anchor).  M182 measures PQ's end-to-end RECALL;
    this measures the geometric CAUSE, per vector, exactly.

    Composed, not copied: the Spark side reuses the registered
    _pq_exm/_pq_sub/_pq_cb/_pq_enc0 helpers verbatim; the oracle
    splices the shared _PQ_ENC_CTE (the M104 single home, factored at
    staging with byte-identical registered SQL).  Scale: enc0 is the
    same bounded (n × subspaces × codes) table the registered query
    builds; the rollups are map-side combinable; distances stay
    BIGINT (micro-unit² ≤ ~4e12 per subspace at unit norm)."""
    from tropology_spark.operators.similarity import (
        _pq_cb,
        _pq_enc0,
        _pq_exm,
        _pq_sub,
    )

    e = load(spark, sf_dir, "embeddings")
    sub = _pq_sub(_pq_exm(e))
    enc0 = _pq_enc0(sub, _pq_cb(sub))
    best = enc0.groupBy("vec_id", "s").agg(F.min("d2").alias("bd2"))
    q = best.groupBy("vec_id").agg(F.sum("bd2").cast("bigint").alias("qerr"))
    return q.groupBy(
        F.expr(f"qerr div {_PQD_BUCKET}").cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("qerr").cast("bigint").alias("min_qerr"),
        F.max("qerr").cast("bigint").alias("max_qerr"),
        F.min("vec_id").cast("bigint").alias("min_vec_id"),
    )


# ---------------------------------------------------------------------------
# agg_cms_width_curve — Count-Min error vs width (the CMS tuning axis)
# ---------------------------------------------------------------------------

_CMSC_WS = (8, 16, 32)


def _cms_width_oracle() -> str:
    from tropology_spark.operators.aggregates import _CMS_PRIME, _CMS_ROWS

    ws = ", ".join(str(w) for w in _CMSC_WS)
    cell_rows = " UNION ALL ".join(
        f"SELECT hv, {i} AS row_id, ((hv * {a} + {b}) % {_CMS_PRIME}) AS ph FROM h"
        for i, (a, b) in enumerate(_CMS_ROWS)
    )
    return f"""
    WITH h AS (
      SELECT user_id,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
      FROM events
    ),
    ws AS (SELECT unnest([{ws}]) AS w),
    ph AS ({cell_rows}),
    cells AS (
      SELECT ws.w, ph.row_id, ph.ph % ws.w AS col_id,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ph CROSS JOIN ws
      GROUP BY 1, 2, 3
    ),
    u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_n,
                 min(hv) AS hv
          FROM h GROUP BY user_id),
    uph AS ({cell_rows.replace("FROM h", "FROM u")}),
    est AS (
      SELECT ws.w, uph.hv, CAST(min(cells.cnt) AS BIGINT) AS est_n
      FROM uph CROSS JOIN ws
      JOIN cells ON cells.w = ws.w AND cells.row_id = uph.row_id
                AND cells.col_id = uph.ph % ws.w
      GROUP BY 1, 2
    )
    SELECT CAST(est.w AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN est.est_n = u.true_n THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(est.est_n - u.true_n) AS BIGINT) AS sum_overcount,
           CAST(max(est.est_n - u.true_n) AS BIGINT) AS max_overcount
    FROM est JOIN u ON est.hv = u.hv
    GROUP BY est.w
    """


@_stage("agg_cms_width_curve", oracle=_cms_width_oracle())
def agg_cms_width_curve(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Staged M-row — the Count-Min WIDTH tuning curve: rebuild the
    M128 sketch at w ∈ 8/16/32 from the SAME md5-low-32 base hash and
    affine row functions, estimate every user's event count (min over
    the d=4 row cells) and report, per width, how many users are
    estimated EXACTLY, the total and the worst overcount — the
    memory-vs-error axis a CMS deployment sizes by (error ~ N/w; the
    curve shows it halving as width doubles).  CMS never
    underestimates, so overcount = est − true is always ≥ 0 — an
    algebraic guarantee the twin pins.  Completes the tuning-curve
    family: M264 tunes LSH (b,r), M263 tunes IVF n_probe, this tunes
    the sketch family's one free axis.

    Composed, not copied: the hash and row constants are imported
    from the registered M128 home (the single-home rule — a constant
    drift would break both sides identically, which is why the twin
    re-derives the formula from the raw constants too).  Scale: one
    events pass → the ×d×|w| bounded explode on the DISTINCT-user
    table, counts map-side combinable; per-user estimates join the
    bounded cell table (d·Σw = 224 rows, broadcast).

    ``events=`` substitutes the event frame for probes; the driver
    contract never passes it."""
    from tropology_spark.operators.aggregates import _CMS_PRIME, _CMS_ROWS

    e = events if events is not None else load(spark, sf_dir, "events")
    hv = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("hv")
    )
    h = e.select("user_id", hv)
    row_structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("row_id"),
                ((F.col("hv") * F.lit(a) + F.lit(b)) % F.lit(_CMS_PRIME)).alias(
                    "ph"
                ),
            )
            for i, (a, b) in enumerate(_CMS_ROWS)
        ]
    )
    ws = spark.createDataFrame([(w,) for w in _CMSC_WS], "w long")
    cells = (
        h.select(F.explode(row_structs).alias("c"))
        .select("c.row_id", "c.ph")
        .crossJoin(F.broadcast(ws))
        .groupBy("w", "row_id", (F.col("ph") % F.col("w")).alias("col_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    u = h.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n"),
        F.min("hv").alias("hv"),
    )
    uph = u.select(
        "user_id", "true_n", F.explode(row_structs).alias("c")
    ).select("user_id", "true_n", "c.row_id", "c.ph")
    est = (
        uph.crossJoin(F.broadcast(ws))
        .join(cells, ["w", "row_id"])
        .filter(F.col("col_id") == F.col("ph") % F.col("w"))
        .groupBy("w", "user_id", "true_n")
        .agg(F.min("cnt").cast("bigint").alias("est_n"))
    )
    return est.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("est_n") == F.col("true_n"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(F.col("est_n") - F.col("true_n"))
        .cast("bigint")
        .alias("sum_overcount"),
        F.max(F.col("est_n") - F.col("true_n"))
        .cast("bigint")
        .alias("max_overcount"),
    ).select(
        F.col("w").cast("bigint").alias("w"),
        "n_users",
        "n_exact",
        "sum_overcount",
        "max_overcount",
    )


# ---------------------------------------------------------------------------
# graph_reach2_hll_audit — HyperBall: the HLL register trick on frontiers
# ---------------------------------------------------------------------------


def _reach2_hll_oracle() -> str:
    from tropology_spark.operators.aggregates import _HLL_M, _HLL_NUM

    return f"""
    WITH edges AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    seeds AS (SELECT src FROM (
                SELECT src, row_number() OVER (ORDER BY d DESC, src) AS rs1
                FROM deg) t
              WHERE rs1 <= 3),
    b1 AS (SELECT DISTINCT s.src AS seed, e.dst
           FROM seeds s JOIN edges e ON e.src = s.src),
    b2 AS (SELECT DISTINCT b1.seed, e2.src AS w
           FROM b1 JOIN edges e2 ON e2.dst = b1.dst
           WHERE e2.src <> b1.seed),
    hh AS (
      SELECT seed,
             ('0x' || substring(md5(CAST(w AS VARCHAR)), 1, 1))::BIGINT AS bucket,
             ('0x' || substring(md5(CAST(w AS VARCHAR)), 2, 8))::BIGINT AS hw
      FROM b2),
    regs AS (
      SELECT seed, bucket,
             max(CASE WHEN hw = 0 THEN 33 ELSE 33 - length(bin(hw)) END) AS m
      FROM hh GROUP BY seed, bucket),
    spine AS (
      SELECT s.seed, b.b AS bucket
      FROM (SELECT DISTINCT seed FROM b2) s,
           (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS b) b),
    agg AS (
      SELECT spine.seed,
             CAST(sum(1::BIGINT << (33 - coalesce(regs.m, 0))) AS BIGINT)
               AS s_carrier
      FROM spine LEFT JOIN regs
        ON spine.seed = regs.seed AND spine.bucket = regs.bucket
      GROUP BY spine.seed),
    ex AS (SELECT seed, CAST(count(*) AS BIGINT) AS n_exact
           FROM b2 GROUP BY seed)
    SELECT ex.seed, ex.n_exact,
           CAST({_HLL_NUM} // (1000 * agg.s_carrier) AS BIGINT) AS hll_est,
           CAST((1000000 * ({_HLL_NUM} // (1000 * agg.s_carrier))) // ex.n_exact
                AS BIGINT) AS ratio_ppm
    FROM ex JOIN agg ON ex.seed = agg.seed
    """


@_stage("graph_reach2_hll_audit", oracle=_reach2_hll_oracle())
def graph_reach2_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged M-row — HYPERBALL, audited: the M267 HLL register trick
    applied to each seed's 2-hop frontier — per seed the exact
    |ball(seed, 2)| (graph_ball2_sizes' set) next to the m=16 HLL
    estimate of the SAME set and the est/exact ratio in ppm.  This is
    literally the HyperBall algorithm (Boldi-Vigna): the exact
    distinct-frontier rollup that stops scaling at 100 TB is replaced
    by 16 mergeable registers per node — union of balls = register
    max-merge, the property that makes the full ANF curve one
    edge-pass per hop.  The audit quantifies what the switch costs in
    accuracy, per seed, with zero floats (the dyadic S-carrier
    estimate is one integral division).

    Composed, not copied: the frontier derivation is the ball2 body's
    (same seed rule, same two joins); the register arithmetic imports
    the REGISTERED M267 constants (_HLL_M, _HLL_NUM) — one drift
    breaks both sides identically, so the twin re-derives the dyadic
    algebra from raw md5 too.  Scale: registers merge map-side per
    (seed, bucket); the spine is bounded (seeds × 16)."""
    from tropology_spark.operators.aggregates import _HLL_M, _HLL_NUM
    from tropology_spark.session import iter_materialize
    from tropology_spark.sources.tables import edges_materialized

    e = edges_materialized(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    seeds = deg.orderBy(F.desc("d"), F.asc("src")).limit(3).select("src")
    b1 = e.join(F.broadcast(seeds), "src").select(
        F.col("src").alias("seed"), "dst"
    ).distinct()
    e2 = e.select(F.col("src").alias("w"), "dst")
    b2 = iter_materialize(
        b1.join(e2, "dst")
        .filter(F.col("w") != F.col("seed"))
        .select("seed", "w")
        .distinct()
    )  # referenced by the exact count AND the register build
    md = F.md5(F.col("w").cast("string"))
    hh = b2.select(
        "seed",
        F.conv(F.substring(md, 1, 1), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring(md, 2, 8), 16, 10).cast("bigint").alias("hw"),
    )
    regs = hh.groupBy("seed", "bucket").agg(
        F.max(
            F.when(F.col("hw") == 0, F.lit(33)).otherwise(
                F.lit(33) - F.length(F.bin("hw"))
            )
        ).alias("m")
    )
    spine = b2.select("seed").distinct().select(
        "seed", F.expr(f"explode(sequence(0L, {_HLL_M - 1}L))").alias("bucket")
    )
    agg = (
        spine.join(regs, ["seed", "bucket"], "left")
        .withColumn("m0", F.coalesce(F.col("m"), F.lit(0)))
        .groupBy("seed")
        .agg(
            F.sum(F.expr("shiftleft(1L, CAST(33 - m0 AS INT))"))
            .cast("bigint")
            .alias("s_carrier")
        )
    )
    ex = b2.groupBy("seed").agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    return (
        ex.join(agg, "seed")
        .withColumn(
            "hll_est",
            F.expr(f"CAST({_HLL_NUM} div (1000 * s_carrier) AS BIGINT)"),
        )
        .select(
            "seed",
            "n_exact",
            "hll_est",
            F.expr("CAST((1000000 * hll_est) div n_exact AS BIGINT)").alias(
                "ratio_ppm"
            ),
        )
    )
