"""STAGED round-12 operators — implemented and parity-tested, NOT yet
registered (the round-8/9/10 staging pattern, fourth application).

The round-11 window is already fully budgeted (the 17 round-11
activations M253-M269 + the r04/r05 stale queue — CLAUDE.md "Round-11
window"), so these thirteen bodies target ROUND 12.  Same (fn, oracle) contract as
the registry; activation is the mechanical move + five-fold lockstep.
tests/test_staged_r12.py runs the driver-replica compare at both
verification scales, Python twins for the formula-bearing ops (plus
the PQ-consistency pin for the composite), the
partitioning-invariance probe, and the plan sweep.

This module is intentionally NOT imported from ``tropology_spark/
__init__.py`` — importing it must never perturb registry order (guard
test pins that it registers nothing).

New capability coverage (SURVEY §2.M candidates at activation):
- sim_sq8_recall — int8 scalar quantization (SQ8) retrieval + recall
  audit: the missing quantization flavor after BQ / PQ / IVF /
  matryoshka / RP-LSH.
- agg_ams_f2 — AMS "tug-of-war" second-frequency-moment sketch audit
  (map-side-combinable counters, the KMV/HLL discipline applied to F2).
- text_bm25_terms — BM25 tf-component scoring with exact integer
  rational carriers (the *_terms discipline; idf left as (N, df)
  integer terms because ln is transcendental).
- sim_graph_greedy_search — greedy routing over a kNN graph (the
  HNSW layer-0 search story) with integer micro-dot scores.
- ts_motif_counts — SAX motif mining composed on the registered
  ts_sax_symbols words (sliding 4-grams, corpus top-20).
- sim_ivfpq_topk — the IVF+PQ composite index (coarse cell probe +
  PQ ADC over the probed cells only), composed from ivf_candidates +
  the _pq_* single homes.
- analytics_poisson_bootstrap — the deterministic single-pass Poisson
  bootstrap (md5 multiplicities through an exact-unit-mean dyadic
  weight table; one scan serves all B resamples).
- pipeline_curriculum_stages — quality-ordered curriculum buckets via
  the scale-safe two-pass global rank (plans/global_order.py) and an
  exact ppm quality carrier.
- sim_filtered_topk — metadata-filtered vector search (per-label
  top-k in one corpus pass): the filtered-ANN production feature.
- analytics_cuped_terms — CUPED variance-reduction co-moment terms
  (data-derived pre/post boundary, the *_terms discipline on the
  experimentation pipeline).
- analytics_mannwhitney_terms — Mann-Whitney U via integer DOUBLED
  midranks (2·midrank = lo + hi is always integral; u2 ≡ 2U).
- ts_theilsen_micro — Theil-Sen robust slope: shifted floor-div
  micro-slopes + per-type lower counting median.
- sim_mmr_diversify — Maximal Marginal Relevance re-ranking (unrolled
  greedy, λ=1/2 ⇒ pure integer score2 = rel − max pair dot; pool-
  bounded pairwise stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.registry import ORACLES
from tropology_spark.operators.similarity import (
    EMB_DIM,
    QUERY_VEC_ID,
    _pq_exm,
    sim_topk_cosine,
)
from tropology_spark.operators.timeseries import ts_sax_symbols
from tropology_spark.sources.tables import load

#: name -> (query_fn, oracle_sql); the registry contract, unregistered.
STAGED: dict = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# sim_sq8_recall — int8 scalar quantization retrieval + recall audit
# ---------------------------------------------------------------------------

#: Micro-unit long form of the embeddings (the M104 vm carrier),
#: shared CTE head for the SQ8 oracle.
_SQ8_EX_CTE = f"""
    WITH ex AS (
      SELECT vec_id, i AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vm
      FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) s
    )
"""

_SQ8_ORACLE = (
    _SQ8_EX_CTE
    + f"""
    , st AS (SELECT pos, min(vm) AS mn, max(vm) AS mx FROM ex GROUP BY pos),
    cd AS (
      SELECT e.vec_id, e.pos, st.mn, st.mx,
             CASE WHEN st.mx = st.mn THEN CAST(0 AS BIGINT)
                  ELSE ((e.vm - st.mn) * 255) // (st.mx - st.mn) END AS code
      FROM ex e JOIN st ON e.pos = st.pos
      WHERE e.vec_id <> {QUERY_VEC_ID}
    ),
    rc AS (SELECT vec_id, pos,
                  mn + (code * (mx - mn)) // 255 AS recon FROM cd),
    q AS (SELECT pos, vm AS qvm FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    sc AS (SELECT r.vec_id, CAST(sum(q.qvm * r.recon) AS BIGINT) AS adc_score
           FROM rc r JOIN q ON r.pos = q.pos GROUP BY r.vec_id),
    tp AS (SELECT vec_id, adc_score,
                  row_number() OVER (ORDER BY adc_score DESC, vec_id) AS rk_sq
           FROM sc),
    exact AS ({{exact}})
    SELECT CAST(tp.rk_sq AS BIGINT) AS rk, tp.vec_id, tp.adc_score,
           CAST(CASE WHEN e2.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS hit
    FROM tp LEFT JOIN (SELECT vec_id FROM exact) e2 ON tp.vec_id = e2.vec_id
    WHERE tp.rk_sq <= 10
    """
).format(exact=ORACLES["sim_topk_cosine"])


@_stage("sim_sq8_recall", oracle=_SQ8_ORACLE)
def sim_sq8_recall(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """SQ8 scalar-quantization retrieval + recall audit — the standard
    int8 codec (per-dimension min/max grid, 256 levels) evaluated
    against the brute-force cosine truth.  Completes the quantization
    family: BQ (1 bit/dim), PQ (subspace codebooks), IVF (coarse
    cells), matryoshka (prefix dims) — SQ8 is the 8-bit/dim point on
    the same accuracy/footprint curve.

    Everything is integer-exact cross-engine: values enter as the
    M104 micro-unit carrier vm = round(val·10⁶); the code
    ((vm−mn)·255) div (mx−mn) and the reconstruction
    mn + (code·(mx−mn)) div 255 use non-negative numerators only, so
    Spark ``div`` (truncating) and DuckDB ``//`` (flooring) agree; the
    ADC score Σ qvm·recon is a BIGINT (≤ 64·(6·10⁵)² ≈ 2.3·10¹³).
    Ranking is (adc_score DESC, vec_id) — fully deterministic.  The
    hit flag joins the registered sim_topk_cosine truth (oracle
    composes that oracle verbatim, the sim_ann_recall rule).

    Scale: the per-dim min/max is one map-side-combinable agg over a
    narrow projection; codes are a scan-local transform (at 100 TB the
    encoded corpus is a saved artifact like the PQ/BQ indexes — 64
    bytes/vector); the query-side scan is one broadcast join + a
    map-combinable sum.  The exploded ex frame feeds three branches
    (stats, codes, query) → checkpointed per the double-reference
    rule.  ``e=`` overrides the embeddings frame (weak-scaling probe
    kwarg — tools/scale_probes/sq8_scale.py; the driver contract
    never passes it)."""
    if e is None:
        e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ex = _pq_exm(e).localCheckpoint(eager=True)
    st = ex.groupBy("pos").agg(
        F.min("vm").alias("mn"), F.max("vm").alias("mx")
    )
    cd = (
        ex.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(st), "pos")
        .select(
            "vec_id",
            "pos",
            "mn",
            "mx",
            F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint"))
            .otherwise(F.expr("((vm - mn) * 255) div (mx - mn)"))
            .alias("code"),
        )
    )
    rc = cd.select(
        "vec_id", "pos", F.expr("mn + (code * (mx - mn)) div 255").alias("recon")
    )
    q = ex.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "pos", F.col("vm").alias("qvm")
    )
    sc = (
        rc.join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("qvm") * F.col("recon")).cast("bigint").alias("adc_score"))
    )
    top = sc.orderBy(F.desc("adc_score"), F.asc("vec_id")).limit(10)
    # rank over the 10 survivors only — non-foldable constant partition
    # key so no partition-less WindowExec appears (global_order idiom).
    w = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.desc("adc_score"), F.asc("vec_id")
    )
    exact = (
        sim_topk_cosine(spark, sf_dir)
        .select("vec_id")
        .withColumn("h1", F.lit(1).cast("bigint"))
    )
    return (
        top.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(exact), "vec_id", "left")
        .select(
            "rk",
            "vec_id",
            "adc_score",
            F.coalesce(F.col("h1"), F.lit(0)).cast("bigint").alias("hit"),
        )
    )


# ---------------------------------------------------------------------------
# agg_ams_f2 — AMS tug-of-war F2 sketch audit
# ---------------------------------------------------------------------------

#: AMS sign-hash family: ±1 from the parity of (a·h + b) mod p over
#: the md5-low-32 base hash (the dedup.py portability rationale —
#: both engines parse the same 8 hex chars).  Multipliers < 2^30 so
#: a·h < 2^62 never overflows int64 under ANSI Spark.
_AMS_PRIME = 4294967311  # smallest prime > 2^32
_AMS_PAIRS = [
    (664525013, 1073741789),
    (931386389, 1073741597),
    (822752279, 1073741399),
    (668265263, 1073741201),
    (374761393, 1073741003),
    (536870923, 1073740805),
    (715827883, 1073740607),
    (611603851, 1073740409),
]

_AMS_SIGN_SQL = [
    f"CASE WHEN ((h * {a} + {b}) % {_AMS_PRIME}) % 2 = 0 "
    "THEN 1 ELSE -1 END"
    for a, b in _AMS_PAIRS
]

_AMS_ORACLE = f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(l_partkey AS STRING)), 1, 8))::BIGINT
               AS h
      FROM lineitem
    ),
    s AS (SELECT
      {", ".join(f"CAST(sum({sql}) AS BIGINT) AS c{j}" for j, sql in enumerate(_AMS_SIGN_SQL))}
      FROM h),
    u AS ({" UNION ALL ".join(f"SELECT CAST({j} AS BIGINT) AS sketch_id, c{j} AS counter FROM s" for j in range(8))}),
    f2 AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact
           FROM (SELECT CAST(count(*) AS BIGINT) AS c
                 FROM lineitem GROUP BY l_partkey))
    SELECT sketch_id, counter,
           CAST(counter * counter AS BIGINT) AS est,
           f2_exact,
           CAST((CAST(counter * counter AS HUGEINT) * 1000000) // f2_exact
                AS BIGINT) AS ratio_ppm
    FROM u CROSS JOIN f2
"""


@_stage("agg_ams_f2", oracle=_AMS_ORACLE)
def agg_ams_f2(
    spark: SparkSession, sf_dir: str, li: DataFrame | None = None
) -> DataFrame:
    """AMS ("tug-of-war") second-frequency-moment sketch audit over the
    lineitem part-key stream: eight ±1-sign counters (sign = parity of
    a universal hash over the md5-low-32 of the key), each counter's
    square an unbiased F2 estimate, reported against the exact
    F2 = Σ_v c_v² with the estimate/truth ratio in ppm.  The KMV/HLL
    audit discipline applied to the classic AMS sketch (Alon-Matias-
    Szegedy 1996): the registered query IS the quality gate a
    production F2 sketch ships with.

    Integer-exact cross engines: signs/counters/squares are BIGINTs
    (|counter| ≤ n_rows, est ≤ n²  — 3.6·10¹¹ at sf0.1); the ppm ratio
    is computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) per the
    wide-integer finale rule because est·10⁶ exceeds BIGINT once
    n_rows passes ~3·10⁶ on a regenerated fixture.  Numerator and
    denominator are both non-negative so div//floor agree.

    Scale: the sketch is ONE map-side-combinable aggregate over a
    single-column projection — each partition emits 8 partial sums,
    the classic mergeable-sketch shape; the exact branch (a groupBy on
    the key) exists only because this is the audit.  The 1-row exact
    attach is a deliberate scalar crossJoin (BNLJ-allowlisted at
    activation).  ``li=`` overrides the lineitem frame (weak-scaling
    probe kwarg — tools/scale_probes/ams_scale.py; the driver contract
    never passes it)."""
    if li is None:
        li = load(spark, sf_dir, "lineitem")
    li_keys = li.select("l_partkey")
    hashed = li_keys.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    counters = hashed.agg(
        *[
            F.sum(F.expr(sql)).cast("bigint").alias(f"c{j}")
            for j, sql in enumerate(_AMS_SIGN_SQL)
        ]
    )
    stack_args = ", ".join(f"{j}L, c{j}" for j in range(8))
    u = counters.select(
        F.expr(f"stack(8, {stack_args}) AS (sketch_id, counter)")
    )
    f2 = (
        li_keys.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"))
    )
    return u.crossJoin(F.broadcast(f2)).select(
        F.col("sketch_id").cast("bigint").alias("sketch_id"),
        "counter",
        (F.col("counter") * F.col("counter")).cast("bigint").alias("est"),
        "f2_exact",
        F.expr(
            "CAST((CAST(counter AS DECIMAL(38,0)) * counter * 1000000)"
            " div f2_exact AS BIGINT)"
        ).alias("ratio_ppm"),
    )


# ---------------------------------------------------------------------------
# text_bm25_terms — BM25 tf-component scoring, integer rational carriers
# ---------------------------------------------------------------------------

# BM25 with k1 = 1.2, b = 0.75: tf_comp = tf·(k1+1) / (tf + k1·(1−b)
# + k1·b·dl/avgdl).  Multiplying numerator and denominator by 10·D
# (D = Σdl, avgdl = D/N) clears every fraction:
#   milli = 22000·tf·D  //  (10·tf·D + 3·D + 9·dl·N)
# All terms non-negative BIGINTs (22000·tf·D stays < 2^63 up to
# tf·D ≈ 4·10¹⁴ — a ~10¹²-token corpus; docstring bound).
_BM25_ORACLE = """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, token),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM tok GROUP BY doc_id),
    df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok GROUP BY token),
    g AS (SELECT CAST(sum(dl) AS BIGINT) AS d_total,
                 CAST(count(*) AS BIGINT) AS n_docs FROM dl),
    terms AS (SELECT token, df FROM (
        SELECT token, df,
               row_number() OVER (ORDER BY df DESC, token) AS rk_t
        FROM df) t WHERE rk_t <= 5),
    sc AS (SELECT t.token, f.doc_id, f.tf, l.dl, t.df,
                  CAST((22000 * f.tf * g.d_total)
                       // (10 * f.tf * g.d_total + 3 * g.d_total
                           + 9 * l.dl * g.n_docs) AS BIGINT) AS milli_tf_comp,
                  g.n_docs
           FROM terms t
           JOIN tf f ON f.token = t.token
           JOIN dl l ON l.doc_id = f.doc_id
           CROSS JOIN g)
    SELECT token, doc_id, tf, dl, df, n_docs, milli_tf_comp,
           CAST(rk_d AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY token
                                       ORDER BY milli_tf_comp DESC, doc_id)
                      AS rk_d
          FROM sc) r
    WHERE rk_d <= 10
"""


@_stage("text_bm25_terms", oracle=_BM25_ORACLE)
def text_bm25_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring for the five highest-df corpus terms:
    per (term, doc) the exact tf-saturation component
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) at the standard k1=1.2,
    b=0.75, carried as the integer rational
    milli = 22000·tf·D div (10·tf·D + 3·D + 9·dl·N) — multiplying
    through by 10·D clears every fraction, all terms are non-negative
    BIGINTs, and div//floor agree.  The idf factor is transcendental
    (ln), so per the *_terms discipline its exact integer inputs
    (n_docs, df) ride along as columns; top-10 docs per term by
    (milli DESC, doc_id).  Safe to ~10¹² corpus tokens
    (22000·tf·D < 2⁶³); beyond that the wide-integer rule applies.

    Scale: tf/dl/df are three map-side-combinable aggs over one
    tokenize pass; the corpus totals are a 1-row scalar attach
    (deliberate crossJoin, BNLJ-allowlisted at activation); the
    per-term ranking window is partitioned by token — no global
    window.  At 100 TB the df/dl tables ARE the inverted-index
    statistics a retrieval system persists."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    df = tok.groupBy("token").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    g = dl.agg(
        F.sum("dl").cast("bigint").alias("d_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    terms = df.orderBy(F.desc("df"), F.asc("token")).limit(5)
    sc = (
        tf.join(F.broadcast(terms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .select(
            "token",
            "doc_id",
            "tf",
            "dl",
            "df",
            "n_docs",
            F.expr(
                "CAST((22000 * tf * d_total) div (10 * tf * d_total"
                " + 3 * d_total + 9 * dl * n_docs) AS BIGINT)"
            ).alias("milli_tf_comp"),
        )
    )
    w = Window.partitionBy("token").orderBy(
        F.desc("milli_tf_comp"), F.asc("doc_id")
    )
    return (
        sc.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select(
            "token", "doc_id", "tf", "dl", "df", "n_docs", "milli_tf_comp", "rk"
        )
    )


# ---------------------------------------------------------------------------
# sim_graph_greedy_search — greedy routing over a kNN graph (HNSW layer 0)
# ---------------------------------------------------------------------------

_GG_K = 4  # out-degree of the kNN graph
_GG_STEPS = 3  # unrolled greedy hops
_GG_ENTRY = 1  # fixed entry point (HNSW's fixed entry node)

#: One greedy step, oracle side: the walker stands at cur{p}; the
#: next position is the best of {cur} ∪ outgoing neighbors by
#: (query-dot DESC, vec_id ASC) — moves only when a neighbor improves,
#: ties resolved to the smaller id, fully deterministic.
_GG_STEP_SQL = """
    , cur{n} AS MATERIALIZED (
      SELECT vec_id, dq FROM (
        SELECT u.vec_id, u.dq,
               row_number() OVER (ORDER BY u.dq DESC, u.vec_id) AS rk_s{n}
        FROM (SELECT vec_id, dq FROM cur{p}
              UNION ALL
              SELECT d.vec_id, d.dq
              FROM edges e JOIN cur{p} c ON e.a = c.vec_id
              JOIN dqs d ON d.vec_id = e.b) u) w
      WHERE rk_s{n} = 1)
"""


def _gg_oracle() -> str:
    steps = "".join(
        _GG_STEP_SQL.format(n=i, p=i - 1) for i in range(1, _GG_STEPS + 1)
    )
    walk = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, vec_id, dq FROM cur{i}"
        for i in range(_GG_STEPS + 1)
    )
    return (
        _SQ8_EX_CTE
        + f"""
    , pw AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             CAST(sum(a.vm * b.vm) AS BIGINT) AS w
      FROM ex a JOIN ex b ON a.pos = b.pos
      WHERE a.vec_id <> b.vec_id
        AND a.vec_id <> {QUERY_VEC_ID} AND b.vec_id <> {QUERY_VEC_ID}
      GROUP BY a.vec_id, b.vec_id),
    edges AS MATERIALIZED (SELECT a, b FROM (
        SELECT a, b, row_number() OVER (PARTITION BY a
                                        ORDER BY w DESC, b) AS rk_e
        FROM pw) e WHERE rk_e <= {_GG_K}),
    q AS (SELECT pos, vm AS qvm FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    dqs AS MATERIALIZED (SELECT e.vec_id, CAST(sum(e.vm * q.qvm) AS BIGINT) AS dq
            FROM ex e JOIN q ON e.pos = q.pos
            WHERE e.vec_id <> {QUERY_VEC_ID}
            GROUP BY e.vec_id),
    cur0 AS (SELECT vec_id, dq FROM dqs WHERE vec_id = {_GG_ENTRY})
    {steps}
    , walk AS ({walk}),
    exact AS ({{exact}})
    SELECT w.step, w.vec_id, w.dq,
           CAST(CASE WHEN e2.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
             AS in_exact_top10
    FROM walk w
    LEFT JOIN (SELECT vec_id FROM exact) e2 ON w.vec_id = e2.vec_id
    """
    ).format(exact=ORACLES["sim_topk_cosine"])


@_stage("sim_graph_greedy_search", oracle=_gg_oracle())
def sim_graph_greedy_search(
    spark: SparkSession, sf_dir: str, e: DataFrame | None = None
) -> DataFrame:
    """Greedy routing over a kNN graph — the HNSW layer-0 search
    story: build the out-degree-{k} exact kNN graph (integer micro-dot
    weights, (w DESC, b) tie-break), start at the fixed entry node,
    and take {s} unrolled greedy hops, each moving to the best of
    {{current}} ∪ out-neighbors by (query-dot DESC, vec_id ASC) — the
    walker stays put when no neighbor improves, so the walk is a
    monotone deterministic descent.  Emits the 4-row walk with each
    position's integer query-dot and whether it already sits in the
    registered exact top-10 (oracle composes sim_topk_cosine
    verbatim).

    All scores are BIGINT micro-dots (Σ vm_a·vm_b ≤ 64·(6·10⁵)² ≈
    2.3·10¹³) — no floats anywhere in the ranking.  Scale: the walk
    only ever inspects out-edges of VISITED nodes, so the Spark side
    expands each hop's top-{k} neighbor list ON DEMAND (one broadcast
    1-row walker × corpus scan per hop, whole-stage-codegen zip_with
    dots — {s}·n dot products total, never the n² graph build), while
    the oracle states the same walk over the fully materialized kNN
    graph — a deliberate cross-FORMULATION check that the on-demand
    expansion equals the precomputed-graph walk.  At 100 TB the graph
    IS a saved artifact (like the IVF/PQ/BQ indexes) built once via
    LSH-blocked candidate generation, and each hop is k row lookups.
    The vm-array frame feeds the query row, the per-hop scans, and the
    dq pass → checkpointed per the double-reference rule.  ``e=``
    overrides the embeddings frame (weak-scaling probe kwarg —
    tools/scale_probes/gg_scale.py; the driver contract never passes
    it)."""
    if e is None:
        e = load(spark, sf_dir, "embeddings")
    vmarr = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    ev = (
        e.select("vec_id", vmarr.alias("vm"))
        .localCheckpoint(eager=True)
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    corpus = ev.filter(F.col("vec_id") != QUERY_VEC_ID)
    q = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("vm").alias("qvm")
    )
    dqs = (
        corpus.crossJoin(F.broadcast(q))
        .select("vec_id", "vm", idot(F.col("vm"), F.col("qvm")).alias("dq"))
        .localCheckpoint(eager=True)  # referenced once per hop + entry
    )
    cur = (
        dqs.filter(F.col("vec_id") == _GG_ENTRY)
        .localCheckpoint(eager=True)
    )
    walk = [cur.select(F.lit(0).cast("bigint").alias("step"), "vec_id", "dq")]
    wstep = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.desc("dq"), F.asc("vec_id")
    )
    for i in range(1, _GG_STEPS + 1):
        # On-demand out-edges of the walker: top-k corpus neighbors of
        # cur by (micro-dot DESC, vec_id) — identical to the oracle's
        # precomputed edges because the graph ranking is per-source.
        nb = (
            dqs.crossJoin(
                F.broadcast(
                    cur.select(
                        F.col("vec_id").alias("cid"), F.col("vm").alias("cvm")
                    )
                )
            )
            .filter(F.col("vec_id") != F.col("cid"))
            .select(
                "vec_id", "vm", "dq", idot(F.col("vm"), F.col("cvm")).alias("w")
            )
        )
        cand = (
            nb.orderBy(F.desc("w"), F.asc("vec_id"))
            .limit(_GG_K)
            .select("vec_id", "vm", "dq")
        )
        cur = (
            cur.select("vec_id", "vm", "dq")
            .unionAll(cand)
            .withColumn("rk_s", F.row_number().over(wstep))
            .filter(F.col("rk_s") == 1)
            .select("vec_id", "vm", "dq")
            .localCheckpoint(eager=True)
        )
        walk.append(
            cur.select(F.lit(i).cast("bigint").alias("step"), "vec_id", "dq")
        )
    walk_df = walk[0]
    for wdf in walk[1:]:
        walk_df = walk_df.unionAll(wdf)
    exact = (
        sim_topk_cosine(spark, sf_dir)
        .select("vec_id")
        .withColumn("h1", F.lit(1).cast("bigint"))
    )
    return walk_df.join(F.broadcast(exact), "vec_id", "left").select(
        "step",
        "vec_id",
        "dq",
        F.coalesce(F.col("h1"), F.lit(0)).cast("bigint").alias("in_exact_top10"),
    )


sim_graph_greedy_search.__doc__ = sim_graph_greedy_search.__doc__.format(
    k=_GG_K, s=_GG_STEPS
)


# ---------------------------------------------------------------------------
# ts_motif_counts — SAX motif mining on the registered symbol words
# ---------------------------------------------------------------------------

_MOTIF_W = 4  # motif width (symbols)
_MOTIF_TOP = 20

_MOTIF_ORACLE = f"""
    WITH sax AS ({ORACLES["ts_sax_symbols"]}),
    p AS (
      SELECT user_id, substring(symbols, i, {_MOTIF_W}) AS motif
      FROM sax, (SELECT unnest(generate_series(1, 4096)) AS i) s
      WHERE i <= len(symbols) - {_MOTIF_W - 1}
    )
    SELECT motif, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM p GROUP BY motif
    ORDER BY n_occ DESC, motif
    LIMIT {_MOTIF_TOP}
"""


@_stage("ts_motif_counts", oracle=_MOTIF_ORACLE)
def ts_motif_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif mining composed on the registered ts_sax_symbols
    words: every sliding width-{w} symbol window of every (user, day)
    word, counted corpus-wide, top-{t} motifs by (occurrences DESC,
    motif) — the classic symbolic motif-discovery step that runs on
    SAX output (Lin et al. 2003).  Spark side calls the registered
    query function; the oracle composes its oracle verbatim (the
    dedup_lsh_recall composition rule).

    Position enumeration is capped at 4096 on BOTH sides (the Spark
    sequence end is least(len−{wm1}, 4096)) — the relational-
    enumeration cap discipline; a day-word is one symbol per event, so
    the cap binds only past 4099 events/user/day.  The sequence is
    guarded against the descending-sequence trap (len < {w} → empty
    array).  Scale: word lengths are bounded by events/user/day, so
    the explode is linear in events; the motif agg is map-side
    combinable on a ≤4^{w}-value key domain."""
    sax = ts_sax_symbols(spark, sf_dir)
    pos = sax.select(
        "user_id",
        F.explode(
            F.when(
                F.length("symbols") >= _MOTIF_W,
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.length("symbols") - (_MOTIF_W - 1), F.lit(4096)
                    ),
                ),
            )  # len < width → NULL array → explode yields no rows
        ).alias("i"),
        "symbols",
    ).select(
        "user_id",
        F.expr(f"substring(symbols, i, {_MOTIF_W})").alias("motif"),
    )
    return (
        pos.groupBy("motif")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_occ"), F.asc("motif"))
        .limit(_MOTIF_TOP)
    )


ts_motif_counts.__doc__ = ts_motif_counts.__doc__.format(
    w=_MOTIF_W, t=_MOTIF_TOP, wm1=_MOTIF_W - 1
)


# ---------------------------------------------------------------------------
# sim_ivfpq_topk — the IVF+PQ composite index (coarse cells + ADC codes)
# ---------------------------------------------------------------------------

from tropology_spark.operators.similarity import (  # noqa: E402
    _EX_CTE as _SIM_EX_CTE,
    _LLOYD_SQL_ITER,
    _PQ_CAND,
    _PQ_K,
    _pq_cb,
    _pq_enc0,
    _pq_sub,
    ivf_candidates,
)

_IVFPQ_ORACLE = (
    _SIM_EX_CTE
    + """
    , assign0 AS (SELECT vec_id, label AS cell FROM embeddings)
    """
    + _LLOYD_SQL_ITER.format(n=1, p=0, vf="")
    + f"""
    , assign AS (SELECT * FROM assign1),
    probe AS (SELECT tcell AS pcell
              FROM (SELECT *, row_number() OVER (ORDER BY ccos DESC, tcell)
                              AS rn_p
                    FROM vc1 WHERE vec_id = {QUERY_VEC_ID}) t
              WHERE rn_p <= 2),
    cand0 AS MATERIALIZED (
      SELECT a.vec_id, a.cell FROM assign a
      JOIN probe ON a.cell = probe.pcell
      WHERE a.vec_id <> {QUERY_VEC_ID}),
    exm AS (SELECT vec_id, pos, CAST(round(val * 1000000) AS BIGINT) AS vm
            FROM ex),
    sub AS (SELECT vec_id, pos, vm,
                   CASE WHEN pos <= {EMB_DIM // 2} THEN 0 ELSE 1 END AS s
            FROM exm),
    cb AS (SELECT vec_id AS code, s, pos, vm AS cm FROM sub
           WHERE vec_id BETWEEN 1 AND {_PQ_K}),
    encc AS (SELECT v.vec_id, v.s, c.code,
                    CAST(sum((v.vm - c.cm) * (v.vm - c.cm)) AS BIGINT) AS d2
             FROM sub v
             JOIN cand0 ON v.vec_id = cand0.vec_id
             JOIN cb c ON c.s = v.s AND c.pos = v.pos
             GROUP BY v.vec_id, v.s, c.code),
    enc AS (SELECT vec_id, s, code FROM (
              SELECT vec_id, s, code,
                     row_number() OVER (PARTITION BY vec_id, s
                                        ORDER BY d2, code) AS rn_e
              FROM encc) t WHERE rn_e = 1),
    qd AS (SELECT v.s, c.code,
                  CAST(sum((v.vm - c.cm) * (v.vm - c.cm)) AS BIGINT) AS qd2
           FROM sub v JOIN cb c ON c.s = v.s AND c.pos = v.pos
           WHERE v.vec_id = {QUERY_VEC_ID}
           GROUP BY v.s, c.code),
    adc AS (SELECT e.vec_id, CAST(sum(q.qd2) AS BIGINT) AS adc_d2
            FROM enc e JOIN qd q ON q.s = e.s AND q.code = e.code
            GROUP BY e.vec_id),
    candk AS MATERIALIZED (
      SELECT vec_id, adc_d2 FROM (
        SELECT vec_id, adc_d2,
               row_number() OVER (ORDER BY adc_d2, vec_id) AS rn_c
        FROM adc) t WHERE rn_c <= {_PQ_CAND}),
    rer AS (SELECT v.vec_id,
                   CAST(sum((v.vm - q.vm) * (v.vm - q.vm)) AS BIGINT) AS dist2
            FROM exm v
            JOIN exm q ON q.vec_id = {QUERY_VEC_ID} AND q.pos = v.pos
            JOIN candk ON candk.vec_id = v.vec_id
            GROUP BY v.vec_id)
    SELECT r.vec_id, c0.cell, ck.adc_d2, r.dist2
    FROM rer r
    JOIN candk ck ON r.vec_id = ck.vec_id
    JOIN cand0 c0 ON r.vec_id = c0.vec_id
    ORDER BY r.dist2, r.vec_id
    LIMIT 10
    """
)


@_stage("sim_ivfpq_topk", oracle=_IVFPQ_ORACLE)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF+PQ composite — the standard two-stage vector index
    (coarse inverted-file cells prune the corpus, PQ asymmetric
    distance scans only the probed cells' CODES, exact rerank touches
    only the ADC top-{c}): sim_ivf_topk's coarse stage feeding
    sim_pq_topk's fine stage, each reused from its single home
    (:func:`ivf_candidates` — extracted from ivf_topk with identical
    semantics — and the ``_pq_*`` helpers).  Oracle composes the same
    two registered oracle fragments (the Lloyd iter SQL + the PQ
    CTEs), restricted to the candidate cells.

    All fine-stage arithmetic is integer-exact (micro-unit BIGINT
    squared distances, (d2, code)/(adc, vec_id) unique tie-breaks);
    the coarse stage carries the registered 6-dp-rounded cell cosines.
    cand0 and candk are referenced from two plan branches each →
    Spark localCheckpoints, oracle MATERIALIZED (the DuckDB
    materialized rule).

    Scale: this IS the 100 TB retrieval posture — the inverted file
    prunes to n_probe/k of the corpus, the ADC scan reads 2 small ints
    per surviving vector (codes only, never raw vectors), the codebook
    is a {k2}×d broadcast, and the rerank touches {c} rows.  Both
    stages' artifacts are already persistable (ivf_write_index /
    pq_write_index)."""
    e = load(spark, sf_dir, "embeddings")
    ev, cand = ivf_candidates(e, QUERY_VEC_ID)
    cand = cand.localCheckpoint(eager=True)  # 2 refs: encode filter + cell attach
    exm = _pq_exm(e)
    sub = _pq_sub(exm)
    cb = _pq_cb(sub)
    subc = sub.join(cand.select("vec_id"), "vec_id", "left_semi")
    encc = _pq_enc0(subc, cb)
    w_enc = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    enc = (
        encc.withColumn("rn_e", F.row_number().over(w_enc))
        .filter(F.col("rn_e") == 1)
        .select("vec_id", "s", "code")
    )
    qd = _pq_enc0(sub.filter(F.col("vec_id") == QUERY_VEC_ID), cb).select(
        "s", "code", F.col("d2").alias("qd2")
    )
    adc = (
        enc.join(F.broadcast(qd), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
    )
    candk = (
        adc.orderBy("adc_d2", "vec_id")
        .limit(_PQ_CAND)
        .localCheckpoint(eager=True)  # 2 refs: rerank filter + adc attach
    )
    qm = exm.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("pos").alias("qpos"), F.col("vm").alias("qm")
    )
    rdiff = F.col("vm") - F.col("qm")
    rer = (
        exm.join(candk.select("vec_id"), "vec_id", "left_semi")
        .join(F.broadcast(qm), F.col("pos") == F.col("qpos"))
        .groupBy("vec_id")
        .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dist2"))
    )
    return (
        rer.join(candk, "vec_id")
        .join(cand, "vec_id")
        .select("vec_id", "cell", "adc_d2", "dist2")
        .orderBy("dist2", "vec_id")
        .limit(10)
    )


sim_ivfpq_topk.__doc__ = sim_ivfpq_topk.__doc__.format(c=_PQ_CAND, k2=_PQ_K)


# ---------------------------------------------------------------------------
# analytics_poisson_bootstrap — deterministic single-pass bootstrap
# ---------------------------------------------------------------------------

_BOOT_B = 8  # resamples

#: Dyadic Poisson(1) weight table over h % 8: P(0)=P(1)=3/8,
#: P(2)=P(3)=1/8 — EXACT unit mean (0·3+1·3+2+3 = 8), the truncated
#: dyadic approximation of Poisson(1) (true p₀=p₁≈.368, p₂≈.184,
#: p₃≈.061).  A dyadic table keeps the weight a pure integer CASE on
#: the hash residue — no float thresholds anywhere.
_BOOT_W_SQL = (
    "CASE WHEN {h} % 8 <= 2 THEN 0 WHEN {h} % 8 <= 5 THEN 1"
    " WHEN {h} % 8 = 6 THEN 2 ELSE 3 END"
)

_BOOT_ORACLE = f"""
    WITH o AS (SELECT o_orderkey,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    r AS (
      SELECT b.b, o.o_orderkey, o.cents,
             ('0x' || substring(md5(CAST(b.b AS STRING) || '-'
                                    || CAST(o.o_orderkey AS STRING)), 1, 8))
               ::BIGINT AS h
      FROM o CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b)
                          b),
    w AS (SELECT b, cents, {_BOOT_W_SQL.format(h="h")} AS m FROM r),
    agg AS (SELECT CAST(b AS BIGINT) AS resample,
                   CAST(sum(m) AS BIGINT) AS n_eff,
                   CAST(sum(m * cents) AS BIGINT) AS sum_cents
            FROM w GROUP BY b),
    full_s AS (SELECT CAST(count(*) AS BIGINT) AS n_full,
                      CAST(sum(cents) AS BIGINT) AS cents_full
               FROM o)
    SELECT resample, n_eff, sum_cents,
           CAST((1000 * sum_cents) // n_eff AS BIGINT) AS milli_mean,
           CAST((1000 * cents_full) // n_full AS BIGINT) AS milli_mean_full
    FROM agg CROSS JOIN full_s
"""


@_stage("analytics_poisson_bootstrap", oracle=_BOOT_ORACLE)
def analytics_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic single-pass Poisson bootstrap of the mean order
    value — the bootstrap that actually runs at 100 TB (Chamandy et
    al.'s Poisson bootstrap: every row draws an independent
    ~Poisson(1) multiplicity per resample, so ONE scan serves all B
    resamples and each partition emits B partial sums; no resample
    materialization, no sampling pass per replicate).  Randomness is
    the md5-low-32 of (resample, orderkey) — deterministic,
    partition-invariant, reproducible cross-engine — mapped through an
    exact-unit-mean dyadic weight table (P(0)=P(1)=3/8, P(2)=P(3)=1/8
    on the hash residue; no float thresholds).  Emits per resample the
    effective count, the weighted cents sum, and the milli-cent mean,
    with the full-sample milli-mean attached for the spread-vs-truth
    read — the min/max across the 8 resamples IS the CI estimate a
    downstream consumer derives.

    All-integer: cents carriers, non-negative integer division both
    sides (1000·sum_cents ≤ 3·10³·n·maxcents — BIGINT-safe to ~10⁸
    orders on this price range; the wide-integer rule applies past
    that).  The 1-row full-sample attach is a deliberate scalar
    crossJoin (BNLJ-allowlisted at activation)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    r = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             F.lit(_BOOT_B - 1).cast("bigint"))).alias("b"),
    ).select(
        "b",
        "cents",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit("-"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    w = r.select("b", "cents", F.expr(_BOOT_W_SQL.format(h="h")).alias("m"))
    agg = w.groupBy("b").agg(
        F.sum("m").cast("bigint").alias("n_eff"),
        F.sum(F.col("m") * F.col("cents")).cast("bigint").alias("sum_cents"),
    )
    full_s = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full"),
        F.sum("cents").cast("bigint").alias("cents_full"),
    )
    return agg.crossJoin(F.broadcast(full_s)).select(
        F.col("b").cast("bigint").alias("resample"),
        "n_eff",
        "sum_cents",
        F.expr("CAST((1000 * sum_cents) div n_eff AS BIGINT)").alias(
            "milli_mean"
        ),
        F.expr("CAST((1000 * cents_full) div n_full AS BIGINT)").alias(
            "milli_mean_full"
        ),
    )


# ---------------------------------------------------------------------------
# pipeline_curriculum_stages — quality-ordered curriculum buckets
# ---------------------------------------------------------------------------

from tropology_spark.operators.text import _STOPWORDS  # noqa: E402
from tropology_spark.plans.global_order import (  # noqa: E402
    global_row_number,
    ntile_expr,
)

_CURR_STAGES = 4

#: Integer quality carrier: the M-quality heuristic (stopword ratio ×
#: 0.5 + min(n_tokens,100)/200) in exact ppm — (500000·n_stop) div
#: n_tokens + 5000·least(n_tokens, 100).  Non-negative numerators →
#: div//floor agree; ties broken by doc_id everywhere.
_CURR_ORACLE = f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    st AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN token IN {_STOPWORDS!r} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_stop
      FROM tok GROUP BY doc_id
    ),
    q AS (SELECT doc_id, n_tokens,
                 (500000 * n_stop) // n_tokens
                   + 5000 * least(n_tokens, 100) AS q_ppm
          FROM st),
    r AS (SELECT *, ntile({_CURR_STAGES})
                      OVER (ORDER BY q_ppm DESC, doc_id) AS stage
          FROM q)
    SELECT CAST(stage AS BIGINT) AS stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(min(q_ppm) AS BIGINT) AS min_q_ppm,
           CAST(max(q_ppm) AS BIGINT) AS max_q_ppm
    FROM r GROUP BY stage
"""


@_stage("pipeline_curriculum_stages", oracle=_CURR_ORACLE)
def pipeline_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging for training-data scheduling: rank the corpus
    by an exact integer quality score (the M-quality stopword/length
    heuristic in ppm — (500000·n_stop) div n_tokens +
    5000·least(n_tokens, 100); highest quality first, doc_id
    tie-break), cut it into {n} equal ntile stages, and emit each
    stage's document count, token budget, and quality range — the
    stage manifest a curriculum-ordered training run consumes (stage 1
    = cleanest data first).

    The global quality ORDER is the scale hazard: a bare
    ``ntile OVER (ORDER BY ...)`` funnels the corpus through one task,
    so the Spark side uses the two-pass range-partitioned rank
    (plans/global_order.py: global_row_number + ntile_expr — exact SQL
    ntile semantics, bit-equal to the oracle's window at every
    partitioning).  Everything is integer: the ppm score's numerators
    are non-negative so div//floor agree, and the stage aggregate is
    map-side combinable on a {n}-value key."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    st = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stop"),
    )
    q = st.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "(500000 * n_stop) div n_tokens"
            " + 5000 * least(n_tokens, 100L)"
        ).alias("q_ppm"),
    )
    ranked = global_row_number(
        q,
        [F.col("q_ppm").desc(), F.col("doc_id")],
        out="position",
        total_col="n_total",
    )
    staged = ranked.select(
        "n_tokens",
        "q_ppm",
        ntile_expr(F.col("position"), F.col("n_total"), _CURR_STAGES).alias(
            "stage"
        ),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("q_ppm").cast("bigint").alias("min_q_ppm"),
        F.max("q_ppm").cast("bigint").alias("max_q_ppm"),
    )


pipeline_curriculum_stages.__doc__ = pipeline_curriculum_stages.__doc__.format(
    n=_CURR_STAGES
)


# ---------------------------------------------------------------------------
# sim_filtered_topk — metadata-filtered vector search (per-label top-k)
# ---------------------------------------------------------------------------

_FILT_K = 3

_FILT_ORACLE = f"""
    WITH ex AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) s
    ),
    nrm AS (SELECT vec_id, sqrt(sum(val * val)) AS nv FROM ex GROUP BY vec_id),
    q AS (SELECT pos, val FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    d AS (SELECT e.vec_id, any_value(e.label) AS label, sum(e.val * q.val) AS dp
          FROM ex e JOIN q ON e.pos = q.pos
          WHERE e.vec_id <> {QUERY_VEC_ID}
          GROUP BY e.vec_id),
    cos AS (SELECT d.vec_id, d.label,
                   round(d.dp / (n1.nv * n2.nv), 6) AS cosine
            FROM d
            JOIN nrm n1 ON d.vec_id = n1.vec_id
            CROSS JOIN (SELECT nv FROM nrm WHERE vec_id = {QUERY_VEC_ID}) n2)
    SELECT label, CAST(rk_f AS BIGINT) AS rk, vec_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY label
                                       ORDER BY cosine DESC, vec_id) AS rk_f
          FROM cos) t
    WHERE rk_f <= {_FILT_K}
"""


@_stage("sim_filtered_topk", oracle=_FILT_ORACLE)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search — top-{k} by cosine within
    every label group for the fixture query vector: the production
    feature every vector store ships (filtered/faceted ANN — "nearest
    documents WHERE source = X") that none of the existing sim ops
    exercises.  One corpus pass computes all per-label answers
    simultaneously (the batch form of a filtered query; a single
    filter is the label = X slice of this result).

    Cross-engine float discipline matches the sim family: cosines
    rounded to 6 dp, (cosine DESC, vec_id) unique tie-break, per-label
    window — never a global one.  Scale: at 100 TB filtered search is
    the argument FOR metadata-partitioned vector layouts — with the
    corpus bucketed/partitioned by the filter column (exactly the
    IVF+PQ artifact's bucketBy(cell) discipline applied to a metadata
    key) each filtered query scans only its slice; the registered
    one-pass batch shape is the offline-eval form."""
    from tropology_spark.operators.similarity import as_double, dot, norm

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    ).withColumn("nv", norm(F.col("emb")))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qemb"), F.col("nv").alias("nq")
    )
    cos = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                dot(F.col("emb"), F.col("qemb")) / (F.col("nv") * F.col("nq")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _FILT_K)
        .select("label", "rk", "vec_id", "cosine")
    )


sim_filtered_topk.__doc__ = sim_filtered_topk.__doc__.format(k=_FILT_K)


# ---------------------------------------------------------------------------
# analytics_cuped_terms — CUPED variance-reduction co-moment terms
# ---------------------------------------------------------------------------

_CUPED_ORACLE = """
    WITH e AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    b AS (SELECT (min(d) + max(d)) // 2 AS bd FROM e),
    u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN d <= bd THEN cents ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN d > bd THEN cents ELSE 0 END) AS BIGINT) AS y
      FROM e CROSS JOIN b GROUP BY user_id
    ),
    v AS (
      SELECT user_id, x, y,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant
      FROM u
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_x2,
           CAST(sum(y * y) AS BIGINT) AS sum_y2
    FROM v GROUP BY variant
"""


@_stage("analytics_cuped_terms", oracle=_CUPED_ORACLE)
def analytics_cuped_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduction TERMS for the hash-split experiment
    (Deng et al. 2013 — the standard pre-period covariate adjustment
    every experimentation platform runs): per user, x = pre-period
    spend cents and y = experiment-period spend cents (the boundary is
    the DATA-DERIVED midpoint (min_day + max_day) div 2 on the epoch-
    day axis — regeneration-robust, non-negative division, never a
    wall-clock literal); per variant the exact integer co-moments
    (n, Σx, Σy, Σxy, Σx², Σy²) from which a consumer computes
    θ = cov(x,y)/var(x) and the CUPED-adjusted lift.  The *_terms
    discipline: the final ratios are floats, so the engine emits their
    exact integer inputs (ts_corr_terms' rule applied to the
    experimentation pipeline).  Variant assignment reuses
    analytics_ab_lift's md5 first-hex split verbatim.

    Scale: one events pass + a 1-row boundary attach (deliberate
    scalar crossJoin, BNLJ-allowlisted at activation) + a user-level
    agg + a 2-group rollup — every aggregate map-side combinable."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    b = e.agg(F.expr("(min(d) + max(d)) div 2").alias("bd"))
    u = (
        e.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("bd"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("d") > F.col("bd"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    v = u.withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        ).otherwise("B"),
    )
    return v.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_y2"),
    )


# ---------------------------------------------------------------------------
# analytics_mannwhitney_terms — Mann-Whitney U via integer doubled midranks
# ---------------------------------------------------------------------------

_MW_ORACLE = """
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT s,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS is_a
      FROM u
    ),
    c AS (SELECT s,
                 CAST(sum(is_a) AS BIGINT) AS ca,
                 CAST(sum(1 - is_a) AS BIGINT) AS cb,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM v GROUP BY s),
    w AS (SELECT s, ca, cb, cnt,
                 CAST(sum(cnt) OVER (ORDER BY s) AS BIGINT) AS cum
          FROM c),
    m AS (SELECT ca, cb, (cum - cnt + 1) + cum AS twomr FROM w),
    agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                   CAST(sum(cb) AS BIGINT) AS n_b,
                   CAST(sum(ca * twomr) AS BIGINT) AS r2_a,
                   CAST(sum(cb * twomr) AS BIGINT) AS r2_b
            FROM m)
    SELECT 'A' AS variant, n_a AS n_users, r2_a AS rank2_sum,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2
    FROM agg
    UNION ALL
    SELECT 'B', n_b, r2_b, CAST(r2_b - n_b * (n_b + 1) AS BIGINT)
    FROM agg
"""


@_stage("analytics_mannwhitney_terms", oracle=_MW_ORACLE)
def analytics_mannwhitney_terms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U terms for the hash-split experiment over per-user
    spend — the NONPARAMETRIC lift test (rank-based, no normality
    assumption; the robust companion to analytics_ab_lift's rates,
    analytics_cuped_terms' co-moments, and the Poisson bootstrap's
    resampling).  Everything is integer-exact: ties take the midrank,
    and 2·midrank = lo + hi (first + last rank of the tie group) is
    always integral, so the engine carries DOUBLED rank sums and the
    doubled statistic u2 = Σ2mr − n(n+1) ≡ 2U — the consumer checks
    u2_A + u2_B = 2·n_A·n_B (the twin pins this identity) and
    normalizes by 2·n_A·n_B for the rank-biserial effect size.

    The cumulative rank window runs over the DISTINCT spend values —
    the bounded-cardinality single-axis window family (the merged-KS
    support rule), kept off the partition-less-WindowExec path via the
    non-foldable constant partition key.  All other stages are
    map-side-combinable aggs."""
    u = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").cast("bigint").alias("s"))
    )
    v = u.select(
        "s",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", 1
        )
        .otherwise(0)
        .alias("is_a"),
    )
    c = v.groupBy("s").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("cb"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    const_part = F.pmod(F.col("s"), F.lit(1))  # non-foldable constant
    w_cum = Window.partitionBy(const_part).orderBy("s")
    w = c.select(
        "ca",
        "cb",
        "cnt",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
    )
    m = w.select(
        "ca", "cb", ((F.col("cum") - F.col("cnt") + 1) + F.col("cum")).alias("twomr")
    )
    agg = m.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.col("ca") * F.col("twomr")).cast("bigint").alias("r2_a"),
        F.sum(F.col("cb") * F.col("twomr")).cast("bigint").alias("r2_b"),
    )
    return agg.select(
        F.expr(
            "stack(2, 'A', n_a, r2_a, CAST(r2_a - n_a * (n_a + 1) AS BIGINT),"
            " 'B', n_b, r2_b, CAST(r2_b - n_b * (n_b + 1) AS BIGINT))"
            " AS (variant, n_users, rank2_sum, u2)"
        )
    )


# ---------------------------------------------------------------------------
# ts_theilsen_micro — Theil-Sen robust slope (shifted floor-div micro-slopes)
# ---------------------------------------------------------------------------

_TS_BIG = 10**12  # shift making every slope numerator non-negative

_THEILSEN_ORACLE = f"""
    WITH e AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
               + hour(ts) AS h
      FROM events
    ),
    c AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY event_type, h),
    p AS (
      SELECT a.event_type,
             ((b.n - a.n) * 1000000 + {_TS_BIG} * (b.h - a.h))
               // (b.h - a.h) - {_TS_BIG} AS smicro
      FROM c a JOIN c b
        ON a.event_type = b.event_type AND a.h < b.h
    ),
    g AS (SELECT event_type, smicro, CAST(count(*) AS BIGINT) AS cnt
          FROM p GROUP BY event_type, smicro),
    w AS (SELECT event_type, smicro, cnt,
                 CAST(sum(cnt) OVER (PARTITION BY event_type
                                     ORDER BY smicro) AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_pairs
          FROM g)
    SELECT event_type, n_pairs,
           CAST(min(CASE WHEN cum >= (n_pairs + 1) // 2 THEN smicro END)
                AS BIGINT) AS slope_micro,
           CAST(min(smicro) AS BIGINT) AS min_smicro,
           CAST(max(smicro) AS BIGINT) AS max_smicro
    FROM w GROUP BY event_type, n_pairs
"""


@_stage("ts_theilsen_micro", oracle=_THEILSEN_ORACLE)
def ts_theilsen_micro(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Theil-Sen robust trend per event type over the hourly count
    series — the median of all pairwise slopes (up to 29% outlier
    breakdown vs OLS's zero; the robust companion to the staged
    analytics_ols_terms).  Slopes are carried as micro-slopes
    floor(10⁶·Δn/Δh) made ENGINE-EXACT by the +shift identity
    (dy·10⁶ + BIG·dx) div dx − BIG with BIG = 10¹² ≥ |dy|·10⁶ (the
    sim_cluster_cohesion shift rule: the shifted numerator is
    non-negative so truncation == flooring, and (a + k·dx) div dx =
    a floor-div dx + k exactly); the per-type median is the lower
    counting median over per-value counts (the bounded-domain
    counting-quantile rule — never a corpus sort), safe while hourly
    counts stay under 10⁶ (fixture max ~10²; document before lifting).

    Scale: the hourly rollup is map-side combinable; the pair join is
    per-type over the HOURLY series (bounded by the time span, not
    the event count — 720 points/month → 259k pairs regardless of
    corpus size), and the median windows partition by event_type.  ``events=`` overrides the events frame
    (weak-scaling probe kwarg — tools/scale_probes/theilsen_scale.py
    tests exactly the span-bounded claim; the driver contract never
    passes it)."""
    epoch = F.lit("1970-01-01").cast("date")
    if events is None:
        events = load(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), epoch) * 24
            + F.hour(F.col("ts"))
        ).alias("h"),
    )
    c = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = c.select(
        F.col("event_type").alias("et"),
        F.col("h").alias("ha"),
        F.col("n").alias("na"),
    )
    p = (
        a.join(
            c,
            (F.col("et") == F.col("event_type")) & (F.col("ha") < F.col("h")),
        )
        .select(
            "event_type",
            F.expr(
                f"((n - na) * 1000000 + {_TS_BIG}L * (h - ha))"
                f" div (h - ha) - {_TS_BIG}L"
            ).alias("smicro"),
        )
    )
    g = p.groupBy("event_type", "smicro").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = Window.partitionBy("event_type").orderBy("smicro")
    w_all = Window.partitionBy("event_type")
    w = g.select(
        "event_type",
        "smicro",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n_pairs"),
    )
    return w.groupBy("event_type", "n_pairs").agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n_pairs + 1) div 2"), F.col("smicro")
            )
        )
        .cast("bigint")
        .alias("slope_micro"),
        F.min("smicro").cast("bigint").alias("min_smicro"),
        F.max("smicro").cast("bigint").alias("max_smicro"),
    )


# ---------------------------------------------------------------------------
# sim_mmr_diversify — Maximal Marginal Relevance re-ranking (unrolled greedy)
# ---------------------------------------------------------------------------

_MMR_POOL = 20  # relevance candidate pool
_MMR_K = 5  # diversified picks

#: One greedy MMR pick, oracle side: among unpicked pool members,
#: maximize score2 = rel − max(pair-dot to any previous pick); the
#: pick CTEs are MATERIALIZED (oracle-side double-reference rule).
_MMR_STEP_SQL = """
    , pen{n} AS (
      SELECT p.vec_id, max(pd.w) AS pen
      FROM pool p
      JOIN pw_mmr pd ON pd.a = p.vec_id
      WHERE pd.b IN (SELECT vec_id FROM picked{p})
        AND p.vec_id NOT IN (SELECT vec_id FROM picked{p})
      GROUP BY p.vec_id),
    pick{n} AS MATERIALIZED (
      SELECT vec_id, rel, pen, rel - pen AS score2 FROM (
        SELECT p.vec_id, p.rel, pn.pen,
               row_number() OVER (ORDER BY p.rel - pn.pen DESC, p.vec_id)
                 AS rk_m{n}
        FROM pool p JOIN pen{n} pn ON p.vec_id = pn.vec_id) t
      WHERE rk_m{n} = 1),
    picked{n} AS MATERIALIZED (
      SELECT vec_id FROM picked{p}
      UNION ALL SELECT vec_id FROM pick{n})
"""


def _mmr_oracle() -> str:
    steps = "".join(
        _MMR_STEP_SQL.format(n=i, p=i - 1) for i in range(2, _MMR_K + 1)
    )
    picks = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS pick_order, vec_id, rel,"
        f" pen, score2 FROM pick{i}"
        for i in range(1, _MMR_K + 1)
    )
    return (
        _SQ8_EX_CTE
        + f"""
    , q AS (SELECT pos, vm AS qvm FROM ex WHERE vec_id = {QUERY_VEC_ID}),
    rel0 AS (SELECT e.vec_id, CAST(sum(e.vm * q.qvm) AS BIGINT) AS rel
             FROM ex e JOIN q ON e.pos = q.pos
             WHERE e.vec_id <> {QUERY_VEC_ID}
             GROUP BY e.vec_id),
    pool AS MATERIALIZED (
      SELECT vec_id, rel FROM (
        SELECT vec_id, rel,
               row_number() OVER (ORDER BY rel DESC, vec_id) AS rk_p
        FROM rel0) t WHERE rk_p <= {_MMR_POOL}),
    pw_mmr AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b,
             CAST(sum(ea.vm * eb.vm) AS BIGINT) AS w
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
      JOIN ex ea ON ea.vec_id = a.vec_id
      JOIN ex eb ON eb.vec_id = b.vec_id AND ea.pos = eb.pos
      GROUP BY a.vec_id, b.vec_id),
    pick1 AS MATERIALIZED (
      SELECT vec_id, rel, CAST(0 AS BIGINT) AS pen, rel AS score2 FROM (
        SELECT vec_id, rel,
               row_number() OVER (ORDER BY rel DESC, vec_id) AS rk_m1
        FROM pool) t WHERE rk_m1 = 1),
    picked1 AS MATERIALIZED (SELECT vec_id FROM pick1)
    {steps}
    SELECT * FROM ({picks}) all_picks
    """
    )


@_stage("sim_mmr_diversify", oracle=_mmr_oracle())
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity stage every production retrieval system runs
    after relevance ranking: greedily pick {k} results from the
    relevance top-{pool}, each pick maximizing
    λ·rel(q,d) − (1−λ)·max_sim(d, already-picked).  At λ = 1/2 the
    doubled objective is the pure integer difference
    score2 = rel − max_pair_dot — zero floats anywhere (micro-unit
    BIGINT dots, (score DESC, vec_id) tie-breaks; pick 1 is pure
    relevance with penalty 0).

    The greedy loop is unrolled ({k} − 1 dependent steps); the
    selected-set frame is re-referenced every step → Spark
    localCheckpoints per round and the oracle marks pool/pair/pick
    CTEs MATERIALIZED (the oracle-side double-reference rule).  Scale:
    the pairwise stage is {pool}×{pool} over the POOL, never the
    corpus — MMR cost is independent of corpus size once the
    relevance pool is cut, which is why it composes after any of the
    ANN tiers (BQ/PQ/IVF/SQ8)."""
    vmarr = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    ev = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", vmarr.alias("vm"))
        .localCheckpoint(eager=True)  # feeds q, rel, and the pool pairs
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    q = ev.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("vm").alias("qvm")
    )
    rel = (
        ev.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "vm", idot(F.col("vm"), F.col("qvm")).alias("rel"))
    )
    pool = (
        rel.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .localCheckpoint(eager=True)  # feeds pair dots + every pick round
    )
    pw = (
        pool.select("vec_id", "vm")
        .crossJoin(
            F.broadcast(
                pool.select(
                    F.col("vec_id").alias("b"), F.col("vm").alias("vmb")
                )
            )
        )
        .filter(F.col("vec_id") != F.col("b"))
        .select(
            F.col("vec_id").alias("a"), "b", idot(F.col("vm"), F.col("vmb")).alias("w")
        )
        .localCheckpoint(eager=True)  # referenced every pick round
    )
    wpick = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.desc("score2"), F.asc("vec_id")
    )
    first = (
        pool.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            "vec_id",
            "rel",
            F.lit(0).cast("bigint").alias("pen"),
            F.col("rel").alias("score2"),
        )
        .localCheckpoint(eager=True)
    )
    picks = [first]
    picked = first.select("vec_id")
    for i in range(2, _MMR_K + 1):
        pen = (
            pw.join(F.broadcast(picked.select(F.col("vec_id").alias("b"))), "b")
            .groupBy("a")
            .agg(F.max("w").alias("pen"))
        )
        cand = (
            pool.join(picked, "vec_id", "left_anti")
            .join(pen, pen.a == F.col("vec_id"))
            .select("vec_id", "rel", "pen", (F.col("rel") - F.col("pen")).alias("score2"))
        )
        pick = (
            cand.withColumn("rk_m", F.row_number().over(wpick))
            .filter(F.col("rk_m") == 1)
            .select("vec_id", "rel", F.col("pen").cast("bigint").alias("pen"), "score2")
            .localCheckpoint(eager=True)
        )
        picks.append(pick)
        picked = picked.unionAll(pick.select("vec_id")).localCheckpoint(
            eager=True
        )
    out = None
    for i, p in enumerate(picks, 1):
        row = p.select(
            F.lit(i).cast("bigint").alias("pick_order"),
            "vec_id",
            "rel",
            "pen",
            "score2",
        )
        out = row if out is None else out.unionAll(row)
    return out


sim_mmr_diversify.__doc__ = sim_mmr_diversify.__doc__.format(
    k=_MMR_K, pool=_MMR_POOL
)
